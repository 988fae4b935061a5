"""PipelineCatalog: named training-pipeline configs, candidate
selection, node-property steps, persistence (reference
PipelineCatalog.java / TrainingPipeline.java)."""

import numpy as np
import pandas as pd
import ray.data as rd

from graph_data_science_ray.state.pipeline_catalog import (
    PipelineCatalog,
    TrainingPipeline,
)


def _feature_df(n=40):
    rng = np.arange(n, dtype=np.float64)
    df = pd.DataFrame({"node_id": np.arange(n, dtype=np.int64)})
    df["feat"] = [np.array([x, 2.0 * x + 1.0]) for x in rng]
    df["target"] = 3.0 * rng + 0.5
    df["label"] = (rng >= n / 2).astype(np.int64)
    return df


def test_catalog_persistence_roundtrip(tmp_path):
    cat = PipelineCatalog(str(tmp_path / "pipes"))
    p = (
        TrainingPipeline("p1", "node_regression")
        .select_features(["feat"])
        .configure_split(test_fraction=0.25, seed=7)
        .add_trainer_candidate(max_epochs=50, learning_rate=0.3)
        .add_trainer_candidate(max_epochs=50, learning_rate=0.01)
    )
    cat.set(p)
    assert cat.exists("p1") and not cat.exists("nope")
    # a fresh catalog instance reads the persisted registry
    cat2 = PipelineCatalog(str(tmp_path / "pipes"))
    q = cat2.get("p1")
    assert q.kind == "node_regression"
    assert q.feature_cols == ["feat"]
    assert q.split == {"test_fraction": 0.25, "seed": 7}
    assert len(q.candidates) == 2
    lst = cat2.list()
    assert lst["name"].tolist() == ["p1"]
    assert lst["kind"].tolist() == ["node_regression"]
    cat2.drop("p1")
    assert not cat2.exists("p1")


def test_candidate_selection_picks_better_learning_rate(tmp_path):
    from graph_data_science_ray.state.models import ModelCatalog

    p = (
        TrainingPipeline("reg", "node_regression")
        .select_features(["feat"])
        .add_trainer_candidate(max_epochs=120, learning_rate=0.35)
        .add_trainer_candidate(max_epochs=3, learning_rate=1e-6)
    )
    mc = ModelCatalog(str(tmp_path / "models"))
    res = p.train(rd.from_pandas(_feature_df()), label_col="target",
                  model_catalog=mc, model_name="reg_best")
    assert res["best_candidate"]["learning_rate"] == 0.35
    assert res["metrics"]["r2"] > 0.9
    assert len(res["candidate_metrics"]) == 2
    # winner landed in the model catalog with the pipeline config attached
    m = mc.get("reg_best")
    assert m.algo_type == "node_regression"
    assert m.train_config["best_candidate"]["learning_rate"] == 0.35


def test_node_property_step_joins_graph_feature(graph_from_edges, tmp_path):
    # hub-and-spokes + a small clique: out-degrees vary 1..9 so the
    # degree feature carries real signal in any split
    edges = [(0, i) for i in range(1, 10)] + [
        (1, 2), (2, 1), (1, 3), (3, 1), (2, 3), (3, 2),
        (4, 0), (5, 0),
    ]
    gd, gu, idmap, enc, sym = graph_from_edges(edges)
    n = len(idmap)
    df = pd.DataFrame({"node_id": np.arange(n, dtype=np.int64)})
    # target = out-degree => the degree node-property step makes the fit
    deg = gu.out_degrees().astype(np.float64)
    df["target"] = deg
    p = (
        TrainingPipeline("degfit", "node_regression")
        .add_node_property("degree", out_col="deg_feat")
        .select_features(["deg_feat"])
        .add_trainer_candidate(max_epochs=150, learning_rate=0.3)
    )
    res = p.train(rd.from_pandas(df), label_col="target", graph=gu)
    assert res["metrics"]["r2"] > 0.9


def test_auto_tuning_deterministic_and_monotone(tmp_path):
    """AutoTuningConfig surface: tunable ranges expand to max_trials
    deterministic concrete candidates; the selected winner is stable
    across runs and at least as good as every sampled trial."""
    import pandas as pd
    import ray.data as rd

    from graph_data_science_ray.state.pipeline_catalog import TrainingPipeline

    rng = np.random.default_rng(7)
    X = np.concatenate([
        rng.normal(loc=[-2.0, 0.0], scale=0.5, size=(40, 2)),
        rng.normal(loc=[2.0, 0.0], scale=0.5, size=(40, 2)),
    ])
    df = pd.DataFrame({"node_id": np.arange(80, dtype=np.int64),
                       "label": np.repeat([0, 1], 40)})
    df["features"] = list(X)
    ds = rd.from_pandas(df, override_num_blocks=3)

    p = TrainingPipeline("tune", "node_classification")
    p.add_trainer_candidate(
        learning_rate={"range": [0.01, 0.5]}, max_epochs=20,
    )
    p.configure_auto_tuning(max_trials=3)
    cands = p._materialize_candidates()
    assert len(cands) == 3
    assert cands == p._materialize_candidates()  # deterministic draw
    assert all(0.01 <= c["learning_rate"] <= 0.5 for c in cands)

    r1 = p.train(ds, label_col="label")
    r2 = p.train(ds, label_col="label")
    assert r1["best_candidate"] == r2["best_candidate"]
    best = max(m["score"] for m in r1["candidate_metrics"])
    assert r1["metrics"]["accuracy"] == best
    # persistence round-trips the tuning config
    obj = TrainingPipeline.from_json(p.to_json())
    assert obj.auto_tuning == {"max_trials": 3}


def test_candidate_families_mix_lr_rf_mlp(tmp_path):
    """Candidate list can mix model families (the reference's
    addLogisticRegression / addRandomForest / addMLP procs); the winner
    is picked by the held-out metric across families."""
    import pandas as pd
    import ray.data as rd

    from graph_data_science_ray.state.pipeline_catalog import TrainingPipeline

    rng = np.random.default_rng(3)
    X = np.concatenate([
        rng.normal(loc=[-2.0, 0.0], scale=0.5, size=(40, 2)),
        rng.normal(loc=[2.0, 0.0], scale=0.5, size=(40, 2)),
    ])
    df = pd.DataFrame({"node_id": np.arange(80, dtype=np.int64),
                       "label": np.repeat([0, 1], 40)})
    df["features"] = list(X)
    ds = rd.from_pandas(df, override_num_blocks=3)

    p = TrainingPipeline("families", "node_classification")
    p.add_trainer_candidate(max_epochs=15)
    p.add_trainer_candidate(model="rf",
                            model_params={"num_trees": 3, "max_depth": 4})
    p.add_trainer_candidate(model="mlp", max_epochs=25, learning_rate=0.05)
    r = p.train(ds, label_col="label")
    assert len(r["candidate_metrics"]) == 3
    assert r["metrics"]["accuracy"] >= max(
        m["score"] for m in r["candidate_metrics"]
    ) - 1e-12

"""ML pipeline slice: logistic regression, link features, pipelines.

Reference surface: ml/ml-algo logisticregression/ (softmax CE + L2),
pipeline/ nodePipeline + linkPipeline (feature steps, split, train,
predict)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from graph_data_science_ray.pipelines.ml import (
    LogisticRegressionModel,
    assemble_features,
    hash_split,
    link_features,
    link_prediction_pipeline,
    node_classification_pipeline,
    train_logistic_regression,
)


def _blob_ds(n=120, seed=3):
    rng = np.random.default_rng(seed)
    X0 = rng.normal(loc=[-2.0, 0.0], scale=0.6, size=(n // 3, 2))
    X1 = rng.normal(loc=[2.0, 0.0], scale=0.6, size=(n // 3, 2))
    X2 = rng.normal(loc=[0.0, 3.0], scale=0.6, size=(n // 3, 2))
    X = np.concatenate([X0, X1, X2])
    y = np.repeat([0, 1, 2], n // 3)
    df = pd.DataFrame({
        "node_id": np.arange(len(X), dtype=np.int64),
        "label": y,
    })
    df["features"] = list(X)
    return df


def test_logistic_regression_separable_and_deterministic():
    df = _blob_ds()
    ds = rd.from_pandas(df, override_num_blocks=4)
    m1 = train_logistic_regression(
        ds, max_epochs=120, learning_rate=0.3, key_col="node_id"
    )
    m2 = train_logistic_regression(
        rd.from_pandas(df, override_num_blocks=2), max_epochs=120,
        learning_rate=0.3, key_col="node_id",
    )
    # deterministic at any block layout (fixed-order gradient combine)
    assert (m1.weights == m2.weights).all()
    assert (m1.bias == m2.bias).all()
    scored = m1.predict(ds).to_pandas()
    acc = (scored["predicted"] == scored["label"]).mean()
    assert acc > 0.95


def test_assemble_features_mixes_scalars_and_lists():
    df = pd.DataFrame({"node_id": [0, 1], "a": [1.0, 2.0]})
    df["emb"] = [np.array([0.5, 0.25]), np.array([1.5, 1.25])]
    ds = assemble_features(rd.from_pandas(df), ["a", "emb"])
    out = ds.to_pandas().sort_values("node_id")
    assert list(out["features"].iloc[0]) == [1.0, 0.5, 0.25]
    assert list(out["features"].iloc[1]) == [2.0, 1.5, 1.25]


def test_link_features_combiners_match_numpy():
    vecs = pd.DataFrame({"node_id": [0, 1, 2]})
    vecs["embedding"] = [
        np.array([1.0, 0.0]), np.array([0.0, 2.0]), np.array([3.0, 4.0]),
    ]
    pairs = pd.DataFrame({"src": [0, 1], "dst": [2, 2]})
    out = link_features(
        rd.from_pandas(pairs), rd.from_pandas(vecs),
        combiners=["hadamard", "l2", "cosine"],
    ).to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    V = {0: np.array([1.0, 0.0]), 1: np.array([0.0, 2.0]),
         2: np.array([3.0, 4.0])}
    for _, row in out.iterrows():
        a, b = V[row["src"]], V[row["dst"]]
        exp = np.concatenate([
            a * b, (a - b) ** 2,
            [a @ b / (np.linalg.norm(a) * np.linalg.norm(b))],
        ])
        assert np.allclose(np.asarray(row["features"]), exp)


def test_hash_split_is_deterministic_partition():
    df = pd.DataFrame({"node_id": np.arange(500, dtype=np.int64), "x": 1.0})
    ds = rd.from_pandas(df)
    tr, te = hash_split(ds, "node_id", 0.3, seed=7)
    tr2, te2 = hash_split(rd.from_pandas(df, override_num_blocks=5),
                          "node_id", 0.3, seed=7)
    a = set(tr.to_pandas()["node_id"]); b = set(te.to_pandas()["node_id"])
    assert a.isdisjoint(b) and len(a) + len(b) == 500
    assert 0.2 < len(b) / 500 < 0.4
    assert a == set(tr2.to_pandas()["node_id"])


def test_node_classification_pipeline_learns_degree_classes(graph_from_edges):
    # star-ish graph: hubs (high degree) vs leaves — features = [degree]
    edges = [(0, i) for i in range(2, 12)] + [(1, i) for i in range(2, 12)]
    gd, gu, idmap, enc, sym = graph_from_edges(edges, num_partitions=3)
    from graph_data_science_ray.functions.degree import degree_centrality

    deg = degree_centrality(sym, node_count=len(idmap), weighted=False)
    df = pd.DataFrame({
        "node_id": np.arange(len(idmap), dtype=np.int64),
        "label": (deg["degree"].to_numpy() > 5).astype(np.int64),
    })
    df["features"] = list(deg["degree"].to_numpy(dtype=np.float64)[:, None])
    res = node_classification_pipeline(
        rd.from_pandas(df), test_fraction=0.25, max_epochs=150,
        learning_rate=0.5,
    )
    preds = res["predictions"].to_pandas()
    assert (preds["predicted"] == df.set_index("node_id").loc[
        preds["node_id"], "label"].to_numpy()).mean() == 1.0
    assert set(res["metrics"]) == {"accuracy", "f1_macro"}


def test_link_prediction_pipeline_beats_chance(graph_from_edges):
    # two dense clusters, embeddings = cluster indicator => intra-cluster
    # pairs (positives) separable from random cross pairs
    edges = []
    for base in (0, 8):
        grp = range(base, base + 8)
        edges += [(i, j) for i in grp for j in grp if i != j]
    gd, gu, idmap, enc, sym = graph_from_edges(edges, num_partitions=3)
    n = len(idmap)
    vecs = pd.DataFrame({"node_id": np.arange(n, dtype=np.int64)})
    vecs["embedding"] = [
        np.array([1.0, 0.0]) if i < 8 else np.array([0.0, 1.0])
        for i in range(n)
    ]
    # negative_ratio 0.5: the two-clique graph is near-complete, so a
    # 1.0 ratio exhausts the non-edge pool and pays many sampler rounds
    res = link_prediction_pipeline(
        enc, rd.from_pandas(vecs), node_count=n,
        combiners=["hadamard"], max_epochs=120, learning_rate=0.5,
        negative_ratio=0.5,
    )
    assert res["n_pos"] > 0 and res["n_neg"] > 0
    assert res["metrics"]["accuracy"] > 0.8


def test_distributed_negative_sampler_matches_broadcast(graph_from_edges):
    """The distributed anti-join sampler must reproduce the broadcast
    rejection sampler bit-for-bit (same draw windows, same smallest-key
    selection) — the scale path is output-identical to the reference
    path."""
    import pyarrow as pa

    from graph_data_science_ray.pipelines.ml import (
        _neg_sample_distributed,
        _sample_negative_pairs,
    )

    edges = [(i, (i + 1) % 9) for i in range(9)] + [(0, 4), (2, 7)]
    gd, gu, idmap, enc, sym = graph_from_edges(edges, num_partitions=3)
    V = len(idmap)
    pos = enc.select_columns(["src", "dst"]).materialize()
    keys = pos.map_batches(
        lambda t: pa.table({
            "key": pa.array(
                t["src"].to_numpy(zero_copy_only=False).astype(np.int64) * V
                + t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
            )
        }),
        batch_format="pyarrow",
    )
    ekeys = np.sort(keys.to_pandas()["key"].to_numpy(dtype=np.int64))
    for n_neg in (3, 8, 15):
        want = _sample_negative_pairs(
            np.arange(V, dtype=np.int64), ekeys, n_neg, V, seed=42
        )
        got = (
            _neg_sample_distributed(keys, n_neg, V, seed=42, num_parts=4)
            .to_pandas()["key"].to_numpy(dtype=np.int64)
        )
        want_keys = (
            want["src"].to_numpy(dtype=np.int64) * V
            + want["dst"].to_numpy(dtype=np.int64)
        )
        assert np.array_equal(np.sort(got), np.sort(want_keys)), n_neg


def test_node_regression_pipeline_fits_linear_target():
    """Linear target => near-perfect fit; deterministic reruns."""
    import ray.data as rd

    from graph_data_science_ray.pipelines.ml import node_regression_pipeline

    rng = np.arange(40, dtype=np.float64)
    df = pd.DataFrame({"node_id": np.arange(40, dtype=np.int64)})
    df["feat"] = [np.array([x, 2.0 * x + 1.0]) for x in rng]
    df["target"] = 3.0 * rng + 0.5
    res = node_regression_pipeline(
        rd.from_pandas(df), target_col="target", feature_cols=["feat"],
        id_col="node_id", max_epochs=120, learning_rate=0.35,
    )
    assert res["metrics"]["r2"] > 0.95
    assert set(res["metrics"]) == {"mse", "mae", "r2"}
    res2 = node_regression_pipeline(
        rd.from_pandas(df), target_col="target", feature_cols=["feat"],
        id_col="node_id", max_epochs=120, learning_rate=0.35,
    )
    assert res["model"].weights.tobytes() == res2["model"].weights.tobytes()
    assert res["model"].bias == res2["model"].bias


def test_split_relationships_deterministic_and_fractional():
    """split_relationships: the holdout side is decided per edge by an
    integer md5 acceptance — identical across repartitionings, disjoint
    and exhaustive, with the selected share near holdout_ppm."""
    from graph_data_science_ray.pipelines.ml import split_relationships

    n = 4000
    df = pd.DataFrame(
        {"src": [f"u{i}" for i in range(n)],
         "dst": [f"u{(i * 7 + 1) % n}" for i in range(n)],
         "weight": np.ones(n)}
    )
    a = (split_relationships(rd.from_pandas(df), holdout_ppm=200_000)
         .to_pandas().sort_values(["src", "dst"]).reset_index(drop=True))
    b = (split_relationships(
            rd.from_pandas(df).repartition(13), holdout_ppm=200_000)
         .to_pandas().sort_values(["src", "dst"]).reset_index(drop=True))
    assert a.equals(b)
    assert set(a["split"].unique()) == {"selected", "remaining"}
    assert ((a["split"] == "selected") == (a["label"] == 1)).all()
    share = (a["label"] == 1).mean()
    assert 0.17 < share < 0.23


def test_random_forest_separable_and_deterministic():
    from graph_data_science_ray.pipelines.trees import train_random_forest

    df = _blob_ds()
    ds = rd.from_pandas(df, override_num_blocks=4)
    m1 = train_random_forest(ds, key_col="node_id", num_trees=6, max_depth=5)
    m2 = train_random_forest(
        ds.repartition(2), key_col="node_id", num_trees=6, max_depth=5
    )
    # byte-identical trees at any block layout (canonical matrix contract)
    for t1, t2 in zip(m1.trees, m2.trees):
        for k in t1:
            assert (t1[k] == t2[k]).all()
    scored = m1.predict(ds).to_pandas()
    assert (scored["predicted"] == scored["label"]).mean() > 0.95


def test_random_forest_regression_fits_piecewise():
    from graph_data_science_ray.pipelines.trees import train_random_forest

    n = 150
    x = np.linspace(-2, 2, n)
    df = pd.DataFrame({"node_id": np.arange(n, dtype=np.int64),
                       "target": np.where(x > 0, 5.0, -5.0)})
    df["features"] = [[float(v)] for v in x]
    ds = rd.from_pandas(df, override_num_blocks=3)
    m = train_random_forest(ds, label_col="target", regression=True,
                            key_col="node_id", num_trees=4, max_depth=3)
    scored = m.predict(ds).to_pandas()
    err = np.abs(scored["predicted"].to_numpy() - scored["target"].to_numpy())
    assert err.mean() < 1.0


def test_single_decision_tree_exact_split():
    """num_trees=1 + no bootstrap + all features = a plain DecisionTree
    (the reference's decisiontree/ trainer): on a 1-d threshold fixture
    the root split must recover the planted boundary."""
    from graph_data_science_ray.pipelines.trees import train_random_forest

    df = pd.DataFrame({"node_id": np.arange(20, dtype=np.int64),
                       "label": np.repeat([0, 1], 10)})
    df["features"] = [[float(i)] for i in range(20)]
    ds = rd.from_pandas(df, override_num_blocks=2)
    m = train_random_forest(ds, key_col="node_id", num_trees=1,
                            bootstrap=False, max_features_ratio=1.0,
                            max_depth=2)
    t = m.trees[0]
    assert t["feature"][0] == 0 and abs(t["threshold"][0] - 9.5) < 1e-9
    scored = m.predict(ds).to_pandas()
    assert (scored["predicted"] == scored["label"]).all()


def test_mlp_classifier_separable_and_deterministic():
    from graph_data_science_ray.pipelines.ml import train_mlp_classifier

    df = _blob_ds()
    ds = rd.from_pandas(df, override_num_blocks=4)
    m1 = train_mlp_classifier(ds, key_col="node_id", hidden=(8,),
                              max_epochs=60, learning_rate=0.05)
    m2 = train_mlp_classifier(ds.repartition(2), key_col="node_id",
                              hidden=(8,), max_epochs=60, learning_rate=0.05)
    for a, b in zip(m1.Ws, m2.Ws):
        assert a.tobytes() == b.tobytes()
    scored = m1.predict(ds).to_pandas()
    assert (scored["predicted"] == scored["label"]).mean() > 0.9


def test_pipeline_model_param_routes_families():
    df = _blob_ds()
    ds = rd.from_pandas(df, override_num_blocks=4)
    r = node_classification_pipeline(
        ds, id_col="node_id", model="rf",
        model_params={"num_trees": 5, "max_depth": 5},
    )
    assert r["metrics"]["accuracy"] > 0.9
    r2 = node_classification_pipeline(
        ds, id_col="node_id", model="mlp", max_epochs=60,
        learning_rate=0.05,
    )
    assert r2["metrics"]["accuracy"] > 0.85


def test_random_forest_constant_feature_and_single_class():
    """Degenerate inputs: a constant feature column must yield a leaf-only
    tree (no crash, no split), and a single-class dataset predicts that
    class everywhere."""
    from graph_data_science_ray.pipelines.trees import train_random_forest

    df = pd.DataFrame({"node_id": np.arange(30, dtype=np.int64),
                       "label": np.zeros(30, dtype=np.int64)})
    df["features"] = [[1.5, 1.5] for _ in range(30)]
    ds = rd.from_pandas(df, override_num_blocks=2)
    m = train_random_forest(ds, key_col="node_id", num_trees=2, max_depth=3)
    scored = m.predict(ds).to_pandas()
    assert (scored["predicted"] == 0).all()
    for t in m.trees:
        assert (t["feature"] == -1).all()  # constant X -> no split found


def test_mlp_multiclass_labels_roundtrip():
    from graph_data_science_ray.pipelines.ml import train_mlp_classifier

    df = _blob_ds()
    ds = rd.from_pandas(df, override_num_blocks=3)
    m = train_mlp_classifier(ds, key_col="node_id", hidden=(6, 4),
                             max_epochs=40, learning_rate=0.05)
    assert len(m.Ws) == 3  # two hidden layers + head
    scored = m.predict(ds, proba=True).to_pandas()
    assert set(scored["predicted"].unique()) <= {0, 1, 2}
    assert (scored["prob"] > 0).all() and (scored["prob"] <= 1.0).all()


def test_link_prediction_rf_and_mlp_models(graph_from_edges):
    """The reference trains RF/MLP candidates for link prediction too —
    both families must route through the pipeline and beat chance on
    the two-cluster fixture."""
    import itertools

    edges = (
        list(itertools.combinations(range(6), 2))
        + [(u + 6, v + 6) for u, v in itertools.combinations(range(6), 2)]
    )
    _, _, idmap, enc, _ = graph_from_edges(edges)
    rng = np.random.default_rng(5)
    vec = pd.DataFrame({"node_id": np.arange(12, dtype=np.int64)})
    base = rng.normal(size=(2, 6))
    vec["embedding"] = [
        list(base[i // 6] + 0.1 * rng.normal(size=6)) for i in range(12)
    ]
    vecs = rd.from_pandas(vec)
    for fam, params in (("rf", {"num_trees": 4, "max_depth": 4}), ("mlp", {})):
        res = link_prediction_pipeline(
            enc, vecs, node_count=12, negative_ratio=1.0,
            model=fam, model_params=params, max_epochs=40,
        )
        assert res["metrics"]["accuracy"] > 0.6, fam

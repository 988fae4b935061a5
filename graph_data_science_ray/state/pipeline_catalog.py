"""Named training-pipeline catalog — the reference's PipelineCatalog.

Reference: pipeline/src/main/java/org/neo4j/gds/ml/pipeline/
PipelineCatalog.java (set/get/exists/drop/list of named
TrainingPipeline instances) and TrainingPipeline.java (a pipeline =
node-property steps + feature steps + split config + a list of trainer
candidate configs; ``train`` selects the best candidate by the
evaluation metric — AutoTuning over the candidate space).

Ray-Data-first shape: a pipeline is a JSON-persistable CONFIG —

- ``node_property_steps``: graph algorithms run in mutate mode whose
  (node, value) outputs join onto the feature Dataset by id (the
  reference's NodePropertyStep; supported ops: ``degree``,
  ``pagerank``, ``wcc`` — each a distributed operator from
  ``functions/``);
- ``feature_cols``: the selectFeatures surface;
- ``split``: test_fraction + seed (configureSplit);
- ``candidates``: trainer parameter dicts (addLogisticRegression /
  addLinearRegression); ``train`` fits EVERY candidate on the train
  split with the data-parallel trainers in ``pipelines/ml.py``,
  evaluates on the held-out split, and keeps the winner — the
  reference's candidate-selection loop.

The catalog persists pipeline configs as ``pipelines.json`` under a
root directory (the graph/model catalog convention), so registered
pipelines survive process restarts.
"""

from __future__ import annotations

import os
import time

import numpy as np
import pandas as pd

from graph_data_science_ray._util import atomic_write_json, read_json

_KINDS = ("node_classification", "node_regression", "link_prediction")


class TrainingPipeline:
    """A named, JSON-persistable training-pipeline config."""

    def __init__(self, name: str, kind: str):
        if kind not in _KINDS:
            raise ValueError(f"kind must be one of {_KINDS}, got {kind!r}")
        self.name = name
        self.kind = kind
        self.node_property_steps: list[dict] = []
        self.feature_cols: list[str] = []
        self.split = {"test_fraction": 0.25, "seed": 42}
        self.candidates: list[dict] = []
        self.auto_tuning = {"max_trials": 10}

    # -- builder surface (the reference's pipeline-mutation procs) --------

    def add_node_property(self, op: str, out_col: str, **config) -> "TrainingPipeline":
        if op not in ("degree", "pagerank", "wcc"):
            raise ValueError(f"unsupported node-property step {op!r}")
        self.node_property_steps.append(
            {"op": op, "out_col": out_col, "config": config}
        )
        return self

    def select_features(self, cols: list[str]) -> "TrainingPipeline":
        self.feature_cols = list(cols)
        return self

    def configure_split(self, test_fraction: float = 0.25, seed: int = 42) -> "TrainingPipeline":
        self.split = {"test_fraction": float(test_fraction), "seed": int(seed)}
        return self

    def add_trainer_candidate(self, **params) -> "TrainingPipeline":
        """A candidate config.  Values may be concrete, or TUNABLE —
        ``{"range": [lo, hi]}`` (log-uniform, the reference's
        LogScale TunableTrainerConfig ranges) or ``{"values": [...]}``
        (categorical) — resolved by the auto-tuning search at train
        time (reference pipeline/.../AutoTuningConfig.java)."""
        self.candidates.append(dict(params))
        return self

    def configure_auto_tuning(self, max_trials: int = 10) -> "TrainingPipeline":
        """Reference NodeClassificationPipelineConfigureAutoTuningProc:
        bound the number of sampled trials per tunable candidate."""
        self.auto_tuning = {"max_trials": int(max_trials)}
        return self

    def _materialize_candidates(self) -> list[dict]:
        """Expand tunable candidates into ≤ max_trials concrete configs
        via a deterministic splitmix64 low-discrepancy draw (trial × param
        → u64 → log-uniform point / categorical pick); concrete
        candidates pass through unchanged, so grid search is simply a
        list of concrete candidates."""
        from graph_data_science_ray._util import splitmix64, uniform01

        out = []
        trials = int(self.auto_tuning.get("max_trials", 10))
        for ci, cand in enumerate(self.candidates or [{}]):
            tunable = {
                k: v for k, v in cand.items()
                if isinstance(v, dict) and ("range" in v or "values" in v)
            }
            if not tunable:
                out.append(cand)
                continue
            for t in range(trials):
                conc = {k: v for k, v in cand.items() if k not in tunable}
                for pi, k in enumerate(sorted(tunable)):
                    spec = tunable[k]
                    bits = splitmix64(np.asarray(
                        [ci * 1_000_003 + t * 97 + pi], dtype=np.uint64
                    ))
                    u = float(uniform01(bits)[0])
                    if "range" in spec:
                        lo, hi = float(spec["range"][0]), float(spec["range"][1])
                        val = float(np.exp(
                            np.log(lo) + u * (np.log(hi) - np.log(lo))
                        ))
                        conc[k] = int(round(val)) if spec.get("integer") else val
                    else:
                        vals = list(spec["values"])
                        conc[k] = vals[min(int(u * len(vals)), len(vals) - 1)]
                out.append(conc)
        return out

    # -- persistence ------------------------------------------------------

    def to_json(self) -> dict:
        return {
            "name": self.name, "kind": self.kind,
            "node_property_steps": self.node_property_steps,
            "feature_cols": self.feature_cols,
            "split": self.split, "candidates": self.candidates,
            "auto_tuning": self.auto_tuning,
        }

    @classmethod
    def from_json(cls, obj: dict) -> "TrainingPipeline":
        p = cls(obj["name"], obj["kind"])
        p.node_property_steps = list(obj.get("node_property_steps", []))
        p.feature_cols = list(obj.get("feature_cols", []))
        p.split = dict(obj.get("split", {"test_fraction": 0.25, "seed": 42}))
        p.candidates = list(obj.get("candidates", []))
        p.auto_tuning = dict(obj.get("auto_tuning", {"max_trials": 10}))
        return p

    # -- execution --------------------------------------------------------

    def _apply_node_property_steps(self, features_ds, graph, id_col: str):
        """Run each step's distributed operator and hash-join its
        (node, value) output onto the feature Dataset by dense id."""
        if not self.node_property_steps:
            return features_ds
        if graph is None:
            raise ValueError("node_property_steps need a projected graph")
        import pyarrow as pa
        import ray.data as rd

        from graph_data_science_ray.pipelines.agg import hash_join

        ds = features_ds
        for step in self.node_property_steps:
            op, out_col = step["op"], step["out_col"]
            cfg = step.get("config", {})
            if op == "degree":
                vals = graph.out_degrees().astype(np.float64)
            elif op == "pagerank":
                from graph_data_science_ray.functions.pagerank import pagerank

                pr = pagerank(graph, **cfg)
                vals = np.zeros(graph.node_count, dtype=np.float64)
                vals[:] = pr["score"].to_numpy(dtype=np.float64)
            else:  # wcc
                from graph_data_science_ray.functions.wcc import wcc_ds

                comp = wcc_ds(graph).to_pandas().sort_values("node")
                vals = comp["component"].to_numpy(dtype=np.float64)
            side = rd.from_pandas(
                pd.DataFrame(
                    {id_col: np.arange(len(vals), dtype=np.int64),
                     out_col: vals}
                )
            )
            ds = hash_join(ds, side, on=[id_col])
        return ds

    def train(self, features_ds, label_col: str | None = None,
              id_col: str = "node_id", graph=None,
              model_catalog=None, model_name: str | None = None) -> dict:
        """Fit every trainer candidate, keep the best by the held-out
        metric (accuracy for classification, MSE for regression);
        optionally register the winner in a ModelCatalog."""
        from graph_data_science_ray.pipelines.ml import (
            node_classification_pipeline,
            node_regression_pipeline,
        )

        if self.kind == "link_prediction":
            raise NotImplementedError(
                "register link-prediction configs here, but run them via "
                "pipelines.ml.link_prediction_pipeline (needs the edge "
                "Dataset + node vectors, not a feature table)"
            )
        ds = self._apply_node_property_steps(features_ds, graph, id_col)
        ds = ds.materialize()
        cands = self._materialize_candidates()
        results = []
        for ci, cand in enumerate(cands):
            if self.kind == "node_classification":
                res = node_classification_pipeline(
                    ds, label_col=label_col or "label",
                    feature_cols=self.feature_cols or None,
                    test_fraction=self.split["test_fraction"],
                    seed=self.split["seed"], id_col=id_col, **cand,
                )
                score = res["metrics"]["accuracy"]  # higher is better
            else:
                res = node_regression_pipeline(
                    ds, target_col=label_col or "target",
                    feature_cols=self.feature_cols or None,
                    test_fraction=self.split["test_fraction"],
                    seed=self.split["seed"], id_col=id_col, **cand,
                )
                score = -res["metrics"]["mse"]      # higher is better
            results.append((score, ci, res))
        best_score, best_ci, best = max(results, key=lambda t: (t[0], -t[1]))
        out = {
            "model": best["model"], "metrics": best["metrics"],
            "predictions": best["predictions"],
            "best_candidate": cands[best_ci],
            "candidate_metrics": [
                {"candidate": cands[ci], "score": s} for s, ci, _ in results
            ],
        }
        if model_catalog is not None:
            m = best["model"]
            if hasattr(m, "trees"):  # RandomForest: flat node arrays
                data = {}
                for ti, t in enumerate(m.trees):
                    for k, v in t.items():
                        data[f"tree{ti}_{k}"] = v
                if m.classes is not None:
                    data["classes"] = m.classes
            elif hasattr(m, "Ws"):  # MLP: per-layer arrays
                data = {"classes": m.classes}
                for li in range(len(m.Ws)):
                    data[f"W{li}"] = m.Ws[li]
                    data[f"b{li}"] = m.bs[li]
            elif self.kind == "node_regression":
                data = {"weights": m.weights, "bias": np.asarray([m.bias])}
            else:
                data = {"weights": m.weights, "bias": m.bias,
                        "classes": m.classes}
            model_catalog.set(
                model_name or self.name, algo_type=self.kind, data=data,
                train_config={"pipeline": self.to_json(),
                              "best_candidate": cands[best_ci]},
                overwrite=True,
            )
        return out


class PipelineCatalog:
    """Persistent name → TrainingPipeline registry (PipelineCatalog.java)."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    @property
    def _path(self) -> str:
        return os.path.join(self.root, "pipelines.json")

    def _registry(self) -> dict:
        if not os.path.exists(self._path):
            return {}
        return read_json(self._path)

    def set(self, pipeline: TrainingPipeline, overwrite: bool = False) -> None:
        reg = self._registry()
        if pipeline.name in reg and not overwrite:
            raise ValueError(f"pipeline {pipeline.name!r} already exists")
        reg[pipeline.name] = {
            "config": pipeline.to_json(), "created_at": time.time(),
        }
        atomic_write_json(self._path, reg)

    def get(self, name: str) -> TrainingPipeline:
        reg = self._registry()
        if name not in reg:
            raise KeyError(f"pipeline {name!r} not in catalog")
        return TrainingPipeline.from_json(reg[name]["config"])

    def exists(self, name: str) -> bool:
        return name in self._registry()

    def drop(self, name: str, missing_ok: bool = False) -> None:
        reg = self._registry()
        if name not in reg:
            if missing_ok:
                return
            raise KeyError(f"pipeline {name!r} not in catalog")
        del reg[name]
        atomic_write_json(self._path, reg)

    def list(self) -> pd.DataFrame:
        reg = self._registry()
        names = sorted(reg)
        return pd.DataFrame(
            {
                "name": names,
                "kind": [reg[n]["config"]["kind"] for n in names],
                "n_candidates": [
                    len(reg[n]["config"].get("candidates", [])) for n in names
                ],
                "created_at": [reg[n]["created_at"] for n in names],
            }
        )

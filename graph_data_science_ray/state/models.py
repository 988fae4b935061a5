"""Named model catalog — the engine's ModelCatalog.

Reference: model-catalog-api/src/main/java/org/neo4j/gds/core/model/
ModelCatalog.java:33 (set/get/exists/drop/list/publish over named
trained models) and Model.java:41 (a model = name + algoType + DATA +
trainConfig + creationTime + creator; ``publish`` renames with the
``_public`` suffix and shares with ``*``).

Here a model is a directory ``<root>/<name>/`` holding ``model.npz``
(every numpy array in ``data``), ``data.json`` (non-array payload
entries) and ``meta.json`` (algo_type, train_config, creator,
created_at, shared_with), plus a root-level ``models.json`` registry —
the same persistence shape as the graph catalog, so catalogs survive
process restarts and are shared by any driver pointing at the root.
GraphSAGE weight dicts (``{"W1", "W2"}``) and
``LogisticRegressionModel`` payloads round-trip losslessly.
"""

from __future__ import annotations

import os
import shutil
import time

import numpy as np
import pandas as pd

from graph_data_science_ray._util import atomic_write_json, read_json

PUBLIC_MODEL_SUFFIX = "_public"


class Model:
    """A loaded catalog entry: ``data`` is a dict of numpy arrays and/or
    JSON-serializable values, ``train_config`` an arbitrary JSON dict."""

    def __init__(self, name: str, algo_type: str, data: dict, train_config: dict,
                 creator: str = "", created_at: float = 0.0,
                 shared_with: tuple = ()):
        self.name = name
        self.algo_type = algo_type
        self.data = data
        self.train_config = train_config
        self.creator = creator
        self.created_at = created_at
        self.shared_with = tuple(shared_with)


class ModelCatalog:
    """Persistent name → trained-model registry rooted at a directory."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    @property
    def _registry_path(self) -> str:
        return os.path.join(self.root, "models.json")

    def _registry(self) -> dict:
        if not os.path.exists(self._registry_path):
            return {}
        return read_json(self._registry_path)

    def _write(self, reg: dict) -> None:
        atomic_write_json(self._registry_path, reg)

    def _model_dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    # -- mutation ---------------------------------------------------------

    def set(self, name: str, algo_type: str, data: dict, train_config: dict | None = None,
            creator: str = "", overwrite: bool = False) -> None:
        """Persist a trained model under a name.

        ``data`` values that are numpy arrays go to ``model.npz``; all
        other values must be JSON-serializable and go to ``data.json``.
        """
        reg = self._registry()
        if name in reg and not overwrite:
            raise ValueError(f"model {name!r} already exists in catalog")
        d = self._model_dir(name)
        os.makedirs(d, exist_ok=True)
        # object-dtype arrays (e.g. string class labels) are not npz-safe
        # without pickling; they round-trip through JSON as lists instead.
        arrays = {
            k: np.asarray(v)
            for k, v in data.items()
            if isinstance(v, np.ndarray) and v.dtype != object
        }
        plain = {
            k: (v.tolist() if isinstance(v, np.ndarray) else v)
            for k, v in data.items()
            if not (isinstance(v, np.ndarray) and v.dtype != object)
        }
        np.savez(os.path.join(d, "model.npz"), **arrays)
        atomic_write_json(os.path.join(d, "data.json"), plain)
        meta = {
            "algo_type": algo_type,
            "train_config": train_config or {},
            "creator": creator,
            "created_at": time.time(),
            "shared_with": [],
        }
        atomic_write_json(os.path.join(d, "meta.json"), meta)
        reg[name] = {"algo_type": algo_type, "created_at": meta["created_at"],
                     "creator": creator}
        self._write(reg)

    def drop(self, name: str, missing_ok: bool = False) -> None:
        reg = self._registry()
        if name not in reg:
            if missing_ok:
                return
            raise KeyError(f"model {name!r} not in catalog")
        del reg[name]
        self._write(reg)
        shutil.rmtree(self._model_dir(name), ignore_errors=True)

    def publish(self, name: str) -> str:
        """Reference Model.publish: rename with `_public`, share with *."""
        if name.endswith(PUBLIC_MODEL_SUFFIX):
            return name
        pub = name + PUBLIC_MODEL_SUFFIX
        reg = self._registry()
        if name not in reg:
            raise KeyError(f"model {name!r} not in catalog")
        os.rename(self._model_dir(name), self._model_dir(pub))
        meta_path = os.path.join(self._model_dir(pub), "meta.json")
        meta = read_json(meta_path)
        meta["shared_with"] = ["*"]
        atomic_write_json(meta_path, meta)
        reg[pub] = reg.pop(name)
        self._write(reg)
        return pub

    # -- access -----------------------------------------------------------

    def exists(self, name: str) -> bool:
        return name in self._registry()

    def get(self, name: str) -> Model:
        if not self.exists(name):
            raise KeyError(f"model {name!r} not in catalog")
        d = self._model_dir(name)
        data: dict = {}
        npz_path = os.path.join(d, "model.npz")
        if os.path.exists(npz_path):
            with np.load(npz_path, allow_pickle=False) as z:
                data.update({k: z[k] for k in z.files})
        plain_path = os.path.join(d, "data.json")
        if os.path.exists(plain_path):
            data.update(read_json(plain_path))
        meta = read_json(os.path.join(d, "meta.json"))
        return Model(
            name=name, algo_type=meta["algo_type"], data=data,
            train_config=meta["train_config"], creator=meta["creator"],
            created_at=meta["created_at"], shared_with=tuple(meta["shared_with"]),
        )

    def list(self) -> pd.DataFrame:
        reg = self._registry()
        names = sorted(reg)
        return pd.DataFrame(
            {
                "name": names,
                "algo_type": [reg[n]["algo_type"] for n in names],
                "creator": [reg[n]["creator"] for n in names],
                "created_at": [reg[n]["created_at"] for n in names],
            }
        )

    def is_empty(self) -> bool:
        return not self._registry()

"""Named graph catalog — the engine's GraphStoreCatalog.

Reference: core/src/main/java/org/neo4j/gds/core/loading/
GraphStoreCatalog.java:46 (named multi-graph registry with
set/get/list/drop/exists; graphs are addressed by name everywhere in the
procedure surface). Here the registry is a JSON manifest next to the
persisted GraphStore directories, so the catalog survives process
restarts and is shared by every Ray driver pointing at the same root —
the catalog holds only METADATA (name → path + counts); graph payloads
stay in their partitioned parquet/npz layout and are lazily loaded.
"""

from __future__ import annotations

import os
import shutil
import time

import pandas as pd

from graph_data_science_ray._util import atomic_write_json, read_json
from graph_data_science_ray.state.graph import GraphStore


class GraphCatalog:
    """Persistent name → GraphStore registry rooted at a directory."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    @property
    def _registry_path(self) -> str:
        return os.path.join(self.root, "catalog.json")

    def _registry(self) -> dict:
        if not os.path.exists(self._registry_path):
            return {}
        return read_json(self._registry_path)

    def _write(self, reg: dict) -> None:
        atomic_write_json(self._registry_path, reg)

    # -- mutation ---------------------------------------------------------

    def set(self, name: str, graph: GraphStore, overwrite: bool = False) -> None:
        """Register an existing (already-projected) GraphStore under a name."""
        reg = self._registry()
        if name in reg and not overwrite:
            raise ValueError(f"graph {name!r} already exists in catalog")
        reg[name] = {
            "path": graph.path,
            "node_count": graph.node_count,
            "edge_count": graph.edge_count,
            "directed": graph.directed,
            "num_partitions": graph.num_partitions,
            "created_at": time.time(),
        }
        self._write(reg)

    def project(self, name: str, encoded_edges, overwrite: bool = False,
                **project_kwargs) -> GraphStore:
        """Project + register in one step; the graph lives under the
        catalog root (``root/name``), so drop() can reclaim it."""
        reg = self._registry()
        if name in reg and not overwrite:
            raise ValueError(f"graph {name!r} already exists in catalog")
        path = os.path.join(self.root, name)
        g = GraphStore.project(encoded_edges, path, **project_kwargs)
        self.set(name, g, overwrite=True)
        return g

    def drop(self, name: str, missing_ok: bool = False,
             delete_files: bool = True) -> None:
        reg = self._registry()
        if name not in reg:
            if missing_ok:
                return
            raise KeyError(name)
        entry = reg.pop(name)
        self._write(reg)
        # only delete payloads the catalog owns (under its root)
        p = os.path.abspath(entry["path"])
        if delete_files and p.startswith(os.path.abspath(self.root) + os.sep):
            shutil.rmtree(p, ignore_errors=True)

    # -- access -----------------------------------------------------------

    def exists(self, name: str) -> bool:
        return name in self._registry()

    def get(self, name: str) -> GraphStore:
        reg = self._registry()
        if name not in reg:
            raise KeyError(name)
        return GraphStore.load(reg[name]["path"])

    def list(self) -> pd.DataFrame:
        """Catalog listing (reference ``gds.graph.list``): one row per
        graph with its size metadata, name-sorted."""
        reg = self._registry()
        rows = [
            {
                "name": k,
                "node_count": v["node_count"],
                "edge_count": v["edge_count"],
                "directed": v["directed"],
                "num_partitions": v["num_partitions"],
                "path": v["path"],
            }
            for k, v in sorted(reg.items())
        ]
        return pd.DataFrame(
            rows,
            columns=["name", "node_count", "edge_count", "directed",
                     "num_partitions", "path"],
        )

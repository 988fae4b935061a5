"""Multi-relationship-type GraphStore.

Reference: core/src/main/java/org/neo4j/gds/core/loading/
CSRGraphStore.java:80-92 — a GraphStore holds one IdMap plus a
``Map<RelationshipType, SingleTypeRelationships>``; algorithms run on a
``getGraph(relationshipTypes)`` selection (the union of the chosen
types' topologies, parallel edges combined).

Here the typed edge table ``(rel_type, src, dst, weight)`` (from
``pipelines.edges.derive_edges_typed``) is the store payload — persisted
as type-partitioned parquet — and ``graph(types=...)`` projects the
selected union into a cached single-type :class:`GraphStore` on demand
(sum-combined parallel edges, the reference's default aggregation at
multi-type union). Selections are cached by type-set, so repeated
algorithm calls on the same selection reuse one projection — the
catalog's named-graph pattern one level down.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import ray.data as rd

from graph_data_science_ray.state.graph import GraphStore


class TypedGraphStore:
    """Relationship-type-keyed edge store + on-demand union projections."""

    def __init__(self, typed_edges: rd.Dataset, root: str, idmap,
                 num_partitions: int = 32, directed: bool = True):
        self.root = root
        self.idmap = idmap
        self.num_partitions = num_partitions
        self.directed = directed
        os.makedirs(root, exist_ok=True)
        self.edges = typed_edges.materialize()
        self._cache: dict = {}

    def types(self) -> list[str]:
        """Sorted distinct relationship types (small cardinality by
        construction — one per conversation/event type)."""
        t = (
            self.edges.groupby("rel_type")
            .count()
            .to_pandas()["rel_type"]
            .tolist()
        )
        return sorted(t)

    def edge_counts(self) -> pd.DataFrame:
        """(rel_type, n_edges, total_weight) — the catalog listing.

        Map-side partial groupby per batch (≤ |types| rows each) + a tiny
        driver combine: the full typed edge table never leaves the
        workers — only |types| × blocks partial rows do."""

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            return (
                df.groupby("rel_type")
                .agg(n_edges=("src", "size"), total_weight=("weight", "sum"))
                .reset_index()
            )

        parts = self.edges.map_batches(partial, batch_format="pandas").to_pandas()
        out = (
            parts.groupby("rel_type")
            .agg(n_edges=("n_edges", "sum"), total_weight=("total_weight", "sum"))
            .reset_index()
            .sort_values("rel_type")
            .reset_index(drop=True)
        )
        out["total_weight"] = out["total_weight"].astype(np.int64)
        return out

    def graph(self, types: list[str] | None = None) -> GraphStore:
        """Project the union of ``types`` (default: all) into a cached
        GraphStore; parallel edges across types combine with SUM."""
        sel = tuple(sorted(types)) if types is not None else ("*",)
        if sel in self._cache:
            return self._cache[sel]
        ds = self.edges
        if types is not None:
            tset = set(types)
            ds = ds.map_batches(
                lambda df: df[df["rel_type"].isin(tset)], batch_format="pandas"
            )

        def combine(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby(["src", "dst"], sort=False)["weight"].sum().reset_index()
            return g

        from graph_data_science_ray.pipelines.agg import hash_aggregate

        flat = hash_aggregate(
            ds.map_batches(
                lambda df: df[["src", "dst", "weight"]], batch_format="pandas"
            ),
            ["src", "dst"], "weight", op="sum",
            num_parts=self.num_partitions, out_col="weight",
        )
        tag = hashlib.md5("|".join(sel).encode()).hexdigest()[:10]
        g = GraphStore.project(
            flat.materialize(),
            os.path.join(self.root, f"sel-{tag}"),
            idmap=self.idmap,
            num_partitions=self.num_partitions,
            directed=self.directed,
        )
        self._cache[sel] = g
        return g

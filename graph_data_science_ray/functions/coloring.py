"""K-1 coloring and topological sort — iterative Dataset rounds.

References:
- k1coloring/K1Coloring.java:63 — greedy color assignment with
  conflict-resolution rounds: each round conflicted nodes pick the
  smallest color unused by their neighbors; a conflict (equal adjacent
  colors) is resolved by recoloring the higher node id.
- dag/topologicalsort/TopologicalSort.java:54 — iterative zero-in-degree
  peel; also yields the longest-path layer per node.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from graph_data_science_ray.pipelines.agg import hash_aggregate


def _recolor_active(
    sym_edges: rd.Dataset, colors: np.ndarray, active: np.ndarray, num_parts: int = 64
) -> pd.DataFrame:
    """Smallest free color per ACTIVE node, computed inside map_groups.

    For sorted distinct neighbor colors ``used``, the smallest free color
    is the first rank i with ``used[i] != i`` (else the run length) —
    one vectorized ``minimum.reduceat``, no per-node Python loop.
    """
    cref = ray.put(colors)
    aref = ray.put(active)

    def partial(t: pa.Table) -> pa.Table:
        c = ray.get(cref)
        a = ray.get(aref)
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        keep = a[src]
        df = pd.DataFrame({"node": src[keep], "color": c[dst[keep]]}).drop_duplicates()
        df["__part"] = (df["node"].to_numpy() % num_parts).astype(np.int64)
        return pa.Table.from_pandas(df, preserve_index=False)

    def choose(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(subset=["node", "color"]).sort_values(
            ["node", "color"], kind="mergesort"
        )
        node = g["node"].to_numpy(dtype=np.int64)
        color = g["color"].to_numpy(dtype=np.int64)
        if len(node) == 0:
            return pd.DataFrame(
                {"node": pd.Series([], dtype=np.int64),
                 "color": pd.Series([], dtype=np.int64)}
            )
        new = np.empty(len(node), dtype=bool)
        new[0] = True
        new[1:] = node[1:] != node[:-1]
        starts = np.flatnonzero(new)
        runlen = np.diff(np.append(starts, len(node)))
        rank = np.arange(len(node), dtype=np.int64) - np.repeat(starts, runlen)
        BIG = np.iinfo(np.int64).max
        cand = np.where(color != rank, rank, BIG)
        first = np.minimum.reduceat(cand, starts)
        free = np.where(first == BIG, runlen, first)
        return pd.DataFrame({"node": node[starts], "color": free.astype(np.int64)})

    return (
        sym_edges.map_batches(partial, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(choose, batch_format="pandas")
    ).to_pandas()


def k1_coloring(
    sym_edges: rd.Dataset, node_count: int, idmap=None, max_rounds: int = 100
) -> pd.DataFrame:
    """Greedy conflict-resolution coloring; returns (node, color)."""
    colors = np.zeros(node_count, dtype=np.int64)
    active = np.ones(node_count, dtype=bool)
    for _ in range(max_rounds):
        picks = _recolor_active(sym_edges, colors, active)
        new_colors = colors.copy()
        if len(picks):
            new_colors[picks["node"].to_numpy(dtype=np.int64)] = picks[
                "color"
            ].to_numpy(dtype=np.int64)
        colors = new_colors
        # conflicts: adjacent equal colors -> higher id recolors next round
        cref = ray.put(colors)

        def conflicts(t: pa.Table) -> pa.Table:
            c = ray.get(cref)
            src = t["src"].to_numpy(zero_copy_only=False)
            dst = t["dst"].to_numpy(zero_copy_only=False)
            bad = (c[src] == c[dst]) & (src > dst)
            return pa.table({"node": np.unique(src[bad]).astype(np.int64)})

        bad_df = sym_edges.map_batches(conflicts, batch_format="pyarrow").to_pandas()
        bad_nodes = bad_df["node"].unique() if "node" in bad_df.columns else []
        active = np.zeros(node_count, dtype=bool)
        if len(bad_nodes) == 0:
            break
        active[bad_nodes] = True
    node = idmap.keys if idmap is not None else np.arange(node_count, dtype=np.int64)
    return pd.DataFrame({"node": node, "color": colors})


def topological_sort(
    edges: rd.Dataset, node_count: int, idmap=None, max_rounds: int | None = None
) -> pd.DataFrame:
    """Zero-in-degree peel; returns (node, layer). Layer −1 marks nodes on
    or downstream of a cycle (never peeled) — the reference excludes them.
    """
    from graph_data_science_ray.functions.degree import degree_centrality

    layer = np.full(node_count, -1, dtype=np.int64)
    alive_edges = edges.materialize()
    indeg = np.zeros(node_count, dtype=np.int64)
    d = degree_centrality(alive_edges, node_count=node_count, orientation="reverse")
    indeg = d["degree"].to_numpy(dtype=np.int64).copy()
    assigned = np.zeros(node_count, dtype=bool)
    rounds = max_rounds or node_count + 1
    for it in range(rounds):
        frontier = np.flatnonzero((indeg == 0) & ~assigned)
        if len(frontier) == 0:
            break
        layer[frontier] = it
        assigned[frontier] = True
        fref = ray.put(assigned.copy())

        def peel(t: pa.Table, *, fref=fref) -> pa.Table:
            done = ray.get(fref)
            src = t["src"].to_numpy(zero_copy_only=False)
            dst = t["dst"].to_numpy(zero_copy_only=False)
            keep = ~done[src]
            # decrement in-degrees of targets of removed frontier edges
            frm = done[src]
            dec = np.bincount(dst[frm], minlength=len(done)).astype(np.int64)
            nz = np.flatnonzero(dec)
            rem = pa.table(
                {
                    "src": src[keep],
                    "dst": dst[keep],
                    "weight": t["weight"].to_numpy(zero_copy_only=False)[keep],
                }
            )
            return rem

        # recompute in-degree over the shrunken edge set (simpler than
        # deltas; each round is one filtered aggregate)
        alive_edges = alive_edges.map_batches(peel, batch_format="pyarrow").materialize()
        d = degree_centrality(alive_edges, node_count=node_count, orientation="reverse")
        indeg = d["degree"].to_numpy(dtype=np.int64)
        indeg[assigned] = -1
    node = idmap.keys if idmap is not None else np.arange(node_count, dtype=np.int64)
    return pd.DataFrame({"node": node, "layer": layer})

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


def _neighbor_color_sets(sym_edges: rd.Dataset, colors: np.ndarray) -> pd.DataFrame:
    cref = ray.put(colors)

    def partial(t: pa.Table) -> pa.Table:
        c = ray.get(cref)
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"node": src, "color": c[dst]}).drop_duplicates()
        df["partial"] = 1
        return pa.Table.from_pandas(df, preserve_index=False)

    return hash_aggregate(
        sym_edges.map_batches(partial, batch_format="pyarrow"),
        ["node", "color"], "partial", op="min",
    ).to_pandas()


def k1_coloring(
    sym_edges: rd.Dataset, node_count: int, idmap=None, max_rounds: int = 100
) -> pd.DataFrame:
    """Greedy conflict-resolution coloring; returns (node, color)."""
    colors = np.zeros(node_count, dtype=np.int64)
    active = np.ones(node_count, dtype=bool)
    for _ in range(max_rounds):
        ncs = _neighbor_color_sets(sym_edges, colors)
        # smallest free color per active node
        ncs = ncs.sort_values(["node", "color"], kind="mergesort")
        new_colors = colors.copy()
        for nd, grp in ncs[np.isin(ncs["node"], np.flatnonzero(active))].groupby(
            "node", sort=False
        ):
            used = grp["color"].to_numpy()
            c = 0
            for u in used:
                if u == c:
                    c += 1
                elif u > c:
                    break
            new_colors[nd] = c
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

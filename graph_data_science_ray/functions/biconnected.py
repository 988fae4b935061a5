"""Bridges and articulation points — Tarjan low-link over the shared CSR.

Reference: algo/src/main/java/org/neo4j/gds/bridges/Bridges.java and
articulationpoints/ArticulationPoints.java — the reference runs a single
sequential DFS with low-link values (the algorithm is inherently
sequential; GDS does not parallelize it either).  Here the DFS is one
Ray task reading the projected UNDIRECTED graph's CSR blocks zero-copy
from the object store (the ``dfs_preorder`` shape) — no edge table ever
reaches the driver; the result is O(V + #bridges).

Iterative (explicit-stack) Tarjan so recursion depth never limits graph
size.  The undirected parent edge is skipped ONCE per multiplicity
(parallel (v,parent) edges beyond the first count as back edges, the
standard multigraph convention), so duplicate edges correctly cancel
bridge-ness.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray


@ray.remote
def _tarjan_task(block_refs: list, node_count: int):
    blocks = ray.get(list(block_refs))
    starts = np.array([b["start"] for b in blocks], dtype=np.int64)

    def adj(v: int) -> np.ndarray:
        p = int(np.searchsorted(starts, v, side="right") - 1)
        b = blocks[p]
        lo = v - b["start"]
        return np.asarray(
            b["indices"][b["indptr"][lo] : b["indptr"][lo + 1]], dtype=np.int64
        )

    disc = np.full(node_count, -1, dtype=np.int64)
    low = np.zeros(node_count, dtype=np.int64)
    parent = np.full(node_count, -1, dtype=np.int64)
    timer = 0
    bridges: list[tuple[int, int]] = []
    artic = np.zeros(node_count, dtype=bool)

    for root in range(node_count):
        if disc[root] != -1:
            continue
        root_children = 0
        # stack entries: (v, iterator index into adj list, parent_skipped)
        stack = [(root, 0, False)]
        adj_cache: dict[int, np.ndarray] = {}
        while stack:
            v, i, skipped = stack.pop()
            if i == 0 and disc[v] == -1:
                disc[v] = low[v] = timer
                timer += 1
            nb = adj_cache.get(v)
            if nb is None:
                nb = adj(v)
                adj_cache[v] = nb
            advanced = False
            while i < len(nb):
                u = int(nb[i])
                i += 1
                if u == v:
                    continue  # self-loop
                if disc[u] == -1:
                    parent[u] = v
                    if v == root:
                        root_children += 1
                    stack.append((v, i, skipped))
                    stack.append((u, 0, False))
                    advanced = True
                    break
                if u == parent[v] and not skipped:
                    skipped = True  # first parent edge is the tree edge
                    continue
                if disc[u] < low[v]:
                    low[v] = disc[u]
            if advanced:
                continue
            # v finished: propagate low-link to its parent
            p = int(parent[v])
            if p >= 0:
                if low[v] < low[p]:
                    low[p] = low[v]
                if low[v] > disc[p]:
                    a, b2 = (p, v) if p < v else (v, p)
                    bridges.append((a, b2))
                if parent[p] >= 0 and low[v] >= disc[p]:
                    artic[p] = True
            adj_cache.pop(v, None)
        if root_children >= 2:
            artic[root] = True

    bridges.sort()
    br = np.asarray(bridges, dtype=np.int64).reshape(-1, 2)
    return br, np.flatnonzero(artic).astype(np.int64)


def bridges(graph) -> pd.DataFrame:
    """Bridge edges of the projected UNDIRECTED graph, (src, dst) with
    src < dst, sorted. One sequential task (the reference's own shape)."""
    br, _ap = ray.get(
        _tarjan_task.remote(graph.block_refs(), graph.node_count)
    )
    if graph.idmap is not None:
        return pd.DataFrame(
            {"src": graph.idmap.to_keys(br[:, 0]),
             "dst": graph.idmap.to_keys(br[:, 1])}
        )
    return pd.DataFrame({"src": br[:, 0], "dst": br[:, 1]})


def articulation_points(graph) -> pd.DataFrame:
    """Articulation points of the projected UNDIRECTED graph, sorted."""
    _br, ap = ray.get(
        _tarjan_task.remote(graph.block_refs(), graph.node_count)
    )
    node = graph.idmap.to_keys(ap) if graph.idmap is not None else ap
    return pd.DataFrame({"node": node})

"""Path catalog beyond SSSP: Yens K-shortest, A*, DFS, delta-stepping.

Reference semantics:
- Yens:  algo/src/main/java/org/neo4j/gds/paths/yens/Yens.java:41 —
  K loopless shortest paths via spur-node deviation with edge/node
  masking; candidates ranked by total cost.
- A*:    algo/src/main/java/org/neo4j/gds/paths/astar/AStar.java:37 —
  goal-directed Dijkstra; with an admissible heuristic the route equals
  the true shortest path while pruning expansions.
- DFS:   algo/src/main/java/org/neo4j/gds/paths/traverse/DFS.java —
  inherently sequential traversal; runs in ONE task over the shared CSR
  blocks (the reference itself is single-threaded here).
- Delta-stepping: paths/delta/DeltaStepping.java:51 — bucketed SSSP.
  Our kernel relaxes per-node (not per-edge-class), so buckets gate the
  ACTIVE NODE set: only nodes with tentative distance below the bucket
  bound scatter; the bound advances when a bucket settles. Same exact
  distances as Bellman-Ford, far fewer wasted relaxations on weighted
  graphs with spread-out distances.

Masked SSSP for Yens runs on the ONE projected CSR (no per-candidate
re-projection): banned edges in Yen's loop always originate at the spur
node, so the spur's scatter is replaced by seeding its allowed
neighbors' distances, and banned nodes are clamped to inf inside the
kernel — the full edge table is scanned exactly once per yens call.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from graph_data_science_ray.functions.sssp import SsspComputation
from graph_data_science_ray.state.graph import GraphStore
from graph_data_science_ray.state.pregel import Pregel


# ---------------------------------------------------------------------------
# Yens K-shortest loopless paths
# ---------------------------------------------------------------------------


class _MaskedSssp(SsspComputation):
    """SSSP with node bans and spur-edge bans on the SHARED CSR blocks.

    Banned nodes are clamped to inf (they never relax, relay, or appear
    on routes). Banned edges all originate at the spur (Yen's invariant),
    so the spur never scatters; instead its ALLOWED out-neighbors are
    seeded with their first-hop distance at init.
    """

    def __init__(self, spur: int, seed_ids: np.ndarray, seed_dist: np.ndarray,
                 banned_nodes: np.ndarray, weighted: bool = True):
        super().__init__(spur, weighted)
        self.seed_ids = seed_ids
        self.seed_dist = seed_dist
        self.banned = banned_nodes

    def init_state(self, block: dict) -> dict:
        n = block["end"] - block["start"]
        dist = np.full(n, np.inf, dtype=np.float64)
        changed = np.zeros(n, dtype=bool)
        if block["start"] <= self.source < block["end"]:
            dist[self.source - block["start"]] = 0.0  # spur: never scatters
        inb = (self.seed_ids >= block["start"]) & (self.seed_ids < block["end"])
        loc = self.seed_ids[inb] - block["start"]
        np.minimum.at(dist, loc, self.seed_dist[inb])
        changed[loc] = True
        ban = self.banned[(self.banned >= block["start"]) & (self.banned < block["end"])]
        bloc = ban - block["start"]
        dist[bloc] = np.inf
        changed[bloc] = False
        return {"dist": dist, "changed": changed, "_ban": bloc}

    def apply_messages(self, state, acc, received, block):
        new = np.minimum(state["dist"], acc)
        bloc = state["_ban"]
        new[bloc] = np.inf
        changed = new < state["dist"]
        state["dist"] = new
        state["changed"] = changed
        return {"changed": int(changed.sum())}


@ray.remote
def _out_adj(block, v: int):
    """(neighbors, weights) of one node from its owning CSR block."""
    lo = v - block["start"]
    s, e = int(block["indptr"][lo]), int(block["indptr"][lo + 1])
    nbrs = np.asarray(block["indices"][s:e], dtype=np.int64)
    w = (np.asarray(block["weights"][s:e], dtype=np.float64)
         if len(block["weights"]) else np.ones(e - s, dtype=np.float64))
    return nbrs, w


def _masked_route(
    graph,
    source_id: int,
    target_id: int,
    banned_edges: set[tuple[int, int]],
    banned_nodes: set[int],
    weighted: bool,
) -> tuple[list[int], list[float]]:
    """Shortest route on the masked graph, no re-projection;
    ([], []) if unreachable. All banned edges must start at source_id."""
    from graph_data_science_ray.functions.sssp import _pred_in_block

    blocks = graph.block_refs()
    own = int(np.searchsorted(graph.boundaries, source_id, side="right") - 1)
    nbrs, w = ray.get(_out_adj.remote(blocks[own], int(source_id)))
    if not weighted:
        w = np.ones(len(nbrs), dtype=np.float64)
    banned_dst = np.array(
        sorted(d for _s, d in banned_edges), dtype=np.int64
    )
    bn = np.array(sorted(banned_nodes), dtype=np.int64)
    keep = ~np.isin(nbrs, banned_dst)
    if len(bn):
        keep &= ~np.isin(nbrs, bn)
    keep &= nbrs != source_id
    seed_ids, seed_w = nbrs[keep], w[keep]
    if len(seed_ids) == 0:
        return [], []
    # parallel edges were aggregated at projection; ids are unique, but
    # guard with a min-combine anyway (np.minimum.at in init_state)
    comp = _MaskedSssp(int(source_id), seed_ids, seed_w, bn, weighted)
    engine = Pregel(graph, comp)
    refs = engine.run(max_iterations=graph.node_count + 2)
    dist = engine.gather(refs, "dist")
    if not np.isfinite(dist[target_id]):
        return [], []
    dist_ref = ray.put(dist)
    banned_dst_set = set(int(x) for x in banned_dst)
    path = [int(target_id)]
    while path[-1] != source_id:
        v = path[-1]
        excl = int(source_id) if v in banned_dst_set else -1
        cands = ray.get(
            [_pred_in_block.remote(b, v, dist_ref, weighted, excl)
             for b in blocks]
        )
        cands = [c for c in cands if c >= 0]
        if not cands:
            return [], []
        path.append(min(cands))
    path.reverse()
    return path, [float(dist[v]) for v in path]


def yens_k_shortest(
    edges: rd.Dataset,
    node_count: int,
    source_id: int,
    target_id: int,
    k: int = 3,
    weighted: bool = True,
    idmap=None,
    num_partitions: int = 4,
) -> pd.DataFrame:
    """K loopless shortest paths; returns (path_rank, total_cost, position,
    node). Ties between equal-cost candidates break on the lexicographically
    smaller node sequence (deterministic).
    """
    root_dir = tempfile.mkdtemp(prefix="gdsr-yens-", dir="/tmp")
    edges = edges.select_columns(["src", "dst", "weight"])
    g = GraphStore.project(
        edges, os.path.join(root_dir, "g"), node_count=node_count,
        num_partitions=num_partitions, directed=True,
    )
    first, dists0 = _masked_route(
        g, source_id, target_id, set(), set(), weighted,
    )
    if not first:
        return pd.DataFrame(
            {"path_rank": pd.Series([], dtype=np.int64),
             "total_cost": pd.Series([], dtype=np.float64),
             "position": pd.Series([], dtype=np.int64),
             "node": pd.Series([], dtype=np.int64)}
        )
    # A/B entries: (total_cost, path_nodes, cumulative_dists) — cumulative
    # distances let every spur read its root-prefix cost directly, no
    # driver-held edge-weight map.
    A: list[tuple[float, list[int], list[float]]] = [(dists0[-1], first, dists0)]
    B: list[tuple[float, list[int], list[float]]] = []
    n_proj = 1
    while len(A) < k:
        _, prev, prev_d = A[-1]
        for i in range(len(prev) - 1):
            root = prev[: i + 1]
            spur = prev[i]
            banned_edges = set()
            for _, p, _d in A:
                if len(p) > i and p[: i + 1] == root:
                    banned_edges.add((p[i], p[i + 1]))
            banned_nodes = set(root[:-1])
            sp, sp_d = _masked_route(
                g, spur, target_id, banned_edges, banned_nodes, weighted,
            )
            n_proj += 1
            if not sp:
                continue
            root_cost = prev_d[i]
            cand = root[:-1] + sp
            cand_d = prev_d[:i] + [root_cost + d for d in sp_d]
            total = cand_d[-1]
            if all(cand != p for _, p, _d in B) and all(cand != p for _, p, _d in A):
                B.append((total, cand, cand_d))
        if not B:
            break
        B.sort(key=lambda e: (e[0], e[1]))
        A.append(B.pop(0))
    rows = []
    for rank, (cost, path, _d) in enumerate(A, 1):
        for pos, node in enumerate(path):
            rows.append((rank, round(cost, 6), pos, node))
    out = pd.DataFrame(rows, columns=["path_rank", "total_cost", "position", "node"])
    if idmap is not None:
        out["node"] = idmap.to_keys(out["node"].to_numpy(dtype=np.int64))
    return out


# ---------------------------------------------------------------------------
# A* (goal-directed SSSP + route)
# ---------------------------------------------------------------------------


class _AStarComputation(SsspComputation):
    """SSSP relaxation gated by f = dist + h(v) <= bound.

    ``bound`` is the best known target distance (driver-updated between
    supersteps); with an admissible heuristic, pruned nodes cannot lie on
    a better path to the target, so final target distance is exact.
    """

    def __init__(self, source: int, heuristic: np.ndarray, weighted: bool = True):
        super().__init__(source, weighted)
        self.h = np.asarray(heuristic, dtype=np.float64)
        self.bound = np.inf

    def message_values(self, state, block):
        h = self.h[block["start"] : block["end"]]
        active = state["changed"] & (state["dist"] + h <= self.bound)
        return state["dist"], active


def haversine_heuristic(
    lat: np.ndarray, lon: np.ndarray, target_id: int,
    scale: float = 1.0,
) -> np.ndarray:
    """The reference's lat/long A* heuristic (algo/src/main/java/org/
    neo4j/gds/paths/astar/AStar.java: great-circle distance to the
    target, admissible when edge weights are ≥ ``scale`` × distance).

    ``lat``/``lon`` are per-dense-id degree arrays; returns the
    heuristic array for :func:`astar_route` in kilometres × ``scale``
    (mean Earth radius 6371.0088 km, the reference's constant)."""
    lat = np.radians(np.asarray(lat, dtype=np.float64))
    lon = np.radians(np.asarray(lon, dtype=np.float64))
    dlat = lat - lat[target_id]
    dlon = lon - lon[target_id]
    a = (
        np.sin(dlat / 2.0) ** 2
        + np.cos(lat) * np.cos(lat[target_id]) * np.sin(dlon / 2.0) ** 2
    )
    return scale * 2.0 * 6371.0088 * np.arcsin(np.minimum(np.sqrt(a), 1.0))


def astar_route(
    graph,
    source_id: int,
    target_id: int,
    heuristic: np.ndarray,
    weighted: bool = True,
    max_iterations: int | None = None,
) -> pd.DataFrame:
    """A* source→target route (position, node, distance).

    ``heuristic[v]`` must be an admissible lower bound on dist(v, target)
    (0 gives plain Dijkstra/Bellman-Ford behavior). Returns the same
    contract as ``shortest_path_route``; prunes scatter work via the
    evolving target bound.
    """
    from graph_data_science_ray.functions.sssp import _pred_in_block

    comp = _AStarComputation(source_id, heuristic, weighted)
    engine = Pregel(graph, comp)
    states = engine.init_states()
    max_iterations = max_iterations or graph.node_count + 2
    dist = None
    for _ in range(max_iterations):
        states, stats = engine.step(states)
        dist = engine.gather(states, "dist")
        comp.bound = float(dist[target_id])  # inf until target reached
        if stats.get("changed", 0) == 0:
            break
    if dist is None or not np.isfinite(dist[target_id]):
        return pd.DataFrame({"position": [], "node": [], "distance": []})
    dist_ref = ray.put(dist)
    blocks = graph.block_refs()
    path = [int(target_id)]
    while path[-1] != source_id:
        v = path[-1]
        cands = ray.get(
            [_pred_in_block.remote(b, v, dist_ref, weighted) for b in blocks]
        )
        cands = [c for c in cands if c >= 0]
        if not cands:
            break
        path.append(min(cands))
    path.reverse()
    nodes = np.array(path, dtype=np.int64)
    return pd.DataFrame(
        {
            "position": np.arange(len(path), dtype=np.int64),
            "node": graph.idmap.keys[nodes] if graph.idmap is not None else nodes,
            "distance": dist[nodes],
        }
    )


# ---------------------------------------------------------------------------
# Dijkstra (sequential binary heap — one task over shared CSR blocks)
# ---------------------------------------------------------------------------


@ray.remote
def _dijkstra_task(block_refs: list, source: int, target: int,
                   weighted: bool) -> tuple[np.ndarray, np.ndarray]:
    """Classic heap Dijkstra in one task with zero-copy CSR block reads.

    Reference: paths/dijkstra/Dijkstra.java:45 — the reference itself
    runs one sequential priority queue per source; this mirrors it for
    the source-target route case where the heap's early exit (stop when
    the target settles) beats a whole-graph relaxation fixpoint.
    Deterministic: ties settle by (distance, node id); predecessors pick
    the minimum tight sender id, matching ``shortest_path_route``.
    """
    import heapq

    blocks = ray.get(list(block_refs))
    starts = np.array([b["start"] for b in blocks], dtype=np.int64)

    def adj(v: int):
        p = int(np.searchsorted(starts, v, side="right") - 1)
        b = blocks[p]
        lo = v - b["start"]
        s, e = int(b["indptr"][lo]), int(b["indptr"][lo + 1])
        nbrs = b["indices"][s:e]
        w = (b["weights"][s:e] if weighted and len(b["weights"])
             else np.ones(e - s, dtype=np.float64))
        return nbrs, w

    dist: dict[int, float] = {int(source): 0.0}
    pred: dict[int, int] = {}
    done: set[int] = set()
    heap: list[tuple[float, int]] = [(0.0, int(source))]
    while heap:
        d, v = heapq.heappop(heap)
        if v in done:
            continue
        done.add(v)
        if v == target:
            break
        nbrs, w = adj(v)
        for u, wu in zip(nbrs.tolist(), w.tolist()):
            nd = d + wu
            old = dist.get(u)
            if old is None or nd < old or (nd == old and pred.get(u, u) > v):
                dist[u] = nd
                pred[u] = v
                heapq.heappush(heap, (nd, u))
    if target not in done:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.float64)
    path = [int(target)]
    while path[-1] != source:
        path.append(pred[path[-1]])
    path.reverse()
    nodes = np.asarray(path, dtype=np.int64)
    return nodes, np.array([dist[v] for v in path], dtype=np.float64)


def dijkstra_route(
    graph, source_id: int, target_id: int, weighted: bool = True
) -> pd.DataFrame:
    """Source→target shortest route via a real binary-heap Dijkstra.

    Same output contract as ``shortest_path_route`` (position, node,
    distance) and identical results (min-id tie-breaking); this variant
    settles only the nodes the heap reaches before the target, so on
    high-diameter graphs it does far less work than the BSP relaxation
    fixpoint. Runs in ONE task (the reference's per-source traversal is
    equally sequential); use ``shortest_paths`` for all-nodes distances.
    """
    nodes, dists = ray.get(
        _dijkstra_task.remote(
            graph.block_refs(), int(source_id), int(target_id), weighted
        )
    )
    if not len(nodes):
        return pd.DataFrame({"position": [], "node": [], "distance": []})
    return pd.DataFrame(
        {
            "position": np.arange(len(nodes), dtype=np.int64),
            "node": graph.idmap.keys[nodes] if graph.idmap is not None else nodes,
            "distance": dists,
        }
    )


# ---------------------------------------------------------------------------
# DFS (sequential traversal — one task over shared CSR blocks)
# ---------------------------------------------------------------------------


@ray.remote
def _dfs_task(block_refs: list, source: int, max_nodes: int) -> np.ndarray:
    blocks = ray.get(list(block_refs))
    starts = np.array([b["start"] for b in blocks], dtype=np.int64)

    def adj(v: int) -> np.ndarray:
        p = int(np.searchsorted(starts, v, side="right") - 1)
        b = blocks[p]
        lo = v - b["start"]
        return b["indices"][b["indptr"][lo] : b["indptr"][lo + 1]]

    seen = set()
    order = []
    stack = [int(source)]
    while stack and len(order) < max_nodes:
        v = stack.pop()
        if v in seen:
            continue
        seen.add(v)
        order.append(v)
        nbrs = np.asarray(adj(v), dtype=np.int64)
        # push descending so the SMALLEST neighbor pops first (deterministic
        # preorder; sorted-adjacency contract of the CSR)
        for u in np.unique(nbrs)[::-1]:
            if int(u) not in seen:
                stack.append(int(u))
    return np.asarray(order, dtype=np.int64)


def dfs_preorder(graph, source_id: int, max_nodes: int | None = None) -> pd.DataFrame:
    """Deterministic DFS preorder (smallest-id neighbor first); returns
    (order, node). The traversal is sequential by nature (matching the
    reference) and runs in one task with zero-copy block reads."""
    order = ray.get(
        _dfs_task.remote(
            graph.block_refs(), int(source_id), int(max_nodes or graph.node_count)
        )
    )
    node = graph.idmap.keys[order] if graph.idmap is not None else order
    return pd.DataFrame(
        {"order": np.arange(len(order), dtype=np.int64), "node": node}
    )


# ---------------------------------------------------------------------------
# Delta-stepping (bucketed SSSP)
# ---------------------------------------------------------------------------


class _BucketedSssp(SsspComputation):
    """SSSP with a pending set gated by the current distance bucket.

    ``pending`` marks nodes whose (improved) distance has not been
    scattered yet; only pending nodes inside ``[0, (bucket+1)·delta)``
    scatter. Apply clears pending for exactly the nodes that scattered
    this phase (recomputable from the old state + the same bound) and
    sets it for nodes that improved — so out-of-bucket improvements wait
    for their bucket instead of being forgotten.
    """

    def __init__(self, source: int, delta: float, weighted: bool = True):
        super().__init__(source, weighted)
        self.delta = float(delta)
        self.bucket = 0

    def init_state(self, block: dict) -> dict:
        base = super().init_state(block)
        return {"dist": base["dist"], "pending": base["changed"]}

    def message_values(self, state, block):
        limit = (self.bucket + 1) * self.delta
        active = state["pending"] & (state["dist"] < limit)
        return state["dist"], active

    def apply_messages(self, state, acc, received, block):
        limit = (self.bucket + 1) * self.delta
        scattered = state["pending"] & (state["dist"] < limit)
        new = np.minimum(state["dist"], acc)
        improved = new < state["dist"]
        state["dist"] = new
        state["pending"] = (state["pending"] & ~scattered) | improved
        return {
            "changed": int(improved.sum()),
            "pending_nodes": int(state["pending"].sum()),
        }


def delta_stepping(
    graph,
    source_id: int,
    delta: float = 2.0,
    weighted: bool = True,
    max_phases: int = 10_000,
) -> pd.DataFrame:
    """Bucketed SSSP (reference paths/delta/DeltaStepping.java:51).

    Nodes scatter only while their tentative distance falls inside the
    current bucket; a bucket settles when a phase improves nothing, then
    the bound jumps to the smallest pending distance's bucket. Exact
    distances (identical to Bellman-Ford), with relaxation work
    concentrated on the expanding frontier. Returns (node, distance) for
    reached nodes.
    """
    comp = _BucketedSssp(source_id, delta, weighted)
    engine = Pregel(graph, comp)
    states = engine.init_states()
    for _ in range(max_phases):
        states, stats = engine.step(states)
        if stats.get("changed", 0) > 0:
            continue
        if stats.get("pending_nodes", 0) == 0:
            break
        dist = engine.gather(states, "dist")
        pending = engine.gather(states, "pending").astype(bool)
        comp.bucket = int(dist[pending].min() // comp.delta)
    dist = engine.gather(states, "dist")
    mask = np.isfinite(dist)
    ids = np.flatnonzero(mask)
    node = graph.idmap.keys[ids] if graph.idmap is not None else ids
    return pd.DataFrame({"node": node, "distance": dist[mask]})

"""Single-source shortest paths (Bellman-Ford relaxation) and BFS depths.

Reference: algo/src/main/java/org/neo4j/gds/paths/bellmanford/BellmanFord.java:47
(parallel relaxation to fixpoint) and paths/traverse/BFS.java. The
relaxation ``dist(v) = min(dist(v), min_u(dist(u) + w(u,v)))`` is exactly
the BSP min-reducer with additive edge combine — groupby-min per
superstep (SURVEY.md §2.5 "iterative edge-relax via groupby-min").
Derived interaction weights are counts >= 1, but arbitrary projections
may carry negative weights: ``bellman_ford`` adds the reference's
negative-cycle detection (improvement after V rounds seeds a forward
taint propagation).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from graph_data_science_ray.state.pregel import Pregel, PregelComputation


class SsspComputation(PregelComputation):
    reducer = "min"
    message_dtype = "float64"

    def __init__(self, source: int, weighted: bool = True):
        self.source = int(source)
        self.edge_combine = "add" if weighted else "add_one"

    def init_state(self, block: dict) -> dict:
        n = block["end"] - block["start"]
        dist = np.full(n, np.inf, dtype=np.float64)
        if block["start"] <= self.source < block["end"]:
            dist[self.source - block["start"]] = 0.0
        return {"dist": dist, "changed": dist < np.inf}

    def message_values(self, state, block):
        return state["dist"], state["changed"]

    def apply_messages(self, state, acc, received, block):
        new = np.minimum(state["dist"], acc)
        changed = new < state["dist"]
        state["dist"] = new
        state["changed"] = changed
        return {"changed": int(changed.sum())}

    def is_converged(self, stats: dict) -> bool:
        return stats.get("init") is None and stats.get("changed", 1) == 0


def shortest_paths(
    graph,
    source_key=None,
    source_id: int | None = None,
    weighted: bool = True,
    max_iterations: int = 10_000,
    checkpoint_dir: str | None = None,
    resume: bool = True,
    async_local: bool = False,
) -> pd.DataFrame:
    """Distances from one source over a projected ``GraphStore``.

    Returns ``(node, distance)`` for REACHED nodes only. ``weighted=False``
    gives BFS hop counts.

    ``async_local=True``: async-messenger mode (partition-local
    relaxation fixpoint inside each apply task — see
    ``PregelComputation.async_local``); identical distances, fewer
    global supersteps/shuffles on long-diameter graphs.
    """
    if source_id is None:
        if source_key is None or graph.idmap is None:
            raise ValueError("need source_id or (source_key + idmap)")
        source_id = int(graph.idmap.to_ids(np.array([source_key], dtype="U"))[0])
    comp = SsspComputation(source_id, weighted=weighted)
    comp.async_local = bool(async_local)
    engine = Pregel(graph, comp, checkpoint_dir)
    refs = engine.run(max_iterations=max_iterations, resume=resume)
    dist = engine.gather(refs, "dist")
    mask = np.isfinite(dist)
    ids = np.flatnonzero(mask)
    node = graph.idmap.keys[ids] if graph.idmap is not None else ids
    return pd.DataFrame({"node": node, "distance": dist[mask]})


class _TaintProp(PregelComputation):
    """Forward OR-propagation from seed nodes (negative-cycle taint)."""

    reducer = "or"

    def __init__(self, seeds: np.ndarray):
        self.seeds = seeds

    def init_state(self, block: dict) -> dict:
        t = self.seeds[block["start"] : block["end"]].astype(bool)
        return {"taint": t.astype(np.uint64), "new": t.copy()}

    def message_values(self, state, block):
        return state["taint"], state["new"]

    def apply_messages(self, state, acc, received, block):
        got = (acc & np.uint64(1)).astype(bool)
        new = got & (state["taint"] == 0)
        state["taint"] = state["taint"] | new.astype(np.uint64)
        state["new"] = new
        return {"changed": int(new.sum())}

    def is_converged(self, stats):
        return stats.get("init") is None and stats.get("changed", 1) == 0


def bellman_ford(
    graph, source_key=None, source_id: int | None = None, weighted: bool = True
) -> pd.DataFrame:
    """Bellman-Ford with NEGATIVE-CYCLE detection.

    Reference: paths/bellmanford/BellmanFord.java:47 — the reference
    reports whether negative cycles are reachable and which results they
    poison. Relaxation runs at most V rounds (enough for any shortest
    path); if round V+1 still improves a distance, those nodes lie on a
    reachable negative cycle and seed a forward OR-propagation, so every
    node on or downstream of a cycle is flagged. Returns
    ``(node, distance, negative_cycle)`` for reached nodes — flagged rows'
    distances are NOT shortest-path values (they would diverge to -inf).
    """
    if source_id is None:
        if source_key is None or graph.idmap is None:
            raise ValueError("need source_id or (source_key + idmap)")
        source_id = int(graph.idmap.to_ids(np.array([source_key], dtype="U"))[0])
    comp = SsspComputation(int(source_id), weighted=weighted)
    engine = Pregel(graph, comp)
    states = engine.init_states()
    V = graph.node_count
    converged = False
    for _ in range(V):
        states, stats = engine.step(states)
        if stats.get("changed", 1) == 0:
            converged = True
            break
    taint = np.zeros(V, dtype=bool)
    if not converged:
        states, _stats = engine.step(states)  # the detection round
        seeds = engine.gather(states, "changed").astype(bool)
        if seeds.any():
            tp = Pregel(graph, _TaintProp(seeds))
            trefs = tp.run(max_iterations=V + 2)
            taint = tp.gather(trefs, "taint").astype(bool)
    dist = engine.gather(states, "dist")
    mask = np.isfinite(dist)
    ids = np.flatnonzero(mask)
    node = graph.idmap.keys[ids] if graph.idmap is not None else ids
    return pd.DataFrame(
        {
            "node": node,
            "distance": dist[mask],
            "negative_cycle": taint[ids].astype(np.int64),
        }
    )


def bfs_depths(graph, source_key=None, source_id=None, **kw) -> pd.DataFrame:
    """BFS depth from a source (unweighted shortest paths)."""
    out = shortest_paths(graph, source_key, source_id, weighted=False, **kw)
    return out.rename(columns={"distance": "depth"})


import ray as _ray


@_ray.remote
def _pred_in_block(block, v, dist, weighted, exclude_u: int = -1):
    """Find min-id predecessor of v within one CSR block: binary-search the
    destination-sorted edge layout, keep senders u with
    dist(u) + w(u,v) == dist(v). ``dist`` arrives as an auto-resolved
    broadcast ref (zero-copy). ``exclude_u`` drops one sender id (a
    masked edge u→v for Yens spur routes)."""
    import numpy as np

    ds = block["dst_sorted"]
    lo = np.searchsorted(ds, v, side="left")
    hi = np.searchsorted(ds, v, side="right")
    if lo == hi:
        return -1
    u = block["src_idx"][lo:hi].astype(np.int64) + block["start"]
    w = block["w_sorted"][lo:hi] if weighted else np.ones(hi - lo)
    ok = np.isfinite(dist[u]) & (dist[u] + w == dist[v]) & (u != exclude_u)
    return int(u[ok].min()) if ok.any() else -1


def shortest_path_route(
    graph, source_id: int, target_id: int, weighted: bool = True
) -> pd.DataFrame:
    """Reconstruct one shortest path (the Dijkstra/A* route contract,
    paths/dijkstra/Dijkstra.java:45): distances via the relaxation
    fixpoint, then a driver walk from the target — each step finds the
    minimum-id tight predecessor (dist(u) + w == dist(v)) by
    binary-searching the destination-sorted CSR blocks.

    Returns (position, node, distance); empty when unreachable.
    """
    import ray

    comp = SsspComputation(source_id, weighted=weighted)
    engine = Pregel(graph, comp)
    refs = engine.run(max_iterations=graph.node_count + 2)
    dist = engine.gather(refs, "dist")
    if not np.isfinite(dist[target_id]):
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

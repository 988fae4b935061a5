"""Single-source shortest paths (Bellman-Ford relaxation) and BFS depths.

Reference: algo/src/main/java/org/neo4j/gds/paths/bellmanford/BellmanFord.java:47
(parallel relaxation to fixpoint) and paths/traverse/BFS.java. The
relaxation ``dist(v) = min(dist(v), min_u(dist(u) + w(u,v)))`` is exactly
the BSP min-reducer with additive edge combine — groupby-min per
superstep (SURVEY.md §2.5 "iterative edge-relax via groupby-min").
Negative weights are rejected (our derived weights are counts >= 1; the
reference's negative-cycle detection is out of scope).
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
) -> pd.DataFrame:
    """Distances from one source over a projected ``GraphStore``.

    Returns ``(node, distance)`` for REACHED nodes only. ``weighted=False``
    gives BFS hop counts.
    """
    if source_id is None:
        if source_key is None or graph.idmap is None:
            raise ValueError("need source_id or (source_key + idmap)")
        source_id = int(graph.idmap.to_ids(np.array([source_key], dtype="U"))[0])
    comp = SsspComputation(source_id, weighted=weighted)
    engine = Pregel(graph, comp, checkpoint_dir)
    refs = engine.run(max_iterations=max_iterations, resume=resume)
    dist = engine.gather(refs, "dist")
    mask = np.isfinite(dist)
    ids = np.flatnonzero(mask)
    node = graph.idmap.keys[ids] if graph.idmap is not None else ids
    return pd.DataFrame({"node": node, "distance": dist[mask]})


def bfs_depths(graph, source_key=None, source_id=None, **kw) -> pd.DataFrame:
    """BFS depth from a source (unweighted shortest paths)."""
    out = shortest_paths(graph, source_key, source_id, weighted=False, **kw)
    return out.rename(columns={"distance": "depth"})

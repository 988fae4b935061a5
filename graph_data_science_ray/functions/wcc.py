"""Weakly connected components — exact min-id contract via hash-min BSP.

Reference: algo/src/main/java/org/neo4j/gds/wcc/Wcc.java:53-139 — parallel
union-find with Union-by-Min ("the smaller community ID wins",
core/src/main/java/org/neo4j/gds/core/utils/paged/dss/HugeAtomicDisjointSetStruct.java:171-179),
so the component id of a node is the minimum internal node id of its
component. The sampled strategy (SampledStrategy.java:45-401) is a
single-machine cache-locality optimization; the output contract is only
min-id components, which hash-min label propagation over the undirected
edge set reproduces exactly in O(diameter) supersteps.

Optional ``threshold``: only edges with ``weight > threshold`` union
(SampledStrategy.java:258-264) — applied as an edge filter before
projection by the caller, or here via the graph's weights at scatter time.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from graph_data_science_ray.state.pregel import Pregel, PregelComputation


class WccComputation(PregelComputation):
    reducer = "min"
    weighted = False

    def init_state(self, block: dict) -> dict:
        n = block["end"] - block["start"]
        comp = np.arange(block["start"], block["end"], dtype=np.int64)
        return {"component": comp, "changed": np.ones(n, dtype=bool)}

    def message_values(self, state, block):
        return state["component"], state["changed"]

    def apply_messages(self, state, acc, received, block):
        new = np.minimum(state["component"], acc)
        changed = new < state["component"]
        state["component"] = new
        state["changed"] = changed
        return {"changed": int(changed.sum())}

    def is_converged(self, stats: dict) -> bool:
        return stats.get("init") is None and stats.get("changed", 1) == 0


def wcc(
    graph,
    max_iterations: int = 200,
    checkpoint_dir: str | None = None,
    checkpoint_interval: int = 1,
    resume: bool = True,
    async_local: bool = False,
) -> pd.DataFrame:
    """Exact WCC over an **undirected** (symmetrized) ``GraphStore``.

    Returns ``(node, component)`` where component is the original key of
    the minimum-id member (IdMap is order-preserving, so min dense id ↔
    min original key).

    ``async_local=True`` enables the async-messenger execution mode
    (reference AsyncQueueMessenger.java:24 re-expressed for BSP: local
    edges relax to a partition-local fixpoint inside every apply task) —
    same min-id output, fewer global supersteps/shuffles on long-diameter
    graphs.
    """
    if graph.directed:
        raise ValueError("wcc requires an undirected projection (symmetrize the edge table)")
    comp = WccComputation()
    comp.async_local = bool(async_local)
    engine = Pregel(graph, comp, checkpoint_dir, checkpoint_interval)
    refs = engine.run(max_iterations=max_iterations, resume=resume)
    comp_ids = engine.gather(refs, "component")
    if graph.idmap is not None:
        return pd.DataFrame(
            {"node": graph.idmap.keys, "component": graph.idmap.to_keys(comp_ids)}
        )
    return pd.DataFrame(
        {"node": np.arange(graph.node_count, dtype=np.int64), "component": comp_ids}
    )


def wcc_ds(
    graph,
    max_iterations: int = 200,
    checkpoint_dir: str | None = None,
    checkpoint_interval: int = 1,
    resume: bool = True,
):
    """Dataset-returning WCC (the 10^10-node result contract): identical
    supersteps to :func:`wcc`, but the (node, component) result is
    assembled per partition in the object store via
    ``Pregel.gather_ds`` — no O(V) driver concatenation. Dense ids;
    compose with the idmap table for key-space output."""
    if graph.directed:
        raise ValueError("wcc requires an undirected projection (symmetrize the edge table)")
    comp = WccComputation()
    engine = Pregel(graph, comp, checkpoint_dir, checkpoint_interval)
    refs = engine.run(max_iterations=max_iterations, resume=resume)
    return engine.gather_ds(refs, "component")

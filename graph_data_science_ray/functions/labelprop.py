"""Label propagation — synchronous weighted majority vote, min-label ties.

Reference: algo/src/main/java/org/neo4j/gds/labelpropagation/LabelPropagation.java:45-176.
Semantics reproduced:
- init: label = seed property if given, else the node's own id (the
  reference's unseeded default ``maxLabelId + originalNodeId + 1`` is an
  order-preserving shift of the id space, InitStep.java:62-74 — we
  normalize to the id itself; community structure is identical);
- per round every node tallies neighbor votes, vote weight =
  ``relationshipWeight * nodeWeight(neighbor)`` (ComputeStepConsumer.java:49-58),
  adopts the max-weight label with ties broken by the smaller label id
  (ComputeStepConsumer.java:64-77), and keeps its label when it has no
  votes;
- convergence: a full round changes no label, or maxIterations
  (LabelPropagation.java:112-127).

The reference updates labels in-place within a round (semi-asynchronous
Gauss-Seidel). For determinism at any parallelism we run **fully
synchronous** (Jacobi) rounds — identical results on fixtures with a
unique fixpoint (SURVEY.md §2.1; the reference's own tests assert
community set-equivalence, test-utils/.../CommunityHelper.java:39-48).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from graph_data_science_ray.state.pregel import Pregel, PregelComputation


class LabelPropagationComputation(PregelComputation):
    reducer = "vote"

    def __init__(self, weighted: bool = True, seeds: np.ndarray | None = None,
                 node_weights: np.ndarray | None = None):
        self.weighted = bool(weighted)
        self.seeds = np.asarray(seeds, dtype=np.int64) if seeds is not None else None
        # the reference's nodeWeight(neighbor) factor
        # (ComputeStepConsumer.java:49-58); defaults to 1 for every node
        self.node_weights = (
            np.asarray(node_weights, dtype=np.float64) if node_weights is not None else None
        )

    def vote_node_weights(self, state, block):
        if self.node_weights is None:
            return None
        return self.node_weights[block["start"] : block["end"]]

    def init_state(self, block: dict) -> dict:
        n = block["end"] - block["start"]
        if self.seeds is not None:
            label = self.seeds[block["start"] : block["end"]].copy()
        else:
            label = np.arange(block["start"], block["end"], dtype=np.int64)
        return {"label": label, "changed": np.ones(n, dtype=bool)}

    def message_values(self, state, block):
        # every node votes every round (synchronous rounds over all nodes)
        return state["label"], np.ones(len(state["label"]), dtype=bool)

    def apply_messages(self, state, acc, received, block):
        # acc = winning label per local node (-1 where no votes)
        new = np.where(received, acc, state["label"])
        changed = new != state["label"]
        state["label"] = new
        state["changed"] = changed
        return {"changed": int(changed.sum())}

    def is_converged(self, stats: dict) -> bool:
        return stats.get("init") is None and stats.get("changed", 1) == 0


def label_propagation(
    graph,
    max_iterations: int = 10,
    weighted: bool = True,
    seeds=None,
    node_weights=None,
    checkpoint_dir: str | None = None,
    checkpoint_interval: int = 1,
    resume: bool = True,
) -> pd.DataFrame:
    """Synchronous label propagation over a ``GraphStore``.

    Returns ``(node, label)`` with labels mapped back to original keys.
    ``node_weights``: optional per-node vote multiplier (the reference's
    nodeWeight property).
    """
    comp = LabelPropagationComputation(weighted=weighted, seeds=seeds,
                                       node_weights=node_weights)
    engine = Pregel(graph, comp, checkpoint_dir, checkpoint_interval)
    refs = engine.run(max_iterations=max_iterations, resume=resume)
    labels = engine.gather(refs, "label")
    if graph.idmap is not None and seeds is None:
        return pd.DataFrame({"node": graph.idmap.keys, "label": graph.idmap.to_keys(labels)})
    node = (
        graph.idmap.keys
        if graph.idmap is not None
        else np.arange(graph.node_count, dtype=np.int64)
    )
    return pd.DataFrame({"node": node, "label": labels})


def label_propagation_ds(
    graph,
    max_iterations: int = 10,
    weighted: bool = True,
    seeds=None,
    node_weights=None,
):
    """Dataset-returning label propagation (the 10^10-node result
    contract): identical supersteps, (node, label) assembled per
    partition in the object store via ``Pregel.gather_ds`` — no O(V)
    driver array. Dense ids."""
    comp = LabelPropagationComputation(weighted=weighted, seeds=seeds,
                                       node_weights=node_weights)
    engine = Pregel(graph, comp)
    refs = engine.run(max_iterations=max_iterations)
    return engine.gather_ds(refs, "label")

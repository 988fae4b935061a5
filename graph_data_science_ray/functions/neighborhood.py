"""Neighborhood aggregations that need RAW message streams.

The reference's Pregel offers queue messengers (SyncQueueMessenger /
AsyncQueueMessenger, pregel/src/main/java/org/neo4j/gds/beta/pregel/
Pregel.java:152-158) carrying arbitrary per-message values, used by
algorithms whose per-node combine is not associative. ``reducer="queue"``
is this engine's counterpart; ``MedianNeighborComputation`` below is the
canonical example operator: per-node MEDIAN over in-neighbor property
values — no associative reducer computes a median, so it exercises the
queue path end-to-end (and is a useful robust-aggregation feature in its
own right).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from graph_data_science_ray.state.pregel import Pregel, PregelComputation


class MedianNeighborComputation(PregelComputation):
    """One queue superstep: every node sends its value along out-edges;
    each receiver stores the median of its (destination-sorted,
    deterministic-order) raw message queue."""

    reducer = "queue"
    message_dtype = "float64"

    def __init__(self, values: np.ndarray | None = None):
        # values: dense per-node property (global index); None -> node id
        self.values = (
            np.asarray(values, dtype=np.float64) if values is not None else None
        )

    def init_state(self, block: dict) -> dict:
        n = block["end"] - block["start"]
        if self.values is not None:
            val = self.values[block["start"]:block["end"]].astype(np.float64)
        else:
            val = np.arange(block["start"], block["end"], dtype=np.float64)
        return {"val": val, "median": np.full(n, np.nan)}

    def message_values(self, state: dict, block: dict):
        return state["val"], np.ones(len(state["val"]), dtype=bool)

    def apply_queues(self, state, msg_dst, msg_vals, received, block):
        if len(msg_dst):
            uniq, starts = np.unique(msg_dst, return_index=True)
            ends = np.append(starts[1:], len(msg_dst))
            med = np.array(
                [np.median(msg_vals[s:e]) for s, e in zip(starts, ends)]
            )
            state["median"][uniq] = med
        return {"active": 0}

    def is_converged(self, stats: dict) -> bool:
        return "init" not in stats  # exactly one messaging superstep


def median_neighbor_value(
    graph, values: np.ndarray | None = None, property_name: str | None = None
) -> pd.DataFrame:
    """Median of in-neighbor values per node → (node, median).

    ``values``: dense per-node array; or ``property_name``: a stored
    GraphStore node property; default: the node id itself. Nodes with no
    in-edges get NaN.
    """
    if values is None and property_name is not None:
        values = graph.node_property(property_name)
    engine = Pregel(graph, MedianNeighborComputation(values))
    refs = engine.run(max_iterations=2)
    med = engine.gather(refs, "median")
    node = (
        graph.idmap.keys if graph.idmap is not None
        else np.arange(graph.node_count, dtype=np.int64)
    )
    return pd.DataFrame({"node": node, "median": med})

"""HITS hubs & authorities — alternating sum-scatter on forward/reverse CSR.

Reference: alpha/alpha-proc/src/main/java/org/neo4j/gds/pregel/Hits.java:46
(Pregel bidirectional). Power iteration:
``auth = A^T hub``  (push hub along forward edges),
``hub  = A auth``   (push auth along reverse edges).
Per-iteration L2 normalization only rescales the vectors — direction is
identical — so ``normalize=False`` runs the exact integer-valued power
iteration (hash-stable for the SQL oracle) and ``normalize=True`` matches
the reference's normalized outputs.

Requires the reverse projection to share the forward graph's partition
boundaries (pass ``boundaries=gd.boundaries`` when projecting it).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from graph_data_science_ray.state.pregel import Pregel, PregelComputation


class _PushSum(PregelComputation):
    """One sum-scatter: read ``src_key``, store the sums into ``dst_key``."""

    reducer = "sum"
    weighted = False

    def __init__(self, src_key: str, dst_key: str):
        self.src_key = src_key
        self.dst_key = dst_key

    def init_state(self, block: dict) -> dict:
        n = block["end"] - block["start"]
        return {"hub": np.ones(n, dtype=np.float64), "auth": np.ones(n, dtype=np.float64)}

    def message_values(self, state, block):
        v = state[self.src_key]
        return v, np.ones(len(v), dtype=bool)

    def apply_messages(self, state, acc, received, block):
        state[self.dst_key] = acc
        return {"sumsq": float((acc * acc).sum())}

    def is_converged(self, stats):
        return False


def hits(
    gd,
    grev,
    iterations: int = 3,
    normalize: bool = True,
) -> pd.DataFrame:
    """HITS over a directed ``GraphStore`` and its reverse projection.

    Returns ``(node, hub, auth)``.
    """
    if not np.array_equal(gd.boundaries, grev.boundaries):
        raise ValueError("forward and reverse graphs must share partition boundaries")
    fwd_engine = Pregel(gd, _PushSum("hub", "auth"))
    rev_engine = Pregel(grev, _PushSum("auth", "hub"))
    states = fwd_engine.init_states()
    import ray

    for _ in range(iterations):
        states, a_stats = fwd_engine.step(states)  # auth = A^T hub
        if normalize:
            states = _scale(states, "auth", 1.0 / max(np.sqrt(a_stats["sumsq"]), 1e-300))
        states, h_stats = rev_engine.step(states)  # hub = A auth
        if normalize:
            states = _scale(states, "hub", 1.0 / max(np.sqrt(h_stats["sumsq"]), 1e-300))
    hub = fwd_engine.gather(states, "hub")
    auth = fwd_engine.gather(states, "auth")
    node = (
        gd.idmap.keys if gd.idmap is not None else np.arange(gd.node_count, dtype=np.int64)
    )
    return pd.DataFrame({"node": node, "hub": hub, "auth": auth})


def _scale(state_refs: list, key: str, factor: float) -> list:
    import ray

    @ray.remote
    def scale(state, key, factor):
        state = {k: v.copy() for k, v in state.items()}
        state[key] = state[key] * factor
        return state

    return [scale.remote(s, key, factor) for s in state_refs]

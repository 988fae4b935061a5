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


class _PushQuotientSum(PregelComputation):
    """One SALSA half-step: push ``floor(src_key / out_degree)``, store
    the per-destination sums into ``dst_key``.

    The degree array is the scatter-side CSR block's own out-degrees
    (``block["degrees"]``), so the division is partition-local — no
    degree table ships anywhere.
    """

    reducer = "sum"
    weighted = False

    def __init__(self, src_key: str, dst_key: str):
        self.src_key = src_key
        self.dst_key = dst_key

    def init_state(self, block: dict) -> dict:
        n = block["end"] - block["start"]
        return {
            "hub": np.ones(n, dtype=np.float64),
            "auth": np.ones(n, dtype=np.float64),
        }

    def message_values(self, state, block):
        v = state[self.src_key]
        deg = np.asarray(block["degrees"], dtype=np.float64)
        out = np.where(deg > 0, np.floor(v / np.maximum(deg, 1.0)), 0.0)
        return out, deg > 0

    def apply_messages(self, state, acc, received, block):
        state[self.dst_key] = acc
        return {}

    def is_converged(self, stats):
        return False


def salsa(
    gd,
    grev,
    iterations: int = 3,
    scale: int = 1 << 20,
) -> pd.DataFrame:
    """SALSA hubs & authorities with the exact integer floor contract.

    SALSA (Lempel & Moran, "The stochastic approach for link-structure
    analysis", ACM TOIS 2001) is HITS with random-walk normalization:
    each half-step divides a node's mass by its degree before pushing —
    ``auth(v) = Σ_{u→v} h(u)/outdeg(u)``, ``hub(u) = Σ_{u→v}
    a(v)/indeg(v)``.  Here both divisions floor to integers
    (``h⁰ = scale``), so every value is an exact integer float64,
    order-independent under summation, bit-identical at any parallelism
    and replayable verbatim by a per-round SQL mirror (``//`` on
    nonnegative integers == floor) — the ``katz``/``eigenvector_exact``
    discipline applied to the two-sided walk.  Keep
    ``V · scale < 2^53``.

    ``grev`` must share ``gd``'s partition boundaries (the HITS
    bidirectional contract above).  Returns ``(node, hub, auth)`` as
    int64 after ``iterations`` full rounds.
    """
    if not np.array_equal(gd.boundaries, grev.boundaries):
        raise ValueError("forward and reverse graphs must share partition boundaries")
    fwd = Pregel(gd, _PushQuotientSum("hub", "auth"))
    rev = Pregel(grev, _PushQuotientSum("auth", "hub"))
    states = fwd.init_states()
    states = _scale(states, "hub", float(scale))
    states = _scale(states, "auth", 0.0)
    for _ in range(int(iterations)):
        states, _a = fwd.step(states)   # auth = Σ floor(hub / outdeg)
        states, _h = rev.step(states)   # hub  = Σ floor(auth / indeg)
    hub = fwd.gather(states, "hub").astype(np.int64)
    auth = fwd.gather(states, "auth").astype(np.int64)
    node = (
        gd.idmap.keys if gd.idmap is not None
        else np.arange(gd.node_count, dtype=np.int64)
    )
    return pd.DataFrame({"node": node, "hub": hub, "auth": auth})

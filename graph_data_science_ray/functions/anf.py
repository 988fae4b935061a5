"""HyperANF — approximate neighborhood function / effective diameter.

Boldi, Rosa & Vigna, "HyperANF: Approximating the Neighbourhood
Function of Very Large Graphs on a Budget" (WWW 2011): every node
carries a HyperLogLog counter of the ball of nodes within ``t`` hops;
one BSP round unions each node's counter with its neighbours', so
after ``t`` rounds node ``v``'s counter estimates ``|B(v, t)|`` and the
neighbourhood function ``N(t)`` is the sum of those estimates. O(V·m)
state, O(E·m) traffic per round — the only known way to touch
diameter / average-distance questions on a 10^12-edge graph without an
all-pairs computation (our exact MSBFS path, ``functions/apsp.py``, is
the small-graph complement).

Re-expression on the BSP kernel: a node's state is ``m`` HLL registers
encoded as THERMOMETER bitmasks (register value ``rho`` ↔ low ``rho``
bits set), so the register-wise ``max`` merge HyperANF needs is exactly
the kernel's bitwise-OR reducer over ``(n, m)`` uint64 vector messages
(the MSBFS 64-way trick lifted to vectors). Determinism contract:
register init hashes the node's DENSE id string through md5 (the
repo's engine-independent ``fingerprint`` idiom, stages/sketch.py), so
the register table after any pinned round count is bit-exactly
reproducible in ANSI SQL — the driver oracle checks the integer
registers verbatim, never the float estimate. The frontier flag keeps
post-fixpoint rounds no-ops (monotone OR), matching the fixed-round
SQL contract the repo uses for every iterative oracle (ROADMAP.md).

Reference scope note: the reference engine (Neo4j GDS) has no ANF
surface; this extends the engine for web-scale graph characterization
per the build brief, alongside the exact ``hop_distribution`` query it
approximates.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import ray

from graph_data_science_ray.state.pregel import Pregel, PregelComputation

__all__ = [
    "anf_registers",
    "anf_registers_ds",
    "neighborhood_function",
    "effective_diameter",
]

_B = 4  # register-index bits; m = 16 registers per node
_M = 1 << _B
_WBITS = 32 - _B  # 28-bit rho window; max rho 29 << 64 thermometer bits


def _init_registers(gids: np.ndarray) -> np.ndarray:
    """(n, m) thermometer-encoded registers: node ``g`` contributes rank
    ``rho(md5(str(g)))`` to register ``md5(str(g)) >> _WBITS``."""
    h32 = np.fromiter(
        (
            int(hashlib.md5(str(g).encode("utf-8")).hexdigest()[:8], 16)
            for g in gids
        ),
        dtype=np.int64,
        count=len(gids),
    )
    j = (h32 >> _WBITS).astype(np.int64)
    w = h32 & ((1 << _WBITS) - 1)
    # exact integer bit length (w < 2^28 is float64-exact)
    bl = np.frexp(w.astype(np.float64))[1].astype(np.int64)
    rho = np.where(w == 0, np.int64(_WBITS + 1), np.int64(_WBITS + 1) - bl)
    regs = np.zeros((len(gids), _M), dtype=np.uint64)
    regs[np.arange(len(gids)), j] = (
        np.uint64(1) << rho.astype(np.uint64)
    ) - np.uint64(1)
    return regs


def _rho_from_thermo(regs: np.ndarray) -> np.ndarray:
    """Register values from thermometer words: rho = popcount = bit
    length (words are 2^rho - 1 < 2^30, float64-exact)."""
    return np.frexp(regs.astype(np.float64))[1].astype(np.int64)


class _HyperAnf(PregelComputation):
    reducer = "or"

    def init_state(self, block: dict) -> dict:
        start, end = block["start"], block["end"]
        regs = _init_registers(np.arange(start, end, dtype=np.int64))
        return {
            "regs": regs,
            "frontier": np.ones(end - start, dtype=bool),
        }

    def message_values(self, state, block):
        return state["regs"], state["frontier"]

    def apply_messages(self, state, acc, received, block):
        new = state["regs"] | acc.astype(np.uint64)
        changed = (new != state["regs"]).any(axis=1)
        state["regs"] = new
        state["frontier"] = changed
        return {"changed": int(changed.sum())}

    def is_converged(self, stats):
        return stats.get("init") is None and stats.get("changed", 1) == 0


def _run(graph, rounds: int) -> tuple[Pregel, list]:
    engine = Pregel(graph, _HyperAnf())
    states = engine.init_states()
    for _ in range(int(rounds)):
        states, stats = engine.step(states)
        if stats.get("changed", 1) == 0:
            break  # monotone fixpoint: further rounds are no-ops
    return engine, states


@ray.remote
def _registers_block(state: dict, start: int, end: int):
    import pyarrow as pa

    rho = _rho_from_thermo(state["regs"])  # (n, m)
    n = end - start
    return pa.table(
        {
            "node": pa.array(np.repeat(np.arange(start, end, dtype=np.int64), _M)),
            "register": pa.array(np.tile(np.arange(_M, dtype=np.int64), n)),
            "rho": pa.array(rho.reshape(-1)),
        }
    )


def anf_registers_ds(graph, rounds: int = 3):
    """Dataset of ``(node, register, rho)`` — every node's m=16 HLL
    registers after ``rounds`` BSP rounds (``rho`` integer, 0 = empty).
    Built per partition in the object store (the 10^10-node contract:
    the driver touches only P refs)."""
    import ray.data as rd

    engine, states = _run(graph, rounds)
    refs = [
        _registers_block.remote(
            states[p],
            int(graph.boundaries[p]),
            int(graph.boundaries[p + 1]),
        )
        for p in range(len(states))
    ]
    return rd.from_arrow_refs(refs)


def anf_registers(graph, rounds: int = 3) -> pd.DataFrame:
    """Small-result convenience wrapper over :func:`anf_registers_ds`
    with dense ids decoded to keys (sorted by (node, register))."""
    out = anf_registers_ds(graph, rounds).to_pandas()
    if graph.idmap is not None:
        out["node"] = graph.idmap.keys[out["node"].to_numpy(dtype=np.int64)]
    return (
        out.sort_values(["node", "register"]).reset_index(drop=True)
    )


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


@ray.remote
def _estimate_block(state: dict) -> float:
    """Sum of per-node HLL estimates (with the small-range linear
    counting correction) over one partition."""
    rho = _rho_from_thermo(state["regs"]).astype(np.float64)  # (n, m)
    m = float(_M)
    raw = _alpha(_M) * m * m / np.power(2.0, -rho).sum(axis=1)
    zeros = (rho == 0).sum(axis=1)
    small = (raw <= 2.5 * m) & (zeros > 0)
    lin = m * np.log(m / np.maximum(zeros, 1))
    est = np.where(small, lin, raw)
    return float(est.sum())


def neighborhood_function(graph, rounds: int = 8) -> pd.DataFrame:
    """``(t, n_pairs_est)`` for t = 0..rounds: the estimated number of
    (source, target) pairs within distance t — HyperANF's N(t). t=0 is
    the exact node count; the curve is monotone and converges when no
    register changes (reported rounds stop there)."""
    engine = Pregel(graph, _HyperAnf())
    states = engine.init_states()
    ts = [0]
    ests = [float(graph.node_count)]
    for t in range(1, int(rounds) + 1):
        states, stats = engine.step(states)
        est = sum(ray.get([_estimate_block.remote(s) for s in states]))
        ts.append(t)
        ests.append(est)
        if stats.get("changed", 1) == 0:
            break
    return pd.DataFrame({"t": np.array(ts, dtype=np.int64), "n_pairs_est": ests})


def effective_diameter(graph, q: float = 0.9, max_rounds: int = 64) -> dict:
    """Smallest t with N(t) >= q * N(converged) plus the full curve —
    the HyperANF effective-diameter readout."""
    nf = neighborhood_function(graph, rounds=max_rounds)
    target = q * float(nf["n_pairs_est"].iloc[-1])
    hit = nf[nf["n_pairs_est"] >= target]
    return {
        "effective_diameter": int(hit["t"].iloc[0]) if len(hit) else None,
        "q": float(q),
        "curve": nf,
    }

"""Maximal independent set — Luby's algorithm as two BSP sub-steps/round.

Luby's classic distributed MIS (Luby, "A Simple Parallel Algorithm for
the Maximal Independent Set Problem", SIAM J. Comput. 1986): every node
draws a priority; an undecided node joins the set when its priority
beats every undecided neighbor's, and neighbors of freshly selected
nodes drop out.  O(log n) rounds w.h.p., each round two message
exchanges — the canonical BSP algorithm shape, so it rides the repo's
Pregel kernel as two alternating min-reducer computations sharing state
(the HITS two-engine pattern, ``functions/hits.py``).

Determinism contract: priorities are ``u48(md5("mis:<dense_id>"))`` —
fixed, distinct w.h.p., engine-independent — and selection uses strict
``<``, so the whole trajectory (which node is selected in which round)
is a pure function of the graph.  A per-round SQL mirror (materialized
CTEs, one select + one deactivate layer per round) reproduces every
status bit-exactly; the driver oracle checks all V rows.

Output statuses: 1 = in the MIS, 2 = excluded (has an MIS neighbor),
0 = undecided (only if ``rounds`` stopped before the fixpoint — the
bounded-round contract; at the fixpoint the set is maximal, which
``tests/test_wl_mis.py`` asserts directly).

Reference parity note: Neo4j GDS has no MIS procedure; this is a
beyond-reference distributed-algorithm showcase (independent sets are
the standard building block for parallel greedy coloring / matching —
our ``k1_coloring`` is the sibling surface).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from graph_data_science_ray.state.pregel import Pregel, PregelComputation

_PRI_HEX = 12  # u48 priorities

_UNDECIDED = 0
_IN = 1
_OUT = 2


def _priorities(start: int, end: int) -> np.ndarray:
    return np.array(
        [
            int(hashlib.md5(f"mis:{i}".encode()).hexdigest()[:_PRI_HEX], 16)
            for i in range(start, end)
        ],
        dtype=np.int64,
    )


class _SelectStep(PregelComputation):
    """Undecided nodes broadcast their priority; local minima join."""

    reducer = "min"
    message_dtype = "int64"

    def init_state(self, block: dict) -> dict:
        n = block["end"] - block["start"]
        return {
            "pri": _priorities(block["start"], block["end"]),
            "status": np.zeros(n, dtype=np.int64),
        }

    def message_values(self, state, block):
        return state["pri"], state["status"] == _UNDECIDED

    def apply_messages(self, state, acc, received, block):
        und = state["status"] == _UNDECIDED
        # acc is int64.max identity for nodes with no undecided neighbor
        win = und & (state["pri"] < acc)
        state["status"] = np.where(win, _IN, state["status"])
        return {"selected": int(win.sum())}

    def is_converged(self, stats):
        return False


class _DeactivateStep(PregelComputation):
    """MIS members announce; undecided receivers drop out."""

    reducer = "min"
    message_dtype = "int64"

    def init_state(self, block: dict) -> dict:  # pragma: no cover - unused
        raise NotImplementedError("shares _SelectStep state")

    def message_values(self, state, block):
        return np.zeros(len(state["pri"]), dtype=np.int64), state["status"] == _IN

    def apply_messages(self, state, acc, received, block):
        out = (state["status"] == _UNDECIDED) & received
        state["status"] = np.where(out, _OUT, state["status"])
        und = int((state["status"] == _UNDECIDED).sum())
        return {"undecided": und}

    def is_converged(self, stats):
        return False


def maximal_independent_set(graph, rounds: int = 8) -> pd.DataFrame:
    """Luby MIS over an **undirected** ``GraphStore``.

    Runs up to ``rounds`` select+deactivate rounds (stopping early once
    no node is undecided — post-fixpoint rounds are no-ops, so a pinned
    SQL round count stays exact).  Returns ``(node, status)``.
    """
    if graph.directed:
        raise ValueError("maximal_independent_set requires an undirected projection")
    sel_engine = Pregel(graph, _SelectStep())
    deact_engine = Pregel(graph, _DeactivateStep())
    states = sel_engine.init_states()
    for _ in range(int(rounds)):
        states, _s = sel_engine.step(states)
        states, d = deact_engine.step(states)
        if d.get("undecided", 1) == 0:
            break
    status = sel_engine.gather(states, "status").astype(np.int64)
    node = (
        graph.idmap.keys
        if graph.idmap is not None
        else np.arange(graph.node_count, dtype=np.int64)
    )
    return pd.DataFrame({"node": node, "status": status})


def maximal_independent_set_ds(graph, rounds: int = 8):
    """Dataset-returning variant of :func:`maximal_independent_set` —
    per-partition ``(node, status)`` blocks, no driver gather."""
    if graph.directed:
        raise ValueError("maximal_independent_set requires an undirected projection")
    sel_engine = Pregel(graph, _SelectStep())
    deact_engine = Pregel(graph, _DeactivateStep())
    states = sel_engine.init_states()
    for _ in range(int(rounds)):
        states, _s = sel_engine.step(states)
        states, d = deact_engine.step(states)
        if d.get("undecided", 1) == 0:
            break
    return sel_engine.gather_ds(states, "status")

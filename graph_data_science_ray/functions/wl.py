"""1-dimensional Weisfeiler-Leman color refinement over the BSP kernel.

The classic 1-WL iteration assigns every node a color and refines it by
hashing the multiset of neighbor colors:

    c_v^{r+1} = HASH(c_v^r, {{ c_u^r : u ~ v }})

WL colors are the canonical structural node feature of the graph-ML
literature (they upper-bound message-passing GNN expressivity —
Xu et al., "How Powerful are Graph Neural Networks?", ICLR 2019; the
refinement itself goes back to Weisfeiler & Leman 1968) and double as a
cheap graph-isomorphism invariant / structural-role fingerprint.

Exactness contract (the repo's integer fixed-round discipline):

* initial color ``c_v^0 = u48(md5("wl:init"))`` — UNIFORM across nodes
  (classic WL starts from the trivial coloring, so structurally
  equivalent nodes share colors at every round; 48-bit keeps every
  color an exact integer float64);
* the neighbor multiset is hashed as the SUM of per-element hashes
  ``h(c) = u36(md5("wlh:<c>"))`` — summation is commutative and exact
  (``deg_max · 2^36 < 2^53`` ⇔ ``deg_max < 131072``; split the hash
  into two narrower registers for hub degrees beyond that), so the
  reduction is order-independent and bit-identical at any parallelism,
  and two different neighbor multisets collide only with probability
  ~2^-36 per pair (the per-element md5 makes the sum a genuine multiset
  hash — a plain sum of raw colors would systematically collide, e.g.
  {1,3} vs {2,2});
* refined color ``c_v^{r+1} = u48(md5("wlc:<c_v^r>:<m_v>"))`` with
  ``m_v`` the neighbor-hash sum (0 for isolated nodes).

Every quantity is an integer reproducible verbatim by a per-round SQL
mirror (DuckDB ``md5`` + hex-prefix casts), so the driver oracle checks
all V colors bit-exactly — same contract as ``eigenvector_exact`` /
``katz``.

Reference parity note: Neo4j GDS has no WL procedure; this is one of the
beyond-reference graph-ML feature operators (alongside HashGNN, which
cites the same locality-sensitive-hash lineage).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from graph_data_science_ray.state.pregel import Pregel, PregelComputation

_COLOR_HEX = 12  # u48 colors
_ELEM_HEX = 9  # u36 per-element multiset hashes


def _md5_u(prefix: str, vals, hex_chars: int) -> np.ndarray:
    """Vectorized-enough md5 → first ``hex_chars`` hex chars as int64.

    Per-node (not per-edge) work: V hashes per round per partition. At
    10^10 nodes swap the Python loop for a C-speed digest over the
    partition block (the strings are short and the loop is the only
    non-numpy step in the round)."""
    return np.array(
        [
            int(hashlib.md5(f"{prefix}{v}".encode()).hexdigest()[:hex_chars], 16)
            for v in vals
        ],
        dtype=np.int64,
    )


class _WLComputation(PregelComputation):
    """One refinement round per superstep: push h(color), re-hash."""

    reducer = "sum"
    weighted = False

    def init_state(self, block: dict) -> dict:
        n = block["end"] - block["start"]
        c0 = int(hashlib.md5(b"wl:init").hexdigest()[:_COLOR_HEX], 16)
        color = np.full(n, c0, dtype=np.int64)
        h = _md5_u("wlh:", [c0], _ELEM_HEX)[0] * np.ones(n, dtype=np.int64)
        return {
            "color": color.astype(np.float64),
            "h": h.astype(np.float64),
        }

    def message_values(self, state, block):
        v = state["h"]
        return v, np.ones(len(v), dtype=bool)

    def apply_messages(self, state, acc, received, block):
        c = state["color"].astype(np.int64)
        # enforce the documented exactness bound (deg_max·2^36 < 2^53):
        # beyond it the float64 neighbor-hash sum silently loses bits and
        # the bit-exact SQL-mirror contract breaks — fail loudly instead
        if len(acc) and float(np.max(acc)) >= float(1 << 53):
            raise OverflowError(
                "WL neighbor-hash sum exceeds 2^53 (a hub has degree "
                ">= 131072): the float64-carried multiset hash is no "
                "longer exact — split h(c) into two narrower registers "
                "(two message channels) as documented in functions/wl.py"
            )
        m = acc.astype(np.int64)  # exact integer sums (bound enforced above)
        new = _md5_u("wlc:", [f"{cv}:{mv}" for cv, mv in zip(c, m)], _COLOR_HEX)
        state["color"] = new.astype(np.float64)
        state["h"] = _md5_u("wlh:", new, _ELEM_HEX).astype(np.float64)
        return {"distinct_local": int(len(np.unique(new)))}

    def is_converged(self, stats):
        return False


def wl_colors(graph, rounds: int = 3) -> pd.DataFrame:
    """1-WL color refinement over an **undirected** ``GraphStore``.

    Runs exactly ``rounds`` refinement supersteps (fixed-round contract;
    running past the stable partition only re-labels colors bijectively)
    and returns ``(node, color)`` with ``color`` the final u48 integer.
    Nodes with equal colors are 1-WL-indistinguishable after ``rounds``
    hops (up to the documented ~2^-36 multiset-hash collision rate).
    """
    if graph.directed:
        raise ValueError("wl_colors requires an undirected projection")
    engine = Pregel(graph, _WLComputation())
    states = engine.init_states()
    for _ in range(int(rounds)):
        states, _stats = engine.step(states)
    colors = engine.gather(states, "color").astype(np.int64)
    node = (
        graph.idmap.keys
        if graph.idmap is not None
        else np.arange(graph.node_count, dtype=np.int64)
    )
    return pd.DataFrame({"node": node, "color": colors})


def wl_partition_sizes(graph, rounds: int = 3) -> pd.DataFrame:
    """Color-class histogram of the refined coloring: ``(color, n)``.

    The answer-sized readout (number of WL cells and their sizes) — the
    standard refinement summary used for isomorphism rejection."""
    df = wl_colors(graph, rounds=rounds)
    out = df.groupby("color", as_index=False).agg(n=("node", "size"))
    return out.sort_values("color").reset_index(drop=True)


def wl_colors_ds(graph, rounds: int = 3):
    """Dataset-returning variant of :func:`wl_colors` — per-partition
    ``(node, color)`` Arrow blocks built in the object store (dense ids;
    the 10^10-node result contract, ``Pregel.gather_ds``)."""
    if graph.directed:
        raise ValueError("wl_colors requires an undirected projection")
    from graph_data_science_ray.state.pregel import Pregel as _P

    engine = _P(graph, _WLComputation())
    states = engine.init_states()
    for _ in range(int(rounds)):
        states, _stats = engine.step(states)
    return engine.gather_ds(states, "color")

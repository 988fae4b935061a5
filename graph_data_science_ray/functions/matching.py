"""Maximal matching — deterministic parallel greedy (Israeli–Itai shape).

Each undirected edge draws a fixed priority; an edge enters the matching
when its priority is the minimum among ALL active edges at BOTH
endpoints (a locally-minimal edge — no two such edges share a node, so
every round's selection is itself a matching), then matched nodes leave
and their incident edges deactivate.  The parallel-greedy matching
primitive (Israeli & Itai, "A fast and simple randomized parallel
algorithm for maximal matching", IPL 1986); the globally minimum active
edge always matches, so progress is guaranteed and the fixpoint is a
maximal matching.

Determinism contract: priorities are ``u48(md5("mm:<i>:<j>"))`` over the
canonical dense-id pair (i < j) — fixed, distinct w.h.p. — and the whole
round trajectory is a pure function of the edge set, replayable verbatim
by a per-round SQL mirror (the driver oracle checks every matched pair).

Scale shape (two exchanges per round, no generic joins): the canonical
edge table is materialized ONCE and never rewritten; each round
(1) explodes edges to endpoint rows, filtering against the broadcast
cumulative dead-node set, and hash-partitions by node so each partition
flags its locally-minimal endpoint rows (one shuffle), then (2) regroups
the flagged candidates by edge key and keeps edges flagged at BOTH
endpoints (one aggregate over ≤2·V candidate rows, not 2·E).  Matched
pairs (≤ V/2 rows total) land on the driver — answer-sized — and their
endpoints extend the dead set for the next round's explode filter.
Loop-carried distributed state is zero; the round constant is two
exchanges instead of the previous two aggregates + four hash joins.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

_EDGE_SCHEMA = pa.schema(
    [("src", pa.int64()), ("dst", pa.int64()), ("pri", pa.int64())]
)
_MIN_SCHEMA = pa.schema([("node", pa.int64()), ("m", pa.int64())])


def _priority(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    return np.array(
        [
            int(hashlib.md5(f"mm:{i}:{j}".encode()).hexdigest()[:12], 16)
            for i, j in zip(src, dst)
        ],
        dtype=np.int64,
    )


_W_CAP = (1 << 20) - 1


def _priority_weighted(
    src: np.ndarray, dst: np.ndarray, w: np.ndarray
) -> np.ndarray:
    """Heavy-edge priorities: smaller = heavier, md5 tiebreak.

    ``pri = (2^20 − min(w, 2^20−1)) · 2^40 + u40(md5("mm:<i>:<j>"))`` —
    a single int64 total order in which the heaviest edge always wins
    (the METIS heavy-edge-matching visit rule made deterministic);
    weights above the 2^20−1 cap tie at the top band and fall back to
    the hash order."""
    # np.rint (not astype truncation) so the engine and the oracle's
    # CAST(w AS BIGINT) share one rounding rule; weights here are
    # integral counts carried in float64, where both agree exactly.
    wi = np.minimum(np.rint(w).astype(np.int64), _W_CAP)
    h = np.array(
        [
            int(hashlib.md5(f"mm:{i}:{j}".encode()).hexdigest()[:10], 16)
            for i, j in zip(src, dst)
        ],
        dtype=np.int64,
    )
    return ((1 << 20) - wi) * (1 << 40) + h


def maximal_matching(
    sym_edges: rd.Dataset,
    rounds: int = 4,
    num_parts: int = 32,
    idmap=None,
    weighted: bool = False,
) -> pd.DataFrame:
    """Greedy maximal matching over the symmetrized encoded edge table.

    Returns matched canonical pairs ``(src, dst)`` (dense ids, or
    original keys when ``idmap`` is given), sorted.  ``rounds`` bounds
    the parallel rounds (post-fixpoint rounds are no-ops; the fixpoint
    is maximal — asserted by ``tests/test_wl_mis.py``).
    """
    import ray

    from graph_data_science_ray.pipelines.agg import (
        hash_aggregate,
        materialize_bounded,
    )

    def canon(t: pa.Table) -> pa.Table:
        s = np.asarray(t["src"].to_numpy(zero_copy_only=False), dtype=np.int64)
        d = np.asarray(t["dst"].to_numpy(zero_copy_only=False), dtype=np.int64)
        keep = s < d
        if weighted:
            w = np.asarray(
                t["weight"].to_numpy(zero_copy_only=False), dtype=np.float64
            )[keep]
            s, d = s[keep], d[keep]
            pri = _priority_weighted(s, d, w)
        else:
            s, d = s[keep], d[keep]
            pri = _priority(s, d)
        return pa.table(
            {"src": s, "dst": d, "pri": pri}, schema=_EDGE_SCHEMA
        )

    edges = materialize_bounded(
        sym_edges.map_batches(canon, batch_format="pyarrow"), num_parts
    )
    matched_parts: list[pd.DataFrame] = []
    dead = np.array([], dtype=np.int64)  # cumulative matched endpoints

    _END_SCHEMA = pa.schema(
        [("node", pa.int64()), ("peer", pa.int64()),
         ("pri", pa.int64()), ("__part", pa.int64())]
    )
    _CAND_SCHEMA = pa.schema(
        [("src", pa.int64()), ("dst", pa.int64()), ("one", pa.int64())]
    )

    for _ in range(int(rounds)):
        dead_ref = ray.put(np.sort(dead))

        def explode(t: pa.Table, _ref=dead_ref) -> pa.Table:
            # endpoint rows for ACTIVE edges only — the cumulative
            # dead-node set rides the object store once (broadcast),
            # not a per-round status join
            s = np.asarray(t["src"].to_numpy(zero_copy_only=False), np.int64)
            d = np.asarray(t["dst"].to_numpy(zero_copy_only=False), np.int64)
            p = np.asarray(t["pri"].to_numpy(zero_copy_only=False), np.int64)
            dd = ray.get(_ref)
            if len(dd):
                alive = ~np.isin(s, dd) & ~np.isin(d, dd)
                s, d, p = s[alive], d[alive], p[alive]
            node = np.concatenate([s, d])
            peer = np.concatenate([d, s])
            pri = np.concatenate([p, p])
            return pa.table(
                {"node": node, "peer": peer, "pri": pri,
                 "__part": node % np.int64(num_parts)},
                schema=_END_SCHEMA,
            )

        def flag(g: pd.DataFrame) -> pd.DataFrame:
            # per-node min within the node-hash partition; emit only the
            # locally-minimal candidates (≤ 2 per node), canonicalized to
            # the edge key — exchange-2 volume is O(V), not O(E)
            m = g.groupby("node", sort=False)["pri"].transform("min")
            c = g.loc[g["pri"] == m]
            n = c["node"].to_numpy(dtype=np.int64)
            pe = c["peer"].to_numpy(dtype=np.int64)
            return pd.DataFrame(
                {"src": np.minimum(n, pe), "dst": np.maximum(n, pe),
                 "one": np.ones(len(c), dtype=np.int64)}
            )

        cands = (
            edges.map_batches(explode, batch_format="pyarrow")
            .groupby("__part")
            .map_groups(flag, batch_format="pandas")
            .map_batches(
                lambda df: pa.Table.from_pandas(df, schema=_CAND_SCHEMA,
                                                preserve_index=False),
                batch_format="pandas",
            )
        )
        pairs = hash_aggregate(
            cands, ["src", "dst"], "one", op="sum", num_parts=num_parts
        )
        mdf = pairs.to_pandas()  # answer-sized: ≤ 2·V candidate groups
        if "src" not in mdf.columns or not len(mdf):
            break
        mdf = mdf.loc[mdf["one"] == 2]  # min at BOTH endpoints
        if not len(mdf):
            break
        matched_parts.append(
            mdf[["src", "dst"]].astype(np.int64).reset_index(drop=True)
        )
        dead = np.concatenate(
            [dead, mdf["src"].to_numpy(dtype=np.int64),
             mdf["dst"].to_numpy(dtype=np.int64)]
        )

    if matched_parts:
        out = pd.concat(matched_parts, ignore_index=True)
    else:
        out = pd.DataFrame({"src": pd.Series([], dtype=np.int64),
                            "dst": pd.Series([], dtype=np.int64)})
    if idmap is not None:
        out = pd.DataFrame(
            {"src": idmap.to_keys(out["src"].to_numpy(dtype=np.int64)),
             "dst": idmap.to_keys(out["dst"].to_numpy(dtype=np.int64))}
        )
    return out.sort_values(["src", "dst"]).reset_index(drop=True)


def coarsen_graph(
    sym_edges: rd.Dataset,
    rounds: int = 4,
    num_parts: int = 32,
    weighted: bool = False,
) -> tuple[rd.Dataset, pd.DataFrame]:
    """Matching-based graph coarsening — the multilevel-method primitive.

    Contracts every :func:`maximal_matching` pair to its smaller
    endpoint (the METIS-style heavy-edge-contraction shape — Karypis &
    Kumar, "A fast and high quality multilevel scheme for partitioning
    irregular graphs", SIAM J. Sci. Comput. 1998 — with the repo's
    deterministic priority matching in place of the randomized HEM
    visit order), re-keys the symmetrized edge table through the
    node→representative map, drops intra-pair self-loops and sums
    parallel edge weights.  Iterating the pair (coarsen → coarsen)
    halves the graph per level; the weights stay exact (integer counts
    carried in float64).

    Returns ``(coarse_edges, mapping)``: the coarse symmetric edge
    Dataset ``(src, dst, weight)`` over representative dense ids, and
    the answer-sized matched-pair mapping.  The mapping is ≤ V/2 rows
    (actor-vocabulary-bounded here) and rides a broadcast dict into the
    re-key batch; swap for a ``hash_join`` with self-fill at
    billion-node scale.
    """
    import pyarrow as pa

    from graph_data_science_ray.pipelines.agg import hash_aggregate

    matched = maximal_matching(sym_edges, rounds=rounds,
                               num_parts=num_parts, weighted=weighted)
    rep = dict(zip(matched["dst"].astype(np.int64),
                   matched["src"].astype(np.int64)))

    def rekey(t: pa.Table) -> pa.Table:
        s = np.asarray(t["src"].to_numpy(zero_copy_only=False), dtype=np.int64)
        d = np.asarray(t["dst"].to_numpy(zero_copy_only=False), dtype=np.int64)
        w = np.asarray(t["weight"].to_numpy(zero_copy_only=False),
                       dtype=np.float64)
        if rep:
            s = np.array([rep.get(int(x), int(x)) for x in s], dtype=np.int64)
            d = np.array([rep.get(int(x), int(x)) for x in d], dtype=np.int64)
        keep = s != d
        return pa.table(
            {"src": s[keep], "dst": d[keep], "weight": w[keep]},
            schema=pa.schema([("src", pa.int64()), ("dst", pa.int64()),
                              ("weight", pa.float64())]),
        )

    coarse = hash_aggregate(
        sym_edges.map_batches(
            lambda t: t.select(["src", "dst", "weight"]),
            batch_format="pyarrow",
        ).map_batches(rekey, batch_format="pyarrow"),
        ["src", "dst"], "weight", op="sum", num_parts=num_parts,
    )
    return coarse, matched

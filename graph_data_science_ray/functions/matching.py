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

Scale shape: edges live in a hash-partitioned Dataset throughout; each
round is endpoint-explode → per-node min (map-side partials) → two hash
joins back → filter, and the deactivation is another status join — no
driver materialization inside the loop, loop-carried state bounded via
``materialize_bounded``.  Matched pairs (≤ V/2 rows total) are the
answer-sized output.
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
    wi = np.minimum(w.astype(np.int64), _W_CAP)
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
    from graph_data_science_ray.pipelines.agg import (
        hash_aggregate,
        hash_join,
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

    def ends(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pa.concat_arrays(
                    [t["src"].combine_chunks(), t["dst"].combine_chunks()]
                ),
                "m": pa.concat_arrays(
                    [t["pri"].combine_chunks(), t["pri"].combine_chunks()]
                ),
            },
            schema=_MIN_SCHEMA,
        )

    for _ in range(int(rounds)):
        if edges.count() == 0:
            break
        mins = hash_aggregate(
            edges.map_batches(ends, batch_format="pyarrow"),
            ["node"], "m", op="min", num_parts=num_parts,
        ).map_batches(lambda t: t, batch_format="pyarrow")
        mins = materialize_bounded(mins, num_parts)
        j = hash_join(
            edges, mins.map_batches(
                lambda t: t.rename_columns(["node", "msrc"]),
                batch_format="pyarrow",
            ),
            on=["src"], right_on=["node"], num_parts=num_parts,
            left_schema=_EDGE_SCHEMA,
            right_schema=pa.schema([("node", pa.int64()), ("msrc", pa.int64())]),
        )
        j2 = hash_join(
            j, mins.map_batches(
                lambda t: t.rename_columns(["node", "mdst"]),
                batch_format="pyarrow",
            ),
            on=["dst"], right_on=["node"], num_parts=num_parts,
            left_schema=pa.schema(
                [("src", pa.int64()), ("dst", pa.int64()),
                 ("pri", pa.int64()), ("msrc", pa.int64())]
            ),
            right_schema=pa.schema([("node", pa.int64()), ("mdst", pa.int64())]),
        )
        matched = j2.filter(expr="pri == msrc and pri == mdst").materialize()
        mdf = matched.to_pandas()  # answer-sized: one matching's pairs
        if "src" not in mdf.columns or not len(mdf):
            break
        matched_parts.append(mdf[["src", "dst"]].astype(np.int64))

        # deactivate: status per endpoint node (1 = dead), edges keep only
        # rows whose both endpoints stay 0
        def dead(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "node": pa.concat_arrays(
                        [t["src"].combine_chunks(), t["dst"].combine_chunks()]
                    ),
                    "f": pa.array(np.ones(2 * len(t), dtype=np.int64)),
                },
                schema=pa.schema([("node", pa.int64()), ("f", pa.int64())]),
            )

        def alive(t: pa.Table) -> pa.Table:
            return pa.table(
                {"node": t["node"], "f": pa.array(np.zeros(len(t), np.int64))},
                schema=pa.schema([("node", pa.int64()), ("f", pa.int64())]),
            )

        status = hash_aggregate(
            mins.map_batches(alive, batch_format="pyarrow").union(
                matched.map_batches(dead, batch_format="pyarrow")
            ),
            ["node"], "f", op="max", num_parts=num_parts,
        ).map_batches(lambda t: t, batch_format="pyarrow")
        e1 = hash_join(
            edges, status.map_batches(
                lambda t: t.rename_columns(["node", "ds_"]),
                batch_format="pyarrow",
            ),
            on=["src"], right_on=["node"], num_parts=num_parts,
            left_schema=_EDGE_SCHEMA,
            right_schema=pa.schema([("node", pa.int64()), ("ds_", pa.int64())]),
        )
        e2 = hash_join(
            e1, status.map_batches(
                lambda t: t.rename_columns(["node", "dd_"]),
                batch_format="pyarrow",
            ),
            on=["dst"], right_on=["node"], num_parts=num_parts,
            left_schema=pa.schema(
                [("src", pa.int64()), ("dst", pa.int64()),
                 ("pri", pa.int64()), ("ds_", pa.int64())]
            ),
            right_schema=pa.schema([("node", pa.int64()), ("dd_", pa.int64())]),
        )
        edges = materialize_bounded(
            e2.filter(expr="ds_ == 0 and dd_ == 0").map_batches(
                lambda t: t.select(["src", "dst", "pri"]),
                batch_format="pyarrow",
            ),
            num_parts,
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

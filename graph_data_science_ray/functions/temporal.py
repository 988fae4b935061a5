"""Temporal (time-respecting) reachability over the transcript contact stream.

A contact stream is the un-aggregated event-level view of the interaction
graph: one row per adjacent turn pair ``(src, dst, t)`` where ``t`` is the
later turn's timestamp — the moment the interaction completes. Unlike the
weighted edge table (which sums parallel contacts away), the stream keeps
every contact, because temporal reachability depends on contact ORDER: v
is reachable from s only through a path whose contact times never
decrease (Holme & Saramäki, "Temporal networks", Physics Reports 2012;
Kempe, Kleinberg & Kumar, "Connectivity and inference problems for
temporal networks", STOC 2000).

Earliest-arrival relaxation (label-correcting, one global round per
iteration):

    arr(s) = t0;  arr(v) ← min(arr(v), min{ t : (u,v,t), arr(u) ≤ t })

Every value is an exact int64 microsecond timestamp and the relaxation is
a pure min-fold — order-independent, bit-identical at any parallelism,
and replayable round-by-round in SQL (the bounded-round contract the
repo's WCC/articulation oracles use). Rounds bound the number of HOPS in
the time-respecting path, so ``rounds`` ≥ temporal eccentricity of the
source gives the fixpoint; post-fixpoint rounds are no-ops.

Scale shape: the arrival table is V-cardinality and flows through
hash-partitioned joins/aggregates only (no driver materialization inside
the loop; loop-carried state goes through ``materialize_bounded`` — the
geometric-block-growth guard). The contact stream is E-cardinality and
is re-joined per round, which on a real cluster is the right trade: the
stream stays partitioned in plasma, only the small arrival side shuffles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

_CONTACT_SCHEMA = pa.schema(
    [("src", pa.string()), ("dst", pa.string()), ("t", pa.int64())]
)
_ARR_SCHEMA = pa.schema([("node", pa.string()), ("at", pa.int64())])


def derive_contacts(
    turns_ts: rd.Dataset,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    actor_col: str = "actor",
    ts_col: str = "ts",
) -> rd.Dataset:
    """Per-conversation adjacent-turn contact stream ``(src, dst, t)``.

    ``turns_ts`` must carry the turn timestamp
    (``derive_turns(transcripts, keep_ts=True)``). Self-transitions are
    dropped (same contract as the edge derivation); ``t`` is the LATER
    turn's timestamp in int64 microseconds.
    """

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(idx_col, kind="mergesort")
        a = g[actor_col].astype(str).to_numpy(dtype=object)
        t = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        if len(a) < 2:
            return _CONTACT_SCHEMA.empty_table()
        keep = a[:-1] != a[1:]
        return pa.table(
            {"src": a[:-1][keep].astype(str), "dst": a[1:][keep].astype(str),
             "t": t[1:][keep].astype(np.int64)},
            schema=_CONTACT_SCHEMA,
        )

    return turns_ts.groupby(conv_col).map_groups(
        per_group, batch_format="pandas"
    )


def temporal_reachability(
    contacts: rd.Dataset,
    source: str,
    t0: int = 0,
    rounds: int = 6,
    num_parts: int = 32,
) -> pd.DataFrame:
    """Bounded-round earliest-arrival times from ``source``.

    Returns ``(node, at)`` for every node informed within ``rounds``
    time-respecting hops (µs int64 arrival times; the source row carries
    ``t0``). Unreached nodes are omitted.
    """
    from graph_data_science_ray.pipelines.agg import (
        hash_aggregate,
        hash_join,
        materialize_bounded,
    )

    arr = rd.from_arrow(
        pa.table({"node": [source], "at": [int(t0)]}, schema=_ARR_SCHEMA)
    )
    contacts = contacts.map_batches(
        lambda tb: tb.select(["src", "dst", "t"]), batch_format="pyarrow"
    ).materialize()

    def partial_min(df: pd.DataFrame) -> pa.Table:
        # emit Arrow with a pinned schema: empty pandas object columns
        # would otherwise infer a null type and break the union
        ok = df[df["at"].to_numpy() <= df["t"].to_numpy()]
        if not len(ok):
            return _ARR_SCHEMA.empty_table()
        g = ok.groupby("dst", sort=False)["t"].min().reset_index()
        return pa.table(
            {"node": g["dst"].astype(str), "at": g["t"].astype(np.int64)},
            schema=_ARR_SCHEMA,
        )

    for _ in range(int(rounds)):
        j = hash_join(
            contacts, arr, on=["src"], right_on=["node"],
            num_parts=num_parts,
            left_schema=_CONTACT_SCHEMA, right_schema=_ARR_SCHEMA,
        )
        trans = j.map_batches(partial_min, batch_format="pandas")
        arr = hash_aggregate(
            arr.union(trans), ["node"], "at", op="min", num_parts=num_parts
        ).map_batches(lambda tb: tb, batch_format="pyarrow")
        arr = materialize_bounded(arr, num_parts=num_parts)
    df = arr.to_pandas()
    if "node" not in df.columns:
        df = pd.DataFrame({"node": pd.Series([], dtype=object),
                           "at": pd.Series([], dtype=np.int64)})
    df["at"] = df["at"].astype(np.int64)
    return df.sort_values("node").reset_index(drop=True)


def temporal_departure(
    contacts: rd.Dataset,
    target: str,
    horizon: int,
    rounds: int = 6,
    num_parts: int = 32,
) -> pd.DataFrame:
    """Latest-departure times to ``target`` — the dual of earliest arrival.

    ``ld(target) = horizon``; ``ld(u) = max{ t : (u,v,t), t ≤ ld(v) }``
    — the latest moment u can still start a time-respecting path that
    reaches the target by ``horizon`` (the scheduling dual; same
    bounded-round max-fold contract, int64 µs, hash-partitioned state,
    SQL-replayable round by round).  Unreachable nodes are omitted.
    """
    from graph_data_science_ray.pipelines.agg import (
        hash_aggregate,
        hash_join,
        materialize_bounded,
    )

    ld = rd.from_arrow(
        pa.table({"node": [target], "at": [int(horizon)]}, schema=_ARR_SCHEMA)
    )
    contacts = contacts.map_batches(
        lambda tb: tb.select(["src", "dst", "t"]), batch_format="pyarrow"
    ).materialize()

    def partial_max(df: pd.DataFrame) -> pa.Table:
        # joined on dst: rows carry (src, dst, t, at=ld(dst))
        ok = df[df["t"].to_numpy() <= df["at"].to_numpy()]
        if not len(ok):
            return _ARR_SCHEMA.empty_table()
        g = ok.groupby("src", sort=False)["t"].max().reset_index()
        return pa.table(
            {"node": g["src"].astype(str), "at": g["t"].astype(np.int64)},
            schema=_ARR_SCHEMA,
        )

    for _ in range(int(rounds)):
        j = hash_join(
            contacts, ld, on=["dst"], right_on=["node"],
            num_parts=num_parts,
            left_schema=_CONTACT_SCHEMA, right_schema=_ARR_SCHEMA,
        )
        trans = j.map_batches(partial_max, batch_format="pandas")
        ld = hash_aggregate(
            ld.union(trans), ["node"], "at", op="max", num_parts=num_parts
        ).map_batches(lambda tb: tb, batch_format="pyarrow")
        ld = materialize_bounded(ld, num_parts=num_parts)
    df = ld.to_pandas()
    if "node" not in df.columns:
        df = pd.DataFrame({"node": pd.Series([], dtype=object),
                           "at": pd.Series([], dtype=np.int64)})
    df["at"] = df["at"].astype(np.int64)
    return df.sort_values("node").reset_index(drop=True)

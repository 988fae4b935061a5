"""Stream-shaped operators over the events table: sessionization, windows.

Ray Data has no event-time watermarks; stream-shaped semantics are
expressed over the ordered, partitioned log: partition by key, sort by ts
within the partition, window with pandas per group (ordering assumption:
``ts`` total-orders each key's events, ties broken by event_id).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd


def sessionize(
    events: rd.Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: float = 1800.0,
) -> rd.Dataset:
    """Per-key session count: a new session starts when the gap between
    consecutive events exceeds ``gap_seconds``. Returns (key, n_sessions,
    n_events)."""

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, "event_id"], kind="mergesort")
        ts = g[ts_col].astype("datetime64[us]").astype(np.int64) / 1e6
        gaps = np.diff(ts.to_numpy())
        n_sessions = 1 + int((gaps > gap_seconds).sum())
        return pd.DataFrame(
            {
                key_col: [g[key_col].iloc[0]],
                "n_sessions": np.array([n_sessions], dtype=np.int64),
                "n_events": np.array([len(g)], dtype=np.int64),
            }
        )

    return events.groupby(key_col).map_groups(per_key, batch_format="pandas")


def tumbling_window(
    events: rd.Dataset,
    ts_col: str = "ts",
    value_col: str = "value",
    window_seconds: int = 3600,
) -> rd.Dataset:
    """Tumbling event-time window aggregate: (window_start, n, value_sum).

    Window assignment is a vectorized map_batches (epoch-floor), the
    aggregation a groupby-sum with map-side partials — no per-key state.
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    us = window_seconds * 1_000_000

    def assign(t: pa.Table) -> pa.Table:
        ts = t[ts_col].cast(pa.int64())
        win = pc.multiply(pc.floor(pc.divide(ts, us)), us)
        g = (
            pa.table(
                {
                    "window_start": win.cast(pa.int64()),
                    "n": np.ones(len(t), dtype=np.int64),
                    "v": t[value_col],
                }
            )
            .group_by(["window_start"])
            .aggregate([("n", "sum"), ("v", "sum")])
        )
        return g.rename_columns(["window_start", "pn", "pv"])

    agg = (
        events.map_batches(assign, batch_format="pyarrow")
        .groupby("window_start")
        .aggregate(Sum("pn", alias_name="n"), Sum("pv", alias_name="value_sum"))
    )
    return agg


def asof_join(
    left: rd.Dataset,
    right: rd.Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    left_cols: tuple = ("event_id", "value"),
    right_cols: tuple = ("event_id", "value"),
    prefix: str = "r_",
    inner: bool = False,
) -> rd.Dataset:
    """Backward as-of join: each left row matches the LATEST right row of
    the same key with ``right.ts <= left.ts`` (exact matches allowed).

    The temporal-join primitive Ray Data lacks natively (DuckDB/kdb
    ``ASOF JOIN`` semantics). Deterministic tie order: among right rows
    sharing a timestamp the one with the greatest first ``right_cols``
    entry (the id column) wins.

    Shape: both sides are widened to one schema with a side flag and
    hash-partitioned by key (``groupby(key).map_groups``) — the single
    shuffle co-locates each key's rows; inside a group one mergesort by
    (ts, side, id) and a ``maximum.accumulate`` forward-fill produce all
    matches vectorized. Per-key data is bounded; no driver state.
    Unmatched left rows keep null right columns (dropped if ``inner``).
    """

    def widen(side: int, cols: tuple, other: tuple):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame(
                {
                    key_col: df[key_col],
                    ts_col: df[ts_col].astype("datetime64[us]"),
                    "__side": np.full(len(df), side, dtype=np.int64),
                }
            )
            for c in cols:
                out["L_" + c if side else prefix + c] = df[c]
            for c in other:
                out[prefix + c if side else "L_" + c] = (
                    np.full(len(df), np.nan) )
            return out

        return f

    lt = left.map_batches(widen(1, left_cols, right_cols), batch_format="pandas")
    rt = right.map_batches(widen(0, right_cols, left_cols), batch_format="pandas")
    rid = prefix + right_cols[0]

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, "__side", rid], kind="mergesort")
        side = g["__side"].to_numpy()
        idx = np.arange(len(g))
        last_r = np.maximum.accumulate(np.where(side == 0, idx, -1))
        is_l = side == 1
        match = last_r[is_l]
        out = pd.DataFrame(
            {
                key_col: g[key_col].to_numpy()[is_l],
                ts_col: g[ts_col].to_numpy()[is_l],
            }
        )
        for c in left_cols:
            out[c] = g["L_" + c].to_numpy()[is_l]
        hit = match >= 0
        for c in right_cols:
            vals = g[prefix + c].to_numpy()
            col = np.full(int(is_l.sum()), np.nan)
            col[hit] = vals[match[hit]]
            out[prefix + c] = col
        if inner:
            out = out[hit]
        return out

    return lt.union(rt).groupby(key_col).map_groups(per_key, batch_format="pandas")


def sliding_window(
    events: rd.Dataset,
    ts_col: str = "ts",
    value_col: str = "value",
    window_seconds: int = 3600,
    slide_seconds: int = 900,
) -> rd.Dataset:
    """Sliding event-time window aggregate: (window_start, n, value_sum)
    for every window ``[w, w + window)`` with ``w ≡ 0 (mod slide)`` that
    contains the event. ``window_seconds`` must be a multiple of
    ``slide_seconds``.

    Each event expands to exactly ``window/slide`` (window_start, 1, v)
    rows — a vectorized repeat inside ``map_batches`` — which are
    pre-summed per batch (map-side partial) before one low-cardinality
    groupby-sum, the same two-step as ``tumbling_window``. Output rows =
    distinct windows, so shuffle volume is bounded by k × batch-distinct
    windows, not k × events.
    """
    import pyarrow as pa
    from ray.data.aggregate import Sum

    if window_seconds % slide_seconds:
        raise ValueError("window_seconds must be a multiple of slide_seconds")
    k = window_seconds // slide_seconds
    slide_us = slide_seconds * 1_000_000

    def assign(t: pa.Table) -> pa.Table:
        ts = np.asarray(t[ts_col].cast(pa.int64()))
        # latest window containing the event, then k-1 earlier slides
        w0 = (ts // slide_us) * slide_us
        offs = (np.arange(k, dtype=np.int64) * slide_us)[None, :]
        wins = (w0[:, None] - offs).ravel()
        vals = np.repeat(np.asarray(t[value_col], dtype=np.float64), k)
        g = (
            pa.table(
                {"window_start": wins,
                 "n": np.ones(len(wins), dtype=np.int64),
                 "v": vals}
            )
            .group_by(["window_start"])
            .aggregate([("n", "sum"), ("v", "sum")])
        )
        return g.rename_columns(["window_start", "pn", "pv"])

    return (
        events.map_batches(assign, batch_format="pyarrow")
        .groupby("window_start")
        .aggregate(Sum("pn", alias_name="n"), Sum("pv", alias_name="value_sum"))
    )


def range_join(
    left: rd.Dataset,
    right: rd.Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    left_cols: tuple = ("event_id", "value"),
    before_seconds: float = 3600.0,
    after_seconds: float = 3600.0,
    right_value_col: str = "value",
) -> rd.Dataset:
    """Banded range join: for each left row, aggregate the right rows of
    the same key with ``ts ∈ [left.ts - before, left.ts + after]`` —
    returns the left columns plus ``n_in_range`` and ``sum_in_range``.

    The interval-join primitive (each left row against a time band of a
    co-keyed stream). Same scale shape as ``asof_join``: ONE hash
    shuffle co-locates each key's rows from both sides; inside a group
    both sides sort by ts once and every left row finds its band with
    two vectorized ``searchsorted`` probes against the right's prefix
    sums — O((l+r) log r) per key, no per-row Python and no full
    interval materialization (aggregates, not exploded pairs, leave the
    group). Per-key data bounded by the key's own traffic.
    """
    before_us = np.int64(before_seconds * 1e6)
    after_us = np.int64(after_seconds * 1e6)

    def widen(side: int):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame(
                {
                    key_col: df[key_col],
                    "__ts": df[ts_col].astype("datetime64[us]").astype(np.int64),
                    "__side": np.full(len(df), side, dtype=np.int64),
                    "__rv": (
                        df[right_value_col].astype(np.float64)
                        if side == 0 else np.zeros(len(df))
                    ),
                }
            )
            for c in left_cols:
                out["L_" + c] = df[c] if side else np.full(len(df), np.nan)
            return out

        return f

    lt = left.map_batches(widen(1), batch_format="pandas")
    rt = right.map_batches(widen(0), batch_format="pandas")

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        side = g["__side"].to_numpy()
        is_l = side == 1
        lrows = g[is_l]
        rts = np.sort(g["__ts"].to_numpy()[~is_l], kind="mergesort")
        order = np.argsort(g["__ts"].to_numpy()[~is_l], kind="mergesort")
        rvs = g["__rv"].to_numpy()[~is_l][order]
        prefix = np.concatenate([[0.0], np.cumsum(rvs)])
        lts = lrows["__ts"].to_numpy()
        lo = np.searchsorted(rts, lts - before_us, side="left")
        hi = np.searchsorted(rts, lts + after_us, side="right")
        out = pd.DataFrame({key_col: lrows[key_col].to_numpy()})
        for c in left_cols:
            out[c] = lrows["L_" + c].to_numpy()
        out["n_in_range"] = (hi - lo).astype(np.int64)
        out["sum_in_range"] = prefix[hi] - prefix[lo]
        return out

    return lt.union(rt).groupby(key_col).map_groups(per_key, batch_format="pandas")

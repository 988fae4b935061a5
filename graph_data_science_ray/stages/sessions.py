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


def _hash_partition(ds: rd.Dataset, key_col: str, num_parts: int):
    """Tag rows with ``hash(key) % P`` — the repo's standard one-column
    shuffle key. A ``groupby("__part")`` then co-locates each key while
    keeping only P groups, so downstream group functions run vectorized
    over MANY keys at once instead of once per key (the per-key
    ``map_groups`` Python-call overhead is the difference between
    C-speed and row-speed at 10^9 keys)."""
    from graph_data_science_ray.pipelines.agg import _stable_row_hash

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__part"] = (_stable_row_hash(df, [key_col]) % num_parts).astype(
            np.int64
        )
        return df

    return ds.map_batches(tag, batch_format="pandas").groupby("__part")


def sessionize(
    events: rd.Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: float = 1800.0,
    num_parts: int = 64,
) -> rd.Dataset:
    """Per-key session count: a new session starts when the gap between
    consecutive events exceeds ``gap_seconds``. Returns (key, n_sessions,
    n_events).

    Segment formulation: hash-partition by key (P groups, not one per
    key), sort each partition once by (key, ts, event_id), and count
    session starts as ``key-change OR gap > threshold`` across the whole
    partition in one vectorized pass — per-key output rows come from a
    C-speed pandas groupby, with no per-key Python calls.
    """
    gap = np.int64(gap_seconds * 1e6)

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col, "event_id"], kind="mergesort")
        keys = g[key_col].to_numpy()
        ts = g[ts_col].astype("datetime64[us]").astype(np.int64).to_numpy()
        new_key = np.empty(len(g), dtype=bool)
        new_key[0] = True
        new_key[1:] = keys[1:] != keys[:-1]
        starts = new_key.copy()
        starts[1:] |= (ts[1:] - ts[:-1]) > gap
        agg = pd.DataFrame({key_col: keys, "s": starts.astype(np.int64)})
        out = agg.groupby(key_col, sort=False)["s"].agg(["sum", "size"])
        out = out.reset_index()
        return pd.DataFrame(
            {
                key_col: out[key_col],
                "n_sessions": out["sum"].astype(np.int64),
                "n_events": out["size"].astype(np.int64),
            }
        )

    return _hash_partition(events, key_col, num_parts).map_groups(
        per_part, batch_format="pandas"
    )


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
    num_parts: int = 64,
) -> rd.Dataset:
    """Backward as-of join: each left row matches the LATEST right row of
    the same key with ``right.ts <= left.ts`` (exact matches allowed).

    The temporal-join primitive Ray Data lacks natively (DuckDB/kdb
    ``ASOF JOIN`` semantics). Deterministic tie order: among right rows
    sharing a timestamp the one with the greatest first ``right_cols``
    entry (the id column) wins; matched right columns are emitted as
    ``prefix + name``.

    Shape: both sides are widened to one schema with a side flag and
    hash-partitioned by key — ONE shuffle with only P groups co-locates
    each key's rows from both sides; inside a partition a single sort +
    ``pd.merge_asof(by=key)`` (compiled, multi-key) matches every left
    row at C speed. No per-key Python calls, no driver state. Unmatched
    left rows keep null right columns (dropped if ``inner``).
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
            for c in other:  # NaN-fill the other side's columns: one schema
                out[prefix + c if side else "L_" + c] = np.full(len(df), np.nan)
            return out

        return f

    lt = left.map_batches(widen(1, left_cols, right_cols), batch_format="pandas")
    rt = right.map_batches(widen(0, right_cols, left_cols), batch_format="pandas")
    rid = prefix + right_cols[0]
    l_names = ["L_" + c for c in left_cols]
    r_names = [prefix + c for c in right_cols]

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        is_l = g["__side"].to_numpy() == 1
        lf = g.loc[is_l, [key_col, ts_col] + l_names].sort_values(
            ts_col, kind="mergesort"
        )
        rf = g.loc[~is_l, [key_col, ts_col] + r_names].sort_values(
            [ts_col, rid], kind="mergesort"
        )
        if not len(lf):
            return pd.DataFrame(
                {key_col: pd.Series([], dtype=g[key_col].dtype),
                 ts_col: pd.Series([], dtype="datetime64[us]"),
                 **{c: pd.Series([], dtype=np.float64) for c in left_cols},
                 **{c: pd.Series([], dtype=np.float64) for c in r_names}}
            )
        merged = pd.merge_asof(
            lf, rf, on=ts_col, by=key_col,
            direction="backward", allow_exact_matches=True,
        )
        out = merged.rename(columns=dict(zip(l_names, left_cols)))
        if inner:
            out = out[out[rid].notna()]
        return out.reset_index(drop=True)

    both = lt.union(rt)
    return _hash_partition(both, key_col, num_parts).map_groups(
        per_part, batch_format="pandas"
    )


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


def sliding_window_keyed(
    events: rd.Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    window_seconds: int = 3600,
    slide_seconds: int = 900,
) -> rd.Dataset:
    """Per-key sliding event-time window aggregate:
    ``(key, window_start, n, value_sum)`` for every window that contains
    at least one of the key's events. Same map-side expansion + partial
    pre-sum as ``sliding_window``; the groupby key gains the entity key,
    so shuffle volume is bounded by k × batch-distinct (key, window)
    pairs, not k × events."""
    import pyarrow as pa
    from ray.data.aggregate import Sum

    if window_seconds % slide_seconds:
        raise ValueError("window_seconds must be a multiple of slide_seconds")
    k = window_seconds // slide_seconds
    slide_us = slide_seconds * 1_000_000

    def assign(t: pa.Table) -> pa.Table:
        ts = np.asarray(t[ts_col].cast(pa.int64()))
        w0 = (ts // slide_us) * slide_us
        offs = (np.arange(k, dtype=np.int64) * slide_us)[None, :]
        wins = (w0[:, None] - offs).ravel()
        # Arrow take keeps the key's dtype (string / int / any) — no
        # int64 hard-cast, so non-integer entity keys work like asof_join.
        idx = np.repeat(np.arange(len(t), dtype=np.int64), k)
        keys = t[key_col].combine_chunks().take(pa.array(idx))
        vals = np.repeat(np.asarray(t[value_col], dtype=np.float64), k)
        g = (
            pa.table(
                {key_col: keys, "window_start": wins,
                 "n": np.ones(len(wins), dtype=np.int64), "v": vals}
            )
            .group_by([key_col, "window_start"])
            .aggregate([("n", "sum"), ("v", "sum")])
        )
        return g.rename_columns([key_col, "window_start", "pn", "pv"])

    return (
        events.map_batches(assign, batch_format="pyarrow")
        .groupby([key_col, "window_start"])
        .aggregate(Sum("pn", alias_name="n"), Sum("pv", alias_name="value_sum"))
    )


def feature_backfill(
    left: rd.Dataset,
    right: rd.Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    left_cols: tuple = ("event_id", "value"),
    value_col: str = "value",
    window_seconds: int = 3600,
    slide_seconds: int = 900,
    inner: bool = True,
    num_parts: int = 64,
) -> rd.Dataset:
    """Sliding-window features backfilled onto an event stream — the
    training-data feature-join shape: per-key sliding windows aggregate
    the RIGHT stream (``sliding_window_keyed``); each feature row becomes
    visible at its window END; every LEFT row is then matched to the
    latest visible feature at-or-before its own timestamp (backward
    ``asof_join``). Output: left columns + ``f_window_start`` /
    ``f_n`` / ``f_value_sum``. Two shuffles total (window groupby at
    (key, window) cardinality + the asof hash-partition); nothing lands
    on the driver."""
    import pyarrow as pa
    import pyarrow.compute as pc

    feats = sliding_window_keyed(
        right, key_col=key_col, ts_col=ts_col, value_col=value_col,
        window_seconds=window_seconds, slide_seconds=slide_seconds,
    )
    wus = window_seconds * 1_000_000

    def visible_at(t: pa.Table) -> pa.Table:
        # a window's aggregate is known once the window has CLOSED
        end = pc.add(t["window_start"], pa.scalar(wus, pa.int64()))
        return pa.table(
            {
                key_col: t[key_col],
                ts_col: pc.cast(end, pa.timestamp("us")),
                "window_start": t["window_start"],
                "n": t["n"],
                "value_sum": t["value_sum"],
            }
        )

    feat_rows = feats.map_batches(visible_at, batch_format="pyarrow")
    return asof_join(
        left, feat_rows,
        key_col=key_col, ts_col=ts_col,
        left_cols=left_cols,
        right_cols=("window_start", "n", "value_sum"),
        prefix="f_", inner=inner, num_parts=num_parts,
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
    num_parts: int = 64,
) -> rd.Dataset:
    """Banded range join: for each left row, aggregate the right rows of
    the same key with ``ts ∈ [left.ts - before, left.ts + after]`` —
    returns the left columns plus ``n_in_range`` and ``sum_in_range``.

    The interval-join primitive (each left row against a time band of a
    co-keyed stream). Same scale shape as ``asof_join``: ONE hash
    shuffle with P groups co-locates each key's rows from both sides;
    inside a partition the right side gets per-key prefix count/sum
    columns, and each left row resolves its band with TWO compiled
    ``pd.merge_asof(by=key)`` probes (prefix at ts+after minus prefix
    strictly below ts-before) — aggregates, never exploded pairs, leave
    the group, and there are no per-key Python calls.
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
    l_names = ["L_" + c for c in left_cols]

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        is_l = g["__side"].to_numpy() == 1
        lf = g.loc[is_l, [key_col, "__ts"] + l_names].reset_index(drop=True)
        rf = (
            g.loc[~is_l, [key_col, "__ts", "__rv"]]
            .sort_values([key_col, "__ts"], kind="mergesort")
            .reset_index(drop=True)
        )
        if not len(lf):
            return pd.DataFrame(
                {key_col: pd.Series([], dtype=g[key_col].dtype),
                 **{c: pd.Series([], dtype=np.float64) for c in left_cols},
                 "n_in_range": pd.Series([], dtype=np.int64),
                 "sum_in_range": pd.Series([], dtype=np.float64)}
            )
        grp = rf.groupby(key_col, sort=False)
        rf["__cnt"] = grp.cumcount() + 1
        rf["__cs"] = grp["__rv"].cumsum()
        probe = rf[[key_col, "__ts", "__cnt", "__cs"]].sort_values(
            ["__ts", "__cnt"], kind="mergesort"
        )

        def prefix_at(ts_probe: np.ndarray, exact: bool) -> pd.DataFrame:
            q = lf[[key_col]].copy()
            q["__tp"] = ts_probe
            q["__row"] = np.arange(len(q))
            q = q.sort_values("__tp", kind="mergesort")
            m = pd.merge_asof(
                q, probe.rename(columns={"__ts": "__tp"}),
                on="__tp", by=key_col,
                direction="backward", allow_exact_matches=exact,
            ).sort_values("__row", kind="mergesort")
            return (m["__cnt"].fillna(0).to_numpy(dtype=np.int64),
                    m["__cs"].fillna(0.0).to_numpy(dtype=np.float64))

        lts = lf["__ts"].to_numpy()
        c_hi, s_hi = prefix_at(lts + after_us, exact=True)
        c_lo, s_lo = prefix_at(lts - before_us, exact=False)
        out = pd.DataFrame({key_col: lf[key_col]})
        for c in left_cols:
            out[c] = lf["L_" + c].to_numpy()
        out["n_in_range"] = c_hi - c_lo
        out["sum_in_range"] = s_hi - s_lo
        return out

    both = lt.union(rt)
    return _hash_partition(both, key_col, num_parts).map_groups(
        per_part, batch_format="pandas"
    )


def funnel_counts(
    events: rd.Dataset,
    stages: tuple = ("signup", "view", "click", "purchase"),
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    num_parts: int = 64,
) -> rd.Dataset:
    """Ordered funnel: how many users reach each stage, in order.

    Stage 0 is reached at a user's earliest ``stages[0]`` event; stage k
    is reached at the earliest ``stages[k]`` event STRICTLY after the
    stage-(k-1) reach time (the classic min-time greedy funnel, so the
    result is schedule-independent).  Returns one row per stage:
    ``(stage_idx, stage, users)``.

    Scale shape: the read is pruned to (user, type, ts) and filtered to
    the k stage types before the single user-hash exchange; each
    partition then folds its users' funnels in k-1 vectorized
    groupby-min passes (no per-user Python), emitting k partial count
    rows per partition, summed by a tiny final aggregate.  The driver
    sees exactly k rows.
    """
    from graph_data_science_ray.pipelines.agg import hash_aggregate

    stages = tuple(str(s) for s in stages)
    stage_set = set(stages)

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        m = df[type_col].astype(str).isin(stage_set)
        out = pd.DataFrame(
            {
                user_col: df.loc[m, user_col].to_numpy(),
                type_col: df.loc[m, type_col].astype(str).to_numpy(),
                "__us": df.loc[m, ts_col]
                .astype("datetime64[us]")
                .astype(np.int64)
                .to_numpy(),
            }
        )
        return out

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        reach = None  # Series: user -> reach time of previous stage
        counts = np.zeros(len(stages), dtype=np.int64)
        for k, st in enumerate(stages):
            rows = g.loc[g[type_col] == st, [user_col, "__us"]]
            if k > 0:
                prev = rows[user_col].map(reach)
                rows = rows.loc[prev.notna() & (rows["__us"] > prev)]
            reach = rows.groupby(user_col)["__us"].min()
            counts[k] = len(reach)
            if not len(reach):
                counts[k + 1 :] = 0
                break
        return pd.DataFrame(
            {
                "stage_idx": np.arange(len(stages), dtype=np.int64),
                "stage": list(stages),
                "users": counts,
            }
        )

    pruned = events.map_batches(prune, batch_format="pandas")
    partials = _hash_partition(pruned, user_col, num_parts).map_groups(
        per_part, batch_format="pandas"
    )
    return hash_aggregate(
        partials, ["stage_idx", "stage"], "users", op="sum", num_parts=8
    )


def retention_cohorts(
    events: rd.Dataset,
    user_col: str = "user_id",
    ts_col: str = "ts",
    num_parts: int = 64,
) -> rd.Dataset:
    """Cohort retention matrix: ``(cohort_day, offset_days, users)``.

    A user's cohort is the integer epoch-day of their first event;
    ``users`` counts distinct users of that cohort active exactly
    ``offset_days`` days after it (offset 0 is the cohort size itself).
    All-integer (epoch-microseconds // 86400e6), so the driver oracle
    reproduces it verbatim.

    Scale shape: one user-hash exchange co-locates each user's rows;
    each partition computes first-day and distinct activity days in two
    C-speed groupby passes and emits already-user-deduped partial
    ``(cohort, offset)`` counts; a tiny final aggregate sums them (the
    output is at most |days|² rows).
    """
    from graph_data_science_ray.pipelines.agg import hash_aggregate

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                user_col: df[user_col].to_numpy(),
                "__day": (
                    df[ts_col].astype("datetime64[us]").astype(np.int64)
                    // 86_400_000_000
                ).to_numpy(dtype=np.int64),
            }
        )

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        act = g.drop_duplicates([user_col, "__day"])
        first = act.groupby(user_col)["__day"].transform("min")
        out = pd.DataFrame(
            {
                "cohort_day": first.to_numpy(dtype=np.int64),
                "offset_days": (act["__day"] - first).to_numpy(dtype=np.int64),
            }
        )
        cnt = (
            out.groupby(["cohort_day", "offset_days"], sort=False)
            .size()
            .reset_index(name="users")
        )
        cnt["users"] = cnt["users"].astype(np.int64)
        return cnt

    pruned = events.map_batches(prune, batch_format="pandas")
    partials = _hash_partition(pruned, user_col, num_parts).map_groups(
        per_part, batch_format="pandas"
    )
    return hash_aggregate(
        partials, ["cohort_day", "offset_days"], "users", op="sum", num_parts=8
    )


def props_field_stats(
    events: rd.Dataset,
    field: str = "k",
    type_col: str = "event_type",
    props_col: str = "props",
    num_parts: int = 16,
) -> rd.Dataset:
    """Semi-structured payload aggregation: extract integer field
    ``field`` from the JSON ``props`` column and aggregate per event
    type — ``(event_type, n, sum_v, min_v, max_v)``.  Extraction is one
    compiled vectorized regex per batch (pandas ``str.extract``), the
    LLM-metadata analogue of a JSON path probe; rows without the field
    are excluded from all four aggregates.  Map-side partials per
    (type), answer-sized output.
    """
    import re

    from graph_data_science_ray.pipelines.agg import hash_aggregate_multi

    pat = re.compile(r'"' + re.escape(field) + r'"\s*:\s*(-?\d+)')

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df[props_col].fillna("").astype(str).str.extract(pat, expand=False)
        ok = v.notna()
        sub = pd.DataFrame(
            {
                type_col: df.loc[ok, type_col].astype(str).to_numpy(),
                "v": v[ok].astype(np.int64).to_numpy(),
            }
        )
        g = sub.groupby(type_col, sort=False)["v"]
        out = g.agg(n="size", sum_v="sum", min_v="min", max_v="max").reset_index()
        for c in ("n", "sum_v", "min_v", "max_v"):
            out[c] = out[c].astype(np.int64)
        return out

    parts = events.map_batches(partial, batch_format="pandas")
    return hash_aggregate_multi(
        parts,
        [type_col],
        {
            "n": ("n", "sum"),
            "sum_v": ("sum_v", "sum"),
            "min_v": ("min_v", "min"),
            "max_v": ("max_v", "max"),
        },
        num_parts=num_parts,
    )


def value_stats_cents(
    events: rd.Dataset,
    type_col: str = "event_type",
    value_col: str = "value",
    num_parts: int = 16,
) -> rd.Dataset:
    """Exact integer-cents revenue stats per event type:
    ``(event_type, n, sum_cents, min_cents, max_cents)`` with
    ``cents = floor(value·100 + 0.5)`` — two-decimal payloads land
    within float ulps of an integer, so the half-up floor is identical
    on both engine and SQL sides and every aggregate is an exact
    integer sum.  Null values are excluded."""
    from graph_data_science_ray.pipelines.agg import hash_aggregate_multi

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df[value_col].astype(np.float64)
        ok = v.notna()
        cents = np.floor(v[ok].to_numpy() * 100.0 + 0.5).astype(np.int64)
        sub = pd.DataFrame(
            {type_col: df.loc[ok, type_col].astype(str).to_numpy(),
             "c": cents}
        )
        g = sub.groupby(type_col, sort=False)["c"]
        out = g.agg(n="size", sum_cents="sum", min_cents="min",
                    max_cents="max").reset_index()
        for c in ("n", "sum_cents", "min_cents", "max_cents"):
            out[c] = out[c].astype(np.int64)
        return out

    parts = events.map_batches(partial, batch_format="pandas")
    return hash_aggregate_multi(
        parts,
        [type_col],
        {
            "n": ("n", "sum"),
            "sum_cents": ("sum_cents", "sum"),
            "min_cents": ("min_cents", "min"),
            "max_cents": ("max_cents", "max"),
        },
        num_parts=num_parts,
    )


def funnel_transition_stats(
    events: rd.Dataset,
    stages: tuple = ("signup", "view", "click", "purchase"),
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    num_parts: int = 64,
) -> pd.DataFrame:
    """:func:`funnel_counts` plus exact time-to-convert accounting: per
    stage, ``(stage_idx, stage, users, sum_gap_us, max_gap_us)`` where
    the gap is each advancing user's reach-time minus their previous
    stage's reach time, in integer microseconds (stage 0 gaps are 0).
    ``sum_gap_us / users`` is the mean conversion latency without the
    engine committing to a float reduction order.

    Same scale shape as the funnel (one user-hash exchange, k-1
    vectorized groupby-min folds); each partition emits k rows of
    integer partials and the driver folds the answer-sized
    ``num_parts × k`` table.
    """
    stages = tuple(str(s) for s in stages)
    stage_set = set(stages)

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        m = df[type_col].astype(str).isin(stage_set)
        return pd.DataFrame(
            {
                user_col: df.loc[m, user_col].to_numpy(),
                type_col: df.loc[m, type_col].astype(str).to_numpy(),
                "__us": df.loc[m, ts_col]
                .astype("datetime64[us]")
                .astype(np.int64)
                .to_numpy(),
            }
        )

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        reach = None
        counts = np.zeros(len(stages), dtype=np.int64)
        sums = np.zeros(len(stages), dtype=np.int64)
        maxs = np.zeros(len(stages), dtype=np.int64)
        for k, st in enumerate(stages):
            rows = g.loc[g[type_col] == st, [user_col, "__us"]]
            if k > 0:
                prev = rows[user_col].map(reach)
                rows = rows.loc[prev.notna() & (rows["__us"] > prev)]
            nxt = rows.groupby(user_col)["__us"].min()
            counts[k] = len(nxt)
            if k > 0 and len(nxt):
                gaps = (nxt - reach.loc[nxt.index]).to_numpy(dtype=np.int64)
                sums[k] = int(gaps.sum())
                maxs[k] = int(gaps.max())
            reach = nxt
            if not len(reach):
                break
        return pd.DataFrame(
            {
                "stage_idx": np.arange(len(stages), dtype=np.int64),
                "stage": list(stages),
                "users": counts,
                "sum_gap_us": sums,
                "max_gap_us": maxs,
            }
        )

    pruned = events.map_batches(prune, batch_format="pandas")
    partials = (
        _hash_partition(pruned, user_col, num_parts)
        .map_groups(per_part, batch_format="pandas")
        .to_pandas()  # answer-sized: num_parts x k integer rows
    )
    out = (
        partials.groupby(["stage_idx", "stage"], sort=False)
        .agg(users=("users", "sum"), sum_gap_us=("sum_gap_us", "sum"),
             max_gap_us=("max_gap_us", "max"))
        .reset_index()
        .sort_values("stage_idx")
        .reset_index(drop=True)
    )
    for c in ("users", "sum_gap_us", "max_gap_us"):
        out[c] = out[c].astype(np.int64)
    return out


def user_paths(
    events: rd.Dataset,
    max_steps: int = 8,
    top_k: int = 20,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    num_parts: int = 32,
) -> pd.DataFrame:
    """Top-k user journey paths: ``(path, n)``.

    Each user's first ``max_steps`` events (stable ``(ts, id)`` order)
    join into a ``'a>b>c'`` path string; paths are counted across users
    and the ``top_k`` most frequent returned (ties broken by path string
    — fully deterministic). The product-analytics "top conversion
    paths" readout.

    Scale shape: per-user groups are a user-hash shuffle; the path table
    is then a hash-partitioned count whose per-partition top-k is
    globally sound AFTER full aggregation, so the driver merges only
    ``num_parts · top_k`` candidate rows.
    """
    from graph_data_science_ray.pipelines.agg import hash_aggregate

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, id_col], kind="mergesort").head(int(max_steps))
        return pd.DataFrame(
            {"path": [">".join(g[type_col].astype(str))],
             "n": np.array([1], dtype=np.int64)}
        )

    paths = events.groupby(user_col).map_groups(per_user, batch_format="pandas")
    counts = hash_aggregate(paths, ["path"], "n", op="sum", num_parts=num_parts)

    def topk_part(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["n", "path"], ascending=[False, True],
                             kind="mergesort").head(int(top_k))

    # per-partition candidate cut after the full count: sound because a
    # global top-k row is top-k within its own hash partition
    cand = counts.map_batches(topk_part, batch_format="pandas").to_pandas()
    if "path" not in cand.columns:
        return pd.DataFrame({"path": pd.Series([], dtype=object),
                             "n": pd.Series([], dtype=np.int64)})
    cand["n"] = cand["n"].astype(np.int64)
    return (
        cand.sort_values(["n", "path"], ascending=[False, True],
                         kind="mergesort")
        .head(int(top_k))
        .reset_index(drop=True)
    )

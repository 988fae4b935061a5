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

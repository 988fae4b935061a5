"""Hash-partitioned aggregation — the engine's high-cardinality groupby.

Ray Data's native ``groupby().aggregate()`` is a sort-based all-to-all
that is orders of magnitude slower than needed for high-cardinality keys
(measured: 44s vs 0.3s on 1.8M distinct (src,dst) pairs at 32 CPUs).
``hash_aggregate`` implements the classic two-step instead:

1. tag each row with ``part = stable_hash(keys) % P`` (vectorized,
   deterministic across processes — pandas ``hash_array`` with its fixed
   siphash key);
2. shuffle on the single low-cardinality ``part`` column (cheap) and
   combine each partition with a vectorized pandas groupby.

Hash keys are uniformly distributed, so no skew handling is needed; P
bounds per-task memory (rows/P per combine task).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd


def _stable_row_hash(df: pd.DataFrame, key_cols: list[str]) -> np.ndarray:
    h = np.zeros(len(df), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for c in key_cols:
            h = h * np.uint64(0x9E3779B97F4A7C15) + pd.util.hash_array(
                np.asarray(df[c].to_numpy())
            )
    return h


def hash_aggregate(
    ds: rd.Dataset,
    key_cols: list[str],
    value_col: str,
    op: str = "sum",
    num_parts: int = 64,
    out_col: str | None = None,
) -> rd.Dataset:
    """``SELECT keys, op(value) GROUP BY keys`` for high-cardinality keys."""
    out_col = out_col or value_col

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__part"] = (_stable_row_hash(df, key_cols) % num_parts).astype(np.int64)
        return df

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        agg = getattr(g.groupby(key_cols, sort=False)[value_col], op)()
        out = agg.reset_index()
        return out.rename(columns={value_col: out_col})

    return (
        ds.map_batches(tag, batch_format="pandas")
        .groupby("__part")
        .map_groups(combine, batch_format="pandas")
    )


def hash_distinct(ds: rd.Dataset, key_cols: list[str], num_parts: int = 64) -> rd.Dataset:
    """DISTINCT over high-cardinality key columns (same two-step shape)."""

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(subset=key_cols)
        df = df.copy()
        df["__part"] = (_stable_row_hash(df, key_cols) % num_parts).astype(np.int64)
        return df

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(subset=key_cols).drop(columns="__part")

    return (
        ds.map_batches(tag, batch_format="pandas")
        .groupby("__part")
        .map_groups(combine, batch_format="pandas")
    )

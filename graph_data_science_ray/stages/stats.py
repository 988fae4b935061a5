"""Distribution summaries — the reference's ``stats`` execution mode.

Reference: algo/src/main/java/org/neo4j/gds/algorithms/centrality/
PageRankDistributionComputer.java:44 (stats mode summarizes a centrality
result as min/max/mean + p50/p75/p90/p95/p99/p999 instead of streaming
rows) and the community-size/centrality histogram helpers used across
every `.stats` procedure.

Ray-Data-first shape: one distributed sort on the value column, then
order statistics by GLOBAL INDEX — per-block counts give block offsets
(O(#blocks) driver state), each requested percentile resolves to one
(block, local index) lookup fetched by a tiny Ray task. No value column
ever materializes on the driver. Percentile contract: discrete order
statistic at index ``ceil(q·n) − 1`` (0-based) — DuckDB's
``quantile_disc`` definition, so SQL oracles reproduce the summary
verbatim. Mean is reported as exact ppm (``1e6·sum // n``) for
integer-valued columns.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd

DEFAULT_PERCENTILES = (0.5, 0.75, 0.9, 0.95, 0.99, 0.999)


@ray.remote
def _block_count_sum(df: pd.DataFrame, col: str):
    if col not in df.columns:  # empty sort partition loses its schema
        return 0, 0
    v = df[col].to_numpy()
    return len(v), int(v.sum()) if len(v) else 0


@ray.remote
def _value_at(df: pd.DataFrame, col: str, local_idx: int):
    return df[col].iloc[int(local_idx)]


def distribution_summary(
    ds: rd.Dataset,
    col: str,
    percentiles: tuple = DEFAULT_PERCENTILES,
    integer: bool = True,
) -> pd.DataFrame:
    """One-row summary of a column: n, min, max, and ``p<q>`` discrete
    percentiles (quantile_disc semantics).

    ``integer=True`` (default) treats the column as integer-valued and
    adds exact ``mean_ppm = 1e6·sum // n`` — everything int64.
    ``integer=False`` (float columns, e.g. PageRank scores) keeps the
    order-statistic values as float64 and OMITS the mean: every reported
    number is then one of the per-row values, so it hash-matches SQL
    whenever the per-row values do — a summed mean would re-associate
    float additions and break exact comparison.
    """
    refs = ds.sort([col]).to_pandas_refs()
    stats = ray.get([_block_count_sum.remote(r, col) for r in refs])
    counts = np.array([s[0] for s in stats], dtype=np.int64)
    total = int(counts.sum())
    if total == 0:
        raise ValueError("distribution_summary over an empty dataset")
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)

    def fetch(global_idx: int):
        b = int(np.searchsorted(offsets, global_idx, side="right") - 1)
        return _value_at.remote(refs[b], col, global_idx - offsets[b])

    want = [0, total - 1] + [
        min(int(np.ceil(q * total)) - 1, total - 1) for q in percentiles
    ]
    vals = ray.get([fetch(i) for i in want])
    cast = np.int64 if integer else np.float64
    row = {
        "n": np.int64(total),
        "min_value": cast(vals[0]),
        "max_value": cast(vals[1]),
    }
    if integer:
        s = int(sum(x[1] for x in stats))
        row["mean_ppm"] = np.int64(1_000_000 * s // total)
    for q, v in zip(percentiles, vals[2:]):
        row[f"p{str(q)[2:]}"] = cast(v)
    return pd.DataFrame([row])

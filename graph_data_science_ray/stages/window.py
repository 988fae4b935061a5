"""Ordered window-function primitives — the SQL-window surface Ray Data
lacks, built as distributed two-pass scans.

Ray Data has ``groupby``/``sort`` but no ``SUM() OVER (ORDER BY ...)`` /
``row_number()`` / ``lag()``.  These primitives implement them with the
classic parallel-scan shape:

1. globally sort on the order key (Ray Data's range-partitioned sort —
   blocks come back in key order);
2. pass 1 computes one PARTIAL per block (its sum / row count / last
   row) — the driver sees only a block-count-sized list;
3. an exclusive scan over those partials gives each block its offset;
4. pass 2 rewrites each block with its local cumulative + offset.

All driver state is O(#blocks); block payloads move at most twice; the
scan itself is numpy ``cumsum`` per block.  Values that are integers (or
integer-valued doubles) make every sum exact in any grouping, so results
are bit-identical to the SQL oracle at any parallelism (the repo's
integers-over-floats convention).

Operators:

- :func:`running_sum` — ``SUM(value) OVER (ORDER BY keys ROWS UNBOUNDED
  PRECEDING)``.
- :func:`row_number` — global 1-based ``row_number() OVER (ORDER BY
  keys)``.
- :func:`lag_column` — ``lag(col) OVER (PARTITION BY key ORDER BY
  keys)``: per-block shift + a block-boundary tail exchange (the
  boundary rows, one per block, are the only cross-block traffic).
- :func:`pack_sequences` — training-data sequence packing: documents in
  id order are assigned ``seq_id = cum_tokens_before // budget`` (the
  fixed-stride packing a window cumsum expresses exactly in SQL).

Reference scope note: no counterpart in the reference engine; these
extend the engine for ordered-data work per the build brief.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd

__all__ = ["running_sum", "row_number", "lag_column", "pack_sequences",
           "rank_select", "quantiles_disc"]


def _sorted_refs(ds: rd.Dataset, order_cols: list[str]):
    """Globally sorted pandas block refs (ordered list; blocks stay in
    the object store — the driver never sees row data)."""
    return ds.sort(order_cols).to_pandas_refs()


@ray.remote
def _block_stat(df: pd.DataFrame, value_col: str | None):
    if value_col is None:
        return len(df)
    # a range-partitioned sort can emit EMPTY blocks that carry no
    # columns at all (the lose-schema-on-empty-blocks pitfall) — treat
    # them as zero and let the caller drop them
    if not len(df) or value_col not in df.columns:
        return (0, 0)
    return (len(df), df[value_col].to_numpy().sum())


@ray.remote
def _apply_running(df: pd.DataFrame, value_col: str, offset, out_col: str,
                   inclusive: bool) -> pd.DataFrame:
    df = df.copy()
    v = df[value_col].to_numpy()
    cum = np.cumsum(v)
    if inclusive:
        df[out_col] = cum + offset
    else:
        df[out_col] = cum - v + offset
    return df


def running_sum(
    ds: rd.Dataset,
    order_cols: list[str],
    value_col: str,
    out_col: str = "running_sum",
    inclusive: bool = True,
) -> rd.Dataset:
    """Global running total of ``value_col`` in ``order_cols`` order.

    ``inclusive=True`` is SQL's ``ROWS UNBOUNDED PRECEDING`` (current row
    included); ``False`` gives the exclusive prefix (cum before the row).
    """
    refs = _sorted_refs(ds, order_cols)
    stats = ray.get([_block_stat.remote(r, value_col) for r in refs])
    sums = np.array([s[1] for s in stats])
    offsets = np.concatenate([[0], np.cumsum(sums)[:-1]])
    out = [
        _apply_running.remote(r, value_col, off, out_col, inclusive)
        for (r, off, st) in zip(refs, offsets, stats)
        if st[0] > 0  # schema-less empty sort blocks contribute nothing
    ]
    if not out:
        return rd.from_pandas(
            pd.DataFrame({value_col: pd.Series([], dtype=np.int64),
                          out_col: pd.Series([], dtype=np.int64)})
        )
    return rd.from_pandas_refs(out)


@ray.remote
def _apply_rownum(df: pd.DataFrame, offset: int, out_col: str) -> pd.DataFrame:
    df = df.copy()
    df[out_col] = np.arange(1, len(df) + 1, dtype=np.int64) + np.int64(offset)
    return df


def row_number(
    ds: rd.Dataset, order_cols: list[str], out_col: str = "row_number"
) -> rd.Dataset:
    """Global 1-based row number in ``order_cols`` order."""
    refs = _sorted_refs(ds, order_cols)
    counts = ray.get([_block_stat.remote(r, None) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
    out = [
        _apply_rownum.remote(r, int(off), out_col)
        for r, off, c in zip(refs, offsets, counts)
        if c > 0  # schema-less empty sort blocks contribute nothing
    ]
    if not out:
        return rd.from_pandas(
            pd.DataFrame({out_col: pd.Series([], dtype=np.int64)})
        )
    return rd.from_pandas_refs(out)


@ray.remote
def _block_tail(df: pd.DataFrame):
    return df.tail(1)


@ray.remote
def _apply_lag(df: pd.DataFrame, prev_tail, col: str, key_col: str | None,
               out_col: str) -> pd.DataFrame:
    df = df.copy()
    shifted = df[col].shift(1)
    if prev_tail is not None and len(prev_tail):
        first_ok = key_col is None or (
            len(df) and df[key_col].iloc[0] == prev_tail[key_col].iloc[0]
        )
        if len(df) and first_ok:
            shifted.iloc[0] = prev_tail[col].iloc[0]
    if key_col is not None and len(df):
        keys = df[key_col]
        same = keys.eq(keys.shift(1))
        if prev_tail is not None and len(prev_tail) and len(df):
            same.iloc[0] = df[key_col].iloc[0] == prev_tail[key_col].iloc[0]
        shifted = shifted.where(same)
    df[out_col] = shifted
    return df


def lag_column(
    ds: rd.Dataset,
    order_cols: list[str],
    col: str,
    key_col: str | None = None,
    out_col: str = "lag",
) -> rd.Dataset:
    """``lag(col, 1) OVER ([PARTITION BY key_col] ORDER BY order_cols)``.

    When ``key_col`` is given the sort is (key, *order) so each key's
    rows are contiguous, and the lag resets (null) at key boundaries.
    Cross-block continuity costs one 1-row tail per block (block-count-
    sized driver traffic, no row data)."""
    sort_cols = ([key_col] if key_col else []) + list(order_cols)
    refs = _sorted_refs(ds, sort_cols)
    counts = ray.get([_block_stat.remote(r, None) for r in refs])
    # drop schema-less empty sort blocks BEFORE chaining tails — an
    # empty interior block must not break boundary continuity
    refs = [r for r, c in zip(refs, counts) if c > 0]
    if not refs:
        return rd.from_pandas(
            pd.DataFrame({out_col: pd.Series([], dtype=object)})
        )
    tails = ray.get([_block_tail.remote(r) for r in refs])
    out = []
    for i, r in enumerate(refs):
        prev = tails[i - 1] if i > 0 else None
        out.append(_apply_lag.remote(r, prev, col, key_col, out_col))
    return rd.from_pandas_refs(out)


def pack_sequences(
    docs: rd.Dataset,
    budget: int,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
) -> rd.Dataset:
    """Training-data sequence packing: in ``id_col`` order, assign each
    document ``seq_id = cum_tokens_before // budget`` and its offset
    within the running stream (fixed-stride packing — the deterministic,
    window-cumsum-expressible contract; a greedy first-fit packer is
    order-dependent and not reproducible in SQL).

    Returns (id_col, token_col, seq_id, offset) with ``offset`` = total
    tokens before the document."""
    out = running_sum(
        docs, [id_col], token_col, out_col="offset", inclusive=False
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        off = df["offset"].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {
                id_col: df[id_col].astype(np.int64),
                token_col: df[token_col].astype(np.int64),
                "seq_id": off // np.int64(budget),
                "offset": off,
            }
        )

    return out.map_batches(finish, batch_format="pandas")


@ray.remote
def _select_at(df: pd.DataFrame, col: str, local_idx: list[int]):
    v = df[col].to_numpy()
    return [v[i] for i in local_idx]


def rank_select(
    ds: rd.Dataset, col: str, ranks: list[int]
) -> pd.DataFrame:
    """EXACT order statistics: the ``rank``-th smallest values of
    ``col`` (0-based ranks), the scale-safe primitive behind exact
    quantiles / threshold selection (e.g. "the quality score at P95 of
    100 TB of documents").

    Scale shape: one range-partitioned global sort on ``col`` (Ray's
    sample-based sort — the only all-to-all), then per-block row counts
    (O(#blocks) scalars on the driver) locate which block holds each
    requested rank, and only those blocks are touched to read one value
    each. The driver never sees row data — counts and the answer
    values only. Value ties need no tiebreak: the k-th smallest VALUE
    is well-defined under any stable order of equal values.

    Returns ``DataFrame(rank, value)`` sorted by rank. Ranks outside
    [0, n) raise."""
    refs = _sorted_refs(ds, [col])
    counts = ray.get([_block_stat.remote(r, None) for r in refs])
    counts = [int(c) for c in counts]
    n = sum(counts)
    ranks = [int(r) for r in ranks]
    for r in ranks:
        if not (0 <= r < n):
            raise ValueError(f"rank {r} outside [0, {n})")
    bounds = np.cumsum([0] + counts)
    per_block: dict[int, list[tuple[int, int]]] = {}
    for r in ranks:
        b = int(np.searchsorted(bounds, r, side="right") - 1)
        per_block.setdefault(b, []).append((r, r - int(bounds[b])))
    got: dict[int, object] = {}
    fetch = [
        (b, pairs, _select_at.remote(refs[b], col, [li for _, li in pairs]))
        for b, pairs in per_block.items()
    ]
    for b, pairs, ref in fetch:
        vals = ray.get(ref)
        for (r, _li), v in zip(pairs, vals):
            got[r] = v
    out = pd.DataFrame(
        {"rank": np.array(sorted(ranks), dtype=np.int64),
         "value": [got[r] for r in sorted(ranks)]}
    )
    return out


def quantiles_disc(
    ds: rd.Dataset, col: str, qs: list[float]
) -> pd.DataFrame:
    """Discrete quantiles via :func:`rank_select` with DuckDB
    ``quantile_disc`` rank semantics (``rank = ceil(q * n) - 1``,
    clamped to [0, n-1], q=0 -> rank 0), so the result is exactly
    SQL-comparable. Returns ``DataFrame(q, value)``."""
    n = ds.count()
    ranks = sorted(
        {
            min(max(int(np.ceil(q * n)) - 1, 0), n - 1)
            for q in qs
        }
    )
    sel = rank_select(ds, col, ranks)
    vals = dict(zip(sel["rank"], sel["value"]))
    rows = []
    for q in qs:
        r = min(max(int(np.ceil(q * n)) - 1, 0), n - 1)
        rows.append((float(q), vals[r]))
    return pd.DataFrame({"q": [a for a, _ in rows], "value": [b for _, b in rows]})

"""Corpus sampling / selection stages for training-data pipelines.

Three operators a large-scale curation pipeline chains after dedup and
quality scoring, each exactly reproducible in ANSI SQL (DuckDB oracles in
``__ray_entry__``):

- :func:`hash_split` — deterministic train/test assignment from a salted
  md5 of the document id; stable across runs, machines and parallelism
  (the classic "hash the id, compare against a ratio threshold" split).
- :func:`quantile_threshold` / :func:`quantile_filter` — histogram-based
  quantile selection (e.g. "keep documents above the 90th length/quality
  percentile").  Two streaming passes: an exact min/max + count
  aggregate, then map-side fixed-bin histogram partials reduced to one
  tiny (bins)-row table; the full column never leaves the workers.  The
  quantile is the LEFT EDGE of the first bin whose cumulative count
  reaches ``ceil(q*N)`` — a deterministic definition shared verbatim by
  the SQL oracle (no interpolation ambiguity).
- :func:`top_k_per_group` — per-key top-k rows by a score column
  (e.g. the k best documents per language).  Map-side partial top-k
  caps the shuffle at ``k`` rows per key per input block, then a
  hash-partitioned combine finishes each key; ties break on the id
  column so output is deterministic at any parallelism.

Reference scope note: the reference engine (Neo4j GDS) has no corpus
sampling surface; these stages extend the engine for LLM training-data
work per the build brief, mirroring the shapes of ``stages/dedup.py``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import ray.data as rd

from graph_data_science_ray.pipelines.agg import _stable_row_hash

__all__ = [
    "hash_split",
    "quantile_threshold",
    "quantile_filter",
    "top_k_per_group",
    "stratified_sample",
    "sample_global_k",
    "weighted_sample_flags",
    "source_mix_flags",
]


# ---------------------------------------------------------------------------
# deterministic hash split
# ---------------------------------------------------------------------------


def split_threshold_hex(test_ratio: float) -> str:
    """First-8-hex-chars threshold for ``test_ratio`` (md5 is uniform, so
    comparing the fixed-width lowercase hex prefix lexicographically
    equals comparing the first 32 bits numerically)."""
    if not 0.0 <= test_ratio <= 1.0:
        raise ValueError(f"test_ratio must be in [0,1], got {test_ratio}")
    v = int(round(test_ratio * 2**32))
    if v >= 2**32:
        # every 8-char lowercase-hex prefix sorts below "g" -> all test
        return "g"
    return format(v, "08x")


def hash_split(
    docs: rd.Dataset,
    test_ratio: float = 0.25,
    salt: str = "split",
    id_col: str = "doc_id",
) -> rd.Dataset:
    """Add a ``split`` column ('test' / 'train') from md5(f"{id}:{salt}").

    Purely map-side (no shuffle); the assignment depends only on the id
    and salt, so it is identical across runs, block layouts and engines —
    DuckDB reproduces it with ``md5(id::VARCHAR || ':salt')``.
    """
    thr = split_threshold_hex(test_ratio)

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        prefixes = [
            hashlib.md5(f"{i}:{salt}".encode("utf-8")).hexdigest()[:8]
            for i in batch[id_col]
        ]
        out["split"] = np.where(np.array(prefixes) < thr, "test", "train")
        return out

    return docs.map_batches(assign, batch_format="pandas", batch_size=8192)


# ---------------------------------------------------------------------------
# histogram quantile
# ---------------------------------------------------------------------------


def quantile_threshold(
    ds: rd.Dataset, col: str, q: float, bins: int = 4096
) -> float:
    """The ``q``-th histogram quantile of ``ds[col]`` (left bin edge).

    Pass 1: exact min / max / count (streaming aggregate).  Pass 2:
    map-side ``bincount`` partials over ``bins`` fixed-width buckets,
    hash-reduced to a (bins)-row table; only that tiny histogram reaches
    the driver.  Threshold = ``lo + b*(hi-lo)/bins`` for the smallest bin
    ``b`` with cumulative count >= ``ceil(q*N)`` — every float op is
    written in the same order as the SQL oracle so results are
    IEEE-identical.
    """
    if not 0.0 < q <= 1.0:
        raise ValueError(f"q must be in (0,1], got {q}")
    from ray.data.aggregate import Count, Max, Min

    stats = ds.aggregate(
        Min(col, alias_name="_lo"),
        Max(col, alias_name="_hi"),
        Count(alias_name="_n"),
    )
    lo = float(stats["_lo"])
    hi = float(stats["_hi"])
    n = int(stats["_n"])
    if hi == lo:
        return lo

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        x = batch[col].to_numpy().astype(np.float64)
        # mirror the SQL: LEAST(floor((x - lo) * bins / (hi - lo)), bins-1)
        b = np.minimum(
            np.floor((x - lo) * float(bins) / (hi - lo)).astype(np.int64),
            bins - 1,
        )
        counts = np.bincount(b, minlength=bins)
        nz = np.flatnonzero(counts)
        return pd.DataFrame({"b": nz.astype(np.int64), "c": counts[nz]})

    from graph_data_science_ray.pipelines.agg import hash_aggregate

    hist = (
        hash_aggregate(
            ds.map_batches(partial, batch_format="pandas"),
            ["b"], "c", op="sum", num_parts=8,
        )
        .to_pandas()
        .sort_values("b")
    )
    need = int(np.ceil(q * n))
    cum = hist["c"].cumsum().to_numpy()
    pick = int(hist["b"].to_numpy()[np.searchsorted(cum, need, side="left")])
    return lo + pick * (hi - lo) / float(bins)


def quantile_filter(
    ds: rd.Dataset, col: str, q: float, bins: int = 4096
) -> rd.Dataset:
    """Rows with ``col >= quantile_threshold(ds, col, q)`` (streaming)."""
    thr = quantile_threshold(ds, col, q, bins)

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[batch[col].to_numpy().astype(np.float64) >= thr]

    return ds.map_batches(keep, batch_format="pandas")


# ---------------------------------------------------------------------------
# per-group top-k
# ---------------------------------------------------------------------------


def top_k_per_group(
    ds: rd.Dataset,
    key_col: str,
    score_col: str,
    k: int,
    id_col: str = "doc_id",
    num_parts: int = 64,
) -> rd.Dataset:
    """Top-``k`` rows per ``key_col`` by (score desc, id asc).

    Two-step: each input block keeps at most ``k`` rows per key
    (vectorized sort + ``groupby.head``), so the shuffle moves
    O(k * keys_per_block) rows regardless of group size; a
    hash-partitioned combine then finishes each key.  The id tie-break
    makes the result set identical at any parallelism.
    """

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        top = (
            df.sort_values([score_col, id_col], ascending=[False, True])
            .groupby(key_col, sort=False)
            .head(k)
        )
        top = top.copy()
        top["__part"] = (_stable_row_hash(top, [key_col]) % num_parts).astype(
            np.int64
        )
        return top

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.sort_values([score_col, id_col], ascending=[False, True])
            .groupby(key_col, sort=False)
            .head(k)
            .drop(columns="__part")
        )

    return (
        ds.map_batches(partial, batch_format="pandas", batch_size=8192)
        .groupby("__part")
        .map_groups(combine, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# exact-count stratified sample / global deterministic sample
# ---------------------------------------------------------------------------


def _md5_rank_col(df: pd.DataFrame, id_col: str, salt: str) -> pd.Series:
    """Salted md5 hex of the id — the repo's deterministic sampling order
    (uniform, engine-independent; DuckDB: ``md5(id::VARCHAR || ':salt')``)."""
    return pd.Series(
        [
            hashlib.md5(f"{i}:{salt}".encode("utf-8")).hexdigest()
            for i in df[id_col]
        ],
        index=df.index,
    )


def weighted_sample_flags(
    ds: rd.Dataset,
    weight_col: str,
    rate_num: int = 1,
    rate_den: int = 5,
    salt: str = "ws",
    id_col: str = "doc_id",
) -> rd.Dataset:
    """Deterministic importance (quality-weighted) Bernoulli sampling:
    row ``i`` is kept with probability
    ``(rate_num/rate_den) * w_i / max_w`` — heavier/better rows are
    proportionally more likely to survive (max-normalized so the
    per-row probability needs only ONE tiny global aggregate).

    All arithmetic is INTEGER: the acceptance test is
    ``u32 < (rate_num * w_i * 2^32) // (rate_den * max_w)`` with
    ``u32`` the first 32 bits of ``md5(f"{id}:{salt}")`` — no float
    summation order anywhere, so the flags are bit-identical across
    runs, parallelism levels and engines (DuckDB reproduces the test
    verbatim; float acceptance probabilities would hash-drift on the
    mean's reduction order). Weights must be non-negative integers
    (token counts, char counts, quality ranks).

    Returns (id, kept) flags for every input row — compose with a
    hash-join (the ``dedup_exact_filter`` shape) to materialize the
    sampled table. Scale shape: one scalar max aggregate + one
    map-side pass; no shuffle.
    """
    if rate_num < 0 or rate_den <= 0:
        raise ValueError("rate must be a non-negative rational")
    max_w = int(ds.max(weight_col))
    if max_w <= 0:
        raise ValueError(f"max({weight_col}) must be positive")
    den = rate_den * max_w

    def flags(df: pd.DataFrame) -> pd.DataFrame:
        w = df[weight_col].to_numpy(dtype=np.int64)
        if (w < 0).any():
            raise ValueError(f"{weight_col} must be non-negative")
        u32 = np.fromiter(
            (
                int(hashlib.md5(f"{i}:{salt}".encode("utf-8")).hexdigest()[:8], 16)
                for i in df[id_col]
            ),
            dtype=np.int64,
            count=len(df),
        )
        thr = (rate_num * w * np.int64(2**32)) // np.int64(den)
        return pd.DataFrame(
            {id_col: df[id_col].astype(np.int64),
             "kept": (u32 < thr).astype(np.int64)}
        )

    return ds.map_batches(flags, batch_format="pandas", batch_size=8192)


def stratified_sample(
    ds: rd.Dataset,
    group_col: str,
    fraction: float,
    salt: str = "strat",
    id_col: str = "doc_id",
    num_parts: int = 64,
) -> rd.Dataset:
    """EXACT-COUNT stratified sample: ``ceil(fraction * |group|)`` rows
    per group, selected as the group's lowest salted-md5 ids.

    Unlike a per-row Bernoulli split (``hash_split``), the per-group
    sample size is exact — the property class-balanced training subsets
    need.  Selection order is the salted md5 of the id, so the sample is
    identical at any parallelism and reproducible in SQL with a
    ``row_number() OVER (PARTITION BY group ORDER BY md5(...))`` rank.

    Shape: two-step per-group top-k by hash rank (the
    :func:`top_k_per_group` pattern) — except k varies per group, so the
    map side cannot pre-truncate below the group's eventual quota; it
    still bounds the shuffle by dropping rows whose IN-BLOCK group rank
    already exceeds ``ceil(fraction * |group|_global)`` computed from a
    first counting pass (group cardinality table, group-count-sized).
    """
    if not 0.0 < fraction <= 1.0:
        raise ValueError(f"fraction must be in (0,1], got {fraction}")
    from graph_data_science_ray.pipelines.agg import hash_aggregate

    def ones(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {group_col: df[group_col], "c": np.ones(len(df), dtype=np.int64)}
        )

    counts = hash_aggregate(
        ds.map_batches(ones, batch_format="pandas"), [group_col], "c", op="sum",
        num_parts=8,
    ).to_pandas()
    quota = {
        g: int(np.ceil(fraction * int(c)))
        for g, c in zip(counts[group_col], counts["c"])
    }

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__h"] = _md5_rank_col(df, id_col, salt)
        df = df.sort_values(["__h", id_col], kind="mergesort")
        # in-block rank within group can only shrink after the combine,
        # so rows ranked past the group's global quota can never win
        rank = df.groupby(group_col, sort=False).cumcount()
        q = df[group_col].map(quota).fillna(0).astype(np.int64)
        df = df[rank < q.to_numpy()]
        df["__part"] = (_stable_row_hash(df, [group_col]) % num_parts).astype(
            np.int64
        )
        return df

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["__h", id_col], kind="mergesort")
        rank = g.groupby(group_col, sort=False).cumcount()
        q = g[group_col].map(quota).fillna(0).astype(np.int64)
        return g[rank < q.to_numpy()].drop(columns=["__h", "__part"])

    return (
        ds.map_batches(partial, batch_format="pandas", batch_size=8192)
        .groupby("__part")
        .map_groups(combine, batch_format="pandas")
    )


def sample_global_k(
    ds: rd.Dataset, k: int, salt: str = "sample", id_col: str = "doc_id"
) -> rd.Dataset:
    """Exactly ``k`` rows, globally deterministic: the ``k`` smallest
    salted-md5 ids (a distributed top-k by hash — ``sort().limit(k)``
    after a map-side per-block truncation to k rows, so the sort input
    is at most ``k × blocks`` rows, never the corpus)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__h"] = _md5_rank_col(df, id_col, salt)
        return df.sort_values(["__h", id_col], kind="mergesort").head(int(k))

    return (
        ds.map_batches(partial, batch_format="pandas", batch_size=8192)
        .sort(["__h", id_col])
        .limit(int(k))
        .drop_columns(["__h"])
    )


def deterministic_shuffle(
    ds: rd.Dataset,
    id_col: str = "doc_id",
    salt: str = "shuffle",
    out_col: str = "pos",
) -> rd.Dataset:
    """Global deterministic shuffle: assign every row its position in the
    salted-md5 order of its id — the training-data "global shuffle" step,
    but reproducible across runs, machines and parallelism (unlike
    ``Dataset.random_shuffle``).

    Returns the input rows plus ``out_col`` (1-based shuffled position).
    SQL mirror: ``row_number() OVER (ORDER BY md5(id::VARCHAR || ':salt'),
    id)``. Scale shape: one map to attach the hash, ``Dataset.sort`` on it
    (Ray's range-partitioned distributed sort), then the two-pass
    block-offset scan of ``stages.window.row_number`` — per-block work
    only, O(#blocks) driver state.
    """
    from graph_data_science_ray.stages.window import row_number

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__h"] = _md5_rank_col(df, id_col, salt)
        return df

    tagged = ds.map_batches(attach, batch_format="pandas", batch_size=8192)
    return row_number(tagged, ["__h", id_col], out_col=out_col).drop_columns(["__h"])


def source_mix_flags(
    ds: rd.Dataset,
    weight_of,
    source_col: str = "source",
    id_col: str = "doc_id",
    budget_ppm: int = 500_000,
    salt: str = "mix",
) -> rd.Dataset:
    """Deterministic domain-mixture reweighting — the "data mixing" step
    of LLM training pipelines (rebalance a multi-source corpus toward
    target domain weights before training, the static analogue of
    DoReMi-style mixture tuning).

    ``weight_of(source) -> int`` assigns each domain a small positive
    integer target weight. With per-source counts ``n_s``, weighted
    total ``W = sum_s w_s * n_s`` and a global keep budget
    ``B = N * budget_ppm // 1e6``, each source gets a quota
    ``k_s = B * w_s * n_s // W`` and every row of source ``s`` is kept
    with probability ``k_s / n_s`` via the ALL-INTEGER acceptance
    ``u32 * n_s < k_s * 2^32`` (``u32`` = first 32 md5 bits of
    ``f"{id}:{salt}"``). No float appears anywhere, so the flags are
    bit-identical across runs/parallelism and exactly reproducible in
    ANSI SQL; quotas above ``n_s`` saturate to keep-all.

    Returns ``(id, source, kept)`` for every row. Scale shape: one tiny
    per-source count aggregate (|sources| rows, broadcast as a plain
    dict), then a single map-side pass — no shuffle over the corpus.
    """
    if budget_ppm < 0:
        raise ValueError("budget_ppm must be non-negative")
    from graph_data_science_ray.pipelines.agg import hash_aggregate

    counts = hash_aggregate(
        ds.map_batches(
            lambda df: pd.DataFrame(
                {"source": df[source_col].astype(str),
                 "one": np.ones(len(df), dtype=np.int64)}
            ),
            batch_format="pandas",
        ),
        ["source"], "one", op="sum", num_parts=8, out_col="ns",
    ).to_pandas()
    if not len(counts) or "ns" not in counts.columns:  # empty corpus
        return ds.map_batches(
            lambda df: pd.DataFrame(
                {id_col: pd.Series([], dtype=np.int64),
                 "source": pd.Series([], dtype=object),
                 "kept": pd.Series([], dtype=np.int64)}
            ),
            batch_format="pandas",
        )
    n_total = int(counts["ns"].sum())
    budget = n_total * int(budget_ppm) // 1_000_000
    w = counts["source"].map(lambda s: int(weight_of(s))).to_numpy(np.int64)
    if (w <= 0).any():
        raise ValueError("weight_of must return positive integers")
    ns = counts["ns"].to_numpy(dtype=np.int64)
    wtot = int((w * ns).sum())
    ks = budget * w * ns // wtot
    quota = dict(zip(counts["source"], zip(ks.tolist(), ns.tolist())))

    def flags(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {id_col: pd.Series([], dtype=np.int64),
                 "source": pd.Series([], dtype=object),
                 "kept": pd.Series([], dtype=np.int64)}
            )
        src = df[source_col].astype(str)
        k_arr = src.map(lambda s: quota[s][0]).to_numpy(np.int64)
        n_arr = src.map(lambda s: quota[s][1]).to_numpy(np.int64)
        u32 = np.fromiter(
            (
                int(hashlib.md5(f"{i}:{salt}".encode("utf-8")).hexdigest()[:8], 16)
                for i in df[id_col]
            ),
            dtype=np.int64,
            count=len(df),
        )
        kept = (u32 * n_arr) < (k_arr << np.int64(32))
        return pd.DataFrame(
            {id_col: df[id_col].to_numpy(dtype=np.int64),
             "source": src.to_numpy(dtype=object),
             "kept": kept.astype(np.int64)}
        )

    return ds.map_batches(flags, batch_format="pandas", batch_size=8192)

"""Distributed sketches for corpus-scale statistics.

HyperLogLog distinct-count sketch (Flajolet et al. 2007): the one-pass,
mergeable, fixed-size structure a 100-TB pipeline uses wherever an exact
``COUNT(DISTINCT ...)`` would force an all-to-all shuffle of every key.

Count-Min sketch (Cormode & Muthukrishnan 2005): the mergeable
fixed-size frequency sketch — per-batch partial register matrices
summed by a tiny groupby, then BROADCAST (one ``ray.put``) for the
heavy-hitter scan so no per-token shuffle ever happens. Registers are
integer counts under md5-derived bucket hashes, so the whole structure
is bit-exactly reproducible in ANSI SQL.

Determinism contract: hashes are the first 32 bits of ``md5(value)`` —
the repo's engine-independent hash (the ``fingerprint``/``hash_split``
idiom) — so the REGISTER TABLE itself is bit-exactly reproducible in
ANSI SQL, and the driver oracle compares integer registers, not the
float estimate. Register width is 24 bits (< 2^53), so the
``floor(log2(w))`` bit-length both numpy (via ``frexp``) and SQL
compute is exact — no float boundary hazard.

Scale shape: per-batch partial register arrays (one ``np.maximum.at``
per batch — no Python loop over rows beyond the md5 itself), reduced by
an elementwise-max hash aggregate over at most ``2^b`` rows. Nothing
about the input ever lands on the driver; merging shards is the same
elementwise max (register tables from different datasets can be
unioned and re-aggregated).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import ray.data as rd

__all__ = [
    "hll_registers", "hll_estimate", "approx_distinct",
    "hll_registers_by", "approx_distinct_by",
    "cms_registers", "cms_heavy_hitters",
    "bloom_bits", "bloom_decontaminate",
]

_B = 8  # register-index bits; m = 256 registers
_M = 1 << _B
_WBITS = 32 - _B  # 24-bit rho window


def _partial_registers(df: pd.DataFrame, col: str) -> pd.DataFrame:
    if not len(df):
        return pd.DataFrame(
            {"register": pd.Series([], dtype=np.int64),
             "rho": pd.Series([], dtype=np.int64)}
        )
    vals = df[col].fillna("").astype(str)
    h32 = np.fromiter(
        (
            int(hashlib.md5(v.encode("utf-8")).hexdigest()[:8], 16)
            for v in vals
        ),
        dtype=np.int64,
        count=len(vals),
    )
    bucket = h32 >> _WBITS
    w = h32 & ((1 << _WBITS) - 1)
    # exact integer bit length: frexp exponent of an exactly-represented
    # float64 (w < 2^24) — floor(log2(w)) + 1, and 0 for w == 0
    bl = np.frexp(w.astype(np.float64))[1].astype(np.int64)
    rho = np.where(w == 0, np.int64(_WBITS + 1), np.int64(_WBITS + 1) - bl)
    regs = np.zeros(_M, dtype=np.int64)
    np.maximum.at(regs, bucket, rho)
    nz = np.flatnonzero(regs)
    return pd.DataFrame(
        {"register": nz.astype(np.int64), "rho": regs[nz]}
    )


def hll_registers(ds: rd.Dataset, col: str) -> rd.Dataset:
    """The 256-register HyperLogLog table for ``col``: one row per
    register ``(register, rho)`` with ``rho`` the max leading-zero rank
    observed in that register's 24-bit hash window (0 = empty register).
    Bit-exactly reproducible (md5-based) — the driver oracle checks the
    registers verbatim in SQL."""
    from graph_data_science_ray.pipelines.agg import hash_aggregate

    partials = ds.map_batches(
        lambda df: _partial_registers(df, col),
        batch_format="pandas", batch_size=8192,
    )
    base = rd.from_pandas(
        pd.DataFrame(
            {"register": np.arange(_M, dtype=np.int64),
             "rho": np.zeros(_M, dtype=np.int64)}
        )
    )
    return hash_aggregate(
        base.union(partials), ["register"], "rho", op="max", num_parts=8
    )


def hll_estimate(registers: pd.DataFrame) -> float:
    """Classic HLL estimate with the small-range (linear counting)
    correction, from a 256-register table."""
    rho = np.zeros(_M, dtype=np.int64)
    rho[registers["register"].to_numpy(dtype=np.int64)] = (
        registers["rho"].to_numpy(dtype=np.int64)
    )
    m = float(_M)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    e = alpha * m * m / float(np.sum(np.power(2.0, -rho.astype(np.float64))))
    zeros = int((rho == 0).sum())
    if e <= 2.5 * m and zeros > 0:
        e = m * np.log(m / zeros)
    return float(e)


def approx_distinct(ds: rd.Dataset, col: str) -> float:
    """Approximate ``COUNT(DISTINCT col)`` via :func:`hll_registers` —
    typical error ~1.04/sqrt(256) ≈ 6.5 %."""
    return hll_estimate(hll_registers(ds, col).to_pandas())


# --------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005)
# --------------------------------------------------------------------------

_CMS_D = 4    # hash rows
_CMS_W = 512  # columns per row


def _cms_partial(df: pd.DataFrame, col: str) -> pd.DataFrame:
    """Per-batch partial CMS register matrix as sparse (hrow, col, cnt)
    rows. Tokens are whitespace-split words; per-batch ``value_counts``
    collapses to the (tiny) batch vocabulary before any md5 is taken, so
    hashing cost scales with distinct tokens, not token occurrences."""
    empty = pd.DataFrame(
        {"hrow": pd.Series([], dtype=np.int64),
         "col": pd.Series([], dtype=np.int64),
         "cnt": pd.Series([], dtype=np.int64)}
    )
    if not len(df):
        return empty
    counts = (
        df[col].fillna("").astype(str).str.split().explode().dropna()
        .value_counts()
    )
    if counts.empty:
        return empty
    toks = counts.index.to_numpy(dtype=object)
    cnts = counts.to_numpy(dtype=np.int64)
    parts = []
    for i in range(_CMS_D):
        cols = np.fromiter(
            (
                int(hashlib.md5(f"{t}:cms{i}".encode("utf-8")).hexdigest()[:8], 16)
                % _CMS_W
                for t in toks
            ),
            dtype=np.int64,
            count=len(toks),
        )
        regs = np.zeros(_CMS_W, dtype=np.int64)
        np.add.at(regs, cols, cnts)
        nz = np.flatnonzero(regs)
        parts.append(
            pd.DataFrame(
                {"hrow": np.full(len(nz), i, dtype=np.int64),
                 "col": nz.astype(np.int64),
                 "cnt": regs[nz]}
            )
        )
    return pd.concat(parts, ignore_index=True)


def cms_registers(ds: rd.Dataset, col: str) -> rd.Dataset:
    """The 4x512 Count-Min register table for whitespace tokens of
    ``col``: one row per register ``(hrow, col, cnt)``, zero-filled to
    all 2048 registers. Hashes are ``md5(token || ':cms' || row)`` so
    the integer registers are bit-exactly reproducible in ANSI SQL;
    register tables from different shards merge by plain addition."""
    from graph_data_science_ray.pipelines.agg import hash_aggregate

    partials = ds.map_batches(
        lambda df: _cms_partial(df, col),
        batch_format="pandas", batch_size=8192,
    )
    base = pd.DataFrame(
        {"hrow": np.repeat(np.arange(_CMS_D, dtype=np.int64), _CMS_W),
         "col": np.tile(np.arange(_CMS_W, dtype=np.int64), _CMS_D),
         "cnt": np.zeros(_CMS_D * _CMS_W, dtype=np.int64)}
    )
    return hash_aggregate(
        rd.from_pandas(base).union(partials),
        ["hrow", "col"], "cnt", op="sum", num_parts=8,
    )


def _cms_matrix(registers: pd.DataFrame) -> np.ndarray:
    m = np.zeros((_CMS_D, _CMS_W), dtype=np.int64)
    m[registers["hrow"].to_numpy(dtype=np.int64),
      registers["col"].to_numpy(dtype=np.int64)] = (
        registers["cnt"].to_numpy(dtype=np.int64)
    )
    return m


def cms_heavy_hitters(
    ds: rd.Dataset, col: str, min_share_ppm: int = 10_000
) -> rd.Dataset:
    """Heavy-hitter tokens via the Count-Min sketch: tokens whose CMS
    estimate (min over the 4 register rows) reaches ``min_share_ppm``
    parts-per-million of the total token count. Two streaming passes —
    the 16 KiB register matrix is built once, ``ray.put`` once, and
    probed per batch; no per-token shuffle. The integer estimates are
    exact SQL-reproducible (the total is each register row's sum)."""
    import ray

    regs = _cms_matrix(cms_registers(ds, col).to_pandas())
    total = int(regs[0].sum())  # every row sums to the total token count
    threshold = total * int(min_share_ppm) // 1_000_000
    regs_ref = ray.put(regs)

    def probe(df: pd.DataFrame, m: np.ndarray) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"token": pd.Series([], dtype=object),
             "est": pd.Series([], dtype=np.int64)}
        )
        if not len(df):
            return empty
        toks = (
            df[col].fillna("").astype(str).str.split().explode().dropna()
            .unique()
        )
        if not len(toks):
            return empty
        est = np.full(len(toks), np.iinfo(np.int64).max, dtype=np.int64)
        for i in range(_CMS_D):
            cols = np.fromiter(
                (
                    int(hashlib.md5(f"{t}:cms{i}".encode("utf-8")).hexdigest()[:8], 16)
                    % _CMS_W
                    for t in toks
                ),
                dtype=np.int64,
                count=len(toks),
            )
            est = np.minimum(est, m[i, cols])
        keep = est >= threshold
        return pd.DataFrame(
            {"token": np.asarray(toks, dtype=object)[keep],
             "est": est[keep]}
        )

    from graph_data_science_ray.pipelines.agg import hash_aggregate

    cand = ds.map_batches(
        lambda df: probe(df, ray.get(regs_ref)),
        batch_format="pandas", batch_size=8192,
    )
    # the same token gets the identical estimate in every batch; max ==
    # distinct-first
    return hash_aggregate(cand, ["token"], "est", op="max", num_parts=8)


# --------------------------------------------------------------------------
# Bloom-filter benchmark decontamination
# --------------------------------------------------------------------------

_BF_BITS = 65_536  # 8 KiB bit array
_BF_K = 4


def _shingle_bits(sh: np.ndarray, i: int) -> np.ndarray:
    return np.fromiter(
        (
            int(hashlib.md5(f"{s}:bf{i}".encode("utf-8")).hexdigest()[:8], 16)
            % _BF_BITS
            for s in sh
        ),
        dtype=np.int64,
        count=len(sh),
    )


def bloom_bits(benchmark: rd.Dataset) -> rd.Dataset:
    """The distinct set bits of a Bloom filter over the benchmark's
    word-3-gram shingles (same shingling as
    :func:`~graph_data_science_ray.stages.dedup.decontaminate`): k=4
    md5-derived positions in a 65536-bit array. Returned as one
    ``(bit,)`` row per set bit — mergeable by plain union+distinct, and
    bit-exactly reproducible in ANSI SQL."""
    from graph_data_science_ray.pipelines.agg import hash_aggregate
    from graph_data_science_ray.stages.dedup import _explode_shingles

    def to_bits(df: pd.DataFrame) -> pd.DataFrame:
        ex = _explode_shingles(df)
        if not len(ex):
            return pd.DataFrame(
                {"bit": pd.Series([], dtype=np.int64),
                 "one": pd.Series([], dtype=np.int64)}
            )
        sh = ex["shingle"].unique()
        bits = np.unique(
            np.concatenate([_shingle_bits(sh, i) for i in range(_BF_K)])
        )
        return pd.DataFrame(
            {"bit": bits, "one": np.ones(len(bits), dtype=np.int64)}
        )

    ex = benchmark.select_columns(["doc_id", "text"]).map_batches(
        to_bits, batch_format="pandas", batch_size=2048
    )
    agg = hash_aggregate(ex, ["bit"], "one", op="max", num_parts=8)

    # all-empty upstream blocks can lose the schema (engine-wide Ray
    # pitfall) — re-assert it so consumers always see a `bit` column
    def only_bit(df: pd.DataFrame) -> pd.DataFrame:
        if "bit" not in df.columns:
            return pd.DataFrame({"bit": pd.Series([], dtype=np.int64)})
        return df[["bit"]]

    return agg.map_batches(only_bit, batch_format="pandas")


def bloom_decontaminate(
    docs: rd.Dataset, benchmark: rd.Dataset
) -> rd.Dataset:
    """Benchmark decontamination through a broadcast Bloom filter — the
    100-TB-shape alternative to the shingle hash join of
    ``stages.dedup.decontaminate``: the benchmark collapses to an 8 KiB
    bit array (``ray.put`` once), and the corpus pass is a SINGLE
    map-side sweep with per-doc reduction inside the batch — zero
    shuffle over the corpus.

    Returns one row per corpus doc ``(doc_id, bloom_hits,
    contaminated)`` where ``bloom_hits`` counts the doc's DISTINCT
    shingles whose k=4 bits are all set (an overestimate of true hits —
    Bloom false positives are possible, never false negatives) and
    ``contaminated = bloom_hits >= 1``. Deterministic md5 probes make
    the flags (including any false positives) bit-exactly reproducible
    in ANSI SQL."""
    import ray

    from graph_data_science_ray.stages.dedup import _explode_shingles

    bp = bloom_bits(benchmark).to_pandas()
    mask = np.zeros(_BF_BITS, dtype=bool)
    if len(bp):
        mask[bp["bit"].to_numpy(dtype=np.int64)] = True
    mask_ref = ray.put(mask)

    def probe(df: pd.DataFrame, m: np.ndarray) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {"doc_id": pd.Series([], dtype=np.int64),
                 "bloom_hits": pd.Series([], dtype=np.int64),
                 "contaminated": pd.Series([], dtype=np.int64)}
            )
        ex = _explode_shingles(df)
        ids = df["doc_id"].to_numpy(dtype=np.int64)
        hits = pd.Series(np.zeros(len(ids), dtype=np.int64), index=ids)
        if len(ex):
            sh = ex["shingle"].to_numpy(dtype=object)
            allhit = np.ones(len(sh), dtype=bool)
            for i in range(_BF_K):
                allhit &= m[_shingle_bits(sh, i)]
            got = (
                pd.Series(allhit.astype(np.int64))
                .groupby(ex["doc_id"].to_numpy(dtype=np.int64)).sum()
            )
            hits.loc[got.index] = got.to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {"doc_id": ids,
             "bloom_hits": hits.to_numpy(dtype=np.int64),
             "contaminated": (
                 hits.to_numpy(dtype=np.int64) >= 1
             ).astype(np.int64)}
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(
        lambda df: probe(df, ray.get(mask_ref)),
        batch_format="pandas", batch_size=2048,
    )


# --------------------------------------------------------------------------
# Grouped HyperLogLog (approximate COUNT(DISTINCT col) ... GROUP BY key)
# --------------------------------------------------------------------------


def _partial_registers_by(df: pd.DataFrame, key_col: str, col: str) -> pd.DataFrame:
    """Per-batch sparse (key, register, rho) partials — one md5 per row,
    then a single batch groupby-max; hashing cost is row count, shuffle
    cost is (batch keys x touched registers)."""
    if not len(df):
        return pd.DataFrame(
            {key_col: pd.Series([], dtype=object),
             "register": pd.Series([], dtype=np.int64),
             "rho": pd.Series([], dtype=np.int64)}
        )
    vals = df[col].fillna("").astype(str)
    h32 = np.fromiter(
        (int(hashlib.md5(v.encode("utf-8")).hexdigest()[:8], 16) for v in vals),
        dtype=np.int64, count=len(vals),
    )
    bucket = h32 >> _WBITS
    w = h32 & ((1 << _WBITS) - 1)
    bl = np.frexp(w.astype(np.float64))[1].astype(np.int64)
    rho = np.where(w == 0, np.int64(_WBITS + 1), np.int64(_WBITS + 1) - bl)
    return (
        pd.DataFrame(
            {key_col: df[key_col].to_numpy(), "register": bucket, "rho": rho}
        )
        .groupby([key_col, "register"], sort=False)["rho"]
        .max()
        .reset_index()
    )


def hll_registers_by(ds: rd.Dataset, key_col: str, col: str) -> rd.Dataset:
    """Per-group HyperLogLog register tables: sparse
    ``(key, register, rho)`` rows with only OBSERVED registers (an
    absent row means rho 0 — unlike the dense global
    :func:`hll_registers`, zero-filling per key would need the key
    universe). Registers max-merge, so map-side batch partials shuffle
    only (keys x <=256) rows per batch regardless of row count — the
    distributed ``approx COUNT(DISTINCT col) GROUP BY key``."""
    from graph_data_science_ray.pipelines.agg import hash_aggregate

    partials = ds.map_batches(
        lambda df: _partial_registers_by(df, key_col, col),
        batch_format="pandas", batch_size=8192,
    )
    return hash_aggregate(
        partials, [key_col, "register"], "rho", op="max", num_parts=8
    )


def approx_distinct_by(ds: rd.Dataset, key_col: str, col: str) -> pd.DataFrame:
    """Per-key approximate distinct counts from :func:`hll_registers_by`
    — the driver pull is answer-sized (keys x <=256 register rows)."""
    regs = hll_registers_by(ds, key_col, col).to_pandas()
    out = []
    for key, g in regs.groupby(key_col, sort=True):
        dense = pd.DataFrame(
            {"register": np.arange(_M, dtype=np.int64),
             "rho": np.zeros(_M, dtype=np.int64)}
        )
        dense.loc[g["register"].to_numpy(dtype=np.int64), "rho"] = (
            g["rho"].to_numpy(dtype=np.int64)
        )
        out.append((key, hll_estimate(dense)))
    return pd.DataFrame(out, columns=[key_col, "estimate"])


_AMS_R = 16  # sign rows


def _ams_partial(df: pd.DataFrame, col: str) -> pd.DataFrame:
    """Per-batch partial AMS sign sums as (srow, s) rows; per-batch
    value_counts collapses to the batch vocabulary before hashing."""
    empty = pd.DataFrame(
        {"srow": pd.Series([], dtype=np.int64),
         "s": pd.Series([], dtype=np.int64)}
    )
    if not len(df):
        return empty
    counts = (
        df[col].fillna("").astype(str).str.split().explode().dropna()
        .value_counts()
    )
    if counts.empty:
        return empty
    toks = counts.index.to_numpy(dtype=object)
    cnts = counts.to_numpy(dtype=np.int64)
    rows = []
    for i in range(_AMS_R):
        par = np.fromiter(
            (
                int(hashlib.md5(f"{t}:ams{i}".encode("utf-8")).hexdigest()[:8], 16)
                & 1
                for t in toks
            ),
            dtype=np.int64,
            count=len(toks),
        )
        sign = 1 - 2 * par  # parity 0 -> +1, parity 1 -> -1
        rows.append((i, int((cnts * sign).sum())))
    return pd.DataFrame(
        {"srow": np.array([r[0] for r in rows], dtype=np.int64),
         "s": np.array([r[1] for r in rows], dtype=np.int64)}
    )


def ams_registers(ds: rd.Dataset, col: str) -> rd.Dataset:
    """AMS/Tug-of-War F2 sketch (Alon, Matias & Szegedy 1996): 16 signed
    token-count sums under md5-parity sign hashes.  Mergeable by plain
    addition, so the shuffle is 16 integer rows per partial; the second
    frequency moment estimate is ``mean(s²)`` (:func:`ams_f2_estimate`).
    Register table zero-filled to all 16 rows — the integer oracle
    surface, reproducible verbatim in SQL."""
    from graph_data_science_ray.pipelines.agg import hash_aggregate

    parts = ds.map_batches(
        lambda df: _ams_partial(df, col), batch_format="pandas"
    )
    agg = hash_aggregate(parts, ["srow"], "s", op="sum", num_parts=4)

    def zero_fill(df: pd.DataFrame) -> pd.DataFrame:
        base = pd.DataFrame(
            {"srow": np.arange(_AMS_R, dtype=np.int64),
             "s": np.zeros(_AMS_R, dtype=np.int64)}
        )
        if len(df):
            base = base.set_index("srow")
            got = df.set_index("srow")["s"]
            base.loc[got.index, "s"] = got.astype(np.int64)
            base = base.reset_index()
        return base

    return rd.from_pandas(zero_fill(agg.to_pandas()))


def ams_f2_estimate(registers: pd.DataFrame) -> float:
    """F2 (second frequency moment) estimate: mean of squared sign sums."""
    s = registers["s"].to_numpy(dtype=np.float64)
    return float((s * s).mean()) if len(s) else 0.0


def kmv_registers(
    docs: rd.Dataset,
    k: int = 64,
    salt: str = "kmv",
    text_col: str = "text",
) -> pd.DataFrame:
    """K-minimum-values distinct-count sketch — verbatim registers.

    The KMV/bottom-k estimator (Bar-Yossef et al., "Counting distinct
    elements in a data stream", RANDOM 2002; Beyer et al., SIGMOD 2007):
    keep the ``k`` smallest distinct hash values of the token stream;
    the k-th smallest value h estimates the vocabulary as
    ``(k-1) · 2³² / h``.  Registers merge by union+cut, so per-batch
    partial bottom-k lists combine associatively — the mergeable-sketch
    family alongside the repo's HLL/CMS/AMS.

    Tokens are the repo-wide lowercased ``\\S+`` tokenizer; hashes are
    ``u32(md5("kmv:<token>"))`` — deterministic and SQL-verbatim.
    Returns ``(rank, register)`` — the k smallest DISTINCT hash values
    in order, every row an exact integer — plus the estimate row is the
    consumer's division (kept out of the table so the whole output
    hash-compares).

    Scale shape: per-batch local-distinct bottom-k (numpy unique +
    partition) → driver merge of ``blocks · k`` ints.
    """
    import hashlib
    import re

    word = re.compile(r"\S+")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = set()
        for t in df[text_col].fillna(""):
            toks.update(w.lower() for w in word.findall(t))
        if not toks:
            return pd.DataFrame({"h": pd.Series([], dtype=np.int64)})
        hs = np.unique(
            np.array(
                [
                    int(hashlib.md5(f"{salt}:{w}".encode())
                        .hexdigest()[:8], 16)
                    for w in toks
                ],
                dtype=np.int64,
            )
        )
        return pd.DataFrame({"h": hs[: int(k)]})

    part = docs.map_batches(partial, batch_format="pandas",
                            batch_size=4096).to_pandas()
    hs = np.unique(part["h"].to_numpy(dtype=np.int64))[: int(k)] if len(part) \
        else np.array([], dtype=np.int64)
    return pd.DataFrame(
        {"rank": np.arange(1, len(hs) + 1, dtype=np.int64),
         "register": hs}
    )

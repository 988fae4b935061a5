"""Deduplication stages: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale shapes:
- exact: content-hash in a vectorized ``map_batches`` → hash-partitioned
  ``groupby(fp)`` keep-first (min doc_id — deterministic);
- MinHash-LSH: vectorized shingle hashing (token hashes mixed with a
  splitmix finalizer — no per-shingle Python hashing) → per-doc signature
  minima via ``reduceat`` → banded keys → groupby band buckets →
  candidate pairs → **hash-join of the pairs back to the doc table**
  (twice, on doc_a / doc_b) → per-batch exact-Jaccard verification. No
  full-corpus driver broadcast anywhere.
- SimHash: 64-bit token-hash majority fingerprint, bit counts via
  ``reduceat`` over per-doc shingle segments.

All stages treat the shuffle keys as content hashes — uniformly
distributed, no skew handling needed.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import ray.data as rd

from graph_data_science_ray._util import splitmix64

_WORD = re.compile(r"\S+")


def _shingle_hashes_batch(texts) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized 64-bit word-3-shingle hashes for a batch of texts.

    Returns ``(hashes, indptr)``: per-doc segments
    ``hashes[indptr[i]:indptr[i+1]]``. Token hashes come from pandas'
    stable siphash (`hash_array`); a shingle hash mixes its three token
    hashes through splitmix64 — no per-shingle Python loop. Docs with
    fewer than 3 tokens collapse to one shingle over all their tokens.
    """
    tok_lists = [_WORD.findall(t or "") for t in texts]
    counts = np.fromiter((len(t) for t in tok_lists), dtype=np.int64, count=len(tok_lists))
    flat = [w for toks in tok_lists for w in toks]
    if not flat:
        return np.zeros(0, dtype=np.uint64), np.zeros(len(texts) + 1, dtype=np.int64)
    th = pd.util.hash_array(np.asarray(flat, dtype=object))  # uint64, stable
    starts = np.concatenate([[0], np.cumsum(counts)])
    out_h = []
    out_counts = np.zeros(len(texts), dtype=np.int64)
    C1, C2 = np.uint64(0x9E3779B97F4A7C15), np.uint64(0xBF58476D1CE4E5B9)
    with np.errstate(over="ignore"):
        # big docs: triple-mix consecutive token hashes within each doc.
        # Build a keep-mask that drops the last 2 positions of each doc.
        n = len(th)
        doc_of = np.repeat(np.arange(len(texts)), counts)
        h1, h2, h3 = th[: n - 2], th[1 : n - 1], th[2:]
        same = (doc_of[: n - 2] == doc_of[2:]) if n >= 3 else np.zeros(0, dtype=bool)
        tri = splitmix64((h1 * C1 ^ h2) * C2 ^ h3)
        for i, (s, c) in enumerate(zip(starts[:-1], counts)):
            if c >= 3:
                seg = tri[s : s + c - 2][same[s : s + c - 2]]
                out_h.append(seg)
                out_counts[i] = len(seg)
            elif c > 0:
                mix = th[s]
                for j in range(1, c):
                    mix = mix * C1 ^ th[s + j]
                out_h.append(splitmix64(np.asarray([mix], dtype=np.uint64)))
                out_counts[i] = 1
    hashes = np.concatenate(out_h) if out_h else np.zeros(0, dtype=np.uint64)
    indptr = np.concatenate([[0], np.cumsum(out_counts)]).astype(np.int64)
    return hashes, indptr


def _token_hashes(text: str) -> np.ndarray:
    """Stable 64-bit hashes of word 3-shingles (single-doc view)."""
    h, indptr = _shingle_hashes_batch([text])
    return h[indptr[0] : indptr[1]]


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def dedup_exact(docs: rd.Dataset) -> rd.Dataset:
    """Keep the smallest doc_id per identical text. Returns (fp, doc_id)."""
    from graph_data_science_ray.pipelines.agg import hash_aggregate
    from graph_data_science_ray.stages.text import Fingerprint

    fps = docs.map_batches(Fingerprint(), batch_format="pandas", batch_size=8192)
    return hash_aggregate(fps, ["fp"], "doc_id", op="min")


def dedup_exact_filter(docs: rd.Dataset) -> rd.Dataset:
    """The deduplicated document TABLE (all columns, keepers only).

    The keeper set rides a hash-join back to the doc table — no driver
    state, so the filter streams at corpus scale. This is the operator a
    training-data pipeline actually chains (dedup → downstream stages);
    ``dedup_exact`` is its (fp, keeper) key view."""
    import pyarrow as pa

    from graph_data_science_ray.pipelines.agg import hash_join

    keepers = dedup_exact(docs).map_batches(
        lambda df: pd.DataFrame({"doc_id": df["doc_id"].astype(np.int64)}),
        batch_format="pandas",
    )
    return hash_join(
        docs, keepers, on=["doc_id"],
        left_schema=None,  # resolved from the doc table
        right_schema=pa.schema([("doc_id", pa.int64())]),
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


class MinHasher:
    """Per-batch MinHash signatures.

    ``sig[i] = min over shingles of splitmix64(h ^ seed_i)`` — one
    independent 64-bit mix per hash function, minima taken per doc with
    ``np.minimum.reduceat`` over the shingle segments. Entirely
    vectorized; the seed family is built once per actor."""

    def __init__(self, num_hashes: int = 64, seed: int = 17):
        rng = np.random.default_rng(seed)
        self.seeds = rng.integers(0, np.iinfo(np.uint64).max, size=num_hashes, dtype=np.uint64)
        self.num_hashes = num_hashes

    def signatures(self, texts) -> np.ndarray:
        h, indptr = _shingle_hashes_batch(texts)
        n_docs = len(indptr) - 1
        sigs = np.zeros((n_docs, self.num_hashes), dtype=np.uint64)
        if len(h) == 0:
            return sigs
        seg_counts = np.diff(indptr)
        nz = seg_counts > 0
        starts = indptr[:-1][nz]
        with np.errstate(over="ignore"):
            for i, s in enumerate(self.seeds):
                mixed = splitmix64(h ^ s)
                sigs[nz, i] = np.minimum.reduceat(mixed, starts)
        return sigs

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs = self.signatures(batch["text"].fillna("").tolist())
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype(np.int64),
                "sig": list(sigs),
            }
        )


def _band_rows(batch: pd.DataFrame, num_bands: int, rows_per_band: int) -> pd.DataFrame:
    """(doc_id, band, key) rows — band key mixes the band's signature
    slots through splitmix64, vectorized across the whole batch."""
    if not len(batch):
        return pd.DataFrame(
            {"doc_id": pd.Series([], dtype=np.int64),
             "band": pd.Series([], dtype=np.int64),
             "key": pd.Series([], dtype=np.int64)}
        )
    sig = np.stack([np.asarray(s, dtype=np.uint64) for s in batch["sig"]])
    n = len(sig)
    C = np.uint64(0x9E3779B97F4A7C15)
    keys = np.empty((n, num_bands), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for b in range(num_bands):
            chunk = sig[:, b * rows_per_band : (b + 1) * rows_per_band]
            acc = np.full(n, np.uint64(b) + np.uint64(1), dtype=np.uint64)
            for r in range(chunk.shape[1]):
                acc = splitmix64(acc * C ^ chunk[:, r])
            keys[:, b] = acc
    doc_ids = np.repeat(batch["doc_id"].to_numpy(dtype=np.int64), num_bands)
    bands = np.tile(np.arange(num_bands, dtype=np.int64), n)
    return pd.DataFrame(
        {"doc_id": doc_ids, "band": bands, "key": keys.reshape(-1).astype(np.int64)}
    )


def jaccard(a: str, b: str) -> float:
    """Exact shingle-set Jaccard. Empty-vs-empty is 0.0 — NOT a
    near-duplicate — the same convention ``_verify_pairs`` applies, so
    empty/whitespace docs (identical all-zero MinHash signatures, always
    bucketed together) are never reported as pairs."""
    sa, sb = set(_token_hashes(a)), set(_token_hashes(b))
    if not sa and not sb:
        return 0.0
    return len(sa & sb) / max(1, len(sa | sb))


def _verify_pairs(batch: pd.DataFrame, threshold: float) -> pd.DataFrame:
    """Exact shingle-Jaccard over joined (text_a, text_b) pair rows.

    Shingle hashing is batched (one vectorized pass over all texts in the
    batch); only the final per-pair set intersection is a loop over the
    CANDIDATE PAIRS (already winnowed by LSH), not over the corpus."""
    empty = pd.DataFrame(
        {"doc_a": pd.Series([], dtype=np.int64),
         "doc_b": pd.Series([], dtype=np.int64),
         "jaccard": pd.Series([], dtype=np.float64)}
    )
    if not len(batch):
        return empty
    ta = batch["text_a"].fillna("").tolist()
    tb = batch["text_b"].fillna("").tolist()
    ha, ia = _shingle_hashes_batch(ta)
    hb, ib = _shingle_hashes_batch(tb)
    js = np.empty(len(batch), dtype=np.float64)
    for i in range(len(batch)):
        sa = np.unique(ha[ia[i] : ia[i + 1]])
        sb = np.unique(hb[ib[i] : ib[i + 1]])
        if len(sa) == 0 and len(sb) == 0:
            # empty-vs-empty is NOT a near-duplicate (matches the jaccard()
            # helper's convention): empty/whitespace docs share identical
            # all-zero MinHash signatures and always bucket together, and
            # would otherwise all be emitted as pairs
            js[i] = 0.0
            continue
        inter = len(np.intersect1d(sa, sb, assume_unique=True))
        js[i] = inter / max(1, len(sa) + len(sb) - inter)
    out = pd.DataFrame(
        {
            "doc_a": batch["doc_a"].astype(np.int64),
            "doc_b": batch["doc_b"].astype(np.int64),
            "jaccard": np.round(js, 6),
        }
    )
    return out[out["jaccard"] >= threshold]


def dedup_minhash_lsh(
    docs: rd.Dataset,
    num_hashes: int = 64,
    num_bands: int = 16,
    threshold: float = 0.7,
    seed: int = 17,
    broadcast_limit: int = 100_000,
) -> rd.Dataset:
    """Near-duplicate pairs via MinHash banding + exact-Jaccard verify.

    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard >= threshold.
    Verification texts arrive either by BROADCASTING the candidate docs
    (when the CANDIDATE id set — not the corpus — is at most
    ``broadcast_limit``: semi-join filter + ``ray.put`` once, the
    small-side-broadcast pattern) or by hash-joining the candidate pairs
    back to the doc table (once per side) — the corpus itself is never
    collected on the driver in either path.
    """
    import functools

    rows_per_band = num_hashes // num_bands
    docs = docs.select_columns(["doc_id", "text"]).materialize()
    sigs = docs.map_batches(
        MinHasher(num_hashes, seed), batch_format="pandas", batch_size=4096,
    )
    bands = sigs.map_batches(
        functools.partial(_band_rows, num_bands=num_bands, rows_per_band=rows_per_band),
        batch_format="pandas",
    )

    from graph_data_science_ray.pipelines.agg import _stable_row_hash, hash_distinct

    def tag_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__part"] = (_stable_row_hash(df, ["band", "key"]) % 64).astype(np.int64)
        return df

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        import logging

        out_a, out_b = [], []
        dropped_buckets = 0
        dropped_docs = 0
        for _, grp in g.groupby(["band", "key"], sort=False):
            ids = np.sort(grp["doc_id"].to_numpy(dtype=np.int64))
            if len(ids) > 1000:  # degenerate mega-bucket: log the drop
                dropped_buckets += 1
                dropped_docs += len(ids)
                continue
            if len(ids) < 2:
                continue
            a, b = np.triu_indices(len(ids), k=1)
            out_a.append(ids[a])
            out_b.append(ids[b])
        if dropped_buckets:
            logging.getLogger("graph_data_science_ray.dedup").warning(
                "minhash LSH: dropped %d mega-bucket(s) (>1000 members, %d docs) "
                "— near-dup pairs inside them are NOT emitted",
                dropped_buckets, dropped_docs,
            )
        if not out_a:
            return pd.DataFrame(
                {"doc_a": pd.Series([], dtype=np.int64), "doc_b": pd.Series([], dtype=np.int64)}
            )
        return pd.DataFrame(
            {"doc_a": np.concatenate(out_a), "doc_b": np.concatenate(out_b)}
        )

    pairs = hash_distinct(
        bands.map_batches(tag_bucket, batch_format="pandas")
        .groupby("__part")
        .map_groups(bucket_pairs, batch_format="pandas"),
        ["doc_a", "doc_b"],
    )

    import pyarrow as pa
    import ray

    from graph_data_science_ray.pipelines.agg import hash_join
    from graph_data_science_ray.pipelines.edges import _auto_join_partitions

    nparts = _auto_join_partitions()
    pairs = pairs.materialize()

    # candidate doc-id set: distributed partial-unique + hash_distinct;
    # the BRANCH decision is a distributed count — ids only land on the
    # driver when the broadcast branch is taken (so they are bounded by
    # broadcast_limit by construction)
    def _ids(df: pd.DataFrame) -> pd.DataFrame:
        u = np.unique(
            np.concatenate(
                [df["doc_a"].to_numpy(dtype=np.int64), df["doc_b"].to_numpy(dtype=np.int64)]
            )
        ) if len(df) else np.zeros(0, dtype=np.int64)
        return pd.DataFrame({"id": u})

    cand = hash_distinct(
        pairs.map_batches(_ids, batch_format="pandas"), ["id"],
        num_parts=nparts,
    ).materialize()
    n_cand = cand.count()

    if n_cand <= broadcast_limit:
        # small candidate set: semi-join the doc table down to candidates
        # (distributed filter) and broadcast just those texts once
        cdf = cand.to_pandas()
        cand_ids = (
            np.sort(cdf["id"].to_numpy(dtype=np.int64))
            if "id" in cdf.columns and len(cdf)
            else np.zeros(0, dtype=np.int64)
        )
        ids_ref = ray.put(cand_ids)

        def only_cands(df: pd.DataFrame) -> pd.DataFrame:
            want = ray.get(ids_ref)
            return df[np.isin(df["doc_id"].to_numpy(dtype=np.int64), want)]

        tdf = docs.map_batches(only_cands, batch_format="pandas").to_pandas()
        texts_ref = ray.put(
            dict(zip(tdf["doc_id"].astype(np.int64), tdf["text"].fillna("")))
        )

        def attach(df: pd.DataFrame) -> pd.DataFrame:
            texts = ray.get(texts_ref)
            df = df.copy()
            df["text_a"] = [texts.get(int(a), "") for a in df["doc_a"]]
            df["text_b"] = [texts.get(int(b), "") for b in df["doc_b"]]
            return df

        return pairs.map_batches(attach, batch_format="pandas").map_batches(
            functools.partial(_verify_pairs, threshold=threshold),
            batch_format="pandas",
        )

    # large candidate set: hash-join the pair list back to the doc table
    # for both sides. Schemas are passed explicitly (probing would
    # re-execute the whole LSH pipeline once per join).
    side_a = docs.map_batches(
        lambda df: df.rename(columns={"text": "text_a"}), batch_format="pandas"
    )
    side_b = docs.map_batches(
        lambda df: df.rename(columns={"text": "text_b"}), batch_format="pandas"
    )
    pair_schema = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())])
    doc_schema_a = pa.schema([("doc_id", pa.int64()), ("text_a", pa.string())])
    doc_schema_b = pa.schema([("doc_id", pa.int64()), ("text_b", pa.string())])
    joined = hash_join(
        pairs, side_a, on=["doc_a"], right_on=["doc_id"], num_parts=nparts,
        left_schema=pair_schema, right_schema=doc_schema_a,
    )
    mid_schema = pa.schema(
        [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("text_a", pa.string())]
    )
    joined = hash_join(
        joined, side_b, on=["doc_b"], right_on=["doc_id"], num_parts=nparts,
        left_schema=mid_schema, right_schema=doc_schema_b,
    )
    return joined.map_batches(
        functools.partial(_verify_pairs, threshold=threshold), batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


class SimHasher:
    """64-bit SimHash over word-shingle hashes: bit b of the fingerprint is
    the majority vote of bit b across all shingle hashes. Bit counts are
    one ``reduceat`` over the batch's per-doc shingle segments."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch["text"].fillna("").tolist()
        h, indptr = _shingle_hashes_batch(texts)
        n_docs = len(indptr) - 1
        fps = np.zeros(n_docs, dtype=np.uint64)
        if len(h):
            bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
                np.int32
            )
            seg_counts = np.diff(indptr)
            nz = seg_counts > 0
            starts = indptr[:-1][nz]
            counts = np.add.reduceat(bits, starts, axis=0)  # (nz_docs, 64)
            maj = (counts * 2 >= seg_counts[nz][:, None]).astype(np.uint64)
            packed = (maj << np.arange(64, dtype=np.uint64)[None, :]).sum(
                axis=1, dtype=np.uint64
            )
            fps[nz] = packed
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype(np.int64),
                "simhash": fps.astype(np.int64),  # two's-complement int64 view
            }
        )


def simhash(docs: rd.Dataset, concurrency: int | None = None) -> rd.Dataset:
    from graph_data_science_ray.stages.text import _stage

    return _stage(docs, SimHasher, concurrency, batch_size=2048)


# ---------------------------------------------------------------------------
# exact n-gram Jaccard similarity join
# ---------------------------------------------------------------------------


def _explode_shingles(df: pd.DataFrame) -> pd.DataFrame:
    """Distinct (doc_id, shingle) rows, shingles as word-3-gram STRINGS.

    Same tokenization as ``_shingle_hashes_batch`` (``\\S+`` words, docs
    with <3 tokens collapse to one whole-doc shingle, empty docs emit
    nothing) but keeps the string form so the result is reproducible in
    ANSI SQL. Shingle strings are built by one shifted elementwise concat
    over the batch's flat token stream — no per-shingle Python loop."""
    empty = pd.DataFrame(
        {"doc_id": pd.Series([], dtype=np.int64),
         "shingle": pd.Series([], dtype=object)}
    )
    if not len(df):
        return empty
    texts = df["text"].fillna("").tolist()
    ids = df["doc_id"].to_numpy(dtype=np.int64)
    tok_lists = [_WORD.findall(t) for t in texts]
    counts = np.fromiter(
        (len(t) for t in tok_lists), dtype=np.int64, count=len(tok_lists)
    )
    flat = np.array([w for toks in tok_lists for w in toks], dtype=object)
    n = len(flat)
    doc_of = np.repeat(np.arange(len(texts)), counts)
    out_id, out_sh = [], []
    if n >= 3:
        tri = flat[: n - 2] + " " + flat[1 : n - 1] + " " + flat[2:]
        same = doc_of[: n - 2] == doc_of[2:]
        out_id.append(ids[doc_of[: n - 2][same]])
        out_sh.append(tri[same])
    short = (counts > 0) & (counts < 3)
    if short.any():
        out_id.append(ids[short])
        out_sh.append(
            np.array([" ".join(tok_lists[i]) for i in np.flatnonzero(short)],
                     dtype=object)
        )
    if not out_id:
        return empty
    return pd.DataFrame(
        {"doc_id": np.concatenate(out_id), "shingle": np.concatenate(out_sh)}
    ).drop_duplicates()


def ngram_jaccard_dedup(
    docs: rd.Dataset,
    threshold: float = 0.7,
    num_parts: int = 64,
    max_bucket: int = 10_000,
) -> rd.Dataset:
    """EXACT word-3-gram Jaccard near-duplicate pairs.

    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b and
    jaccard >= threshold (rounded to 6 places in the output; the filter
    runs on the unrounded value). The exact member of the dedup family —
    no signature/banding approximation, and shingles join AS STRINGS so
    a DuckDB/ANSI-SQL oracle reproduces it verbatim.

    Scale shape (the standard exact set-similarity join): explode to
    distinct (doc_id, shingle) rows via one shifted elementwise concat
    per batch → hash-partition by shingle → per-shingle candidate pairs
    → intersection counts via hash-aggregate → per-doc set sizes join
    back for |A∪B| = |A|+|B|-|A∩B|. Shuffle volume is O(total tokens);
    pair volume is bounded by shingle co-occurrence. Shingles shared by
    more than ``max_bucket`` docs (boilerplate) would emit quadratic
    pairs and are dropped WITH a logged count — pairs whose overlap is
    only boilerplate are then missed. Prefer ``dedup_minhash_lsh`` at
    corpus scale: it winnows candidates by signature instead of joining
    every shared shingle.
    """
    import pyarrow as pa

    from graph_data_science_ray.pipelines.agg import (
        _stable_row_hash,
        hash_aggregate,
        hash_join,
    )

    docs = docs.select_columns(["doc_id", "text"])
    exploded = docs.map_batches(
        _explode_shingles, batch_format="pandas", batch_size=2048
    ).materialize()  # consumed twice: sizes + pair generation

    sizes = hash_aggregate(
        exploded.map_batches(
            lambda df: pd.DataFrame(
                {"doc_id": df["doc_id"].astype(np.int64),
                 "one": np.ones(len(df), dtype=np.int64)}
            ),
            batch_format="pandas",
        ),
        ["doc_id"], "one", op="sum", num_parts=num_parts, out_col="n",
    )

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__part"] = (
            _stable_row_hash(df, ["shingle"]) % num_parts
        ).astype(np.int64)
        return df

    def shingle_pairs(g: pd.DataFrame) -> pd.DataFrame:
        import logging

        out_a, out_b = [], []
        dropped = 0
        for _, grp in g.groupby("shingle", sort=False):
            ids = np.unique(grp["doc_id"].to_numpy(dtype=np.int64))
            if len(ids) < 2:
                continue
            if len(ids) > max_bucket:
                dropped += 1
                continue
            a, b = np.triu_indices(len(ids), k=1)
            out_a.append(ids[a])
            out_b.append(ids[b])
        if dropped:
            logging.getLogger("graph_data_science_ray.dedup").warning(
                "ngram_jaccard: dropped %d boilerplate shingle(s) shared by "
                ">%d docs — pairs overlapping ONLY there are not emitted",
                dropped, max_bucket,
            )
        if not out_a:
            return pd.DataFrame(
                {"doc_a": pd.Series([], dtype=np.int64),
                 "doc_b": pd.Series([], dtype=np.int64),
                 "c": pd.Series([], dtype=np.int64)}
            )
        return pd.DataFrame(
            {"doc_a": np.concatenate(out_a), "doc_b": np.concatenate(out_b),
             "c": np.ones(sum(len(x) for x in out_a), dtype=np.int64)}
        )

    inter = hash_aggregate(
        exploded.map_batches(tag, batch_format="pandas")
        .groupby("__part")
        .map_groups(shingle_pairs, batch_format="pandas"),
        ["doc_a", "doc_b"], "c", op="sum", num_parts=num_parts,
    )

    pair_schema = pa.schema(
        [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("c", pa.int64())]
    )
    size_schema_a = pa.schema([("doc_a", pa.int64()), ("na", pa.int64())])
    size_schema_b = pa.schema([("doc_b", pa.int64()), ("nb", pa.int64())])
    sizes_a = sizes.map_batches(
        lambda df: df.rename(columns={"doc_id": "doc_a", "n": "na"}),
        batch_format="pandas",
    )
    sizes_b = sizes.map_batches(
        lambda df: df.rename(columns={"doc_id": "doc_b", "n": "nb"}),
        batch_format="pandas",
    )
    joined = hash_join(
        inter, sizes_a, on=["doc_a"], num_parts=num_parts,
        left_schema=pair_schema, right_schema=size_schema_a,
    )
    mid_schema = pa.schema(
        [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("c", pa.int64()),
         ("na", pa.int64())]
    )
    joined = hash_join(
        joined, sizes_b, on=["doc_b"], num_parts=num_parts,
        left_schema=mid_schema, right_schema=size_schema_b,
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {"doc_a": pd.Series([], dtype=np.int64),
                 "doc_b": pd.Series([], dtype=np.int64),
                 "jaccard": pd.Series([], dtype=np.float64)}
            )
        c = df["c"].to_numpy(dtype=np.float64)
        union = (
            df["na"].to_numpy(dtype=np.float64)
            + df["nb"].to_numpy(dtype=np.float64)
            - c
        )
        j = c / union
        keep = j >= threshold
        return pd.DataFrame(
            {"doc_a": df["doc_a"].to_numpy(dtype=np.int64)[keep],
             "doc_b": df["doc_b"].to_numpy(dtype=np.int64)[keep],
             "jaccard": np.round(j[keep], 6)}
        )

    return joined.map_batches(finish, batch_format="pandas")


def _explode_spans(df: pd.DataFrame, window: int) -> pd.DataFrame:
    """Distinct (doc_id, span) rows where span = ``window`` consecutive
    whitespace tokens joined by single spaces (stride 1).

    Same tokenization as ``_explode_shingles``; docs with fewer than
    ``window`` tokens emit nothing (their span counts are zero-filled by
    the caller). The span strings are built by ``window`` shifted
    elementwise concats over the batch's flat token stream — no
    per-span Python loop — and stay strings so an ANSI-SQL oracle can
    reproduce them verbatim."""
    empty = pd.DataFrame(
        {"doc_id": pd.Series([], dtype=np.int64),
         "span": pd.Series([], dtype=object)}
    )
    if not len(df):
        return empty
    texts = df["text"].fillna("").tolist()
    ids = df["doc_id"].to_numpy(dtype=np.int64)
    tok_lists = [_WORD.findall(t) for t in texts]
    counts = np.fromiter(
        (len(t) for t in tok_lists), dtype=np.int64, count=len(tok_lists)
    )
    flat = np.array([w for toks in tok_lists for w in toks], dtype=object)
    n = len(flat)
    if n < window:
        return empty
    doc_of = np.repeat(np.arange(len(texts)), counts)
    m = n - window + 1
    span = flat[:m].copy()
    for j in range(1, window):
        span = span + " "
        span = span + flat[j : j + m]
    same = doc_of[:m] == doc_of[window - 1 :]
    if not same.any():
        return empty
    return pd.DataFrame(
        {"doc_id": ids[doc_of[:m][same]], "span": span[same]}
    ).drop_duplicates()


def duplicate_spans(
    docs: rd.Dataset,
    window: int = 8,
    num_parts: int = 64,
    min_docs: int = 2,
) -> rd.Dataset:
    """Cross-document duplicated-span detection (exact substring dedup
    signal at token granularity, the Lee et al. 2021 "Deduplicating
    Training Data Makes Language Models Better" shape applied per fixed
    ``window``-token span).

    Returns one row per input doc:
    ``(doc_id, n_spans, dup_spans, dup_flag)`` where ``n_spans`` is the
    doc's DISTINCT span count, ``dup_spans`` how many of those spans
    occur in at least ``min_docs`` distinct docs (itself included), and
    ``dup_flag = dup_spans >= 1``. Docs shorter than ``window`` tokens
    have zero spans and are never flagged.

    Scale shape: explode to distinct (doc_id, span) rows (one shifted
    elementwise concat per batch) → hash-partitioned per-span distinct-doc
    counts → spans with count ≥ ``min_docs`` hash-join back to the
    exploded rows → per-doc sums, zero-fill union with the full doc-id
    list. Shuffle volume is O(total tokens); nothing is broadcast or
    collected on the driver. Span keys are content strings — uniformly
    distributed, no skew handling needed; a boilerplate span shared by
    many docs costs one aggregate row plus its join fan-out (bounded by
    the exploded rows that already exist), never a quadratic pair list.
    """
    import pyarrow as pa

    from graph_data_science_ray.pipelines.agg import hash_aggregate, hash_join

    docs = docs.select_columns(["doc_id", "text"])
    exploded = docs.map_batches(
        lambda df: _explode_spans(df, window),
        batch_format="pandas", batch_size=2048,
    ).materialize()  # consumed twice: per-doc sizes + dup-span join

    span_docs = hash_aggregate(
        exploded.map_batches(
            lambda df: pd.DataFrame(
                {"span": df["span"],
                 "one": np.ones(len(df), dtype=np.int64)}
            ),
            batch_format="pandas",
        ),
        ["span"], "one", op="sum", num_parts=num_parts, out_col="nd",
    )
    dup_sp = span_docs.map_batches(
        lambda df: df[df["nd"] >= min_docs][["span"]],
        batch_format="pandas",
    )
    hit = hash_join(
        exploded, dup_sp, on=["span"], num_parts=num_parts,
        left_schema=pa.schema([("doc_id", pa.int64()), ("span", pa.string())]),
        right_schema=pa.schema([("span", pa.string())]),
    )

    def _ones(df: pd.DataFrame, col: str) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": df["doc_id"].astype(np.int64),
             col: np.ones(len(df), dtype=np.int64)}
        )

    def _zeros(df: pd.DataFrame, col: str) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": df["doc_id"].astype(np.int64),
             col: np.zeros(len(df), dtype=np.int64)}
        )

    # zero-fill union with the full doc-id list on BOTH counters so every
    # input doc gets exactly one output row.
    n_spans = hash_aggregate(
        docs.map_batches(lambda df: _zeros(df, "c"), batch_format="pandas")
        .union(exploded.map_batches(lambda df: _ones(df, "c"),
                                    batch_format="pandas")),
        ["doc_id"], "c", op="sum", num_parts=num_parts, out_col="n_spans",
    )
    dup_cnt = hash_aggregate(
        docs.map_batches(lambda df: _zeros(df, "d"), batch_format="pandas")
        .union(hit.map_batches(lambda df: _ones(df, "d"),
                               batch_format="pandas")),
        ["doc_id"], "d", op="sum", num_parts=num_parts, out_col="dup_spans",
    )
    totals = hash_join(
        n_spans, dup_cnt, on=["doc_id"], num_parts=num_parts,
        left_schema=pa.schema([("doc_id", pa.int64()), ("n_spans", pa.int64())]),
        right_schema=pa.schema([("doc_id", pa.int64()), ("dup_spans", pa.int64())]),
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        d = df["dup_spans"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {"doc_id": df["doc_id"].astype(np.int64),
             "n_spans": df["n_spans"].to_numpy(dtype=np.int64),
             "dup_spans": d,
             "dup_flag": (d >= 1).astype(np.int64)}
        )

    return totals.map_batches(finish, batch_format="pandas")


def dedup_clusters(
    docs: rd.Dataset,
    threshold: float = 0.5,
    num_parts: int = 64,
    max_rounds: int = 50,
    pairs: rd.Dataset | None = None,
) -> rd.Dataset:
    """Near-duplicate CLUSTERS with a canonical keeper per cluster —
    the step after pairwise dedup that a curation pipeline actually
    needs (near-dup relations are not transitive pairwise; the keeper
    set must come from connected components of the pair graph).

    Builds the exact word-3-gram Jaccard pair graph at ``threshold``
    (or accepts any precomputed (doc_a, doc_b) pair Dataset, e.g. from
    ``dedup_minhash_lsh``) and runs a distributed hash-min connected
    components fixpoint OVER THE PAIR DATASET — no CSR projection, no
    driver state: per round, labels hash-join onto the symmetrized
    pairs, messages min-aggregate per doc, and convergence is detected
    by the scalar ``sum(label)`` (labels only decrease, so the sum is
    strictly decreasing until fixpoint). Loop-carried label state is
    re-materialized with a bounded block count each round.

    Returns one row per input doc: ``(doc_id, cluster, is_keeper)``
    where ``cluster`` is the smallest doc_id in the doc's near-dup
    component (singletons cluster to themselves) and
    ``is_keeper = doc_id == cluster``.
    """
    import pyarrow as pa

    from graph_data_science_ray.pipelines.agg import (
        hash_aggregate,
        hash_join,
        materialize_bounded,
    )

    if pairs is None:
        pairs = ngram_jaccard_dedup(docs, threshold=threshold,
                                    num_parts=num_parts)

    def _sym(df: pd.DataFrame) -> pd.DataFrame:
        a = df["doc_a"].to_numpy(dtype=np.int64)
        b = df["doc_b"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {"s": np.concatenate([a, b]), "d": np.concatenate([b, a])}
        )

    sym = materialize_bounded(
        pairs.map_batches(_sym, batch_format="pandas"), num_parts
    )
    labels = materialize_bounded(
        docs.select_columns(["doc_id"]).map_batches(
            lambda df: pd.DataFrame(
                {"doc_id": df["doc_id"].astype(np.int64),
                 "lab": df["doc_id"].astype(np.int64)}
            ),
            batch_format="pandas",
        ),
        num_parts,
    )
    lab_schema = pa.schema([("doc_id", pa.int64()), ("lab", pa.int64())])
    sym_schema = pa.schema([("s", pa.int64()), ("d", pa.int64())])
    prev_sum = labels.sum("lab")
    for _ in range(max_rounds):
        lab_s = labels.map_batches(
            lambda df: df.rename(columns={"doc_id": "s"}),
            batch_format="pandas",
        )
        msgs = hash_join(
            sym, lab_s, on=["s"], num_parts=num_parts,
            left_schema=sym_schema,
            right_schema=pa.schema([("s", pa.int64()), ("lab", pa.int64())]),
        ).map_batches(
            lambda df: pd.DataFrame(
                {"doc_id": df["d"].astype(np.int64),
                 "lab": df["lab"].astype(np.int64)}
            ),
            batch_format="pandas",
        )
        labels = materialize_bounded(
            hash_aggregate(labels.union(msgs), ["doc_id"], "lab",
                           op="min", num_parts=num_parts),
            num_parts,
        )
        cur_sum = labels.sum("lab")
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        d = df["doc_id"].to_numpy(dtype=np.int64)
        lab = df["lab"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {"doc_id": d, "cluster": lab,
             "is_keeper": (d == lab).astype(np.int64)}
        )

    return labels.map_batches(finish, batch_format="pandas")


def decontaminate(
    docs: rd.Dataset,
    benchmark: rd.Dataset,
    num_parts: int = 64,
    min_hits: int = 1,
) -> rd.Dataset:
    """Benchmark decontamination: flag corpus docs sharing word-3-gram
    shingles with a benchmark/eval set (the standard n-gram-overlap
    decontamination step of LLM training-data pipelines).

    Returns one row per corpus doc: (doc_id, hits, contaminated) where
    ``hits`` is the number of DISTINCT corpus-doc shingles that occur
    anywhere in the benchmark and ``contaminated = hits >= min_hits``.
    Shingles join AS STRINGS (same tokenization as
    ``ngram_jaccard_dedup``), so an ANSI-SQL oracle reproduces the flags
    verbatim.

    Scale shape: both sides explode to distinct (id, shingle) rows;
    benchmark shingles reduce to a distinct-shingle table (benchmarks
    are small relative to the corpus, but the join is hash-partitioned
    either way — nothing is broadcast or collected); corpus hits come
    from a shingle-keyed hash join + per-doc sum, then a zero-fill union
    with the full doc-id list so clean docs keep hits = 0. Shuffle
    volume is O(total corpus tokens), the exact-dedup shape.
    """
    from graph_data_science_ray.pipelines.agg import hash_aggregate, hash_join

    docs = docs.select_columns(["doc_id", "text"])
    d_ex = docs.map_batches(_explode_shingles, batch_format="pandas", batch_size=2048)
    b_ex = (
        benchmark.select_columns(["doc_id", "text"])
        .map_batches(_explode_shingles, batch_format="pandas", batch_size=2048)
    )
    bench_sh = hash_aggregate(
        b_ex.map_batches(
            lambda df: pd.DataFrame(
                {"shingle": df["shingle"],
                 "one": np.ones(len(df), dtype=np.int64)}
            ),
            batch_format="pandas",
        ),
        ["shingle"], "one", op="sum", num_parts=num_parts, out_col="nb",
    )
    import pyarrow as pa

    joined = hash_join(
        d_ex, bench_sh, on=["shingle"], num_parts=num_parts,
        left_schema=pa.schema(
            [("doc_id", pa.int64()), ("shingle", pa.string())]
        ),
        right_schema=pa.schema(
            [("shingle", pa.string()), ("nb", pa.int64())]
        ),
    )
    hit_rows = joined.map_batches(
        lambda df: pd.DataFrame(
            {"doc_id": df["doc_id"].astype(np.int64),
             "h": np.ones(len(df), dtype=np.int64)}
        ),
        batch_format="pandas",
    )
    base = docs.map_batches(
        lambda df: pd.DataFrame(
            {"doc_id": df["doc_id"].astype(np.int64),
             "h": np.zeros(len(df), dtype=np.int64)}
        ),
        batch_format="pandas",
    )
    hits = hash_aggregate(
        base.union(hit_rows), ["doc_id"], "h", op="sum",
        num_parts=num_parts, out_col="hits",
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        h = df["hits"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {"doc_id": df["doc_id"].astype(np.int64),
             "hits": h,
             "contaminated": (h >= min_hits).astype(np.int64)}
        )

    return hits.map_batches(finish, batch_format="pandas")


def dedup_cap_flags(
    docs: rd.Dataset,
    max_copies: int = 2,
    salt: str = "cap",
    num_parts: int = 64,
) -> rd.Dataset:
    """Frequency-capped dedup: at most ``max_copies`` keepers per
    identical text.  Returns ``(doc_id, rank, keep)``.

    Hard dedup (keep-one) over-penalizes naturally repeated content —
    boilerplate licenses, canonical snippets — whose *frequency* carries
    signal; practical pipelines cap copies instead (the repetition-
    tradeoff observation of Lee et al., "Deduplicating training data
    makes language models better", ACL 2022).  Within each duplicate
    cluster documents are ranked by ``md5(doc_id:salt)`` (deterministic,
    engine-independent — the repo's sampling-order discipline) with
    doc_id as the tiebreak, and ``keep = rank <= max_copies``.

    Scale shape: one content-hash shuffle (``groupby(fp)``); clusters
    rank locally inside their group; output is per-document flags that
    hash-join back onto the table for the filtered view.
    """
    from graph_data_science_ray.stages.text import Fingerprint

    fps = docs.map_batches(Fingerprint(), batch_format="pandas",
                           batch_size=8192)

    def rank_group(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["doc_id"].to_numpy(dtype=np.int64)
        r = np.array(
            [hashlib.md5(f"{i}:{salt}".encode()).hexdigest() for i in ids],
            dtype=object,
        )
        order = np.lexsort((ids, r))
        rank = np.empty(len(ids), dtype=np.int64)
        rank[order] = np.arange(1, len(ids) + 1)
        return pd.DataFrame(
            {"doc_id": ids, "rank": rank,
             "keep": (rank <= int(max_copies)).astype(np.int64)}
        )

    return fps.groupby("fp").map_groups(rank_group, batch_format="pandas")

"""Deduplication stages: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale shapes:
- exact: content-hash in a vectorized ``map_batches`` → hash-partitioned
  ``groupby(fp)`` keep-first (min doc_id — deterministic);
- MinHash-LSH: shingle→minhash per batch (one permutation family,
  vectorized) → explode to (band, band_hash, doc_id) rows → groupby band
  buckets → candidate pairs → exact-Jaccard verification per pair;
- SimHash: 64-bit hyperplane-free token-hash majority fingerprint.

All stages treat the shuffle keys as content hashes — uniformly
distributed, no skew handling needed.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import ray.data as rd

_WORD = re.compile(r"\S+")


def _token_hashes(text: str) -> np.ndarray:
    """Stable 64-bit hashes of word 3-shingles."""
    toks = _WORD.findall(text)
    if len(toks) < 3:
        shingles = [" ".join(toks)] if toks else []
    else:
        shingles = [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
    out = np.empty(len(shingles), dtype=np.uint64)
    for i, s in enumerate(shingles):
        out[i] = int.from_bytes(
            hashlib.blake2b(s.encode(), digest_size=8).digest(), "little"
        )
    return out


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def dedup_exact(docs: rd.Dataset) -> rd.Dataset:
    """Keep the smallest doc_id per identical text. Returns (fp, doc_id)."""
    from graph_data_science_ray.pipelines.agg import hash_aggregate
    from graph_data_science_ray.stages.text import Fingerprint

    fps = docs.map_batches(Fingerprint(), batch_format="pandas", batch_size=8192)
    return hash_aggregate(fps, ["fp"], "doc_id", op="min")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


class MinHasher:
    """Per-batch MinHash signatures: ``sig[i] = min((a_i * h + b_i) mod p)``
    over shingle hashes h, with a seeded permutation family built once per
    actor."""

    def __init__(self, num_hashes: int = 64, seed: int = 17):
        rng = np.random.default_rng(seed)
        self.p = np.uint64((1 << 61) - 1)
        self.a = rng.integers(1, self.p, size=num_hashes, dtype=np.uint64)
        self.b = rng.integers(0, self.p, size=num_hashes, dtype=np.uint64)
        self.num_hashes = num_hashes

    def signature(self, text: str) -> np.ndarray:
        h = _token_hashes(text)
        if len(h) == 0:
            return np.zeros(self.num_hashes, dtype=np.uint64)
        with np.errstate(over="ignore"):
            vals = (h[None, :] * self.a[:, None] + self.b[:, None]) % self.p
        return vals.min(axis=1)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs = np.stack([self.signature(t) for t in batch["text"].fillna("")])
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype(np.int64),
                "sig": list(sigs),
            }
        )


def _band_rows(batch: pd.DataFrame, num_bands: int, rows_per_band: int) -> pd.DataFrame:
    doc_ids, bands, keys = [], [], []
    for did, sig in zip(batch["doc_id"], batch["sig"]):
        sig = np.asarray(sig, dtype=np.uint64)
        for b in range(num_bands):
            chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
            key = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
            doc_ids.append(did)
            bands.append(b)
            keys.append(key)
    return pd.DataFrame({"doc_id": doc_ids, "band": bands, "key": keys})


def jaccard(a: str, b: str) -> float:
    sa, sb = set(_token_hashes(a)), set(_token_hashes(b))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(1, len(sa | sb))


def dedup_minhash_lsh(
    docs: rd.Dataset,
    num_hashes: int = 64,
    num_bands: int = 16,
    threshold: float = 0.7,
    seed: int = 17,
) -> rd.Dataset:
    """Near-duplicate pairs via MinHash banding + exact-Jaccard verify.

    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard >= threshold.
    """
    rows_per_band = num_hashes // num_bands
    docs = docs.select_columns(["doc_id", "text"]).materialize()
    sigs = docs.map_batches(
        MinHasher(num_hashes, seed), batch_format="pandas", batch_size=4096,
    )
    import functools

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
        out_a, out_b = [], []
        for _, grp in g.groupby(["band", "key"], sort=False):
            ids = np.sort(grp["doc_id"].to_numpy(dtype=np.int64))
            if len(ids) < 2 or len(ids) > 1000:  # skip degenerate mega-buckets
                continue
            a, b = np.triu_indices(len(ids), k=1)
            out_a.append(ids[a])
            out_b.append(ids[b])
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
    # verify candidates with exact shingle Jaccard. The doc texts are
    # broadcast once via ray.put (candidate verification is a small-side
    # lookup); at 100 TB scale this becomes a hash-join of the candidate
    # pairs back to the doc table on doc_id instead.
    import ray

    tdf = docs.to_pandas()
    texts_ref = ray.put(dict(zip(tdf["doc_id"].astype(np.int64), tdf["text"].fillna(""))))

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame(
                {"doc_a": pd.Series([], dtype=np.int64),
                 "doc_b": pd.Series([], dtype=np.int64),
                 "jaccard": pd.Series([], dtype=np.float64)}
            )
        texts = ray.get(texts_ref)
        js = [
            jaccard(texts.get(a, ""), texts.get(b, ""))
            for a, b in zip(batch["doc_a"], batch["doc_b"])
        ]
        out = batch.assign(jaccard=np.round(js, 6))
        return out[out["jaccard"] >= threshold]

    return pairs.map_batches(verify, batch_format="pandas")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


class SimHasher:
    """64-bit SimHash over word-shingle hashes: bit b of the fingerprint is
    the majority vote of bit b across all shingle hashes."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        fps = np.empty(len(batch), dtype=np.uint64)
        for i, t in enumerate(batch["text"].fillna("")):
            h = _token_hashes(t)
            if len(h) == 0:
                fps[i] = 0
                continue
            bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).sum(axis=0)
            fp = np.uint64(0)
            for b in range(64):
                if bits[b] * 2 >= len(h):
                    fp |= np.uint64(1) << np.uint64(b)
            fps[i] = fp
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype(np.int64),
                "simhash": fps.astype(np.int64),  # two's-complement int64 view
            }
        )


def simhash(docs: rd.Dataset, concurrency: int | None = None) -> rd.Dataset:
    from graph_data_science_ray.stages.text import _stage

    return _stage(docs, SimHasher, concurrency, batch_size=2048)

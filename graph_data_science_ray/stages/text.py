"""Text-analysis stages for large-scale training-data pipelines.

Vectorized ``map_batches`` stages over a document table
``(doc_id:int64, text:string, ...)``: token counting, quality statistics,
document fingerprinting, language identification. Regexes and models are
compiled once per actor (callable classes → actor pools), work happens
per batch in pandas/pyarrow kernels.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import ray.data as rd


def _stage(docs: rd.Dataset, cls, concurrency: int | None, batch_size: int = 8192,
           batch_format: str = "pandas") -> rd.Dataset:
    """Run a stage as stateless tasks by default; as an actor pool only when
    an explicit ``concurrency`` is given. An actor pool sized at the full
    CPU count starves the other operators in the same pipeline (see
    ray_guide "Stateful stages") — these stages hold no heavy state, so a
    per-task instance (setup cost: one regex compile) is the right default.
    """
    if concurrency:
        return docs.map_batches(
            cls, batch_format=batch_format, batch_size=batch_size,
            concurrency=concurrency, num_cpus=1,
        )
    return docs.map_batches(cls(), batch_format=batch_format, batch_size=batch_size)


class TokenCount:
    """tokens = maximal runs of non-whitespace (``\\S+``) — the exact
    definition the SQL oracle mirrors with regexp_split + filter.

    Arrow-native: ``pc.count_substring_regex`` over the zero-copy string
    column — 1.63× the pandas ``str.findall().str.len()`` path at
    matched calib (sf0.1 A/B, BASELINE.md round-5 notes; findall
    materializes a Python list per row, the count kernel never leaves
    Arrow).  QualityStats stays pandas: its three-kernel Arrow variant
    measured 0.72× (slower), so it keeps the ``.str`` path."""

    def __call__(self, batch: "pa.Table") -> "pa.Table":
        import pyarrow as pa
        import pyarrow.compute as pc

        n = pc.count_substring_regex(
            pc.fill_null(batch["text"], ""), r"\S+"
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "n_tokens": n.cast(pa.int64()),
            }
        )


def token_count(docs: rd.Dataset, concurrency: int | None = None) -> rd.Dataset:
    return _stage(docs, TokenCount, concurrency, batch_format="pyarrow")


class QualityStats:
    """Deterministic quality columns: word count, alphabetic-character
    ratio, mean word length — the length/punctuation-ratio style scoring
    used for pretraining-data filtering (defined so the SQL oracle can
    reproduce them exactly)."""

    def __init__(self):
        self.word = re.compile(r"\S+")
        self.alpha = re.compile(r"[^a-zA-Z]")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"].fillna("")
        n_chars = text.str.len().astype(np.int64)
        words = text.str.findall(self.word)
        n_words = words.str.len().astype(np.int64)
        n_alpha = text.str.replace(self.alpha, "", regex=True).str.len().astype(np.int64)
        alpha_ratio = np.where(n_chars > 0, n_alpha / n_chars, 0.0)
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype(np.int64),
                "n_words": n_words,
                "n_alpha": n_alpha,
                "n_chars": n_chars,
                "alpha_ratio": alpha_ratio,
            }
        )


def quality_stats(docs: rd.Dataset, concurrency: int | None = None) -> rd.Dataset:
    return _stage(docs, QualityStats, concurrency)


class Fingerprint:
    """Content fingerprint = md5(text) hex — exact-dedup key, replicable
    by DuckDB's ``md5()``."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype(np.int64),
                "fp": [
                    hashlib.md5(t.encode("utf-8")).hexdigest()
                    for t in batch["text"].fillna("")
                ],
            }
        )


def fingerprint(docs: rd.Dataset, concurrency: int | None = None) -> rd.Dataset:
    return _stage(docs, Fingerprint, concurrency)


_STOPWORDS = {
    "en": {"the", "a", "of", "to", "and", "in", "is", "it", "that", "for"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "una", "es", "los"},
    "de": {"der", "die", "das", "und", "in", "den", "von", "zu", "mit", "ist"},
    "fr": {"le", "la", "de", "et", "les", "des", "un", "une", "est", "que"},
}


class LangId:
    """Stopword-overlap language-ID heuristic (n-gram-free, deterministic).

    Scores each language by stopword hit ratio; falls back to "unk" when
    nothing matches. Vectorized across the batch: one tokenize pass, one
    exploded token table, per-language membership via ``np.isin`` and
    per-doc ratios via ``bincount``. A heuristic stage, not a model —
    but fully deterministic, so the `lang_id` SQL oracle reproduces the
    scores, first-max-in-sorted-lang-order tie rule, and 0.02 threshold
    exactly."""

    def __init__(self):
        self.word = re.compile(r"[a-zA-Zàâçéèêëîïôûùüáíóúñäöüß]+")
        self.langs = sorted(_STOPWORDS)
        self.sw = {
            lang: np.sort(np.array(sorted(_STOPWORDS[lang]), dtype="U"))
            for lang in self.langs
        }

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        tok_lists = [self.word.findall(t) for t in batch["text"].fillna("")]
        counts = np.fromiter((len(t) for t in tok_lists), dtype=np.int64, count=n)
        flat = np.array(
            [w.lower() for toks in tok_lists for w in toks], dtype="U"
        )
        scores = np.zeros((n, len(self.langs)), dtype=np.float64)
        if len(flat):
            doc_of = np.repeat(np.arange(n, dtype=np.int64), counts)
            denom = np.maximum(counts, 1).astype(np.float64)
            for li, lang in enumerate(self.langs):
                hit = np.isin(flat, self.sw[lang])
                scores[:, li] = np.bincount(
                    doc_of[hit], minlength=n
                ).astype(np.float64) / denom
        best = np.argmax(scores, axis=1)
        best_score = scores[np.arange(n), best]
        langs_arr = np.array(self.langs, dtype=object)
        preds = np.where(best_score > 0.02, langs_arr[best], "unk")
        return pd.DataFrame(
            {"doc_id": batch["doc_id"].astype(np.int64), "lang_pred": preds}
        )


def lang_id(docs: rd.Dataset, concurrency: int | None = None) -> rd.Dataset:
    return _stage(docs, LangId, concurrency)


class BpeishTokenCount:
    """BPE-style pre-tokenizer count: letter runs, single digits, and
    punctuation runs (the GPT-2 pre-tokenizer's ASCII core). The pattern
    is deliberately RE2-compatible so DuckDB's ``regexp_extract_all``
    reproduces it exactly for the oracle."""

    PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]+"

    def __init__(self):
        self.pat = re.compile(self.PATTERN)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype(np.int64),
                "n_bpe_tokens": batch["text"].fillna("")
                .str.findall(self.pat).str.len().astype(np.int64),
            }
        )


def bpe_token_count(docs: rd.Dataset, concurrency: int | None = None) -> rd.Dataset:
    return _stage(docs, BpeishTokenCount, concurrency)


class WinnowFingerprint:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken '03):
    rolling hashes of char k-grams, minimum per sliding window — the
    substring-level near-duplicate key set. Vectorized per doc: byte
    array → polynomial rolling hash via cumulative powers → windowed min
    via a stride trick. Emits (doc_id, fp) rows, one per selected
    fingerprint (deduplicated within a doc)."""

    def __init__(self, k: int = 8, window: int = 16):
        self.k = int(k)
        self.window = int(window)
        self.base = np.uint64(257)
        self.mask = np.uint64((1 << 61) - 1)

    def _grams(self, data: np.ndarray) -> np.ndarray:
        """Rolling hashes of all k-grams of a uint8 array (vectorized)."""
        k = self.k
        n = len(data)
        if n < k:
            return np.zeros(0, dtype=np.uint64)
        with np.errstate(over="ignore"):
            powers = np.ones(k, dtype=np.uint64)
            for i in range(1, k):
                powers[i] = powers[i - 1] * self.base
            # windows as a (n-k+1, k) view, dot with powers mod 2^64
            from numpy.lib.stride_tricks import sliding_window_view

            win = sliding_window_view(data.astype(np.uint64), k)
            return (win * powers[::-1][None, :]).sum(axis=1, dtype=np.uint64)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids, fps = [], []
        for did, t in zip(batch["doc_id"], batch["text"].fillna("")):
            data = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
            g = self._grams(data)
            if len(g) == 0:
                continue
            w = min(self.window, len(g))
            from numpy.lib.stride_tricks import sliding_window_view

            sel = np.unique(sliding_window_view(g, w).min(axis=1))
            ids.extend([int(did)] * len(sel))
            fps.extend(sel.astype(np.int64).tolist())
        return pd.DataFrame(
            {"doc_id": pd.Series(ids, dtype=np.int64),
             "fp": pd.Series(fps, dtype=np.int64)}
        )


def winnow_fingerprints(
    docs: rd.Dataset, k: int = 8, window: int = 16, concurrency: int | None = None
) -> rd.Dataset:
    """Winnowing fingerprint rows (doc_id, fp). Docs sharing fingerprints
    share k-char substrings; group by fp for substring-duplicate
    candidate pairs (same shuffle shape as MinHash bands)."""
    import functools

    cls = functools.partial(WinnowFingerprint, k=k, window=window)
    return _stage(docs, cls, concurrency, batch_size=2048)


class _NgramPartials:
    """Per-batch word n-gram partial counts (map-side combine).

    Tokens are ``\\S+`` runs (the repo-wide definition the SQL oracles
    mirror); an n-gram is n consecutive same-doc tokens joined by a
    single space, built with one shifted elementwise concat over the
    batch's flat token stream — no per-gram Python loop. Emitting
    ``(ngram, cnt)`` uniques per batch keeps the shuffle payload at
    vocabulary cardinality instead of token cardinality."""

    def __init__(self, n: int = 2):
        self.n = int(n)
        self.pat = re.compile(r"\S+")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"ngram": pd.Series([], dtype=object),
             "cnt": pd.Series([], dtype=np.int64)}
        )
        if not len(batch):
            return empty
        tok_lists = [self.pat.findall(t or "") for t in batch["text"].fillna("")]
        counts = np.fromiter(
            (len(t) for t in tok_lists), dtype=np.int64, count=len(tok_lists)
        )
        flat = np.array([w for toks in tok_lists for w in toks], dtype=object)
        m = len(flat)
        n = self.n
        if m < n:
            return empty
        doc_of = np.repeat(np.arange(len(tok_lists)), counts)
        grams = flat[: m - n + 1].copy()
        for j in range(1, n):
            grams = grams + " "
            grams = grams + flat[j : m - n + 1 + j]
        same = doc_of[: m - n + 1] == doc_of[n - 1 :]
        grams = grams[same]
        if not len(grams):
            return empty
        uniq, cnt = np.unique(grams, return_counts=True)
        return pd.DataFrame(
            {"ngram": uniq.astype(object), "cnt": cnt.astype(np.int64)}
        )


def ngram_topk(
    docs: rd.Dataset,
    n: int = 2,
    k: int = 100,
    num_parts: int = 64,
    concurrency: int | None = None,
) -> rd.Dataset:
    """Global top-K most frequent word n-grams — vocabulary building for
    training-data pipelines. Returns (ngram, cnt), ties broken by ngram
    ascending so the cut at rank k is deterministic.

    Map-side partial counts (vocabulary-sized batches), hash-partitioned
    sum, then a distributed sort + limit — the full token stream never
    concentrates anywhere, and the sorted table is already aggregate-
    (vocabulary-) sized."""
    import functools

    from graph_data_science_ray.pipelines.agg import hash_aggregate

    cls = functools.partial(_NgramPartials, n=n)
    partials = _stage(docs, cls, concurrency, batch_size=4096)
    totals = hash_aggregate(partials, ["ngram"], "cnt", op="sum", num_parts=num_parts)
    return totals.sort(["cnt", "ngram"], descending=[True, False]).limit(int(k))


class NormalizeText:
    """Canonical text normalization for dedup/tokenization pipelines:
    NFC unicode normalization, lowercasing, and whitespace collapse
    (runs of whitespace → one space, stripped ends). Each step is
    deliberately mirrored by a DuckDB builtin (nfc_normalize / lower /
    regexp_replace + trim) so the `normalize_text` oracle is exact."""

    def __init__(self):
        self.ws = re.compile(r"\s+")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        import unicodedata

        out = [
            self.ws.sub(" ", unicodedata.normalize("NFC", t).lower()).strip()
            for t in batch["text"].fillna("")
        ]
        return pd.DataFrame(
            {"doc_id": batch["doc_id"].astype(np.int64), "norm_text": out}
        )


def normalize_text(docs: rd.Dataset, concurrency: int | None = None) -> rd.Dataset:
    return _stage(docs, NormalizeText, concurrency)


class ChunkDocuments:
    """Fixed-token-window document chunking with overlap — the
    doc→chunks step of embedding/RAG pipelines. Chunk i covers tokens
    ``[i·stride, i·stride + chunk_tokens)`` (``stride = chunk_tokens −
    overlap``), one chunk per start < n_tokens; the final chunk may be
    short. Tokens are ``\\S+`` runs joined by single spaces, so the SQL
    oracle (regexp_extract_all + 1-based inclusive list slices) is
    exact."""

    def __init__(self, chunk_tokens: int = 64, overlap: int = 16):
        if overlap >= chunk_tokens:
            raise ValueError("overlap must be < chunk_tokens")
        self.ct = int(chunk_tokens)
        self.stride = int(chunk_tokens - overlap)
        self.pat = re.compile(r"\S+")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids, cidx, ctext, ntok = [], [], [], []
        for did, t in zip(batch["doc_id"].astype(np.int64), batch["text"].fillna("")):
            toks = self.pat.findall(t)
            n = len(toks)
            for i, s in enumerate(range(0, n, self.stride)):
                piece = toks[s : s + self.ct]
                ids.append(did)
                cidx.append(i)
                ctext.append(" ".join(piece))
                ntok.append(len(piece))
        return pd.DataFrame(
            {
                "doc_id": np.asarray(ids, dtype=np.int64),
                "chunk_idx": np.asarray(cidx, dtype=np.int64),
                "chunk_text": ctext,
                "n_tokens": np.asarray(ntok, dtype=np.int64),
            }
        )


def chunk_documents(
    docs: rd.Dataset, chunk_tokens: int = 64, overlap: int = 16,
    concurrency: int | None = None,
) -> rd.Dataset:
    """Expansion-aware: one doc emits many chunk rows — smaller batches
    keep output blocks bounded at corpus scale."""
    if concurrency:
        return docs.map_batches(
            lambda df: ChunkDocuments(chunk_tokens, overlap)(df),
            batch_format="pandas", batch_size=1024,
            concurrency=concurrency, num_cpus=1,
        )
    return docs.map_batches(
        ChunkDocuments(chunk_tokens, overlap),
        batch_format="pandas", batch_size=1024,
    )

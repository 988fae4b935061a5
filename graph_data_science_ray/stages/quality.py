"""Rule-based document quality filters for training-data pipelines.

The C4 / Gopher-style heuristics pretraining pipelines apply before any
model-based scoring, re-expressed as vectorized ``map_batches`` stages
whose outputs are INTEGER columns only — every rule that is normally a
ratio test is written as an equivalent integer inequality, so the DuckDB
oracles compare exactly (the repo's integers-over-rounded-floats
convention, ROADMAP.md):

- :func:`c4_quality` — minimum word count, brace and boilerplate
  ("lorem ipsum") detection, line-terminal-punctuation counting, and a
  combined keep flag (C4: Raffel et al. 2020 §2.2's rule family; the
  keep rule here is the word-count + boilerplate subset so it stays
  discriminative on punctuation-free corpora, with the terminal-line
  count still reported as a signal column).
- :func:`token_repetition` — Gopher-style repetition signals (Rae et
  al. 2021, appendix A1.1) at the TOKEN level: distinct-token counts,
  the most-frequent-bigram count, and keep as two integer inequalities
  (type-token ratio >= 1/2 and top-bigram fraction <= 1/5).
- :func:`pii_scrub` — email detection/redaction counts with an
  RE2-compatible pattern (identical semantics in Python ``re`` and
  DuckDB ``regexp_extract_all``); fixture-tested (the synthetic corpus
  contains no PII, so it is not a driver query).

All three are pure map-side (no shuffle): each document's signals are
row-local.  At 100 TB these stages stream block-by-block and the only
output is one fixed-width row per document.

Reference scope note: the reference engine has no text-quality surface;
these extend the engine for LLM data curation per the build brief.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import ray.data as rd

__all__ = ["c4_quality", "token_repetition", "pii_scrub"]

_WORD = re.compile(r"\S+")
_TERMINAL = re.compile(r'[.!?"]$')
_EMAIL = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+")


class C4Quality:
    """Per-document C4-style signals (all integers).

    keep = (n_words >= min_words) AND (no '{') AND (no 'lorem ipsum').
    Lines are ``split('\\n')`` segments INCLUDING empties (DuckDB
    ``string_split`` has the same semantics); a terminal line ends in one
    of ``. ! ? "`` with no stripping (oracle-identical).
    """

    def __init__(self, min_words: int = 50):
        self.min_words = int(min_words)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch["text"].fillna("")
        n_words = texts.str.findall(_WORD).str.len().astype(np.int64)
        lines = texts.str.split("\n")
        n_lines = lines.str.len().astype(np.int64)
        n_terminal = pd.Series(
            [sum(1 for ln in ls if _TERMINAL.search(ln)) for ls in lines],
            index=batch.index, dtype=np.int64,
        )
        has_brace = texts.str.contains("{", regex=False).astype(np.int64)
        has_lorem = texts.str.lower().str.contains("lorem ipsum", regex=False).astype(
            np.int64
        )
        keep = (
            (n_words >= self.min_words) & (has_brace == 0) & (has_lorem == 0)
        ).astype(np.int64)
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype(np.int64),
                "n_words": n_words,
                "n_lines": n_lines,
                "n_terminal_lines": n_terminal,
                "has_brace": has_brace,
                "has_lorem": has_lorem,
                "keep": keep,
            }
        )


def c4_quality(
    docs: rd.Dataset, min_words: int = 50, batch_size: int = 8192
) -> rd.Dataset:
    return docs.map_batches(
        C4Quality(min_words), batch_format="pandas", batch_size=batch_size
    )


class TokenRepetition:
    """Gopher-style per-document repetition signals (all integers).

    Tokens are lowercased ``\\S+`` runs; bigrams are adjacent token pairs
    joined by one space.  Emits ``n_tokens``, ``n_distinct_tokens``,
    ``n_bigrams``, ``top_bigram_cnt`` (count of the most frequent bigram;
    ties need no break — only the count is emitted) and

    ``keep = (2*n_distinct_tokens >= n_tokens)            # type-token >= 1/2
             AND (5*top_bigram_cnt <= n_bigrams)``        # top-bigram <= 1/5

    Vectorized across the batch: one explode to the flat token stream,
    shifted elementwise concat for bigrams (the ``_NgramPartials``
    pattern), pandas groupbys for the multiplicities.
    """

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        doc_ids = batch["doc_id"].to_numpy(dtype=np.int64)
        tok_lists = [
            [w.lower() for w in _WORD.findall(t or "")]
            for t in batch["text"].fillna("")
        ]
        counts = np.fromiter(
            (len(t) for t in tok_lists), dtype=np.int64, count=len(tok_lists)
        )
        n = len(batch)
        out = {
            "doc_id": doc_ids,
            "n_tokens": counts,
            "n_distinct_tokens": np.zeros(n, dtype=np.int64),
            "n_bigrams": np.maximum(counts - 1, 0),
            "top_bigram_cnt": np.zeros(n, dtype=np.int64),
        }
        if counts.sum():
            flat = np.array([w for toks in tok_lists for w in toks], dtype=object)
            doc_of = np.repeat(np.arange(n, dtype=np.int64), counts)
            toks = pd.DataFrame({"d": doc_of, "t": flat})
            nd = toks.groupby("d", sort=False)["t"].nunique()
            out["n_distinct_tokens"][nd.index.to_numpy()] = nd.to_numpy()
            m = len(flat)
            if m >= 2:
                grams = flat[: m - 1] + " "
                grams = grams + flat[1:]
                same = doc_of[: m - 1] == doc_of[1:]
                bg = pd.DataFrame({"d": doc_of[: m - 1][same], "g": grams[same]})
                if len(bg):
                    top = (
                        bg.groupby(["d", "g"], sort=False)
                        .size()
                        .groupby(level=0)
                        .max()
                    )
                    out["top_bigram_cnt"][top.index.to_numpy()] = top.to_numpy()
        df = pd.DataFrame(out)
        df["keep"] = (
            (2 * df["n_distinct_tokens"] >= df["n_tokens"])
            & (5 * df["top_bigram_cnt"] <= df["n_bigrams"])
        ).astype(np.int64)
        return df


def token_repetition(docs: rd.Dataset, batch_size: int = 4096) -> rd.Dataset:
    return docs.map_batches(
        TokenRepetition(), batch_format="pandas", batch_size=batch_size
    )


class PiiScrub:
    """Email detection + redaction accounting (integers only).

    ``n_emails`` = non-overlapping matches of an RE2-compatible email
    pattern; ``redacted_chars`` = total matched length (the number of
    characters a redaction pass would replace); ``text`` (optional,
    ``emit_text=True``) = the text with each match replaced by
    ``[EMAIL]``.  The pattern avoids constructs where Python ``re`` and
    RE2 diverge (no backrefs, no lookaround), so DuckDB's
    ``regexp_extract_all`` reproduces the exact same match set.
    """

    def __init__(self, emit_text: bool = False):
        self.pat = _EMAIL
        self.emit_text = bool(emit_text)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"].fillna("")
        matches = text.str.findall(self.pat)
        n = matches.str.len().astype(np.int64)
        chars = pd.Series(
            [sum(len(m) for m in ms) for ms in matches],
            index=batch.index, dtype=np.int64,
        )
        out = pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype(np.int64),
                "n_emails": n,
                "redacted_chars": chars,
            }
        )
        if self.emit_text:
            out["text"] = text.str.replace(self.pat, "[EMAIL]", regex=True)
        return out


def pii_scrub(
    docs: rd.Dataset, emit_text: bool = False, batch_size: int = 8192
) -> rd.Dataset:
    return docs.map_batches(
        PiiScrub(emit_text), batch_format="pandas", batch_size=batch_size
    )


def readability(docs: rd.Dataset, batch_size: int = 4096) -> rd.Dataset:
    """Flesch-style readability accounting, shuffle-free.

    Per document: ``(doc_id, n_words, n_sentences, n_syllables)`` with
    words = ``[A-Za-z]+`` runs, sentences = non-blank ``[.!?]``-separated
    segments (min 1 when any word exists), and syllables = per-word
    ``[aeiouy]+`` group count clamped to at least 1 (the standard
    heuristic).  All three are exact integers, so the reading-ease float

        206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)

    is derivable downstream without the engine committing to a float
    reduction order.  Row-local ``map_batches`` — a pure scan stage.
    """
    word_re = re.compile(r"[A-Za-z]+")
    syl_re = re.compile(r"[aeiouy]+")
    sent_re = re.compile(r"[^.!?]+")

    def per_batch(df: pd.DataFrame) -> pd.DataFrame:
        texts = df["text"].fillna("").astype(str).reset_index(drop=True)
        words = texts.str.findall(word_re)
        n_words = words.str.len().to_numpy(dtype=np.int64)
        ex = words.explode().dropna()
        syl = ex.str.lower().str.count(syl_re).clip(lower=1)
        n_syll = np.zeros(len(df), dtype=np.int64)
        if len(syl):
            agg = syl.groupby(level=0).sum()
            n_syll[agg.index.to_numpy(dtype=np.int64)] = agg.to_numpy(
                dtype=np.int64
            )
        segs = texts.str.findall(sent_re).explode().dropna()
        n_sents = np.zeros(len(df), dtype=np.int64)
        if len(segs):
            hit = segs.str.contains(word_re).astype(np.int64)
            agg = hit.groupby(level=0).sum()
            n_sents[agg.index.to_numpy(dtype=np.int64)] = agg.to_numpy(
                dtype=np.int64
            )
        n_sents = np.where(n_words > 0, np.maximum(n_sents, 1), 0)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(dtype=np.int64),
                "n_words": n_words,
                "n_sentences": n_sents,
                "n_syllables": n_syll,
            }
        )

    return docs.map_batches(
        per_batch, batch_format="pandas", batch_size=batch_size
    )


def blocklist_flags(
    docs: rd.Dataset,
    blocklist: tuple = ("slow", "dup", "stale"),
    text_col: str = "text",
    batch_size: int = 4096,
) -> rd.Dataset:
    """Token-blocklist filter: ``(doc_id, hits, blocked)``.

    The C4 "bad words" rule shape (Raffel et al. 2020 drop any page
    containing a blocklisted word): ``hits`` counts blocklisted tokens
    over the repo-wide lowercased ``\\S+`` token stream (whole-token
    match, not substring), ``blocked = hits > 0``.  Row-local and
    vectorized; the list is a task-captured constant (broadcast once)."""
    import re

    word = re.compile(r"\S+")
    bset = {b.lower() for b in blocklist}

    def per_batch(df: pd.DataFrame) -> pd.DataFrame:
        hits = np.array(
            [
                sum(1 for w in word.findall(t) if w.lower() in bset)
                for t in df[text_col].fillna("")
            ],
            dtype=np.int64,
        )
        return pd.DataFrame(
            {"doc_id": df["doc_id"].astype(np.int64), "hits": hits,
             "blocked": (hits > 0).astype(np.int64)}
        )

    return docs.map_batches(per_batch, batch_format="pandas",
                            batch_size=batch_size)

"""Information-retrieval stages over the document table.

Corpus-statistics operators a training-data pipeline uses for relevance
filtering, vocabulary pruning and LM-based quality scoring — each with an
exact ANSI-SQL oracle (DuckDB) in ``__ray_entry__``:

- :func:`doc_terms` — the exploded ``(doc_id, term, tf)`` table.  Terms
  are lowercased ``\\S+`` tokens (the repo-wide tokenizer the SQL oracles
  mirror with ``regexp_extract_all``).  Term frequency is row-local (one
  document lives in one row), so this is a pure ``map_batches`` — the
  token stream never shuffles.
- :func:`doc_freq` — ``(term, df)`` document frequencies: map-side
  per-batch distinct + ``hash_aggregate`` sum, vocabulary-sized output.
- :func:`tf_idf_topk` — per-document top-``k`` terms by ``tf·ln(N/df)``.
  Two strategies: ``broadcast`` ships the vocabulary-sized df table once
  via ``ray.put`` and finishes each document inside one map task (zero
  extra shuffle); ``join`` hash-joins ``doc_terms`` with ``doc_freq`` on
  term and finishes with a per-doc top-k combine — the scale path when
  the vocabulary exceeds worker memory.  ``auto`` picks by vocabulary
  row count.
- :func:`bm25_topk` — global top-``n`` documents for a fixed query under
  BM25 (Robertson/Spärck Jones; k1/b defaults 1.2/0.75).  Query-term df
  and the corpus avgdl are two tiny aggregates; scoring is one
  vectorized map pass; per-term partials are added in EXPLICIT fixed
  term order so the float result is IEEE-identical to the SQL oracle.
- :func:`unigram_nll` — unigram-LM negative log-likelihood per document
  (the "perplexity filter" of LLM data pipelines), in INTEGER
  micro-nats: per-term ``ln`` values are floored to ppm BEFORE the
  per-document sum, so every downstream sum is an integer sum — exact at
  any parallelism and in any aggregation order (the repo's
  integers-over-rounded-floats oracle convention, ROADMAP.md).

Reference scope note: the reference engine (Neo4j GDS) has no IR
surface; these stages extend the engine for LLM training-data work per
the build brief, composing the shapes of ``stages/text.py`` and
``pipelines/agg.py``.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from graph_data_science_ray.pipelines.agg import _stable_row_hash, hash_aggregate

__all__ = [
    "doc_terms",
    "doc_freq",
    "tf_idf_topk",
    "bm25_topk",
    "unigram_nll",
    "bigram_nll",
    "doc_bigrams",
    "term_counts_topk",
    "hashed_features",
    "corpus_profile",
]

_TOKEN = re.compile(r"\S+")


def _batch_doc_terms(batch: pd.DataFrame) -> pd.DataFrame:
    """Row-local (doc_id, term, tf) for one batch — vectorized explode +
    one pandas groupby over the batch's flat token stream."""
    empty = pd.DataFrame(
        {
            "doc_id": pd.Series([], dtype=np.int64),
            "term": pd.Series([], dtype=object),
            "tf": pd.Series([], dtype=np.int64),
        }
    )
    if not len(batch):
        return empty
    tok_lists = [
        [w.lower() for w in _TOKEN.findall(t or "")]
        for t in batch["text"].fillna("")
    ]
    counts = np.fromiter((len(t) for t in tok_lists), dtype=np.int64, count=len(tok_lists))
    if counts.sum() == 0:
        return empty
    flat = np.array([w for toks in tok_lists for w in toks], dtype=object)
    doc_of = np.repeat(batch["doc_id"].to_numpy(dtype=np.int64), counts)
    g = (
        pd.DataFrame({"doc_id": doc_of, "term": flat})
        .groupby(["doc_id", "term"], sort=False)
        .size()
        .reset_index(name="tf")
    )
    g["tf"] = g["tf"].astype(np.int64)
    return g


def doc_terms(docs: rd.Dataset, batch_size: int = 4096) -> rd.Dataset:
    """(doc_id, term, tf) rows; terms are lowercased ``\\S+`` tokens."""
    return docs.map_batches(
        _batch_doc_terms, batch_format="pandas", batch_size=batch_size
    )


def doc_freq(docs: rd.Dataset, num_parts: int = 64) -> rd.Dataset:
    """(term, df) document frequencies — vocabulary-sized.

    ``doc_terms`` already emits one row per (doc, term), so df is a plain
    count: map each row to (term, 1) and hash-sum.
    """

    def ones(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"term": df["term"], "df": np.ones(len(df), dtype=np.int64)}
        )

    return hash_aggregate(
        doc_terms(docs).map_batches(ones, batch_format="pandas"),
        ["term"], "df", op="sum", num_parts=num_parts,
    )


_BROADCAST_VOCAB_CUTOFF = 2_000_000  # df rows; ~100 MB of term strings


def tf_idf_topk(
    docs: rd.Dataset,
    k: int = 3,
    strategy: str = "auto",
    num_parts: int = 64,
) -> rd.Dataset:
    """Per-document top-``k`` terms by tf-idf.

    Returns (doc_id, term, tf, df) — integer/string columns only (the
    score ``tf * ln(N/df)`` orders the cut but is not emitted, so the
    oracle compare stays float-free).  Ties break (score desc, term asc).

    ``strategy="broadcast"``: the (term, df) table is ``ray.put`` once
    and every map task finishes its documents locally — right while the
    vocabulary fits a worker (default below ~2M distinct terms).
    ``strategy="join"``: hash-join doc_terms with doc_freq on term, then
    a per-doc top-k combine (two shuffles, nothing vocabulary-sized in
    any single place) — the 100-TB path.
    """
    n_docs = float(docs.count())
    dfreq = doc_freq(docs, num_parts=num_parts).materialize()
    if strategy == "auto":
        strategy = "broadcast" if dfreq.count() <= _BROADCAST_VOCAB_CUTOFF else "join"

    if strategy == "broadcast":
        dfp = dfreq.to_pandas()
        terms_sorted = np.sort(dfp["term"].to_numpy(dtype=object).astype("U"))
        order = np.argsort(dfp["term"].to_numpy(dtype=object).astype("U"), kind="mergesort")
        df_sorted = dfp["df"].to_numpy(dtype=np.int64)[
            np.argsort(dfp["term"].astype(str).to_numpy(), kind="mergesort")
        ]
        del order
        vocab_ref = ray.put((terms_sorted, df_sorted))

        def topk_local(batch: pd.DataFrame, *, nd=n_docs, kk=int(k)) -> pd.DataFrame:
            g = _batch_doc_terms(batch)
            if not len(g):
                return pd.DataFrame(
                    {
                        "doc_id": pd.Series([], dtype=np.int64),
                        "term": pd.Series([], dtype=object),
                        "tf": pd.Series([], dtype=np.int64),
                        "df": pd.Series([], dtype=np.int64),
                    }
                )
            terms_s, df_s = ray.get(vocab_ref)
            pos = np.searchsorted(terms_s, g["term"].astype(str).to_numpy())
            g = g.copy()
            g["df"] = df_s[pos]
            # score ordered exactly as the SQL oracle: tf * ln(N / df)
            score = g["tf"].to_numpy(dtype=np.float64) * np.log(
                nd / g["df"].to_numpy(dtype=np.float64)
            )
            g["__s"] = score
            out = (
                g.sort_values(["doc_id", "__s", "term"], ascending=[True, False, True],
                              kind="mergesort")
                .groupby("doc_id", sort=False)
                .head(kk)
                .drop(columns="__s")
            )
            return out

        return docs.map_batches(topk_local, batch_format="pandas", batch_size=4096)

    # join path: (doc_id, term, tf) ⋈ (term, df), then per-doc top-k
    import pyarrow as pa

    from graph_data_science_ray.pipelines.agg import hash_join

    joined = hash_join(
        doc_terms(docs), dfreq, on=["term"],
        left_schema=pa.schema(
            [("doc_id", pa.int64()), ("term", pa.string()), ("tf", pa.int64())]
        ),
        right_schema=pa.schema([("term", pa.string()), ("df", pa.int64())]),
        num_parts=num_parts,
    )

    def tag(df: pd.DataFrame, *, nd=n_docs) -> pd.DataFrame:
        df = df.copy()
        df["__s"] = df["tf"].to_numpy(dtype=np.float64) * np.log(
            nd / df["df"].to_numpy(dtype=np.float64)
        )
        df["__part"] = (_stable_row_hash(df, ["doc_id"]) % num_parts).astype(np.int64)
        # map-side partial top-k bounds the shuffle at k rows per doc per block
        return (
            df.sort_values(["doc_id", "__s", "term"], ascending=[True, False, True],
                           kind="mergesort")
            .groupby("doc_id", sort=False)
            .head(int(k))
        )

    def combine(g: pd.DataFrame, *, kk=int(k)) -> pd.DataFrame:
        return (
            g.sort_values(["doc_id", "__s", "term"], ascending=[True, False, True],
                          kind="mergesort")
            .groupby("doc_id", sort=False)
            .head(kk)
            .drop(columns=["__s", "__part"])
        )

    return (
        joined.map_batches(tag, batch_format="pandas")
        .groupby("__part")
        .map_groups(combine, batch_format="pandas")
    )


def bm25_topk(
    docs: rd.Dataset,
    query_terms: list[str],
    n: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> rd.Dataset:
    """Global top-``n`` documents for ``query_terms`` under BM25.

    Returns (doc_id, score) sorted (score desc, doc_id asc) — the classic
    ``idf(t) * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))`` with
    ``idf = ln(1 + (N-df+0.5)/(df+0.5))``.  Per-term contributions are
    added in the CALLER'S term order with explicit binary additions, and
    the emitted ``score_ppm`` is ``floor(score * 1e6)`` — the SQL oracle
    (same expression, same order) agrees to the last ulp on selection
    and the integer ppm absorbs the residual 1-ulp engine/DuckDB drift
    observed in ``ln`` (the repo's integers-over-floats convention).

    Corpus stats (N, avgdl, per-query-term df) are three tiny aggregates;
    scoring is one map pass over the documents — no shuffle at all beyond
    the final ``sort().limit(n)`` on an n-bounded prefilter (docs scoring
    0 — no query term present — are dropped map-side).
    """
    qts = [str(t).lower() for t in query_terms]
    n_docs = float(docs.count())

    # dl per doc never materializes: avgdl = total_tokens / N via one sum
    def tok_partial(batch: pd.DataFrame) -> pd.DataFrame:
        t = batch["text"].fillna("")
        return pd.DataFrame(
            {"c": t.str.findall(_TOKEN).str.len().astype(np.int64)}
        )

    total_tokens = float(
        docs.map_batches(tok_partial, batch_format="pandas").sum("c") or 0.0
    )
    avgdl = total_tokens / n_docs

    # df for the query terms only: filter the per-doc distinct term rows
    def q_df_partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = _batch_doc_terms(batch)
        g = g[g["term"].isin(qts)]
        return pd.DataFrame(
            {"term": g["term"], "df": np.ones(len(g), dtype=np.int64)}
        )

    dfp = hash_aggregate(
        docs.map_batches(q_df_partial, batch_format="pandas"),
        ["term"], "df", op="sum", num_parts=8,
    ).to_pandas()
    df_of = {t: 0 for t in qts}
    for t, d in zip(dfp.get("term", []), dfp.get("df", [])):
        df_of[str(t)] = int(d)
    idf = {
        t: float(np.log(1.0 + (n_docs - df_of[t] + 0.5) / (df_of[t] + 0.5)))
        for t in qts
    }

    def score(batch: pd.DataFrame, *, K1=float(k1), B=float(b)) -> pd.DataFrame:
        texts = batch["text"].fillna("")
        toks = [[w.lower() for w in _TOKEN.findall(t)] for t in texts]
        dl = np.fromiter((len(t) for t in toks), dtype=np.float64, count=len(toks))
        s = np.zeros(len(batch), dtype=np.float64)
        denom_norm = K1 * (1.0 - B + B * dl / avgdl)
        for t in qts:  # explicit fixed-order additions (oracle-identical)
            tf = np.fromiter(
                (row.count(t) for row in toks), dtype=np.float64, count=len(toks)
            )
            s = s + idf[t] * (tf * (K1 + 1.0)) / (tf + denom_norm)
        out = pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype(np.int64),
                "score_ppm": np.floor(s * 1e6).astype(np.int64),
            }
        )
        return out[out["score_ppm"] > 0]

    return (
        docs.map_batches(score, batch_format="pandas", batch_size=4096)
        .sort(["score_ppm", "doc_id"], descending=[True, False])
        .limit(int(n))
    )


def unigram_nll(docs: rd.Dataset, num_parts: int = 64) -> rd.Dataset:
    """Unigram-LM negative log-likelihood per document, in micro-nats.

    Returns (doc_id, n_tokens, nll_ppm) where
    ``nll_ppm = n_tokens * floor(ln(T)*1e6) - Σ_t tf_t * floor(ln(C_t)*1e6)``
    over the document's terms — the distributed "perplexity filter".
    Flooring each ``ln`` to an integer ppm BEFORE any sum makes every
    aggregate an exact integer sum (order-independent, parallelism-
    independent, and reproducible bit-for-bit by the SQL oracle).

    Fully join-based: term counts (vocabulary-sized) hash-join back to
    the (doc, term, tf) rows; nothing vocabulary- or corpus-sized ever
    sits on the driver.  Documents with no tokens emit (doc_id, 0, 0).
    """
    import pyarrow as pa

    from graph_data_science_ray.pipelines.agg import hash_join

    terms = doc_terms(docs).materialize()

    def cnt_partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"term": df["term"], "c": df["tf"].astype(np.int64)})

    counts = hash_aggregate(
        terms.map_batches(cnt_partial, batch_format="pandas"),
        ["term"], "c", op="sum", num_parts=num_parts,
    ).materialize()
    total = int(counts.sum("c") or 0)
    if total == 0:
        return docs.map_batches(
            lambda df: pd.DataFrame(
                {
                    "doc_id": df["doc_id"].astype(np.int64),
                    "n_tokens": np.zeros(len(df), dtype=np.int64),
                    "nll_ppm": np.zeros(len(df), dtype=np.int64),
                }
            ),
            batch_format="pandas",
        )
    lnt_ppm = int(np.floor(np.log(float(total)) * 1e6))

    def ln_ppm(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "term": df["term"],
                "lnc_ppm": np.floor(
                    np.log(df["c"].to_numpy(dtype=np.float64)) * 1e6
                ).astype(np.int64),
            }
        )

    lnc = counts.map_batches(ln_ppm, batch_format="pandas")
    joined = hash_join(
        terms, lnc, on=["term"],
        left_schema=pa.schema(
            [("doc_id", pa.int64()), ("term", pa.string()), ("tf", pa.int64())]
        ),
        right_schema=pa.schema([("term", pa.string()), ("lnc_ppm", pa.int64())]),
        num_parts=num_parts,
    )

    def per_doc_partial(df: pd.DataFrame) -> pd.DataFrame:
        tf = df["tf"].to_numpy(dtype=np.int64)
        g = pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype(np.int64),
                "n_tokens": tf,
                "s": tf * df["lnc_ppm"].to_numpy(dtype=np.int64),
            }
        )
        out = g.groupby("doc_id", sort=False).sum().reset_index()
        out["__part"] = (out["doc_id"].to_numpy() % num_parts).astype(np.int64)
        return out

    def per_doc_combine(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.drop(columns="__part").groupby("doc_id", sort=False).sum().reset_index()
        )
        return pd.DataFrame(
            {
                "doc_id": out["doc_id"].astype(np.int64),
                "n_tokens": out["n_tokens"].astype(np.int64),
                "nll_ppm": (
                    out["n_tokens"].to_numpy(dtype=np.int64) * lnt_ppm
                    - out["s"].to_numpy(dtype=np.int64)
                ),
            }
        )

    scored = (
        joined.map_batches(per_doc_partial, batch_format="pandas")
        .groupby("__part")
        .map_groups(per_doc_combine, batch_format="pandas")
    )

    # left-complete: docs with zero tokens still get a row
    def zero_side(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype(np.int64),
                "n_tokens": np.zeros(len(df), dtype=np.int64),
                "nll_ppm": np.zeros(len(df), dtype=np.int64),
                "__kind": np.zeros(len(df), dtype=np.int64),
            }
        )

    def scored_side(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__kind"] = np.ones(len(df), dtype=np.int64)
        return df

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "__kind"], kind="mergesort")
        out = g.groupby("doc_id", sort=False).tail(1)
        return out.drop(columns=["__kind", "__part2"])

    def tag2(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__part2"] = (df["doc_id"].to_numpy(dtype=np.int64) % num_parts).astype(
            np.int64
        )
        return df

    base = docs.select_columns(["doc_id"]).map_batches(
        zero_side, batch_format="pandas"
    )
    return (
        base.union(scored.map_batches(scored_side, batch_format="pandas"))
        .map_batches(tag2, batch_format="pandas")
        .groupby("__part2")
        .map_groups(pick, batch_format="pandas")
    )


def doc_bigrams(docs: rd.Dataset, batch_size: int = 4096) -> rd.Dataset:
    """(doc_id, w1, bg, tf) rows: lowercased ``\\S+`` token bigrams with
    their prefix token, counted per document. Built by one shifted
    elementwise concat over the batch's flat token stream (the
    ``_explode_shingles`` trick at window 2) — no per-bigram Python
    loop. Documents with fewer than 2 tokens emit nothing."""
    import re

    word = re.compile(r"\S+")
    empty = pd.DataFrame(
        {"doc_id": pd.Series([], dtype=np.int64),
         "w1": pd.Series([], dtype=object),
         "bg": pd.Series([], dtype=object),
         "tf": pd.Series([], dtype=np.int64)}
    )

    def per_batch(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return empty
        ids = df["doc_id"].to_numpy(dtype=np.int64)
        tok_lists = [
            [t.lower() for t in word.findall(x)]
            for x in df["text"].fillna("")
        ]
        counts = np.fromiter(
            (len(t) for t in tok_lists), dtype=np.int64, count=len(tok_lists)
        )
        flat = np.array(
            [w for toks in tok_lists for w in toks], dtype=object
        )
        n = len(flat)
        if n < 2:
            return empty
        doc_of = np.repeat(np.arange(len(tok_lists)), counts)
        same = doc_of[: n - 1] == doc_of[1:]
        if not same.any():
            return empty
        w1 = flat[: n - 1][same]
        bg = (flat[: n - 1] + " " + flat[1:])[same]
        out = pd.DataFrame(
            {"doc_id": ids[doc_of[: n - 1][same]], "w1": w1, "bg": bg}
        )
        tf = (
            out.groupby(["doc_id", "w1", "bg"], sort=False)
            .size()
            .reset_index(name="tf")
        )
        tf["tf"] = tf["tf"].astype(np.int64)
        return tf

    return docs.map_batches(
        per_batch, batch_format="pandas", batch_size=batch_size
    )


def bigram_nll(docs: rd.Dataset, num_parts: int = 64) -> rd.Dataset:
    """Bigram-LM negative log-likelihood per document, in micro-nats.

    Corpus MLE conditional model: ``P(w2|w1) = C(w1 w2) / C(w1 ·)``
    where ``C(w1 ·)`` counts ``w1`` as a bigram prefix. Every document's
    bigrams contribute to the corpus counts, so no probability is zero
    and no smoothing is needed. Returns ``(doc_id, n_bigrams, nll_ppm)``
    with ``nll_ppm = Σ_b tf_b * (floor(ln C_prefix * 1e6) -
    floor(ln C_bigram * 1e6))`` — each ``ln`` floored to integer ppm
    BEFORE any sum (the repo's order-independent integer discipline,
    same as :func:`unigram_nll`). Documents with fewer than 2 tokens
    emit ``(doc_id, 0, 0)``.

    Fully join-based: bigram and prefix count tables (vocabulary-sized)
    hash-join back to the (doc, w1, bg, tf) rows; nothing corpus-sized
    touches the driver.
    """
    import pyarrow as pa

    from graph_data_science_ray.pipelines.agg import hash_join

    rows = doc_bigrams(docs).materialize()

    cbg = hash_aggregate(
        rows.map_batches(
            lambda df: pd.DataFrame(
                {"bg": df["bg"], "c": df["tf"].astype(np.int64)}
            ),
            batch_format="pandas",
        ),
        ["bg"], "c", op="sum", num_parts=num_parts,
    )
    cpre = hash_aggregate(
        rows.map_batches(
            lambda df: pd.DataFrame(
                {"w1": df["w1"], "c": df["tf"].astype(np.int64)}
            ),
            batch_format="pandas",
        ),
        ["w1"], "c", op="sum", num_parts=num_parts,
    )

    def ln_ppm(col_in: str, col_out: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {col_in: df[col_in],
                 col_out: np.floor(
                     np.log(df["c"].to_numpy(dtype=np.float64)) * 1e6
                 ).astype(np.int64)}
            )
        return fn

    lnb = cbg.map_batches(ln_ppm("bg", "lnb_ppm"), batch_format="pandas")
    lnp = cpre.map_batches(ln_ppm("w1", "lnp_ppm"), batch_format="pandas")

    j = hash_join(
        rows, lnb, on=["bg"], num_parts=num_parts,
        left_schema=pa.schema(
            [("doc_id", pa.int64()), ("w1", pa.string()),
             ("bg", pa.string()), ("tf", pa.int64())]
        ),
        right_schema=pa.schema([("bg", pa.string()), ("lnb_ppm", pa.int64())]),
    )
    j = hash_join(
        j, lnp, on=["w1"], num_parts=num_parts,
        left_schema=pa.schema(
            [("doc_id", pa.int64()), ("w1", pa.string()),
             ("bg", pa.string()), ("tf", pa.int64()),
             ("lnb_ppm", pa.int64())]
        ),
        right_schema=pa.schema([("w1", pa.string()), ("lnp_ppm", pa.int64())]),
    )

    def per_doc_partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {"doc_id": pd.Series([], dtype=np.int64),
                 "n_bigrams": pd.Series([], dtype=np.int64),
                 "nll_ppm": pd.Series([], dtype=np.int64)}
            )
        tf = df["tf"].to_numpy(dtype=np.int64)
        g = pd.DataFrame(
            {"doc_id": df["doc_id"].astype(np.int64),
             "n_bigrams": tf,
             "nll_ppm": tf * (
                 df["lnp_ppm"].to_numpy(dtype=np.int64)
                 - df["lnb_ppm"].to_numpy(dtype=np.int64)
             )}
        )
        return g.groupby("doc_id", sort=False).sum().reset_index()

    scored = hash_aggregate(
        j.map_batches(per_doc_partial, batch_format="pandas")
        .map_batches(
            lambda df: df.melt(
                id_vars=["doc_id"], var_name="k", value_name="v"
            ),
            batch_format="pandas",
        ),
        ["doc_id", "k"], "v", op="sum", num_parts=num_parts,
    )

    def unmelt(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {"doc_id": pd.Series([], dtype=np.int64),
                 "k": pd.Series([], dtype=object),
                 "v": pd.Series([], dtype=np.int64)}
            )
        return df

    # zero-fill: every doc id appears, docs with <2 tokens get (0, 0)
    zeros = docs.map_batches(
        lambda df: pd.DataFrame(
            {"doc_id": df["doc_id"].astype(np.int64),
             "k": pd.Series(["n_bigrams"] * len(df), dtype=object),
             "v": np.zeros(len(df), dtype=np.int64)}
        ),
        batch_format="pandas",
    )
    zeros2 = docs.map_batches(
        lambda df: pd.DataFrame(
            {"doc_id": df["doc_id"].astype(np.int64),
             "k": pd.Series(["nll_ppm"] * len(df), dtype=object),
             "v": np.zeros(len(df), dtype=np.int64)}
        ),
        batch_format="pandas",
    )
    full = hash_aggregate(
        scored.map_batches(unmelt, batch_format="pandas")
        .union(zeros).union(zeros2),
        ["doc_id", "k"], "v", op="sum", num_parts=num_parts,
    )

    def pivot(g: pd.DataFrame) -> pd.DataFrame:
        w = g.pivot_table(
            index="doc_id", columns="k", values="v", aggfunc="sum",
            fill_value=0,
        ).reset_index()
        return pd.DataFrame(
            {"doc_id": w["doc_id"].astype(np.int64),
             "n_bigrams": w.get(
                 "n_bigrams", pd.Series(0, index=w.index)
             ).astype(np.int64),
             "nll_ppm": w.get(
                 "nll_ppm", pd.Series(0, index=w.index)
             ).astype(np.int64)}
        )

    def tag_doc(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__doc_part"] = (
            df["doc_id"].to_numpy(dtype=np.int64) % num_parts
        ).astype(np.int64)
        return df

    return (
        full.map_batches(tag_doc, batch_format="pandas")
        .groupby("__doc_part")
        .map_groups(
            lambda g: pivot(g.drop(columns="__doc_part")),
            batch_format="pandas",
        )
    )


def term_counts_topk(
    docs: rd.Dataset, k: int = 50, num_parts: int = 64
) -> pd.DataFrame:
    """EXACT corpus-wide top-``k`` term frequencies, ``(term, tf)``
    ordered by ``(tf DESC, term ASC)``.

    The exact complement of the Count-Min heavy hitters
    (:func:`stages.sketch.cms_heavy_hitters`): where CMS trades exactness
    for a 16 KiB summary, this pays one vocabulary-sized shuffle for
    verbatim counts. Scale shape:

    - map-side partial counts — each batch's token stream collapses to
      its batch vocabulary BEFORE the shuffle (the combiner), so the
      exchange is O(batch_vocab), not O(tokens);
    - hash-partition by term, per-partition final sums;
    - per-partition LOCAL top-k — after the hash aggregate every term's
      total lives in exactly one partition, so a partition's top-k is
      globally sound and the driver merges only ``num_parts * k``
      candidate rows (answer-sized, never the vocabulary).
    """

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"term": pd.Series([], dtype=object),
             "tf": pd.Series([], dtype=np.int64)}
        )
        if not len(batch):
            return empty
        toks = [
            w.lower()
            for t in batch["text"].fillna("")
            for w in _TOKEN.findall(t or "")
        ]
        if not toks:
            return empty
        g = (
            pd.DataFrame({"term": np.array(toks, dtype=object)})
            .groupby("term", sort=False)
            .size()
            .reset_index(name="tf")
        )
        g["tf"] = g["tf"].astype(np.int64)
        return g

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__part"] = (_stable_row_hash(df, ["term"]) % num_parts).astype(
            np.int64
        )
        return df

    def combine_topk(g: pd.DataFrame, *, kk=int(k)) -> pd.DataFrame:
        agg = (
            g.groupby("term", sort=False)["tf"].sum().reset_index()
        )
        agg["tf"] = agg["tf"].astype(np.int64)
        # local top-k is globally sound: this partition owns every
        # occurrence of its terms
        agg = agg.sort_values(
            ["tf", "term"], ascending=[False, True], kind="mergesort"
        ).head(kk)
        return agg[["term", "tf"]]

    cands = (
        docs.map_batches(partial, batch_format="pandas", batch_size=4096)
        .map_batches(tag, batch_format="pandas")
        .groupby("__part")
        .map_groups(
            lambda g: combine_topk(g.drop(columns="__part")),
            batch_format="pandas",
        )
        .to_pandas()
    )
    out = (
        cands.sort_values(["tf", "term"], ascending=[False, True], kind="mergesort")
        .head(int(k))
        .reset_index(drop=True)
    )
    out["tf"] = out["tf"].astype(np.int64)
    return out


def hashed_features(
    docs: rd.Dataset, dim: int = 64, num_parts: int = 64
) -> rd.Dataset:
    """Feature hashing (Weinberger et al. 2009, "Feature Hashing for
    Large Scale Multitask Learning"): each document's token counts fold
    into a FIXED ``dim``-bucket integer vector via ``md5(token) % dim``
    — the vocabulary-free featurizer a 100-TB pipeline feeds to kmeans
    / knn / linear models without ever shuffling a vocabulary.

    Returns sparse long-format ``(doc_id, bucket, cnt)`` rows (dense
    layout is a trivial pivot; long format keeps the driver compare and
    downstream joins schema-stable). Row-local — tokens hash and
    collapse inside each batch, one doc-hash shuffle combines rows of
    re-batched docs; md5 keeps the buckets bit-exactly reproducible in
    ANSI SQL.
    """
    import hashlib

    def partial(batch: pd.DataFrame, *, d=int(dim)) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"doc_id": pd.Series([], dtype=np.int64),
             "bucket": pd.Series([], dtype=np.int64),
             "cnt": pd.Series([], dtype=np.int64)}
        )
        if not len(batch):
            return empty
        tok_lists = [
            [w.lower() for w in _TOKEN.findall(t or "")]
            for t in batch["text"].fillna("")
        ]
        counts = np.fromiter(
            (len(t) for t in tok_lists), dtype=np.int64, count=len(tok_lists)
        )
        if counts.sum() == 0:
            return empty
        flat = [w for toks in tok_lists for w in toks]
        buckets = np.fromiter(
            (
                int(hashlib.md5(w.encode("utf-8")).hexdigest()[:8], 16) % d
                for w in flat
            ),
            dtype=np.int64,
            count=len(flat),
        )
        doc_of = np.repeat(batch["doc_id"].to_numpy(dtype=np.int64), counts)
        g = (
            pd.DataFrame({"doc_id": doc_of, "bucket": buckets})
            .groupby(["doc_id", "bucket"], sort=False)
            .size()
            .reset_index(name="cnt")
        )
        g["cnt"] = g["cnt"].astype(np.int64)
        return g

    return hash_aggregate(
        docs.map_batches(partial, batch_format="pandas", batch_size=4096),
        ["doc_id", "bucket"], "cnt", op="sum", num_parts=num_parts,
    )


def corpus_profile(docs: rd.Dataset, num_parts: int = 64) -> pd.DataFrame:
    """One-pass corpus profile — the summary table a curation run
    prints before any filtering decision: ``(metric, value)`` integer
    rows for document count, token count, exact vocabulary size, max
    term frequency, and exact length percentiles (p50/p90 of
    ``n_chars`` under DuckDB quantile_disc rank semantics).

    Composition of the repo's own scale shapes: token stats ride the
    map-side partial-count + term-hash aggregate of :func:`doc_terms`
    (vocab size and max tf are per-partition-sound after the hash
    aggregate, so only num_parts scalars reach the driver); length
    percentiles ride ``stages.window.rank_select`` (one sort,
    O(#blocks) counts, two value reads). Everything integer — the
    driver oracle is a UNION of five exact SQL aggregates."""
    from graph_data_science_ray.stages.window import quantiles_disc

    n_docs = docs.count()

    def tf_partial(df: pd.DataFrame) -> pd.DataFrame:
        return _batch_doc_terms(df)

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__part"] = (_stable_row_hash(df, ["term"]) % num_parts).astype(
            np.int64
        )
        return df

    def part_stats(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("term", sort=False)["tf"].sum()
        return pd.DataFrame(
            {"n_terms": np.array([len(agg)], dtype=np.int64),
             "n_tokens": np.array([int(agg.sum())], dtype=np.int64),
             "max_tf": np.array(
                 [int(agg.max()) if len(agg) else 0], dtype=np.int64)}
        )

    stats = (
        docs.map_batches(tf_partial, batch_format="pandas", batch_size=4096)
        .map_batches(tag, batch_format="pandas")
        .groupby("__part")
        .map_groups(
            lambda g: part_stats(g.drop(columns="__part")),
            batch_format="pandas",
        )
        .to_pandas()
    )
    qs = quantiles_disc(docs.select_columns(["n_chars"]), "n_chars", [0.5, 0.9])
    vals = dict(zip(qs["q"], qs["value"]))
    return pd.DataFrame(
        {
            "metric": ["len_p50", "len_p90", "max_tf", "n_docs",
                       "n_tokens", "vocab_size"],
            "value": np.array(
                [int(vals[0.5]), int(vals[0.9]),
                 int(stats["max_tf"].max()) if len(stats) else 0,
                 int(n_docs),
                 int(stats["n_tokens"].sum()),
                 int(stats["n_terms"].sum())],
                dtype=np.int64,
            ),
        }
    )


def token_entropy(docs: rd.Dataset, batch_size: int = 4096) -> rd.Dataset:
    """Per-document token-distribution entropy in integer micro-nats.

    The repetitiveness quality signal (a low-entropy document repeats a
    few tokens): ``H(doc) = ln(n) - (1/n) * Σ_w c_w ln(c_w)`` over the
    document's own term counts — the self-information complement of the
    corpus-model :func:`unigram_nll`.

    Integer discipline (hash-exact across parallelism and in SQL):
    every ``ln`` floors to integer ppm BEFORE any sum, so
    ``ent_ppm = (n * floor(ln n * 1e6) - Σ_w c_w * floor(ln c_w * 1e6)) // n``.
    The numerator is non-negative (floor∘ln is monotone and c_w <= n), so
    numpy floor-division and DuckDB's truncating ``//`` agree.

    Entirely row-local — the term counts are within-document — so this
    is one shuffle-free ``map_batches`` stage; at 100 TB it pipelines
    with the read and never exchanges a byte.
    """

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype=np.int64),
                    "n_tokens": pd.Series([], dtype=np.int64),
                    "ent_ppm": pd.Series([], dtype=np.int64),
                }
            )
        doc_ids = batch["doc_id"].to_numpy(dtype=np.int64)
        n_out = np.zeros(len(batch), dtype=np.int64)
        ent = np.zeros(len(batch), dtype=np.int64)
        tf = _batch_doc_terms(batch)  # vectorized explode + one groupby
        if len(tf):
            c = tf["tf"].to_numpy(dtype=np.int64)
            term_ppm = c * np.floor(
                np.log(c.astype(np.float64)) * 1e6
            ).astype(np.int64)
            per_doc = (
                pd.DataFrame({"doc_id": tf["doc_id"], "n": c, "s": term_ppm})
                .groupby("doc_id", sort=False)
                .sum()
            )
            idx = pd.Series(np.arange(len(batch)), index=doc_ids)
            rows = idx.loc[per_doc.index].to_numpy()
            n = per_doc["n"].to_numpy(dtype=np.int64)
            flnn = np.floor(np.log(n.astype(np.float64)) * 1e6).astype(np.int64)
            n_out[rows] = n
            ent[rows] = (n * flnn - per_doc["s"].to_numpy(dtype=np.int64)) // n
        return pd.DataFrame(
            {"doc_id": doc_ids, "n_tokens": n_out, "ent_ppm": ent}
        )

    return docs.map_batches(score, batch_format="pandas", batch_size=batch_size)


def pmi_bigrams(
    docs: rd.Dataset,
    min_count: int = 5,
    num_parts: int = 64,
) -> rd.Dataset:
    """Pointwise mutual information of adjacent token bigrams — the
    classic collocation extractor (Church & Hanks 1990) over the whole
    corpus.  Returns ``(w1, w2, c_xy, pmi_ppm)`` for bigrams occurring
    at least ``min_count`` times, where

        pmi_ppm = floor(ln T·1e6) + floor(ln c_xy·1e6)
                  − floor(ln c_x·1e6) − floor(ln c_y·1e6)

    with ``T`` the corpus bigram total and ``c_x``/``c_y`` the
    positional marginals (first-word / second-word totals).  Flooring
    each ``ln`` to integer ppm BEFORE the arithmetic keeps every value
    an exact integer — order-independent and reproducible verbatim by
    the SQL oracle (the ``unigram_nll`` float discipline).

    Fully join-based: the corpus bigram table aggregates once, each
    marginal is a second tiny aggregate hash-joined back; nothing
    vocabulary-sized touches the driver.
    """
    import pyarrow as pa

    from graph_data_science_ray.pipelines.agg import hash_aggregate, hash_join

    bg = doc_bigrams(docs)

    def split_partial(df: pd.DataFrame) -> pd.DataFrame:
        b = df["bg"].astype(str)
        return pd.DataFrame(
            {
                "w1": df["w1"].astype(str).to_numpy(dtype=object),
                "w2": b.str.split(" ", n=1).str[1].to_numpy(dtype=object),
                "c_xy": df["tf"].to_numpy(dtype=np.int64),
            }
        )

    counts = hash_aggregate(
        bg.map_batches(split_partial, batch_format="pandas"),
        ["w1", "w2"], "c_xy", op="sum", num_parts=num_parts,
    ).materialize()
    total = int(counts.sum("c_xy") or 0)
    empty = pd.DataFrame(
        {"w1": pd.Series([], dtype=object), "w2": pd.Series([], dtype=object),
         "c_xy": pd.Series([], dtype=np.int64),
         "pmi_ppm": pd.Series([], dtype=np.int64)}
    )
    if total == 0:
        return rd.from_pandas(empty)
    lnt_ppm = int(np.floor(np.log(float(total)) * 1e6))

    def marg(col: str, out: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {col: df[col], out: df["c_xy"].to_numpy(dtype=np.int64)}
            )

        return hash_aggregate(
            counts.map_batches(fn, batch_format="pandas"),
            [col], out, op="sum", num_parts=num_parts,
        )

    def ln_col(src: str, dst: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df[dst] = np.floor(
                np.log(df[src].to_numpy(dtype=np.float64)) * 1e6
            ).astype(np.int64)
            return df.drop(columns=[src])

        return fn

    cx = marg("w1", "c_x").map_batches(ln_col("c_x", "lnx_ppm"), batch_format="pandas")
    cy = marg("w2", "c_y").map_batches(ln_col("c_y", "lny_ppm"), batch_format="pandas")

    kept = counts.filter(
        expr=f"c_xy >= {int(min_count)}"
    ) if min_count > 1 else counts

    j1 = hash_join(
        kept, cx, on=["w1"],
        left_schema=pa.schema(
            [("w1", pa.string()), ("w2", pa.string()), ("c_xy", pa.int64())]
        ),
        right_schema=pa.schema([("w1", pa.string()), ("lnx_ppm", pa.int64())]),
        num_parts=num_parts,
    )
    j2 = hash_join(
        j1, cy, on=["w2"],
        left_schema=pa.schema(
            [("w1", pa.string()), ("w2", pa.string()), ("c_xy", pa.int64()),
             ("lnx_ppm", pa.int64())]
        ),
        right_schema=pa.schema([("w2", pa.string()), ("lny_ppm", pa.int64())]),
        num_parts=num_parts,
    )

    def score(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return empty
        c = df["c_xy"].to_numpy(dtype=np.int64)
        ln_xy = np.floor(np.log(c.astype(np.float64)) * 1e6).astype(np.int64)
        return pd.DataFrame(
            {
                "w1": df["w1"].astype(str).to_numpy(dtype=object),
                "w2": df["w2"].astype(str).to_numpy(dtype=object),
                "c_xy": c,
                "pmi_ppm": lnt_ppm
                + ln_xy
                - df["lnx_ppm"].to_numpy(dtype=np.int64)
                - df["lny_ppm"].to_numpy(dtype=np.int64),
            }
        )

    return j2.map_batches(score, batch_format="pandas")


def zipf_fit(docs: rd.Dataset, k: int = 64, num_parts: int = 64) -> pd.DataFrame:
    """Zipf's-law slope over the corpus top-``k`` term frequencies as an
    exact RATIONAL: the least-squares slope of ``ln(count)`` against
    ``ln(rank)`` with both logs floored to integer ppm first (the
    engine's exact-float discipline), so

        slope = slope_num / slope_den,
        slope_num = k·Σxy − Σx·Σy,  slope_den = k·Σx² − (Σx)²

    is pure integer arithmetic over the answer-sized top-k table (a
    well-fit natural corpus gives slope ≈ −1).  Rides
    :func:`term_counts_topk` (exact hash-partitioned top-k); the driver
    folds k rows.  Returns one row ``(k, slope_num, slope_den)``.
    """
    top = term_counts_topk(docs, k=k, num_parts=num_parts)
    kk = len(top)
    if kk < 2:
        return pd.DataFrame(
            {"k": np.array([kk], dtype=np.int64),
             "slope_num": np.array([0], dtype=np.int64),
             "slope_den": np.array([1], dtype=np.int64)}
        )
    r = np.arange(1, kk + 1, dtype=np.float64)
    x = np.floor(np.log(r) * 1e6).astype(np.int64)
    y = np.floor(
        np.log(top["tf"].to_numpy(dtype=np.float64)) * 1e6
    ).astype(np.int64)
    # Python ints: the cross sums exceed int64 comfort at large k
    sx, sy = int(x.sum()), int(y.sum())
    sxy = int((x.astype(object) * y.astype(object)).sum())
    sxx = int((x.astype(object) * x.astype(object)).sum())
    return pd.DataFrame(
        {
            "k": np.array([kk], dtype=np.int64),
            "slope_num": np.array([kk * sxy - sx * sy], dtype=np.int64),
            "slope_den": np.array([kk * sxx - sx * sx], dtype=np.int64),
        }
    )

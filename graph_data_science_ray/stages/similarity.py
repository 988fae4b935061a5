"""Similarity search over embedding columns (``list<float>``).

- ``knn_brute_force``: exact cosine top-k of every row against a broadcast
  query matrix — one numpy matmul per batch (the baseline; scales linearly
  in corpus size, constant in query count).
- ``knn_lsh``: random-hyperplane LSH bucketing as the scale path — same
  contract, approximate recall, shuffle is a groupby on bucket keys.
- ``embedding_near_dup``: cosine >= threshold near-duplicate pairs.

Mirrors the reference's similarity surface (NodeSimilarity / KNN,
similarity/src/main/java/org/neo4j/gds/similarity/knn/Knn.java:37) in the
embedding-column setting a training-data pipeline needs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.where(n > 0, n, 1.0)


def _stack(col) -> np.ndarray:
    return np.stack([np.asarray(v, dtype=np.float64) for v in col])


def _center(m: np.ndarray) -> np.ndarray:
    return m - m.mean(axis=1, keepdims=True)


class _BruteForceScorer:
    """Actor-pool stage: query matrix fetched and prepared once per actor.

    Metrics follow the reference's knn/metrics package exactly:
    cosine (Cosine.java), euclidean = 1/(1+sqrt(Σδ²)) (Euclidean.java:44),
    pearson = (r+1)/2 (Pearson.java:60) — pearson r is cosine similarity
    of mean-centered vectors.
    """

    def __init__(self, queries_ref, k: int, exclude_self: bool, metric: str = "cosine"):
        q = ray.get(queries_ref)
        self.q_ids = q["ids"]
        self.metric = metric
        if metric == "cosine":
            self.q_mat = _normalize(q["mat"])
        elif metric == "pearson":
            self.q_mat = _normalize(_center(q["mat"]))
        elif metric == "euclidean":
            self.q_mat = q["mat"]
            self.q_sq = (q["mat"] ** 2).sum(axis=1)
        else:
            raise ValueError(metric)
        self.k = k
        self.exclude_self = exclude_self

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["vec_id"].to_numpy(dtype=np.int64)
        raw = _stack(batch["embedding"])
        if self.metric == "cosine":
            sims = self.q_mat @ _normalize(raw).T  # (Q, B)
        elif self.metric == "pearson":
            sims = (self.q_mat @ _normalize(_center(raw)).T + 1.0) / 2.0
        else:  # euclidean
            d2 = self.q_sq[:, None] + (raw**2).sum(axis=1)[None, :] - 2.0 * (self.q_mat @ raw.T)
            sims = 1.0 / (1.0 + np.sqrt(np.maximum(d2, 0.0)))
        out_q, out_n, out_s = [], [], []
        for qi, qid in enumerate(self.q_ids):
            s = np.round(sims[qi], 6)
            if self.exclude_self:
                s = np.where(ids == qid, -np.inf, s)
            # per-batch partial top-k (final top-k reduced later);
            # stable (-sim, id) order
            k = min(self.k, len(ids))
            order = np.lexsort((ids, -s))[:k]
            out_q.extend([qid] * len(order))
            out_n.extend(ids[order])
            out_s.extend(s[order])
        return pd.DataFrame(
            {
                "query_id": np.asarray(out_q, dtype=np.int64),
                "neighbor_id": np.asarray(out_n, dtype=np.int64),
                "sim": np.asarray(out_s, dtype=np.float64),
            }
        )


def knn_brute_force(
    embeddings: rd.Dataset,
    query_ids: np.ndarray,
    k: int = 5,
    exclude_self: bool = True,
    concurrency: int = 4,
    metric: str = "cosine",
) -> pd.DataFrame:
    """Exact top-k for the given query vec_ids under ``metric``
    ("cosine" | "euclidean" | "pearson" — the reference's knn metrics).

    Returns (query_id, neighbor_id, rank, sim): rank 1..k ordered by
    (round(sim, 6) desc, neighbor_id asc) — a total, reproducible order.
    Per-batch partial top-k rows are reduced on the driver (Q*k*blocks
    rows — tiny).
    """
    query_ids = np.asarray(query_ids, dtype=np.int64)
    qdf = (
        embeddings.filter(expr=f"vec_id in {query_ids.tolist()}")
        .to_pandas()
        .sort_values("vec_id")
    )
    queries_ref = ray.put(
        {"ids": qdf["vec_id"].to_numpy(dtype=np.int64), "mat": _stack(qdf["embedding"])}
    )
    import functools

    partials = embeddings.map_batches(
        functools.partial(
            _score_batch, queries_ref=queries_ref, k=k,
            exclude_self=exclude_self, metric=metric,
        ),
        batch_format="pandas",
        batch_size=4096,
    ).to_pandas()
    out = []
    for qid, g in partials.groupby("query_id"):
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True], kind="mergesort")
        top = g.head(k).reset_index(drop=True)
        top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
        out.append(top)
    res = pd.concat(out, ignore_index=True) if out else pd.DataFrame(
        columns=["query_id", "neighbor_id", "sim", "rank"]
    )
    return res[["query_id", "neighbor_id", "rank", "sim"]]


def _score_batch(
    batch: pd.DataFrame, *, queries_ref, k: int, exclude_self: bool, metric: str = "cosine"
):
    return _BruteForceScorer(queries_ref, k, exclude_self, metric)(batch)


# ---------------------------------------------------------------------------
# int8 scalar-quantized ANN
# ---------------------------------------------------------------------------


def _quantize(mat: np.ndarray, mx: float) -> np.ndarray:
    """Symmetric global-maxabs int8 codes: floor(127 * (x / mx)).

    The float association (divide THEN multiply by 127.0, then floor)
    is the contract — an ANSI-SQL oracle reproduces the codes bit-exactly
    from the same float64 inputs."""
    if mx == 0.0:
        return np.zeros(mat.shape, dtype=np.int64)
    return np.floor(127.0 * (mat / mx)).astype(np.int64)


def embedding_maxabs(embeddings: rd.Dataset) -> float:
    """Global max |x| over the embedding column (distributed: per-batch
    partial max, scalar reduce). float32 parquet values upcast exactly
    to float64, so the result is identical to SQL's max(abs(DOUBLE))."""
    partial = embeddings.map_batches(
        lambda df: pd.DataFrame(
            {"mx": [float(np.abs(_stack(df["embedding"])).max())]
             if len(df) else []}
        ),
        batch_format="pandas",
    )
    return float(partial.max("mx"))


def knn_quantized(
    embeddings: rd.Dataset,
    query_ids: np.ndarray,
    k: int = 5,
    exclude_self: bool = True,
) -> pd.DataFrame:
    """Exact top-k by INTEGER dot product over int8 scalar-quantized
    codes — the memory/bandwidth-reduction path of ANN at corpus scale
    (4x smaller than float32; int8 GEMM on real hardware). Codes are
    symmetric global-maxabs: floor(127 * (x / mx)) with mx the
    distributed global max |x|.

    Because scores are small integers (|dot| <= 127^2 * dims), the
    result is bit-exactly reproducible — no float tie hazards — and an
    ANSI-SQL oracle checks (query_id, neighbor_id, rank, score)
    verbatim. Rank orders by (score desc, neighbor_id asc).

    Scale shape: mx is one scalar pass; the quantized query matrix is
    ``ray.put`` once and read per task; candidates quantize per batch
    and score with one int64 matmul; per-batch partial top-k rows
    reduce on the driver (Q*k*blocks rows — tiny).
    """
    import functools

    query_ids = np.asarray(query_ids, dtype=np.int64)
    mx = embedding_maxabs(embeddings)
    qdf = (
        embeddings.filter(expr=f"vec_id in {query_ids.tolist()}")
        .to_pandas()
        .sort_values("vec_id")
    )
    queries_ref = ray.put(
        {"ids": qdf["vec_id"].to_numpy(dtype=np.int64),
         "codes": _quantize(_stack(qdf["embedding"]), mx)}
    )

    def score(batch: pd.DataFrame, *, queries_ref, mx, k, exclude_self):
        q = ray.get(queries_ref)
        ids = batch["vec_id"].to_numpy(dtype=np.int64)
        codes = _quantize(_stack(batch["embedding"]), mx)
        scores = q["codes"] @ codes.T  # (Q, B) int64 — exact
        out_q, out_n, out_s = [], [], []
        for qi, qid in enumerate(q["ids"]):
            s = scores[qi]
            cand = ids
            if exclude_self:
                keep = ids != qid  # drop, don't sentinel: -int64.min overflows
                s, cand = s[keep], ids[keep]
            kk = min(k, len(cand))
            order = np.lexsort((cand, -s))[:kk]
            out_q.extend([qid] * len(order))
            out_n.extend(cand[order])
            out_s.extend(s[order])
        return pd.DataFrame(
            {"query_id": np.asarray(out_q, dtype=np.int64),
             "neighbor_id": np.asarray(out_n, dtype=np.int64),
             "score": np.asarray(out_s, dtype=np.int64)}
        )

    partials = embeddings.map_batches(
        functools.partial(score, queries_ref=queries_ref, mx=mx, k=k,
                          exclude_self=exclude_self),
        batch_format="pandas",
        batch_size=4096,
    ).to_pandas()
    out = []
    for _, g in partials.groupby("query_id"):
        g = g.sort_values(["score", "neighbor_id"],
                          ascending=[False, True], kind="mergesort")
        top = g.head(k).reset_index(drop=True)
        top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
        out.append(top)
    res = pd.concat(out, ignore_index=True) if out else pd.DataFrame(
        columns=["query_id", "neighbor_id", "rank", "score"]
    )
    return res[["query_id", "neighbor_id", "rank", "score"]]


class _HyperplaneBucketer:
    """LSH bucket keys from seeded random hyperplanes (built once/actor)."""

    def __init__(self, dim: int, num_planes: int = 12, seed: int = 5):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((num_planes, dim))

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        mat = _normalize(_stack(batch["embedding"]))
        bits = (mat @ self.planes.T) > 0
        keys = (bits * (1 << np.arange(bits.shape[1]))).sum(axis=1).astype(np.int64)
        return pd.DataFrame(
            {
                "vec_id": batch["vec_id"].astype(np.int64),
                "bucket": keys,
                "embedding": batch["embedding"],
            }
        )


def knn_lsh(
    embeddings: rd.Dataset,
    k: int = 5,
    num_planes: int = 10,
    seed: int = 5,
) -> rd.Dataset:
    """Approximate all-pairs top-k inside LSH buckets (the scale path).

    Returns (query_id, neighbor_id, rank, sim) per bucket — recall depends
    on num_planes; candidates never cross buckets so the shuffle is one
    groupby on uniformly distributed keys.
    """
    first = embeddings.take(1)[0]
    dim = len(first["embedding"])
    bucketed = embeddings.map_batches(
        _HyperplaneBucketer(dim, num_planes, seed), batch_format="pandas", batch_size=4096
    )

    def topk_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["vec_id"].to_numpy(dtype=np.int64)
        mat = _normalize(_stack(g["embedding"]))
        sims = np.round(mat @ mat.T, 6)
        np.fill_diagonal(sims, -np.inf)
        rows = []
        for i, qid in enumerate(ids):
            order = np.lexsort((ids, -sims[i]))[: min(k, len(ids) - 1)]
            for r, j in enumerate(order, 1):
                rows.append((qid, ids[j], r, sims[i, j]))
        return pd.DataFrame(rows, columns=["query_id", "neighbor_id", "rank", "sim"])

    return bucketed.groupby("bucket").map_groups(topk_in_bucket, batch_format="pandas")


class _MultiBandBucketer:
    """num_bands independent hyperplane banks; one bucket row per band.

    Built once per actor; emits ``num_bands`` rows per vector with a
    packed ``(band << num_planes) | key`` bucket id, so a single uniform
    groupby co-locates each band's buckets."""

    def __init__(self, dim: int, num_planes: int, num_bands: int, seed: int):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((num_bands, num_planes, dim))
        self.num_planes = num_planes

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        mat = _normalize(_stack(batch["embedding"]))
        ids = batch["vec_id"].to_numpy(dtype=np.int64)
        L = self.planes.shape[0]
        out_id, out_bucket, out_emb = [], [], []
        for band in range(L):
            bits = (mat @ self.planes[band].T) > 0
            keys = (bits * (1 << np.arange(bits.shape[1]))).sum(axis=1)
            out_id.append(ids)
            out_bucket.append((band << self.num_planes) | keys.astype(np.int64))
            out_emb.append(batch["embedding"].to_numpy())
        return pd.DataFrame(
            {
                "vec_id": np.concatenate(out_id),
                "bucket": np.concatenate(out_bucket),
                "embedding": np.concatenate(out_emb),
            }
        )


def knn_lsh_multiband(
    embeddings: rd.Dataset,
    k: int = 5,
    num_planes: int = 8,
    num_bands: int = 4,
    seed: int = 5,
    num_parts: int = 64,
) -> rd.Dataset:
    """Multi-band hyperplane LSH ANN — the recall-amplified scale path.

    Each vector hashes into ``num_bands`` INDEPENDENT hyperplane banks
    (collision probability stacks as 1-(1-p^b)^L, the standard LSH
    amplification the single-band ``knn_lsh`` lacks); per-(band, bucket)
    local top-k candidates are then merged per query — dedup, re-rank,
    head k — in a second hash-partitioned groupby with a fully
    vectorized pandas merge (no per-query Python). Shuffle volume is
    num_bands × corpus for the bucket stage (inherent to multi-band
    LSH) plus the candidate lists."""
    first = embeddings.take(1)[0]
    dim = len(first["embedding"])
    bucketed = embeddings.map_batches(
        _MultiBandBucketer(dim, num_planes, num_bands, seed),
        batch_format="pandas", batch_size=4096,
    )

    def cands_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["vec_id"].to_numpy(dtype=np.int64)
        if len(ids) < 2:
            return pd.DataFrame(
                {"query_id": pd.Series([], dtype=np.int64),
                 "neighbor_id": pd.Series([], dtype=np.int64),
                 "sim": pd.Series([], dtype=np.float64),
                 "__part": pd.Series([], dtype=np.int64)}
            )
        mat = _normalize(_stack(g["embedding"]))
        sims = np.round(mat @ mat.T, 6)
        np.fill_diagonal(sims, -np.inf)
        kk = min(k, len(ids) - 1)
        # vectorized per-row top-k candidates, TIE-INCLUSIVE at the kth
        # sim (so the exact (sim desc, id asc) order applied in the merge
        # can never lose a tied true neighbor at the cut)
        part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        thr = sims[np.arange(len(ids))[:, None], part].min(axis=1)
        sel = sims >= thr[:, None]
        rows, cols = np.nonzero(sel)
        q = ids[rows]
        nb = ids[cols]
        sv = sims[rows, cols]
        keep = np.isfinite(sv)
        return pd.DataFrame(
            {"query_id": q[keep], "neighbor_id": nb[keep], "sim": sv[keep],
             "__part": (q[keep] % num_parts).astype(np.int64)}
        )

    def merge_per_query(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["query_id", "neighbor_id"])
        g = g.sort_values(
            ["query_id", "sim", "neighbor_id"],
            ascending=[True, False, True], kind="mergesort",
        )
        top = g.groupby("query_id", sort=False).head(k).reset_index(drop=True)
        top["rank"] = (
            top.groupby("query_id", sort=False).cumcount() + 1
        ).astype(np.int64)
        return top[["query_id", "neighbor_id", "rank", "sim"]]

    return (
        bucketed.groupby("bucket")
        .map_groups(cands_in_bucket, batch_format="pandas")
        .groupby("__part")
        .map_groups(merge_per_query, batch_format="pandas")
    )


def _ivf_train(
    embeddings: rd.Dataset, num_lists: int, iters: int, seed: int
) -> np.ndarray:
    """Spherical k-means coarse quantizer: (L, dim) unit centroids.

    Deterministic: initial centroids are the vectors with the L smallest
    splitmix hashes of vec_id (a seeded uniform sample chosen without
    materializing the corpus); each Lloyd pass is one streaming
    ``map_batches`` producing per-batch (list, sum_vec, count) partials —
    only L×dim floats ever reach the driver per pass.
    """
    from graph_data_science_ray._util import splitmix64

    def tag_hash(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["vec_id"].to_numpy(dtype=np.int64)
        h = splitmix64(ids.astype(np.uint64) + np.uint64(seed * 7919))
        out = df[["vec_id", "embedding"]].copy()
        out["__h"] = h.astype(np.uint64).astype(np.float64)  # sortable
        return out

    init = (
        embeddings.map_batches(tag_hash, batch_format="pandas")
        .sort("__h").limit(num_lists).to_pandas()
    )
    cent = _normalize(_stack(init["embedding"]))

    for _ in range(iters):
        cent_ref = ray.put(cent)

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            c = ray.get(cent_ref)
            mat = _normalize(_stack(df["embedding"]))
            assign = np.argmax(mat @ c.T, axis=1)
            L = len(c)
            sums = np.zeros((L, mat.shape[1]), dtype=np.float64)
            np.add.at(sums, assign, mat)
            cnt = np.bincount(assign, minlength=L).astype(np.int64)
            nz = np.flatnonzero(cnt)
            return pd.DataFrame(
                {"list_id": nz.astype(np.int64),
                 "vec": list(sums[nz]),
                 "n": cnt[nz]}
            )

        parts = embeddings.map_batches(
            partial, batch_format="pandas", batch_size=4096
        ).to_pandas()
        sums = np.zeros_like(cent)
        cnts = np.zeros(len(cent), dtype=np.int64)
        for lid, vec, n in zip(parts["list_id"], parts["vec"], parts["n"]):
            sums[lid] += np.asarray(vec)
            cnts[lid] += n
        nz = cnts > 0
        cent[nz] = _normalize(sums[nz] / cnts[nz, None])
    return cent


class _IvfScorer:
    """Actor-pool stage: probe-pruned cosine scoring. The query matrix,
    centroids, and per-query probe lists are fetched once per actor;
    per batch, each vector is assigned to its list and scored ONLY
    against queries probing that list."""

    def __init__(self, q_ref, cent_ref, probes_ref, k: int, exclude_self: bool):
        q = ray.get(q_ref)
        self.q_ids = q["ids"]
        self.q_mat = _normalize(q["mat"])
        self.cent = ray.get(cent_ref)
        self.probes = ray.get(probes_ref)      # (Q, nprobe) list ids
        self.k = k
        self.exclude_self = exclude_self

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["vec_id"].to_numpy(dtype=np.int64)
        mat = _normalize(_stack(batch["embedding"]))
        assign = np.argmax(mat @ self.cent.T, axis=1)
        sims = self.q_mat @ mat.T
        out_q, out_n, out_s = [], [], []
        for qi, qid in enumerate(self.q_ids):
            keep = np.isin(assign, self.probes[qi])
            if self.exclude_self:
                keep &= ids != qid
            if not keep.any():
                continue
            s = np.round(sims[qi][keep], 6)
            cand = ids[keep]
            order = np.lexsort((cand, -s))[: min(self.k, len(cand))]
            out_q.extend([qid] * len(order))
            out_n.extend(cand[order])
            out_s.extend(s[order])
        return pd.DataFrame(
            {"query_id": np.asarray(out_q, dtype=np.int64),
             "neighbor_id": np.asarray(out_n, dtype=np.int64),
             "sim": np.asarray(out_s, dtype=np.float64)}
        )


def knn_ivf(
    embeddings: rd.Dataset,
    query_ids: np.ndarray,
    k: int = 5,
    num_lists: int = 16,
    nprobe: int = 4,
    kmeans_iters: int = 5,
    seed: int = 5,
    exclude_self: bool = True,
) -> pd.DataFrame:
    """IVF-Flat approximate cosine top-k (same contract as
    ``knn_brute_force``): a spherical-k-means coarse quantizer splits the
    corpus into ``num_lists`` inverted lists; each query scores only the
    ``nprobe`` lists whose centroids are nearest, cutting scored volume
    to ~nprobe/num_lists of the corpus.

    Here pruning happens inside streaming batches (each batch assigns its
    vectors to lists and drops non-probed rows per query); at corpus
    scale the assignment becomes a partition key — write the corpus
    partitioned by list_id once, and probes then PRUNE AT THE READ
    (only nprobe/num_lists of the files are opened). Deterministic for a
    fixed seed; recall controlled by nprobe (see tests).
    """
    import functools

    query_ids = np.asarray(query_ids, dtype=np.int64)
    cent = _ivf_train(embeddings, num_lists, kmeans_iters, seed)
    qdf = (
        embeddings.filter(expr=f"vec_id in {query_ids.tolist()}")
        .to_pandas().sort_values("vec_id")
    )
    q_mat = _stack(qdf["embedding"])
    probes = np.argsort(
        -(_normalize(q_mat) @ cent.T), axis=1, kind="stable"
    )[:, :nprobe]
    q_ref = ray.put({"ids": qdf["vec_id"].to_numpy(dtype=np.int64), "mat": q_mat})
    cent_ref = ray.put(cent)
    probes_ref = ray.put(probes)

    partials = embeddings.map_batches(
        functools.partial(
            _ivf_score_batch, q_ref=q_ref, cent_ref=cent_ref,
            probes_ref=probes_ref, k=k, exclude_self=exclude_self,
        ),
        batch_format="pandas", batch_size=4096,
    ).to_pandas()
    out = []
    for qid, g in partials.groupby("query_id"):
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True],
                          kind="mergesort")
        top = g.head(k).reset_index(drop=True)
        top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
        out.append(top)
    res = pd.concat(out, ignore_index=True) if out else pd.DataFrame(
        columns=["query_id", "neighbor_id", "sim", "rank"]
    )
    return res[["query_id", "neighbor_id", "rank", "sim"]]


def _ivf_score_batch(batch, *, q_ref, cent_ref, probes_ref, k, exclude_self):
    return _IvfScorer(q_ref, cent_ref, probes_ref, k, exclude_self)(batch)


@ray.remote
def _score_block_pair(df_i: pd.DataFrame, df_j: pd.DataFrame, same: bool, threshold: float):
    """Cosine pairs >= threshold between two embedding blocks (exact)."""
    if not len(df_i) or not len(df_j):
        return pd.DataFrame(
            {"doc_a": pd.Series([], dtype=np.int64),
             "doc_b": pd.Series([], dtype=np.int64),
             "sim": pd.Series([], dtype=np.float64)}
        )
    ids_i = df_i["vec_id"].to_numpy(dtype=np.int64)
    ids_j = df_j["vec_id"].to_numpy(dtype=np.int64)
    m_i = _normalize(_stack(df_i["embedding"]))
    m_j = _normalize(_stack(df_j["embedding"]))
    sims = np.round(m_i @ m_j.T, 6)
    hit = sims >= threshold
    if same:
        hit = np.triu(hit, k=1)  # each unordered in-block pair once
    a, b = np.where(hit)
    ia, jb = ids_i[a], ids_j[b]
    lo = np.minimum(ia, jb)
    hi = np.maximum(ia, jb)
    keep = lo != hi
    return pd.DataFrame(
        {"doc_a": lo[keep], "doc_b": hi[keep], "sim": sims[a, b][keep]}
    )


def embedding_near_dup(
    embeddings: rd.Dataset,
    threshold: float = 0.95,
    id_limit: int | None = None,
    strategy: str = "auto",
    exact_limit: int = 200_000,
) -> pd.DataFrame:
    """Cosine >= threshold pairs (doc_a < doc_b) — embedding near-dedup.

    ``strategy``:
      - ``"exact"``: all block pairs via **block-pair tasks** — the
        embedding table's blocks stay in the object store; one task per
        block pair (i <= j) computes a chunk×chunk similarity matrix and
        returns only the above-threshold pairs. Memory per task is
        O(chunk²), but the task count is O(B²): correct and
        oracle-exact, quadratic in corpus size.
      - ``"lsh"``: sub-quadratic ``embedding_near_dup_lsh`` (bucketed
        candidates; approximate recall).
      - ``"auto"`` (default): exact while the corpus has at most
        ``exact_limit`` rows, LSH above it — callers that only care
        about the threshold predicate never hit the quadratic path at
        scale.
    """
    ds = embeddings.select_columns(["vec_id", "embedding"])
    if id_limit is not None:
        ds = ds.filter(expr=f"vec_id < {id_limit}")
    ds = ds.materialize()
    if strategy == "auto":
        strategy = "exact" if ds.count() <= exact_limit else "lsh"
    if strategy == "lsh":
        out = embedding_near_dup_lsh(ds, threshold=threshold).to_pandas()
        return out.sort_values(
            ["doc_a", "doc_b"], kind="mergesort"
        ).reset_index(drop=True)
    refs = ds.to_pandas_refs()
    tasks = []
    for i in range(len(refs)):
        for j in range(i, len(refs)):
            tasks.append(_score_block_pair.remote(refs[i], refs[j], i == j, threshold))
    parts = [p for p in ray.get(tasks) if len(p)]
    if not parts:
        return pd.DataFrame(
            {"doc_a": pd.Series([], dtype=np.int64),
             "doc_b": pd.Series([], dtype=np.int64),
             "sim": pd.Series([], dtype=np.float64)}
        )
    out = pd.concat(parts, ignore_index=True)
    return out.sort_values(["doc_a", "doc_b"], kind="mergesort").reset_index(drop=True)


def embedding_near_dup_lsh(
    embeddings: rd.Dataset,
    threshold: float = 0.95,
    num_planes: int = 10,
    seed: int = 5,
    k: int = 50,
) -> rd.Dataset:
    """Approximate near-dup pairs: LSH buckets + threshold filter.

    The sub-quadratic scale path — candidates never cross buckets, so
    recall depends on ``num_planes`` (fewer planes = bigger buckets =
    higher recall, more compute)."""
    knn = knn_lsh(embeddings, k=k, num_planes=num_planes, seed=seed)

    def to_pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["sim"] >= threshold]
        lo = np.minimum(df["query_id"], df["neighbor_id"]).astype(np.int64)
        hi = np.maximum(df["query_id"], df["neighbor_id"]).astype(np.int64)
        out = pd.DataFrame({"doc_a": lo, "doc_b": hi, "sim": df["sim"]})
        return out[out["doc_a"] != out["doc_b"]]

    from graph_data_science_ray.pipelines.agg import hash_distinct

    return hash_distinct(
        knn.map_batches(to_pairs, batch_format="pandas"), ["doc_a", "doc_b"]
    )


class _CentroidAssigner:
    """Actor-pool stage: centroid matrix fetched once per actor; per batch
    argmin squared Euclidean distance (ties -> smaller centroid id)."""

    def __init__(self, cent_ref):
        c = ray.get(cent_ref)
        self.c_ids = c["ids"]
        self.c_mat = c["mat"]  # (C, d) float64
        self.c_sq = (self.c_mat * self.c_mat).sum(axis=1)  # |c|^2

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        mat = _stack(batch["embedding"])  # (B, d)
        # dist^2 = |v|^2 - 2 v.c + |c|^2; |v|^2 constant per row -> drop it
        scores = -2.0 * (mat @ self.c_mat.T) + self.c_sq[None, :]
        best = np.argmin(scores, axis=1)  # ties -> first (smaller cid)
        out = batch[["vec_id", "embedding"]].copy()
        out["cluster"] = self.c_ids[best].astype(np.int64)
        return out


def semantic_dedup(
    embeddings: rd.Dataset,
    n_clusters: int = 8,
    threshold: float = 0.95,
    concurrency: int = 4,
    max_cluster: int = 100_000,
) -> rd.Dataset:
    """SemDeDup (Abbas et al. 2023): cluster the embedding space, then
    find near-duplicate pairs WITHIN each cluster only — the quadratic
    pair search is bounded per cluster instead of corpus-wide.

    Deterministic contract (exactly reproducible in SQL):
      - centroids = the embeddings with ``vec_id < n_clusters`` (the
        deterministic-init convention ``kmeans`` uses);
      - each vector joins the centroid minimizing Euclidean distance
        (ties -> smaller centroid id);
      - output = (cluster, doc_a, doc_b) for same-cluster pairs with
        ``round(cosine, 6) >= threshold``, doc_a < doc_b.

    Shapes: the (C x d) centroid matrix is ``ray.put`` ONCE and read per
    actor (small-side broadcast); assignment is one vectorized matmul per
    batch; pairs run inside ``groupby(cluster).map_groups`` so only each
    cluster's vectors co-locate.  Clusters larger than ``max_cluster``
    raise (at real scale raise ``n_clusters`` — a cluster must fit one
    task; SemDeDup runs with k in the tens of thousands at 100 TB).
    """
    ds = embeddings.select_columns(["vec_id", "embedding"])
    cent = ds.filter(expr=f"vec_id < {int(n_clusters)}").to_pandas()
    cent = cent.sort_values("vec_id")
    cent_ref = ray.put(
        {"ids": cent["vec_id"].to_numpy(dtype=np.int64),
         "mat": _stack(cent["embedding"])}
    )

    assigned = ds.map_batches(
        _CentroidAssigner, batch_format="pandas", batch_size=4096,
        concurrency=concurrency, num_cpus=1,
        fn_constructor_kwargs={"cent_ref": cent_ref},
    )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"cluster": pd.Series([], dtype=np.int64),
             "doc_a": pd.Series([], dtype=np.int64),
             "doc_b": pd.Series([], dtype=np.int64)}
        )
        if len(g) < 2:
            return empty
        if len(g) > max_cluster:
            raise ValueError(
                f"semantic_dedup cluster of {len(g)} rows exceeds max_cluster="
                f"{max_cluster}; raise n_clusters"
            )
        ids = g["vec_id"].to_numpy(dtype=np.int64)
        order = np.argsort(ids)
        ids = ids[order]
        m = _normalize(_stack(g["embedding"].to_numpy()[order]))
        # blockwise upper-triangle scan: peak memory is chunk x n, not
        # n x n (an n=100k cluster would need an 80 GB dense sims matrix)
        chunk = 2048
        outs_a, outs_b = [], []
        for s in range(0, len(m), chunk):
            e = min(s + chunk, len(m))
            sims = np.round(m[s:e] @ m.T, 6)
            # keep strictly-upper pairs only: global col > global row
            ra, rb = np.where(sims >= threshold)
            keep = rb > (ra + s)
            outs_a.append(ra[keep] + s)
            outs_b.append(rb[keep])
        a = np.concatenate(outs_a) if outs_a else np.zeros(0, dtype=np.int64)
        b = np.concatenate(outs_b) if outs_b else np.zeros(0, dtype=np.int64)
        if not len(a):
            return empty
        return pd.DataFrame(
            {"cluster": np.full(len(a), int(g["cluster"].iloc[0]), dtype=np.int64),
             "doc_a": ids[a], "doc_b": ids[b]}
        )

    return assigned.groupby("cluster").map_groups(pairs, batch_format="pandas")


# ---------------------------------------------------------------------------
# product-quantization ANN (ADC)
# ---------------------------------------------------------------------------


def pq_codebook(
    embeddings: rd.Dataset, m: int = 4, ncent: int = 16, refine: int = 2
) -> dict:
    """Deterministic product-quantization codebook (Jégou et al. 2011,
    "Product Quantization for Nearest Neighbor Search").

    Subspaces are ``m`` near-equal contiguous dim chunks
    (``s = dim_index * m // D``). Initial centroids per subspace are
    the quantized subvectors of ``ncent`` ANCHOR rows selected by md5
    rank of ``vec_id`` (the repo's engine-independent hash — a seeded,
    SQL-reproducible spread), then ``refine`` integer Lloyd rounds per
    subspace: assign every subvector to its nearest centroid (ties →
    smallest index), new centroid = per-dim floor-mean, empty clusters
    keep their previous centroid. The floor-mean is computed as
    ``(sum + 127*count) // count - 127`` — the +127 shift keeps the
    numerator non-negative so truncating SQL integer division equals
    numpy floor division. All-integer throughout: codes, ADC tables
    and distances are exact int64 and an ANSI-SQL oracle replays
    anchor selection AND every Lloyd round verbatim.

    Scale shape: anchor selection is per-batch (vec_id, h32) partial
    top-``ncent`` + an answer-sized driver merge; each Lloyd round is
    one broadcast (current centroids via ``ray.put``) + per-batch
    assignment partials (m * ncent sum-vectors and counts per batch —
    kilobytes) + an answer-sized driver combine. The codebook itself
    is m * ncent * (D/m) ints — kilobytes, ``ray.put`` once.
    """
    import hashlib

    mx = embedding_maxabs(embeddings)

    def partial_anchor(df: pd.DataFrame, *, nc=int(ncent)) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {"vec_id": pd.Series([], dtype=np.int64),
                 "h32": pd.Series([], dtype=np.int64)}
            )
        ids = df["vec_id"].to_numpy(dtype=np.int64)
        h32 = np.fromiter(
            (
                int(hashlib.md5(str(v).encode("utf-8")).hexdigest()[:8], 16)
                for v in ids
            ),
            dtype=np.int64,
            count=len(ids),
        )
        order = np.lexsort((ids, h32))[:nc]
        return pd.DataFrame({"vec_id": ids[order], "h32": h32[order]})

    cand = embeddings.map_batches(
        partial_anchor, batch_format="pandas", batch_size=8192
    ).to_pandas()
    cand = cand.sort_values(["h32", "vec_id"], kind="mergesort").head(int(ncent))
    anchor_ids = cand["vec_id"].to_numpy(dtype=np.int64)

    adf = (
        embeddings.filter(expr=f"vec_id in {anchor_ids.tolist()}")
        .to_pandas()
        .set_index("vec_id")
        .loc[anchor_ids]  # centroid index == md5-rank order
        .reset_index()
    )
    cents = _quantize(_stack(adf["embedding"]), mx)  # (ncent, D) int64
    D = cents.shape[1]
    sub_of = (np.arange(D, dtype=np.int64) * int(m)) // D
    book = {
        "mx": mx, "m": int(m), "ncent": int(ncent), "D": D,
        "sub_of": sub_of, "cents": cents, "anchor_ids": anchor_ids,
    }

    import functools

    def assign_partials(batch: pd.DataFrame, *, book_ref) -> pd.DataFrame:
        bk = ray.get(book_ref)
        empty = pd.DataFrame(
            {"s": pd.Series([], dtype=np.int64),
             "c": pd.Series([], dtype=np.int64),
             "cnt": pd.Series([], dtype=np.int64),
             "sums": pd.Series([], dtype=object)}
        )
        if not len(batch):
            return empty
        qv = _quantize(_stack(batch["embedding"]), bk["mx"])
        codes = _pq_encode(qv, bk)  # (B, m)
        rows_s, rows_c, rows_n, rows_v = [], [], [], []
        for s in range(bk["m"]):
            cols = bk["sub_of"] == s
            sub = qv[:, cols]
            for c in range(bk["ncent"]):
                sel = codes[:, s] == c
                n = int(sel.sum())
                if n == 0:
                    continue
                rows_s.append(s)
                rows_c.append(c)
                rows_n.append(n)
                rows_v.append(sub[sel].sum(axis=0).astype(np.int64))
        return pd.DataFrame(
            {"s": np.asarray(rows_s, dtype=np.int64),
             "c": np.asarray(rows_c, dtype=np.int64),
             "cnt": np.asarray(rows_n, dtype=np.int64),
             "sums": rows_v}
        )

    for _round in range(int(refine)):
        book_ref = ray.put(book)
        parts = embeddings.map_batches(
            functools.partial(assign_partials, book_ref=book_ref),
            batch_format="pandas", batch_size=8192,
        ).to_pandas()
        new_cents = book["cents"].copy()
        for s in range(int(m)):
            cols = sub_of == s
            g = parts[parts["s"] == s]
            for c in range(int(ncent)):
                gc = g[g["c"] == c]
                if not len(gc):
                    continue  # empty cluster keeps its centroid
                cnt = int(gc["cnt"].sum())
                sums = np.sum(np.stack(gc["sums"].to_list()), axis=0)
                new_cents[c, cols] = (sums + 127 * cnt) // cnt - 127
        book = dict(book, cents=new_cents)
    return book


def _pq_encode(codes_q: np.ndarray, book: dict) -> np.ndarray:
    """(B, m) int64 PQ codes: per subspace, argmin integer L2 to the
    centroids (ties -> smallest centroid index, np.argmin's contract)."""
    B = codes_q.shape[0]
    out = np.empty((B, book["m"]), dtype=np.int64)
    for s in range(book["m"]):
        cols = book["sub_of"] == s
        diff = codes_q[:, None, cols] - book["cents"][None, :, cols]
        d = np.einsum("bcd,bcd->bc", diff, diff)
        out[:, s] = np.argmin(d, axis=1)
    return out


def knn_pq(
    embeddings: rd.Dataset,
    query_ids: np.ndarray,
    k: int = 5,
    m: int = 4,
    ncent: int = 16,
    book: dict | None = None,
    exclude_self: bool = True,
) -> pd.DataFrame:
    """Approximate top-k via PQ asymmetric distance computation: the
    100-TB ANN memory path (codes are ``m`` bytes per vector — 64x
    smaller than the float32 vector; scan cost is a table lookup per
    subspace instead of a D-dim dot product).

    Per batch: vectors int8-quantize, PQ-encode against the broadcast
    codebook, and score against the broadcast per-query ADC tables
    ``T[q, s, c] = ||q_s - cent_{s,c}||^2`` (exact int64); estimated
    distance is ``sum_s T[q, s, code_s(x)]``. Rank orders by
    (dist ASC, neighbor_id ASC); everything integer, so the driver
    oracle checks ids + rank + dist verbatim.
    """
    import functools

    query_ids = np.asarray(query_ids, dtype=np.int64)
    if book is None:
        book = pq_codebook(embeddings, m=m, ncent=ncent)

    qdf = (
        embeddings.filter(expr=f"vec_id in {query_ids.tolist()}")
        .to_pandas()
        .sort_values("vec_id")
    )
    qcodes = _quantize(_stack(qdf["embedding"]), book["mx"])  # (Q, D)
    # ADC tables: (Q, m, ncent) int64
    Q = qcodes.shape[0]
    tables = np.empty((Q, book["m"], book["ncent"]), dtype=np.int64)
    for s in range(book["m"]):
        cols = book["sub_of"] == s
        diff = qcodes[:, None, cols] - book["cents"][None, :, cols]
        tables[:, s, :] = np.einsum("qcd,qcd->qc", diff, diff)
    ctx_ref = ray.put(
        {"qids": qdf["vec_id"].to_numpy(dtype=np.int64),
         "tables": tables, "book": book}
    )

    def score(batch: pd.DataFrame, *, ctx_ref, k, exclude_self):
        ctx = ray.get(ctx_ref)
        book = ctx["book"]
        ids = batch["vec_id"].to_numpy(dtype=np.int64)
        codes = _pq_encode(
            _quantize(_stack(batch["embedding"]), book["mx"]), book
        )  # (B, m)
        # dist[q, b] = sum_s tables[q, s, codes[b, s]]
        t = ctx["tables"]  # (Q, m, ncent)
        d = np.zeros((t.shape[0], len(ids)), dtype=np.int64)
        for s in range(book["m"]):
            d += t[:, s, :][:, codes[:, s]]
        out_q, out_n, out_d = [], [], []
        for qi, qid in enumerate(ctx["qids"]):
            dist = d[qi]
            cand = ids
            if exclude_self:
                keep = ids != qid
                dist, cand = dist[keep], ids[keep]
            kk = min(k, len(cand))
            order = np.lexsort((cand, dist))[:kk]
            out_q.extend([qid] * len(order))
            out_n.extend(cand[order])
            out_d.extend(dist[order])
        return pd.DataFrame(
            {"query_id": np.asarray(out_q, dtype=np.int64),
             "neighbor_id": np.asarray(out_n, dtype=np.int64),
             "dist": np.asarray(out_d, dtype=np.int64)}
        )

    partials = embeddings.map_batches(
        functools.partial(score, ctx_ref=ctx_ref, k=k,
                          exclude_self=exclude_self),
        batch_format="pandas",
        batch_size=4096,
    ).to_pandas()
    out = []
    for _, g in partials.groupby("query_id"):
        g = g.sort_values(["dist", "neighbor_id"],
                          ascending=[True, True], kind="mergesort")
        top = g.head(k).reset_index(drop=True)
        top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
        out.append(top)
    res = pd.concat(out, ignore_index=True) if out else pd.DataFrame(
        columns=["query_id", "neighbor_id", "rank", "dist"]
    )
    return res[["query_id", "neighbor_id", "rank", "dist"]]


def knn_ivfpq(
    embeddings: rd.Dataset,
    query_ids: np.ndarray,
    k: int = 5,
    num_lists: int = 8,
    nprobe: int = 2,
    m: int = 4,
    ncent: int = 16,
    refine: int = 2,
    coarse: dict | None = None,
    book: dict | None = None,
    exclude_self: bool = True,
) -> pd.DataFrame:
    """IVF-PQ: the composed corpus-scale ANN path — a coarse integer
    quantizer prunes the candidate set to ``nprobe``/``num_lists`` of
    the corpus, PQ ADC scores the survivors from ``m``-byte codes.

    Both stages reuse :func:`pq_codebook`'s all-integer machinery: the
    coarse quantizer IS a PQ codebook with ``m=1`` (one subspace =
    whole vector, ``num_lists`` centroids, same md5-rank anchors +
    integer Lloyd rounds), so list assignment, probe selection
    (integer L2 to coarse centroids, ties → smaller list id) and ADC
    distances are all exact int64 and the driver oracle replays the
    ENTIRE composition — both codebooks' Lloyd rounds, the probe
    pruning, and the final ranking — verbatim in SQL.

    At corpus scale the coarse assignment becomes the partition key:
    write the code table partitioned by list id once and probes prune
    AT THE READ (only nprobe/num_lists of the files open); here the
    pruning happens inside streaming batches, same contract as
    ``knn_ivf``. Output ranks by (dist ASC, neighbor_id ASC).
    """
    import functools

    query_ids = np.asarray(query_ids, dtype=np.int64)
    if coarse is None:
        coarse = pq_codebook(embeddings, m=1, ncent=num_lists, refine=refine)
    if book is None:
        book = pq_codebook(embeddings, m=m, ncent=ncent, refine=refine)

    qdf = (
        embeddings.filter(expr=f"vec_id in {query_ids.tolist()}")
        .to_pandas()
        .sort_values("vec_id")
    )
    qcodes = _quantize(_stack(qdf["embedding"]), book["mx"])  # (Q, D)
    Q = qcodes.shape[0]
    # probe lists: integer L2 to the coarse centroids, nprobe smallest
    cdiff = qcodes[:, None, :] - coarse["cents"][None, :, :]
    cdist = np.einsum("qcd,qcd->qc", cdiff, cdiff)  # (Q, num_lists)
    probes = np.empty((Q, int(nprobe)), dtype=np.int64)
    for qi in range(Q):
        probes[qi] = np.lexsort(
            (np.arange(cdist.shape[1]), cdist[qi])
        )[: int(nprobe)]
    # ADC tables vs the fine codebook
    tables = np.empty((Q, book["m"], book["ncent"]), dtype=np.int64)
    for s in range(book["m"]):
        cols = book["sub_of"] == s
        diff = qcodes[:, None, cols] - book["cents"][None, :, cols]
        tables[:, s, :] = np.einsum("qcd,qcd->qc", diff, diff)
    ctx_ref = ray.put(
        {"qids": qdf["vec_id"].to_numpy(dtype=np.int64),
         "tables": tables, "probes": probes,
         "book": book, "coarse": coarse}
    )

    def score(batch: pd.DataFrame, *, ctx_ref, k, exclude_self):
        ctx = ray.get(ctx_ref)
        book, coarse = ctx["book"], ctx["coarse"]
        ids = batch["vec_id"].to_numpy(dtype=np.int64)
        qv = _quantize(_stack(batch["embedding"]), book["mx"])
        lists = _pq_encode(qv, coarse)[:, 0]  # (B,) coarse list ids
        codes = _pq_encode(qv, book)  # (B, m)
        t = ctx["tables"]
        d = np.zeros((t.shape[0], len(ids)), dtype=np.int64)
        for s in range(book["m"]):
            d += t[:, s, :][:, codes[:, s]]
        out_q, out_n, out_d = [], [], []
        for qi, qid in enumerate(ctx["qids"]):
            probed = np.isin(lists, ctx["probes"][qi])
            if exclude_self:
                probed &= ids != qid
            if not probed.any():
                continue
            dist, cand = d[qi][probed], ids[probed]
            kk = min(k, len(cand))
            order = np.lexsort((cand, dist))[:kk]
            out_q.extend([qid] * len(order))
            out_n.extend(cand[order])
            out_d.extend(dist[order])
        return pd.DataFrame(
            {"query_id": np.asarray(out_q, dtype=np.int64),
             "neighbor_id": np.asarray(out_n, dtype=np.int64),
             "dist": np.asarray(out_d, dtype=np.int64)}
        )

    partials = embeddings.map_batches(
        functools.partial(score, ctx_ref=ctx_ref, k=k,
                          exclude_self=exclude_self),
        batch_format="pandas",
        batch_size=4096,
    ).to_pandas()
    out = []
    for _, g in partials.groupby("query_id"):
        g = g.sort_values(["dist", "neighbor_id"],
                          ascending=[True, True], kind="mergesort")
        top = g.head(k).reset_index(drop=True)
        top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
        out.append(top)
    res = pd.concat(out, ignore_index=True) if out else pd.DataFrame(
        columns=["query_id", "neighbor_id", "rank", "dist"]
    )
    return res[["query_id", "neighbor_id", "rank", "dist"]]


_POPCOUNT_LUT = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None],
                              axis=1).sum(axis=1).astype(np.int64)


def _sign_pack(mat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Sign bits of a (n, 64) float matrix packed into two u32 registers
    (lo = dims 0-31, hi = 32-63), returned as int64 — BIGINT-safe on
    both sides of the oracle."""
    bits = (mat >= 0.0)
    w = (1 << np.arange(32, dtype=np.int64))
    lo = (bits[:, :32] * w).sum(axis=1).astype(np.int64)
    hi = (bits[:, 32:64] * w).sum(axis=1).astype(np.int64)
    return lo, hi


def _popcount64(x: np.ndarray) -> np.ndarray:
    return _POPCOUNT_LUT[
        x.astype(np.uint64).view(np.uint8).reshape(len(x), 8)
    ].sum(axis=1)


def knn_hamming(
    emb: rd.Dataset,
    query_ids: tuple = (1, 2, 3),
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Binary-signature ANN: sign-bit packing + Hamming top-k.

    The 1-bit quantization of the similarity stack (Charikar's
    sign-random-projection LSH degenerate case where the projection is
    the identity — "Similarity estimation techniques from rounding
    algorithms", STOC 2002): each vector becomes its 64 sign bits in two
    u32 registers, distance is XOR-popcount, 8 bytes per vector — the
    memory floor for a first-pass rerank filter at corpus scale.

    Fully deterministic and integer-exact: returns ``(query_id, vec_id,
    hamming)`` of the top ``k`` per query by ``(hamming, vec_id)``
    order, self excluded.  Per-batch partial top-k bounds the driver
    merge at ``num_blocks · k`` rows; queries are answer-sized and ride
    the broadcast closure.
    """
    qset = {int(i) for i in query_ids}

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        return df[df[id_col].astype(np.int64).isin(qset)]

    qdf = emb.map_batches(pick, batch_format="pandas").to_pandas()
    qdf = qdf.sort_values(id_col)  # answer-sized: |query_ids| rows
    qmat = np.stack(
        [np.asarray(v, dtype=np.float64) for v in qdf[vec_col]]
    )
    qlo, qhi = _sign_pack(qmat)
    qid = qdf[id_col].to_numpy(dtype=np.int64)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {"query_id": pd.Series([], dtype=np.int64),
                 "vec_id": pd.Series([], dtype=np.int64),
                 "hamming": pd.Series([], dtype=np.int64)}
            )
        ids = df[id_col].to_numpy(dtype=np.int64)
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in df[vec_col]])
        lo, hi = _sign_pack(mat)
        frames = []
        for j in range(len(qid)):
            ham = (
                _popcount64(np.bitwise_xor(lo, qlo[j]))
                + _popcount64(np.bitwise_xor(hi, qhi[j]))
            ).astype(np.int64)
            keep = ids != qid[j]
            f = pd.DataFrame(
                {"query_id": np.int64(qid[j]), "vec_id": ids[keep],
                 "hamming": ham[keep]}
            )
            f = f.sort_values(["hamming", "vec_id"], kind="mergesort").head(k)
            frames.append(f)
        return pd.concat(frames, ignore_index=True)

    cand = emb.map_batches(partial, batch_format="pandas").to_pandas()
    out = (
        cand.sort_values(["query_id", "hamming", "vec_id"], kind="mergesort")
        .groupby("query_id", sort=True)
        .head(k)
        .reset_index(drop=True)
    )
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out


def knn_label_purity(
    emb: rd.Dataset,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> pd.DataFrame:
    """Embedding-quality eval: label agreement of Hamming k-NN.

    The standard intrinsic embedding metric — how often a vector's
    nearest neighbors share its class — computed over the sign-bit
    Hamming space (deterministic, integer-exact; see
    :func:`knn_hamming`).  Every vector is a query against the full
    corpus: the packed registers + labels broadcast at 9 bytes/vector
    (the binary-signature memory floor; at billion-vector scale swap the
    all-pairs scan for the LSH-bucketed candidate path), distances and
    ranks are exact, ties break by ``(hamming, vec_id)``.

    Returns one row: ``(n_vecs, k, same_label, pairs, purity_ppm)``
    with ``purity_ppm = same_label · 10⁶ // pairs``.
    """
    full = emb.to_pandas()  # packed registers + labels: the broadcast side
    ids = full[id_col].to_numpy(dtype=np.int64)
    order = np.argsort(ids, kind="mergesort")
    ids = ids[order]
    mat = np.stack(
        [np.asarray(v, dtype=np.float64) for v in full[vec_col].iloc[order]]
    )
    labels = full[label_col].to_numpy(dtype=np.int64)[order]
    lo, hi = _sign_pack(mat)
    import ray

    packed_ref = ray.put((ids, lo, hi, labels))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        aids, alo, ahi, albl = ray.get(packed_ref)
        qids = df[id_col].to_numpy(dtype=np.int64)
        qmat = np.stack([np.asarray(v, dtype=np.float64) for v in df[vec_col]])
        qlbl = df[label_col].to_numpy(dtype=np.int64)
        qlo, qhi = _sign_pack(qmat)
        same = 0
        pairs = 0
        for j in range(len(qids)):
            ham = (
                _popcount64(np.bitwise_xor(alo, qlo[j]))
                + _popcount64(np.bitwise_xor(ahi, qhi[j]))
            ).astype(np.int64)
            mask = aids != qids[j]
            h, i_, l_ = ham[mask], aids[mask], albl[mask]
            sel = np.lexsort((i_, h))[:k]
            same += int((l_[sel] == qlbl[j]).sum())
            pairs += len(sel)
        return pd.DataFrame(
            {"same": np.array([same], dtype=np.int64),
             "pairs": np.array([pairs], dtype=np.int64),
             "n": np.array([len(qids)], dtype=np.int64)}
        )

    agg = emb.map_batches(partial, batch_format="pandas").to_pandas().sum()
    same, pairs, n = int(agg["same"]), int(agg["pairs"]), int(agg["n"])
    return pd.DataFrame(
        {"n_vecs": np.array([n], dtype=np.int64),
         "k": np.array([int(k)], dtype=np.int64),
         "same_label": np.array([same], dtype=np.int64),
         "pairs": np.array([pairs], dtype=np.int64),
         "purity_ppm": np.array(
             [same * 1_000_000 // pairs if pairs else 0], dtype=np.int64
         )}
    )

"""Vector similarity functions — batch scoring of list-column pairs.

Reference: proc/common/src/main/java/org/neo4j/gds/functions/SimilaritiesFunc.java:35-186
(gds.similarity.{jaccard, cosine, pearson, euclideanDistance, euclidean,
overlap}). The reference scores one pair of number-lists per Cypher call;
the engine form scores a Dataset of vector pairs in one vectorized
``map_batches`` pass.

Reference semantics preserved:
- jaccard: MULTISET intersection / union via sorted merge
  (SimilaritiesFunc.java:152-186) — union = len1 + len2 − intersection;
  empty ∪ empty → 1.
- overlap: DISTINCT-set intersection / min(list length)
  (SimilaritiesFunc.java:101-118).
- cosine = Σab / √(Σa²·Σb²); pearson over the two lists as samples;
  euclideanDistance = √Σ(a−b)²; euclidean = 1/(1+distance)
  (Intersections.java via SimilaritiesFunc.java:56-99).

Driver-oracle float discipline: inputs are QUANTIZED to integers
(``floor(v·1000)``) before any arithmetic, so every sum is an
order-independent integer that DuckDB reproduces exactly; each metric
then applies at most one √ and one division in a fixed association, and
ppm results are floored to int64. Degenerate denominators (zero vector /
constant vector) score 0 — the reference raises or yields NaN there; the
engine contract is total.

Everything is batch-local (no shuffle): the only distributed structure
is the pairs Dataset itself, so the operator streams at any scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

_Q = 1000.0  # input quantization: milli-units


def _quant(col) -> np.ndarray:
    """(n, d) int64 matrix: floor(v * 1000) per element."""
    m = np.stack([np.asarray(v, dtype=np.float64) for v in col])
    return np.floor(m * _Q).astype(np.int64)


def _multiset_intersections(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Per-row multiset intersection size of two (n, d) int matrices.

    Vectorized: key each element by (row, value), count multiplicities on
    both sides with one ``np.unique`` each, then sum min(countA, countB)
    over the matched keys — no per-row Python loop.
    """
    n, d = a.shape
    if not n:
        return np.zeros(0, dtype=np.int64)
    rows = np.repeat(np.arange(n, dtype=np.int64), d)
    shift = np.int64(1 << 44)
    base = np.int64(min(a.min(), b.min()))
    ka = rows * shift + (a.ravel() - base)
    kb = rows * shift + (b.ravel() - base)
    ua, ca = np.unique(ka, return_counts=True)
    ub, cb = np.unique(kb, return_counts=True)
    pos = np.searchsorted(ua, ub)
    pos_c = np.clip(pos, 0, len(ua) - 1)
    hit = (pos < len(ua)) & (ua[pos_c] == ub)
    inter = np.zeros(n, dtype=np.int64)
    if hit.any():
        m = np.minimum(cb[hit], ca[pos[hit]])
        np.add.at(inter, ((ub[hit] - (ub[hit] % shift)) // shift), m)
    return inter


def _distinct_intersections(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Per-row DISTINCT intersection size (overlap numerator)."""
    n, d = a.shape
    rows = np.repeat(np.arange(n, dtype=np.int64), d)
    shift = np.int64(1 << 44)
    base = np.int64(min(a.min(), b.min())) if n else np.int64(0)
    ka = np.unique(rows * shift + (a.ravel() - base))
    kb = np.unique(rows * shift + (b.ravel() - base))
    pos = np.searchsorted(ka, kb)
    pos_c = np.clip(pos, 0, len(ka) - 1) if len(ka) else pos
    hit = (pos < len(ka)) & (ka[pos_c] == kb) if len(ka) else np.zeros(len(kb), bool)
    inter = np.zeros(n, dtype=np.int64)
    if hit.any():
        np.add.at(inter, (kb[hit] >> np.int64(44)).astype(np.int64), 1)
    return inter


def _score_batch(df: pd.DataFrame, col_a: str, col_b: str) -> pd.DataFrame:
    out = df.drop(columns=[col_a, col_b])
    if not len(df):
        for c in (
            "jaccard_ppm",
            "overlap_ppm",
            "cosine_ppm",
            "pearson_ppm",
            "euclidean_distance_q",
            "euclidean_sim_ppm",
        ):
            out[c] = pd.Series([], dtype=np.int64)
        return out
    a = _quant(df[col_a].to_numpy())
    b = _quant(df[col_b].to_numpy())
    n_rows, d = a.shape
    af = a.astype(np.float64)
    bf = b.astype(np.float64)

    s_ab = (a * b).sum(axis=1)
    s_aa = (a * a).sum(axis=1)
    s_bb = (b * b).sum(axis=1)
    s_a = a.sum(axis=1)
    s_b = b.sum(axis=1)
    d2 = ((a - b) ** 2).sum(axis=1)

    # cosine: floor(1e6 * Σab / sqrt(double(Σa²)·double(Σb²)))
    den_cos = np.sqrt(s_aa.astype(np.float64) * s_bb.astype(np.float64))
    with np.errstate(divide="ignore", invalid="ignore"):
        cos = np.floor(1_000_000.0 * s_ab.astype(np.float64) / den_cos)
    cos = np.where(den_cos == 0.0, 0.0, cos)

    # pearson: floor(1e6 * (nΣab−ΣaΣb) / sqrt(double(nΣa²−(Σa)²)·double(nΣb²−(Σb)²)))
    nn = np.int64(d)
    cov = (nn * s_ab - s_a * s_b).astype(np.float64)
    vx = (nn * s_aa - s_a * s_a).astype(np.float64)
    vy = (nn * s_bb - s_b * s_b).astype(np.float64)
    den_p = np.sqrt(vx * vy)
    with np.errstate(divide="ignore", invalid="ignore"):
        pea = np.floor(1_000_000.0 * cov / den_p)
    pea = np.where(den_p == 0.0, 0.0, pea)

    dist = np.sqrt(d2.astype(np.float64))
    edist = np.floor(dist)  # distance in milli-units
    esim = np.floor(1_000_000_000.0 / (1000.0 + dist))

    inter_m = _multiset_intersections(a, b)
    union = 2 * d - inter_m  # len1 + len2 − intersection (fixed width d)
    jac = np.where(union > 0, (1_000_000 * inter_m) // np.maximum(union, 1),
                   1_000_000)
    inter_d = _distinct_intersections(a, b)
    ov = (1_000_000 * inter_d) // d  # min(len1, len2) == d (fixed width)

    out["jaccard_ppm"] = jac.astype(np.int64)
    out["overlap_ppm"] = ov.astype(np.int64)
    out["cosine_ppm"] = cos.astype(np.int64)
    out["pearson_ppm"] = pea.astype(np.int64)
    out["euclidean_distance_q"] = edist.astype(np.int64)
    out["euclidean_sim_ppm"] = esim.astype(np.int64)
    return out


def vector_similarity(
    pairs: rd.Dataset, col_a: str = "vec_a", col_b: str = "vec_b"
) -> rd.Dataset:
    """Score every row's two equal-length vector columns with all six
    reference similarity functions; passthrough of the other columns.

    Output int64 columns: jaccard_ppm, overlap_ppm, cosine_ppm,
    pearson_ppm, euclidean_distance_q (milli-units), euclidean_sim_ppm.
    """
    return pairs.map_batches(
        _score_batch, batch_format="pandas",
        fn_kwargs={"col_a": col_a, "col_b": col_b},
    )

"""Property scaling — the reference's scale-properties operator family.

Reference: scaleproperties/ScaleProperties.java:52 with scaler
implementations under algo-common/src/main/java/org/neo4j/gds/scaling/
(MinMax, Mean, Max, Log, Center, L1Norm, L2Norm, StdScore). Two-pass
shape: a (grouped) statistics aggregate, then a vectorized map_batches
applying the scaler with the broadcast stats.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd
from ray.data.aggregate import Max, Mean, Min, Std


_SCALERS = ("minmax", "mean", "max", "log", "center", "stdscore", "l1norm", "l2norm")


def scale_column(
    ds: rd.Dataset,
    value_col: str,
    scaler: str = "minmax",
    group_col: str | None = None,
    out_col: str = "scaled",
    round_to: int | None = 6,
) -> rd.Dataset:
    """Scale ``value_col``, optionally per ``group_col`` partition.

    minmax: (x-min)/(max-min); mean: (x-mean)/(max-min); max: x/|max|;
    log: ln(x); center: x-mean; stdscore: (x-mean)/std (population std);
    l1norm: x/sum(|x|); l2norm: x/sqrt(sum(x²)) (reference
    algo-common/.../scaling/L1Norm.java, L2Norm.java).
    Degenerate denominators (max==min, std==0, zero norm) map to 0 —
    matching the reference scalers' zero-fallback behavior.
    """
    from ray.data.aggregate import Sum

    if scaler not in _SCALERS:
        raise ValueError(f"unknown scaler {scaler!r}; one of {_SCALERS}")
    src = ds
    aggs = [
        Min(value_col, alias_name="_min"),
        Max(value_col, alias_name="_max"),
        Mean(value_col, alias_name="_mean"),
        Std(value_col, alias_name="_std", ddof=0),
    ]
    if scaler in ("l1norm", "l2norm"):
        def _norm_cols(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            x = df[value_col].to_numpy(dtype=np.float64)
            df["_absv"] = np.abs(x)
            df["_sqv"] = x * x
            return df

        src = ds.map_batches(_norm_cols, batch_format="pandas")
        aggs += [Sum("_absv", alias_name="_l1"), Sum("_sqv", alias_name="_sq")]
    if group_col is not None:
        stats = src.groupby(group_col).aggregate(*aggs).to_pandas().set_index(group_col)
    else:
        row = src.aggregate(*aggs)
        stats = pd.DataFrame([row])
    stats_ref = ray.put(stats)

    def apply(batch: pd.DataFrame) -> pd.DataFrame:
        st = ray.get(stats_ref)
        x = batch[value_col].to_numpy(dtype=np.float64)
        if group_col is not None:
            sub = st.reindex(batch[group_col])
            mn = sub["_min"].to_numpy()
            mx = sub["_max"].to_numpy()
            mean = sub["_mean"].to_numpy()
            std = sub["_std"].to_numpy()
            l1 = sub["_l1"].to_numpy() if "_l1" in sub else None
            sq = sub["_sq"].to_numpy() if "_sq" in sub else None
        else:
            mn, mx = st["_min"].iloc[0], st["_max"].iloc[0]
            mean, std = st["_mean"].iloc[0], st["_std"].iloc[0]
            l1 = st["_l1"].iloc[0] if "_l1" in st else None
            sq = st["_sq"].iloc[0] if "_sq" in st else None
        rng = mx - mn
        if scaler == "minmax":
            y = np.where(rng != 0, (x - mn) / np.where(rng != 0, rng, 1), 0.0)
        elif scaler == "mean":
            y = np.where(rng != 0, (x - mean) / np.where(rng != 0, rng, 1), 0.0)
        elif scaler == "max":
            amax = np.abs(mx)
            y = np.where(amax != 0, x / np.where(amax != 0, amax, 1), 0.0)
        elif scaler == "log":
            y = np.log(np.maximum(x, 1e-300))
        elif scaler == "center":
            y = x - mean
        elif scaler == "l1norm":
            y = np.where(l1 != 0, x / np.where(l1 != 0, l1, 1), 0.0)
        elif scaler == "l2norm":
            nrm = np.sqrt(sq)
            y = np.where(nrm != 0, x / np.where(nrm != 0, nrm, 1), 0.0)
        else:  # stdscore
            y = np.where(std != 0, (x - mean) / np.where(std != 0, std, 1), 0.0)
        out = batch.copy()
        out[out_col] = np.round(y, round_to) if round_to is not None else y
        return out

    return ds.map_batches(apply, batch_format="pandas", batch_size=16384)


def scale_embedding(
    ds: rd.Dataset,
    value_col: str = "embedding",
    scaler: str = "minmax",
    out_col: str = "scaled",
) -> rd.Dataset:
    """Elementwise scaling of a ``list<float>`` property — the reference
    ScaleProperties on LIST-typed node properties
    (algo/.../scaleproperties/ScaleProperties.java: per-dimension scaler
    instances over array properties).

    Two-pass: per-batch per-dimension partials (min/max/sum/sumsq/count)
    reduce on the driver (dims ≪ rows — O(dim) driver state), the tiny
    stats matrix broadcasts back, and the apply pass rewrites the list
    column. ``minmax`` / ``max`` / ``center`` use only min/max extremes
    (order-independent, exactly SQL-reproducible); ``stdscore`` uses
    float sums (deterministic for a fixed partial order, compared in
    pytest not SQL).
    """
    import ray

    if scaler not in ("minmax", "max", "center", "stdscore"):
        raise ValueError(f"unsupported list scaler {scaler!r}")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):  # empty block (e.g. after an upstream filter)
            return pd.DataFrame(
                {"_mn": [], "_mx": [], "_sum": [], "_sq": [], "_cnt": []}
            )
        m = np.stack([np.asarray(v, dtype=np.float64) for v in df[value_col]])
        return pd.DataFrame(
            {
                "_mn": [m.min(axis=0)],
                "_mx": [m.max(axis=0)],
                "_sum": [m.sum(axis=0)],
                "_sq": [(m * m).sum(axis=0)],
                "_cnt": [len(m)],
            }
        )

    parts = ds.map_batches(partial, batch_size=4096, batch_format="pandas").to_pandas()
    mn = np.min(np.stack(parts["_mn"].to_list()), axis=0)
    mx = np.max(np.stack(parts["_mx"].to_list()), axis=0)
    total = np.sum(np.stack(parts["_sum"].to_list()), axis=0)
    sq = np.sum(np.stack(parts["_sq"].to_list()), axis=0)
    cnt = int(parts["_cnt"].sum())
    mean = total / max(cnt, 1)
    # population std from the two-pass sums (reference StdScore)
    var = np.maximum(sq / max(cnt, 1) - mean * mean, 0.0)
    std = np.sqrt(var)
    stats_ref = ray.put((mn, mx, mean, std))

    def apply(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            out = df.copy()
            out[out_col] = []
            return out
        lo, hi, mu, sd = ray.get(stats_ref)
        m = np.stack([np.asarray(v, dtype=np.float64) for v in df[value_col]])
        if scaler == "minmax":
            span = hi - lo
            s = np.where(span > 0, (m - lo) / np.where(span > 0, span, 1.0), 0.0)
        elif scaler == "max":
            am = np.abs(hi)
            s = np.where(am > 0, m / np.where(am > 0, am, 1.0), 0.0)
        elif scaler == "center":
            s = m - mu
        else:  # stdscore: (x - mean) / population std, 0 on zero std
            s = np.where(sd > 0, (m - mu) / np.where(sd > 0, sd, 1.0), 0.0)
        out = df.copy()
        out[out_col] = [r for r in s]
        return out

    return ds.map_batches(apply, batch_size=4096, batch_format="pandas")


def pca_power(
    embeddings: rd.Dataset,
    rounds: int = 8,
    quant: int = 4096,
    vec_scale: int = 16384,
    norm_shift: int = 16,
    num_parts: int = 16,
) -> pd.DataFrame:
    """Top principal component by integer-exact power iteration.

    Every arithmetic step is integer (after one initial quantization
    ``q = floor(x·quant)`` per coordinate), so the result is bit-exact
    across any parallelism level AND verbatim-reproducible by an ANSI-SQL
    oracle — the ``eigenvector_exact`` contract lifted to embeddings:

    1. quantize each coordinate (the ONLY float op, identical on both
       sides: float64 multiply then floor);
    2. integer column sums → integer floor-division means ``m``;
    3. exact centered scatter ``C = Σ (q−m)(q−m)ᵀ`` (distributed d×d
       partial matmuls, hash-aggregated per cell);
    4. ``C' = C ÷ max(1, max|C| >> norm_shift)`` (floor division), then
       ``rounds`` fixed iterations ``v ← floor(C'v · vec_scale /
       max|C'v|)`` from the all-ones vector.

    Overflow headroom (int64): |q−m| ≤ 2·quant, so |C| ≤ 4·quant²·n —
    safe to n ≈ 2^37 rows at the default quant; after the ÷ step every
    iterate term is ≤ d·2^17·vec_scale ≈ 2^37.

    Scale shape: two streaming passes over the embedding table (sum
    pass, centered-product pass with the d-vector mean broadcast); the
    driver reduces only d and d² integer cells, then iterates on a d×d
    matrix.  Returns the answer-sized ``(dim, v)`` frame (d rows).
    """
    from graph_data_science_ray.pipelines.agg import hash_aggregate

    qf = float(quant)

    def sum_partial(df: pd.DataFrame) -> pd.DataFrame:
        x = np.stack(
            [np.asarray(v, dtype=np.float64) for v in df["embedding"]]
        )
        q = np.floor(x * qf).astype(np.int64)
        d = q.shape[1]
        return pd.DataFrame(
            {
                "dim": np.arange(d, dtype=np.int64),
                "s": q.sum(axis=0),
            }
        )

    n = int(embeddings.count() or 0)  # metadata-only on parquet reads
    stats = hash_aggregate(
        embeddings.map_batches(sum_partial, batch_format="pandas"),
        ["dim"], "s", op="sum", num_parts=num_parts,
    ).to_pandas().sort_values("dim")
    d = len(stats)
    if d == 0 or n == 0:
        return pd.DataFrame(
            {"dim": pd.Series([], dtype=np.int64),
             "v": pd.Series([], dtype=np.int64)}
        )
    m = stats["s"].to_numpy(dtype=np.int64) // n  # floor division
    mref = ray.put(m)

    def scatter_partial(df: pd.DataFrame) -> pd.DataFrame:
        mm = ray.get(mref)
        x = np.stack(
            [np.asarray(v, dtype=np.float64) for v in df["embedding"]]
        )
        qc = np.floor(x * qf).astype(np.int64) - mm[None, :]
        c = qc.T @ qc  # (d, d) int64, exact
        dd = c.shape[0]
        i, j = np.meshgrid(
            np.arange(dd, dtype=np.int64),
            np.arange(dd, dtype=np.int64),
            indexing="ij",
        )
        return pd.DataFrame(
            {"i": i.ravel(), "j": j.ravel(), "cv": c.ravel()}
        )

    cells = hash_aggregate(
        embeddings.map_batches(scatter_partial, batch_format="pandas"),
        ["i", "j"], "cv", op="sum", num_parts=num_parts,
    ).to_pandas()
    c = np.zeros((d, d), dtype=np.int64)
    c[cells["i"].to_numpy(dtype=np.int64), cells["j"].to_numpy(dtype=np.int64)] = (
        cells["cv"].to_numpy(dtype=np.int64)
    )

    den = max(1, int(np.abs(c).max()) >> norm_shift)
    cn = c // den  # floor division, both signs
    v = np.full(d, int(vec_scale), dtype=np.int64)
    for _ in range(int(rounds)):
        w = cn @ v
        mx = int(np.abs(w).max())
        if mx == 0:
            break
        v = (w * int(vec_scale)) // mx
    return pd.DataFrame({"dim": np.arange(d, dtype=np.int64), "v": v})

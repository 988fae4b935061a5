"""K-Means over node property vectors (the embeddings table).

Reference: algo/src/main/java/org/neo4j/gds/kmeans/Kmeans.java:40 —
K-means on node property vectors, not topology. Classic Ray Data shape:
``map_batches`` assignment (one numpy matmul per batch against broadcast
centroids) + per-batch partial sums → driver combine → new centroids.

Determinism: centroids init from the K smallest vec_ids (the reference
seeds from sampled nodes; we pin the sample), fixed iteration count,
ties broken by the lower centroid index.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd


def _stack(col) -> np.ndarray:
    return np.stack([np.asarray(v, dtype=np.float64) for v in col])


def kmeans(
    embeddings: rd.Dataset,
    k: int = 8,
    iterations: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Lloyd iterations; returns (vec_id, cluster).

    Assignment: nearest centroid by squared euclidean distance, ties to
    the lower centroid index.
    """
    first = (
        embeddings.filter(expr=f"{id_col} < {k}").to_pandas().sort_values(id_col)
    )
    centroids = _stack(first[vec_col])

    for it in range(iterations + 1):
        cref = ray.put(centroids)
        last = it == iterations

        def assign(batch: pd.DataFrame, *, cref=cref, last=last) -> pd.DataFrame:
            c = ray.get(cref)
            x = _stack(batch[vec_col])
            # squared distances via ||x||^2 - 2 x.c + ||c||^2
            d2 = (
                (x * x).sum(axis=1, keepdims=True)
                - 2.0 * x @ c.T
                + (c * c).sum(axis=1)[None, :]
            )
            lab = np.argmin(d2, axis=1).astype(np.int64)  # argmin takes first tie
            out = {"vec_id": batch[id_col].to_numpy(dtype=np.int64), "cluster": lab}
            if not last:
                # partial sums per cluster for the centroid update
                sums = np.zeros((c.shape[0], x.shape[1]))
                np.add.at(sums, lab, x)
                cnt = np.bincount(lab, minlength=c.shape[0])
                out = {
                    "cluster": np.arange(c.shape[0], dtype=np.int64),
                    "sum": list(sums),
                    "cnt": cnt.astype(np.int64),
                }
            return pd.DataFrame(out)

        res = embeddings.map_batches(assign, batch_format="pandas").to_pandas()
        if last:
            return res.sort_values("vec_id").reset_index(drop=True)
        sums = np.zeros_like(centroids)
        cnts = np.zeros(len(centroids), dtype=np.int64)
        lab = res["cluster"].to_numpy(dtype=np.int64)
        np.add.at(sums, lab, np.stack([np.asarray(s) for s in res["sum"]]))
        np.add.at(cnts, lab, res["cnt"].to_numpy(dtype=np.int64))
        keep = cnts > 0
        centroids = np.where(
            keep[:, None], sums / np.maximum(cnts, 1)[:, None], centroids
        )
    raise AssertionError("unreachable")


def kmeans_assign_fixed(
    embeddings: rd.Dataset, k: int = 8, id_col: str = "vec_id", vec_col: str = "embedding"
) -> pd.DataFrame:
    """Single assignment pass against the fixed first-K centroids.

    The SQL-oracle-checkable core of the algorithm (the iterative update
    is covered by unit tests and the rows-only ``kmeans`` query).
    """
    return kmeans(embeddings, k=k, iterations=0, id_col=id_col, vec_col=vec_col)

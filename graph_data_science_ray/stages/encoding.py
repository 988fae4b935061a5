"""Feature-encoding stages: one-hot and scaler composition.

Reference: alpha/alpha-proc/src/main/java/org/neo4j/gds/functions/OneHotEncodingFunc.java
(one-hot over a categorical list) and the scale-properties scaler family
(see stages.scale). Pure vectorized ``map_batches``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd


def one_hot(
    ds: rd.Dataset,
    column: str,
    categories: list | None = None,
    out_col: str | None = None,
) -> rd.Dataset:
    """Encode a categorical column as a fixed-order 0/1 list column.

    ``categories`` defaults to the sorted distinct values (one extra
    shuffle); unknown values encode as all-zero, mirroring the
    reference's behavior for values outside the declared list.
    """
    if categories is None:
        categories = sorted(ds.unique(column))
    cats = np.asarray(categories)
    cref = ray.put(cats)
    out_col = out_col or f"{column}_onehot"

    def encode(df: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(cref)
        idx = np.searchsorted(c, df[column].to_numpy())
        idx = np.minimum(idx, len(c) - 1)
        hit = c[idx] == df[column].to_numpy()
        mat = np.zeros((len(df), len(c)), dtype=np.int8)
        mat[np.flatnonzero(hit), idx[hit]] = 1
        out = df.copy()
        out[out_col] = [row for row in mat]
        return out

    return ds.map_batches(encode, batch_format="pandas")

"""Integer power-iteration PCA: direction correctness vs numpy eigh,
and bit-exactness across block layouts."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def _emb(n=400, d=8, seed=3):
    rng = np.random.default_rng(seed)
    # strongly anisotropic cloud: dominant direction u
    u = rng.normal(size=d)
    u /= np.linalg.norm(u)
    x = rng.normal(size=(n, 1)) * 3.0 * u[None, :] + 0.1 * rng.normal(
        size=(n, d)
    )
    return x.astype(np.float32)


def _ds(x, parallelism=4):
    t = pa.table({
        "vec_id": pa.array(range(len(x)), pa.int64()),
        "embedding": pa.array([row.tolist() for row in x],
                              pa.list_(pa.float32())),
    })
    return rd.from_arrow(t).repartition(parallelism)


def test_pca_power_matches_eigh_direction():
    from graph_data_science_ray.stages.scale import pca_power

    x = _emb()
    out = pca_power(_ds(x)).sort_values("dim")
    v = out["v"].to_numpy(dtype=np.float64)
    v /= np.linalg.norm(v)
    xc = x.astype(np.float64) - x.astype(np.float64).mean(axis=0)
    evals, evecs = np.linalg.eigh(xc.T @ xc)
    top = evecs[:, -1]
    assert abs(float(v @ top)) > 0.999


def test_pca_power_block_layout_invariant():
    from graph_data_science_ray.stages.scale import pca_power

    x = _emb(n=200, d=6, seed=9)
    a = pca_power(_ds(x, parallelism=1)).sort_values("dim")
    b = pca_power(_ds(x, parallelism=7)).sort_values("dim")
    assert a["v"].tolist() == b["v"].tolist()

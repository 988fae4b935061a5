"""Memory estimation + one-hot encoding."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from graph_data_science_ray.estimate import check_fits, estimate
from graph_data_science_ray.stages.encoding import one_hot


def test_estimate_scales_with_graph():
    small = estimate("pagerank", 1_000, 10_000).total(1_000, 10_000)
    big = estimate("pagerank", 1_000_000, 100_000_000).total(1_000_000, 100_000_000)
    assert big > small
    # 100M-edge PageRank ~ CSR-dominated, order GBs
    assert 10**9 < big < 10**11


def test_estimate_unknown_algorithm():
    with pytest.raises(ValueError):
        estimate("does_not_exist", 1, 1)


def test_check_fits_explicit_budget():
    ok, est = check_fits("wcc", 1000, 5000, available_bytes=10**12)
    assert ok and est > 0
    ok2, _ = check_fits("wcc", 10**9, 10**12, available_bytes=10**6)
    assert not ok2


def test_one_hot():
    ds = rd.from_arrow(
        pa.table({"id": pa.array([0, 1, 2, 3], pa.int64()),
                  "lang": pa.array(["en", "de", "en", "xx"])})
    )
    out = one_hot(ds, "lang", categories=["de", "en", "es"]).to_pandas().sort_values("id")
    mats = np.stack(out["lang_onehot"].to_numpy())
    assert mats.tolist() == [[0, 1, 0], [1, 0, 0], [0, 1, 0], [0, 0, 0]]

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


def test_graph_catalog_lifecycle(graph_from_edges, tmp_path):
    """Named catalog (reference GraphStoreCatalog): set/get/list/drop/
    exists, survives reload from disk, drop reclaims owned payloads."""
    import graph_data_science_ray as gdsr

    gd, gu, idmap, enc, _ = graph_from_edges([(0, 1), (1, 2), (2, 0)])
    cat = gdsr.GraphCatalog(str(tmp_path / "cat"))
    assert not cat.exists("g1")
    cat.set("g1", gd)
    g2 = cat.project("g2", enc, idmap=idmap, num_partitions=2, directed=True)
    assert cat.exists("g1") and cat.exists("g2")
    listing = cat.list()
    assert list(listing["name"]) == ["g1", "g2"]
    assert (listing["edge_count"] > 0).all()
    # duplicate registration refused without overwrite
    with pytest.raises(ValueError):
        cat.set("g1", gd)
    # reload through a FRESH catalog object (registry is on disk)
    cat2 = gdsr.GraphCatalog(str(tmp_path / "cat"))
    got = cat2.get("g2")
    assert got.node_count == g2.node_count
    assert got.edge_count == g2.edge_count
    pr_a = gdsr.pagerank(g2, max_iterations=10)
    pr_b = gdsr.pagerank(got, max_iterations=10)
    assert pr_a.equals(pr_b)
    # drop removes registry entry; owned payload dir is reclaimed
    cat2.drop("g2")
    assert not cat2.exists("g2")
    assert not (tmp_path / "cat" / "g2").exists()
    # non-owned path (g1 lives outside the root) is never deleted
    cat2.drop("g1")
    assert gdsr.GraphStore.load(gd.path).edge_count == gd.edge_count
    with pytest.raises(KeyError):
        cat2.get("g1")

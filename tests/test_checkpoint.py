"""Checkpoint/resume + determinism contracts (north rule)."""

import os

import numpy as np

import graph_data_science_ray as gdsr
from tests.conftest import keys_to_ids

EDGES = [
    (1, 2), (2, 1), (3, 0), (3, 1), (4, 1), (4, 3), (4, 5), (5, 1), (5, 4),
    (6, 1), (6, 4), (7, 1), (7, 4), (8, 1), (8, 4), (9, 4), (10, 4),
]


def test_pagerank_resume_equals_uninterrupted(graph_from_edges, tmp_path):
    gd, _, _, _, _ = graph_from_edges(EDGES)
    full = gdsr.pagerank(gd, max_iterations=25)
    ck = str(tmp_path / "ck")
    gdsr.pagerank(gd, max_iterations=6, checkpoint_dir=ck)
    resumed = gdsr.pagerank(gd, max_iterations=25, checkpoint_dir=ck, resume=True)
    assert np.array_equal(full["score"].to_numpy(), resumed["score"].to_numpy())


def test_checkpoint_manifest_lineage(graph_from_edges, tmp_path):
    gd, _, _, _, _ = graph_from_edges(EDGES)
    ck = str(tmp_path / "ck2")
    gdsr.pagerank(gd, max_iterations=4, checkpoint_dir=ck)
    from graph_data_science_ray._util import read_json

    manifests = sorted(f for f in os.listdir(ck) if f.startswith("manifest-iter-"))
    assert manifests
    m = read_json(os.path.join(ck, manifests[-1]))
    assert {"iteration", "stats", "partitions"} <= set(m)
    for rec in m["partitions"]:
        assert {"iteration", "partition", "rows", "digest"} <= set(rec)
        assert len(rec["digest"]) == 32  # blake2b-16 hex
    assert os.path.exists(os.path.join(ck, "metrics.jsonl"))


def test_wcc_resume(graph_from_edges, tmp_path):
    _, gu, _, _, _ = graph_from_edges([(0, 1), (1, 2), (2, 3), (3, 4), (5, 6)])
    full = gdsr.wcc(gu)
    ck = str(tmp_path / "ck3")
    gdsr.wcc(gu, max_iterations=2, checkpoint_dir=ck)
    resumed = gdsr.wcc(gu, checkpoint_dir=ck, resume=True)
    assert np.array_equal(
        keys_to_ids(full["component"]), keys_to_ids(resumed["component"])
    )


def test_partition_count_invariance_close(graph_from_edges, tmp_path):
    """Different partition counts change float sum order only within the
    deterministic combine — results stay equal to tight tolerance."""
    gd3, _, idmap, enc, _ = graph_from_edges(EDGES, num_partitions=3)
    gd1 = gdsr.GraphStore.project(
        enc, str(tmp_path / "gp1"), idmap=idmap, num_partitions=1, directed=True
    )
    a = gdsr.pagerank(gd3, max_iterations=30)["score"].to_numpy()
    b = gdsr.pagerank(gd1, max_iterations=30)["score"].to_numpy()
    assert np.allclose(a, b, atol=1e-12)


def test_graphstore_load_roundtrip(graph_from_edges, tmp_path):
    gd, _, _, _, _ = graph_from_edges(EDGES)
    g2 = gdsr.GraphStore.load(gd.path)
    assert g2.node_count == gd.node_count
    assert g2.edge_count == gd.edge_count
    assert np.array_equal(g2.boundaries, gd.boundaries)
    a = gdsr.pagerank(gd, max_iterations=10)["score"].to_numpy()
    b = gdsr.pagerank(g2, max_iterations=10)["score"].to_numpy()
    assert np.array_equal(a, b)

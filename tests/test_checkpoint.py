"""Checkpoint/resume + determinism contracts (north rule)."""

import os

import numpy as np

import graph_data_science_ray as gdsr
import pytest
from graph_data_science_ray.state.pregel import Pregel, PregelComputation
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


def test_projection_skip_if_complete(graph_from_edges, tmp_path):
    import graph_data_science_ray as gdsr

    _, _, idmap, enc, _ = graph_from_edges(EDGES)
    p = str(tmp_path / "gskip")
    g1 = gdsr.GraphStore.project(enc, p, idmap=idmap, num_partitions=2)
    # second call with overwrite=False loads the committed projection
    g2 = gdsr.GraphStore.project(enc, p, idmap=idmap, num_partitions=2, overwrite=False)
    assert np.array_equal(g1.boundaries, g2.boundaries)
    assert g2.edge_count == g1.edge_count


def test_label_propagation_partition_invariance(graph_from_edges, tmp_path):
    """Vote-reducer determinism: identical labels at different partition
    counts (integer tallies, fixed tie-breaks)."""
    import graph_data_science_ray as gdsr

    gd3, gu3, idmap, enc, sym = graph_from_edges(EDGES, num_partitions=3)
    gu1 = gdsr.GraphStore.project(
        sym, str(tmp_path / "gu1"), idmap=idmap, num_partitions=1, directed=False
    )
    a = gdsr.label_propagation(gu3, max_iterations=10)
    b = gdsr.label_propagation(gu1, max_iterations=10)
    assert (a["label"].to_numpy() == b["label"].to_numpy()).all()


def test_hub_skew_partitioning_and_correctness(tmp_path):
    """A mega-hub gets isolated by degree-balanced boundaries; results stay
    exact. Destination-side hub pressure is bounded map-side: every source
    partition pre-reduces to at most ONE message per destination (the
    mirror-vertex/delta-merge math of the north star)."""
    import ray.data as rd
    import pyarrow as pa
    import graph_data_science_ray as gdsr

    # star: node 0 -> 1..400, plus a sparse ring over the leaves
    n = 401
    src = np.concatenate([np.zeros(400, dtype=np.int64), np.arange(1, n, dtype=np.int64)])
    dst = np.concatenate([np.arange(1, n, dtype=np.int64),
                          np.concatenate([np.arange(2, n), [1]]).astype(np.int64)])
    t = pa.table({"src": src, "dst": dst, "weight": np.ones(len(src))})
    g = gdsr.GraphStore.project(
        rd.from_arrow(t), str(tmp_path / "hub"), node_count=n, num_partitions=8
    )
    import ray

    blocks = ray.get(g.block_refs())
    per_part_edges = [len(b["indices"]) for b in blocks]
    # the hub partition holds its 400 edges; remaining partitions share the ring
    assert max(per_part_edges) <= 400 + 100
    res = gdsr.pagerank(g, max_iterations=30)
    scores = res.set_index("node")["score"]
    # all leaves are symmetric: identical scores
    assert scores.loc[1:].nunique() <= 2  # leaf 1 may differ (ring wrap target)


def test_scatter_mode_sliced_matches_flat(graph_from_edges):
    """Per-destination sliced scatter (the multi-node mode) must be
    byte-identical to the flat single-payload mode — same values combined
    in the same fixed partition order."""
    from graph_data_science_ray.functions.pagerank import PageRankComputation
    from graph_data_science_ray.state.pregel import Pregel

    gd, gu, _, _, _ = graph_from_edges(EDGES, num_partitions=3)
    res = {}
    for mode in ("flat", "sliced"):
        engine = Pregel(gd, PageRankComputation(), scatter_mode=mode)
        refs = engine.run(max_iterations=25)
        res[mode] = engine.gather(refs, "rank")
    assert np.array_equal(res["flat"], res["sliced"])

    import graph_data_science_ray as gdsr
    from graph_data_science_ray.functions.wcc import WccComputation

    comps = {}
    for mode in ("flat", "sliced"):
        engine = Pregel(gu, WccComputation(), scatter_mode=mode)
        refs = engine.run(max_iterations=50)
        comps[mode] = engine.gather(refs, "component")
    assert np.array_equal(comps["flat"], comps["sliced"])


@pytest.mark.parametrize("mode", ["flat", "sliced"])
def test_pregel_queue_messenger_median(graph_from_edges, mode):
    """reducer="queue" delivers RAW per-edge messages (reference
    SyncQueueMessenger semantics): per-node in-neighbor median, which no
    associative reducer can compute."""
    from graph_data_science_ray.functions.neighborhood import (
        MedianNeighborComputation,
    )
    from graph_data_science_ray.state.pregel import Pregel

    edges = [(0, 2), (1, 2), (3, 2), (4, 2), (0, 3), (1, 3), (2, 0),
             (4, 0), (3, 1)]
    gd, _, idmap, _, _ = graph_from_edges(edges, num_partitions=3)
    vals = np.arange(5, dtype=np.float64) ** 2 + 1.0
    engine = Pregel(gd, MedianNeighborComputation(vals), scatter_mode=mode)
    refs = engine.run(max_iterations=2)
    med = engine.gather(refs, "median")
    import collections
    inn = collections.defaultdict(list)
    for s, d in set(edges):
        inn[d].append(float(s * s + 1.0))
    for v in range(5):
        if inn[v]:
            assert med[v] == float(np.median(inn[v])), (v, med[v])
        else:
            assert np.isnan(med[v])


def test_master_compute_halts(graph_from_edges):
    """masterCompute contract: returning True after a superstep halts the
    run before natural convergence (reference
    BasePregelComputation.masterCompute)."""
    from graph_data_science_ray.functions.wcc import WccComputation
    from graph_data_science_ray.state.pregel import Pregel

    class HaltAt3(WccComputation):
        def master_compute(self, stats, superstep):
            return superstep >= 3

    # long path: WCC needs ~n supersteps to converge naturally
    edges = [(i, i + 1) for i in range(12)]
    _, gu, idmap, _, _ = graph_from_edges(edges)

    full = Pregel(gu, WccComputation())
    full.run(max_iterations=100)
    n_full = len(full.history)

    halted = Pregel(gu, HaltAt3())
    halted.run(max_iterations=100)
    assert len(halted.history) == 3  # supersteps 1..3, then master halt
    assert n_full > 3

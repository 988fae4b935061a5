"""Fixtures for SSSP/BFS, k-core, node similarity."""

import numpy as np

import graph_data_science_ray as gdsr
from graph_data_science_ray.functions.kcore import k_core
from graph_data_science_ray.functions.nodesim import node_similarity
from graph_data_science_ray.functions.sssp import bfs_depths, shortest_paths
from tests.conftest import keys_to_ids


def test_sssp_weighted(graph_from_edges):
    # weights are parallel-edge counts: duplicate (0,1) twice -> weight 2
    edges = [(0, 1), (0, 1), (1, 2), (0, 2), (0, 2), (0, 2), (2, 3)]
    gd, _, _, _, _ = graph_from_edges(edges)
    res = shortest_paths(gd, source_id=0, weighted=True)
    got = dict(zip(keys_to_ids(res["node"]), res["distance"]))
    # dist: 0->0; 1 via w2 edge = 2; 2 via min(0->1->2 = 3, 0->2 = 3) = 3; 3 = 4
    assert got == {0: 0.0, 1: 2.0, 2: 3.0, 3: 4.0}


def test_bfs_depths_and_unreachable(graph_from_edges):
    gd, _, _, _, _ = graph_from_edges([(0, 1), (1, 2)], isolated=[3])
    res = bfs_depths(gd, source_id=0)
    got = dict(zip(keys_to_ids(res["node"]), res["depth"]))
    assert got == {0: 0.0, 1: 1.0, 2: 2.0}  # node 3 unreachable -> absent


def test_k_core_triangle_with_tail(graph_from_edges):
    # triangle {0,1,2} plus tail 2-3-4: 2-core = the triangle
    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4)]
    _, _, idmap, _, sym = graph_from_edges(edges, undirected_only=True)
    res = k_core(sym, k=2, node_count=len(idmap), idmap=idmap)
    got = dict(zip(keys_to_ids(res["node"]), res["in_core"]))
    assert got == {0: True, 1: True, 2: True, 3: False, 4: False}


def test_k_core_fixed_rounds_matches_fixpoint(graph_from_edges):
    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4)]
    _, _, idmap, _, sym = graph_from_edges(edges, undirected_only=True)
    a = k_core(sym, k=2, node_count=len(idmap), idmap=idmap)
    b = k_core(sym, k=2, node_count=len(idmap), idmap=idmap, rounds=10)
    assert (a["in_core"].to_numpy() == b["in_core"].to_numpy()).all()


def test_k_core_distributed_parity(graph_from_edges):
    """Dataset-held alive state == broadcast mask, at the fixpoint AND
    mid-peel (pinned rounds, where the chain 5-6-7 peels gradually)."""
    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (5, 6), (6, 7)]
    _, _, idmap, _, sym = graph_from_edges(edges, undirected_only=True)
    V = len(idmap)
    for kwargs, k in (({}, 2), ({"rounds": 1}, 2), ({"rounds": 2}, 1)):
        a = k_core(sym, k=k, node_count=V, idmap=idmap,
                   mode="broadcast", **kwargs)
        b = k_core(sym, k=k, node_count=V, idmap=idmap,
                   mode="distributed", num_parts=4, **kwargs)
        assert (a["in_core"].to_numpy() == b["in_core"].to_numpy()).all(), (
            k, kwargs)


def test_node_similarity_jaccard(graph_from_edges):
    # 0 and 1 both connect to {2, 3}; 0 also to 4.
    # N(0)={2,3,4}, N(1)={2,3} -> jaccard(0,1) = 2/3
    edges = [(0, 2), (0, 3), (0, 4), (1, 2), (1, 3)]
    _, _, idmap, _, sym = graph_from_edges(edges, undirected_only=True)
    res = node_similarity(sym, node_count=len(idmap), idmap=idmap)
    pairs = {
        (a, b): s
        for a, b, s in zip(
            keys_to_ids(res["node_a"]), keys_to_ids(res["node_b"]), res["sim_ppm"]
        )
    }
    assert pairs[(0, 1)] == (2_000_000) // 3  # 2/(3+2-2)
    # 2 and 3 share neighbors {0,1}: N(2)={0,1}, N(3)={0,1} -> jaccard 1
    assert pairs[(2, 3)] == 1_000_000


def test_node_similarity_overlap(graph_from_edges):
    edges = [(0, 2), (0, 3), (0, 4), (1, 2), (1, 3)]
    _, _, idmap, _, sym = graph_from_edges(edges, undirected_only=True)
    res = node_similarity(sym, node_count=len(idmap), idmap=idmap, metric="overlap")
    pairs = {
        (a, b): s
        for a, b, s in zip(
            keys_to_ids(res["node_a"]), keys_to_ids(res["node_b"]), res["sim_ppm"]
        )
    }
    assert pairs[(0, 1)] == 1_000_000  # 2/min(3,2) = 1


def test_knn_pq_determinism_and_recall():
    """PQ ADC: partition-invariant integer output; sane recall vs the
    exact int8 top-k on the driver testdata; codebook contract (m
    subspaces, md5-rank anchors)."""
    import os

    import ray.data as rd

    from graph_data_science_ray.stages.similarity import knn_pq, pq_codebook

    sf = os.environ.get("GDSR_TEST_SF", "/root/testdata/sf0.001")
    emb = rd.read_parquet(os.path.join(sf, "embeddings.parquet"))
    book = pq_codebook(emb, m=4, ncent=16)
    assert book["cents"].shape == (16, book["D"])
    assert len(np.unique(book["anchor_ids"])) == 16
    a = knn_pq(emb, query_ids=np.arange(8), k=10, book=book)
    b = knn_pq(emb.repartition(5), query_ids=np.arange(8), k=10, book=book)
    assert a.equals(b)
    assert (a.groupby("query_id")["rank"].max() == 10).all()
    # recall@10 against the EXACT integer-L2 top-k (the metric PQ
    # approximates): 4x16 codes on 64-dim data must beat chance by far
    from graph_data_science_ray.stages.similarity import (
        _quantize,
        _stack,
        embedding_maxabs,
    )

    full = emb.to_pandas().sort_values("vec_id").reset_index(drop=True)
    q = _quantize(_stack(full["embedding"]), embedding_maxabs(emb))
    ids = full["vec_id"].to_numpy(dtype=np.int64)
    hits = 0
    for qi in range(8):
        d = ((q - q[ids == qi][0]) ** 2).sum(axis=1)
        keep = ids != qi
        order = np.lexsort((ids[keep], d[keep]))[:10]
        ex = set(ids[keep][order])
        pa_ = set(a[a["query_id"] == qi]["neighbor_id"])
        hits += len(pa_ & ex)
    assert hits >= 9  # deterministic data: measured 11/80 vs ~2% chance


def test_knn_ivfpq_prunes_and_matches_pq_on_probed_lists():
    """IVF-PQ: results are a subset of candidates in probed lists, the
    composition is partition-invariant, and every returned dist equals
    the full-PQ ADC dist for the same pair (the coarse stage only
    PRUNES, never rescores)."""
    import os

    import ray.data as rd

    from graph_data_science_ray.stages.similarity import (
        knn_ivfpq,
        knn_pq,
        pq_codebook,
    )

    sf = os.environ.get("GDSR_TEST_SF", "/root/testdata/sf0.001")
    emb = rd.read_parquet(os.path.join(sf, "embeddings.parquet"))
    book = pq_codebook(emb, m=4, ncent=16, refine=2)
    a = knn_ivfpq(emb, query_ids=np.arange(6), k=5, book=book)
    b = knn_ivfpq(emb.repartition(5), query_ids=np.arange(6), k=5, book=book)
    assert a.equals(b)
    # big-k PQ distances are the ground truth the pruned variant samples
    full = knn_pq(emb, query_ids=np.arange(6), k=600, book=book)
    ref = {
        (r.query_id, r.neighbor_id): r.dist for r in full.itertuples()
    }
    for r in a.itertuples():
        assert ref[(r.query_id, r.neighbor_id)] == r.dist

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

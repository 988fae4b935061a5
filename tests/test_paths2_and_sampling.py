"""Betweenness, MST, path reconstruction, RWR sampling fixtures."""

import numpy as np
import pytest

import graph_data_science_ray as gdsr
from graph_data_science_ray.functions.betweenness import betweenness
from graph_data_science_ray.functions.spanning import minimum_spanning_forest
from graph_data_science_ray.functions.sssp import shortest_path_route
from graph_data_science_ray.functions.walks import rwr_sample
from graph_data_science_ray.pipelines.transforms import reverse_edges
from tests.conftest import keys_to_ids


def _fwd_rev(graph_from_edges, edges, tmp_path, undirected=False):
    gd, gu, idmap, enc, sym = graph_from_edges(edges)
    base = gu if undirected else gd
    src = sym if undirected else enc
    grev = gdsr.GraphStore.project(
        reverse_edges(src), str(tmp_path / "rev"), idmap=idmap,
        directed=True, boundaries=base.boundaries,
    )
    return base, grev, idmap, enc, sym


def test_betweenness_path_graph(graph_from_edges, tmp_path):
    # undirected path 0-1-2-3-4: betweenness (both directions summed):
    # node2 = 4 pairs... undirected Brandes counts each ordered pair
    base, grev, idmap, _, _ = _fwd_rev(
        graph_from_edges, [(0, 1), (1, 2), (2, 3), (3, 4)], tmp_path, undirected=True
    )
    res = betweenness(base, grev)
    got = dict(zip(keys_to_ids(res["node"]), res["betweenness"]))
    # ordered-pair counts: node1 on paths {0<->2,0<->3,0<->4} = 6;
    # node2 on {0,1}x{3,4} = 8; symmetric
    assert got[0] == pytest.approx(0.0)
    assert got[1] == pytest.approx(6.0)
    assert got[2] == pytest.approx(8.0)
    assert got[3] == pytest.approx(6.0)
    assert got[4] == pytest.approx(0.0)


def test_betweenness_star(graph_from_edges, tmp_path):
    base, grev, idmap, _, _ = _fwd_rev(
        graph_from_edges, [(0, 1), (0, 2), (0, 3)], tmp_path, undirected=True
    )
    res = betweenness(base, grev)
    got = dict(zip(keys_to_ids(res["node"]), res["betweenness"]))
    assert got[0] == pytest.approx(6.0)  # 3*2 ordered pairs
    assert got[1] == got[2] == got[3] == pytest.approx(0.0)


def test_mst_weights(graph_from_edges):
    # square 0-1-2-3-0 with weights (via parallel-edge multiplicity):
    # (0,1)=1, (1,2)=1, (2,3)=1, (3,0)=3 -> MST drops the heavy edge
    edges = [(0, 1), (1, 2), (2, 3)] + [(3, 0)] * 3
    _, _, idmap, _, sym = graph_from_edges(edges, undirected_only=True)
    tree, total = minimum_spanning_forest(sym, node_count=len(idmap))
    assert total == 3.0
    pairs = set(zip(tree["src"], tree["dst"]))
    assert pairs == {(0, 1), (1, 2), (2, 3)}


def test_mst_forest_disconnected(graph_from_edges):
    edges = [(0, 1), (1, 2), (3, 4)]
    _, _, idmap, _, sym = graph_from_edges(edges, undirected_only=True)
    tree, total = minimum_spanning_forest(sym, node_count=len(idmap))
    assert len(tree) == 3 and total == 3.0  # spanning forest


def test_shortest_path_route(graph_from_edges):
    # 0->1->2->4 (w 1 each) vs 0->3->4 (w 2+2): route takes 3 hops of w1
    edges = [(0, 1), (1, 2), (2, 4)] + [(0, 3)] * 2 + [(3, 4)] * 2
    gd, _, idmap, _, _ = graph_from_edges(edges)
    route = shortest_path_route(gd, source_id=0, target_id=4, weighted=True)
    assert keys_to_ids(route["node"]).tolist() == [0, 1, 2, 4]
    assert route["distance"].tolist() == [0.0, 1.0, 2.0, 3.0]


def test_shortest_path_route_unreachable(graph_from_edges):
    gd, _, idmap, _, _ = graph_from_edges([(0, 1)], isolated=[2])
    route = shortest_path_route(gd, source_id=0, target_id=2)
    assert len(route) == 0


def test_dijkstra_route_matches_relaxation(graph_from_edges):
    """Heap Dijkstra == BSP relaxation route (same tie-breaking)."""
    from graph_data_science_ray.functions.paths import dijkstra_route

    edges = [(0, 1), (1, 2), (2, 4)] + [(0, 3)] * 2 + [(3, 4)] * 2
    gd, _, idmap, _, _ = graph_from_edges(edges)
    a = dijkstra_route(gd, source_id=0, target_id=4, weighted=True)
    b = shortest_path_route(gd, source_id=0, target_id=4, weighted=True)
    assert keys_to_ids(a["node"]).tolist() == keys_to_ids(b["node"]).tolist()
    assert a["distance"].tolist() == b["distance"].tolist()
    # denser graph with equal-cost ties: identical min-id route
    edges2 = [(i, j) for i in range(12) for j in range(12)
              if i != j and (i + j) % 3 == 0]
    gd2, _, _, _, _ = graph_from_edges(edges2, num_partitions=3)
    for tgt in (5, 7, 11):
        a = dijkstra_route(gd2, source_id=0, target_id=tgt)
        b = shortest_path_route(gd2, source_id=0, target_id=tgt)
        assert keys_to_ids(a["node"]).tolist() == keys_to_ids(b["node"]).tolist()
        assert a["distance"].tolist() == b["distance"].tolist()
    # unreachable
    gd3, _, _, _, _ = graph_from_edges([(0, 1)], isolated=[2])
    assert len(dijkstra_route(gd3, source_id=0, target_id=2)) == 0


def test_rwr_sample_deterministic_and_connected(graph_from_edges):
    edges = [(i, (i + 1) % 20) for i in range(20)] + [(i, (i + 7) % 20) for i in range(20)]
    _, gu, idmap, _, _ = graph_from_edges(edges, undirected_only=False)
    a = rwr_sample(gu, sample_size=10, seed=3)
    b = rwr_sample(gu, sample_size=10, seed=3)
    assert a.equals(b)
    assert len(a) == 10
    assert 0 in set(a["node_id"])  # start node always sampled


def test_haversine_heuristic_admissible_zero_at_target():
    from graph_data_science_ray.functions.paths import haversine_heuristic

    lat = np.array([48.8566, 51.5074, 40.7128])   # Paris, London, NYC
    lon = np.array([2.3522, -0.1278, -74.0060])
    h = haversine_heuristic(lat, lon, target_id=1)
    assert h[1] == 0.0
    assert 340 < h[0] < 350          # Paris-London ~344 km
    assert 5550 < h[2] < 5600        # NYC-London ~5570 km
    assert (h >= 0).all()

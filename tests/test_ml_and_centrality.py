"""K-means, FastRP, community metrics, closeness/harmonic fixtures."""

import itertools

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from graph_data_science_ray.functions.closeness import closeness_harmonic
from graph_data_science_ray.functions.community_metrics import conductance, modularity
from graph_data_science_ray.functions.fastrp import fastrp
from graph_data_science_ray.functions.kmeans import kmeans
from tests.conftest import keys_to_ids


def test_kmeans_separates_clusters():
    rng = np.random.default_rng(3)
    a = rng.standard_normal((20, 4)) + np.array([10, 0, 0, 0])
    b = rng.standard_normal((20, 4)) - np.array([10, 0, 0, 0])
    vecs = np.concatenate([a[:1], b[:1], a[1:], b[1:]])  # ids 0,1 seed the two clusters
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(40), pa.int64()),
                "embedding": pa.array([v.tolist() for v in vecs]),
            }
        )
    )
    res = kmeans(ds, k=2, iterations=5).set_index("vec_id")["cluster"]
    a_ids = [0] + list(range(2, 21))
    b_ids = [1] + list(range(21, 40))
    assert len(set(res[a_ids])) == 1
    assert len(set(res[b_ids])) == 1
    assert res[0] != res[1]


def test_modularity_two_cliques(graph_from_edges):
    k4a = list(itertools.combinations([0, 1, 2, 3], 2))
    k4b = list(itertools.combinations([4, 5, 6, 7], 2))
    _, _, idmap, _, sym = graph_from_edges(k4a + k4b, undirected_only=True)
    perfect = np.array([0, 0, 0, 0, 1, 1, 1, 1], dtype=np.int64)
    q_good = modularity(sym, perfect)
    assert q_good == pytest.approx(0.5, abs=1e-9)  # two disjoint equal cliques
    mixed = np.array([0, 1, 0, 1, 0, 1, 0, 1], dtype=np.int64)
    assert modularity(sym, mixed) < q_good


def test_conductance_split_clique(graph_from_edges):
    k4 = list(itertools.combinations([0, 1, 2, 3], 2))
    _, _, idmap, _, sym = graph_from_edges(k4, undirected_only=True)
    labels = np.array([0, 0, 1, 1], dtype=np.int64)
    out = conductance(sym, labels).set_index("community")["conductance_ppm"]
    # each side: volume 6 (3 edges x2 ends... sym rows), boundary 4 halves->
    # boundary weight 4 of volume 6 -> 666666 ppm
    assert out[0] == 666_666 and out[1] == 666_666


def test_closeness_path_graph(graph_from_edges):
    _, gu, idmap, _, _ = graph_from_edges([(0, 1), (1, 2)], undirected_only=False)
    out = closeness_harmonic(gu)
    got = {
        k: (c, h, r)
        for k, c, h, r in zip(
            keys_to_ids(out["node"]), out["closeness_ppm"], out["harmonic_ppm"], out["reached"]
        )
    }
    # node 1 (center): dists {1,1} -> closeness 2*1e6//2 = 1e6, harmonic 2e6
    assert got[1] == (1_000_000, 2_000_000, 2)
    # node 0: dists {1,2} -> closeness 2e6//3, harmonic 1e6 + 5e5
    assert got[0] == ((2_000_000) // 3, 1_500_000, 2)


def test_closeness_many_sources_waves(graph_from_edges):
    # >64 nodes forces multiple MSBFS waves
    edges = [(i, i + 1) for i in range(70)]
    _, gu, idmap, _, _ = graph_from_edges(edges, undirected_only=False, num_partitions=4)
    out = closeness_harmonic(gu)
    assert len(out) == 71
    assert (out["reached"] == 70).all()  # path graph, all reach all


def test_fastrp_deterministic_and_shaped(graph_from_edges, tmp_path):
    import graph_data_science_ray as gdsr

    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)]
    _, gu, idmap, enc, sym = graph_from_edges(edges, undirected_only=False)
    a = fastrp(gu, dim=16, seed=5)
    b = fastrp(gu, dim=16, seed=5)
    for x, y in zip(a["embedding"], b["embedding"]):
        assert np.array_equal(x, y)
    # different partition count -> same values (pure function of seed+graph)
    gu1 = gdsr.GraphStore.project(
        sym, str(tmp_path / "gu1"), idmap=idmap, num_partitions=1, directed=False
    )
    c = fastrp(gu1, dim=16, seed=5)
    am = np.stack(a.sort_values("node")["embedding"].to_numpy())
    cm = np.stack(c.sort_values("node")["embedding"].to_numpy())
    assert np.allclose(am, cm, atol=1e-12)
    assert am.shape == (4, 16)
    assert np.abs(am).sum() > 0


def test_select_sources_strategies(graph_from_edges):
    from graph_data_science_ray.functions.betweenness import select_sources

    # star: node 0 has degree 8, leaves degree 0 (directed out from 0)
    gd, _, _, _, _ = graph_from_edges([(0, i) for i in range(1, 9)])
    r = select_sources(gd, 4, strategy="random", seed=1)
    assert len(r) == 4 and len(np.unique(r)) == 4
    assert (select_sources(gd, 4, strategy="random", seed=1) == r).all()  # seeded
    d = select_sources(gd, 1, strategy="degree", seed=1)
    assert list(d) == [0]  # only node 0 has out-degree

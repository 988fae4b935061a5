"""Golden-graph conformance (FIXTURES.md §3) — full transcript→edge→algo path.

Mirrors the reference's inline golden-graph tests:
- PageRank: algo/src/test/java/org/neo4j/gds/pagerank/PageRankTest.java:62-130
- WCC: algo/src/test/java/org/neo4j/gds/wcc/WccTest.java:85
- TriangleCount: algo/src/test/java/org/neo4j/gds/triangle/IntersectingTriangleCountTest.java:45-84
"""

import itertools

import numpy as np
import pytest

import graph_data_science_ray as gdsr
from graph_data_science_ray.functions.triangles import (
    local_clustering_coefficient,
    triangle_count,
)
from tests.conftest import keys_to_ids

WIKI_EDGES = [
    (1, 2), (2, 1), (3, 0), (3, 1), (4, 1), (4, 3), (4, 5), (5, 1), (5, 4),
    (6, 1), (6, 4), (7, 1), (7, 4), (8, 1), (8, 4), (9, 4), (10, 4),
]
WIKI_EXPECTED = {
    0: 0.3040965, 1: 3.5604297, 2: 3.1757906, 3: 0.3625935, 4: 0.7503465,
    5: 0.3625935, 6: 0.15, 7: 0.15, 8: 0.15, 9: 0.15, 10: 0.15,
}


def test_pagerank_wiki_golden(graph_from_edges):
    gd, _, idmap, _, _ = graph_from_edges(WIKI_EDGES)
    res = gdsr.pagerank(gd, damping=0.85, tolerance=0.0, max_iterations=41)
    got = dict(zip(keys_to_ids(res["node"]), res["score"]))
    for node, exp in WIKI_EXPECTED.items():
        assert got[node] == pytest.approx(exp, abs=1e-5)


def test_pagerank_isolated_node_scores_alpha(graph_from_edges):
    gd, _, _, _, _ = graph_from_edges([(0, 1)], isolated=[2])
    res = gdsr.pagerank(gd, max_iterations=20)
    got = dict(zip(keys_to_ids(res["node"]), res["score"]))
    assert got[2] == pytest.approx(0.15, abs=1e-12)
    assert got[0] == pytest.approx(0.15, abs=1e-12)  # no in-edges
    assert got[1] > 0.15


def test_pagerank_converges_before_max_iterations(graph_from_edges):
    gd, _, _, _, _ = graph_from_edges(WIKI_EDGES)
    from graph_data_science_ray.functions.pagerank import PageRankComputation
    from graph_data_science_ray.state.pregel import Pregel

    engine = Pregel(gd, PageRankComputation(tolerance=1e-7))
    engine.run(max_iterations=200)
    assert engine.history[-1]["active"] == 0
    assert engine.history[-1]["iteration"] < 199


def test_pagerank_weighted_counts_parallel_edges(graph_from_edges):
    # duplicate edge (0,1) twice == weight 2; weighted run must match an
    # explicit multigraph interpretation
    gd, _, _, _, _ = graph_from_edges([(0, 1), (0, 1), (0, 2)])
    res_w = gdsr.pagerank(gd, weighted=True, max_iterations=30)
    got = dict(zip(keys_to_ids(res_w["node"]), res_w["score"]))
    # node1 receives 2/3 of node0's push, node2 receives 1/3
    assert got[1] > got[2]
    expected_1 = 0.15 + 0.85 * 0.15 * (2 / 3)
    assert got[1] == pytest.approx(expected_1, abs=1e-9)


def test_wcc_components_exact(graph_from_edges):
    _, gu, _, _, _ = graph_from_edges([(0, 1), (1, 2), (2, 3), (4, 5)], isolated=[6])
    res = gdsr.wcc(gu)
    comp = dict(zip(keys_to_ids(res["node"]), keys_to_ids(res["component"])))
    assert comp == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 4, 6: 6}


def test_wcc_direction_irrelevant(graph_from_edges):
    # edges in mixed directions form one component
    _, gu, _, _, _ = graph_from_edges([(3, 0), (1, 0), (2, 1)])
    res = gdsr.wcc(gu)
    comp = dict(zip(keys_to_ids(res["node"]), keys_to_ids(res["component"])))
    assert set(comp.values()) == {0}


def test_label_propagation_cliques(graph_from_edges):
    k3 = list(itertools.combinations([0, 1, 2], 2))
    k4 = list(itertools.combinations([3, 4, 5, 6], 2))
    _, gu, _, _, _ = graph_from_edges(k3 + k4)
    res = gdsr.label_propagation(gu, max_iterations=50)
    lab = dict(zip(keys_to_ids(res["node"]), keys_to_ids(res["label"])))
    # set-equivalence + normalized min-member ids (unique fixpoint fixture)
    assert len({lab[0], lab[1], lab[2]}) == 1
    assert len({lab[3], lab[4], lab[5], lab[6]}) == 1
    assert lab[0] != lab[3]


def test_label_propagation_keeps_label_without_votes(graph_from_edges):
    _, gu, _, _, _ = graph_from_edges([(0, 1)], isolated=[2])
    res = gdsr.label_propagation(gu, max_iterations=5)
    lab = dict(zip(keys_to_ids(res["node"]), keys_to_ids(res["label"])))
    assert lab[2] == 2  # isolated keeps its own label
    # 0 and 1 adopt each other's -> min label wins on the pair over rounds
    assert lab[0] in (0, 1) and lab[1] in (0, 1)


@pytest.mark.parametrize(
    "edges,global_exp,local_exp",
    [
        ([(0, 1), (1, 2)], 0, {0: 0, 1: 0, 2: 0}),  # line
        ([(0, 1), (1, 2), (2, 0)], 1, {0: 1, 1: 1, 2: 1}),  # one triangle
        (
            [(i * 3, i * 3 + 1) for i in range(5)]
            + [(i * 3 + 1, i * 3 + 2) for i in range(5)]
            + [(i * 3 + 2, i * 3) for i in range(5)],
            5,
            {n: 1 for n in range(15)},
        ),  # 5 independent triangles
        (
            list(itertools.combinations(range(5), 2)),
            10,
            {n: 6 for n in range(5)},
        ),  # K5
    ],
)
def test_triangle_fixtures(graph_from_edges, edges, global_exp, local_exp):
    _, _, idmap, _, sym = graph_from_edges(edges, undirected_only=True)
    tri, total = triangle_count(sym, idmap=idmap, num_partitions=2)
    assert total == global_exp
    got = dict(zip(keys_to_ids(tri["node"]), tri["triangles"]))
    assert got == local_exp


def test_triangle_max_degree_sentinel(graph_from_edges):
    edges = list(itertools.combinations(range(5), 2))
    _, _, idmap, _, sym = graph_from_edges(edges, undirected_only=True)
    tri, total = triangle_count(sym, idmap=idmap, max_degree=3, num_partitions=2)
    assert total == 0
    assert (tri["triangles"] == -1).all()


def test_lcc_clique_is_one(graph_from_edges):
    edges = list(itertools.combinations(range(4), 2))
    _, _, idmap, _, sym = graph_from_edges(edges, undirected_only=True)
    lcc = local_clustering_coefficient(sym, idmap=idmap, num_partitions=2)
    assert np.allclose(lcc["lcc"], 1.0)


def test_degree_centrality(graph_from_edges):
    _, _, idmap, enc, _ = graph_from_edges([(0, 1), (0, 1), (0, 2), (1, 2)])
    deg = gdsr.degree_centrality(enc, idmap=idmap)
    got = dict(zip(keys_to_ids(deg["node"]), deg["degree"]))
    assert got == {0: 2, 1: 1, 2: 0}  # distinct out-neighbors
    degw = gdsr.degree_centrality(enc, idmap=idmap, weighted=True)
    goww = dict(zip(keys_to_ids(degw["node"]), degw["degree"]))
    assert goww == {0: 3.0, 1: 1.0, 2: 0.0}  # parallel edge weight summed
    degr = gdsr.degree_centrality(enc, idmap=idmap, orientation="reverse")
    gotr = dict(zip(keys_to_ids(degr["node"]), degr["degree"]))
    assert gotr == {0: 0, 1: 1, 2: 2}


def test_personalized_pagerank(graph_from_edges):
    # personalization: only node 0 seeds rank mass
    gd, _, idmap, _, _ = graph_from_edges([(0, 1), (1, 2), (3, 1)])
    res = gdsr.pagerank(gd, source_nodes=np.array([0]), max_iterations=30)
    got = dict(zip(keys_to_ids(res["node"]), res["score"]))
    assert got[3] == 0.0  # unreachable from the source set, no base mass
    assert got[0] == pytest.approx(0.15)
    assert got[1] > 0 and got[2] > 0


def test_seeded_label_propagation(graph_from_edges):
    # seeds: both components pre-labeled with custom ids
    _, gu, idmap, _, _ = graph_from_edges([(0, 1), (2, 3)])
    seeds = np.array([100, 100, 200, 200], dtype=np.int64)
    res = gdsr.label_propagation(gu, seeds=seeds, max_iterations=5)
    assert set(res["label"]) == {100, 200}


def test_write_results_roundtrip(tmp_path):
    import pandas as pd

    from graph_data_science_ray.sinks import write_results

    df = pd.DataFrame({"node": [1, 2], "score": [0.5, 0.7]})
    p = write_results(df, str(tmp_path / "out"))
    import pyarrow.parquet as pq
    import glob

    files = glob.glob(p + "/*.parquet")
    assert files
    back = pq.read_table(files[0]).to_pandas()
    assert len(back) == 2
    # second call is a no-op (marker present)
    assert write_results(df, p) == p


def test_pagerank_scalers(graph_from_edges):
    from graph_data_science_ray.functions.pagerank import pagerank

    gd, _, _, _, _ = graph_from_edges([(0, 1), (1, 2), (2, 0), (0, 3)])
    base = pagerank(gd, max_iterations=15)["score"].to_numpy()
    l1 = pagerank(gd, max_iterations=15, scaler="l1norm")["score"].to_numpy()
    assert np.isclose(l1.sum(), 1.0)
    assert np.allclose(l1, base / base.sum())
    l2 = pagerank(gd, max_iterations=15, scaler="l2norm")["score"].to_numpy()
    assert np.isclose((l2 * l2).sum(), 1.0)
    mm = pagerank(gd, max_iterations=15, scaler="minmax")["score"].to_numpy()
    assert mm.min() == 0.0 and mm.max() == 1.0


def test_float32_message_precision(graph_from_edges):
    """Opt-in float32 wire: results within 1e-6 of the float64 wire and
    deterministic; the default stays float64 (exact-conformance path)."""
    from graph_data_science_ray.functions.pagerank import (
        PageRankComputation,
        pagerank,
    )
    from graph_data_science_ray.state.pregel import Pregel

    class PR32(PageRankComputation):
        message_precision = "float32"

    gd, _, _, _, _ = graph_from_edges([(0, 1), (1, 2), (2, 0), (0, 3), (3, 4)])
    e64 = Pregel(gd, PageRankComputation(0.85, 0.0, True))
    r64 = e64.gather(e64.run(max_iterations=15), "rank")
    e32 = Pregel(gd, PR32(0.85, 0.0, True))
    r32 = e32.gather(e32.run(max_iterations=15), "rank")
    assert np.allclose(r64, r32, atol=1e-5)
    assert not (r64 == r32).all() or True  # drift allowed, closeness required
    # determinism of the f32 path itself
    e32b = Pregel(gd, PR32(0.85, 0.0, True))
    r32b = e32b.gather(e32b.run(max_iterations=15), "rank")
    assert (r32 == r32b).all()


def test_eigenvector_modes_agree_on_direction(graph_from_edges):
    """normalize='none' (the integer-exact oracle contract) must agree
    with the L2-normalized stream up to scale."""
    from graph_data_science_ray.functions.pagerank import eigenvector

    gd, _, _, _, _ = graph_from_edges(
        [(0, 1), (1, 2), (2, 0), (0, 3), (3, 1), (2, 4)]
    )
    raw = eigenvector(gd, max_iterations=6, normalize="none")["score"].to_numpy()
    norm = eigenvector(gd, max_iterations=6, tolerance=0.0)["score"].to_numpy()
    assert (raw == raw.astype(np.int64)).all()  # exactly integer-valued
    nr = np.linalg.norm(raw)
    assert nr > 0
    # same direction after scaling (power iteration from the same start)
    assert np.allclose(raw / nr, norm, atol=1e-9)


@pytest.mark.parametrize(
    "edges,global_exp,local_exp",
    [
        ([(0, 1), (1, 2), (2, 0)], 0, {0: 0, 1: 0, 2: 0}),  # triangle only
        (
            list(itertools.combinations(range(4), 2)),
            1,
            {n: 1 for n in range(4)},
        ),  # K4
        (
            list(itertools.combinations(range(5), 2)),
            5,
            {n: 4 for n in range(5)},
        ),  # K5: C(5,4)=5 cliques, each node in C(4,3)=4
        (
            list(itertools.combinations(range(4), 2))
            + [(3, 4), (4, 5)],
            1,
            {0: 1, 1: 1, 2: 1, 3: 1, 4: 0, 5: 0},
        ),  # K4 with a tail
    ],
)
def test_four_clique_fixtures(graph_from_edges, edges, global_exp, local_exp):
    from graph_data_science_ray.functions.triangles import four_clique_count

    _, _, idmap, _, sym = graph_from_edges(edges, undirected_only=True)
    k4, total = four_clique_count(sym, idmap=idmap, num_partitions=2)
    assert total == global_exp
    got = dict(zip(keys_to_ids(k4["node"]), k4["k4"]))
    assert got == local_exp


def test_katz_integer_fixed_round(graph_from_edges):
    from graph_data_science_ray.functions.pagerank import katz

    # path 0 -> 1 -> 2, beta=4, 2 rounds:
    # x0 = [4,4,4]; x1 = [4, 4+floor(4/2), 4+floor(4/2)] = [4,6,6]
    # x2 = [4, 4+floor(4/2), 4+floor(6/2)] = [4,6,7]
    gd, _, idmap, _, _ = graph_from_edges([(0, 1), (1, 2)])
    res = katz(gd, rounds=2, beta_scale=4)
    got = dict(zip(keys_to_ids(res["node"]), res["score"].astype(int)))
    assert got == {0: 4, 1: 6, 2: 7}

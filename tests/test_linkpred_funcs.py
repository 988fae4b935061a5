"""Unit tests for the link-prediction topology functions and the vector
similarity functions (reference LinkPredictionFunc.java /
SimilaritiesFunc.java semantics, batch-scored over Datasets)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from graph_data_science_ray.functions.linkpred import link_prediction_scores
from graph_data_science_ray.functions.simfunc import vector_similarity


@pytest.fixture(scope="module")
def path_graph(ray_session):
    # undirected: 0-1, 0-2, 1-2, 2-3
    e = pd.DataFrame(
        {
            "src": [0, 1, 0, 2, 1, 2, 2, 3],
            "dst": [1, 0, 2, 0, 2, 1, 3, 2],
            "weight": [1.0] * 8,
        }
    )
    return rd.from_pandas(e)


def _scores(sym, pairs_df, n, community=None):
    pairs = rd.from_pandas(pairs_df)
    out = link_prediction_scores(sym, pairs, n, community=community, num_parts=4)
    return (
        out.to_pandas()
        .sort_values(["node_a", "node_b"])
        .reset_index(drop=True)
        .set_index(["node_a", "node_b"])
    )


def test_link_prediction_scores_hand_graph(path_graph):
    # N(0)={1,2}, N(1)={0,2}, N(2)={0,1,3}, N(3)={2}
    pairs = pd.DataFrame({"node_a": [0, 0, 1, 3], "node_b": [1, 3, 2, 0]})
    com = np.array([7, 7, 8, 8])
    s = _scores(path_graph, pairs, 4, community=com)

    aa3 = 10**12 // int(np.floor(np.log(3) * 1e6))  # common nbr deg 3
    aa2 = 10**12 // int(np.floor(np.log(2) * 1e6))  # common nbr deg 2
    r = s.loc[(0, 1)]
    assert r["common_neighbors"] == 1  # {2}
    assert r["preferential_attachment"] == 4  # 2*2
    assert r["total_neighbors"] == 3  # 2+2-1
    assert r["adamic_adar_ppm"] == aa3
    assert r["resource_allocation_ppm"] == 10**6 // 3
    assert r["same_community"] == 1

    r = s.loc[(1, 2)]
    assert r["common_neighbors"] == 1  # {0}
    assert r["adamic_adar_ppm"] == aa2
    assert r["resource_allocation_ppm"] == 10**6 // 2
    assert r["preferential_attachment"] == 6
    assert r["total_neighbors"] == 4
    assert r["same_community"] == 0

    # score is symmetric in the pair orientation
    assert (s.loc[(0, 3)].to_numpy() == s.loc[(3, 0)].to_numpy()).all()


def test_link_prediction_zero_common_pairs_kept(path_graph):
    # 1-3 share no neighbor besides 2? N(1)={0,2}, N(3)={2} -> common={2}.
    # Use an isolated node 4 instead: every score except PA/TN is 0.
    pairs = pd.DataFrame({"node_a": [1, 4], "node_b": [3, 0]})
    s = _scores(path_graph, pairs, 5)
    r = s.loc[(4, 0)]
    assert r["common_neighbors"] == 0
    assert r["adamic_adar_ppm"] == 0
    assert r["resource_allocation_ppm"] == 0
    assert r["preferential_attachment"] == 0  # deg(4)=0
    assert r["total_neighbors"] == 2
    assert len(s) == 2  # zero-common pair not dropped


def test_vector_similarity_hand_values(ray_session):
    df = pd.DataFrame(
        {
            "pid": [0, 1, 2],
            "vec_a": [[1.0, 2.0, 3.0], [0.0, 0.0, 0.0], [1.0, 1.0, 2.0]],
            "vec_b": [[1.0, 2.0, 3.0], [-1.0, 2.0, 0.5], [2.0, 1.0, 1.0]],
        }
    )
    out = (
        vector_similarity(rd.from_pandas(df))
        .to_pandas()
        .sort_values("pid")
        .set_index("pid")
    )
    ident = out.loc[0]
    assert ident["jaccard_ppm"] == 1_000_000
    assert ident["overlap_ppm"] == 1_000_000
    assert ident["cosine_ppm"] == 1_000_000
    assert ident["pearson_ppm"] == 1_000_000
    assert ident["euclidean_distance_q"] == 0
    assert ident["euclidean_sim_ppm"] == 1_000_000

    zero = out.loc[1]  # zero vector: total contract scores 0, not NaN
    assert zero["jaccard_ppm"] == 0
    assert zero["cosine_ppm"] == 0
    assert zero["pearson_ppm"] == 0
    d = np.sqrt(1e6 + 4e6 + 0.25e6)
    assert zero["euclidean_distance_q"] == int(np.floor(d))
    assert zero["euclidean_sim_ppm"] == int(np.floor(1e9 / (1000.0 + d)))

    perm = out.loc[2]  # multiset {1,1,2} vs {2,1,1}: jaccard 1, overlap 2/3
    assert perm["jaccard_ppm"] == 1_000_000
    assert perm["overlap_ppm"] == 666_666
    assert perm["cosine_ppm"] == 833_333  # 5/6
    assert perm["pearson_ppm"] == -500_000
    assert perm["euclidean_distance_q"] == 1414  # sqrt(2)*1000


def test_vector_similarity_negative_base_cross_side(ray_session):
    # b's minimum is below a's: the shared offset base must cover both
    # sides or row keys collide across rows.
    df = pd.DataFrame(
        {
            "pid": [0, 1],
            "vec_a": [[5.0, 6.0], [7.0, 8.0]],
            "vec_b": [[-9.0, 5.0], [7.0, -9.0]],
        }
    )
    out = (
        vector_similarity(rd.from_pandas(df))
        .to_pandas()
        .sort_values("pid")
        .set_index("pid")
    )
    assert out.loc[0, "overlap_ppm"] == 500_000  # {5000,6000} ∩ {-9000,5000}
    assert out.loc[1, "overlap_ppm"] == 500_000  # {7000,8000} ∩ {7000,-9000}
    assert out.loc[0, "jaccard_ppm"] == 1_000_000 // 3
    assert out.loc[1, "jaccard_ppm"] == 1_000_000 // 3

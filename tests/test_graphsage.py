"""GraphSAGE: mean-aggregator training + inference.

Reference surface: algo/.../embeddings/graphsage/ (MeanAggregator,
GraphSageLoss, BatchSampler, GraphSageModelTrainer)."""

import numpy as np
import pytest

from graph_data_science_ray.functions.graphsage import (
    graphsage,
    graphsage_train,
)


def _two_cluster_edges():
    edges = []
    for base in (0, 10):
        grp = range(base, base + 10)
        edges += [(i, j) for i in grp for j in grp if i < j]
    edges += [(0, 10)]  # one bridge
    return edges


def test_graphsage_loss_decreases_and_deterministic(graph_from_edges):
    _gd, gu, _im, _enc, _sym = graph_from_edges(
        _two_cluster_edges(), num_partitions=3
    )
    m1 = graphsage_train(gu, embedding_dim=8, sample_sizes=(5, 3),
                         epochs=15, seed=7)
    assert len(m1["losses"]) >= 2
    assert m1["losses"][-1] < m1["losses"][0]
    # deterministic at a different shard/partition interplay
    m2 = graphsage_train(gu, embedding_dim=8, sample_sizes=(5, 3),
                         epochs=15, seed=7, num_shards=4)
    # num_shards is part of the canonical layout: same value => identical
    m3 = graphsage_train(gu, embedding_dim=8, sample_sizes=(5, 3),
                         epochs=15, seed=7)
    assert (m1["W1"] == m3["W1"]).all() and (m1["W2"] == m3["W2"]).all()
    assert m2["W1"].shape == m1["W1"].shape


def test_graphsage_embeddings_cluster_structure(graph_from_edges):
    _gd, gu, idmap, _enc, _sym = graph_from_edges(
        _two_cluster_edges(), num_partitions=3
    )
    out = graphsage(gu, embedding_dim=16, sample_sizes=(8, 4), epochs=25,
                    seed=11)
    assert len(out) == len(idmap)
    E = np.stack([np.asarray(v) for v in out["embedding"]])
    # rows are L2-normalized
    assert np.allclose(np.linalg.norm(E, axis=1), 1.0, atol=1e-9)
    # same-cluster similarity should beat cross-cluster on average
    ids = np.array([int(k.split(":n")[1]) for k in out["node"]])
    ca = E[ids < 10]
    cb = E[ids >= 10]
    intra = (ca @ ca.T).mean() / 2 + (cb @ cb.T).mean() / 2
    inter = (ca @ cb.T).mean()
    assert intra >= inter - 1e-9


def test_graphsage_custom_features(graph_from_edges):
    _gd, gu, idmap, _enc, _sym = graph_from_edges(
        [(0, 1), (1, 2), (2, 3), (3, 0)], num_partitions=2
    )
    V = len(idmap)
    feats = np.arange(V * 3, dtype=np.float64).reshape(V, 3)
    m = graphsage_train(gu, features=feats, embedding_dim=4,
                        sample_sizes=(2, 2), epochs=3, seed=5)
    assert m["W1"].shape == (4, 3)
    out = graphsage(gu, features=feats, embedding_dim=4,
                    sample_sizes=(2, 2), epochs=3, seed=5)
    assert len(out) == V

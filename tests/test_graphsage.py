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


def test_graphsage_pool_aggregator_trains(graph_from_edges):
    _gd, gu, idmap, _enc, _sym = graph_from_edges(
        _two_cluster_edges(), num_partitions=3
    )
    m1 = graphsage_train(gu, embedding_dim=8, sample_sizes=(5, 3),
                         epochs=15, seed=7, aggregator="pool")
    assert m1["losses"][-1] < m1["losses"][0]
    assert m1["W1"].shape == (8, 2 * 2)   # concat(self, pooled) of f=2
    assert m1["W2"].shape == (8, 16)      # concat(dim, dim)
    # deterministic rerun
    m2 = graphsage_train(gu, embedding_dim=8, sample_sizes=(5, 3),
                         epochs=15, seed=7, aggregator="pool")
    for k in ("W1", "W2", "Wp1", "Wp2"):
        assert (m1[k] == m2[k]).all(), k
    out = graphsage(gu, embedding_dim=8, sample_sizes=(5, 3), epochs=10,
                    seed=7, aggregator="pool")
    assert len(out) == len(idmap)
    E = np.stack([np.asarray(v) for v in out["embedding"]])
    assert np.isfinite(E).all()
    assert np.allclose(np.linalg.norm(E, axis=1), 1.0, atol=1e-9)


def test_graphsage_pool_gradients_match_finite_differences(graph_from_edges):
    """The hand-written max-pool backward must agree with a central
    finite difference of the shard loss for every weight matrix."""
    import ray

    from graph_data_science_ray.functions.graphsage import (
        _sample_neighbor_blocks,
        _shard_grad,
        _shard_rows,
    )

    _gd, gu, _im, _enc, _sym = graph_from_edges(
        [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0), (0, 2)], num_partitions=2
    )
    V = gu.node_count
    rng = np.random.RandomState(3)
    feats = rng.rand(V, 2)
    bounds = np.asarray(gu.boundaries, dtype=np.int64)
    feat_blocks = _shard_rows(feats, bounds)
    s1 = _sample_neighbor_blocks(gu, 3, 5, layer=1)
    s2 = _sample_neighbor_blocks(gu, 2, 5, layer=2)
    triples = np.array([[0, 1, 3], [2, 3, 0], [4, 0, 2]], dtype=np.int64)
    cfg = {"activation": "sigmoid", "negative_sample_weight": 2.0,
           "aggregator": "pool"}
    dim = 4
    W1 = rng.rand(dim, 4) * 0.5
    W2 = rng.rand(dim, 2 * dim) * 0.5
    Wp1 = rng.rand(2, 2) * 0.5
    Wp2 = rng.rand(dim, dim) * 0.5

    def loss_at(ws):
        out = ray.get(_shard_grad.remote(
            tuple(ws), feat_blocks, s1, s2, bounds, triples, cfg
        ))
        return out[-2], out[:4]

    base_loss, grads = loss_at([W1, W2, Wp1, Wp2])
    eps = 1e-6
    for wi, W in enumerate([W1, W2, Wp1, Wp2]):
        g = grads[wi]
        # probe 3 entries per matrix
        idxs = [(0, 0), (W.shape[0] // 2, W.shape[1] // 2),
                (W.shape[0] - 1, W.shape[1] - 1)]
        for (i, j) in idxs:
            Wp = [w.copy() for w in [W1, W2, Wp1, Wp2]]
            Wp[wi][i, j] += eps
            lp, _ = loss_at(Wp)
            Wm = [w.copy() for w in [W1, W2, Wp1, Wp2]]
            Wm[wi][i, j] -= eps
            lm, _ = loss_at(Wm)
            fd = (lp - lm) / (2 * eps)
            assert abs(fd - g[i, j]) <= 1e-4 * max(1.0, abs(fd)), (
                wi, i, j, fd, g[i, j]
            )


def test_graphsage_dataset_features_match_matrix(graph_from_edges):
    """(node, vector) Dataset feature input must produce byte-identical
    weights to the same features passed as a driver matrix."""
    import pandas as pd
    import ray.data as rd

    _gd, gu, _im, _enc, _sym = graph_from_edges(
        _two_cluster_edges(), num_partitions=3
    )
    V = gu.node_count
    rng = np.random.RandomState(5)
    feats = rng.rand(V, 3)
    df = pd.DataFrame({"node_id": np.arange(V, dtype=np.int64)})
    df["features"] = [feats[i] for i in range(V)]
    m_mat = graphsage_train(gu, features=feats, embedding_dim=6,
                            sample_sizes=(4, 2), epochs=8, seed=3)
    m_ds = graphsage_train(gu, features=rd.from_pandas(df), embedding_dim=6,
                           sample_sizes=(4, 2), epochs=8, seed=3)
    assert (m_mat["W1"] == m_ds["W1"]).all()
    assert (m_mat["W2"] == m_ds["W2"]).all()


def test_graphsage_multilabel_gradients_match_finite_differences(graph_from_edges):
    """The per-label projection backward (mean aggregator) must agree
    with a central finite difference of the shard loss for W1, W2 and
    every per-label projection matrix."""
    import ray

    from graph_data_science_ray.functions.graphsage import (
        _sample_neighbor_blocks,
        _shard_grad,
        _shard_rows,
    )

    _gd, gu, _im, _enc, _sym = graph_from_edges(
        [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0), (0, 2)], num_partitions=2
    )
    V = gu.node_count
    rng = np.random.RandomState(9)
    feats = rng.rand(V, 3)
    labels = (np.arange(V) % 2).astype(np.int64)
    bounds = np.asarray(gu.boundaries, dtype=np.int64)
    feat_blocks = _shard_rows(feats, bounds)
    lab_blocks = _shard_rows(labels, bounds)
    s1 = _sample_neighbor_blocks(gu, 3, 5, layer=1)
    s2 = _sample_neighbor_blocks(gu, 2, 5, layer=2)
    triples = np.array([[0, 1, 3], [2, 3, 0], [4, 0, 2]], dtype=np.int64)
    cfg = {"activation": "sigmoid", "negative_sample_weight": 2.0,
           "aggregator": "mean", "n_labels": 2, "lab_blocks": lab_blocks}
    dim, dp = 4, 2
    W1 = rng.rand(dim, dp) * 0.5
    W2 = rng.rand(dim, dim) * 0.5
    Wa = rng.rand(dp, 3) * 0.5
    Wb = rng.rand(dp, 3) * 0.5

    def loss_at(ws):
        out = ray.get(_shard_grad.remote(
            tuple(ws), feat_blocks, s1, s2, bounds, triples, cfg
        ))
        return out[-2], out[:4]

    _base, grads = loss_at([W1, W2, Wa, Wb])
    eps = 1e-6
    for wi, W in enumerate([W1, W2, Wa, Wb]):
        g = grads[wi]
        idxs = [(0, 0), (W.shape[0] // 2, W.shape[1] // 2),
                (W.shape[0] - 1, W.shape[1] - 1)]
        for (i, j) in idxs:
            Wp = [w.copy() for w in [W1, W2, Wa, Wb]]
            Wp[wi][i, j] += eps
            lp, _ = loss_at(Wp)
            Wm = [w.copy() for w in [W1, W2, Wa, Wb]]
            Wm[wi][i, j] -= eps
            lm, _ = loss_at(Wm)
            fd = (lp - lm) / (2 * eps)
            assert abs(fd - g[i, j]) <= 1e-4 * max(1.0, abs(fd)), (
                wi, i, j, fd, g[i, j]
            )


def test_graphsage_multilabel_pool_gradients_match_finite_differences(graph_from_edges):
    """Same finite-difference check with the max-pool aggregator in the
    loop (projection feeds both the concat-self and pooled branches)."""
    import ray

    from graph_data_science_ray.functions.graphsage import (
        _sample_neighbor_blocks,
        _shard_grad,
        _shard_rows,
    )

    _gd, gu, _im, _enc, _sym = graph_from_edges(
        [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0), (0, 2)], num_partitions=2
    )
    V = gu.node_count
    rng = np.random.RandomState(13)
    feats = rng.rand(V, 3)
    labels = (np.arange(V) % 2).astype(np.int64)
    bounds = np.asarray(gu.boundaries, dtype=np.int64)
    feat_blocks = _shard_rows(feats, bounds)
    lab_blocks = _shard_rows(labels, bounds)
    s1 = _sample_neighbor_blocks(gu, 3, 5, layer=1)
    s2 = _sample_neighbor_blocks(gu, 2, 5, layer=2)
    triples = np.array([[0, 1, 3], [2, 3, 0], [4, 0, 2]], dtype=np.int64)
    cfg = {"activation": "sigmoid", "negative_sample_weight": 2.0,
           "aggregator": "pool", "n_labels": 2, "lab_blocks": lab_blocks}
    dim, dp = 4, 2
    W1 = rng.rand(dim, 2 * dp) * 0.5
    W2 = rng.rand(dim, 2 * dim) * 0.5
    Wp1 = rng.rand(dp, dp) * 0.5
    Wp2 = rng.rand(dim, dim) * 0.5
    Wa = rng.rand(dp, 3) * 0.5
    Wb = rng.rand(dp, 3) * 0.5

    def loss_at(ws):
        out = ray.get(_shard_grad.remote(
            tuple(ws), feat_blocks, s1, s2, bounds, triples, cfg
        ))
        return out[-2], out[:6]

    _base, grads = loss_at([W1, W2, Wp1, Wp2, Wa, Wb])
    eps = 1e-6
    mats = [W1, W2, Wp1, Wp2, Wa, Wb]
    for wi, W in enumerate(mats):
        g = grads[wi]
        idxs = [(0, 0), (W.shape[0] - 1, W.shape[1] - 1)]
        for (i, j) in idxs:
            Wp = [w.copy() for w in mats]
            Wp[wi][i, j] += eps
            lp, _ = loss_at(Wp)
            Wm = [w.copy() for w in mats]
            Wm[wi][i, j] -= eps
            lm, _ = loss_at(Wm)
            fd = (lp - lm) / (2 * eps)
            assert abs(fd - g[i, j]) <= 1e-4 * max(1.0, abs(fd)), (
                wi, i, j, fd, g[i, j]
            )


def test_graphsage_multilabel_trains_and_embeds(graph_from_edges):
    """End-to-end multi-label: loss decreases, deterministic rerun, the
    embed path projects label-wise, and zero-padded feature columns of a
    label's projection receive exactly zero gradient (stay at init)."""
    _gd, gu, idmap, _enc, _sym = graph_from_edges(
        _two_cluster_edges(), num_partitions=3
    )
    V = gu.node_count
    rng = np.random.RandomState(21)
    # label 0: true width 3; label 1: true width 2 (padded to 3)
    labels = (np.arange(V) % 2).astype(np.int64)
    feats = rng.rand(V, 3)
    feats[labels == 1, 2] = 0.0  # label-1 rows: padded third column
    m1 = graphsage_train(gu, features=feats, node_labels=labels,
                         projected_dim=4, embedding_dim=8,
                         sample_sizes=(5, 3), epochs=12, seed=7)
    assert m1["losses"][-1] < m1["losses"][0]
    assert m1["W1"].shape == (8, 4)
    assert len(m1["Wps"]) == 2 and m1["Wps"][0].shape == (4, 3)
    m2 = graphsage_train(gu, features=feats, node_labels=labels,
                         projected_dim=4, embedding_dim=8,
                         sample_sizes=(5, 3), epochs=12, seed=7)
    for a, b in zip(m1["Wps"], m2["Wps"]):
        assert (a == b).all()
    # padded column of label-1's projection: exactly untrained
    from graph_data_science_ray.functions.graphsage import splitmix64

    def _rand(n, salt, seed=7):
        return ((splitmix64(np.arange(n, dtype=np.uint64)
                            + np.uint64(seed + salt)) % np.uint64(10_000)
                 ).astype(np.float64) / 10_000.0 - 0.5)

    init_w1 = _rand(4 * 3, 102).reshape(4, 3) / np.sqrt(3)
    assert (m1["Wps"][1][:, 2] == init_w1[:, 2]).all()
    assert not (m1["Wps"][1][:, 0] == init_w1[:, 0]).all()

    out = graphsage(gu, features=feats, node_labels=labels,
                    projected_dim=4, embedding_dim=8, sample_sizes=(5, 3),
                    epochs=8, seed=7)
    assert len(out) == len(idmap)
    E = np.stack([np.asarray(v) for v in out["embedding"]])
    assert np.isfinite(E).all()
    assert np.allclose(np.linalg.norm(E, axis=1), 1.0, atol=1e-9)

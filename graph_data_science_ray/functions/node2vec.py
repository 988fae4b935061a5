"""Node2Vec — random-walk corpus + skip-gram SGD with negative sampling.

Reference: algo/src/main/java/org/neo4j/gds/embeddings/node2vec/Node2Vec.java:38
(walks via RandomWalk, training via Word2Vec-style skip-gram,
Node2VecModel.java). Distributed re-expression:

- the walk corpus comes from the partitioned CSR walker
  (``functions.walks.random_walks`` — first-order walks; the p/q
  second-order bias is a documented extension point there);
- training is **data-parallel SGD with parameter averaging**: walks are
  sharded into a fixed number of shards (independent of cluster size —
  the determinism contract); each epoch, one task per shard runs
  vectorized skip-gram/negative-sampling updates (numpy gather →
  sigmoid → ``np.add.at`` scatter) on its own copy of the embedding
  matrices, and the driver averages the shard results. Embeddings are a
  pure function of (graph, seed): shard boundaries, pair generation and
  negative draws are all seeded — byte-identical at any parallelism.

The in/out matrices are broadcast per epoch (``ray.put`` once, read by
every shard task) — valid while V×d fits a worker heap; the sharded
parameter-server variant is the documented scale path for V beyond that.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

from graph_data_science_ray._util import mix2


def _walk_matrix(graph, walk_length: int, walks_per_node: int, seed: int,
                 p: float = 1.0, q: float = 1.0) -> np.ndarray:
    """Walks as a dense (n_walks, walk_length) int64 matrix, -1 padded."""
    from graph_data_science_ray.functions.walks import (
        _walk_partition,
        _walk_partition_biased,
    )

    blocks = graph.block_refs()
    if p != 1.0 or q != 1.0:
        dfs = ray.get(
            [
                _walk_partition_biased.remote(
                    pi, blocks, graph.node_count, walk_length, walks_per_node,
                    float(p), float(q), seed,
                )
                for pi in range(graph.num_partitions)
            ]
        )
    else:
        dfs = ray.get(
            [
                _walk_partition.remote(pi, blocks, walk_length, walks_per_node, seed)
                for pi in range(graph.num_partitions)
            ]
        )
    df = pd.concat(dfs, ignore_index=True)
    n_walks = graph.node_count * walks_per_node
    mat = np.full((n_walks, walk_length), -1, dtype=np.int64)
    mat[df["walk_id"].to_numpy(dtype=np.int64),
        df["step"].to_numpy(dtype=np.int64)] = df["node"].to_numpy(dtype=np.int64)
    return mat


def _pairs_from_walks(walks: np.ndarray, window: int) -> tuple[np.ndarray, np.ndarray]:
    """(center, context) pairs within ±window along each walk (vectorized)."""
    centers, contexts = [], []
    L = walks.shape[1]
    for off in range(1, window + 1):
        a = walks[:, : L - off].reshape(-1)
        b = walks[:, off:].reshape(-1)
        ok = (a >= 0) & (b >= 0)
        centers.append(a[ok])
        contexts.append(b[ok])
        centers.append(b[ok])  # symmetric context
        contexts.append(a[ok])
    return np.concatenate(centers), np.concatenate(contexts)


@ray.remote
def _sgd_shard(
    centers: np.ndarray,
    contexts: np.ndarray,
    emb_in_ref,
    emb_out_ref,
    lr: float,
    negatives: int,
    seed: int,
    epoch: int,
    shard: int,
    V: int,
) -> tuple[np.ndarray, np.ndarray]:
    """One shard-epoch of skip-gram SGD on local matrix copies.

    The ``*_ref`` args are ObjectRefs at call sites; Ray auto-resolves
    top-level args, so they arrive as (read-only) ndarrays here."""
    emb_in = np.array(emb_in_ref, copy=True)
    emb_out = np.array(emb_out_ref, copy=True)
    n = len(centers)
    if n == 0:
        return emb_in, emb_out
    order = (mix2(seed + 7 * epoch, np.arange(n, dtype=np.int64), shard)
             % np.uint64(n)).astype(np.int64)
    order = np.argsort(order, kind="stable")  # seeded shuffle of pair order
    centers, contexts = centers[order], contexts[order]
    B = 8192
    for s in range(0, n, B):
        c = centers[s : s + B]
        o = contexts[s : s + B]
        m = len(c)
        vi = emb_in[c]  # (m, d)
        # positive step
        vo = emb_out[o]
        score = 1.0 / (1.0 + np.exp(-np.einsum("ij,ij->i", vi, vo)))
        g = lr * (1.0 - score)
        d_in = g[:, None] * vo
        np.add.at(emb_out, o, g[:, None] * vi)
        # negative steps
        for k in range(negatives):
            neg = (
                mix2(seed + 1000 * epoch + k, s + np.arange(m, dtype=np.int64), shard)
                % np.uint64(V)
            ).astype(np.int64)
            vn = emb_out[neg]
            sneg = 1.0 / (1.0 + np.exp(-np.einsum("ij,ij->i", vi, vn)))
            gn = lr * (-sneg)
            d_in += gn[:, None] * vn
            np.add.at(emb_out, neg, gn[:, None] * vi)
        np.add.at(emb_in, c, d_in)
    return emb_in, emb_out


def node2vec(
    graph,
    dim: int = 32,
    walk_length: int = 20,
    walks_per_node: int = 4,
    window: int = 4,
    epochs: int = 3,
    negatives: int = 4,
    lr: float = 0.025,
    num_shards: int = 8,
    seed: int = 42,
    p: float = 1.0,
    q: float = 1.0,
) -> pd.DataFrame:
    """Node embeddings; returns (node, embedding list<float64>).

    ``p``/``q`` are the reference's return / in-out walk-bias parameters
    (second-order rejection-sampled walks; 1/1 = uniform first-order).
    Deterministic for a given seed at any parallelism (fixed shards,
    seeded draws, order-independent average combine).
    """
    V = graph.node_count
    rng = np.random.default_rng(seed)
    emb_in = ((rng.random((V, dim)) - 0.5) / dim).astype(np.float64)
    emb_out = np.zeros((V, dim), dtype=np.float64)

    walks = _walk_matrix(graph, walk_length, walks_per_node, seed, p=p, q=q)
    centers, contexts = _pairs_from_walks(walks, window)
    # fixed shard split by pair index (deterministic, cluster-size free)
    shard_of = (
        mix2(seed + 13, np.arange(len(centers), dtype=np.int64), 0)
        % np.uint64(num_shards)
    ).astype(np.int64)
    shard_pairs = []
    for sh in range(num_shards):
        m = shard_of == sh
        shard_pairs.append((ray.put(centers[m]), ray.put(contexts[m])))

    for epoch in range(epochs):
        in_ref = ray.put(emb_in)
        out_ref = ray.put(emb_out)
        results = ray.get(
            [
                _sgd_shard.remote(
                    c, o, in_ref, out_ref, lr, negatives, seed, epoch, sh, V
                )
                for sh, (c, o) in enumerate(shard_pairs)
            ]
        )
        # parameter averaging in fixed shard order (deterministic floats)
        emb_in = np.mean([r[0] for r in results], axis=0)
        emb_out = np.mean([r[1] for r in results], axis=0)

    node = (graph.idmap.keys if graph.idmap is not None
            else np.arange(V, dtype=np.int64))
    return pd.DataFrame({"node": node, "embedding": list(emb_in)})

"""GraphSAGE — inductive node embeddings via sampled-neighborhood mean
aggregation, trained with the unsupervised walk/negative-sample loss.

Reference semantics (algo/src/main/java/org/neo4j/gds/embeddings/graphsage/):

- ``MeanAggregator.java:53``: layer k output = activation(mean over
  {v} ∪ sampled-neighbors(v) of layer k-1 rows · W_k^T);
- ``GraphSageLoss.java:69``: per batch node v with positive p (endpoint
  of a uniform random walk of depth uniform(1..searchDepth),
  ``BatchSampler.neighborBatch``) and negative n (degree-weighted,
  ``BatchSampler.negativeBatch``):
  L = -log σ(e_v·e_p) - Q · log σ(-e_v·e_n), Q = negativeSampleWeight;
- neighborhoods are sampled ONCE up front and reused across epochs
  (``GraphSageModelTrainer.java:120`` builds extendedBatches before the
  epoch loop) — we keep that contract;
- final embeddings are L2-normalized rows (``GraphSageHelper``).

Distributed re-expression (the node2vec harness pattern,
``functions/node2vec.py``):

- neighborhood sampling and the positive-walk corpus run one task per
  CSR partition (zero-copy plasma block reads, owned nodes only);
- training is data-parallel full-batch Adam: the tiny weight matrices
  (W1: dim×f, W2: dim×dim) are ``ray.put`` per iteration, one task per
  FIXED shard of the triple list runs the vectorized forward+backward,
  and shard gradients combine in shard order — byte-identical at any
  parallelism;
- the feature matrix and the neighbor-sample arrays are PARTITION-HELD:
  range-sharded into one plasma block per graph partition (samples are
  born that way — the sampling task's return ref IS the block), and
  each shard/embed task fetches ONLY the blocks its support set touches
  (``_gather_rows``). No V-sized object is broadcast or read whole.
  Driver-side O(V) remains only at the INPUT boundary (the caller's
  feature matrix, the walk-derived triple list), as documented.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

from graph_data_science_ray._util import splitmix64


def _act(z: np.ndarray, kind: str) -> np.ndarray:
    if kind == "sigmoid":
        return 1.0 / (1.0 + np.exp(-z))
    if kind == "relu":
        return np.maximum(z, 0.0)
    raise ValueError(kind)


def _act_grad(h: np.ndarray, kind: str) -> np.ndarray:
    """Derivative expressed in terms of the activation OUTPUT h."""
    if kind == "sigmoid":
        return h * (1.0 - h)
    if kind == "relu":
        return (h > 0).astype(np.float64)
    raise ValueError(kind)


@ray.remote
def _sample_neighbors_part(pi: int, blocks, sample_size: int, seed: int,
                           layer: int) -> np.ndarray:
    """Uniform without-replacement neighbor sample for the partition's
    owned nodes: (count, S) int64 matrix, -1 padded (reference
    NeighborhoodSampler: all neighbors when degree <= sampleSize)."""
    b = ray.get(blocks[pi])
    indptr, indices, start = b["indptr"], b["indices"], b["start"]
    n = len(indptr) - 1
    out = np.full((n, sample_size), -1, dtype=np.int64)
    deg = np.diff(indptr)
    for i in range(n):
        d = deg[i]
        if d == 0:
            continue
        nbrs = indices[indptr[i]:indptr[i + 1]]
        if d <= sample_size:
            out[i, :d] = nbrs
        else:
            # seeded partial Fisher-Yates via argsort of per-edge hashes
            h = splitmix64(
                np.arange(d, dtype=np.uint64)
                + np.uint64((start + i) * 1_000_003 + seed + 77 * layer)
            )
            out[i] = nbrs[np.argsort(h, kind="stable")[:sample_size]]
    return out


def _sample_neighbor_blocks(graph, sample_size: int, seed: int,
                            layer: int) -> list:
    """One (owned_count, S) sample block per graph partition — the
    matrices are BORN partition-held (the sampling task's return ref IS
    the block); nothing V-sized is assembled anywhere."""
    blocks = graph.block_refs()
    return [
        _sample_neighbors_part.remote(pi, blocks, sample_size, seed, layer)
        for pi in range(graph.num_partitions)
    ]


def _shard_rows(mat: np.ndarray, boundaries) -> list:
    """Range-shard a (V, ...) matrix into one plasma object per graph
    partition (the partition-held layout: block p holds the rows of the
    nodes partition p owns)."""
    return [
        ray.put(np.ascontiguousarray(mat[boundaries[i]:boundaries[i + 1]]))
        for i in range(len(boundaries) - 1)
    ]


def _gather_rows(block_refs: list, boundaries: np.ndarray,
                 ids: np.ndarray) -> np.ndarray:
    """Rows for ``ids`` from a range-sharded matrix, fetching ONLY the
    blocks those ids touch (plasma reads are zero-copy and node-local
    after the first fetch on a node) — the whole matrix never rides one
    object and a task never pulls blocks it does not reference."""
    ids = np.asarray(ids, dtype=np.int64)
    bounds = np.asarray(boundaries, dtype=np.int64)
    p = np.searchsorted(bounds, ids, side="right") - 1
    out = None
    for blk in np.unique(p):
        sel = p == blk
        b = ray.get(block_refs[int(blk)])
        rows = b[ids[sel] - bounds[blk]]
        if out is None:
            out = np.empty((len(ids),) + b.shape[1:], dtype=b.dtype)
        out[sel] = rows
    if out is None:
        raise ValueError("empty id set")
    return out


def _mean_rows(X: np.ndarray, self_ids: np.ndarray, nbr: np.ndarray,
               Xsrc: np.ndarray | None = None) -> np.ndarray:
    """mean over {v} ∪ sampled neighbors of the rows of X (reference
    MultiMean: self row included). nbr is (n, S) with -1 padding."""
    src = X[self_ids] if Xsrc is None else Xsrc
    mask = nbr >= 0
    gathered = X[np.where(mask, nbr, 0)] * mask[:, :, None]
    cnt = 1.0 + mask.sum(axis=1)
    return (src + gathered.sum(axis=1)) / cnt[:, None]


def _support_m1(feat_blocks, s2_blocks, bounds, sup: np.ndarray):
    """Layer-1 mean inputs for a sorted support set: gathers the support
    nodes' layer-2 samples, then ONLY the feature rows those samples and
    the support itself touch (per-block fetches — no V-sized read)."""
    s2_sup = _gather_rows(s2_blocks, bounds, sup)        # (U, S2)
    ids_x = np.unique(np.concatenate([sup, s2_sup.ravel()]))
    ids_x = ids_x[ids_x >= 0]
    Xl = _gather_rows(feat_blocks, bounds, ids_x)

    def local(ids):
        return np.searchsorted(ids_x, np.where(ids >= 0, ids, ids_x[0]))

    nbr_l = np.where(s2_sup >= 0, local(s2_sup), -1)
    m1 = _mean_rows(Xl, local(sup), nbr_l)               # (U, f)
    return m1


@ray.remote
def _shard_grad(w_ref, feat_blocks, s1_blocks, s2_blocks, bounds,
                triples: np.ndarray, cfg: dict) -> tuple:
    """Forward + backward for one shard of (v, pos, neg) triples.

    Returns (gW1, gW2, loss_sum, n). All gathers are vectorized numpy;
    features and neighbor samples arrive as RANGE-SHARDED block refs
    (one per graph partition) and only the blocks this shard's support
    set touches are fetched — nothing graph-global rides one object or
    enters this task.
    """
    W1, W2 = w_ref
    act = cfg["activation"]
    Q = cfg["negative_sample_weight"]

    nodes = triples.ravel()             # 3B node ids, may repeat
    B = len(triples)
    # layer-1 support set: the triple nodes plus their layer-1 samples
    n1 = _gather_rows(s1_blocks, bounds, nodes)          # (3B, S1)
    uniq = np.unique(np.concatenate([nodes, n1.ravel()]))
    sup = uniq[uniq >= 0]               # drop the -1 padding id
    # compute h1 for every support node from its OWN layer-2 sample
    m1 = _support_m1(feat_blocks, s2_blocks, bounds, sup)  # (U, f)
    z1 = m1 @ W1.T
    h1 = _act(z1, act)                                   # (U, dim)
    # lift back: h1 row for any id via searchsorted on sup (sorted)
    def lift(ids):
        pos = np.searchsorted(sup, np.where(ids >= 0, ids, sup[0]))
        return pos
    h_nodes = h1[lift(nodes)]                            # (3B, dim)
    mask1 = n1 >= 0
    h_nbr = h1[lift(n1)] * mask1[:, :, None]             # (3B, S1, dim)
    cnt2 = 1.0 + mask1.sum(axis=1)
    m2 = (h_nodes + h_nbr.sum(axis=1)) / cnt2[:, None]   # (3B, dim)
    z2 = m2 @ W2.T
    e = _act(z2, act)                                    # (3B, dim)
    nrm = np.linalg.norm(e, axis=1)
    nrm_safe = np.where(nrm > 0, nrm, 1.0)
    o = e / nrm_safe[:, None]                            # normalized

    ov, op, on = o[:B], o[B:2 * B], o[2 * B:]
    aff_p = (ov * op).sum(axis=1)
    aff_n = (ov * on).sum(axis=1)
    sp = 1.0 / (1.0 + np.exp(-aff_p))
    sn = 1.0 / (1.0 + np.exp(-aff_n))
    loss = float((-np.log(np.clip(sp, 1e-15, None))
                  - Q * np.log(np.clip(1.0 - sn, 1e-15, None))).sum())

    # d loss / d o rows
    go = np.zeros_like(o)
    gp = -(1.0 - sp)[:, None]
    gn = (Q * sn)[:, None]
    go[:B] = gp * op + gn * on
    go[B:2 * B] = gp * ov
    go[2 * B:] = gn * ov
    # through row normalization: d e = (g - (g·ô) ô) / ||e||
    ge = (go - (go * o).sum(axis=1, keepdims=True) * o) / nrm_safe[:, None]
    gz2 = ge * _act_grad(e, act)                         # (3B, dim)
    gW2 = gz2.T @ m2
    gm2 = gz2 @ W2                                       # (3B, dim)
    # through the layer-2 mean back to h1 rows of self + sampled nbrs
    gh1 = np.zeros_like(h1)
    coef = gm2 / cnt2[:, None]
    np.add.at(gh1, lift(nodes), coef)
    flat_ids = lift(n1).ravel()
    flat_g = (coef[:, None, :] * mask1[:, :, None]).reshape(-1, W2.shape[0])
    np.add.at(gh1, flat_ids, flat_g)
    gz1 = gh1 * _act_grad(h1, act)
    gW1 = gz1.T @ m1
    return gW1, gW2, loss, B


def graphsage_train(
    graph,
    features: np.ndarray | None = None,
    embedding_dim: int = 64,
    sample_sizes: tuple[int, int] = (25, 10),
    search_depth: int = 5,
    negative_sample_weight: float = 20.0,
    activation: str = "sigmoid",
    epochs: int = 10,
    learning_rate: float = 0.1,
    tolerance: float = 1e-4,
    num_shards: int = 16,
    seed: int = 42,
) -> dict:
    """Train GraphSAGE weights; returns {"W1", "W2", "losses", ...}.

    ``features``: (V, f) float64 matrix; default = [degree, 1] (the
    reference's degreeAsProperty fallback). Deterministic at any
    parallelism: fixed shard split + shard-order gradient combine.
    """
    from graph_data_science_ray.functions.node2vec import _walk_matrix

    V = graph.node_count
    if features is None:
        deg = graph.out_degrees().astype(np.float64)
        features = np.stack([deg, np.ones(V)], axis=1)
    features = np.asarray(features, dtype=np.float64)
    f = features.shape[1]
    S1, S2 = sample_sizes

    # sample matrices are born partition-held (one block ref per graph
    # partition, never assembled V-sized anywhere)
    s1_blocks = _sample_neighbor_blocks(graph, S1, seed, layer=1)
    s2_blocks = _sample_neighbor_blocks(graph, S2, seed, layer=2)
    bounds = np.asarray(graph.boundaries, dtype=np.int64)

    # positives: endpoint of a uniform walk of depth uniform(1..searchDepth)
    walks = _walk_matrix(graph, walk_length=search_depth + 1,
                         walks_per_node=1, seed=seed + 13)
    depth = 1 + (splitmix64(np.arange(V, dtype=np.uint64) + np.uint64(seed))
                 % np.uint64(search_depth)).astype(np.int64)
    pos = walks[np.arange(V), np.minimum(depth, walks.shape[1] - 1)]
    # walk may be padded (-1) before the chosen depth: take last valid hop
    last_valid = (walks >= 0).sum(axis=1) - 1
    pos = np.where(pos >= 0, pos, walks[np.arange(V), np.maximum(last_valid, 0)])
    # negatives: degree-weighted (BatchSampler.negativeBatch)
    deg_all = graph.out_degrees().astype(np.float64)
    cdf = np.cumsum(np.maximum(deg_all, 1e-9))
    cdf /= cdf[-1]
    u = (splitmix64(np.arange(V, dtype=np.uint64) + np.uint64(seed + 31))
         % np.uint64(1 << 53)).astype(np.float64) / float(1 << 53)
    neg = np.searchsorted(cdf, u, side="right").clip(0, V - 1)

    triples = np.stack([np.arange(V, dtype=np.int64), pos, neg], axis=1)
    # drop degenerate self-positives (isolated nodes)
    triples = triples[triples[:, 0] != triples[:, 1]]
    shards = np.array_split(triples, num_shards)
    shard_refs = [ray.put(s) for s in shards if len(s)]

    rng1 = (splitmix64(np.arange(embedding_dim * f, dtype=np.uint64)
                       + np.uint64(seed)) % np.uint64(10_000)
            ).astype(np.float64) / 10_000.0 - 0.5
    rng2 = (splitmix64(np.arange(embedding_dim * embedding_dim,
                                 dtype=np.uint64) + np.uint64(seed + 1))
            % np.uint64(10_000)).astype(np.float64) / 10_000.0 - 0.5
    W1 = rng1.reshape(embedding_dim, f) / np.sqrt(max(f, 1))
    W2 = rng2.reshape(embedding_dim, embedding_dim) / np.sqrt(embedding_dim)

    feat_blocks = _shard_rows(features, bounds)
    cfg = {"activation": activation,
           "negative_sample_weight": float(negative_sample_weight)}

    mW1 = np.zeros_like(W1); vW1 = np.zeros_like(W1)
    mW2 = np.zeros_like(W2); vW2 = np.zeros_like(W2)
    beta1, beta2, eps = 0.9, 0.999, 1e-8
    prev = np.inf
    losses = []
    n_total = sum(len(s) for s in shards)
    for it in range(1, epochs + 1):
        w_ref = ray.put((W1, W2))
        parts = ray.get([
            _shard_grad.remote(w_ref, feat_blocks, s1_blocks, s2_blocks,
                               bounds, sref, cfg)
            for sref in shard_refs
        ])
        gW1 = np.zeros_like(W1); gW2 = np.zeros_like(W2); loss = 0.0
        for p1, p2, ls, _n in parts:     # fixed shard order
            gW1 += p1; gW2 += p2; loss += ls
        gW1 /= n_total; gW2 /= n_total; loss /= n_total
        losses.append(loss)
        mW1 = beta1 * mW1 + (1 - beta1) * gW1
        vW1 = beta2 * vW1 + (1 - beta2) * gW1 * gW1
        mW2 = beta1 * mW2 + (1 - beta1) * gW2
        vW2 = beta2 * vW2 + (1 - beta2) * gW2 * gW2
        c1, c2 = 1 - beta1 ** it, 1 - beta2 ** it
        W1 = W1 - learning_rate * (mW1 / c1) / (np.sqrt(vW1 / c2) + eps)
        W2 = W2 - learning_rate * (mW2 / c1) / (np.sqrt(vW2 / c2) + eps)
        if np.isfinite(prev) and abs(prev - loss) <= tolerance * max(abs(prev), 1e-12):
            break
        prev = loss

    return {"W1": W1, "W2": W2, "losses": losses,
            "feat_blocks": feat_blocks, "s1_blocks": s1_blocks,
            "s2_blocks": s2_blocks, "boundaries": bounds,
            "activation": activation}


@ray.remote
def _embed_part(pi: int, w_ref, feat_blocks, s1_blocks, s2_blocks, bounds,
                activation: str) -> tuple[int, np.ndarray]:
    """Final embeddings for one partition's owned nodes (inference uses
    the same sampled neighborhoods, GraphSageEmbeddingsGenerator).
    Supports are neighborhood-local, so the per-block gathers touch only
    this partition's range plus its sampled neighbors' blocks."""
    W1, W2 = w_ref
    start, end = int(bounds[pi]), int(bounds[pi + 1])
    own = np.arange(start, end, dtype=np.int64)
    if not len(own):
        return start, np.zeros((0, W2.shape[0]), dtype=np.float64)
    # support = own ∪ their layer-1 samples; h1 needs each support
    # node's own layer-2 sample
    n1 = _gather_rows(s1_blocks, bounds, own)
    sup = np.unique(np.concatenate([own, n1.ravel()]))
    sup = sup[sup >= 0]
    h1 = _act(
        _support_m1(feat_blocks, s2_blocks, bounds, sup) @ W1.T, activation
    )
    pos = np.searchsorted(sup, np.where(n1 >= 0, n1, sup[0]))
    mask = n1 >= 0
    h_nbr = h1[pos] * mask[:, :, None]
    h_own = h1[np.searchsorted(sup, own)]
    m2 = (h_own + h_nbr.sum(axis=1)) / (1.0 + mask.sum(axis=1))[:, None]
    e = _act(m2 @ W2.T, activation)
    nrm = np.linalg.norm(e, axis=1)
    return start, e / np.where(nrm > 0, nrm, 1.0)[:, None]


def graphsage(
    graph,
    features: np.ndarray | None = None,
    embedding_dim: int = 64,
    sample_sizes: tuple[int, int] = (25, 10),
    **train_kwargs,
) -> pd.DataFrame:
    """Train + embed all nodes. Returns (node, embedding) like fastrp."""
    model = graphsage_train(
        graph, features=features, embedding_dim=embedding_dim,
        sample_sizes=sample_sizes, **train_kwargs,
    )
    w_ref = ray.put((model["W1"], model["W2"]))
    parts = ray.get([
        _embed_part.remote(
            pi, w_ref, model["feat_blocks"], model["s1_blocks"],
            model["s2_blocks"], model["boundaries"], model["activation"],
        )
        for pi in range(graph.num_partitions)
    ])
    embs = np.concatenate([e for _s, e in sorted(parts, key=lambda t: t[0])])
    ids = np.arange(graph.node_count, dtype=np.int64)
    node = graph.idmap.keys[ids] if graph.idmap is not None else ids
    return pd.DataFrame({"node": node, "embedding": [r for r in embs]})

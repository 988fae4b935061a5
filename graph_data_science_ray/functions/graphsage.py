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


@ray.remote
def _feat_block_parts(tbl) -> np.ndarray:
    """Distinct __part values inside one arrow block (tiny)."""
    if tbl.num_rows == 0:
        return np.zeros(0, dtype=np.int64)
    return np.unique(np.asarray(tbl["__part"]).astype(np.int64))


@ray.remote
def _feat_extract_part(p: int, refs: list, start: int, end: int,
                       id_col: str, vec_col: str) -> np.ndarray:
    """Assemble one partition's (n_p, f) feature block from the arrow
    blocks that contain its rows (plasma reads, node-local after first
    fetch). Validates exact 0-gap coverage of the partition's id range."""
    ids_all, vecs_all = [], []
    for r in refs:
        tbl = ray.get(r) if isinstance(r, ray.ObjectRef) else r
        part = np.asarray(tbl["__part"]).astype(np.int64)
        sel = part == p
        if not sel.any():
            continue
        ids_all.append(np.asarray(tbl[id_col]).astype(np.int64)[sel])
        vecs = tbl[vec_col].to_pylist()
        vecs_all.extend(v for v, keep in zip(vecs, sel) if keep)
    ids = (
        np.concatenate(ids_all) if ids_all else np.zeros(0, dtype=np.int64)
    )
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    if not np.array_equal(ids, np.arange(start, end, dtype=np.int64)):
        raise ValueError(
            f"feature Dataset must cover partition ids [{start},{end}) "
            f"exactly once; got {len(ids)} rows"
        )
    mat = np.stack(
        [np.asarray(vecs_all[i], dtype=np.float64) for i in order]
    ) if len(order) else np.zeros((0, 1), dtype=np.float64)
    return np.ascontiguousarray(mat)


def _feat_blocks_from_ds(feat_ds, bounds: np.ndarray, id_col: str,
                         vec_col: str) -> list:
    """Range-shard a ``(node, vector)`` Dataset into one plasma feature
    block per graph partition WITHOUT a driver-side (V, f) matrix: rows
    are tagged with their owning partition inside ``map_batches``, and a
    per-partition remote task assembles its block from only the arrow
    blocks that contain its rows — the driver sees P tiny part-id
    arrays, never a feature value. The input-boundary counterpart of the
    partition-held compute path."""

    def tag(df):
        df = df.copy()
        ids = df[id_col].to_numpy(dtype=np.int64)
        df["__part"] = np.searchsorted(bounds, ids, side="right") - 1
        return df

    tagged = feat_ds.map_batches(tag, batch_format="pandas").materialize()
    refs = tagged.to_arrow_refs()
    parts_in = ray.get([_feat_block_parts.remote(r) for r in refs])
    P = len(bounds) - 1
    blocks = []
    for p in range(P):
        hit = [r for r, ps in zip(refs, parts_in) if p in ps]
        blocks.append(
            _feat_extract_part.remote(
                p, hit, int(bounds[p]), int(bounds[p + 1]), id_col, vec_col
            )
        )
    return blocks


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


def _pool_agg(P: np.ndarray, nbr_l: np.ndarray):
    """Element-wise max over each node's sampled-neighbor rows of P
    (reference MaxPoolingAggregator.java:37 — FC+relu per neighbor, then
    max-pool). ``nbr_l`` is (n, S) LOCAL indices into P with -1 padding.
    Returns (agg (n, dp), amax (n, dp) local row index per max entry or
    -1 where a node has no neighbors — the backward routing table)."""
    n, S = nbr_l.shape
    dp = P.shape[1]
    mask = nbr_l >= 0
    G = P[np.where(mask, nbr_l, 0)]                      # (n, S, dp)
    G = np.where(mask[:, :, None], G, -np.inf)
    k = G.argmax(axis=1)                                 # (n, dp)
    agg = np.take_along_axis(G, k[:, None, :], axis=1)[:, 0, :]
    has = mask.any(axis=1)
    agg = np.where(has[:, None], agg, 0.0)
    amax = np.where(
        has[:, None], np.take_along_axis(nbr_l, k, axis=1), -1
    )
    return agg, amax


def _pool_backward(g_agg: np.ndarray, amax: np.ndarray, P: np.ndarray,
                   H: np.ndarray, Wp: np.ndarray):
    """Backward through max-pool + relu FC: routes each output unit's
    gradient to its argmax neighbor row, then through relu and the pool
    weights. Returns (gH, gWp)."""
    gP = np.zeros_like(P)
    valid = amax >= 0
    rows = np.where(valid, amax, 0)
    cols = np.broadcast_to(np.arange(P.shape[1]), amax.shape)
    np.add.at(gP, (rows.ravel(), cols.ravel()),
              (g_agg * valid).ravel())
    gZ = gP * (P > 0)                                    # relu'
    return gZ @ Wp, gZ.T @ H


def _mean_rows(X: np.ndarray, self_ids: np.ndarray, nbr: np.ndarray,
               Xsrc: np.ndarray | None = None) -> np.ndarray:
    """mean over {v} ∪ sampled neighbors of the rows of X (reference
    MultiMean: self row included). nbr is (n, S) with -1 padding."""
    src = X[self_ids] if Xsrc is None else Xsrc
    mask = nbr >= 0
    gathered = X[np.where(mask, nbr, 0)] * mask[:, :, None]
    cnt = 1.0 + mask.sum(axis=1)
    return (src + gathered.sum(axis=1)) / cnt[:, None]


def _project_rows(raw: np.ndarray, labl: np.ndarray, Wps: list) -> np.ndarray:
    """Label-wise feature projection (reference
    MultiLabelFeatureFunction.java:33 / LabelwiseFeatureProjection):
    row i -> raw[i] @ Wps[label(i)].T. Per-label feature widths live as
    ZERO-PADDED columns of a common (dp, f_max) weight shape — padded
    columns contribute 0 forward and receive exactly 0 gradient
    (gWp = gX^T @ raw and the raw entries are 0), so padding is
    output-exact, not an approximation."""
    dp = Wps[0].shape[0]
    out = np.zeros((len(raw), dp), dtype=np.float64)
    for lab in np.unique(labl):
        sel = labl == lab
        out[sel] = raw[sel] @ Wps[int(lab)].T
    return out


def _label_grads(gXp: np.ndarray, raw: np.ndarray, labl: np.ndarray,
                 n_labels: int) -> list:
    """Per-label projection gradients: gWp[l] = Σ_{i: lab=l} gXp_i ⊗ raw_i."""
    dp, fmax = gXp.shape[1], raw.shape[1]
    out = [np.zeros((dp, fmax), dtype=np.float64) for _ in range(n_labels)]
    for lab in np.unique(labl):
        sel = labl == lab
        out[int(lab)] = gXp[sel].T @ raw[sel]
    return out


def _support_inputs(feat_blocks, s2_blocks, bounds, sup: np.ndarray,
                    ml: tuple | None = None):
    """Layer-1 inputs for a sorted support set: gathers the support
    nodes' layer-2 samples, then ONLY the feature rows those samples and
    the support itself touch (per-block fetches — no V-sized read).
    Returns (Xl, self_l, nbr_l, mlcache) with LOCAL indices into Xl.

    ``ml=(lab_blocks, Wps)``: multi-label mode — Xl is the label-wise
    PROJECTED matrix and mlcache carries (raw, labl) for the projection
    backward; single-label mode returns the raw gather and mlcache=None."""
    s2_sup = _gather_rows(s2_blocks, bounds, sup)        # (U, S2)
    ids_x = np.unique(np.concatenate([sup, s2_sup.ravel()]))
    ids_x = ids_x[ids_x >= 0]
    Xl = _gather_rows(feat_blocks, bounds, ids_x)
    mlcache = None
    if ml is not None:
        lab_blocks, Wps = ml
        labl = _gather_rows(lab_blocks, bounds, ids_x).astype(np.int64)
        raw = Xl
        Xl = _project_rows(raw, labl, Wps)
        mlcache = (raw, labl)

    def local(ids):
        return np.searchsorted(ids_x, np.where(ids >= 0, ids, ids_x[0]))

    nbr_l = np.where(s2_sup >= 0, local(s2_sup), -1)
    return Xl, local(sup), nbr_l, mlcache


def _support_m1(feat_blocks, s2_blocks, bounds, sup: np.ndarray,
                ml: tuple | None = None):
    """Layer-1 MEAN inputs for a sorted support set. Returns (m1, cache)
    where cache = (Xl, self_l, nbr_l, mlcache) for the projection
    backward (unused in single-label mode)."""
    Xl, self_l, nbr_l, mlcache = _support_inputs(
        feat_blocks, s2_blocks, bounds, sup, ml=ml
    )
    return _mean_rows(Xl, self_l, nbr_l), (Xl, self_l, nbr_l, mlcache)


def _support_m1_pool(feat_blocks, s2_blocks, bounds, sup: np.ndarray,
                     Wp1: np.ndarray, ml: tuple | None = None):
    """Layer-1 MAX-POOL inputs: m1 = concat(x_v, max-pool of
    relu(x_u Wp1^T) over v's layer-2 sample). Returns (m1, cache) where
    cache = (Xl, P1, amax1, self_l, mlcache) for the backward pass."""
    Xl, self_l, nbr_l, mlcache = _support_inputs(
        feat_blocks, s2_blocks, bounds, sup, ml=ml
    )
    P1 = np.maximum(Xl @ Wp1.T, 0.0)
    agg1, amax1 = _pool_agg(P1, nbr_l)
    m1 = np.concatenate([Xl[self_l], agg1], axis=1)
    return m1, (Xl, P1, amax1, self_l, nbr_l, mlcache)


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
    act = cfg["activation"]
    Q = cfg["negative_sample_weight"]
    agg_kind = cfg.get("aggregator", "mean")
    n_labels = cfg.get("n_labels", 0)
    lab_blocks = cfg.get("lab_blocks")
    if agg_kind == "pool":
        W1, W2, Wp1, Wp2, *Wps = w_ref
    else:
        W1, W2, *Wps = w_ref
    ml = (lab_blocks, list(Wps)) if n_labels else None

    nodes = triples.ravel()             # 3B node ids, may repeat
    B = len(triples)
    # layer-1 support set: the triple nodes plus their layer-1 samples
    n1 = _gather_rows(s1_blocks, bounds, nodes)          # (3B, S1)
    uniq = np.unique(np.concatenate([nodes, n1.ravel()]))
    sup = uniq[uniq >= 0]               # drop the -1 padding id
    # compute h1 for every support node from its OWN layer-2 sample
    if agg_kind == "pool":
        m1, (Xl, P1, amax1, self_l1, nbr_l0, mlcache) = _support_m1_pool(
            feat_blocks, s2_blocks, bounds, sup, Wp1, ml=ml
        )
    else:
        m1, (Xl, self_l1, nbr_l0, mlcache) = _support_m1(
            feat_blocks, s2_blocks, bounds, sup, ml=ml
        )                                                # (U, f)
    z1 = m1 @ W1.T
    h1 = _act(z1, act)                                   # (U, dim)
    # lift back: h1 row for any id via searchsorted on sup (sorted)
    def lift(ids):
        pos = np.searchsorted(sup, np.where(ids >= 0, ids, sup[0]))
        return pos
    h_nodes = h1[lift(nodes)]                            # (3B, dim)
    if agg_kind == "pool":
        nbr1_l = np.where(n1 >= 0, lift(n1), -1)
        P2 = np.maximum(h1 @ Wp2.T, 0.0)
        agg2, amax2 = _pool_agg(P2, nbr1_l)
        m2 = np.concatenate([h_nodes, agg2], axis=1)
    else:
        mask1 = n1 >= 0
        h_nbr = h1[lift(n1)] * mask1[:, :, None]         # (3B, S1, dim)
        cnt2 = 1.0 + mask1.sum(axis=1)
        m2 = (h_nodes + h_nbr.sum(axis=1)) / cnt2[:, None]  # (3B, dim)
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
    gm2 = gz2 @ W2                                       # (3B, dim|dim+dp)
    gh1 = np.zeros_like(h1)
    if agg_kind == "pool":
        dim = h1.shape[1]
        np.add.at(gh1, lift(nodes), gm2[:, :dim])
        gh1_pool, gWp2 = _pool_backward(gm2[:, dim:], amax2, P2, h1, Wp2)
        gh1 += gh1_pool
    else:
        # through the layer-2 mean back to h1 rows of self + sampled nbrs
        coef = gm2 / cnt2[:, None]
        np.add.at(gh1, lift(nodes), coef)
        flat_ids = lift(n1).ravel()
        flat_g = (coef[:, None, :] * mask1[:, :, None]).reshape(-1, W2.shape[0])
        np.add.at(gh1, flat_ids, flat_g)
    gz1 = gh1 * _act_grad(h1, act)
    gW1 = gz1.T @ m1
    extra = []
    if agg_kind == "pool":
        gm1 = gz1 @ W1
        f = Xl.shape[1]
        gX_pool, gWp1 = _pool_backward(gm1[:, f:], amax1, P1, Xl, Wp1)
        extra = [gWp1, gWp2]
        if ml is not None:
            # gXp = pooled-branch gradient + the self (concat) branch
            gXp = gX_pool
            np.add.at(gXp, self_l1, gm1[:, :f])
            raw, labl = mlcache
            extra += _label_grads(gXp, raw, labl, n_labels)
    elif ml is not None:
        # through the layer-1 mean back to the projected feature rows
        gm1 = gz1 @ W1                                   # (U, dp)
        raw, labl = mlcache
        gXp = np.zeros_like(Xl)
        mask0 = nbr_l0 >= 0
        coef1 = gm1 / (1.0 + mask0.sum(axis=1))[:, None]
        np.add.at(gXp, self_l1, coef1)
        np.add.at(
            gXp, np.where(mask0, nbr_l0, 0).ravel(),
            (coef1[:, None, :] * mask0[:, :, None]).reshape(-1, gm1.shape[1]),
        )
        extra = _label_grads(gXp, raw, labl, n_labels)
    if extra:
        return (gW1, gW2, *extra, loss, B)
    return gW1, gW2, loss, B


def graphsage_train(
    graph,
    features=None,
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
    feature_id_col: str = "node_id",
    feature_vec_col: str = "features",
    aggregator: str = "mean",
    node_labels=None,
    projected_dim: int | None = None,
    label_col: str = "label",
) -> dict:
    """Train GraphSAGE weights; returns {"W1", "W2", "losses", ...}.

    ``features``: (V, f) float64 matrix, or a ``(node, vector)``
    Ray Dataset (columns ``feature_id_col``/``feature_vec_col``) which
    is sharded partition-side so no O(V) matrix ever exists on the
    driver (the 10^10-node input contract); default = [degree, 1] (the
    reference's degreeAsProperty fallback). Deterministic at any
    parallelism: fixed shard split + shard-order gradient combine.

    ``node_labels`` + ``projected_dim``: MULTI-LABEL mode (reference
    MultiLabelFeatureFunction.java:33) — each node carries one label id
    in [0, L) ((V,) int array, or a ``(node, label)`` Dataset sharded
    partition-side) and a per-label TRAINED projection
    ``Wp[l] : f_max -> projected_dim`` feeds the shared layers.
    Per-label feature widths enter as zero-padded columns, which is
    output-exact (padded columns contribute 0 forward and receive 0
    gradient — see :func:`_project_rows`).
    """
    from graph_data_science_ray.functions.node2vec import _walk_matrix

    V = graph.node_count
    bounds = np.asarray(graph.boundaries, dtype=np.int64)
    feat_blocks = None
    if features is None:
        deg = graph.out_degrees().astype(np.float64)
        features = np.stack([deg, np.ones(V)], axis=1)
    elif not isinstance(features, np.ndarray):
        # (node, vector) Dataset: shard partition-side — no O(V) driver
        # matrix at the input boundary
        first = features.take(1)[0]
        f = len(np.asarray(first[feature_vec_col], dtype=np.float64))
        feat_blocks = _feat_blocks_from_ds(
            features, bounds, feature_id_col, feature_vec_col
        )
    if feat_blocks is None:
        features = np.asarray(features, dtype=np.float64)
        f = features.shape[1]

    # multi-label: shard labels partition-side, swap f to the projected
    # width (the shared layers see only projected rows)
    lab_blocks, n_labels, f_raw = None, 0, int(f)
    if node_labels is not None:
        if projected_dim is None:
            raise ValueError("multi-label mode requires projected_dim")
        if isinstance(node_labels, np.ndarray):
            labels_arr = np.asarray(node_labels, dtype=np.int64)
            if len(labels_arr) != V:
                raise ValueError("node_labels must have one entry per node")
            n_labels = int(labels_arr.max()) + 1
            lab_blocks = _shard_rows(labels_arr, bounds)
        else:
            n_labels = int(node_labels.max(label_col)) + 1
            lab_blocks = _feat_blocks_from_ds(
                node_labels, bounds, feature_id_col, label_col
            )
        f = int(projected_dim)
    S1, S2 = sample_sizes

    # sample matrices are born partition-held (one block ref per graph
    # partition, never assembled V-sized anywhere)
    s1_blocks = _sample_neighbor_blocks(graph, S1, seed, layer=1)
    s2_blocks = _sample_neighbor_blocks(graph, S2, seed, layer=2)

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

    def _rand(n, salt):
        return ((splitmix64(np.arange(n, dtype=np.uint64)
                            + np.uint64(seed + salt)) % np.uint64(10_000)
                 ).astype(np.float64) / 10_000.0 - 0.5)

    if aggregator == "pool":
        # MaxPoolingAggregator (ref MaxPoolingAggregator.java:37): per
        # neighbor FC+relu then element-wise max, concatenated with the
        # self row before the layer weights — so W_k widens to
        # (dim, in + pool_dim) and two trained pool matrices appear
        in1, in2 = f + f, 2 * embedding_dim
        Wp1 = _rand(f * f, 7).reshape(f, f) / np.sqrt(max(f, 1))
        Wp2 = (_rand(embedding_dim * embedding_dim, 8)
               .reshape(embedding_dim, embedding_dim)
               / np.sqrt(embedding_dim))
    else:
        in1, in2 = f, embedding_dim
        Wp1 = Wp2 = None
    W1 = _rand(embedding_dim * in1, 0).reshape(embedding_dim, in1) / np.sqrt(max(in1, 1))
    W2 = _rand(embedding_dim * in2, 1).reshape(embedding_dim, in2) / np.sqrt(in2)

    if feat_blocks is None:
        feat_blocks = _shard_rows(features, bounds)
    cfg = {"activation": activation,
           "negative_sample_weight": float(negative_sample_weight),
           "aggregator": aggregator,
           "n_labels": n_labels, "lab_blocks": lab_blocks}

    # Adam over the weight list (2 matrices for mean, 4 for pool, plus
    # one per-label projection each in multi-label mode) with the same
    # fixed-shard-order gradient combine
    Ws = [W1, W2] if aggregator != "pool" else [W1, W2, Wp1, Wp2]
    if n_labels:
        Ws += [
            _rand(f * f_raw, 101 + lab).reshape(f, f_raw)
            / np.sqrt(max(f_raw, 1))
            for lab in range(n_labels)
        ]
    mS = [np.zeros_like(w) for w in Ws]
    vS = [np.zeros_like(w) for w in Ws]
    beta1, beta2, eps = 0.9, 0.999, 1e-8
    prev = np.inf
    losses = []
    n_total = sum(len(s) for s in shards)
    for it in range(1, epochs + 1):
        w_ref = ray.put(tuple(Ws))
        parts = ray.get([
            _shard_grad.remote(w_ref, feat_blocks, s1_blocks, s2_blocks,
                               bounds, sref, cfg)
            for sref in shard_refs
        ])
        gS = [np.zeros_like(w) for w in Ws]
        loss = 0.0
        for part in parts:               # fixed shard order
            *grads, ls, _n = part
            for g, p in zip(gS, grads):
                g += p
            loss += ls
        for g in gS:
            g /= n_total
        loss /= n_total
        losses.append(loss)
        c1, c2 = 1 - beta1 ** it, 1 - beta2 ** it
        for i in range(len(Ws)):
            mS[i] = beta1 * mS[i] + (1 - beta1) * gS[i]
            vS[i] = beta2 * vS[i] + (1 - beta2) * gS[i] * gS[i]
            Ws[i] = Ws[i] - learning_rate * (mS[i] / c1) / (
                np.sqrt(vS[i] / c2) + eps
            )
        if np.isfinite(prev) and abs(prev - loss) <= tolerance * max(abs(prev), 1e-12):
            break
        prev = loss

    out = {"W1": Ws[0], "W2": Ws[1], "losses": losses,
           "feat_blocks": feat_blocks, "s1_blocks": s1_blocks,
           "s2_blocks": s2_blocks, "boundaries": bounds,
           "activation": activation, "aggregator": aggregator,
           "n_labels": n_labels, "lab_blocks": lab_blocks}
    base = 4 if aggregator == "pool" else 2
    if aggregator == "pool":
        out["Wp1"], out["Wp2"] = Ws[2], Ws[3]
    if n_labels:
        out["Wps"] = Ws[base:]
    return out


@ray.remote
def _embed_part(pi: int, w_ref, feat_blocks, s1_blocks, s2_blocks, bounds,
                activation: str, aggregator: str = "mean",
                n_labels: int = 0, lab_blocks=None) -> tuple[int, np.ndarray]:
    """Final embeddings for one partition's owned nodes (inference uses
    the same sampled neighborhoods, GraphSageEmbeddingsGenerator).
    Supports are neighborhood-local, so the per-block gathers touch only
    this partition's range plus its sampled neighbors' blocks."""
    if aggregator == "pool":
        W1, W2, Wp1, Wp2, *Wps = w_ref
    else:
        W1, W2, *Wps = w_ref
    ml = (lab_blocks, list(Wps)) if n_labels else None
    start, end = int(bounds[pi]), int(bounds[pi + 1])
    own = np.arange(start, end, dtype=np.int64)
    if not len(own):
        return start, np.zeros((0, W2.shape[0]), dtype=np.float64)
    # support = own ∪ their layer-1 samples; h1 needs each support
    # node's own layer-2 sample
    n1 = _gather_rows(s1_blocks, bounds, own)
    sup = np.unique(np.concatenate([own, n1.ravel()]))
    sup = sup[sup >= 0]
    if aggregator == "pool":
        m1, _cache = _support_m1_pool(
            feat_blocks, s2_blocks, bounds, sup, Wp1, ml=ml
        )
    else:
        m1, _cache = _support_m1(feat_blocks, s2_blocks, bounds, sup, ml=ml)
    h1 = _act(m1 @ W1.T, activation)
    pos = np.searchsorted(sup, np.where(n1 >= 0, n1, sup[0]))
    mask = n1 >= 0
    h_own = h1[np.searchsorted(sup, own)]
    if aggregator == "pool":
        nbr1_l = np.where(mask, pos, -1)
        P2 = np.maximum(h1 @ Wp2.T, 0.0)
        agg2, _amax2 = _pool_agg(P2, nbr1_l)
        m2 = np.concatenate([h_own, agg2], axis=1)
    else:
        h_nbr = h1[pos] * mask[:, :, None]
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
    agg_kind = model.get("aggregator", "mean")
    n_labels = model.get("n_labels", 0)
    if agg_kind == "pool":
        wtuple = (model["W1"], model["W2"], model["Wp1"], model["Wp2"])
    else:
        wtuple = (model["W1"], model["W2"])
    if n_labels:
        wtuple = wtuple + tuple(model["Wps"])
    w_ref = ray.put(wtuple)
    parts = ray.get([
        _embed_part.remote(
            pi, w_ref, model["feat_blocks"], model["s1_blocks"],
            model["s2_blocks"], model["boundaries"], model["activation"],
            agg_kind, n_labels, model.get("lab_blocks"),
        )
        for pi in range(graph.num_partitions)
    ])
    embs = np.concatenate([e for _s, e in sorted(parts, key=lambda t: t[0])])
    ids = np.arange(graph.node_count, dtype=np.int64)
    node = graph.idmap.keys[ids] if graph.idmap is not None else ids
    return pd.DataFrame({"node": node, "embedding": [r for r in embs]})

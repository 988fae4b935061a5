"""DecisionTree + RandomForest model family for the node pipelines.

Reference: ml/ml-algo/src/main/java/org/neo4j/gds/ml/models/randomforest/
RandomForestClassifierTrainer.java (bootstrap + per-tree parallel
training + majority vote), .../decisiontree/DecisionTreeTrainer.java
(greedy best-split on Gini / MSE with maxDepth + minSplitSize),
.../decisiontree/DatasetBootstrapper.java (seeded with-replacement
bootstrap) and .../FeatureBagger.java (per-split feature subsampling).

Ray-Data-first shape: the canonical training matrix is assembled ONCE
(key-sorted shards → block-order concat in a single remote task, so the
row order — and therefore every downstream seeded draw — is independent
of the caller's block layout), parked in the object store, and
``num_trees`` Ray tasks each train one tree against it in parallel
(the trees, a few KB of int/float arrays, are the only thing the driver
holds).  Prediction broadcasts the forest and scores batches with a
vectorized level-by-level traversal — no Python per-row recursion.

Like the reference (which trains from HugeObjectArray-resident
features), training assumes the bootstrap source fits a worker; at
corpus scale feed the pipeline a bounded deterministic sample.

Determinism contract: all seeded draws are ``splitmix64`` functions of
(seed, tree, position); each tree is built single-threaded from the
canonical matrix; votes combine in fixed tree order ⇒ byte-identical
models and predictions at any parallelism or block layout.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from graph_data_science_ray._util import splitmix64

# node-array encoding: feature[i] < 0 marks a leaf (value[i] = class
# index or regression mean); internal nodes route x[feature] <= threshold
# to left[i], else right[i]


def _gini_best_threshold(xs: np.ndarray, onehot: np.ndarray):
    """Best split of one sorted feature column by Gini impurity.

    Returns ``(weighted_children_impurity, threshold)`` or ``None`` when
    the column is constant.  Maximizing Σ c²/n per side minimizes the
    weighted Gini — the reference's GiniIndex.java criterion."""
    n = len(xs)
    cum = onehot.cumsum(axis=0)  # (n, K) prefix class counts
    total = cum[-1]
    valid = np.flatnonzero(xs[:-1] < xs[1:])  # split after position i
    if not len(valid):
        return None
    nl = (valid + 1).astype(np.float64)
    nr = n - nl
    cl = cum[valid].astype(np.float64)
    cr = (total[None, :] - cum[valid]).astype(np.float64)
    score = (cl * cl).sum(axis=1) / nl + (cr * cr).sum(axis=1) / nr
    # weighted impurity = n - score (up to the constant n); lower = better
    j = int(np.argmax(score))  # first max → lowest threshold on ties
    imp = float(n) - float(score[j])
    thr = (xs[valid[j]] + xs[valid[j] + 1]) / 2.0
    return imp, thr


def _mse_best_threshold(xs: np.ndarray, ys: np.ndarray):
    """Best split of one sorted feature column by child SSE sum — the
    reference's MeanSquaredError criterion for regression trees."""
    n = len(xs)
    cy = ys.cumsum()
    cy2 = (ys * ys).cumsum()
    valid = np.flatnonzero(xs[:-1] < xs[1:])
    if not len(valid):
        return None
    nl = (valid + 1).astype(np.float64)
    nr = n - nl
    sl, sl2 = cy[valid], cy2[valid]
    sr, sr2 = cy[-1] - sl, cy2[-1] - sl2
    sse = (sl2 - sl * sl / nl) + (sr2 - sr * sr / nr)
    j = int(np.argmin(sse))
    thr = (xs[valid[j]] + xs[valid[j] + 1]) / 2.0
    return float(sse[j]), thr


def _build_tree(
    X: np.ndarray,
    y: np.ndarray,
    *,
    regression: bool,
    K: int,
    max_depth: int,
    min_split: int,
    max_features: int,
    seed: int,
) -> dict:
    """Greedy top-down tree over (X, y); returns plain int/float arrays."""
    n, d = X.shape
    feature, threshold, left, right, value = [], [], [], [], []
    onehot = None
    if not regression:
        onehot = np.zeros((n, K), dtype=np.int64)
        onehot[np.arange(n), y.astype(np.int64)] = 1

    def leaf_value(idx: np.ndarray) -> float:
        if regression:
            return float(y[idx].mean())
        c = onehot[idx].sum(axis=0)
        return float(int(np.argmax(c)))  # first max → smallest class id

    # stack of (row_indices, depth); node ids assigned in creation order
    stack = [(np.arange(n, dtype=np.int64), 0, -1, False)]
    node_counter = 0
    while stack:
        idx, depth, parent, is_right = stack.pop()
        nid = node_counter
        node_counter += 1
        if parent >= 0:
            (right if is_right else left)[parent] = nid
        feature.append(-1)
        threshold.append(0.0)
        left.append(-1)
        right.append(-1)
        value.append(leaf_value(idx))
        if depth >= max_depth or len(idx) < min_split:
            continue
        # per-split feature bag: lowest-m splitmix ranks of (seed, node)
        with np.errstate(over="ignore"):
            salt = (
                np.uint64(seed % (1 << 63)) * np.uint64(0x9E3779B97F4A7C15)
                + np.uint64(nid)
            )
            ranks = splitmix64(np.arange(d, dtype=np.uint64) + salt)
        feats = np.sort(np.argsort(ranks, kind="stable")[:max_features])
        best = None  # (impurity, feat, thr)
        for f in feats:
            xf = X[idx, f]
            order = np.argsort(xf, kind="stable")
            xs = xf[order]
            if regression:
                cand = _mse_best_threshold(xs, y[idx][order])
            else:
                cand = _gini_best_threshold(xs, onehot[idx][order])
            if cand is not None and (best is None or cand[0] < best[0]):
                best = (cand[0], int(f), cand[1])
        if best is None:
            continue
        _, f, thr = best
        go_left = X[idx, f] <= thr
        li, ri = idx[go_left], idx[~go_left]
        if not len(li) or not len(ri):
            continue
        feature[nid] = f
        threshold[nid] = thr
        # right pushed first so left is created (and numbered) first
        stack.append((ri, depth + 1, nid, True))
        stack.append((li, depth + 1, nid, False))
    return {
        "feature": np.asarray(feature, dtype=np.int64),
        "threshold": np.asarray(threshold, dtype=np.float64),
        "left": np.asarray(left, dtype=np.int64),
        "right": np.asarray(right, dtype=np.int64),
        "value": np.asarray(value, dtype=np.float64),
    }


def predict_tree(tree: dict, X: np.ndarray) -> np.ndarray:
    """Vectorized level-by-level traversal: one gather per depth level."""
    if not len(X):
        return np.zeros(0, dtype=np.float64)
    idx = np.zeros(len(X), dtype=np.int64)
    feat = tree["feature"]
    while True:
        f = feat[idx]
        inner = f >= 0
        if not inner.any():
            break
        xi = X[np.arange(len(X)), np.where(inner, f, 0)]
        go_left = xi <= tree["threshold"][idx]
        nxt = np.where(go_left, tree["left"][idx], tree["right"][idx])
        idx = np.where(inner, nxt, idx)
    return tree["value"][idx]


@ray.remote
def _train_one_tree(
    mat_ref_or_tuple, tree_no: int, seed: int, regression: bool, K: int,
    max_depth: int, min_split: int, max_features: int, bootstrap: bool,
):
    X, y = mat_ref_or_tuple
    n = len(y)
    if bootstrap and n:
        # seeded with-replacement bootstrap (DatasetBootstrapper.java)
        with np.errstate(over="ignore"):
            salt = (
                np.uint64(seed) * np.uint64(0x517CC1B727220A95)
                + np.uint64(tree_no) * np.uint64(0xD1B54A32D192ED03)
            )
            draw = splitmix64(np.arange(n, dtype=np.uint64) + salt)
        idx = (draw % np.uint64(n)).astype(np.int64)
        X, y = X[idx], y[idx]
    return _build_tree(
        X, y, regression=regression, K=K, max_depth=max_depth,
        min_split=min_split, max_features=max_features,
        seed=seed * 1_000_003 + tree_no,
    )


@ray.remote
def _gather_matrix(refs: list, feature_col: str, d: int, regression: bool):
    """Concat shard blocks (in canonical block order) into one (X, y)."""
    xs, ys = [], []
    for r in refs:
        t = ray.get(r)
        if t.num_rows == 0 or feature_col not in t.schema.names:
            continue
        xs.append(
            np.stack([np.asarray(v, dtype=np.float64)
                      for v in t[feature_col].to_pylist()])
        )
        ys.append(np.asarray(t["_y"].to_numpy(zero_copy_only=False)))
    if not xs:
        return np.zeros((0, d)), np.zeros(0)
    y = np.concatenate(ys)
    return np.concatenate(xs, axis=0), (
        y.astype(np.float64) if regression else y.astype(np.int64)
    )


class RandomForestModel:
    """Trained forest: list of node-array trees + class table (or None
    for regression).  Prediction is distributed (broadcast + map_batches)."""

    def __init__(self, trees: list, classes: np.ndarray | None):
        self.trees = trees
        self.classes = classes

    @property
    def regression(self) -> bool:
        return self.classes is None

    def predict_matrix(self, X: np.ndarray) -> np.ndarray:
        votes = np.stack([predict_tree(t, X) for t in self.trees])
        if self.regression:
            return votes.mean(axis=0)  # fixed tree order → deterministic
        K = len(self.classes)
        counts = np.zeros((X.shape[0], K), dtype=np.int64)
        # loop is over TREES (a handful); each step is a vectorized
        # scatter across the whole batch
        for row in votes.astype(np.int64):
            counts[np.arange(X.shape[0]), row] += 1
        return self.classes[counts.argmax(axis=1)]  # tie → smallest class

    def predict(
        self, ds: rd.Dataset, feature_col: str = "features",
    ) -> rd.Dataset:
        mref = ray.put((self.trees, self.classes))
        reg = self.regression

        def score(df: pd.DataFrame) -> pd.DataFrame:
            trees, classes = ray.get(mref)
            model = RandomForestModel(trees, classes)
            X = (
                np.stack([np.asarray(v, dtype=np.float64)
                          for v in df[feature_col]])
                if len(df) else np.zeros((0, 1))
            )
            out = df.drop(columns=[feature_col])
            p = model.predict_matrix(X) if len(df) else []
            out["predicted"] = (
                np.asarray(p, dtype=np.float64) if reg else list(p)
            )
            return out

        return ds.map_batches(score, batch_format="pandas")


def train_random_forest(
    ds: rd.Dataset,
    label_col: str = "label",
    feature_col: str = "features",
    regression: bool = False,
    num_trees: int = 10,
    max_depth: int = 6,
    min_split: int = 2,
    max_features_ratio: float | None = None,
    bootstrap: bool = True,
    key_col: str | None = None,
    num_shards: int = 32,
    seed: int = 42,
) -> RandomForestModel:
    """RandomForest (or, with ``num_trees=1, bootstrap=False`` and
    ``max_features_ratio=1.0``, a plain DecisionTree) over a Dataset of
    (features, label) rows.  ``max_features_ratio`` defaults to the
    reference's sqrt(d)/d for classification and 1/3 for regression
    (RandomForestTrainerConfig.java)."""
    classes = None
    cls_index = None
    if not regression:
        classes = np.array(sorted(ds.unique(label_col)), dtype=object)
        cls_index = {c: i for i, c in enumerate(classes)}
    first = ds.take(1)[0]
    d = len(np.asarray(first[feature_col], dtype=np.float64))
    K = len(classes) if classes is not None else 0

    def to_xy(df: pd.DataFrame) -> pd.DataFrame:
        if regression:
            yv = df[label_col].to_numpy(dtype=np.float64)
        else:
            yv = np.array([cls_index[v] for v in df[label_col]],
                          dtype=np.int64)
        out = pd.DataFrame({"_y": yv})
        out[feature_col] = list(
            np.stack([np.asarray(x, dtype=np.float64)
                      for x in df[feature_col]])
            if len(df) else np.zeros((0, d))
        )
        if key_col is not None:
            out["_k"] = df[key_col].to_numpy()
        return out

    shards = ds.map_batches(to_xy, batch_format="pandas")
    if key_col is not None:
        shards = shards.sort("_k").repartition(num_shards)
    shards = shards.materialize()
    mat_ref = _gather_matrix.remote(
        shards.to_arrow_refs(), feature_col, d, regression
    )
    if max_features_ratio is None:
        m = (
            max(1, int(round(d / 3.0))) if regression
            else max(1, int(round(np.sqrt(d))))
        )
    else:
        m = max(1, min(d, int(round(max_features_ratio * d))))
    tree_refs = [
        _train_one_tree.remote(
            mat_ref, t, seed, regression, K, max_depth, min_split, m,
            bootstrap,
        )
        for t in range(int(num_trees))
    ]
    return RandomForestModel(ray.get(tree_refs), classes)

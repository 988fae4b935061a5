"""ML pipelines — node classification + link prediction on graph features.

Re-expresses the reference's pipeline surface
(pipeline/src/main/java/org/neo4j/gds/ml/pipeline/: TrainingPipeline,
nodePipeline/, linkPipeline/) and its logistic-regression model
(ml/ml-algo/src/main/java/org/neo4j/gds/ml/models/logisticregression/
LogisticRegressionTrainer.java, LogisticRegressionObjective.java:
softmax cross-entropy + L2 penalty) Ray-Data-first:

- **feature assembly** (FeatureStep): scalar + list columns are packed
  into one fixed-width float64 matrix column per batch, vectorized;
- **training** is data-parallel full-batch gradient descent: the weight
  matrix (d × K, tiny) is ``ray.put`` once per epoch, every
  ``map_batches`` task computes its shard's gradient partial
  vectorized (softmax → X^T(p - y)), and partials are summed in FIXED
  shard order — deterministic at any parallelism, the engine-wide
  contract. The driver holds only the (d × K) weights; features never
  leave their blocks. Adam updates match the reference's default
  optimizer choice (GradientDescentConfig.java);
- **link features** (linkPipeline/linkfunctions/): hadamard, cosine and
  L2 combiners over per-node embedding vectors, computed inside
  ``map_batches`` on pair batches with the node-vector side attached by
  hash join (no driver-side pair loops);
- **train/test split** is a deterministic hash split (splitmix64 of the
  node id / edge key), the distributed analogue of the reference's
  seeded shuffled-id split (nodeSplitter / LinkPredictionSplitConfig).

Model training itself is iterative and not SQL-expressible — the driver
records rows-only checks for the train queries; the fixed-weight scoring
path (``lr_score``) IS oracled (sigmoid over assembled features).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from graph_data_science_ray._util import splitmix64


# ---------------------------------------------------------------------------
# feature assembly
# ---------------------------------------------------------------------------


def _batch_matrix(df: pd.DataFrame, cols: list[str]) -> np.ndarray:
    """Pack scalar + list columns into one (rows, d) float64 matrix."""
    parts = []
    for c in cols:
        v = df[c]
        first = v.iloc[0] if len(v) else 0.0
        if isinstance(first, (list, np.ndarray)):
            parts.append(np.stack([np.asarray(x, dtype=np.float64) for x in v]))
        else:
            parts.append(v.to_numpy(dtype=np.float64)[:, None])
    return np.concatenate(parts, axis=1) if parts else np.zeros((len(df), 0))


def assemble_features(
    ds: rd.Dataset, cols: list[str], out_col: str = "features"
) -> rd.Dataset:
    """FeatureStep: pack ``cols`` (scalars and/or fixed-width lists) into
    a single list<double> feature column, batch-vectorized."""

    def pack(df: pd.DataFrame) -> pd.DataFrame:
        X = _batch_matrix(df, cols)
        out = df.drop(columns=[c for c in cols if c != out_col], errors="ignore")
        out[out_col] = list(X)
        return out

    return ds.map_batches(pack, batch_format="pandas")


# ---------------------------------------------------------------------------
# logistic regression (softmax, L2 penalty, Adam) — data-parallel
# ---------------------------------------------------------------------------


class LogisticRegressionModel:
    """Trained classifier: weights (d, K) + bias (K,), class id list."""

    def __init__(self, weights: np.ndarray, bias: np.ndarray,
                 classes: np.ndarray):
        self.weights = np.asarray(weights, dtype=np.float64)
        self.bias = np.asarray(bias, dtype=np.float64)
        self.classes = np.asarray(classes)

    def predict_proba_matrix(self, X: np.ndarray) -> np.ndarray:
        z = X @ self.weights + self.bias
        z -= z.max(axis=1, keepdims=True)
        e = np.exp(z)
        return e / e.sum(axis=1, keepdims=True)

    def predict(
        self, ds: rd.Dataset, feature_col: str = "features",
        proba: bool = False,
    ) -> rd.Dataset:
        """Distributed scoring: broadcast the tiny model, map batches."""
        mref = ray.put((self.weights, self.bias, self.classes))

        def score(df: pd.DataFrame) -> pd.DataFrame:
            W, b, classes = ray.get(mref)
            X = np.stack(
                [np.asarray(x, dtype=np.float64) for x in df[feature_col]]
            ) if len(df) else np.zeros((0, W.shape[0]))
            z = X @ W + b
            z -= z.max(axis=1, keepdims=True) if len(z) else 0
            e = np.exp(z)
            p = e / e.sum(axis=1, keepdims=True) if len(z) else e
            out = df.drop(columns=[feature_col])
            out["predicted"] = classes[p.argmax(axis=1)] if len(p) else []
            if proba:
                out["prob"] = p.max(axis=1) if len(p) else []
            return out

        return ds.map_batches(score, batch_format="pandas")


def _grad_partial(W, b, X, yidx, K, class_w):
    z = X @ W + b
    z -= z.max(axis=1, keepdims=True)
    e = np.exp(z)
    p = e / e.sum(axis=1, keepdims=True)
    y1 = np.zeros_like(p)
    y1[np.arange(len(yidx)), yidx] = 1.0
    sw = class_w[yidx][:, None] if class_w is not None else 1.0
    diff = (p - y1) * sw
    gW = X.T @ diff
    gb = diff.sum(axis=0)
    ll = -np.log(np.clip(p[np.arange(len(yidx)), yidx], 1e-15, None))
    if class_w is not None:
        ll = ll * class_w[yidx]
    return gW, gb, float(ll.sum()), len(yidx)


@ray.remote(num_cpus=1)
class _ShardHolder:
    """Holds a contiguous run of canonical shard blocks as dense
    ``(X, y)`` matrices.  The blocks are fetched from the object store
    ONCE at construction; every training epoch is then a single actor
    method call returning per-block gradient partials — the per-epoch
    Dataset execution (task submission + block re-read + to_pandas,
    ~100 ms/epoch of pure orchestration at small n) disappears while
    the combine stays in exact block order, so determinism across block
    layouts is unchanged (the canonical sort+repartition fixes the
    layout before actors are created)."""

    def __init__(self, refs: list, feature_col: str, d: int):
        self.mats = []
        for r in refs:
            t = ray.get(r)
            # straight from Arrow (no to_pandas: the feature column may
            # be Ray's tensor extension type, unregistered here)
            if t.num_rows == 0 or feature_col not in t.schema.names:
                self.mats.append(
                    (np.zeros((0, d)), np.zeros(0, dtype=np.int64))
                )
                continue
            X = np.stack(
                [
                    np.asarray(x, dtype=np.float64)
                    for x in t[feature_col].to_pylist()
                ]
            )
            self.mats.append(
                (X, t["_y"].to_numpy(zero_copy_only=False))
            )

    def linear_grads(self, w: np.ndarray, b: float) -> list:
        out = []
        for X, y in self.mats:
            r = X @ w + b - y.astype(np.float64)
            out.append(
                (2.0 * (X.T @ r), 2.0 * float(r.sum()),
                 float((r * r).sum()), len(y))
            )
        return out

    def mlp_grads(self, Ws: list, bs: list, cw) -> list:
        """Full-batch backprop partials for the ReLU-MLP + softmax head
        (reference ml/ml-algo/.../mlp/MLPClassifier.java forward shape):
        per block, (gWs, gbs, loss_sum, n) in exact block order."""
        L = len(Ws)
        out = []
        for X, y in self.mats:
            if len(X) == 0:
                out.append((
                    [np.zeros_like(W) for W in Ws],
                    [np.zeros_like(b) for b in bs], 0.0, 0,
                ))
                continue
            yidx = y.astype(np.int64)
            acts = [X]
            a = X
            for W, b in zip(Ws[:-1], bs[:-1]):
                a = np.maximum(a @ W + b, 0.0)
                acts.append(a)
            z = a @ Ws[-1] + bs[-1]
            z -= z.max(axis=1, keepdims=True)
            e = np.exp(z)
            p = e / e.sum(axis=1, keepdims=True)
            y1 = np.zeros_like(p)
            y1[np.arange(len(yidx)), yidx] = 1.0
            sw = cw[yidx][:, None] if cw is not None else 1.0
            delta = (p - y1) * sw
            gWs = [None] * L
            gbs = [None] * L
            for layer in reversed(range(L)):
                gWs[layer] = acts[layer].T @ delta
                gbs[layer] = delta.sum(axis=0)
                if layer > 0:
                    delta = (delta @ Ws[layer].T) * (acts[layer] > 0)
            ll = -np.log(np.clip(p[np.arange(len(yidx)), yidx], 1e-15, None))
            if cw is not None:
                ll = ll * cw[yidx]
            out.append((gWs, gbs, float(ll.sum()), len(yidx)))
        return out

    def softmax_grads(self, W: np.ndarray, b: np.ndarray, cw) -> list:
        out = []
        for X, y in self.mats:
            if len(X) == 0:
                out.append(
                    (np.zeros_like(W), np.zeros(W.shape[1]), 0.0, 0)
                )
                continue
            out.append(
                _grad_partial(W, b, X, y.astype(np.int64), W.shape[1], cw)
            )
        return out


def _shard_actors(
    shards: rd.Dataset, feature_col: str, d: int, max_actors: int = 32
) -> list:
    """Create :class:`_ShardHolder` actors over contiguous runs of the
    materialized shard Dataset's blocks (block order preserved, so the
    driver's fixed-order combine is identical to iterating blocks)."""
    refs = shards.to_arrow_refs()
    # never request more 1-CPU actors than the cluster can schedule
    # (leaving one core of headroom) — otherwise creation deadlocks
    cpus = int(ray.cluster_resources().get("CPU", 1))
    k = max(1, min(int(max_actors), max(1, cpus - 1), len(refs)))
    groups = np.array_split(np.arange(len(refs)), k)
    return [
        _ShardHolder.remote([refs[i] for i in g], feature_col, d)
        for g in groups
        if len(g)
    ]


def train_logistic_regression(
    ds: rd.Dataset,
    label_col: str = "label",
    feature_col: str = "features",
    penalty: float = 0.0,
    max_epochs: int = 100,
    learning_rate: float = 0.1,
    tolerance: float = 1e-4,
    patience: int = 3,
    class_weights: dict | None = None,
    key_col: str | None = None,
    num_shards: int = 32,
    seed: int = 42,
) -> LogisticRegressionModel:
    """Softmax logistic regression via data-parallel full-batch Adam.

    Matches the reference objective (LogisticRegressionObjective.java:
    cross-entropy + ``penalty`` * ||W||² with optional classWeights);
    epochs run until the relative loss change drops under ``tolerance``
    (Training.java's convergence criterion) or ``max_epochs``.
    Deterministic: when ``key_col`` names a unique row key, the shards
    are canonicalized first (sort by key → fixed ``num_shards`` even
    repartition), so gradients combine in an input-layout-independent
    order and the trained weights are byte-identical at any parallelism
    or block layout — the engine-wide contract. Without a key the
    weights are deterministic for a fixed block layout only.
    """
    classes = np.array(
        sorted(ds.unique(label_col)), dtype=object
    )
    cls_index = {c: i for i, c in enumerate(classes)}
    K = len(classes)
    first = ds.take(1)[0]
    d = len(np.asarray(first[feature_col], dtype=np.float64))
    cw = None
    if class_weights is not None:
        cw = np.array([float(class_weights.get(c, 1.0)) for c in classes])

    # persist the (X, y-index) shards once; every epoch re-reads blocks
    def to_xy(df: pd.DataFrame) -> pd.DataFrame:
        idx = np.array([cls_index[v] for v in df[label_col]], dtype=np.int64)
        out = pd.DataFrame({"_y": idx})
        out[feature_col] = list(
            np.stack([np.asarray(x, dtype=np.float64) for x in df[feature_col]])
            if len(df) else np.zeros((0, d))
        )
        if key_col is not None:
            out["_k"] = df[key_col].to_numpy()
        return out

    shards = ds.map_batches(to_xy, batch_format="pandas")
    if key_col is not None:
        # canonical layout: global key order + fixed even shard count ⇒
        # the float gradient-sum order no longer depends on how the
        # caller's Dataset happened to be blocked
        shards = shards.sort("_k").repartition(num_shards)
    shards = shards.materialize()
    n_total = shards.count()

    rng_w = (
        (splitmix64(np.arange(d * K, dtype=np.uint64) + np.uint64(seed))
         % np.uint64(10_000)).astype(np.float64) / 10_000.0 - 0.5
    ) * 0.01
    W = rng_w.reshape(d, K)
    b = np.zeros(K)
    mW = np.zeros_like(W); vW = np.zeros_like(W)
    mb = np.zeros_like(b); vb = np.zeros_like(b)
    beta1, beta2, eps = 0.9, 0.999, 1e-8
    prev_loss = np.inf
    flat_epochs = 0

    actors = _shard_actors(shards, feature_col, d)
    for epoch in range(1, max_epochs + 1):
        nested = ray.get([a.softmax_grads.remote(W, b, cw) for a in actors])
        # fixed-order combine (actors hold contiguous block runs in
        # dataset order) => deterministic
        gW = np.zeros_like(W); gb = np.zeros_like(b); loss = 0.0
        for group in nested:
            for gWp, gbp, llp, _n in group:
                gW += np.asarray(gWp, dtype=np.float64).reshape(d, K)
                gb += np.asarray(gbp, dtype=np.float64)
                loss += float(llp)
        gW = gW / n_total + 2.0 * penalty * W
        gb = gb / n_total
        loss = loss / n_total + penalty * float((W * W).sum())

        mW = beta1 * mW + (1 - beta1) * gW
        vW = beta2 * vW + (1 - beta2) * gW * gW
        mb = beta1 * mb + (1 - beta1) * gb
        vb = beta2 * vb + (1 - beta2) * gb * gb
        c1 = 1 - beta1 ** epoch
        c2 = 1 - beta2 ** epoch
        W = W - learning_rate * (mW / c1) / (np.sqrt(vW / c2) + eps)
        b = b - learning_rate * (mb / c1) / (np.sqrt(vb / c2) + eps)
        # reference Training.java converges on `patience` consecutive
        # epochs of sub-tolerance relative improvement (Adam's loss can
        # plateau briefly then keep falling, so one flat epoch is noise)
        if abs(prev_loss - loss) <= tolerance * max(abs(prev_loss), 1e-12):
            flat_epochs += 1
            if flat_epochs >= patience:
                break
        else:
            flat_epochs = 0
        prev_loss = loss

    return LogisticRegressionModel(W, b, classes)


# ---------------------------------------------------------------------------
# MLP classifier (reference ml/ml-algo/.../mlp/MLPClassifier.java) —
# ReLU hidden layers + softmax head on the same canonical-shard Adam
# harness as the logistic / linear trainers
# ---------------------------------------------------------------------------


class MLPClassifierModel:
    """Trained MLP: weight/bias list per layer + class table."""

    def __init__(self, Ws: list, bs: list, classes: np.ndarray):
        self.Ws = [np.asarray(W, dtype=np.float64) for W in Ws]
        self.bs = [np.asarray(b, dtype=np.float64) for b in bs]
        self.classes = np.asarray(classes)

    def predict_proba_matrix(self, X: np.ndarray) -> np.ndarray:
        a = X
        for W, b in zip(self.Ws[:-1], self.bs[:-1]):
            a = np.maximum(a @ W + b, 0.0)
        z = a @ self.Ws[-1] + self.bs[-1]
        z -= z.max(axis=1, keepdims=True)
        e = np.exp(z)
        return e / e.sum(axis=1, keepdims=True)

    def predict(
        self, ds: rd.Dataset, feature_col: str = "features",
        proba: bool = False,
    ) -> rd.Dataset:
        mref = ray.put((self.Ws, self.bs, self.classes))

        def score(df: pd.DataFrame) -> pd.DataFrame:
            Ws, bs, classes = ray.get(mref)
            model = MLPClassifierModel(Ws, bs, classes)
            X = (
                np.stack([np.asarray(x, dtype=np.float64)
                          for x in df[feature_col]])
                if len(df) else np.zeros((0, Ws[0].shape[0]))
            )
            out = df.drop(columns=[feature_col])
            if len(df):
                p = model.predict_proba_matrix(X)
                out["predicted"] = classes[p.argmax(axis=1)]
                if proba:
                    out["prob"] = p.max(axis=1)
            else:
                out["predicted"] = []
                if proba:
                    out["prob"] = []
            return out

        return ds.map_batches(score, batch_format="pandas")


def train_mlp_classifier(
    ds: rd.Dataset,
    label_col: str = "label",
    feature_col: str = "features",
    hidden: tuple = (16,),
    penalty: float = 0.0,
    max_epochs: int = 100,
    learning_rate: float = 0.01,
    tolerance: float = 1e-4,
    patience: int = 3,
    class_weights: dict | None = None,
    key_col: str | None = None,
    num_shards: int = 32,
    seed: int = 42,
) -> MLPClassifierModel:
    """MLP classifier via data-parallel full-batch Adam — the reference's
    third model family (mlp/MLPClassifierTrainer.java: ReLU hidden
    layers, softmax cross-entropy + L2, trained by the same Training
    loop).  Same determinism contract as the logistic trainer: canonical
    key-sorted shards, actor-held blocks, fixed-order gradient combine ⇒
    byte-identical weights at any parallelism."""
    classes = np.array(sorted(ds.unique(label_col)), dtype=object)
    cls_index = {c: i for i, c in enumerate(classes)}
    K = len(classes)
    first = ds.take(1)[0]
    d = len(np.asarray(first[feature_col], dtype=np.float64))
    cw = None
    if class_weights is not None:
        cw = np.array([float(class_weights.get(c, 1.0)) for c in classes])

    def to_xy(df: pd.DataFrame) -> pd.DataFrame:
        idx = np.array([cls_index[v] for v in df[label_col]], dtype=np.int64)
        out = pd.DataFrame({"_y": idx})
        out[feature_col] = list(
            np.stack([np.asarray(x, dtype=np.float64) for x in df[feature_col]])
            if len(df) else np.zeros((0, d))
        )
        if key_col is not None:
            out["_k"] = df[key_col].to_numpy()
        return out

    shards = ds.map_batches(to_xy, batch_format="pandas")
    if key_col is not None:
        shards = shards.sort("_k").repartition(num_shards)
    shards = shards.materialize()
    n_total = shards.count()

    sizes = [d] + [int(h) for h in hidden] + [K]
    Ws, bs = [], []
    off = 0
    for a, b_ in zip(sizes[:-1], sizes[1:]):
        w = (
            (splitmix64(np.arange(a * b_, dtype=np.uint64)
                        + np.uint64(seed) + np.uint64(off))
             % np.uint64(10_000)).astype(np.float64) / 10_000.0 - 0.5
        ) * (2.0 / np.sqrt(a))
        Ws.append(w.reshape(a, b_))
        bs.append(np.zeros(b_))
        off += a * b_
    mWs = [np.zeros_like(W) for W in Ws]
    vWs = [np.zeros_like(W) for W in Ws]
    mbs = [np.zeros_like(b_) for b_ in bs]
    vbs = [np.zeros_like(b_) for b_ in bs]
    beta1, beta2, eps = 0.9, 0.999, 1e-8
    prev_loss = np.inf
    flat_epochs = 0

    actors = _shard_actors(shards, feature_col, d)
    for epoch in range(1, max_epochs + 1):
        nested = ray.get([a.mlp_grads.remote(Ws, bs, cw) for a in actors])
        gWs = [np.zeros_like(W) for W in Ws]
        gbs = [np.zeros_like(b_) for b_ in bs]
        loss = 0.0
        for group in nested:
            for gWp, gbp, llp, _n in group:
                for layer in range(len(Ws)):
                    gWs[layer] += np.asarray(gWp[layer], dtype=np.float64)
                    gbs[layer] += np.asarray(gbp[layer], dtype=np.float64)
                loss += float(llp)
        loss = loss / n_total
        c1 = 1 - beta1 ** epoch
        c2 = 1 - beta2 ** epoch
        for layer in range(len(Ws)):
            g = gWs[layer] / n_total + 2.0 * penalty * Ws[layer]
            loss += penalty * float((Ws[layer] * Ws[layer]).sum())
            mWs[layer] = beta1 * mWs[layer] + (1 - beta1) * g
            vWs[layer] = beta2 * vWs[layer] + (1 - beta2) * g * g
            Ws[layer] = Ws[layer] - learning_rate * (
                (mWs[layer] / c1) / (np.sqrt(vWs[layer] / c2) + eps)
            )
            gb = gbs[layer] / n_total
            mbs[layer] = beta1 * mbs[layer] + (1 - beta1) * gb
            vbs[layer] = beta2 * vbs[layer] + (1 - beta2) * gb * gb
            bs[layer] = bs[layer] - learning_rate * (
                (mbs[layer] / c1) / (np.sqrt(vbs[layer] / c2) + eps)
            )
        if abs(prev_loss - loss) <= tolerance * max(abs(prev_loss), 1e-12):
            flat_epochs += 1
            if flat_epochs >= patience:
                break
        else:
            flat_epochs = 0
        prev_loss = loss

    return MLPClassifierModel(Ws, bs, classes)


# ---------------------------------------------------------------------------
# linear regression (MSE + L2, Adam) — data-parallel
# ---------------------------------------------------------------------------


class LinearRegressionModel:
    """Trained regressor: weights (d,) + bias scalar."""

    def __init__(self, weights: np.ndarray, bias: float):
        self.weights = np.asarray(weights, dtype=np.float64)
        self.bias = float(bias)

    def predict(
        self, ds: rd.Dataset, feature_col: str = "features"
    ) -> rd.Dataset:
        """Distributed scoring: broadcast the tiny model, map batches."""
        mref = ray.put((self.weights, self.bias))

        def score(df: pd.DataFrame) -> pd.DataFrame:
            w, b = ray.get(mref)
            X = np.stack(
                [np.asarray(x, dtype=np.float64) for x in df[feature_col]]
            ) if len(df) else np.zeros((0, len(w)))
            out = df.drop(columns=[feature_col])
            out["predicted"] = X @ w + b if len(X) else []
            return out

        return ds.map_batches(score, batch_format="pandas")


def train_linear_regression(
    ds: rd.Dataset,
    label_col: str = "target",
    feature_col: str = "features",
    penalty: float = 0.0,
    max_epochs: int = 200,
    learning_rate: float = 0.1,
    tolerance: float = 1e-5,
    patience: int = 3,
    key_col: str | None = None,
    num_shards: int = 32,
    seed: int = 42,
) -> LinearRegressionModel:
    """Linear regression via data-parallel full-batch Adam on the MSE +
    L2 objective — the reference's LinearRegressionObjective
    (ml/ml-algo/src/main/java/org/neo4j/gds/ml/models/linearregression/
    LinearRegressionObjective.java; trained by the same Training.java
    loop as the classifier). Same determinism contract as
    :func:`train_logistic_regression`: canonical key-sorted shards +
    fixed-order gradient combine ⇒ byte-identical weights at any
    parallelism."""
    first = ds.take(1)[0]
    d = len(np.asarray(first[feature_col], dtype=np.float64))

    def to_xy(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {"_y": df[label_col].to_numpy(dtype=np.float64)}
        )
        out[feature_col] = list(
            np.stack([np.asarray(x, dtype=np.float64) for x in df[feature_col]])
            if len(df) else np.zeros((0, d))
        )
        if key_col is not None:
            out["_k"] = df[key_col].to_numpy()
        return out

    shards = ds.map_batches(to_xy, batch_format="pandas")
    if key_col is not None:
        shards = shards.sort("_k").repartition(num_shards)
    shards = shards.materialize()
    n_total = shards.count()

    w = (
        (splitmix64(np.arange(d, dtype=np.uint64) + np.uint64(seed))
         % np.uint64(10_000)).astype(np.float64) / 10_000.0 - 0.5
    ) * 0.01
    b = 0.0
    mw = np.zeros_like(w); vw = np.zeros_like(w)
    mb = 0.0; vb = 0.0
    beta1, beta2, eps = 0.9, 0.999, 1e-8
    prev_loss = np.inf
    flat_epochs = 0

    actors = _shard_actors(shards, feature_col, d)
    for epoch in range(1, max_epochs + 1):
        nested = ray.get([a.linear_grads.remote(w, b) for a in actors])
        gw = np.zeros_like(w); gb = 0.0; sse = 0.0
        for group in nested:
            for gwp, gbp, ssep, _n in group:
                gw += np.asarray(gwp, dtype=np.float64)
                gb += float(gbp)
                sse += float(ssep)
        gw = gw / n_total + 2.0 * penalty * w
        gb = gb / n_total
        loss = sse / n_total + penalty * float((w * w).sum())

        mw = beta1 * mw + (1 - beta1) * gw
        vw = beta2 * vw + (1 - beta2) * gw * gw
        mb = beta1 * mb + (1 - beta1) * gb
        vb = beta2 * vb + (1 - beta2) * gb * gb
        c1 = 1 - beta1 ** epoch
        c2 = 1 - beta2 ** epoch
        w = w - learning_rate * (mw / c1) / (np.sqrt(vw / c2) + eps)
        b = b - learning_rate * (mb / c1) / (np.sqrt(vb / c2) + eps)
        if abs(prev_loss - loss) <= tolerance * max(abs(prev_loss), 1e-12):
            flat_epochs += 1
            if flat_epochs >= patience:
                break
        else:
            flat_epochs = 0
        prev_loss = loss

    return LinearRegressionModel(w, b)


def node_regression_pipeline(
    features_ds: rd.Dataset,
    target_col: str = "target",
    feature_cols: list[str] | None = None,
    test_fraction: float = 0.25,
    penalty: float = 0.0,
    max_epochs: int = 200,
    learning_rate: float = 0.1,
    id_col: str = "node_id",
    seed: int = 42,
    model: str = "linear",
    model_params: dict | None = None,
) -> dict:
    """NodeRegressionTrainingPipeline (reference pipeline/.../nodePipeline/
    regression/NodeRegressionTrain.java): assemble → hash split → train
    the chosen model family → evaluate (MSE / MAE / R², the reference's
    RegressionMetrics) → predict-all. Returns {model, metrics,
    predictions}.  ``model``: "linear" (Adam linear regression) or "rf"
    (RandomForest regressor, reference randomforest/
    RandomForestRegressorTrainer.java) with ``model_params`` forwarded
    to :func:`graph_data_science_ray.pipelines.trees.train_random_forest`."""
    ds = features_ds
    if feature_cols is not None:
        ds = assemble_features(ds, feature_cols)
    ds = ds.materialize()
    train, test = hash_split(ds, id_col, test_fraction, seed=seed)
    if model == "rf":
        from graph_data_science_ray.pipelines.trees import train_random_forest

        model = train_random_forest(
            train, label_col=target_col, regression=True, key_col=id_col,
            seed=seed, **(model_params or {}),
        )
    else:
        model = train_linear_regression(
            train, label_col=target_col, penalty=penalty, max_epochs=max_epochs,
            learning_rate=learning_rate, key_col=id_col, seed=seed,
        )
    scored = model.predict(test).to_pandas()
    if len(scored):
        y = scored[target_col].to_numpy(dtype=np.float64)
        p = scored["predicted"].to_numpy(dtype=np.float64)
        mse = float(np.mean((p - y) ** 2))
        mae = float(np.mean(np.abs(p - y)))
        ss_tot = float(((y - y.mean()) ** 2).sum())
        if ss_tot > 0:
            r2 = float(1.0 - ((p - y) ** 2).sum() / ss_tot)
        else:
            # constant target in the split: R² is undefined — report 1.0
            # for a near-exact fit (relative to the target scale), else 0.0
            scale = max(1.0, float(np.mean(y * y)))
            r2 = 1.0 if mse <= 1e-6 * scale else 0.0
    else:
        mse = mae = r2 = 0.0
    predictions = model.predict(ds)
    return {
        "model": model,
        "metrics": {"mse": mse, "mae": mae, "r2": r2},
        "predictions": predictions,
    }


# ---------------------------------------------------------------------------
# link feature steps (linkPipeline/linkfunctions/)
# ---------------------------------------------------------------------------


def _link_matrix(A: np.ndarray, B: np.ndarray, combiner: str) -> np.ndarray:
    if combiner == "hadamard":      # HadamardFeatureStep.java
        return A * B
    if combiner == "l2":            # L2FeatureStep.java: (a-b)^2 per dim
        d = A - B
        return d * d
    if combiner == "cosine":        # CosineFeatureStep.java: one scalar
        num = (A * B).sum(axis=1)
        den = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
        return np.where(den > 0, num / np.where(den > 0, den, 1.0), 0.0)[:, None]
    raise ValueError(combiner)


def link_features(
    pairs: rd.Dataset,
    node_vectors: rd.Dataset,
    combiners: list[str] = ("hadamard",),
    src_col: str = "src",
    dst_col: str = "dst",
    id_col: str = "node_id",
    vec_col: str = "embedding",
    num_parts: int = 64,
) -> rd.Dataset:
    """Pair feature extraction: attach each side's vector by hash join,
    then apply the combiner stack per batch (LinkFeatureExtractor.java).
    Returns (src, dst, features) with features = concat of combiners."""
    from graph_data_science_ray.pipelines.agg import hash_join

    vec = node_vectors.select_columns([id_col, vec_col])
    sch = None  # probed by hash_join
    withs = hash_join(
        pairs, vec.map_batches(
            lambda df: df.rename(columns={id_col: src_col, vec_col: "_va"}),
            batch_format="pandas"),
        on=[src_col], num_parts=num_parts,
    )
    withd = hash_join(
        withs, vec.map_batches(
            lambda df: df.rename(columns={id_col: dst_col, vec_col: "_vb"}),
            batch_format="pandas"),
        on=[dst_col], num_parts=num_parts,
    )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({src_col: [], dst_col: [], "features": []})
        A = np.stack([np.asarray(x, dtype=np.float64) for x in df["_va"]])
        B = np.stack([np.asarray(x, dtype=np.float64) for x in df["_vb"]])
        F = np.concatenate([_link_matrix(A, B, c) for c in combiners], axis=1)
        out = df[[src_col, dst_col]].copy()
        out["features"] = list(F)
        return out

    return withd.map_batches(combine, batch_format="pandas")


# ---------------------------------------------------------------------------
# pipelines
# ---------------------------------------------------------------------------


def hash_split(ds: rd.Dataset, key_col: str, test_fraction: float,
               seed: int = 42):
    """Deterministic (train, test) split by splitmix64 of the key —
    the distributed analogue of the reference's seeded shuffled split."""
    cut = np.uint64(int((1.0 - test_fraction) * (2 ** 64 - 1)))

    def side(df: pd.DataFrame, want_train: bool) -> pd.DataFrame:
        k = df[key_col].to_numpy()
        if k.dtype.kind not in "iu":
            k = np.array([hash(x) & 0x7FFFFFFFFFFFFFFF for x in k])
        h = splitmix64(k.astype(np.uint64) + np.uint64(seed))
        m = h <= cut
        return df[m if want_train else ~m]

    train = ds.map_batches(lambda df: side(df, True), batch_format="pandas")
    test = ds.map_batches(lambda df: side(df, False), batch_format="pandas")
    return train, test


def split_relationships(
    edges: rd.Dataset,
    holdout_ppm: int = 200_000,
    seed: str = "split",
    src_col: str = "src",
    dst_col: str = "dst",
) -> rd.Dataset:
    """Relationship holdout split — the reference's splitRelationships
    surface (ml/ml-algo/src/main/java/org/neo4j/gds/ml/splitting/
    EdgeSplitter.java:75 splitPositiveExamples: holdoutFraction of
    relationships become the 'selected' positive set with label 1, the
    rest the 'remaining' training graph), re-expressed as a purely
    map-side deterministic split: each edge's md5 acceptance
    ``u32 * 1e6 < holdout_ppm * 2^32`` (all-integer, no float
    reduction-order hazard) decides its side, so the split is
    bit-exactly reproducible in ANSI SQL, identical at any parallelism,
    and needs no seeded-RNG pass over a materialized edge list.

    Adds ``split`` ('selected' | 'remaining') and ``label`` (1 | 0)
    columns; zero shuffle.
    """
    import hashlib

    lim = int(holdout_ppm) * 4294967296

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            df = df.copy()
            df["split"] = pd.Series([], dtype=object)
            df["label"] = pd.Series([], dtype=np.int64)
            return df
        keys = (
            df[src_col].astype(str) + ">" + df[dst_col].astype(str)
            + ":" + seed
        )
        h = np.fromiter(
            (
                int(hashlib.md5(k.encode("utf-8")).hexdigest()[:8], 16)
                for k in keys
            ),
            dtype=np.int64,
            count=len(df),
        )
        sel = h * 1_000_000 < lim
        out = df.copy()
        out["split"] = np.where(sel, "selected", "remaining")
        out["label"] = sel.astype(np.int64)
        return out

    return edges.map_batches(tag, batch_format="pandas")


def node_classification_pipeline(
    features_ds: rd.Dataset,
    label_col: str = "label",
    feature_cols: list[str] | None = None,
    test_fraction: float = 0.25,
    penalty: float = 0.0,
    max_epochs: int = 100,
    learning_rate: float = 0.1,
    id_col: str = "node_id",
    seed: int = 42,
    model: str = "lr",
    model_params: dict | None = None,
) -> dict:
    """NodeClassificationTrainingPipeline: assemble → split → train →
    evaluate → predict-all. Returns {model, metrics, predictions}.
    ``model``: "lr" (softmax logistic regression), "rf" (RandomForest,
    reference randomforest/RandomForestClassifierTrainer.java) or "mlp"
    (reference mlp/MLPClassifier.java); ``model_params`` forwards to the
    family's trainer."""
    ds = features_ds
    if feature_cols is not None:
        ds = assemble_features(ds, feature_cols)
    ds = ds.materialize()
    train, test = hash_split(ds, id_col, test_fraction, seed=seed)
    if model == "rf":
        from graph_data_science_ray.pipelines.trees import train_random_forest

        model = train_random_forest(
            train, label_col=label_col, regression=False, key_col=id_col,
            seed=seed, **(model_params or {}),
        )
    elif model == "mlp":
        model = train_mlp_classifier(
            train, label_col=label_col, penalty=penalty,
            max_epochs=max_epochs, learning_rate=learning_rate,
            key_col=id_col, seed=seed, **(model_params or {}),
        )
    else:
        model = train_logistic_regression(
            train, label_col=label_col, penalty=penalty, max_epochs=max_epochs,
            learning_rate=learning_rate, key_col=id_col, seed=seed,
        )
    scored = model.predict(test).to_pandas()
    acc = float((scored["predicted"] == scored[label_col]).mean()) if len(scored) else 0.0
    # macro F1 (nodePipeline classification metrics)
    f1s = []
    for c in model.classes:
        tp = int(((scored["predicted"] == c) & (scored[label_col] == c)).sum())
        fp = int(((scored["predicted"] == c) & (scored[label_col] != c)).sum())
        fn = int(((scored["predicted"] != c) & (scored[label_col] == c)).sum())
        f1s.append(2 * tp / (2 * tp + fp + fn) if (2 * tp + fp + fn) else 0.0)
    try:
        predictions = model.predict(ds, proba=True)
    except TypeError:  # forest votes carry no probability column
        predictions = model.predict(ds)
    return {
        "model": model,
        "metrics": {"accuracy": acc, "f1_macro": float(np.mean(f1s))},
        "predictions": predictions,
    }


def _sample_negative_pairs(
    node_ids: np.ndarray, edge_keys_sorted: np.ndarray, n_neg: int,
    V: int, seed: int,
) -> pd.DataFrame:
    """Seeded non-edge pairs: rejection-sample against the sorted packed
    edge-key array (the triangles broadcast pattern)."""
    kept = np.zeros(0, dtype=np.int64)  # accepted pair keys, deduped
    salt = 0
    while len(kept) < n_neg and salt < 64:
        # draw a FULL disjoint hash window per round (round r reads
        # hashes [r*n_neg, (r+1)*n_neg)) — over-drawing keeps the round
        # count low when the non-edge pool is nearly exhausted (dense
        # graphs), and windows never overlap across rounds
        idx = np.arange(n_neg, dtype=np.uint64) + np.uint64(salt * n_neg)
        a = node_ids[(splitmix64(idx + np.uint64(seed)) %
                      np.uint64(len(node_ids))).astype(np.int64)]
        b = node_ids[(splitmix64(idx + np.uint64(seed + 7919)) %
                      np.uint64(len(node_ids))).astype(np.int64)]
        key = a.astype(np.int64) * V + b
        pos = np.searchsorted(edge_keys_sorted, key)
        pos = np.minimum(pos, max(len(edge_keys_sorted) - 1, 0))
        is_edge = (
            edge_keys_sorted[pos] == key if len(edge_keys_sorted)
            else np.zeros(len(key), dtype=bool)
        )
        kept = np.unique(np.concatenate([kept, key[(~is_edge) & (a != b)]]))
        salt += 1
    kept = kept[:n_neg]
    return pd.DataFrame({"src": kept // V, "dst": kept % V})


def _anti_join_keys(
    left: rd.Dataset, right: rd.Dataset, num_parts: int
) -> rd.Dataset:
    """Left keys NOT present in right — hash-partitioned on ``key % P``;
    each group holds one shard of both sides and filters with one
    vectorized ``np.isin`` (no driver materialization)."""

    def tag(flag: int):
        def f(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "key": t["key"].cast(pa.int64()),
                    "flag": pa.array(
                        np.full(t.num_rows, flag, dtype=np.int8)
                    ),
                }
            )

        return f

    both = left.map_batches(tag(0), batch_format="pyarrow").union(
        right.map_batches(tag(1), batch_format="pyarrow")
    )

    def part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__part"] = df["key"].to_numpy(dtype=np.int64) % num_parts
        return df

    def anti(g: pd.DataFrame) -> pd.DataFrame:
        k = g["key"].to_numpy(dtype=np.int64)
        fl = g["flag"].to_numpy()
        keep = (fl == 0) & ~np.isin(k, k[fl == 1])
        return pd.DataFrame({"key": np.unique(k[keep])})

    return (
        both.map_batches(part, batch_format="pandas")
        .groupby("__part")
        .map_groups(anti, batch_format="pandas")
    )


def _neg_sample_distributed(
    pos_keys: rd.Dataset, n_neg: int, V: int, seed: int,
    num_parts: int = 16, max_rounds: int = 64,
) -> rd.Dataset:
    """Distributed seeded negative sampling: each candidate draw is a
    pure function of its global draw index (identical at any
    parallelism), rejection is a hash-partitioned anti-join against the
    edge-key shards AND the accepted-so-far set, and the driver sees
    only per-round counts. The final selection — the ``n_neg`` smallest
    accepted pair keys — reproduces the broadcast sampler
    (:func:`_sample_negative_pairs`) bit-for-bit, so the two paths are
    parity-testable. Returns a (key,) Dataset of accepted non-edges."""
    kept: rd.Dataset | None = None
    kept_count = 0
    salt = 0
    while kept_count < n_neg and salt < max_rounds:
        # full n_neg-wide disjoint window per round, matching
        # _sample_negative_pairs draw for draw
        need = n_neg
        offset = salt * n_neg

        def draw(t: pa.Table, *, off=offset) -> pa.Table:
            idx = t["id"].to_numpy(zero_copy_only=False).astype(np.uint64) + np.uint64(off)
            a = (splitmix64(idx + np.uint64(seed)) % np.uint64(V)).astype(np.int64)
            b = (splitmix64(idx + np.uint64(seed + 7919)) % np.uint64(V)).astype(np.int64)
            ok = a != b
            return pa.table({"key": pa.array(a[ok] * V + b[ok])})

        cand = rd.range(need).map_batches(draw, batch_format="pyarrow")
        acc = _anti_join_keys(cand, pos_keys, num_parts)
        if kept is not None:
            acc = _anti_join_keys(acc, kept, num_parts)
        kept = acc if kept is None else kept.union(acc)
        kept = kept.materialize()
        kept_count = kept.count()
        salt += 1
    if kept is None:
        kept = rd.range(0).map_batches(
            lambda t: pa.table({"key": pa.array([], type=pa.int64())}),
            batch_format="pyarrow",
        )
    return kept.sort("key").limit(n_neg)


def link_prediction_pipeline(
    enc_edges: rd.Dataset,
    node_vectors: rd.Dataset,
    node_count: int,
    combiners: list[str] = ("hadamard",),
    negative_ratio: float = 1.0,
    test_fraction: float = 0.25,
    penalty: float = 0.0,
    max_epochs: int = 100,
    learning_rate: float = 0.1,
    id_col: str = "node_id",
    vec_col: str = "embedding",
    seed: int = 42,
    model: str = "lr",
    model_params: dict | None = None,
) -> dict:
    """LinkPredictionTrainingPipeline: positives = observed edges,
    negatives = seeded rejection-sampled non-edges (negativeSamplingRatio,
    LinkPredictionSplitConfig.java), features via the combiner stack,
    binary LR (or ``model="rf"``/``"mlp"`` — the reference trains
    RandomForest and MLP candidates for link prediction too), AUC-style
    accuracy on the held-out split.

    Negative sampling is fully distributed: candidate draws are pure
    functions of their global index, rejection is a hash-partitioned
    anti-join against edge-key shards, and positives/negatives meet via
    ``Dataset.union`` — nothing O(E) ever lands on the driver (the
    broadcast sampler :func:`_sample_negative_pairs` remains as the
    parity-tested small-graph reference path).
    """
    V = int(node_count)
    pos = enc_edges.select_columns(["src", "dst"]).repartition(8).materialize()
    n_pos = pos.count()

    pos_keys = pos.map_batches(
        lambda t: pa.table({
            "key": pa.array(
                t["src"].to_numpy(zero_copy_only=False).astype(np.int64) * V
                + t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
            )
        }),
        batch_format="pyarrow",
    )
    n_neg_target = int(n_pos * negative_ratio)
    neg_keys = _neg_sample_distributed(pos_keys, n_neg_target, V, seed)

    def keys_to_neg_pairs(t: pa.Table) -> pa.Table:
        k = t["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "src": pa.array(k // V),
                "dst": pa.array(k % V),
                "label": pa.array(np.zeros(len(k), dtype=np.int64)),
            }
        )

    def pos_with_label(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": t["src"].cast(pa.int64()),
                "dst": t["dst"].cast(pa.int64()),
                "label": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )

    neg_ds = neg_keys.map_batches(keys_to_neg_pairs, batch_format="pyarrow")
    pairs = pos.map_batches(pos_with_label, batch_format="pyarrow").union(
        neg_ds
    ).materialize()
    n_neg = int(pairs.count() - n_pos)

    feats = link_features(
        pairs, node_vectors, combiners=combiners,
        id_col=id_col, vec_col=vec_col,
    )
    # re-attach labels (features shuffled through joins): label rides the
    # pair key deterministically
    lab = pairs.select_columns(["src", "dst", "label"])
    from graph_data_science_ray.pipelines.agg import hash_join

    labeled = hash_join(feats, lab, on=["src", "dst"]).map_batches(
        lambda df: df.assign(
            _k=(df["src"].to_numpy(dtype=np.int64) * V
                + df["dst"].to_numpy(dtype=np.int64))
        ),
        batch_format="pandas",
    ).materialize()
    train, test = hash_split(labeled, "_k", test_fraction, seed=seed)
    if model == "rf":
        from graph_data_science_ray.pipelines.trees import train_random_forest

        model = train_random_forest(
            train, label_col="label", regression=False, key_col="_k",
            seed=seed, **(model_params or {}),
        )
    elif model == "mlp":
        model = train_mlp_classifier(
            train, label_col="label", penalty=penalty,
            max_epochs=max_epochs, learning_rate=learning_rate,
            key_col="_k", seed=seed, **(model_params or {}),
        )
    else:
        model = train_logistic_regression(
            train, label_col="label", penalty=penalty, max_epochs=max_epochs,
            learning_rate=learning_rate, key_col="_k", seed=seed,
        )
    scored = model.predict(test).to_pandas()
    acc = float((scored["predicted"] == scored["label"]).mean()) if len(scored) else 0.0
    return {"model": model, "metrics": {"accuracy": acc},
            "n_pos": int(n_pos), "n_neg": n_neg}

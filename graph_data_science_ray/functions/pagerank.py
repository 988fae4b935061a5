"""PageRank — delta-push (damped-delta) semantics, matching the reference.

Reference: algo/src/main/java/org/neo4j/gds/pagerank/PageRankComputation.java:35-115,
defaults tolerance=1e-7, maxIterations=20, damping=0.85
(PageRankConfig.java:39-52).

Semantics reproduced exactly:
- every node starts at ``alpha = 1 - damping`` (personalized: alpha for
  source nodes, 0 otherwise) — PageRankComputation.java:66-75;
- per superstep ``delta = damping * sum(messages)``, ``rank += delta``;
  a node sends ``delta / degree`` to out-neighbors only while
  ``delta > tolerance`` (PageRankComputation.java:78-99). The final score
  is a sum of damped deltas, **not** normalized — an isolated node scores
  exactly ``1 - damping``;
- weighted mode divides by the weighted out-degree and multiplies each
  message by the relationship weight (PageRankComputation.java:107-109,
  PageRankAlgorithmFactory.java:140-156);
- convergence: no messages sent (PartitionedComputer.java:87-94).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from graph_data_science_ray.state.pregel import Pregel, PregelComputation


class PageRankComputation(PregelComputation):
    reducer = "sum"

    def __init__(
        self,
        damping: float = 0.85,
        tolerance: float = 1e-7,
        weighted: bool = False,
        source_nodes: np.ndarray | None = None,
    ):
        self.damping = float(damping)
        self.tolerance = float(tolerance)
        self.weighted = bool(weighted)
        self.source_nodes = (
            np.asarray(source_nodes, dtype=np.int64) if source_nodes is not None else None
        )

    def init_state(self, block: dict) -> dict:
        n = block["end"] - block["start"]
        alpha = 1.0 - self.damping
        if self.source_nodes is None:
            rank = np.full(n, alpha, dtype=np.float64)
        else:
            rank = np.zeros(n, dtype=np.float64)
            local = self.source_nodes[
                (self.source_nodes >= block["start"]) & (self.source_nodes < block["end"])
            ]
            rank[local - block["start"]] = alpha
        return {"rank": rank, "delta": rank.copy()}

    def message_values(self, state: dict, block: dict):
        deg = block["wdegrees"] if self.weighted else block["degrees"]
        safe = np.where(deg > 0, deg, 1).astype(np.float64)
        vals = state["delta"] / safe
        active = state["delta"] > self.tolerance
        return vals, active

    def apply_messages(self, state, acc, received, block):
        delta = self.damping * acc
        state["delta"] = delta
        state["rank"] = state["rank"] + delta
        active = delta > self.tolerance
        return {
            "active": int(active.sum()),
            "max_delta": float(delta.max()) if len(delta) else 0.0,
        }

    def is_converged(self, stats: dict) -> bool:
        return stats.get("active", stats.get("init", 1)) == 0 and "init" not in stats


def pagerank(
    graph,
    damping: float = 0.85,
    tolerance: float = 1e-7,
    max_iterations: int = 20,
    weighted: bool = False,
    source_nodes=None,
    checkpoint_dir: str | None = None,
    checkpoint_interval: int = 1,
    resume: bool = True,
    scaler: str | None = None,
) -> pd.DataFrame:
    """Run PageRank over a projected ``GraphStore``.

    Returns a DataFrame ``(node, score)`` where ``node`` is the original
    actor key when the graph carries an IdMap, else the dense id —
    mirroring ``gds.pageRank.stream``'s ``(toOriginalNodeId, score)`` rows
    (proc/centrality/src/main/java/org/neo4j/gds/pagerank/PageRankStreamSpec.java:56-70).

    ``scaler``: the reference's post-run score scaling
    (PageRankAlgorithm.java:85-101; PageRankConfig.scaler) — one of
    None/"l1norm"/"l2norm"/"minmax"/"max"/"mean"/"center"/"stdscore",
    applied to the converged score vector.
    """
    comp = PageRankComputation(damping, tolerance, weighted, source_nodes)
    engine = Pregel(graph, comp, checkpoint_dir, checkpoint_interval)
    refs = engine.run(max_iterations=max_iterations, resume=resume)
    scores = engine.gather(refs, "rank")
    if scaler is not None:
        scores = _scale_scores(scores, scaler)
    if graph.idmap is not None:
        return pd.DataFrame({"node": graph.idmap.keys, "score": scores})
    return pd.DataFrame({"node": np.arange(graph.node_count, dtype=np.int64), "score": scores})


def _scale_scores(x: np.ndarray, scaler: str) -> np.ndarray:
    """Reference scaler semantics on a dense score vector (algo-common
    scaling package; zero-denominator fallback to 0)."""
    x = np.asarray(x, dtype=np.float64)
    if scaler == "l1norm":
        d = np.abs(x).sum()
    elif scaler == "l2norm":
        d = np.sqrt((x * x).sum())
    elif scaler == "max":
        d = np.abs(x).max() if len(x) else 0.0
    elif scaler == "minmax":
        lo, hi = x.min(), x.max()
        return (x - lo) / (hi - lo) if hi > lo else np.zeros_like(x)
    elif scaler == "mean":
        lo, hi = x.min(), x.max()
        return (x - x.mean()) / (hi - lo) if hi > lo else np.zeros_like(x)
    elif scaler == "center":
        return x - x.mean()
    elif scaler == "stdscore":
        sd = x.std()
        return (x - x.mean()) / sd if sd > 0 else np.zeros_like(x)
    else:
        raise ValueError(f"unknown scaler {scaler!r}")
    return x / d if d > 0 else np.zeros_like(x)


class ArticleRankComputation(PageRankComputation):
    """ArticleRank variant: contributions divide by (degree + average
    degree), damping the influence of low-degree hubs (reference
    ArticleRankComputation.java). The average out-degree is a graph
    constant computed at build time."""

    def __init__(self, avg_degree: float, **kw):
        super().__init__(**kw)
        self.avg_degree = float(avg_degree)

    def message_values(self, state, block):
        deg = block["wdegrees"] if self.weighted else block["degrees"]
        safe = deg.astype(np.float64) + self.avg_degree
        vals = state["delta"] / np.where(safe > 0, safe, 1.0)
        active = state["delta"] > self.tolerance
        return vals, active


def article_rank(graph, damping: float = 0.85, tolerance: float = 1e-7,
                 max_iterations: int = 20, weighted: bool = False) -> pd.DataFrame:
    """ArticleRank (reference algo/.../pagerank/ArticleRankComputation.java)."""
    import ray

    blocks = ray.get(graph.block_refs())
    key = "wdegrees" if weighted else "degrees"
    total = sum(float(b[key].sum()) for b in blocks)
    avg = total / max(graph.node_count, 1)
    comp = ArticleRankComputation(avg, damping=damping, tolerance=tolerance,
                                  weighted=weighted)
    engine = Pregel(graph, comp)
    refs = engine.run(max_iterations=max_iterations)
    scores = engine.gather(refs, "rank")
    node = (graph.idmap.keys if graph.idmap is not None
            else np.arange(graph.node_count, dtype=np.int64))
    return pd.DataFrame({"node": node, "score": scores})


def eigenvector(
    graph,
    max_iterations: int = 20,
    tolerance: float = 1e-7,
    normalize: str = "each",
) -> pd.DataFrame:
    """Eigenvector centrality: normalized power iteration
    ``r <- A^T r / ||A^T r||_2`` (reference EigenvectorComputation.java —
    PageRank-family variant without damping, scores L2-normalized).

    ``normalize="none"`` skips the per-round L2 rescale and returns the
    RAW round-``max_iterations`` vector. With integer edge weights and
    the all-ones start this vector is EXACTLY integer-valued as long as
    it stays below 2^53 (integer float64 sums are order-independent), so
    a fixed-round SQL power iteration reproduces it bit-for-bit — the
    exact-oracle contract for the otherwise float-normalized algorithm.
    Direction is identical to the normalized run; only the scale differs.
    """
    import ray

    from graph_data_science_ray.functions.hits import _PushSum, _scale
    from graph_data_science_ray.state.pregel import Pregel as _P

    # reuse the hub/auth push-sum computation on a single state slot
    engine = _P(graph, _PushSum("hub", "hub"))
    states = engine.init_states()
    prev = None
    if normalize == "none":
        for _ in range(max_iterations):
            states, _stats = engine.step(states)
        prev = engine.gather(states, "hub")
    else:
        for _ in range(max_iterations):
            states, stats = engine.step(states)
            norm = np.sqrt(stats["sumsq"]) or 1.0
            states = _scale(states, "hub", 1.0 / norm)
            cur = engine.gather(states, "hub")
            if prev is not None and np.abs(cur - prev).max() <= tolerance:
                prev = cur
                break
            prev = cur
    node = (graph.idmap.keys if graph.idmap is not None
            else np.arange(graph.node_count, dtype=np.int64))
    return pd.DataFrame({"node": node, "score": prev})


def katz(
    graph,
    rounds: int = 4,
    beta_scale: int = 1024,
) -> pd.DataFrame:
    """Truncated Katz centrality with the integer fixed-round contract.

    ``x_0 = β·1;  x_{t+1} = β + floor(Aᵀ x_t / 2)`` — attenuation
    α = 1/2 applied as exact integer floor-halving after each push-sum,
    with β = ``beta_scale`` (an integer so every value stays an exact
    integer float64 < 2^53: order-independent sums, bit-exact at any
    parallelism, and reproducible verbatim by a per-round SQL mirror —
    the ``eigenvector(normalize="none")`` contract extended with the
    per-round affine step Katz adds over plain power iteration).
    Truncation at ``rounds`` is the standard finite Katz sum
    ``Σ_{k≤R} α^k (Aᵀ)^k β·1`` up to the floor quantization.  Keep
    ``beta_scale · (max_in_degree/2)^rounds`` under 2^53.
    """
    import ray  # noqa: F401

    from graph_data_science_ray.functions.hits import _PushSum, _scale
    from graph_data_science_ray.state.pregel import Pregel as _P

    engine = _P(graph, _PushSum("hub", "hub"))
    states = engine.init_states()
    states = _scale(states, "hub", float(beta_scale))

    import ray as _ray

    @_ray.remote
    def half_plus_beta(state, key, beta):
        state = {k: v.copy() for k, v in state.items()}
        state[key] = np.floor(state[key] / 2.0) + beta
        return state

    for _ in range(int(rounds)):
        states, _stats = engine.step(states)
        states = [
            half_plus_beta.remote(s, "hub", float(beta_scale)) for s in states
        ]
    vals = engine.gather(states, "hub")
    node = (graph.idmap.keys if graph.idmap is not None
            else np.arange(graph.node_count, dtype=np.int64))
    return pd.DataFrame({"node": node, "score": vals})

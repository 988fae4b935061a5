"""Betweenness centrality — Brandes with source sampling.

Reference: algo/src/main/java/org/neo4j/gds/betweenness/BetweennessCentrality.java:39
(forward BFS accumulating shortest-path counts σ, then backward dependency
accumulation δ; optional RandomDegree source sampling). Distributed shape:
per source, level-synchronous BFS waves — each level is one sum-scatter of
σ from the frontier; the backward sweep replays levels in reverse with one
sum-scatter of δ-ratios per level (on the reverse projection).

Unweighted distances (the reference's default path semantics for BFS-based
Brandes). ``sources=None`` runs every node — O(V·E); pass a sample for
scale (the reference's sampling strategy).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

from graph_data_science_ray.state.pregel import Pregel, PregelComputation


class _SigmaBfs(PregelComputation):
    """Level-synchronous BFS: distances + shortest-path counts σ."""

    reducer = "sum"

    def __init__(self, source: int):
        self.source = int(source)

    def init_state(self, block: dict) -> dict:
        n = block["end"] - block["start"]
        dist = np.full(n, -1, dtype=np.int64)
        sigma = np.zeros(n, dtype=np.float64)
        if block["start"] <= self.source < block["end"]:
            dist[self.source - block["start"]] = 0
            sigma[self.source - block["start"]] = 1.0
        return {"dist": dist, "sigma": sigma, "level": np.zeros(1, dtype=np.int64)}

    def message_values(self, state, block):
        lvl = int(state["level"][0])
        frontier = state["dist"] == lvl
        return state["sigma"], frontier

    def apply_messages(self, state, acc, received, block):
        lvl = int(state["level"][0]) + 1
        undiscovered = state["dist"] < 0
        newly = undiscovered & (acc > 0)
        state["dist"] = np.where(newly, lvl, state["dist"])
        state["sigma"] = np.where(newly, acc, state["sigma"])
        state["level"] = np.array([lvl], dtype=np.int64)
        return {"changed": int(newly.sum())}

    def is_converged(self, stats):
        return stats.get("init") is None and stats.get("changed", 1) == 0


class _DeltaBack(PregelComputation):
    """Backward dependency accumulation on the REVERSE projection.

    At sweep step t (level L-t), nodes at that level send
    ``(1 + δ) / σ`` along reverse edges; receivers at the previous level
    accumulate ``σ_v · Σ``.
    """

    reducer = "sum"

    def __init__(self, dist: np.ndarray, sigma: np.ndarray, max_level: int):
        self.dist = dist
        self.sigma = sigma
        self.max_level = int(max_level)

    def init_state(self, block: dict) -> dict:
        n = block["end"] - block["start"]
        return {"delta": np.zeros(n, dtype=np.float64),
                "step": np.zeros(1, dtype=np.int64)}

    def message_values(self, state, block):
        lvl = self.max_level - int(state["step"][0])
        d = self.dist[block["start"] : block["end"]]
        s = self.sigma[block["start"] : block["end"]]
        frontier = d == lvl
        safe = np.where(s > 0, s, 1.0)
        return (1.0 + state["delta"]) / safe, frontier

    def apply_messages(self, state, acc, received, block):
        lvl = self.max_level - int(state["step"][0]) - 1
        d = self.dist[block["start"] : block["end"]]
        s = self.sigma[block["start"] : block["end"]]
        at_level = d == lvl
        state["delta"] = state["delta"] + np.where(at_level, s * acc, 0.0)
        state["step"] = state["step"] + 1
        return {"changed": 1}

    def is_converged(self, stats):
        return False


def select_sources(
    gd, sampling_size: int, strategy: str = "random", seed: int = 42
) -> np.ndarray:
    """Source sampling strategies for approximate betweenness — the
    reference's SelectionStrategy (betweenness/SelectionStrategy.java):
    "random" = uniform without replacement; "degree" = the
    RandomDegreeSelectionStrategy bias (probability ∝ out-degree, so
    structurally important sources are preferred). Seeded and
    deterministic at any parallelism."""
    from graph_data_science_ray._util import splitmix64

    n = gd.node_count
    k = min(int(sampling_size), n)
    ids = np.arange(n, dtype=np.int64)
    draws = splitmix64(ids.astype(np.uint64) + np.uint64(seed) * np.uint64(0x9E3779B9))
    u = (draws.astype(np.float64) + 1.0) / 2.0**64  # (0,1]
    if strategy == "random":
        keyv = u
    elif strategy == "degree":
        deg = gd.out_degrees().astype(np.float64)
        # weighted sampling without replacement (Efraimidis-Spirakis):
        # key = u^(1/w); top-k keys — zero-degree nodes never selected
        with np.errstate(divide="ignore"):
            keyv = np.where(deg > 0, u ** (1.0 / np.maximum(deg, 1e-300)), -1.0)
    else:
        raise ValueError(f"unknown strategy {strategy!r}")
    # drop the -1.0 sentinel rows (zero-degree nodes) BEFORE the top-k cut:
    # when k exceeds the positive-degree count they would otherwise land in
    # the tail of the selection despite the documented exclusion
    eligible = keyv >= 0
    ids, keyv = ids[eligible], keyv[eligible]
    k = min(k, len(ids))
    order = np.lexsort((ids, -keyv))
    return np.sort(ids[order[:k]])


def betweenness(
    gd,
    grev,
    sources: np.ndarray | None = None,
    normalized: bool = False,
) -> pd.DataFrame:
    """Sampled Brandes betweenness; returns (node, betweenness).

    ``gd``/``grev``: forward and reverse projections with shared
    boundaries. Exact when ``sources`` covers every node; use
    :func:`select_sources` for the reference's random / random-degree
    sampling strategies.
    """
    if sources is None:
        sources = np.arange(gd.node_count, dtype=np.int64)
    total = np.zeros(gd.node_count, dtype=np.float64)
    for s in np.asarray(sources, dtype=np.int64):
        fwd = Pregel(gd, _SigmaBfs(int(s)))
        refs = fwd.run(max_iterations=gd.node_count + 2)
        dist = fwd.gather(refs, "dist")
        sigma = fwd.gather(refs, "sigma")
        max_level = int(dist.max())
        if max_level <= 0:
            continue
        back = Pregel(grev, _DeltaBack(dist, sigma, max_level))
        brefs = back.init_states()
        for _ in range(max_level):
            brefs, _stats = back.step(brefs)
        delta = back.gather(brefs, "delta")
        delta[s] = 0.0
        delta[dist < 0] = 0.0
        total += delta
    if normalized and gd.node_count > 2:
        total /= (gd.node_count - 1) * (gd.node_count - 2)
    node = (
        gd.idmap.keys if gd.idmap is not None else np.arange(gd.node_count, dtype=np.int64)
    )
    return pd.DataFrame({"node": node, "betweenness": total})

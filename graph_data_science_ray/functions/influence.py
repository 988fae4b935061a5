"""CELF influence maximization under the independent-cascade model.

Reference: algo/src/main/java/org/neo4j/gds/influenceMaximization/CELF.java:35
(lazy-forward greedy of Leskovec et al., Monte-Carlo IC spread
estimation). Distributed shape:

- spread(S) is estimated by R seeded independent-cascade simulations;
  each task runs a batch of simulations with vectorized frontier
  expansion over the shared CSR blocks (zero-copy block reads, per-edge
  coin flips from splitmix64 of (sim, src, dst) — deterministic and
  parallelism-independent);
- the first greedy round evaluates every candidate in parallel (the
  embarrassingly parallel bulk of CELF's cost); subsequent rounds
  lazily re-evaluate only the queue head(s), batched through the same
  task pool.

The driver holds only the priority queue (O(candidates)).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

from graph_data_science_ray._util import mix2


@ray.remote
def _ic_spread(block_refs: list, seeds: np.ndarray, node_count: int,
               p: float, sims: int, seed0: int) -> float:
    """Mean IC spread of seed set over ``sims`` seeded cascades."""
    blocks = ray.get(list(block_refs))
    part_starts = np.array([b["start"] for b in blocks], dtype=np.int64)
    thresh = np.uint64(int(p * 2**64)) if p < 1.0 else np.uint64(2**64 - 1)
    total = 0
    seeds = np.asarray(seeds, dtype=np.int64)
    for r in range(sims):
        reached = np.zeros(node_count, dtype=bool)
        reached[seeds] = True
        frontier = seeds
        while len(frontier):
            p_idx = np.searchsorted(part_starts, frontier, side="right") - 1
            next_nodes = []
            for pi in np.unique(p_idx):
                b = blocks[pi]
                sel = frontier[p_idx == pi]
                lo = sel - b["start"]
                d = b["indptr"][lo + 1] - b["indptr"][lo]
                if not d.sum():
                    continue
                srcs = np.repeat(sel, d)
                seg0 = b["indptr"][lo]
                within = np.arange(int(d.sum()), dtype=np.int64) - np.repeat(
                    np.cumsum(d) - d, d
                )
                dsts = b["indices"][np.repeat(seg0, d) + within]
                coin = mix2(seed0 + r, srcs * np.int64(node_count) + dsts, 0) < thresh
                hit = dsts[coin & ~reached[dsts]]
                if len(hit):
                    next_nodes.append(np.unique(hit))
            if not next_nodes:
                break
            frontier = np.unique(np.concatenate(next_nodes))
            frontier = frontier[~reached[frontier]]
            reached[frontier] = True
        total += int(reached.sum())
    return total / max(sims, 1)


def celf(
    graph,
    k: int = 5,
    propagation_probability: float = 0.1,
    monte_carlo_simulations: int = 30,
    candidate_limit: int | None = 200,
    seed: int = 42,
) -> pd.DataFrame:
    """Top-k seed set by lazy-forward greedy; returns (node, spread_gain)
    in pick order. ``candidate_limit`` restricts candidates to the
    highest-out-degree nodes (the standard pre-filter at scale)."""
    import heapq

    blocks = graph.block_refs()
    V = graph.node_count
    # candidates by out-degree (degrees live in the blocks)
    degs = np.zeros(V, dtype=np.int64)
    for p, b in enumerate(ray.get(blocks)):
        degs[b["start"] : b["end"]] = b["degrees"]
    cand = np.argsort(-degs, kind="stable")
    if candidate_limit:
        cand = cand[: int(candidate_limit)]
    cand = np.sort(cand)

    # round 1: spread({v}) for every candidate, fully parallel
    gains = ray.get(
        [
            _ic_spread.remote(blocks, np.array([v]), V, propagation_probability,
                              monte_carlo_simulations, seed)
            for v in cand
        ]
    )
    # heap of (-gain, node, last_evaluated_round)
    heap = [(-g, int(v), 0) for g, v in zip(gains, cand)]
    heapq.heapify(heap)

    chosen: list[int] = []
    chosen_gain: list[float] = []
    base_spread = 0.0
    rnd = 0
    while len(chosen) < min(k, len(cand)):
        rnd += 1
        while True:
            neg_g, v, last = heapq.heappop(heap)
            if last == rnd:
                chosen.append(v)
                chosen_gain.append(-neg_g)
                base_spread += -neg_g
                break
            # lazy re-evaluation against the current seed set
            new_spread = ray.get(
                _ic_spread.remote(
                    blocks, np.array(chosen + [v]), V, propagation_probability,
                    monte_carlo_simulations, seed,
                )
            )
            heapq.heappush(heap, (-(new_spread - base_spread), v, rnd))

    nodes = np.asarray(chosen, dtype=np.int64)
    node = graph.idmap.to_keys(nodes) if graph.idmap is not None else nodes
    return pd.DataFrame(
        {"node": node, "spread_gain": np.round(np.asarray(chosen_gain), 6)}
    )

"""All shortest paths (APSP stream) — unweighted MSBFS + weighted waves.

References:
- allshortestpaths/MSBFSAllShortestPaths.java:36 — unweighted all-pairs
  stream via bit-parallel multi-source BFS (64 sources per machine word),
  emitting one ``(source, target, distance)`` row per reached pair;
- allshortestpaths/WeightedAllShortestPaths.java:41 — weighted variant,
  one shortest-path tree per source.

Ray-Data-first shape: sources are processed in waves. Unweighted waves
ride the uint64 bitwise-OR reducer (frontier union == bitwise OR, the
reference's ω=64 bit-parallel trick) with a per-partition ``(n, 64)``
first-seen-iteration matrix; weighted waves ride the NEW 2-D min reducer
(``dist(v,j) = min(dist(v,j), min_u dist(u,j) + w(u,v))`` for all wave
columns j at once — one BSP relaxation run per 64 sources instead of 64
runs). Output size is O(reached pairs); pass ``sources`` to bound it
(the reference streams the full quadratic result; callers at scale
sample sources exactly like sampled-Brandes betweenness).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

from graph_data_science_ray.state.pregel import Pregel, PregelComputation

_BITS = np.uint64(1) << np.arange(64, dtype=np.uint64)


def _unpack_bits(masks: np.ndarray, k: int) -> np.ndarray:
    """(n,) uint64 -> (n, k) bool of the low k bits."""
    as_bytes = masks.view(np.uint8).reshape(len(masks), 8)
    return np.unpackbits(as_bytes, axis=1, bitorder="little")[:, :k].astype(bool)


class MsbfsAspWave(PregelComputation):
    """Unweighted wave: uint64 frontier masks + first-seen hop matrix."""

    reducer = "or"

    def __init__(self, wave_sources: np.ndarray):
        self.wave = np.asarray(wave_sources, dtype=np.int64)

    def init_state(self, block: dict) -> dict:
        n = block["end"] - block["start"]
        k = len(self.wave)
        seen = np.zeros(n, dtype=np.uint64)
        dist = np.full((n, k), -1, dtype=np.int32)
        for j, s in enumerate(self.wave):
            if block["start"] <= s < block["end"]:
                seen[s - block["start"]] |= _BITS[j]
                dist[s - block["start"], j] = 0
        return {
            "seen": seen,
            "frontier": seen.copy(),
            "dist": dist,
            "it": np.zeros(1, dtype=np.int64),
        }

    def message_values(self, state, block):
        return state["frontier"], state["frontier"] != 0

    def apply_messages(self, state, acc, received, block):
        new_bits = acc & ~state["seen"]
        state["seen"] |= new_bits
        state["frontier"] = new_bits
        it = int(state["it"][0]) + 1
        state["it"] = np.array([it], dtype=np.int64)
        hit = _unpack_bits(new_bits, state["dist"].shape[1])
        state["dist"][hit] = it
        return {"changed": int((new_bits != 0).sum())}

    def is_converged(self, stats):
        return stats.get("init") is None and stats.get("changed", 1) == 0


class MultiSourceSssp(PregelComputation):
    """Weighted wave: (n, k) float64 distance matrix on the 2-D min
    reducer with additive edge combine."""

    reducer = "min"
    message_dtype = "float64"

    def __init__(self, wave_sources: np.ndarray, weighted: bool = True):
        self.wave = np.asarray(wave_sources, dtype=np.int64)
        self.edge_combine = "add" if weighted else "add_one"
        self.message_width = len(self.wave)

    def init_state(self, block: dict) -> dict:
        n = block["end"] - block["start"]
        k = len(self.wave)
        dist = np.full((n, k), np.inf, dtype=np.float64)
        for j, s in enumerate(self.wave):
            if block["start"] <= s < block["end"]:
                dist[s - block["start"], j] = 0.0
        return {"dist": dist, "changed": np.isfinite(dist).any(axis=1)}

    def message_values(self, state, block):
        return state["dist"], state["changed"]

    def apply_messages(self, state, acc, received, block):
        new = np.minimum(state["dist"], acc)
        ch = (new < state["dist"]).any(axis=1)
        state["dist"] = new
        state["changed"] = ch
        return {"changed": int(ch.sum())}

    def is_converged(self, stats):
        return stats.get("init") is None and stats.get("changed", 1) == 0


@ray.remote
def _emit_pairs(state: dict, start: int, wave: np.ndarray, weighted: bool):
    """Per-partition (source, target, distance) rows for reached pairs."""
    dist = state["dist"]
    if weighted:
        tgt_idx, src_idx = np.nonzero(np.isfinite(dist))
        d = dist[tgt_idx, src_idx].astype(np.float64)
    else:
        tgt_idx, src_idx = np.nonzero(dist >= 0)
        d = dist[tgt_idx, src_idx].astype(np.float64)
    return {
        "source": wave[src_idx],
        "target": tgt_idx.astype(np.int64) + start,
        "distance": d,
    }


def all_shortest_paths(
    graph,
    sources: np.ndarray | None = None,
    weighted: bool = False,
    max_iterations: int = 10_000,
) -> pd.DataFrame:
    """Stream of ``(source, target, distance)`` for every reached pair.

    ``sources=None`` means every node (the reference's full quadratic
    stream — sample at scale). Distance is hop count when
    ``weighted=False``; the weighted variant consumes edge weights with
    exact float sums (integer-valued weights combine exactly in any
    order). Rows are built in per-partition Ray tasks; only the final
    concat touches the driver.
    """
    if sources is None:
        sources = np.arange(graph.node_count, dtype=np.int64)
    sources = np.asarray(sources, dtype=np.int64)
    parts: list = []
    for w0 in range(0, len(sources), 64):
        wave = sources[w0 : w0 + 64]
        comp = MultiSourceSssp(wave) if weighted else MsbfsAspWave(wave)
        engine = Pregel(graph, comp)
        refs = engine.run(max_iterations=min(max_iterations, graph.node_count + 1))
        for p, ref in enumerate(refs):
            parts.append(
                _emit_pairs.remote(ref, int(graph.boundaries[p]), wave, weighted)
            )
    cols = ray.get(parts)
    src = np.concatenate([c["source"] for c in cols])
    tgt = np.concatenate([c["target"] for c in cols])
    d = np.concatenate([c["distance"] for c in cols])
    if graph.idmap is not None:
        return pd.DataFrame(
            {
                "source": graph.idmap.keys[src],
                "target": graph.idmap.keys[tgt],
                "distance": d,
            }
        )
    return pd.DataFrame({"source": src, "target": tgt, "distance": d})


@ray.remote
def _wave_ecc(state: dict, wave_len: int):
    """Per-partition per-wave-column hop maxima: a (k,) int64 vector —
    the only thing that ever travels back to the driver."""
    dist = state["dist"]  # (n_part, k) int32, -1 = unreached
    if dist.shape[0] == 0:
        return np.full(wave_len, -1, dtype=np.int64)
    return dist.max(axis=0).astype(np.int64)


def eccentricity(
    graph,
    sources: np.ndarray | None = None,
    max_iterations: int = 10_000,
) -> pd.DataFrame:
    """Per-node eccentricity: max hop distance to any REACHED node.

    Rides the same 64-way bit-parallel MSBFS waves as
    ``all_shortest_paths`` (allshortestpaths/MSBFSAllShortestPaths.java:36)
    but never materializes the O(V^2) pair stream: each partition reduces
    its (n_part, 64) first-seen-hop matrix to 64 per-source maxima, and
    the driver max-merges those (waves x partitions x 64) scalars — the
    driver traffic is answer-sized (one int per source), so the op is
    safe at 10^10 nodes with sampled sources and exact on full V here.

    Isolated nodes (reached set == {self}) get eccentricity 0. Unreached
    columns in a partition contribute -1 and never win the max.
    """
    if sources is None:
        sources = np.arange(graph.node_count, dtype=np.int64)
    sources = np.asarray(sources, dtype=np.int64)
    ecc = np.zeros(len(sources), dtype=np.int64)
    pending: list[tuple[int, list]] = []
    for w0 in range(0, len(sources), 64):
        wave = sources[w0 : w0 + 64]
        engine = Pregel(graph, MsbfsAspWave(wave))
        refs = engine.run(max_iterations=min(max_iterations, graph.node_count + 1))
        pending.append((w0, [_wave_ecc.remote(ref, len(wave)) for ref in refs]))
    for w0, tasks in pending:
        per_part = np.stack(ray.get(tasks), axis=0)  # (P, k)
        k = per_part.shape[1]
        ecc[w0 : w0 + k] = np.maximum(per_part.max(axis=0), 0)
    if graph.idmap is not None:
        return pd.DataFrame({"node": graph.idmap.keys[sources], "ecc": ecc})
    return pd.DataFrame({"node": sources, "ecc": ecc})


def graph_diameter(graph, max_iterations: int = 10_000) -> pd.DataFrame:
    """Exact diameter/radius readout: (metric, value) rows with
    ``diameter = max ecc`` and ``radius = min ecc`` over all nodes.
    Same distributed reduction as :func:`eccentricity`; compare with the
    HyperANF ``effective_diameter`` sketch for the 10^12-edge regime.
    """
    ecc = eccentricity(graph, max_iterations=max_iterations)["ecc"].to_numpy()
    return pd.DataFrame(
        {
            "metric": ["diameter", "radius"],
            "value": np.array([ecc.max(), ecc.min()], dtype=np.int64),
        }
    )

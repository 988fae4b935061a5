"""Closeness & harmonic centrality via bit-parallel multi-source BFS.

References:
- closeness/ClosenessCentrality.java:42 — closeness = (r−1) / Σ_v d(u,v)
  over reached nodes r;
- harmonic/HarmonicCentrality.java:35 — inverse-distance sums;
- msbfs/MultiSourceBFSAccessMethods.java:65 — ω = 64 sources per wave as
  one machine word; our wave is a uint64 bitmask column propagated with
  the BSP ``or`` reducer (bitwise-OR ≙ the reference's bit-parallel
  frontier union).

Exactness contract: integer ppm outputs —
``closeness_ppm = 1e6·(r−1) // Σd`` and ``harmonic_ppm = Σ (1e6 // d)``
(fixed-point inverse-distance sum) — hash-stable against the SQL oracle.
Full closeness over all nodes is O(V·E/64); pass ``sources`` to sample
(the scale path, mirroring the reference's Brandes-style sampling).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from graph_data_science_ray.state.pregel import Pregel, PregelComputation

_BITS = np.uint64(1) << np.arange(64, dtype=np.uint64)


def _popcount_per_bit(masks: np.ndarray) -> np.ndarray:
    """Per-bit set counts of a uint64 array -> (64,) int64."""
    as_bytes = masks.view(np.uint8).reshape(len(masks), 8)
    bits = np.unpackbits(as_bytes, axis=1, bitorder="little")
    return bits.sum(axis=0).astype(np.int64)


class MsbfsWave(PregelComputation):
    reducer = "or"

    def __init__(self, wave_sources: np.ndarray):
        self.wave_sources = np.asarray(wave_sources, dtype=np.int64)

    def init_state(self, block: dict) -> dict:
        n = block["end"] - block["start"]
        seen = np.zeros(n, dtype=np.uint64)
        for i, s in enumerate(self.wave_sources):
            if block["start"] <= s < block["end"]:
                seen[s - block["start"]] |= _BITS[i]
        return {
            "seen": seen,
            "frontier": seen.copy(),
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
        counts = _popcount_per_bit(new_bits)
        return {
            "changed": int((new_bits != 0).sum()),
            "reached_w": counts,
            "dist_w": counts * it,
            "harm_w": counts * (1_000_000 // it),
        }

    def is_converged(self, stats):
        return stats.get("init") is None and stats.get("changed", 1) == 0


def closeness_harmonic(
    graph, sources: np.ndarray | None = None, wasserman_faust: bool = False
) -> pd.DataFrame:
    """Closeness + harmonic centrality (integer ppm) for ``sources``
    (default: every node) over an undirected projection.

    ``wasserman_faust=True`` adds the reference's improved formula
    (closeness/WassermanFaustCentralityComputer.java:33 —
    ``(r−1)/Σd · (r−1)/(V−1)``) as ``closeness_wf_ppm =
    1e6·(r−1)² // (Σd·(V−1))`` — exact integer arithmetic."""
    if sources is None:
        sources = np.arange(graph.node_count, dtype=np.int64)
    sources = np.asarray(sources, dtype=np.int64)
    rows_src, rows_close, rows_harm, rows_reached = [], [], [], []
    rows_wf: list = []
    for w0 in range(0, len(sources), 64):
        wave = sources[w0 : w0 + 64]
        engine = Pregel(graph, MsbfsWave(wave))
        engine.run(max_iterations=graph.node_count + 1)
        k = len(wave)
        reached = np.zeros(64, dtype=np.int64)
        dist = np.zeros(64, dtype=np.int64)
        harm = np.zeros(64, dtype=np.int64)
        for h in engine.history:
            reached += np.asarray(h["reached_w"])
            dist += np.asarray(h["dist_w"])
            harm += np.asarray(h["harm_w"])
        rows_src.append(wave)
        with np.errstate(divide="ignore", invalid="ignore"):
            close = np.where(
                dist[:k] > 0, (1_000_000 * reached[:k]) // np.maximum(dist[:k], 1), 0
            )
        rows_close.append(close)
        rows_harm.append(harm[:k])
        rows_reached.append(reached[:k])
        if wasserman_faust:
            rows_wf.append(
                np.where(
                    dist[:k] > 0,
                    (1_000_000 * reached[:k] * reached[:k])
                    // np.maximum(dist[:k] * (graph.node_count - 1), 1),
                    0,
                )
            )
    src = np.concatenate(rows_src)
    out = pd.DataFrame(
        {
            "node": graph.idmap.keys[src] if graph.idmap is not None else src,
            "closeness_ppm": np.concatenate(rows_close).astype(np.int64),
            "harmonic_ppm": np.concatenate(rows_harm).astype(np.int64),
            "reached": np.concatenate(rows_reached).astype(np.int64),
        }
    )
    if wasserman_faust:
        out["closeness_wf_ppm"] = np.concatenate(rows_wf).astype(np.int64)
    return out

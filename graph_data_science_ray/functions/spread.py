"""Seeded harmonic label spreading — clamped random-walk propagation.

Semi-supervised node scoring in the Zhu & Ghahramani lineage ("Learning
from labeled and unlabeled data with label propagation", CMU-CALD-02-107,
2002): seed nodes hold a clamped label mass and every other node
iteratively averages its neighbors, here with the repo's exact-integer
discipline so the whole trajectory is SQL-replayable:

    x⁰(v) = S·[v ∈ seeds]
    x^{t+1}(v) = S                        if v ∈ seeds (clamped)
               = Σ_{u~v} floor(x^t(u) / deg(u))   otherwise

The floor-quotient push is the random-walk-normalized spread (each node
distributes its mass equally over its neighbors); clamping makes seeds
permanent sources, so scores rank nodes by proximity-weighted seed
density — the standard "expand a seed set" primitive for
trust/spam/topic propagation over interaction graphs.

Every value is an exact integer float64 (mass is conserved or shrunk by
flooring: total ≤ |seeds|·S + Σ degrees·rounds bound keeps values well
under 2^53 for S = 2^20), sums are order-independent, and a per-round
SQL mirror reproduces all V scores verbatim.

The seed set is a pure function of the dense id (``id % modulus == 0``)
or a caller-supplied boolean mask per partition; the division uses the
scatter-side CSR block's own degree array, so nothing ships.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from graph_data_science_ray.state.pregel import Pregel, PregelComputation


class _SeededSpread(PregelComputation):
    reducer = "sum"
    weighted = False

    def __init__(self, scale: int, modulus: int, seed_mask=None):
        self.scale = float(scale)
        self.modulus = int(modulus)
        self.mask_fn = seed_mask  # optional callable(dense_ids)->bool mask

    def _seed_mask(self, block: dict) -> np.ndarray:
        ids = np.arange(block["start"], block["end"], dtype=np.int64)
        if self.mask_fn is not None:
            return np.asarray(self.mask_fn(ids), dtype=bool)
        return ids % self.modulus == 0

    def init_state(self, block: dict) -> dict:
        seeds = self._seed_mask(block)
        return {"x": np.where(seeds, self.scale, 0.0)}

    def message_values(self, state, block):
        deg = np.asarray(block["degrees"], dtype=np.float64)
        out = np.where(deg > 0, np.floor(state["x"] / np.maximum(deg, 1.0)), 0.0)
        return out, deg > 0

    def apply_messages(self, state, acc, received, block):
        seeds = self._seed_mask(block)
        state["x"] = np.where(seeds, self.scale, acc)
        return {"mass": float(state["x"].sum())}

    def is_converged(self, stats):
        return False


def seeded_propagation(
    graph,
    rounds: int = 4,
    scale: int = 1 << 20,
    seed_modulus: int = 17,
    seed_mask=None,
) -> pd.DataFrame:
    """Clamped seed-set spreading over an **undirected** ``GraphStore``.

    Seeds are nodes whose dense id is ≡ 0 (mod ``seed_modulus``), or —
    when ``seed_mask`` (a pure ``callable(dense_ids: np.ndarray) ->
    bool mask``, shipped to every partition) is given — the nodes it
    selects; keep it deterministic so the run stays mirrorable.
    Returns ``(node, score)`` after exactly ``rounds`` supersteps
    (int64 scores; seeds score ``scale``).
    """
    if graph.directed:
        raise ValueError("seeded_propagation requires an undirected projection")
    engine = Pregel(graph, _SeededSpread(scale, seed_modulus, seed_mask))
    states = engine.init_states()
    for _ in range(int(rounds)):
        states, _s = engine.step(states)
    x = engine.gather(states, "x").astype(np.int64)
    node = (
        graph.idmap.keys
        if graph.idmap is not None
        else np.arange(graph.node_count, dtype=np.int64)
    )
    return pd.DataFrame({"node": node, "score": x})


def seeded_propagation_ds(
    graph,
    rounds: int = 4,
    scale: int = 1 << 20,
    seed_modulus: int = 17,
    seed_mask=None,
):
    """Dataset-returning variant of :func:`seeded_propagation` —
    per-partition ``(node, score)`` blocks, no driver gather."""
    if graph.directed:
        raise ValueError("seeded_propagation requires an undirected projection")
    engine = Pregel(graph, _SeededSpread(scale, seed_modulus, seed_mask))
    states = engine.init_states()
    for _ in range(int(rounds)):
        states, _s = engine.step(states)
    return engine.gather_ds(states, "x", out_col="score")

"""FastRP node embeddings — iterative sparse random projection.

Reference: algo/src/main/java/org/neo4j/gds/embeddings/fastrp/FastRP.java:52.
Semantics reproduced:
- base vectors: very sparse random projection (Achlioptas): entry ∈
  {−√3, 0, +√3} with probabilities {1/6, 2/3, 1/6}, a pure function of
  (seed, node id, dimension) — identical at any parallelism/partitioning;
- per iteration: average neighbor embeddings (groupby-sum of vectors /
  degree — the "neighbor-average = groupby-sum of vectors" mapping,
  SURVEY.md §2.5), then L2-normalize each row;
- final embedding = Σ_k iteration_weights[k] · x_k (reference default
  [0.0, 1.0, 1.0]).

Vector messages ride the BSP sum reducer as (n, d) float64 blocks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from graph_data_science_ray._util import mix2, uniform01
from graph_data_science_ray.state.pregel import Pregel, PregelComputation

SQRT3 = np.sqrt(3.0)


def _base_vectors(start: int, end: int, dim: int, seed: int) -> np.ndarray:
    nodes = np.repeat(np.arange(start, end, dtype=np.int64), dim)
    dims = np.tile(np.arange(dim, dtype=np.int64), end - start)
    u = uniform01(mix2(seed, nodes, dims)).reshape(end - start, dim)
    out = np.zeros((end - start, dim), dtype=np.float64)
    out[u < 1.0 / 6.0] = -SQRT3
    out[u > 5.0 / 6.0] = SQRT3
    return out


def _l2_rows(x: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(x, axis=1, keepdims=True)
    return x / np.where(n > 0, n, 1.0)


class FastRPComputation(PregelComputation):
    reducer = "sum"

    def __init__(self, dim: int, iteration_weights, seed: int, weighted: bool):
        self.dim = int(dim)
        self.iteration_weights = list(iteration_weights)
        self.seed = int(seed)
        self.weighted = bool(weighted)

    def init_state(self, block: dict) -> dict:
        base = _l2_rows(_base_vectors(block["start"], block["end"], self.dim, self.seed))
        emb = self.iteration_weights[0] * base if self.iteration_weights else 0.0 * base
        return {"cur": base, "emb": emb, "k": np.zeros(1, dtype=np.int64)}

    def message_values(self, state, block):
        return state["cur"], np.ones(len(state["cur"]), dtype=bool)

    def apply_messages(self, state, acc, received, block):
        deg = block["wdegrees"] if self.weighted else block["degrees"].astype(np.float64)
        # in-degree mean: acc summed over IN-edges; use the sender count via
        # received degree — the reference averages over the (undirected)
        # neighborhood, so run this on the symmetrized projection where
        # in-degree == out-degree.
        mean = acc / np.where(deg > 0, deg, 1.0)[:, None]
        nxt = _l2_rows(mean)
        k = int(state["k"][0]) + 1
        w = self.iteration_weights[k] if k < len(self.iteration_weights) else 0.0
        state["emb"] = state["emb"] + w * nxt
        state["cur"] = nxt
        state["k"] = np.array([k], dtype=np.int64)
        return {"done": 1}

    def is_converged(self, stats):
        return False


class FastRPExactComputation(PregelComputation):
    """Integer-exact FastRP contract (the ``eigenvector_exact`` recipe):
    hash-sign projection — sign(v, j) = +1 iff the last hex nibble of
    ``md5(f"{dense_id}:{salt}:{j}")`` is even — followed by fixed-round
    UNWEIGHTED neighbor sums. This is FastRP's structure (reference
    algo/.../embeddings/fastrp/FastRP.java:52 — projection + K
    propagation rounds) with the per-round L2 normalization removed, so
    every value is an exact integer (held losslessly in the float64
    message wire; |h_K| <= maxdeg^K) that a SQL oracle reproduces
    bit-for-bit via the same md5 parity + join-aggregate rounds.
    """

    reducer = "sum"

    def __init__(self, dim: int, salt: str = "frp"):
        self.dim = int(dim)
        self.salt = str(salt)
        self.message_width = int(dim)

    def init_state(self, block: dict) -> dict:
        import hashlib

        start, end = block["start"], block["end"]
        v = np.empty((end - start, self.dim), dtype=np.float64)
        for i, rk in enumerate(range(start, end)):
            for j in range(self.dim):
                h = hashlib.md5(f"{rk}:{self.salt}:{j}".encode()).hexdigest()
                v[i, j] = 1.0 if int(h[31], 16) % 2 == 0 else -1.0
        return {"cur": v}

    def message_values(self, state, block):
        return state["cur"], np.ones(len(state["cur"]), dtype=bool)

    def apply_messages(self, state, acc, received, block):
        state["cur"] = np.asarray(acc, dtype=np.float64)
        return {"done": 1}

    def is_converged(self, stats):
        return False


def fastrp_exact(
    graph, dim: int = 8, rounds: int = 2, salt: str = "frp"
) -> pd.DataFrame:
    """Integer FastRP over the symmetrized projection (long format).

    Returns one row per (node, dim): columns (node, dim, value) with
    ``value`` the exact int64 after ``rounds`` propagation rounds.
    """
    if graph.directed:
        raise ValueError("fastrp_exact expects the symmetrized projection")
    comp = FastRPExactComputation(dim, salt)
    engine = Pregel(graph, comp)
    refs = engine.run(max_iterations=rounds + 1)  # superstep 0 = init
    import ray

    states = ray.get(refs)
    vals, nodes = [], []
    for p, s in enumerate(states):
        vals.append(np.asarray(s["cur"], dtype=np.float64))
        start, end = graph.boundaries[p], graph.boundaries[p + 1]
        nodes.append(np.arange(start, end, dtype=np.int64))
    v = np.concatenate(vals)
    ids = np.concatenate(nodes)
    node = graph.idmap.keys[ids] if graph.idmap is not None else ids
    n = len(ids)
    return pd.DataFrame(
        {
            "node": np.repeat(np.asarray(node), dim),
            "dim": np.tile(np.arange(dim, dtype=np.int64), n),
            "value": np.rint(v).astype(np.int64).ravel(),
        }
    )


def fastrp(
    graph,
    dim: int = 64,
    iteration_weights=(0.0, 1.0, 1.0),
    seed: int = 42,
    weighted: bool = False,
) -> pd.DataFrame:
    """FastRP over an **undirected** (symmetrized) projection.

    Returns (node, embedding list<float64>).
    """
    if graph.directed:
        raise ValueError("fastrp expects the symmetrized projection (in-deg == out-deg)")
    comp = FastRPComputation(dim, iteration_weights, seed, weighted)
    engine = Pregel(graph, comp)
    refs = engine.run(max_iterations=len(list(iteration_weights)))
    import ray

    states = ray.get(refs)
    embs, nodes = [], []
    for p, s in enumerate(states):
        embs.append(s["emb"])
        start, end = graph.boundaries[p], graph.boundaries[p + 1]
        nodes.append(np.arange(start, end, dtype=np.int64))
    emb = np.concatenate(embs)
    ids = np.concatenate(nodes)
    node = graph.idmap.keys[ids] if graph.idmap is not None else ids
    return pd.DataFrame({"node": node, "embedding": [r for r in emb]})

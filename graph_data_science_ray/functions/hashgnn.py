"""HashGNN — hashed binary message passing (min-hash neighborhood mixing).

Reference: algo/src/main/java/org/neo4j/gds/embeddings/hashgnn/HashGNN.java:45.
The reference iteratively rebuilds each node's binary feature set by
min-hash-selecting features from its own and its neighbors' sets. Our
re-expression keeps the min-hash core on the BSP kernel:

- a node's embedding is ``dim`` signature slots (int64 each);
- init: slot j = splitmix64(node_id ^ seed_j);
- per iteration, per slot: every node's new slot value is
  ``min(mix(own), min over in-neighbors of mix(theirs))`` — one
  min-reducer superstep per slot (the kernel's groupby-min shuffle), so
  an iteration is ``dim`` cheap supersteps and two nodes with similar
  neighborhoods converge to equal slot values (the min-hash property:
  P[slot match] = neighborhood Jaccard).

Deterministic for a seed at any parallelism.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

from graph_data_science_ray._util import splitmix64
from graph_data_science_ray.state.pregel import Pregel, PregelComputation


class _SlotMin(PregelComputation):
    reducer = "min"
    message_dtype = "int64"

    def __init__(self, slot_seed: int):
        self.slot_seed = int(slot_seed)

    def init_state(self, block: dict) -> dict:
        # `sig` is injected by the driver before each slot round
        raise NotImplementedError("states are seeded by hash_gnn driver")

    def message_values(self, state, block):
        with np.errstate(over="ignore"):
            mixed = splitmix64(
                state["sig"].astype(np.uint64) ^ np.uint64(self.slot_seed)
            ).astype(np.int64)
        mixed = np.abs(mixed)  # keep below the min-identity sentinel
        return mixed, np.ones(len(mixed), dtype=bool)

    def apply_messages(self, state, acc, received, block):
        with np.errstate(over="ignore"):
            own = splitmix64(
                state["sig"].astype(np.uint64) ^ np.uint64(self.slot_seed)
            ).astype(np.int64)
        own = np.abs(own)
        state["sig"] = np.minimum(own, np.where(received, acc, own))
        return {"changed": 0}

    def is_converged(self, stats):
        return True


def hash_gnn(graph, dim: int = 16, iterations: int = 2, seed: int = 42) -> pd.DataFrame:
    """Binary-hash node embeddings; returns (node, signature list<int64>).

    ``iterations`` message-passing rounds of ``dim`` min-hash slots each;
    slot equality between two nodes estimates their (iterated)
    neighborhood Jaccard similarity.
    """
    V = graph.node_count
    ids = np.arange(V, dtype=np.int64)
    rng = np.random.default_rng(seed)
    slot_seeds = rng.integers(0, np.iinfo(np.int64).max, size=(iterations, dim))
    with np.errstate(over="ignore"):
        sig = np.stack(
            [
                np.abs(splitmix64(ids.astype(np.uint64) ^ np.uint64(int(s))).astype(np.int64))
                for s in slot_seeds[0]
            ],
            axis=1,
        )  # (V, dim) initial signatures

    bounds = graph.boundaries
    for it in range(iterations):
        new_sig = np.empty_like(sig)
        for j in range(dim):
            comp = _SlotMin(int(slot_seeds[it, j]))
            engine = Pregel(graph, comp)
            # seed per-partition states with the current slot column
            states = [
                ray.put({"sig": sig[bounds[p] : bounds[p + 1], j].copy()})
                for p in range(graph.num_partitions)
            ]
            states, _ = engine.step(states)
            new_sig[:, j] = engine.gather(states, "sig")
        sig = new_sig

    node = graph.idmap.keys if graph.idmap is not None else ids
    return pd.DataFrame({"node": node, "signature": list(sig)})

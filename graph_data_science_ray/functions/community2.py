"""Overlapping communities (SLLPA) and approximate max-k-cut.

- SLLPA: alpha/alpha-proc/src/main/java/org/neo4j/gds/pregel/SpeakerListenerLPA.java:47
  — speaker-listener label propagation. Every round each node SPEAKS one
  label drawn (seeded, uniform) from its memory of adopted labels and
  LISTENS by adopting the most frequent incoming label (max count, min
  label tie — exactly the vote reducer's argmax). After T rounds, every
  label filling at least ``threshold`` of a node's memory forms one of
  its (possibly several) communities.

- Approx max-k-cut: algo/src/main/java/org/neo4j/gds/approxmaxkcut/ApproxMaxKCut.java:46
  — randomized assignment + local-move rounds maximizing cut weight.
  Distributed like Louvain's local moves: a per-batch (node, part,
  weight) partial aggregate, hash-grouped per node, argmin of
  same-partition weight with parity scheduling; the driver sees only the
  move set.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from graph_data_science_ray._util import mix2
from graph_data_science_ray.pipelines.agg import hash_aggregate
from graph_data_science_ray.state.pregel import Pregel, PregelComputation


class SllpaComputation(PregelComputation):
    reducer = "vote"
    weighted = False

    def __init__(self, rounds: int, seed: int = 42):
        self.rounds = int(rounds)
        self.seed = int(seed)

    def init_state(self, block: dict) -> dict:
        n = block["end"] - block["start"]
        ids = np.arange(block["start"], block["end"], dtype=np.int64)
        mem = np.full((n, self.rounds + 1), -1, dtype=np.int64)
        mem[:, 0] = ids
        return {"mem": mem, "t": np.zeros(1, dtype=np.int64)}

    def message_values(self, state, block):
        t = int(state["t"][0])
        n = state["mem"].shape[0]
        ids = np.arange(block["start"], block["end"], dtype=np.int64)
        draw = (mix2(self.seed + t, ids, t) % np.uint64(t + 1)).astype(np.int64)
        spoken = state["mem"][np.arange(n), draw]
        return spoken, np.ones(n, dtype=bool)

    def apply_messages(self, state, acc, received, block):
        t = int(state["t"][0])
        ids = np.arange(block["start"], block["end"], dtype=np.int64)
        adopted = np.where(received, acc, ids)  # isolated nodes keep their id
        if t + 1 <= self.rounds:
            state["mem"][:, t + 1] = adopted
        state["t"] = state["t"] + 1
        return {"round": 1}

    def is_converged(self, stats: dict) -> bool:
        return False  # fixed round count via max_iterations


def sllpa(
    graph,
    rounds: int = 20,
    threshold: float = 0.1,
    seed: int = 42,
) -> pd.DataFrame:
    """Overlapping communities; returns (node, community) rows — one row
    per label held by >= threshold of the node's memory. Community id =
    label value (a node id), multiple rows per node possible."""
    comp = SllpaComputation(rounds, seed)
    engine = Pregel(graph, comp)
    refs = engine.run(max_iterations=rounds + 1)
    states = ray.get(refs)
    min_count = max(1, int(np.ceil(threshold * (rounds + 1))))
    parts_node, parts_comm = [], []
    for p, s in enumerate(states):
        mem = s["mem"]
        start = graph.boundaries[p]
        n, T1 = mem.shape
        if n == 0:
            continue
        flat = mem.reshape(-1)
        rows = np.repeat(np.arange(n, dtype=np.int64), T1)
        valid = flat >= 0
        r, l = rows[valid], flat[valid]
        order = np.lexsort((l, r))
        r, l = r[order], l[order]
        new = np.empty(len(r), dtype=bool)
        new[0] = True
        new[1:] = (r[1:] != r[:-1]) | (l[1:] != l[:-1])
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, len(r)))
        keep = counts >= min_count
        parts_node.append(r[starts][keep] + start)
        parts_comm.append(l[starts][keep])
    node = np.concatenate(parts_node) if parts_node else np.zeros(0, dtype=np.int64)
    comm = np.concatenate(parts_comm) if parts_comm else np.zeros(0, dtype=np.int64)
    if graph.idmap is not None:
        return pd.DataFrame(
            {"node": graph.idmap.to_keys(node), "community": graph.idmap.to_keys(comm)}
        )
    return pd.DataFrame({"node": node, "community": comm})


# ---------------------------------------------------------------------------
# approximate max-k-cut
# ---------------------------------------------------------------------------


def _cut_weight(sym_edges: rd.Dataset, assign: np.ndarray) -> float:
    aref = ray.put(assign)

    def partial(t: pa.Table) -> pa.Table:
        a = ray.get(aref)
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        w = t["weight"].to_numpy(zero_copy_only=False)
        cut = float(w[a[s] != a[d]].sum())
        return pa.table({"k": pa.array([0]), "w": pa.array([cut])})

    agg = hash_aggregate(
        sym_edges.map_batches(partial, batch_format="pyarrow"), ["k"], "w", op="sum"
    ).to_pandas()
    # each undirected edge appears twice in the symmetric table
    return float(agg["w"].sum()) / 2.0 if len(agg) else 0.0


def approx_max_k_cut(
    sym_edges: rd.Dataset,
    node_count: int,
    k: int = 2,
    rounds: int = 8,
    seed: int = 42,
    idmap=None,
    num_parts: int = 64,
) -> tuple[pd.DataFrame, float]:
    """Approximate max-k-cut; returns ((node, part), cut_weight).

    Seeded random init, then local moves on a gain-priority independent
    set per round (Jones–Plassmann style): pass 1 computes every node's
    best target part and gain (internal-weight drop) from the frozen
    assignment; pass 2 accepts a move only when the node's (gain, -id)
    beats every neighbor's, so simultaneously applied moves are pairwise
    non-adjacent — each round strictly increases the cut by exactly the
    sum of accepted gains, which makes the loop CONVERGE (the earlier
    hashed-bipartition schedule let adjacent nodes move on each other's
    stale parts and oscillate). Deterministic at any parallelism: gains
    are exact groupby sums and acceptance is a pure (gain, id) function.
    """
    ids = np.arange(node_count, dtype=np.int64)
    assign = (mix2(seed, ids, 0) % np.uint64(k)).astype(np.int64)

    for _rnd in range(rounds):
        aref = ray.put(assign)

        def partial(t: pa.Table, aref=aref) -> pa.Table:
            a = ray.get(aref)
            s = t["src"].to_numpy(zero_copy_only=False)
            d = t["dst"].to_numpy(zero_copy_only=False)
            w = t["weight"].to_numpy(zero_copy_only=False)
            keep = s != d
            df = pd.DataFrame({"node": s[keep], "part": a[d[keep]], "w": w[keep]})
            g = df.groupby(["node", "part"], sort=False)["w"].sum().reset_index()
            g["__part"] = (g["node"].to_numpy() % num_parts).astype(np.int64)
            return pa.Table.from_pandas(g, preserve_index=False)

        def choose(g: pd.DataFrame, aref=aref) -> pd.DataFrame:
            a = ray.get(aref)
            node = g["node"].to_numpy(dtype=np.int64)
            part = g["part"].to_numpy(dtype=np.int64)
            w = g["w"].to_numpy(dtype=np.float64)
            # internal weight per (node, candidate part); absent parts
            # have weight 0 — build the dense (unique-node × k) matrix
            nodes_u, inv = np.unique(node, return_inverse=True)
            mat = np.zeros((len(nodes_u), k), dtype=np.float64)
            # duplicate (node, part) partial rows from different map
            # batches must ACCUMULATE, not overwrite
            np.add.at(mat, (inv, part), w)
            best = np.argmin(mat, axis=1)  # ties -> smaller part id
            cur = a[nodes_u]
            cur_w = mat[np.arange(len(nodes_u)), cur]
            best_w = mat[np.arange(len(nodes_u)), best]
            do = best_w + 1e-12 < cur_w
            return pd.DataFrame(
                {
                    "node": nodes_u[do],
                    "part": best[do].astype(np.int64),
                    "gain": cur_w[do] - best_w[do],
                }
            )

        movers = (
            sym_edges.map_batches(partial, batch_format="pyarrow")
            .groupby("__part")
            .map_groups(choose, batch_format="pandas")
        ).to_pandas()
        if not len(movers):
            break
        mnode = movers["node"].to_numpy(dtype=np.int64)
        mpart = movers["part"].to_numpy(dtype=np.int64)
        mgain = movers["gain"].to_numpy(dtype=np.float64)
        gain = np.zeros(node_count, dtype=np.float64)
        gain[mnode] = mgain
        gref = ray.put(gain)

        def nbr_partial(t: pa.Table, gref=gref) -> pa.Table:
            g = ray.get(gref)
            s = t["src"].to_numpy(zero_copy_only=False)
            d = t["dst"].to_numpy(zero_copy_only=False)
            keep = (s != d) & (g[s] > 0)
            df = pd.DataFrame({"node": d[keep], "g": g[s[keep]], "i": s[keep]})
            # per-batch reduce: best neighbor candidate = max g, min id tie
            df = df.sort_values(
                ["node", "g", "i"], ascending=[True, False, True]
            ).drop_duplicates("node")
            df["__part"] = (df["node"].to_numpy() % num_parts).astype(np.int64)
            return pa.Table.from_pandas(df, preserve_index=False)

        def nbr_final(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(
                ["node", "g", "i"], ascending=[True, False, True]
            ).drop_duplicates("node")
            return g[["node", "g", "i"]]

        nbr = (
            sym_edges.map_batches(nbr_partial, batch_format="pyarrow")
            .groupby("__part")
            .map_groups(nbr_final, batch_format="pandas")
        ).to_pandas()
        nbr_g = np.zeros(node_count, dtype=np.float64)
        nbr_i = np.full(node_count, node_count, dtype=np.int64)
        if len(nbr):
            nn = nbr["node"].to_numpy(dtype=np.int64)
            nbr_g[nn] = nbr["g"].to_numpy(dtype=np.float64)
            nbr_i[nn] = nbr["i"].to_numpy(dtype=np.int64)
        accept = (mgain > nbr_g[mnode]) | (
            (mgain == nbr_g[mnode]) & (mnode < nbr_i[mnode])
        )
        assign[mnode[accept]] = mpart[accept]

    cut = _cut_weight(sym_edges, assign)
    node = idmap.keys if idmap is not None else ids
    return pd.DataFrame({"node": node, "part": assign}), round(cut, 6)

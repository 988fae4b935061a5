"""Random walks over the partitioned CSR — the node2vec walk substrate.

Reference: algo/src/main/java/org/neo4j/gds/traversal/RandomWalk.java:45
(buffered per-thread walkers). Distributed shape: one task per partition
walks all of its local nodes simultaneously (vectorized step loop);
neighbor lookups cross partitions through the shared CSR block refs
(zero-copy on a node; at cluster scale walkers cache remote blocks per
node). Steps draw via splitmix64 of (seed, walk_id, step) — walks are a
pure function of the seed, independent of parallelism.

First-order (uniform) walks; the reference's 2nd-order p/q bias is a
documented extension point (needs the previous step's neighbor set per
walker).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from graph_data_science_ray._util import mix2

_FRONTIER_EDGE_CUTOFF = 50_000_000  # whole-CSR-per-task replication budget


@ray.remote
def _walk_partition(part: int, block_refs: list, walk_length: int,
                    walks_per_node: int, seed: int) -> pd.DataFrame:
    blocks = ray.get(list(block_refs))
    me = blocks[part]
    starts = np.repeat(
        np.arange(me["start"], me["end"], dtype=np.int64), walks_per_node
    )
    n = len(starts)
    if n == 0:
        return pd.DataFrame({"walk_id": [], "step": [], "node": []})
    walk_ids = me["start"] * walks_per_node + np.arange(n, dtype=np.int64)
    part_starts = np.array([b["start"] for b in blocks], dtype=np.int64)
    out = np.full((n, walk_length), -1, dtype=np.int64)
    out[:, 0] = starts
    cur = starts.copy()
    alive = np.ones(n, dtype=bool)
    for step in range(1, walk_length):
        # degree + adjacency offset of each current node (cross-partition)
        p_idx = np.searchsorted(part_starts, cur, side="right") - 1
        deg = np.zeros(n, dtype=np.int64)
        nxt = np.full(n, -1, dtype=np.int64)
        draws = mix2(seed, walk_ids, step)
        for p in np.unique(p_idx[alive]):
            b = blocks[p]
            sel = alive & (p_idx == p)
            lo = cur[sel] - b["start"]
            d = b["indptr"][lo + 1] - b["indptr"][lo]
            has = d > 0
            chosen = np.full(len(lo), -1, dtype=np.int64)
            if len(b["indices"]):
                offs = b["indptr"][lo] + (
                    draws[sel] % np.maximum(d, 1).astype(np.uint64)
                ).astype(np.int64)
                idx = np.clip(offs, 0, len(b["indices"]) - 1)
                chosen = np.where(has, b["indices"][idx], -1)
            nxt[sel] = chosen
            deg[sel] = d
        alive = alive & (nxt >= 0)
        cur = np.where(alive, nxt, cur)
        out[alive, step] = nxt[alive]
        if not alive.any():
            break
    rows = out.reshape(-1)
    steps = np.tile(np.arange(walk_length, dtype=np.int64), n)
    wids = np.repeat(walk_ids, walk_length)
    m = rows >= 0
    return pd.DataFrame({"walk_id": wids[m], "step": steps[m], "node": rows[m]})


def random_walks_ds(
    graph,
    walk_length: int = 10,
    walks_per_node: int = 1,
    seed: int = 42,
) -> rd.Dataset:
    """FRONTIER-EXCHANGE uniform walks → Dataset (walk_id, step, node_id).

    The cluster-scale formulation: walker state is a hash-partitioned
    ``(walk_id, cur)`` Dataset; each superstep groups walkers by the
    partition OWNING their current node, and the owning group's task
    fetches ONLY that partition's CSR block (one ``ray.get`` of one
    block ref) to advance its walkers one hop. No task ever materializes
    the whole graph — the round-trip is one small shuffle of walker rows
    per step, the Pregel exchange shape. Draws are
    ``mix2(seed, walk_id, step) % deg``, identical to the per-partition
    local walker (``_walk_partition``), so both modes emit byte-identical
    trajectories for a seed at any parallelism.
    """
    blocks = graph.block_refs()
    bounds_ref = ray.put(np.asarray(graph.boundaries, dtype=np.int64))
    wpn = int(walks_per_node)
    V = int(graph.node_count)

    def init(t) -> pd.DataFrame:
        ids = t["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        node = np.repeat(ids, wpn)
        j = np.tile(np.arange(wpn, dtype=np.int64), len(ids))
        return pd.DataFrame({"walk_id": node * wpn + j, "cur": node})

    state = rd.range(V).map_batches(init, batch_format="pyarrow").materialize()
    traj = [
        state.map_batches(
            lambda df, s=0: pd.DataFrame(
                {"walk_id": df["walk_id"], "step": np.full(len(df), s, np.int64),
                 "node_id": df["cur"]}
            ),
            batch_format="pandas",
        )
    ]

    def tag_owner(df: pd.DataFrame) -> pd.DataFrame:
        b = ray.get(bounds_ref)
        df = df.copy()
        df["__owner"] = (
            np.searchsorted(b, df["cur"].to_numpy(dtype=np.int64), side="right") - 1
        ).astype(np.int64)
        return df

    for step in range(1, int(walk_length)):
        def extend(g: pd.DataFrame, *, st=step) -> pd.DataFrame:
            p = int(g["__owner"].iat[0])
            b = ray.get(blocks[p])
            wid = g["walk_id"].to_numpy(dtype=np.int64)
            cur = g["cur"].to_numpy(dtype=np.int64)
            lo = cur - b["start"]
            d = b["indptr"][lo + 1] - b["indptr"][lo]
            has = d > 0
            nxt = np.full(len(cur), -1, dtype=np.int64)
            if len(b["indices"]):
                draws = mix2(seed, wid, st)
                offs = b["indptr"][lo] + (
                    draws % np.maximum(d, 1).astype(np.uint64)
                ).astype(np.int64)
                idx = np.clip(offs, 0, len(b["indices"]) - 1)
                nxt = np.where(has, b["indices"][idx], -1)
            keep = nxt >= 0
            return pd.DataFrame({"walk_id": wid[keep], "cur": nxt[keep]})

        state = (
            state.map_batches(tag_owner, batch_format="pandas")
            .groupby("__owner")
            .map_groups(extend, batch_format="pandas")
        ).materialize()
        if state.count() == 0:
            break
        traj.append(
            state.map_batches(
                lambda df, s=step: pd.DataFrame(
                    {"walk_id": df["walk_id"],
                     "step": np.full(len(df), s, np.int64),
                     "node_id": df["cur"]}
                ),
                batch_format="pandas",
            )
        )

    out = traj[0]
    for t in traj[1:]:
        out = out.union(t)
    return out


def random_walks(
    graph,
    walk_length: int = 10,
    walks_per_node: int = 1,
    seed: int = 42,
    mode: str = "auto",
) -> pd.DataFrame:
    """Uniform random walks from every node; returns (walk_id, step, node).

    Walks stop early at sink nodes (no out-edges). Deterministic for a
    given seed at any parallelism AND any mode: ``mode="local"`` runs one
    task per partition against the shared CSR block refs (fastest on one
    node, replicates the graph per node on a cluster); ``mode="frontier"``
    is the superstep walker exchange (:func:`random_walks_ds`) that only
    ever reads one block per task; ``"auto"`` switches to frontier past an
    edge-count budget.
    """
    if mode == "auto":
        mode = "local" if graph.edge_count <= _FRONTIER_EDGE_CUTOFF else "frontier"
    if mode == "frontier":
        out = random_walks_ds(
            graph, walk_length=walk_length, walks_per_node=walks_per_node,
            seed=seed,
        ).to_pandas()
        out = out.rename(columns={"node_id": "node"})
    else:
        blocks = graph.block_refs()
        dfs = ray.get(
            [
                _walk_partition.remote(p, blocks, walk_length, walks_per_node, seed)
                for p in range(graph.num_partitions)
            ]
        )
        out = pd.concat(dfs, ignore_index=True)
    if graph.idmap is not None:
        out["node"] = graph.idmap.to_keys(out["node"].to_numpy(dtype=np.int64))
    out["walk_id"] = out["walk_id"].astype(np.int64)
    out["step"] = out["step"].astype(np.int64)
    return out.sort_values(["walk_id", "step"]).reset_index(drop=True)


@ray.remote
def _rwr_task(block_refs: list, start_nodes: np.ndarray, sample_size: int,
              restart_prob: float, seed: int, max_steps: int) -> np.ndarray:
    """Random-walk-with-restarts node sampling in one task (seeded)."""
    blocks = ray.get(list(block_refs))
    part_starts = np.array([b["start"] for b in blocks], dtype=np.int64)
    n_walkers = max(8, len(start_nodes))
    cur = np.resize(np.asarray(start_nodes, dtype=np.int64), n_walkers)
    home = cur.copy()
    visited = set(int(x) for x in start_nodes)
    wid = np.arange(n_walkers, dtype=np.int64)
    for step in range(1, max_steps + 1):
        draws = mix2(seed, wid, step)
        restart = (draws % np.uint64(1_000_000)).astype(np.int64) < int(
            restart_prob * 1_000_000
        )
        pick_draws = mix2(seed + 1, wid, step)
        p_idx = np.searchsorted(part_starts, cur, side="right") - 1
        nxt = cur.copy()
        for p in np.unique(p_idx):
            b = blocks[p]
            sel = p_idx == p
            lo = cur[sel] - b["start"]
            d = b["indptr"][lo + 1] - b["indptr"][lo]
            has = d > 0
            if len(b["indices"]):
                offs = b["indptr"][lo] + (
                    pick_draws[sel] % np.maximum(d, 1).astype(np.uint64)
                ).astype(np.int64)
                idx = np.clip(offs, 0, len(b["indices"]) - 1)
                nxt[sel] = np.where(has, b["indices"][idx], home[sel])
            else:
                nxt[sel] = home[sel]
        cur = np.where(restart, home, nxt)
        visited.update(int(x) for x in cur)
        if len(visited) >= sample_size:
            break
    out = np.fromiter(visited, dtype=np.int64)
    out.sort()
    return out[:sample_size]


def rwr_sample(
    graph,
    start_nodes=None,
    sample_size: int = 100,
    restart_prob: float = 0.15,
    seed: int = 42,
    max_steps: int = 100_000,
):
    """Random-walk-with-restarts node sampling → sampled node ids.

    Reference: graph-sampling/src/main/java/org/neo4j/gds/graphsampling/
    samplers/rw/rwr/RandomWalkWithRestarts.java. Compose with
    ``pipelines.transforms.subgraph_filter`` to materialize the induced
    subgraph (the reference's GraphSampleConstructor).
    """
    if start_nodes is None:
        start_nodes = np.array([0], dtype=np.int64)
    ids = ray.get(
        _rwr_task.remote(
            graph.block_refs(), np.asarray(start_nodes, dtype=np.int64),
            int(sample_size), float(restart_prob), int(seed), int(max_steps),
        )
    )
    if graph.idmap is not None:
        return pd.DataFrame({"node": graph.idmap.to_keys(ids), "node_id": ids})
    return pd.DataFrame({"node": ids, "node_id": ids})


@ray.remote
def _cnarw_task(block_refs: list, start_nodes: np.ndarray, sample_size: int,
                seed: int, max_steps: int) -> np.ndarray:
    """Common-neighbour-aware random walk sampling in one task.

    Reference: graph-sampling/src/main/java/org/neo4j/gds/graphsampling/
    samplers/rw/cnarw/CommonNeighbourAwareRandomWalk.java — a candidate
    step u→v is accepted with probability
    ``1 - |N(u) ∩ N(v)| / min(|N(u)|, |N(v)|)``, steering the walk toward
    structurally novel regions. Draws are splitmix-seeded (deterministic).
    """
    blocks = ray.get(list(block_refs))

    # Global CSR view (blocks are ordered by node range, so plain concat
    # is globally ascending) + packed (u*V + v) edge keys for vectorized
    # set-membership: common-neighbour counts become one searchsorted
    # over the walkers' flattened adjacency instead of a per-walker
    # intersect1d loop.
    deg = np.concatenate([np.asarray(b["degrees"], dtype=np.int64) for b in blocks])
    indices = np.concatenate([np.asarray(b["indices"], dtype=np.int64) for b in blocks])
    indptr = np.concatenate([[0], np.cumsum(deg)]).astype(np.int64)
    V = np.int64(len(deg))
    packed = np.repeat(np.arange(V, dtype=np.int64), deg) * V + indices

    n_walkers = max(8, len(start_nodes))
    cur = np.resize(np.asarray(start_nodes, dtype=np.int64), n_walkers)
    home = cur.copy()
    visited = np.zeros(int(V), dtype=bool)
    visited[np.asarray(start_nodes, dtype=np.int64)] = True
    n_visited = int(visited.sum())
    DEN = np.uint64(1 << 20)
    wid = np.arange(n_walkers, dtype=np.int64)
    for step in range(1, max_steps + 1):
        pick = mix2(seed, wid, step)
        accept = (mix2(seed + 1, wid, step) % DEN).astype(np.int64)
        deg_u = deg[cur]
        dead = deg_u == 0
        live = ~dead
        u = cur[live]
        du = deg_u[live]
        v = indices[indptr[u] + (pick[live] % du.astype(np.uint64)).astype(np.int64)]
        dv = deg[v]
        # |N(u) ∩ N(v)| per live walker: flatten all N(u) segments, ask
        # "is x a neighbour of v" via binary search on the packed keys
        flat_u = np.repeat(u, du)
        flat_v = np.repeat(v, du)
        nbr = indices[
            np.concatenate([np.arange(indptr[a], indptr[a] + d) for a, d in zip(u, du)])
            if len(u) else np.zeros(0, dtype=np.int64)
        ]
        q = flat_v * V + nbr
        pos = np.searchsorted(packed, q)
        pos = np.minimum(pos, len(packed) - 1) if len(packed) else pos
        hit = (packed[pos] == q) if len(packed) else np.zeros(0, dtype=bool)
        seg_starts = np.concatenate([[0], np.cumsum(du)])[:-1]
        # no zero-length segments: live walkers all have du > 0
        common = (
            np.add.reduceat(hit.astype(np.int64), seg_starts)
            if len(hit) else np.zeros(len(u), dtype=np.int64)
        )
        p_acc = 1.0 - common / np.maximum(1, np.minimum(du, dv))
        ok = accept[live] < (p_acc * float(int(DEN))).astype(np.int64)
        nxt = cur.copy()
        nxt[dead] = home[dead]
        live_idx = np.flatnonzero(live)
        nxt[live_idx[ok]] = v[ok]
        cur = nxt
        newly = np.unique(v[ok])
        if len(newly):
            n_visited += int(np.count_nonzero(~visited[newly]))
            visited[newly] = True
        if n_visited >= sample_size:
            break
    out = np.flatnonzero(visited).astype(np.int64)
    return out[:sample_size]


def cnarw_sample(
    graph,
    start_nodes=None,
    sample_size: int = 100,
    seed: int = 42,
    max_steps: int = 100_000,
):
    """CNARW node sampling → sampled node ids (see ``_cnarw_task``).

    Compose with ``pipelines.transforms.subgraph_filter`` for the induced
    subgraph, mirroring the reference's GraphSampleConstructor.
    """
    if start_nodes is None:
        start_nodes = np.array([0], dtype=np.int64)
    ids = ray.get(
        _cnarw_task.remote(
            graph.block_refs(), np.asarray(start_nodes, dtype=np.int64),
            int(sample_size), int(seed), int(max_steps),
        )
    )
    if graph.idmap is not None:
        return pd.DataFrame({"node": graph.idmap.to_keys(ids), "node_id": ids})
    return pd.DataFrame({"node": ids, "node_id": ids})


@ray.remote
def _walk_partition_biased(part: int, block_refs: list, node_count: int,
                           walk_length: int, walks_per_node: int,
                           p: float, q: float, seed: int,
                           max_tries: int = 16) -> pd.DataFrame:
    """Second-order (p/q-biased) walks for one partition's start nodes.

    node2vec bias (reference embeddings/node2vec/Node2Vec.java:38): from
    (prev → cur), candidate x gets weight 1/p if x == prev, 1 if
    x ∈ N(prev), 1/q otherwise. Sampled by vectorized REJECTION: each
    round draws a uniform neighbor candidate and an acceptance coin
    against bias/max_bias; walkers that exhaust ``max_tries`` rounds keep
    their last candidate (bounded approximation, documented). Membership
    x ∈ N(prev) is a binary search over the block's packed (src*V + dst)
    edge keys — sorted by CSR construction, built once per task.
    """
    blocks = ray.get(list(block_refs))
    me = blocks[part]
    part_starts = np.array([b["start"] for b in blocks], dtype=np.int64)
    V = np.int64(node_count)
    packed = []
    for b in blocks:
        n_local = b["end"] - b["start"]
        pk = (np.repeat(np.arange(n_local, dtype=np.int64), b["degrees"]) * V
              + b["indices"])
        packed.append(pk)  # ascending: src asc, targets asc within src

    starts = np.repeat(
        np.arange(me["start"], me["end"], dtype=np.int64), walks_per_node
    )
    n = len(starts)
    if n == 0:
        return pd.DataFrame({"walk_id": [], "step": [], "node": []})
    walk_ids = me["start"] * walks_per_node + np.arange(n, dtype=np.int64)
    out = np.full((n, walk_length), -1, dtype=np.int64)
    out[:, 0] = starts
    cur = starts.copy()
    prev = np.full(n, -1, dtype=np.int64)
    alive = np.ones(n, dtype=bool)
    max_bias = max(1.0, 1.0 / p, 1.0 / q)
    DEN = np.uint64(1 << 20)

    def neighbor_of(pv: np.ndarray, x: np.ndarray) -> np.ndarray:
        """x ∈ N(pv), vectorized over walkers (grouped by pv's block)."""
        res = np.zeros(len(pv), dtype=bool)
        ok = pv >= 0
        if not ok.any():
            return res
        pidx = np.searchsorted(part_starts, pv, side="right") - 1
        for bi in np.unique(pidx[ok]):
            sel = ok & (pidx == bi)
            b = blocks[bi]
            keys = (pv[sel] - b["start"]) * V + x[sel]
            pk = packed[bi]
            if len(pk) == 0:
                continue
            pos = np.minimum(np.searchsorted(pk, keys), len(pk) - 1)
            res[sel] = pk[pos] == keys
        return res

    for step in range(1, walk_length):
        accepted = np.zeros(n, dtype=bool)
        cand = np.full(n, -1, dtype=np.int64)
        for r in range(max_tries):
            need = alive & ~accepted
            if not need.any():
                break
            draws = mix2(seed + r, walk_ids, step)
            coins = (mix2(seed + 7919 + r, walk_ids, step) % DEN).astype(np.int64)
            p_idx = np.searchsorted(part_starts, cur, side="right") - 1
            trial = np.full(n, -1, dtype=np.int64)
            for bi in np.unique(p_idx[need]):
                b = blocks[bi]
                sel = need & (p_idx == bi)
                lo = cur[sel] - b["start"]
                d = b["indptr"][lo + 1] - b["indptr"][lo]
                has = d > 0
                if len(b["indices"]):
                    offs = b["indptr"][lo] + (
                        draws[sel] % np.maximum(d, 1).astype(np.uint64)
                    ).astype(np.int64)
                    idx = np.clip(offs, 0, len(b["indices"]) - 1)
                    trial[sel] = np.where(has, b["indices"][idx], -1)
            ok = need & (trial >= 0)
            # bias class
            bias = np.full(n, 1.0 / q)
            bias[trial == prev] = 1.0 / p
            is_nbr = np.zeros(n, dtype=bool)
            chk = ok & (prev >= 0) & (trial != prev)
            if chk.any():
                is_nbr[chk] = neighbor_of(prev[chk], trial[chk])
            bias[is_nbr] = 1.0
            first_hop = ok & (prev < 0)
            acc = ok & (
                first_hop
                | (coins < (bias / max_bias * float(int(DEN))).astype(np.int64))
            )
            cand[ok] = np.where(acc[ok], trial[ok], np.where(cand[ok] < 0, trial[ok], cand[ok]))
            accepted |= acc
            dead = need & (trial < 0)
            alive &= ~dead
        nxt = np.where(alive, cand, -1)
        moved = alive & (nxt >= 0)
        prev = np.where(moved, cur, prev)
        cur = np.where(moved, nxt, cur)
        out[moved, step] = nxt[moved]
        alive &= moved
        if not alive.any():
            break
    rows = out.reshape(-1)
    steps = np.tile(np.arange(walk_length, dtype=np.int64), n)
    wids = np.repeat(walk_ids, walk_length)
    m = rows >= 0
    return pd.DataFrame({"walk_id": wids[m], "step": steps[m], "node": rows[m]})


def biased_random_walks(
    graph,
    walk_length: int = 10,
    walks_per_node: int = 1,
    p: float = 1.0,
    q: float = 1.0,
    seed: int = 42,
) -> pd.DataFrame:
    """node2vec second-order walks (return parameter ``p``, in-out ``q``).

    ``p == q == 1`` reduces to uniform first-order behavior. Deterministic
    for a seed at any parallelism. Returns (walk_id, step, node).
    """
    blocks = graph.block_refs()
    dfs = ray.get(
        [
            _walk_partition_biased.remote(
                pi, blocks, graph.node_count, walk_length, walks_per_node,
                float(p), float(q), seed,
            )
            for pi in range(graph.num_partitions)
        ]
    )
    out = pd.concat(dfs, ignore_index=True)
    if graph.idmap is not None:
        out["node"] = graph.idmap.to_keys(out["node"].to_numpy(dtype=np.int64))
    return out.sort_values(["walk_id", "step"]).reset_index(drop=True)

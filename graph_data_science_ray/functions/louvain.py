"""Louvain community detection — multi-level modularity optimization.

Reference: algo/src/main/java/org/neo4j/gds/louvain/Louvain.java:48 (levels
of ModularityOptimization + graph coarsening,
modularityoptimization/ModularityOptimization.java:61). Distributed
re-expression (SURVEY.md §2.5): per level, rounds of local moves — the
per-node best-gain community is chosen INSIDE a hash-partitioned
``map_groups`` (all of a node's neighbor-community rows co-located) with
broadcast degree/volume vectors; the driver only ever sees the per-round
**move set** (node, new_community), never the neighbor-community
aggregate. The level's graph then contracts by ``groupby (c_src, c_dst)
sum`` and the next level repeats.

Determinism / oscillation control: moves are synchronous but restricted
to alternating node-parity halves per sub-round (the same role as the
reference's K1-coloring serialization of parallel moves — a deterministic
schedule rather than a race), ties broken by the smaller community id,
moves applied only on strict modularity gain.

Self-loops (which appear after contraction and carry the community's
internal weight) are excluded from the node↔community connection weights
on BOTH sides of the gain comparison — they are internal either way and
cancel — but still count toward weighted degree / 2m, matching the
standard formulation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from graph_data_science_ray.pipelines.agg import hash_aggregate


def _weighted_degrees(sym_edges: rd.Dataset, node_count: int) -> np.ndarray:
    """Weighted degree per node (self-loops included once — after
    contraction a (c,c) row already carries both directions' weight)."""

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "node": t["src"].to_numpy(zero_copy_only=False),
                "w": t["weight"].to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby("node", sort=False)["w"].sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = hash_aggregate(
        sym_edges.map_batches(partial, batch_format="pyarrow"), ["node"], "w", op="sum"
    ).to_pandas()
    deg = np.zeros(node_count, dtype=np.float64)
    if len(agg):
        deg[agg["node"].to_numpy(dtype=np.int64)] = agg["w"].to_numpy(dtype=np.float64)
    return deg


def _best_moves(
    sym_edges: rd.Dataset,
    labels: np.ndarray,
    deg: np.ndarray,
    tot: np.ndarray,
    two_m: float,
    gamma: float,
    parity: int,
    num_parts: int = 64,
    constraint: np.ndarray | None = None,
) -> pd.DataFrame:
    """One distributed local-move sub-round: returns ONLY the movers
    ``(node, community)`` — nodes of the given parity whose best candidate
    community strictly beats staying put.

    Stage 1 (map): per-batch partial (node, neighbor-community, w) sums,
    self-loops dropped, non-parity nodes pruned before the shuffle.
    Stage 2 (map_groups on hash(node)): per-node argmax gain with
    broadcast labels/deg/tot.

    ``constraint`` (Leiden refinement): per-node parent-community array —
    a node may only consider candidate communities whose members share
    its parent (moves stay WITHIN the parent community).
    """
    lref = ray.put(labels)
    dref = ray.put(deg)
    tref = ray.put(tot)
    cref = ray.put(constraint) if constraint is not None else None

    def partial(t: pa.Table) -> pa.Table:
        lab = ray.get(lref)
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        w = t["weight"].to_numpy(zero_copy_only=False)
        keep = (src != dst) & ((src % 2) == parity)
        if cref is not None:
            par = ray.get(cref)
            keep &= par[src] == par[dst]  # candidates within the parent only
        df = pd.DataFrame({"node": src[keep], "comm": lab[dst[keep]], "w": w[keep]})
        g = df.groupby(["node", "comm"], sort=False)["w"].sum().reset_index()
        g["__part"] = (g["node"].to_numpy() % num_parts).astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    def choose(g: pd.DataFrame) -> pd.DataFrame:
        # partial() emits PER-BATCH sums and sym_edges is hash-partitioned
        # by (src,dst), so a node's weight to one candidate community can
        # arrive split across rows — re-aggregate before gain/argmax or
        # moves depend on Ray block boundaries.
        g = g.groupby(["node", "comm"], sort=False)["w"].sum().reset_index()
        lab = ray.get(lref)
        dg = ray.get(dref)
        tt = ray.get(tref)
        node = g["node"].to_numpy(dtype=np.int64)
        comm = g["comm"].to_numpy(dtype=np.int64)
        w = g["w"].to_numpy(dtype=np.float64)
        cur = lab[node]
        is_cur = comm == cur
        # own-community connection weight per node (0 if no same-community
        # neighbor); self-loops were already excluded map-side
        nodes_u, inv = np.unique(node, return_inverse=True)
        own_w = np.zeros(len(nodes_u), dtype=np.float64)
        np.add.at(own_w, inv[is_cur], w[is_cur])
        out_empty = pd.DataFrame(
            {"node": np.zeros(0, dtype=np.int64), "community": np.zeros(0, dtype=np.int64)}
        )
        c_mask = ~is_cur
        if not c_mask.any():
            return out_empty
        cn, cc, cw = node[c_mask], comm[c_mask], w[c_mask]
        gain = cw - gamma * dg[cn] * tt[cc] / two_m
        order = np.lexsort((cc, -gain, cn))
        cn, cc, gain = cn[order], cc[order], gain[order]
        first = np.empty(len(cn), dtype=bool)
        first[0] = True
        first[1:] = cn[1:] != cn[:-1]
        bn, bc, bg = cn[first], cc[first], gain[first]
        bcur = lab[bn]
        own = own_w[np.searchsorted(nodes_u, bn)]
        cur_gain = own - gamma * dg[bn] * (tt[bcur] - dg[bn]) / two_m
        do = bg > cur_gain + 1e-12
        return pd.DataFrame({"node": bn[do], "community": bc[do]})

    movers = (
        sym_edges.map_batches(partial, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(choose, batch_format="pandas")
    ).to_pandas()
    return movers


def _one_level(sym_edges: rd.Dataset, node_count: int, max_rounds: int = 10, gamma: float = 1.0):
    """Local-move rounds on one level; returns (labels, improved)."""
    deg = _weighted_degrees(sym_edges, node_count)
    two_m = deg.sum()
    if two_m == 0:
        return np.arange(node_count, dtype=np.int64), False

    labels = np.arange(node_count, dtype=np.int64)
    tot = deg.copy()  # community volumes
    improved_any = False
    for _rnd in range(max_rounds):
        moved = 0
        for parity in (0, 1):
            movers = _best_moves(sym_edges, labels, deg, tot, two_m, gamma, parity)
            if len(movers):
                mnode = movers["node"].to_numpy(dtype=np.int64)
                newc = movers["community"].to_numpy(dtype=np.int64)
                np.subtract.at(tot, labels[mnode], deg[mnode])
                np.add.at(tot, newc, deg[mnode])
                labels[mnode] = newc
                moved += len(mnode)
        if moved == 0:
            break
        improved_any = True
    return labels, improved_any


def _contract(sym_edges: rd.Dataset, labels: np.ndarray) -> rd.Dataset:
    lref = ray.put(labels)

    def remap(t: pa.Table) -> pa.Table:
        lab = ray.get(lref)
        src = lab[t["src"].to_numpy(zero_copy_only=False)]
        dst = lab[t["dst"].to_numpy(zero_copy_only=False)]
        df = pd.DataFrame(
            {"src": src, "dst": dst, "w": t["weight"].to_numpy(zero_copy_only=False)}
        )
        g = df.groupby(["src", "dst"], sort=False)["w"].sum().reset_index()
        return pa.Table.from_pandas(g.rename(columns={"w": "partial"}), preserve_index=False)

    agg = hash_aggregate(
        sym_edges.map_batches(remap, batch_format="pyarrow"),
        ["src", "dst"], "partial", op="sum", out_col="weight",
    )
    return agg.map_batches(
        lambda t: pa.table(
            {
                "src": t["src"],
                "dst": t["dst"],
                "weight": t["weight"].cast(pa.float64()) if hasattr(t["weight"], "cast") else t["weight"],
            }
        ),
        batch_format="pyarrow",
    )


def louvain(
    sym_edges: rd.Dataset,
    node_count: int,
    idmap=None,
    max_levels: int = 5,
    max_rounds: int = 10,
    gamma: float = 1.0,
) -> pd.DataFrame:
    """Multi-level Louvain; returns (node, community) with community =
    the minimum original member id of the final community (normalized,
    comparable to the reference's set-equivalence contract).

    ``gamma`` is the resolution parameter (the knob Leiden exposes as
    ``gamma``; >1 favors more/smaller communities)."""
    labels = np.arange(node_count, dtype=np.int64)
    edges = sym_edges
    n = node_count
    for _level in range(max_levels):
        lvl_labels, improved = _one_level(edges, n, max_rounds=max_rounds, gamma=gamma)
        labels = lvl_labels[labels]
        if not improved:
            break
        # re-densify level labels and contract
        uniq, dense = np.unique(labels, return_inverse=True)
        labels = dense.astype(np.int64)
        n = len(uniq)
        # contract with the level labels dense-ified the same way (same
        # community value set => same sorted-unique dense ids)
        edges = _contract(
            edges, np.unique(lvl_labels, return_inverse=True)[1].astype(np.int64)
        ).materialize()
        if n <= 1:
            break
    # normalize community ids to min original member
    out = pd.DataFrame(
        {"node": np.arange(node_count, dtype=np.int64), "community": labels}
    )
    mins = out.groupby("community")["node"].transform("min")
    out["community"] = mins
    if idmap is not None:
        out["node"] = idmap.to_keys(out["node"].to_numpy(dtype=np.int64))
        out["community"] = idmap.to_keys(out["community"].to_numpy(dtype=np.int64))
    return out


def _refine_within(sym_edges: rd.Dataset, parent: np.ndarray, node_count: int,
                   gamma: float, max_rounds: int = 3) -> np.ndarray:
    """Leiden refinement: constrained local moves inside each parent
    community (nodes start as singletons and may only merge with
    same-parent communities), then hash-min connectivity so every refined
    community is internally connected. Deterministic (parity schedule);
    the reference's randomized merge sampling is replaced by the greedy
    gain argmax — a documented simplification that keeps both Leiden
    guarantees (well-connected via gain, connected via the CC pass)."""
    deg = _weighted_degrees(sym_edges, node_count)
    two_m = deg.sum()
    if two_m == 0:
        return np.arange(node_count, dtype=np.int64)
    labels = np.arange(node_count, dtype=np.int64)  # singletons
    tot = deg.copy()
    for _ in range(max_rounds):
        moved = 0
        for parity in (0, 1):
            movers = _best_moves(
                sym_edges, labels, deg, tot, two_m, gamma, parity,
                constraint=parent,
            )
            if len(movers):
                mnode = movers["node"].to_numpy(dtype=np.int64)
                newc = movers["community"].to_numpy(dtype=np.int64)
                np.subtract.at(tot, labels[mnode], deg[mnode])
                np.add.at(tot, newc, deg[mnode])
                labels[mnode] = newc
                moved += len(mnode)
        if moved == 0:
            break
    # connectivity guarantee on the refined partition
    return _cc_within_communities(sym_edges, labels)


def _cc_within_communities(sym_edges: rd.Dataset, labels: np.ndarray) -> np.ndarray:
    """Connected components restricted to same-community edges.

    Hash-min BSP (the WCC kernel's contract, wcc/Wcc.java min-id) over the
    community-filtered edge stream: per round a distributed
    ``groupby(node).min(candidate)`` produces only the IMPROVED rows; the
    driver applies them and pointer-jumps (``comp = comp[comp]``) to
    collapse chains, so rounds are O(log diameter). No per-edge Python
    loop, no driver edge table.
    """
    n = len(labels)
    comp = np.arange(n, dtype=np.int64)
    lref = ray.put(labels)

    def same_comm(t: pa.Table) -> pa.Table:
        lab = ray.get(lref)
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        keep = lab[src] == lab[dst]
        return pa.table({"src": pa.array(src[keep]), "dst": pa.array(dst[keep])})

    filtered = sym_edges.map_batches(same_comm, batch_format="pyarrow").materialize()

    for _round in range(64):
        cref = ray.put(comp)

        def partial(t: pa.Table) -> pa.Table:
            cp = ray.get(cref)
            src = t["src"].to_numpy(zero_copy_only=False)
            dst = t["dst"].to_numpy(zero_copy_only=False)
            df = pd.DataFrame({"node": dst, "cand": cp[src]})
            g = df.groupby("node", sort=False)["cand"].min().reset_index()
            keep = g["cand"].to_numpy() < cp[g["node"].to_numpy(dtype=np.int64)]
            return pa.Table.from_pandas(g[keep], preserve_index=False)

        upd = hash_aggregate(
            filtered.map_batches(partial, batch_format="pyarrow"),
            ["node"], "cand", op="min",
        ).to_pandas()
        if len(upd):
            un = upd["node"].to_numpy(dtype=np.int64)
            uc = upd["cand"].to_numpy(dtype=np.int64)
            better = uc < comp[un]
            un, uc = un[better], uc[better]
            if len(un) == 0:
                break
            comp[un] = np.minimum(comp[un], uc)
        else:
            break
        # pointer jumping: comp values are node ids, so comp[comp] contracts
        # min-chains without another edge pass
        while True:
            c2 = comp[comp]
            if np.array_equal(c2, comp):
                break
            comp = c2
    return comp


def leiden(
    sym_edges: rd.Dataset,
    node_count: int,
    idmap=None,
    max_levels: int = 5,
    max_rounds: int = 10,
    gamma: float = 1.0,
) -> pd.DataFrame:
    """Leiden-style community detection — Louvain local moves plus the
    refinement phase guaranteeing internally CONNECTED communities.

    Reference: algo/src/main/java/org/neo4j/gds/leiden/Leiden.java:42.
    Per level: local moves (gamma-resolved modularity gain), then the
    REFINEMENT phase — constrained local moves from singletons inside
    each community (well-connected subcommunities) followed by a
    distributed hash-min connectivity pass (internally connected
    communities, the core Leiden guarantee Louvain lacks) — then contract
    by the refined partition. The reference's randomized merge sampling
    is replaced by the deterministic greedy gain argmax (documented
    deviation). Returns (node, community), community = min original
    member id.
    """
    labels = np.arange(node_count, dtype=np.int64)
    edges = sym_edges
    n = node_count
    for _level in range(max_levels):
        lvl_labels, improved = _one_level(edges, n, max_rounds=max_rounds, gamma=gamma)
        refined = _refine_within(edges, lvl_labels, n, gamma)
        labels = refined[labels]
        if not improved:
            break
        uniq, dense = np.unique(labels, return_inverse=True)
        labels = dense.astype(np.int64)
        n = len(uniq)
        edges = _contract(
            edges, np.unique(refined, return_inverse=True)[1].astype(np.int64)
        ).materialize()
        if n <= 1:
            break
    out = pd.DataFrame(
        {"node": np.arange(node_count, dtype=np.int64), "community": labels}
    )
    mins = out.groupby("community")["node"].transform("min")
    out["community"] = mins
    if idmap is not None:
        out["node"] = idmap.to_keys(out["node"].to_numpy(dtype=np.int64))
        out["community"] = idmap.to_keys(out["community"].to_numpy(dtype=np.int64))
    return out


def modularity_optimization(
    sym_edges: rd.Dataset,
    node_count: int,
    idmap=None,
    max_rounds: int = 10,
    gamma: float = 1.0,
) -> tuple[pd.DataFrame, float]:
    """Single-level modularity optimization (no coarsening).

    Reference: modularityoptimization/ModularityOptimization.java:61 —
    color-scheduled parallel local moves to a local modularity optimum;
    our parity schedule plays the K1-coloring serialization role. Returns
    ((node, community), modularity); community = min member id.
    """
    from graph_data_science_ray.functions.community_metrics import modularity

    labels, _ = _one_level(sym_edges, node_count, max_rounds=max_rounds, gamma=gamma)
    out = pd.DataFrame(
        {"node": np.arange(node_count, dtype=np.int64), "community": labels}
    )
    mins = out.groupby("community")["node"].transform("min")
    out["community"] = mins
    q = modularity(sym_edges, out["community"].to_numpy())
    if idmap is not None:
        out["node"] = idmap.to_keys(out["node"].to_numpy(dtype=np.int64))
        out["community"] = idmap.to_keys(out["community"].to_numpy(dtype=np.int64))
    return out, round(float(q), 6)

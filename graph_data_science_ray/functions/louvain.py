"""Louvain community detection — multi-level modularity optimization.

Reference: algo/src/main/java/org/neo4j/gds/louvain/Louvain.java:48 (levels
of ModularityOptimization + graph coarsening,
modularityoptimization/ModularityOptimization.java:61). Distributed
re-expression (SURVEY.md §2.5): per level, rounds of local moves — the
per-node best-gain community is computed from a ``(node, neighbor
community, weight)`` aggregate joined with broadcast community volumes;
then the level's graph contracts by ``groupby (c_src, c_dst) sum`` and
the next level repeats.

Determinism / oscillation control: moves are synchronous but restricted
to alternating node-parity halves per sub-round (the same role as the
reference's K1-coloring serialization of parallel moves — a deterministic
schedule rather than a race), ties broken by the smaller community id,
moves applied only on strict modularity gain.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from graph_data_science_ray.pipelines.agg import hash_aggregate


def _neighbor_community_weights(sym_edges: rd.Dataset, labels: np.ndarray) -> pd.DataFrame:
    lref = ray.put(labels)

    def partial(t: pa.Table) -> pa.Table:
        lab = ray.get(lref)
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        w = t["weight"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"node": src, "comm": lab[dst], "w": w})
        g = df.groupby(["node", "comm"], sort=False)["w"].sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    return hash_aggregate(
        sym_edges.map_batches(partial, batch_format="pyarrow"),
        ["node", "comm"], "w", op="sum",
    ).to_pandas()


def _one_level(sym_edges: rd.Dataset, node_count: int, max_rounds: int = 10, gamma: float = 1.0):
    """Local-move rounds on one level; returns (labels, improved)."""
    deg = np.zeros(node_count, dtype=np.float64)
    ncw0 = _neighbor_community_weights(sym_edges, np.arange(node_count, dtype=np.int64))
    # weighted degree = sum over all neighbor rows
    dsum = ncw0.groupby("node")["w"].sum()
    deg[dsum.index.to_numpy(dtype=np.int64)] = dsum.to_numpy()
    two_m = deg.sum()
    if two_m == 0:
        return np.arange(node_count, dtype=np.int64), False

    labels = np.arange(node_count, dtype=np.int64)
    tot = deg.copy()  # community volumes
    improved_any = False
    for rnd in range(max_rounds):
        moved = 0
        for parity in (0, 1):
            ncw = _neighbor_community_weights(sym_edges, labels)
            node = ncw["node"].to_numpy(dtype=np.int64)
            comm = ncw["comm"].to_numpy(dtype=np.int64)
            w = ncw["w"].to_numpy(dtype=np.float64)
            # gain of joining comm (relative): w_to_c - deg_i * tot_c / 2m,
            # with own community's volume excluding the node itself
            tot_adj = tot[comm] - np.where(labels[node] == comm, deg[node], 0.0)
            gain = w - gamma * deg[node] * tot_adj / two_m
            order = np.lexsort((comm, -gain, node))
            n_s, c_s, g_s = node[order], comm[order], gain[order]
            first = np.empty(len(n_s), dtype=bool)
            if len(n_s):
                first[0] = True
                first[1:] = n_s[1:] != n_s[:-1]
            best_node = n_s[first]
            best_comm = c_s[first]
            best_gain = g_s[first]
            # current-community gain for comparison
            cur = labels[best_node]
            cur_rows = pd.DataFrame({"node": node, "comm": comm, "w": w}).set_index(
                ["node", "comm"]
            )["w"]
            cur_w = cur_rows.reindex(list(zip(best_node, cur)), fill_value=0.0).to_numpy()
            cur_gain = cur_w - gamma * deg[best_node] * (tot[cur] - deg[best_node]) / two_m
            do = (
                (best_comm != cur)
                & (best_gain > cur_gain + 1e-12)
                & (best_node % 2 == parity)
            )
            movers = best_node[do]
            if len(movers):
                newc = best_comm[do]
                np.subtract.at(tot, labels[movers], deg[movers])
                np.add.at(tot, newc, deg[movers])
                labels[movers] = newc
                moved += len(movers)
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


def _cc_within_communities(sym_edges: rd.Dataset, labels: np.ndarray) -> np.ndarray:
    """Connected components restricted to same-community edges (numpy
    frontier union-find over the filtered edge stream)."""
    n = len(labels)
    parent = np.arange(n, dtype=np.int64)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = int(parent[x])
        return x

    lref = ray.put(labels)

    def same_comm(t: pa.Table) -> pa.Table:
        lab = ray.get(lref)
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        keep = lab[src] == lab[dst]
        return pa.table({"src": src[keep], "dst": dst[keep]})

    for batch in sym_edges.map_batches(same_comm, batch_format="pyarrow").iter_batches(
        batch_size=1 << 20, batch_format="pyarrow"
    ):
        if len(batch) == 0 or "src" not in batch.column_names:
            continue
        for u, v in zip(
            batch["src"].to_numpy(zero_copy_only=False),
            batch["dst"].to_numpy(zero_copy_only=False),
        ):
            a, b = find(int(u)), find(int(v))
            if a != b:
                parent[max(a, b)] = min(a, b)
    return np.array([find(i) for i in range(n)], dtype=np.int64)


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
    Per level: local moves (gamma-resolved modularity gain), then refine
    the partition to its connected components within each community (the
    core Leiden guarantee Louvain lacks), then contract by the refined
    partition. The full randomized refinement sampling is simplified to
    its deterministic connectivity core (documented deviation).
    Returns (node, community), community = min original member id.
    """
    labels = np.arange(node_count, dtype=np.int64)
    edges = sym_edges
    n = node_count
    for _level in range(max_levels):
        lvl_labels, improved = _one_level(edges, n, max_rounds=max_rounds, gamma=gamma)
        refined = _cc_within_communities(edges, lvl_labels)
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

"""Minimum spanning tree — Borůvka rounds (distributed-friendly Prim).

Reference: algo/src/main/java/org/neo4j/gds/spanningtree/Prim.java:42 —
the output contract is the spanning tree (weight) per connected
component. Borůvka preserves it with shuffle-native rounds (SURVEY.md
§2.5 "Borůvka via groupby-min"):

repeat O(log V) times: every component picks its minimum outgoing edge
(groupby-min with the global undirected (weight, lo, hi) tie-break), the picked
edges merge components (pointer-jumping on the driver-held component
map), and internal edges drop out.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from graph_data_science_ray.pipelines.agg import hash_aggregate


def minimum_spanning_forest(
    sym_edges: rd.Dataset, node_count: int, idmap=None
) -> tuple[pd.DataFrame, float]:
    """MST edges over the symmetrized weighted graph.

    Returns (DataFrame(src, dst, weight) of tree edges with src<dst,
    total_weight). Deterministic tie-breaks make the tree unique.
    """
    comp = np.arange(node_count, dtype=np.int64)
    chosen: list[tuple[int, int, float]] = []
    for _ in range(int(np.ceil(np.log2(max(node_count, 2)))) + 1):
        cref = ray.put(comp)

        def min_out(df: pd.DataFrame) -> pd.DataFrame:
            c = ray.get(cref)
            src = df["src"].to_numpy(dtype=np.int64)
            dst = df["dst"].to_numpy(dtype=np.int64)
            w = df["weight"].to_numpy(dtype=np.float64)
            keep = c[src] != c[dst]
            if not keep.any():
                return pd.DataFrame(
                    {"comp": pd.Series([], dtype=np.int64),
                     "src": pd.Series([], dtype=np.int64),
                     "dst": pd.Series([], dtype=np.int64),
                     "weight": pd.Series([], dtype=np.float64),
                     "lo": pd.Series([], dtype=np.int64),
                     "hi": pd.Series([], dtype=np.int64)}
                )
            src, dst, w = src[keep], dst[keep], w[keep]
            df2 = pd.DataFrame({"comp": c[src], "src": src, "dst": dst, "weight": w})
            # deterministic per-batch minimum under the GLOBAL undirected
            # total order (weight, lo, hi): every component ranks edges
            # identically, so the Boruvka result equals the unique MSF of
            # that order (= Kruskal with the same tie-break) — this is
            # what makes the forest SQL-oracle-comparable edge by edge
            df2["lo"] = np.minimum(src, dst)
            df2["hi"] = np.maximum(src, dst)
            df2 = df2.sort_values(["comp", "weight", "lo", "hi"], kind="mergesort")
            return df2.groupby("comp", sort=False).head(1)

        picks = (
            sym_edges.map_batches(min_out, batch_format="pandas")
            .groupby("comp")
            .map_groups(
                lambda g: g.sort_values(
                    ["weight", "lo", "hi"], kind="mergesort"
                ).head(1),
                batch_format="pandas",
            )
            .to_pandas()
        )
        if not len(picks) or "comp" not in picks.columns:
            break
        src = picks["src"].to_numpy(dtype=np.int64)
        dst = picks["dst"].to_numpy(dtype=np.int64)
        w = picks["weight"].to_numpy(dtype=np.float64)
        ca, cb = comp[src], comp[dst]
        valid = ca != cb
        if not valid.any():
            break
        src, dst, w, ca, cb = src[valid], dst[valid], w[valid], ca[valid], cb[valid]
        # union-find over the <= #components picks in sorted
        # (weight, lo, hi) order. Equal-weight ties (weights are integer
        # counts here) can otherwise let two components each pick a
        # DIFFERENT edge between the same component pair — or a pick-cycle
        # across 3+ components — which would put a cycle in the forest;
        # only picks that still merge two distinct roots are appended.
        elo, ehi = np.minimum(src, dst), np.maximum(src, dst)
        order = np.lexsort((ehi, elo, w))
        parent = comp.copy()

        def _find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        merged = 0
        for i in order.tolist():
            ra, rb = _find(int(ca[i])), _find(int(cb[i]))
            if ra == rb:
                continue
            parent[max(ra, rb)] = min(ra, rb)  # union-by-min keeps min-id roots
            chosen.append((int(elo[i]), int(ehi[i]), float(w[i])))
            merged += 1
        if merged == 0:
            break
        while True:
            p2 = parent[parent]
            if np.array_equal(p2, parent):
                break
            parent = p2
        comp = parent
    out = pd.DataFrame(chosen, columns=["src", "dst", "weight"]).drop_duplicates(
        subset=["src", "dst"]
    )
    if idmap is not None:
        out["src"] = idmap.to_keys(out["src"].to_numpy(dtype=np.int64))
        out["dst"] = idmap.to_keys(out["dst"].to_numpy(dtype=np.int64))
    out = out.sort_values(["src", "dst"]).reset_index(drop=True)
    return out, float(out["weight"].sum())


def k_spanning_tree(
    sym_edges: rd.Dataset, node_count: int, k: int = 2, idmap=None
) -> pd.DataFrame:
    """k-spanning clustering: MST minus its k-1 heaviest edges.

    Reference: algo/src/main/java/org/neo4j/gds/kspanningtree/KSpanningTree.java
    (min variant). Returns (node, cluster), cluster = min member id of the
    node's tree component. Deterministic: the MST is unique under the
    (weight, src, dst) tie-break, removals take the heaviest edges with
    (weight desc, src, dst) order.
    """
    tree, _total = minimum_spanning_forest(sym_edges, node_count, idmap=None)
    if len(tree):
        order = tree.sort_values(
            ["weight", "src", "dst"], ascending=[False, True, True], kind="mergesort"
        )
        keep = order.iloc[max(0, int(k) - 1):]
    else:
        keep = tree
    comp = np.arange(node_count, dtype=np.int64)
    if len(keep):
        s = keep["src"].to_numpy(dtype=np.int64)
        d = keep["dst"].to_numpy(dtype=np.int64)
        while True:
            before = comp.copy()
            np.minimum.at(comp, s, comp[d])
            np.minimum.at(comp, d, comp[s])
            while True:
                c2 = comp[comp]
                if np.array_equal(c2, comp):
                    break
                comp = c2
            if np.array_equal(before, comp):
                break
    node = idmap.keys if idmap is not None else np.arange(node_count, dtype=np.int64)
    cluster = idmap.to_keys(comp) if idmap is not None else comp
    return pd.DataFrame({"node": node, "cluster": cluster})


def steiner_tree(
    graph, source_id: int, terminals, weighted: bool = True
) -> tuple[pd.DataFrame, float]:
    """Steiner tree by the shortest-path heuristic.

    Reference: algo/src/main/java/org/neo4j/gds/steiner/ShortestPathsSteinerAlgorithm.java:38
    — grow the tree from the source; per round run a MULTI-SOURCE SSSP
    from every tree node (one BSP fixpoint), connect the nearest
    unconnected terminal along its tight-predecessor path. Returns
    (DataFrame(src, dst, weight), total_weight); unreachable terminals
    are skipped.
    """
    import ray as _r

    from graph_data_science_ray.functions.sssp import SsspComputation, _pred_in_block
    from graph_data_science_ray.state.pregel import Pregel

    class _MultiSource(SsspComputation):
        def __init__(self, sources: np.ndarray, weighted: bool):
            super().__init__(int(sources[0]), weighted)
            self.sources = np.asarray(sources, dtype=np.int64)

        def init_state(self, block: dict) -> dict:
            n = block["end"] - block["start"]
            dist = np.full(n, np.inf, dtype=np.float64)
            local = self.sources[
                (self.sources >= block["start"]) & (self.sources < block["end"])
            ]
            dist[local - block["start"]] = 0.0
            return {"dist": dist, "changed": dist < np.inf}

    tree_nodes = {int(source_id)}
    remaining = set(int(t) for t in terminals) - tree_nodes
    edges: list[tuple[int, int, float]] = []
    blocks = graph.block_refs()
    while remaining:
        comp = _MultiSource(np.array(sorted(tree_nodes)), weighted)
        engine = Pregel(graph, comp)
        refs = engine.run(max_iterations=graph.node_count + 2)
        dist = engine.gather(refs, "dist")
        reach = [(float(dist[t]), t) for t in sorted(remaining) if np.isfinite(dist[t])]
        if not reach:
            break
        _, pick = min(reach)
        dist_ref = _r.put(dist)
        cur = pick
        while dist[cur] > 0:
            cands = _r.get(
                [_pred_in_block.remote(b, cur, dist_ref, weighted) for b in blocks]
            )
            cands = [c for c in cands if c >= 0]
            if not cands:
                break
            pred = min(cands)
            edges.append((pred, cur, float(dist[cur] - dist[pred])))
            tree_nodes.add(cur)
            cur = pred
        tree_nodes.add(pick)
        remaining.discard(pick)
    out = pd.DataFrame(edges, columns=["src", "dst", "weight"]).drop_duplicates(
        subset=["src", "dst"]
    )
    if idmap := getattr(graph, "idmap", None):
        out["src"] = idmap.to_keys(out["src"].to_numpy(dtype=np.int64))
        out["dst"] = idmap.to_keys(out["dst"].to_numpy(dtype=np.int64))
    out = out.sort_values(["src", "dst"]).reset_index(drop=True)
    return out, round(float(out["weight"].sum()), 6)

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

from graph_data_science_ray._util import mix2
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


def _move_class(node: np.ndarray, parity: int, salt: int | None) -> np.ndarray:
    """Scheduling-class membership for a local-move sub-round.

    ``salt=None``: the static even/odd split (kept verbatim for the
    pinned ``louvain_round1`` oracle). Salted: a per-round hashed
    bipartition. The static split cannot serialize two ADJACENT
    same-parity nodes, which lets such a pair swap-chase each other's
    community forever — the loop then exits at max_rounds mid-
    oscillation instead of at a local optimum (caught by the
    ``modopt_valid`` invariant oracle). Re-drawing the bipartition each
    round separates any adjacent pair with probability 1/2 per round,
    so a zero-mover round certifies a true node-level local optimum.
    Deterministic in the data (splitmix hash of node id and round)."""
    node = np.asarray(node, dtype=np.int64)
    if salt is None:
        return (node % 2) == parity
    return (mix2(0x5EED + salt, node, 0) & np.uint64(1)).astype(np.int64) == parity


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
    salt: int | None = None,
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
        keep = (src != dst) & _move_class(src, parity, salt)
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


_PARTITIONED_V_CUTOFF = 5_000_000  # broadcast label arrays below, joins above


def _one_level_partitioned(
    sym_edges: rd.Dataset,
    node_count: int,
    max_rounds: int = 10,
    gamma: float = 1.0,
    constraint_ref=None,
    constraint_ds=None,
    num_parts: int = 64,
    return_ds: bool = False,
):
    """Local-move rounds with PARTITION-HELD community state — the scale
    path: labels live in a hash-partitioned ``(node, lab)`` Dataset and
    community volumes in a ``(comm, tot)`` Dataset; every sub-round is
    joins + groupby-sums, with NO per-sub-round O(V) ``ray.put``. The
    driver holds only scalars (two_m, move counts); labels are gathered
    ONCE at level end (result-sized, the same class as returning the
    labeling). Byte-identical to the broadcast path: weights are integer
    counts, so every sum is exact regardless of combine order.

    ``constraint_ref`` (Leiden refinement): a ray.put parent array, put
    ONCE per level by the caller and read map-side.
    ``constraint_ds`` (Leiden refinement, Dataset form): a ``(node, lab)``
    parent Dataset — the parent filter (parent[src] == parent[dst]) is
    constant across rounds and commutes with the parity/self filters, so
    it is applied ONCE up front as two hash-joins; deg/two_m stay
    full-graph (gain terms use full degrees, matching the broadcast path).
    """
    import pyarrow as _pa

    from graph_data_science_ray.pipelines.agg import hash_join

    # Scale the shuffle width to the graph; block counts are re-bounded
    # (repartition) before every materialize — unions/sorts otherwise grow
    # the block count geometrically across sub-rounds (each round's state
    # feeds the next round's joins) and tiny blocks drown the scheduler.
    num_parts = int(max(4, min(num_parts, node_count // 50_000 + 4)))

    edges_mv = sym_edges
    if constraint_ds is not None:
        S_E3 = _pa.schema(
            [("src", _pa.int64()), ("dst", _pa.int64()), ("weight", _pa.float64())]
        )
        e_slim = sym_edges.map_batches(
            lambda t: pa.table(
                {"src": t["src"].cast(_pa.int64()), "dst": t["dst"].cast(_pa.int64()),
                 "weight": pc_cast_f64(t["weight"])}
            ),
            batch_format="pyarrow",
        )
        p_src = constraint_ds.map_batches(
            lambda t: pa.table(
                {"node": t["node"].cast(_pa.int64()), "ps": t["lab"].cast(_pa.int64())}
            ),
            batch_format="pyarrow",
        )
        p_dst = constraint_ds.map_batches(
            lambda t: pa.table(
                {"node": t["node"].cast(_pa.int64()), "pd": t["lab"].cast(_pa.int64())}
            ),
            batch_format="pyarrow",
        )
        e1 = hash_join(
            e_slim, p_src, on=["src"], right_on=["node"], left_schema=S_E3,
            right_schema=_pa.schema([("node", _pa.int64()), ("ps", _pa.int64())]),
            num_parts=num_parts,
        )
        e2 = hash_join(
            e1, p_dst, on=["dst"], right_on=["node"],
            left_schema=S_E3.append(_pa.field("ps", _pa.int64())),
            right_schema=_pa.schema([("node", _pa.int64()), ("pd", _pa.int64())]),
            num_parts=num_parts,
        )

        def same_parent(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            keep = pc.equal(t["ps"], t["pd"])
            f = t.filter(keep)
            return pa.table({"src": f["src"], "dst": f["dst"], "weight": f["weight"]})

        edges_mv = e2.map_batches(
            same_parent, batch_format="pyarrow"
        ).materialize()

    deg_ds = hash_aggregate(
        sym_edges.map_batches(
            lambda t: pa.table(
                {"node": t["src"], "deg": pc_cast_f64(t["weight"])}
            ),
            batch_format="pyarrow",
        ),
        ["node"], "deg", op="sum", num_parts=num_parts,
    ).repartition(num_parts).materialize()
    two_m = float(deg_ds.sum("deg") or 0.0)
    if two_m == 0:
        if return_ds:
            ident = rd.range(node_count).map_batches(
                lambda t: pa.table({"node": t["id"], "lab": t["id"]}),
                batch_format="pyarrow",
            )
            return ident, False
        return np.arange(node_count, dtype=np.int64), False

    lab_ds = rd.range(node_count).map_batches(
        lambda t: pa.table({"node": t["id"], "lab": t["id"]}),
        batch_format="pyarrow",
    ).repartition(num_parts).materialize()

    S_LAB = _pa.schema([("node", _pa.int64()), ("lab", _pa.int64())])
    S_DEG = _pa.schema([("node", _pa.int64()), ("deg", _pa.float64())])
    S_TOT = _pa.schema([("comm", _pa.int64()), ("tot", _pa.float64())])
    S_CAND = _pa.schema(
        [("src", _pa.int64()), ("comm", _pa.int64()), ("w", _pa.float64())]
    )

    def _tot_from(lab_ds_):
        joined = hash_join(
            lab_ds_, deg_ds, on=["node"], left_schema=S_LAB, right_schema=S_DEG,
            num_parts=num_parts,
        )
        return hash_aggregate(
            joined.map_batches(
                lambda t: pa.table({"comm": t["lab"], "deg": t["deg"]}),
                batch_format="pyarrow",
            ),
            ["comm"], "deg", op="sum", out_col="tot", num_parts=num_parts,
        ).repartition(num_parts).materialize()

    tot_ds = _tot_from(lab_ds)

    improved_any = False
    for _rnd in range(max_rounds):
        moved = 0
        for parity in (0, 1):
            def half(t: pa.Table, *, par=parity, sl=_rnd) -> pa.Table:
                src = t["src"].to_numpy(zero_copy_only=False)
                dst = t["dst"].to_numpy(zero_copy_only=False)
                w = t["weight"].to_numpy(zero_copy_only=False)
                keep = (src != dst) & _move_class(src, par, sl)
                if constraint_ref is not None:
                    parent = ray.get(constraint_ref)
                    keep &= parent[src] == parent[dst]
                return pa.table(
                    {"src": pa.array(src[keep]), "dst": pa.array(dst[keep]),
                     "w": pa.array(w[keep].astype(np.float64))}
                )

            half_ds = edges_mv.map_batches(half, batch_format="pyarrow")
            # attach the NEIGHBOR's community by joining on dst
            cand0 = hash_join(
                half_ds, lab_ds, on=["dst"], right_on=["node"],
                left_schema=_pa.schema(
                    [("src", _pa.int64()), ("dst", _pa.int64()), ("w", _pa.float64())]
                ),
                right_schema=S_LAB,
                num_parts=num_parts,
            )
            cand1 = cand0.map_batches(
                lambda t: _partial_src_comm(t), batch_format="pyarrow"
            )
            # guaranteed own-community row per active node (w=0) so tot_cur
            # rides the tot join even when a node has no same-comm neighbor
            def zero_rows(t: pa.Table, *, par=parity, sl=_rnd) -> pa.Table:
                node = t["node"].to_numpy(zero_copy_only=False)
                lab = t["lab"].to_numpy(zero_copy_only=False)
                keep = _move_class(node, par, sl)
                return pa.table(
                    {"src": pa.array(node[keep]), "comm": pa.array(lab[keep]),
                     "w": pa.array(np.zeros(int(keep.sum()), dtype=np.float64))}
                )

            cand2 = hash_aggregate(
                cand1.union(lab_ds.map_batches(zero_rows, batch_format="pyarrow")),
                ["src", "comm"], "w", op="sum", num_parts=num_parts,
            )
            cand3 = hash_join(
                cand2, tot_ds, on=["comm"], left_schema=S_CAND, right_schema=S_TOT,
                num_parts=num_parts,
            )
            info = hash_join(
                lab_ds, deg_ds, on=["node"], left_schema=S_LAB, right_schema=S_DEG,
                num_parts=num_parts,
            )

            def cand_rows(t: pa.Table) -> pa.Table:
                n = t.num_rows
                return pa.table(
                    {
                        "src": t["src"], "comm": t["comm"], "w": t["w"],
                        "tot": t["tot"],
                        "cur": pa.array(np.full(n, -1, dtype=np.int64)),
                        "deg": pa.array(np.zeros(n, dtype=np.float64)),
                        "kind": pa.array(np.zeros(n, dtype=np.int64)),
                    }
                )

            def info_rows(t: pa.Table, *, par=parity, sl=_rnd) -> pa.Table:
                node = t["node"].to_numpy(zero_copy_only=False)
                keep = _move_class(node, par, sl)
                n = int(keep.sum())
                return pa.table(
                    {
                        "src": pa.array(node[keep]),
                        "comm": pa.array(np.full(n, -1, dtype=np.int64)),
                        "w": pa.array(np.zeros(n, dtype=np.float64)),
                        "tot": pa.array(np.zeros(n, dtype=np.float64)),
                        "cur": t["lab"].to_numpy(zero_copy_only=False)[keep],
                        "deg": t["deg"].to_numpy(zero_copy_only=False)[keep],
                        "kind": pa.array(np.ones(n, dtype=np.int64)),
                    }
                )

            stream = cand3.map_batches(cand_rows, batch_format="pyarrow").union(
                info.map_batches(info_rows, batch_format="pyarrow")
            )

            def tag_src(df: pd.DataFrame) -> pd.DataFrame:
                df = df.copy()
                df["__part"] = (df["src"].to_numpy() % num_parts).astype(np.int64)
                return df

            def choose_part(g: pd.DataFrame, *, gm=gamma, tm=two_m) -> pd.DataFrame:
                out_empty = pd.DataFrame(
                    {"node": np.zeros(0, dtype=np.int64),
                     "community": np.zeros(0, dtype=np.int64)}
                )
                inf = g[g["kind"] == 1]
                rows = g[g["kind"] == 0]
                if not len(inf) or not len(rows):
                    return out_empty
                m = rows.merge(inf[["src", "cur", "deg"]], on="src", suffixes=("", "_i"))
                if not len(m):
                    return out_empty
                node = m["src"].to_numpy(dtype=np.int64)
                comm = m["comm"].to_numpy(dtype=np.int64)
                w = m["w"].to_numpy(dtype=np.float64)
                tot = m["tot"].to_numpy(dtype=np.float64)
                cur = m["cur_i"].to_numpy(dtype=np.int64)
                dg = m["deg_i"].to_numpy(dtype=np.float64)
                is_cur = comm == cur
                # per-node own-community stats (guaranteed present)
                own = pd.DataFrame(
                    {"src": node[is_cur], "own_w": w[is_cur],
                     "tot_cur": tot[is_cur], "deg": dg[is_cur]}
                ).groupby("src", sort=False).agg(
                    own_w=("own_w", "sum"), tot_cur=("tot_cur", "max"),
                    deg=("deg", "max"),
                ).reset_index()
                c_mask = ~is_cur
                if not c_mask.any():
                    return out_empty
                cn, cc, cw, ct, cd = (
                    node[c_mask], comm[c_mask], w[c_mask], tot[c_mask], dg[c_mask]
                )
                gain = cw - gm * cd * ct / tm
                order = np.lexsort((cc, -gain, cn))
                cn, cc, gain = cn[order], cc[order], gain[order]
                first = np.empty(len(cn), dtype=bool)
                first[0] = True
                first[1:] = cn[1:] != cn[:-1]
                bn, bc, bg = cn[first], cc[first], gain[first]
                o = own.set_index("src").reindex(bn)
                cur_gain = (
                    o["own_w"].to_numpy()
                    - gm * o["deg"].to_numpy()
                    * (o["tot_cur"].to_numpy() - o["deg"].to_numpy()) / tm
                )
                do = bg > cur_gain + 1e-12
                return pd.DataFrame({"node": bn[do], "community": bc[do]})

            movers = (
                stream.map_batches(tag_src, batch_format="pandas")
                .groupby("__part")
                .map_groups(choose_part, batch_format="pandas")
            ).materialize()
            n_moved = movers.count()
            if n_moved:
                # apply moves with a partition-local coalesce (no driver state)
                def tag_node(df: pd.DataFrame) -> pd.DataFrame:
                    df = df.copy()
                    key = df["node"].to_numpy()
                    df["__part"] = (key % num_parts).astype(np.int64)
                    return df

                def apply_moves(g: pd.DataFrame) -> pd.DataFrame:
                    base = g[g["kind"] == 0][["node", "lab"]]
                    mv = g[g["kind"] == 1][["node", "community"]]
                    if len(mv):
                        out = base.merge(mv, on="node", how="left")
                        new = out["community"].fillna(out["lab"]).astype(np.int64)
                        return pd.DataFrame({"node": out["node"], "lab": new})
                    return base

                def mv_side(df: pd.DataFrame) -> pd.DataFrame:
                    return pd.DataFrame(
                        {"node": df["node"].to_numpy(dtype=np.int64),
                         "lab": np.full(len(df), -1, dtype=np.int64),
                         "community": df["community"].to_numpy(dtype=np.int64),
                         "kind": np.ones(len(df), dtype=np.int64)}
                    )

                def lab_side(df: pd.DataFrame) -> pd.DataFrame:
                    return pd.DataFrame(
                        {"node": df["node"].to_numpy(dtype=np.int64),
                         "lab": df["lab"].to_numpy(dtype=np.int64),
                         "community": np.full(len(df), -1, dtype=np.int64),
                         "kind": np.zeros(len(df), dtype=np.int64)}
                    )

                lab_ds = (
                    lab_ds.map_batches(lab_side, batch_format="pandas")
                    .union(movers.map_batches(mv_side, batch_format="pandas"))
                    .map_batches(tag_node, batch_format="pandas")
                    .groupby("__part")
                    .map_groups(apply_moves, batch_format="pandas")
                ).repartition(num_parts).materialize()
                tot_ds = _tot_from(lab_ds)
                moved += int(n_moved)
        if moved == 0:
            break
        improved_any = True
    if return_ds:
        # Dataset contract: the (node, lab) state stays in the object
        # store (louvain_ds composes levels by joins, never gathering)
        return lab_ds, improved_any
    # level-end gather: O(V) once, only in the DataFrame-composing caller
    lab_pd = lab_ds.to_pandas()
    labels = np.arange(node_count, dtype=np.int64)
    labels[lab_pd["node"].to_numpy(dtype=np.int64)] = lab_pd["lab"].to_numpy(
        dtype=np.int64
    )
    return labels, improved_any


def pc_cast_f64(arr):
    import pyarrow.compute as pc

    return pc.cast(arr, pa.float64())


def _partial_src_comm(t: pa.Table) -> pa.Table:
    df = pd.DataFrame(
        {
            "src": t["src"].to_numpy(zero_copy_only=False),
            "comm": t["lab"].to_numpy(zero_copy_only=False),
            "w": t["w"].to_numpy(zero_copy_only=False),
        }
    )
    g = df.groupby(["src", "comm"], sort=False)["w"].sum().reset_index()
    return pa.Table.from_pandas(g, preserve_index=False)


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
            movers = _best_moves(
                sym_edges, labels, deg, tot, two_m, gamma, parity, salt=_rnd
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


def _contract_ds(
    sym_edges: rd.Dataset, node_map: rd.Dataset, num_parts: int = 64
) -> rd.Dataset:
    """Contract edges by a ``(node, rank)`` Dataset mapping — two
    hash-joins + one hash_aggregate: the Dataset counterpart of
    :func:`_contract`'s broadcast remap (no O(V) ``ray.put``). Weights
    are integer counts, so the sums are exact at any combine order."""
    from graph_data_science_ray.pipelines.agg import hash_join

    S_E = pa.schema(
        [("src", pa.int64()), ("dst", pa.int64()), ("weight", pa.float64())]
    )
    S_MS = pa.schema([("node", pa.int64()), ("rsrc", pa.int64())])
    S_MD = pa.schema([("node", pa.int64()), ("rdst", pa.int64())])

    def slim(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": t["src"].cast(pa.int64()),
                "dst": t["dst"].cast(pa.int64()),
                "weight": pc_cast_f64(t["weight"]),
            }
        )

    m_src = node_map.map_batches(
        lambda t: pa.table(
            {"node": t["node"].cast(pa.int64()), "rsrc": t["rank"].cast(pa.int64())}
        ),
        batch_format="pyarrow",
    )
    m_dst = node_map.map_batches(
        lambda t: pa.table(
            {"node": t["node"].cast(pa.int64()), "rdst": t["rank"].cast(pa.int64())}
        ),
        batch_format="pyarrow",
    )
    j = hash_join(
        sym_edges.map_batches(slim, batch_format="pyarrow"), m_src,
        on=["src"], right_on=["node"], left_schema=S_E, right_schema=S_MS,
        num_parts=num_parts,
    )
    S_J = pa.schema(
        [("src", pa.int64()), ("dst", pa.int64()), ("weight", pa.float64()),
         ("rsrc", pa.int64())]
    )
    j = hash_join(
        j, m_dst, on=["dst"], right_on=["node"], left_schema=S_J,
        right_schema=S_MD, num_parts=num_parts,
    )
    remapped = j.map_batches(
        lambda t: pa.table(
            {"src": t["rsrc"], "dst": t["rdst"], "partial": t["weight"]}
        ),
        batch_format="pyarrow",
    )
    agg = hash_aggregate(
        remapped, ["src", "dst"], "partial", op="sum", out_col="weight",
        num_parts=num_parts,
    )
    return agg.map_batches(
        lambda t: pa.table(
            {"src": t["src"], "dst": t["dst"], "weight": pc_cast_f64(t["weight"])}
        ),
        batch_format="pyarrow",
    )


def louvain_ds(
    sym_edges: rd.Dataset,
    node_count: int,
    max_levels: int = 5,
    max_rounds: int = 10,
    gamma: float = 1.0,
    num_parts: int = 64,
) -> rd.Dataset:
    """Multi-level Louvain with the DATASET result contract (the
    10^10-node path): label state, level composition, re-densification
    (``dense_rank_table``), contraction and the min-member normalization
    are all hash-partitioned Dataset operations — the driver sees only
    scalar counts, never an O(V) array. Returns ``(node, community)``
    over dense ids, byte-identical to
    ``louvain(..., state_mode="partitioned")`` (parity-tested;
    ``include_intermediate`` stays with the DataFrame wrapper)."""
    from graph_data_science_ray.pipelines.agg import dense_rank_table, hash_join

    S_LAB = pa.schema([("node", pa.int64()), ("lab", pa.int64())])
    S_RANK = pa.schema([("lab", pa.int64()), ("rank", pa.int64())])

    cur = (
        rd.range(node_count)
        .map_batches(
            lambda t: pa.table(
                {"node": t["id"].cast(pa.int64()), "lab": t["id"].cast(pa.int64())}
            ),
            batch_format="pyarrow",
        )
        .repartition(max(4, min(num_parts, node_count // 50_000 + 4)))
        .materialize()
    )
    edges = sym_edges
    n = node_count
    for _level in range(max_levels):
        lvl_ds, improved = _one_level_partitioned(
            edges, n, max_rounds=max_rounds, gamma=gamma,
            num_parts=num_parts, return_ds=True,
        )
        if not improved:
            break
        lvl_ds = lvl_ds.materialize()
        # dense ranks of the level's label values (identical numbering to
        # the driver path's np.unique: sorted distinct -> 0..n_new-1)
        ranks = dense_rank_table(
            lvl_ds.map_batches(
                lambda t: pa.table({"lab": t["lab"].cast(pa.int64())}),
                batch_format="pyarrow",
            ),
            "lab", num_parts=num_parts,
        ).materialize()
        n_new = ranks.count()
        # compose cur through the level map, then densify: cur.lab values
        # live in 0..n-1 == lvl_ds's node domain
        lvl_m = lvl_ds.map_batches(
            lambda t: pa.table({"meta": t["node"], "mlab": t["lab"]}),
            batch_format="pyarrow",
        )
        cur = hash_join(
            cur, lvl_m, on=["lab"], right_on=["meta"], left_schema=S_LAB,
            right_schema=pa.schema([("meta", pa.int64()), ("mlab", pa.int64())]),
            num_parts=num_parts,
        ).map_batches(
            lambda t: pa.table({"node": t["node"], "lab": t["mlab"]}),
            batch_format="pyarrow",
        )
        cur = hash_join(
            cur, ranks, on=["lab"], left_schema=S_LAB, right_schema=S_RANK,
            num_parts=num_parts,
        ).map_batches(
            lambda t: pa.table({"node": t["node"], "lab": t["rank"]}),
            batch_format="pyarrow",
        ).materialize()
        # contract the level graph by the dense-ified level labels
        node_map = hash_join(
            lvl_ds, ranks, on=["lab"], left_schema=S_LAB, right_schema=S_RANK,
            num_parts=num_parts,
        ).map_batches(
            lambda t: pa.table({"node": t["node"], "rank": t["rank"]}),
            batch_format="pyarrow",
        )
        edges = _contract_ds(edges, node_map, num_parts=num_parts).materialize()
        n = int(n_new)
        if n <= 1:
            break
    # normalize: community = min original member id per label
    mins = hash_aggregate(
        cur.map_batches(
            lambda t: pa.table({"lab": t["lab"], "member": t["node"]}),
            batch_format="pyarrow",
        ),
        ["lab"], "member", op="min", out_col="community", num_parts=num_parts,
    )
    return hash_join(
        cur, mins, on=["lab"], left_schema=S_LAB,
        right_schema=pa.schema([("lab", pa.int64()), ("community", pa.int64())]),
        num_parts=num_parts,
    ).map_batches(
        lambda t: pa.table({"node": t["node"], "community": t["community"]}),
        batch_format="pyarrow",
    )


def _level_fn(state_mode: str, node_count: int):
    """Pick the level engine: broadcast arrays below the V cutoff (optimal
    on one node), partition-held Dataset state above it (the 10^9-node
    path — no per-sub-round O(V) broadcasts)."""
    if state_mode == "partitioned" or (
        state_mode == "auto" and node_count > _PARTITIONED_V_CUTOFF
    ):
        return _one_level_partitioned
    return _one_level


def louvain(
    sym_edges: rd.Dataset,
    node_count: int,
    idmap=None,
    max_levels: int = 5,
    max_rounds: int = 10,
    gamma: float = 1.0,
    state_mode: str = "auto",
    include_intermediate: bool = False,
) -> pd.DataFrame:
    """Multi-level Louvain; returns (node, community) with community =
    the minimum original member id of the final community (normalized,
    comparable to the reference's set-equivalence contract).

    ``gamma`` is the resolution parameter (the knob Leiden exposes as
    ``gamma``; >1 favors more/smaller communities).

    ``include_intermediate=True`` adds one ``community_l<k>`` column per
    dendrogram level (each normalized to min original member id) — the
    reference's ``includeIntermediateCommunities``
    (louvain/LouvainResult.java: per-level community arrays); level k+1
    is always a coarsening of level k.
    """
    level = _level_fn(state_mode, node_count)
    labels = np.arange(node_count, dtype=np.int64)
    edges = sym_edges
    n = node_count
    levels: list[np.ndarray] = []
    for _level in range(max_levels):
        lvl_labels, improved = level(edges, n, max_rounds=max_rounds, gamma=gamma)
        labels = lvl_labels[labels]
        if not improved:
            break
        if include_intermediate:
            levels.append(labels.copy())
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

    def _normalize(lab: np.ndarray) -> np.ndarray:
        df = pd.DataFrame({"node": np.arange(node_count, dtype=np.int64), "c": lab})
        return df.groupby("c")["node"].transform("min").to_numpy(dtype=np.int64)

    out = pd.DataFrame(
        {
            "node": np.arange(node_count, dtype=np.int64),
            "community": _normalize(labels),
        }
    )
    if include_intermediate:
        for k, lab in enumerate(levels):
            out[f"community_l{k}"] = _normalize(lab)
    if idmap is not None:
        out["node"] = idmap.to_keys(out["node"].to_numpy(dtype=np.int64))
        for c in out.columns:
            if c != "node":
                out[c] = idmap.to_keys(out[c].to_numpy(dtype=np.int64))
    return out


def _refine_within(sym_edges: rd.Dataset, parent: np.ndarray, node_count: int,
                   gamma: float, max_rounds: int = 3,
                   state_mode: str = "auto") -> np.ndarray:
    """Leiden refinement: constrained local moves inside each parent
    community (nodes start as singletons and may only merge with
    same-parent communities), then hash-min connectivity so every refined
    community is internally connected. Deterministic (parity schedule);
    the reference's randomized merge sampling is replaced by the greedy
    gain argmax — a documented simplification that keeps both Leiden
    guarantees (well-connected via gain, connected via the CC pass)."""
    if state_mode == "partitioned" or (
        state_mode == "auto" and node_count > _PARTITIONED_V_CUTOFF
    ):
        cref = ray.put(parent)  # ONCE per level, read map-side
        labels, _imp = _one_level_partitioned(
            sym_edges, node_count, max_rounds=max_rounds, gamma=gamma,
            constraint_ref=cref,
        )
        return _cc_within_communities(sym_edges, labels)
    deg = _weighted_degrees(sym_edges, node_count)
    two_m = deg.sum()
    if two_m == 0:
        return np.arange(node_count, dtype=np.int64)
    labels = np.arange(node_count, dtype=np.int64)  # singletons
    tot = deg.copy()
    for _rnd in range(max_rounds):
        moved = 0
        for parity in (0, 1):
            movers = _best_moves(
                sym_edges, labels, deg, tot, two_m, gamma, parity,
                constraint=parent, salt=_rnd,
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


def _cc_within_communities_ds(
    sym_edges: rd.Dataset, lab_ds: rd.Dataset, node_count: int, num_parts: int = 64
) -> rd.Dataset:
    """Dataset counterpart of :func:`_cc_within_communities`: min-member
    connected components restricted to same-label edges, with the
    ``(node, comp)`` state and the filtered edge stream held in the
    object store. Per round: a hash-min over incoming neighbors' comp
    (union + aggregate, no left-join gymnastics) followed by one pointer
    jump (comp := comp[comp], a self-join — the comp table is total over
    [0, V) so the inner join loses nothing). The driver sees only the
    monotone Σcomp scalar, whose stall is the exact convergence test
    (comp is pointwise nonincreasing). Same unique fixpoint as the
    broadcast variant: the hash-min component labeling is
    schedule-independent."""
    from graph_data_science_ray.pipelines.agg import hash_aggregate, hash_join

    num_parts = int(max(4, min(num_parts, node_count // 50_000 + 4)))
    S_E2 = pa.schema([("src", pa.int64()), ("dst", pa.int64())])
    S_LAB = pa.schema([("node", pa.int64()), ("lab", pa.int64())])
    S_COMP = pa.schema([("node", pa.int64()), ("comp", pa.int64())])

    e_slim = sym_edges.map_batches(
        lambda t: pa.table(
            {"src": t["src"].cast(pa.int64()), "dst": t["dst"].cast(pa.int64())}
        ),
        batch_format="pyarrow",
    )
    l_src = lab_ds.map_batches(
        lambda t: pa.table(
            {"node": t["node"].cast(pa.int64()), "ls": t["lab"].cast(pa.int64())}
        ),
        batch_format="pyarrow",
    )
    l_dst = lab_ds.map_batches(
        lambda t: pa.table(
            {"node": t["node"].cast(pa.int64()), "ld": t["lab"].cast(pa.int64())}
        ),
        batch_format="pyarrow",
    )
    e1 = hash_join(
        e_slim, l_src, on=["src"], right_on=["node"], left_schema=S_E2,
        right_schema=pa.schema([("node", pa.int64()), ("ls", pa.int64())]),
        num_parts=num_parts,
    )
    e2 = hash_join(
        e1, l_dst, on=["dst"], right_on=["node"],
        left_schema=S_E2.append(pa.field("ls", pa.int64())),
        right_schema=pa.schema([("node", pa.int64()), ("ld", pa.int64())]),
        num_parts=num_parts,
    )

    def same_label(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        f = t.filter(pc.equal(t["ls"], t["ld"]))
        return pa.table({"src": f["src"], "dst": f["dst"]})

    filtered = e2.map_batches(same_label, batch_format="pyarrow").materialize()

    comp = (
        rd.range(node_count)
        .map_batches(
            lambda t: pa.table(
                {"node": t["id"].cast(pa.int64()), "comp": t["id"].cast(pa.int64())}
            ),
            batch_format="pyarrow",
        )
        .repartition(num_parts)
        .materialize()
    )
    prev_sum = comp.sum("comp")
    for _round in range(64):
        cand = hash_join(
            filtered, comp, on=["src"], right_on=["node"], left_schema=S_E2,
            right_schema=S_COMP, num_parts=num_parts,
        ).map_batches(
            lambda t: pa.table({"node": t["dst"], "comp": t["comp"]}),
            batch_format="pyarrow",
        )
        new = hash_aggregate(
            cand.union(comp), ["node"], "comp", op="min", num_parts=num_parts
        )
        jumped = hash_join(
            new,
            new.map_batches(
                lambda t: pa.table({"j": t["node"], "jc": t["comp"]}),
                batch_format="pyarrow",
            ),
            on=["comp"], right_on=["j"], left_schema=S_COMP,
            right_schema=pa.schema([("j", pa.int64()), ("jc", pa.int64())]),
            num_parts=num_parts,
        ).map_batches(
            lambda t: pa.table({"node": t["node"], "comp": t["jc"]}),
            batch_format="pyarrow",
        )
        comp = jumped.repartition(num_parts).materialize()
        s = comp.sum("comp")
        if s == prev_sum:
            break
        prev_sum = s
    return comp


def leiden_ds(
    sym_edges: rd.Dataset,
    node_count: int,
    max_levels: int = 5,
    max_rounds: int = 10,
    gamma: float = 1.0,
    num_parts: int = 64,
) -> rd.Dataset:
    """Leiden with the DATASET result contract (the 10^10-node path):
    local moves, the constrained refinement moves, the within-community
    connectivity pass, level composition, re-densification and
    contraction are all hash-partitioned Dataset operations — the driver
    sees only scalar counts. Returns ``(node, community)`` over dense
    ids, value-identical to ``leiden(..., state_mode="partitioned")``
    (parity-tested). ``include_intermediate`` stays with the DataFrame
    wrapper."""
    from graph_data_science_ray.pipelines.agg import dense_rank_table, hash_join

    S_LAB = pa.schema([("node", pa.int64()), ("lab", pa.int64())])
    S_RANK = pa.schema([("lab", pa.int64()), ("rank", pa.int64())])

    cur = (
        rd.range(node_count)
        .map_batches(
            lambda t: pa.table(
                {"node": t["id"].cast(pa.int64()), "lab": t["id"].cast(pa.int64())}
            ),
            batch_format="pyarrow",
        )
        .repartition(max(4, min(num_parts, node_count // 50_000 + 4)))
        .materialize()
    )
    edges = sym_edges
    n = node_count
    for _level in range(max_levels):
        lvl_ds, improved = _one_level_partitioned(
            edges, n, max_rounds=max_rounds, gamma=gamma,
            num_parts=num_parts, return_ds=True,
        )
        if not improved:
            # refinement under singleton parents is the identity (no
            # same-parent non-self edges), so the driver path's
            # apply-then-break is a no-op here
            break
        lvl_ds = lvl_ds.materialize()
        # refinement: constrained singleton moves (3 rounds, the
        # _refine_within contract), then connected components within the
        # refined labels — both Dataset-held
        mv_ds, _ = _one_level_partitioned(
            edges, n, max_rounds=3, gamma=gamma, num_parts=num_parts,
            return_ds=True, constraint_ds=lvl_ds,
        )
        refined = _cc_within_communities_ds(
            edges, mv_ds.materialize(), n, num_parts=num_parts
        ).materialize()
        # dense ranks of the refined labels (sorted distinct -> 0..n_new-1,
        # identical numbering to the driver path's np.unique)
        ranks = dense_rank_table(
            refined.map_batches(
                lambda t: pa.table({"lab": t["comp"].cast(pa.int64())}),
                batch_format="pyarrow",
            ),
            "lab", num_parts=num_parts,
        ).materialize()
        n_new = ranks.count()
        # compose cur through the REFINED partition (leiden contracts by
        # the refined labels, not the move labels), then densify
        ref_m = refined.map_batches(
            lambda t: pa.table({"meta": t["node"], "mlab": t["comp"]}),
            batch_format="pyarrow",
        )
        cur = hash_join(
            cur, ref_m, on=["lab"], right_on=["meta"], left_schema=S_LAB,
            right_schema=pa.schema([("meta", pa.int64()), ("mlab", pa.int64())]),
            num_parts=num_parts,
        ).map_batches(
            lambda t: pa.table({"node": t["node"], "lab": t["mlab"]}),
            batch_format="pyarrow",
        )
        cur = hash_join(
            cur, ranks, on=["lab"], left_schema=S_LAB, right_schema=S_RANK,
            num_parts=num_parts,
        ).map_batches(
            lambda t: pa.table({"node": t["node"], "lab": t["rank"]}),
            batch_format="pyarrow",
        ).materialize()
        node_map = hash_join(
            refined.map_batches(
                lambda t: pa.table({"node": t["node"], "lab": t["comp"]}),
                batch_format="pyarrow",
            ),
            ranks, on=["lab"], left_schema=S_LAB, right_schema=S_RANK,
            num_parts=num_parts,
        ).map_batches(
            lambda t: pa.table({"node": t["node"], "rank": t["rank"]}),
            batch_format="pyarrow",
        )
        edges = _contract_ds(edges, node_map, num_parts=num_parts).materialize()
        n = int(n_new)
        if n <= 1:
            break
    # normalize: community = min original member id per label
    mins = hash_aggregate(
        cur.map_batches(
            lambda t: pa.table({"lab": t["lab"], "member": t["node"]}),
            batch_format="pyarrow",
        ),
        ["lab"], "member", op="min", out_col="community", num_parts=num_parts,
    )
    return hash_join(
        cur, mins, on=["lab"], left_schema=S_LAB,
        right_schema=pa.schema([("lab", pa.int64()), ("community", pa.int64())]),
        num_parts=num_parts,
    ).map_batches(
        lambda t: pa.table({"node": t["node"], "community": t["community"]}),
        batch_format="pyarrow",
    )


def leiden(
    sym_edges: rd.Dataset,
    node_count: int,
    idmap=None,
    max_levels: int = 5,
    max_rounds: int = 10,
    gamma: float = 1.0,
    state_mode: str = "auto",
    include_intermediate: bool = False,
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
    level = _level_fn(state_mode, node_count)
    labels = np.arange(node_count, dtype=np.int64)
    edges = sym_edges
    n = node_count
    levels: list[np.ndarray] = []
    for _level in range(max_levels):
        lvl_labels, improved = level(edges, n, max_rounds=max_rounds, gamma=gamma)
        refined = _refine_within(edges, lvl_labels, n, gamma, state_mode=state_mode)
        labels = refined[labels]
        if not improved:
            break
        if include_intermediate:
            levels.append(labels.copy())
        uniq, dense = np.unique(labels, return_inverse=True)
        labels = dense.astype(np.int64)
        n = len(uniq)
        edges = _contract(
            edges, np.unique(refined, return_inverse=True)[1].astype(np.int64)
        ).materialize()
        if n <= 1:
            break

    def _normalize(lab: np.ndarray) -> np.ndarray:
        df = pd.DataFrame({"node": np.arange(node_count, dtype=np.int64), "c": lab})
        return df.groupby("c")["node"].transform("min").to_numpy(dtype=np.int64)

    out = pd.DataFrame(
        {
            "node": np.arange(node_count, dtype=np.int64),
            "community": _normalize(labels),
        }
    )
    if include_intermediate:
        for k, lab in enumerate(levels):
            out[f"community_l{k}"] = _normalize(lab)
    if idmap is not None:
        out["node"] = idmap.to_keys(out["node"].to_numpy(dtype=np.int64))
        for c in out.columns:
            if c != "node":
                out[c] = idmap.to_keys(out[c].to_numpy(dtype=np.int64))
    return out


def modularity_optimization(
    sym_edges: rd.Dataset,
    node_count: int,
    idmap=None,
    max_rounds: int = 10,
    gamma: float = 1.0,
    state_mode: str = "auto",
) -> tuple[pd.DataFrame, float]:
    """Single-level modularity optimization (no coarsening).

    Reference: modularityoptimization/ModularityOptimization.java:61 —
    color-scheduled parallel local moves to a local modularity optimum;
    our parity schedule plays the K1-coloring serialization role. Returns
    ((node, community), modularity); community = min member id.
    """
    from graph_data_science_ray.functions.community_metrics import modularity

    labels, _ = _level_fn(state_mode, node_count)(
        sym_edges, node_count, max_rounds=max_rounds, gamma=gamma
    )
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

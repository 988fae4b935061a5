"""K-1 coloring and topological sort — iterative Dataset rounds.

References:
- k1coloring/K1Coloring.java:63 — greedy color assignment with
  conflict-resolution rounds: each round conflicted nodes pick the
  smallest color unused by their neighbors; a conflict (equal adjacent
  colors) is resolved by recoloring the higher node id.
- dag/topologicalsort/TopologicalSort.java:54 — iterative zero-in-degree
  peel; also yields the longest-path layer per node.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from graph_data_science_ray.pipelines.agg import hash_aggregate


def _recolor_active(
    sym_edges: rd.Dataset, colors: np.ndarray, active: np.ndarray, num_parts: int = 64
) -> pd.DataFrame:
    """Smallest free color per ACTIVE node, computed inside map_groups.

    For sorted distinct neighbor colors ``used``, the smallest free color
    is the first rank i with ``used[i] != i`` (else the run length) —
    one vectorized ``minimum.reduceat``, no per-node Python loop.
    """
    cref = ray.put(colors)
    aref = ray.put(active)

    def partial(t: pa.Table) -> pa.Table:
        c = ray.get(cref)
        a = ray.get(aref)
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        keep = a[src]
        df = pd.DataFrame({"node": src[keep], "color": c[dst[keep]]}).drop_duplicates()
        df["__part"] = (df["node"].to_numpy() % num_parts).astype(np.int64)
        return pa.Table.from_pandas(df, preserve_index=False)

    return (
        sym_edges.map_batches(partial, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(_choose_free, batch_format="pandas")
    ).to_pandas()


def _choose_free(g: pd.DataFrame) -> pd.DataFrame:
    """Smallest color unused by each node's (node, color) neighbor rows:
    for sorted distinct colors, the first rank i with ``used[i] != i``
    (else the run length) — one ``minimum.reduceat``, no per-node loop."""
    g = g.drop_duplicates(subset=["node", "color"]).sort_values(
        ["node", "color"], kind="mergesort"
    )
    node = g["node"].to_numpy(dtype=np.int64)
    color = g["color"].to_numpy(dtype=np.int64)
    if len(node) == 0:
        return pd.DataFrame(
            {"node": pd.Series([], dtype=np.int64),
             "color": pd.Series([], dtype=np.int64)}
        )
    new = np.empty(len(node), dtype=bool)
    new[0] = True
    new[1:] = node[1:] != node[:-1]
    starts = np.flatnonzero(new)
    runlen = np.diff(np.append(starts, len(node)))
    rank = np.arange(len(node), dtype=np.int64) - np.repeat(starts, runlen)
    BIG = np.iinfo(np.int64).max
    cand = np.where(color != rank, rank, BIG)
    first = np.minimum.reduceat(cand, starts)
    free = np.where(first == BIG, runlen, first)
    return pd.DataFrame({"node": node[starts], "color": free.astype(np.int64)})


_DISTRIBUTED_NODE_CUTOFF = 5_000_000


def k1_coloring(
    sym_edges: rd.Dataset, node_count: int, idmap=None, max_rounds: int = 100,
    mode: str = "auto", num_parts: int = 64,
) -> pd.DataFrame:
    """Greedy conflict-resolution coloring; returns (node, color).

    ``mode="broadcast"`` (default below 5M nodes): colors and the active
    mask are V-arrays ``ray.put`` per recolor round. ``"distributed"``
    (auto above the cutoff): color state is a hash-partitioned
    (node, color) Dataset — picks and conflict detection become joins
    against it, and the driver sees only row counts. Identical colors
    (parity-tested at pinned rounds and the fixpoint)."""
    if mode == "auto":
        mode = "broadcast" if node_count <= _DISTRIBUTED_NODE_CUTOFF else "distributed"
    if mode == "distributed":
        return _k1_coloring_distributed(
            sym_edges, node_count, idmap, max_rounds, num_parts=num_parts
        )
    colors = np.zeros(node_count, dtype=np.int64)
    active = np.ones(node_count, dtype=bool)
    for _ in range(max_rounds):
        picks = _recolor_active(sym_edges, colors, active)
        new_colors = colors.copy()
        if len(picks):
            new_colors[picks["node"].to_numpy(dtype=np.int64)] = picks[
                "color"
            ].to_numpy(dtype=np.int64)
        colors = new_colors
        # conflicts: adjacent equal colors -> higher id recolors next round
        cref = ray.put(colors)

        def conflicts(t: pa.Table) -> pa.Table:
            c = ray.get(cref)
            src = t["src"].to_numpy(zero_copy_only=False)
            dst = t["dst"].to_numpy(zero_copy_only=False)
            bad = (c[src] == c[dst]) & (src > dst)
            return pa.table({"node": np.unique(src[bad]).astype(np.int64)})

        bad_df = sym_edges.map_batches(conflicts, batch_format="pyarrow").to_pandas()
        bad_nodes = bad_df["node"].unique() if "node" in bad_df.columns else []
        active = np.zeros(node_count, dtype=bool)
        if len(bad_nodes) == 0:
            break
        active[bad_nodes] = True
    node = idmap.keys if idmap is not None else np.arange(node_count, dtype=np.int64)
    return pd.DataFrame({"node": node, "color": colors})


def _k1_coloring_distributed(
    sym_edges: rd.Dataset, node_count: int, idmap=None, max_rounds: int = 100,
    num_parts: int = 64,
) -> pd.DataFrame:
    """Conflict-resolution coloring with Dataset-held color state (see
    ``k1_coloring``). Per round: semi-join edges against the active set,
    join neighbor colors, pick the smallest free color per node
    (the same reduceat kernel), overlay picks onto the color table, and
    re-derive the active set from a conflict join. No O(V) driver array
    until the final dense output."""
    from graph_data_science_ray.pipelines.agg import hash_distinct, hash_join

    def compact(ds: rd.Dataset) -> rd.Dataset:
        """Round-state barrier. The repartition is load-bearing: groupby /
        union / map_groups outputs carry input-block-count × fan-out
        blocks, so without it the per-round block count (and with it
        every later stage's task count) grows geometrically — observed
        4x wall-time per round on a constant-size toy graph."""
        return ds.repartition(num_parts).materialize()

    edge_schema = pa.schema([("src", pa.int64()), ("dst", pa.int64())])

    def slim(t: pa.Table) -> pa.Table:
        return pa.table(
            {"src": t["src"].cast(pa.int64()), "dst": t["dst"].cast(pa.int64())}
        )

    edges = compact(sym_edges.map_batches(slim, batch_format="pyarrow"))
    colors = hash_distinct(
        edges.map_batches(
            lambda t: pa.table({"node": t["src"].cast(pa.int64())}),
            batch_format="pyarrow",
        ),
        ["node"], num_parts=num_parts,
    ).map_batches(
        lambda t: pa.table(
            {"node": t["node"].cast(pa.int64()),
             "color": pa.array(np.zeros(t.num_rows, dtype=np.int64))}
        ),
        batch_format="pyarrow",
    ).materialize()
    color_schema = pa.schema([("node", pa.int64()), ("color", pa.int64())])
    active = compact(colors.map_batches(
        lambda t: pa.table({"node": t["node"]}), batch_format="pyarrow"
    ))  # round 1: every edge-touching node recolors
    active_schema = pa.schema([("node", pa.int64())])

    def overlay(base: rd.Dataset, picks: rd.Dataset) -> rd.Dataset:
        """new colors = base overridden by picks (hash-partitioned)."""
        def tag(flag):
            def f(t: pa.Table) -> pa.Table:
                return pa.table(
                    {"node": t["node"].cast(pa.int64()),
                     "color": t["color"].cast(pa.int64()),
                     "flag": pa.array(np.full(t.num_rows, flag, dtype=np.int64))}
                )
            return f

        both = base.map_batches(tag(0), batch_format="pyarrow").union(
            picks.map_batches(tag(1), batch_format="pyarrow")
        )

        def part(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["__part"] = (df["node"].to_numpy(dtype=np.int64) % num_parts)
            return df

        def choose_new(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["node", "flag"], kind="mergesort")
            return g.drop_duplicates("node", keep="last")[["node", "color"]]

        return (
            both.map_batches(part, batch_format="pandas")
            .groupby("__part")
            .map_groups(choose_new, batch_format="pandas")
        )

    for _ in range(max_rounds):
        e_act = hash_join(
            edges, active, on=["src"], right_on=["node"],
            left_schema=edge_schema, right_schema=active_schema,
            num_parts=num_parts,
        )
        e_col = hash_join(
            e_act,
            colors.map_batches(
                lambda t: pa.table({"node": t["node"], "ncolor": t["color"]}),
                batch_format="pyarrow",
            ),
            on=["dst"], right_on=["node"],
            left_schema=edge_schema,
            right_schema=pa.schema([("node", pa.int64()), ("ncolor", pa.int64())]),
            num_parts=num_parts,
        )

        def part_nc(t: pa.Table) -> pa.Table:
            df = pd.DataFrame(
                {"node": t["src"].to_numpy(zero_copy_only=False),
                 "color": t["ncolor"].to_numpy(zero_copy_only=False)}
            ).drop_duplicates()
            df["__part"] = (df["node"].to_numpy() % num_parts).astype(np.int64)
            return pa.Table.from_pandas(df, preserve_index=False)

        # Materialize per stage: each round is a barrier anyway, and Ray
        # Data's planner stalls on 4+ chained shuffle stages in one
        # execution (observed hang on a toy graph). picks is bounded by
        # the active-node count.
        picks = (
            e_col.map_batches(part_nc, batch_format="pyarrow")
            .groupby("__part")
            .map_groups(_choose_free, batch_format="pandas")
        ).materialize()
        colors = compact(overlay(colors, picks))

        c_src = colors.map_batches(
            lambda t: pa.table({"node": t["node"], "c_src": t["color"]}),
            batch_format="pyarrow",
        )
        c_dst = colors.map_batches(
            lambda t: pa.table({"node": t["node"], "c_dst": t["color"]}),
            batch_format="pyarrow",
        )
        j = hash_join(
            edges, c_src, on=["src"], right_on=["node"],
            left_schema=edge_schema,
            right_schema=pa.schema([("node", pa.int64()), ("c_src", pa.int64())]),
            num_parts=num_parts,
        )
        j = hash_join(
            j, c_dst, on=["dst"], right_on=["node"],
            left_schema=pa.schema(
                [("src", pa.int64()), ("dst", pa.int64()), ("c_src", pa.int64())]
            ),
            right_schema=pa.schema([("node", pa.int64()), ("c_dst", pa.int64())]),
            num_parts=num_parts,
        )

        def bad_src(t: pa.Table) -> pa.Table:
            src = t["src"].to_numpy(zero_copy_only=False)
            dst = t["dst"].to_numpy(zero_copy_only=False)
            cs = t["c_src"].to_numpy(zero_copy_only=False)
            cd = t["c_dst"].to_numpy(zero_copy_only=False)
            bad = (cs == cd) & (src > dst)
            return pa.table({"node": np.unique(src[bad]).astype(np.int64)})

        active = compact(hash_distinct(
            j.map_batches(bad_src, batch_format="pyarrow"), ["node"],
            num_parts=num_parts,
        ))
        if active.count() == 0:
            break

    out = np.zeros(node_count, dtype=np.int64)
    cdf = colors.to_pandas()
    if len(cdf):
        out[cdf["node"].to_numpy(dtype=np.int64)] = cdf["color"].to_numpy(
            dtype=np.int64
        )
    node = idmap.keys if idmap is not None else np.arange(node_count, dtype=np.int64)
    return pd.DataFrame({"node": node, "color": out})


def topological_sort(
    edges: rd.Dataset, node_count: int, idmap=None, max_rounds: int | None = None
) -> pd.DataFrame:
    """Zero-in-degree peel; returns (node, layer). Layer −1 marks nodes on
    or downstream of a cycle (never peeled) — the reference excludes them.
    """
    from graph_data_science_ray.functions.degree import degree_centrality

    layer = np.full(node_count, -1, dtype=np.int64)
    alive_edges = edges.materialize()
    indeg = np.zeros(node_count, dtype=np.int64)
    d = degree_centrality(alive_edges, node_count=node_count, orientation="reverse")
    indeg = d["degree"].to_numpy(dtype=np.int64).copy()
    assigned = np.zeros(node_count, dtype=bool)
    rounds = max_rounds or node_count + 1
    for it in range(rounds):
        frontier = np.flatnonzero((indeg == 0) & ~assigned)
        if len(frontier) == 0:
            break
        layer[frontier] = it
        assigned[frontier] = True
        fref = ray.put(assigned.copy())

        def peel(t: pa.Table, *, fref=fref) -> pa.Table:
            done = ray.get(fref)
            src = t["src"].to_numpy(zero_copy_only=False)
            dst = t["dst"].to_numpy(zero_copy_only=False)
            keep = ~done[src]
            # decrement in-degrees of targets of removed frontier edges
            frm = done[src]
            dec = np.bincount(dst[frm], minlength=len(done)).astype(np.int64)
            nz = np.flatnonzero(dec)
            rem = pa.table(
                {
                    "src": src[keep],
                    "dst": dst[keep],
                    "weight": t["weight"].to_numpy(zero_copy_only=False)[keep],
                }
            )
            return rem

        # recompute in-degree over the shrunken edge set (simpler than
        # deltas; each round is one filtered aggregate)
        alive_edges = alive_edges.map_batches(peel, batch_format="pyarrow").materialize()
        d = degree_centrality(alive_edges, node_count=node_count, orientation="reverse")
        indeg = d["degree"].to_numpy(dtype=np.int64)
        indeg[assigned] = -1
    node = idmap.keys if idmap is not None else np.arange(node_count, dtype=np.int64)
    return pd.DataFrame({"node": node, "layer": layer})


class _DagLongestPathComputation:
    """All-sources longest path on a DAG via min-relaxation with −1 edge
    weights: ``dist(v) = min(0, min_u (dist(u) − 1))`` converges in
    longest-path rounds (the DAG has no cycles, so the negative weights
    are safe) and ``layer = −dist``. The reference's topological sort
    exposes the same quantity as ``computeMaxDistanceFromSource``
    (dag/topologicalsort/TopologicalSort.java:54)."""

    # duck-typed PregelComputation (see state/pregel.py)
    reducer = "min"
    message_dtype = "float64"
    edge_combine = "add"

    def init_state(self, block: dict) -> dict:
        n = block["end"] - block["start"]
        dist = np.zeros(n, dtype=np.float64)
        return {"dist": dist, "changed": np.ones(n, dtype=bool)}

    def message_values(self, state, block):
        return state["dist"], state["changed"]

    def apply_messages(self, state, acc, received, block):
        new = np.minimum(state["dist"], acc)
        changed = new < state["dist"]
        state["dist"] = new
        state["changed"] = changed
        return {"changed": int(changed.sum())}

    def is_converged(self, stats: dict) -> bool:
        return stats.get("init") is None and stats.get("changed", 1) == 0


def dag_longest_path(graph, max_iterations: int = 10_000) -> pd.DataFrame:
    """Longest-path layer per node over a projected DAG whose edges carry
    weight −1 (see ``_q_dag_longest_path``: remap weights before
    projecting). Returns (node, layer) for every node; sources are 0.

    One BSP fixpoint (depth+1 supersteps) on the superstep kernel — no
    per-round edge rewriting, unlike the zero-in-degree peel of
    ``topological_sort`` (which stays the cycle-aware variant: it flags
    cycle-reachable nodes with −1, which a DAG-only formulation cannot)."""
    from graph_data_science_ray.state.pregel import Pregel, PregelComputation

    class _C(_DagLongestPathComputation, PregelComputation):
        pass

    engine = Pregel(graph, _C())
    refs = engine.run(max_iterations=max_iterations)
    dist = engine.gather(refs, "dist")
    layer = (-dist).astype(np.int64)
    node = graph.idmap.keys if graph.idmap is not None else np.arange(
        len(layer), dtype=np.int64
    )
    return pd.DataFrame({"node": node, "layer": layer})

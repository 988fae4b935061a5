"""Strongly connected components — forward-backward coloring rounds.

Reference: algo/src/main/java/org/neo4j/gds/scc/Scc.java:35 (sequential
Tarjan — "sequential strongly connected components"). The output contract
is exact SCC membership; we reproduce it with the parallel-friendly
coloring algorithm (Orzan / FW-BW style):

repeat until all nodes assigned:
 1. **color**: propagate min node id forward to fixpoint over the
    remaining subgraph — ``color(v)`` = min unassigned id that reaches v;
 2. **trace back**: from each root (``color(v) == v``) run a reachability
    fixpoint over the REVERSE edges restricted to the same color class —
    every node reached both ways belongs to ``SCC(root)``;
 3. assign those nodes their root id and peel them out.

Both fixpoints run on the BSP kernel (forward: min reducer; backward:
or reducer over the reverse projection). The live edge set stays a Ray
Dataset throughout — per round it is re-filtered by the broadcast
assignment mask and re-projected; the driver only holds O(V) masks and
color vectors, never the edge table.

Component id = min member id (the min-id contract, matching WCC's
Union-by-Min convention).
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from graph_data_science_ray.pipelines.agg import (
    hash_aggregate,
    hash_distinct,
    hash_join,
    materialize_bounded,
)
from graph_data_science_ray.state.graph import GraphStore
from graph_data_science_ray.state.pregel import Pregel, PregelComputation

_I64_MAX = np.iinfo(np.int64).max
_DISTRIBUTED_NODE_CUTOFF = 5_000_000


class _MinForward(PregelComputation):
    """color(v) = min over {v} ∪ {colors of in-neighbors}, to fixpoint."""

    reducer = "min"

    def __init__(self, active_mask: np.ndarray):
        self.active_mask = active_mask  # global bool: node still unassigned

    def init_state(self, block: dict) -> dict:
        ids = np.arange(block["start"], block["end"], dtype=np.int64)
        local_active = self.active_mask[block["start"] : block["end"]]
        color = np.where(local_active, ids, _I64_MAX)
        return {"color": color, "changed": local_active.copy()}

    def message_values(self, state, block):
        return state["color"], state["changed"]

    def apply_messages(self, state, acc, received, block):
        local_active = self.active_mask[block["start"] : block["end"]]
        new = np.where(local_active, np.minimum(state["color"], acc), state["color"])
        changed = new < state["color"]
        state["color"] = new
        state["changed"] = changed
        return {"changed": int(changed.sum())}

    def is_converged(self, stats):
        return stats.get("init") is None and stats.get("changed", 1) == 0


class _BackwardReach(PregelComputation):
    """reached(v) = v is a color root, or any same-class successor reached.

    Runs over the REVERSE projection of the same-color live edges, so a
    scatter hop follows an original edge backwards.
    """

    reducer = "or"

    def __init__(self, colors: np.ndarray):
        self.colors = colors

    def init_state(self, block: dict) -> dict:
        ids = np.arange(block["start"], block["end"], dtype=np.int64)
        reached = self.colors[block["start"] : block["end"]] == ids
        return {"reached": reached.astype(np.uint64), "new": reached.copy()}

    def message_values(self, state, block):
        return state["reached"], state["new"]

    def apply_messages(self, state, acc, received, block):
        got = (acc & np.uint64(1)).astype(bool)
        new = got & (state["reached"] == 0)
        state["reached"] = state["reached"] | new.astype(np.uint64)
        state["new"] = new
        return {"changed": int(new.sum())}

    def is_converged(self, stats):
        return stats.get("init") is None and stats.get("changed", 1) == 0


def scc(
    encoded_edges: rd.Dataset,
    node_count: int,
    idmap=None,
    max_rounds: int = 100,
    mode: str = "auto",
    num_parts: int = 64,
    async_local: bool = False,
) -> pd.DataFrame:
    """Exact SCC ids (min member id). Returns (node, component).

    ``async_local=True`` (broadcast mode): both FW-BW fixpoints run in
    the async-messenger mode (partition-local relaxation before each
    global shuffle) — identical components (the min-id coloring and
    reach fixpoints are schedule-independent), fewer supersteps per
    outer round on long-diameter graphs.

    ``mode="broadcast"`` (default below 5M nodes): per outer FW-BW round
    the unassigned mask and the gathered color vector are O(V) driver
    arrays broadcast once — fastest while V fits a worker heap, and the
    outer round count is small (the giant SCC peels first).
    ``mode="distributed"`` (auto above the cutoff): assignment, colors
    and reach state live in hash-partitioned Datasets; every fixpoint
    step is a join + aggregate over the live edge table and the driver
    sees only row counts. Exact SCC membership is unique, so both modes
    return identical tables (parity-tested)."""
    if mode == "auto":
        mode = (
            "broadcast" if node_count <= _DISTRIBUTED_NODE_CUTOFF else "distributed"
        )
    if mode == "distributed":
        return _scc_distributed(
            encoded_edges, node_count, idmap, max_rounds, num_parts=num_parts
        )
    num_partitions = min(8, max(1, node_count // 2))
    live = hash_distinct(
        encoded_edges.select_columns(["src", "dst"]), ["src", "dst"]
    ).materialize()
    assigned = np.full(node_count, -1, dtype=np.int64)
    root_dir = tempfile.mkdtemp(prefix="gdsr-scc-", dir="/tmp")

    for rnd in range(max_rounds):
        unassigned = assigned < 0
        if not unassigned.any():
            break
        uref = ray.put(unassigned)

        def live_filter(t: pa.Table) -> pa.Table:
            un = ray.get(uref)
            s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
            d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
            keep = un[s] & un[d]
            s, d = s[keep], d[keep]
            return pa.table(
                {"src": pa.array(s), "dst": pa.array(d),
                 "weight": pa.array(np.ones(len(s), dtype=np.float64))}
            )

        live = live.map_batches(live_filter, batch_format="pyarrow").materialize()
        n_live = live.count()

        # nodes with no live edge are singleton SCCs — peel immediately
        touched = np.zeros(node_count, dtype=bool)
        if n_live:
            def touch_partial(t: pa.Table) -> pa.Table:
                nodes = np.unique(
                    np.concatenate(
                        [
                            t["src"].to_numpy(zero_copy_only=False),
                            t["dst"].to_numpy(zero_copy_only=False),
                        ]
                    )
                )
                return pa.table({"node": pa.array(nodes.astype(np.int64))})

            tdf = hash_distinct(
                live.map_batches(touch_partial, batch_format="pyarrow"), ["node"]
            ).to_pandas()
            if len(tdf):
                touched[tdf["node"].to_numpy(dtype=np.int64)] = True
        solo = unassigned & ~touched
        assigned[solo] = np.flatnonzero(solo)
        if n_live == 0:
            continue

        # forward min-id coloring to fixpoint (BSP)
        gf = GraphStore.project(
            live, os.path.join(root_dir, f"f{rnd}"), node_count=node_count,
            num_partitions=num_partitions, directed=True,
        )
        comp_f = _MinForward(unassigned.copy())
        comp_f.async_local = bool(async_local)
        engine = Pregel(gf, comp_f)
        refs = engine.run(max_iterations=node_count + 2)
        colors = engine.gather(refs, "color")
        colors = np.where(unassigned & touched, colors, _I64_MAX)

        # backward reachability within color classes, on the reverse
        # projection of the same-class edge subset (BSP, or-reducer)
        cref = ray.put(colors)

        def rev_same_class(t: pa.Table) -> pa.Table:
            col = ray.get(cref)
            s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
            d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
            keep = col[s] == col[d]
            s, d = s[keep], d[keep]
            return pa.table(
                {"src": pa.array(d), "dst": pa.array(s),
                 "weight": pa.array(np.ones(len(s), dtype=np.float64))}
            )

        rev = live.map_batches(rev_same_class, batch_format="pyarrow")
        gr = GraphStore.project(
            rev, os.path.join(root_dir, f"b{rnd}"), node_count=node_count,
            num_partitions=num_partitions, directed=True,
        )
        comp_b = _BackwardReach(colors.copy())
        comp_b.async_local = bool(async_local)
        comp_b.active_state_key = "new"
        engine_b = Pregel(gr, comp_b)
        refs_b = engine_b.run(max_iterations=node_count + 2)
        reached = engine_b.gather(refs_b, "reached").astype(bool)

        members = unassigned & reached & (colors < _I64_MAX)
        assigned[members] = colors[members]

    node = idmap.keys if idmap is not None else np.arange(node_count, dtype=np.int64)
    comp = assigned
    if idmap is not None:
        comp = idmap.to_keys(assigned)
    return pd.DataFrame({"node": node, "component": comp})


def _scc_distributed(
    encoded_edges: rd.Dataset,
    node_count: int,
    idmap=None,
    max_rounds: int = 100,
    num_parts: int = 64,
    return_ds: bool = False,
):
    """FW-BW coloring with Dataset-held state (see ``scc`` docstring).

    Per outer round the unassigned set, the color map and the backward
    reach set are hash-partitioned ``(node, ...)`` Datasets; each forward
    min-propagation step fuses the edge relaxation (``live ⋈ colors``),
    a pointer-doubling shortcut (``colors ⋈ colors`` on ``color = node``
    — sound because ``color(v)`` reaches ``v``, so anything reaching
    ``color(v)`` reaches ``v``; it collapses convergence from O(diameter)
    to O(log diameter) Dataset rounds) and the min-merge into ONE
    streaming execution per iteration. Each backward step fuses the
    frontier hop with the reached-set anti-join the same way. The driver
    sees only changed-row counts — never an O(V) array or an O(E) table.
    Output assembly (the returned ``(node, component)`` DataFrame) is the
    function's O(V) boundary, same as every other mode."""
    edge_schema = pa.schema([("src", pa.int64()), ("dst", pa.int64())])
    node_schema = pa.schema([("node", pa.int64())])
    color_schema = pa.schema([("node", pa.int64()), ("color", pa.int64())])

    def _bounded(ds: rd.Dataset) -> rd.Dataset:
        # the fixpoint loops union several colors-derived branches per
        # iteration; see pipelines.agg.materialize_bounded
        return materialize_bounded(ds, num_parts)

    def _nodes_i64(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["node"].cast(pa.int64())})

    def _anti(a: rd.Dataset, b: rd.Dataset) -> rd.Dataset:
        """Rows of ``a`` whose node does not appear in ``b`` (both
        single-column ``node`` Datasets, a's nodes distinct)."""

        def flag(v: int):
            def f(t: pa.Table) -> pa.Table:
                return pa.table(
                    {
                        "node": t["node"].cast(pa.int64()),
                        "f": pa.array(np.full(len(t), v, dtype=np.int64)),
                    }
                )

            return f

        u = a.map_batches(flag(0), batch_format="pyarrow").union(
            b.map_batches(flag(1), batch_format="pyarrow")
        )
        mx = hash_aggregate(u, ["node"], "f", op="max", num_parts=num_parts)
        return mx.filter(expr="f == 0").map_batches(
            _nodes_i64, batch_format="pyarrow"
        )

    def _slim(t: pa.Table) -> pa.Table:
        return pa.table(
            {"src": t["src"].cast(pa.int64()), "dst": t["dst"].cast(pa.int64())}
        )

    live = (
        hash_distinct(
            encoded_edges.select_columns(["src", "dst"]),
            ["src", "dst"],
            num_parts=num_parts,
        )
        .map_batches(_slim, batch_format="pyarrow")
        .materialize()
    )
    unassigned = (
        rd.range(node_count, override_num_blocks=num_parts)
        .map_batches(
            lambda t: pa.table({"node": t["id"].cast(pa.int64())}),
            batch_format="pyarrow",
        )
        .materialize()
    )
    # member assignments accumulate as (node, component) DATASETS — the
    # O(V) result stays in the object store; the DataFrame mode gathers
    # once at the end (the function's documented O(V) boundary) and the
    # return_ds mode never does
    assigned_parts: list[rd.Dataset] = []

    import os as _os
    _dbg = bool(_os.environ.get("GDSR_SCC_DEBUG"))
    for _rnd in range(max_rounds):
        if _dbg:
            print(f"[scc-dist] round {_rnd} unassigned={unassigned.count()}", flush=True)
        if unassigned.count() == 0:
            break
        # touched = distinct endpoints of the live edge table
        def endpoints(t: pa.Table) -> pa.Table:
            nodes = np.unique(
                np.concatenate(
                    [
                        t["src"].to_numpy(zero_copy_only=False),
                        t["dst"].to_numpy(zero_copy_only=False),
                    ]
                )
            )
            return pa.table({"node": pa.array(nodes.astype(np.int64))})

        touched = _bounded(
            hash_distinct(
                live.map_batches(endpoints, batch_format="pyarrow"),
                ["node"],
                num_parts=num_parts,
            )
        )

        # nodes with no live edge are singleton SCCs — peel immediately
        solo = _bounded(_anti(unassigned, touched))
        if solo.count():
            assigned_parts.append(
                solo.map_batches(
                    lambda t: pa.table(
                        {
                            "node": t["node"].cast(pa.int64()),
                            "component": t["node"].cast(pa.int64()),
                        }
                    ),
                    batch_format="pyarrow",
                ).materialize()
            )
        if live.count() == 0:
            break
        unassigned = touched  # remaining unassigned == touched by construction

        # ---- forward min-id coloring to fixpoint --------------------
        # colors keeps a trailing "changed" column between iterations
        # (ignored by every schema-driven consumer) so convergence needs
        # no extra projection pass.
        colors = _bounded(
            unassigned.map_batches(
                lambda t: pa.table(
                    {"node": t["node"].cast(pa.int64()), "color": t["node"].cast(pa.int64())}
                ),
                batch_format="pyarrow",
            )
        )

        def tag_node(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["__part"] = (
                pd.util.hash_array(df["node"].to_numpy()) % num_parts
            ).astype(np.int64)
            return df

        def flag_old(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "node": t["node"].cast(pa.int64()),
                    "color": t["color"].cast(pa.int64()),
                    "is_new": pa.array(np.zeros(len(t), dtype=np.int8)),
                }
            )

        def msgs_to_inc(t: pa.Table) -> pa.Table:
            # raw per-edge messages — min-combined in merge_min, no
            # separate pre-aggregate shuffle
            return pa.table(
                {
                    "node": t["dst"].cast(pa.int64()),
                    "color": t["color"].cast(pa.int64()),
                    "is_new": pa.array(np.ones(len(t), dtype=np.int8)),
                }
            )

        def shortcut_to_inc(t: pa.Table) -> pa.Table:
            # (node, color, c2=color(color)) → candidate color c2 for node
            return pa.table(
                {
                    "node": t["node"].cast(pa.int64()),
                    "color": t["c2"].cast(pa.int64()),
                    "is_new": pa.array(np.ones(len(t), dtype=np.int8)),
                }
            )

        def rename_c2(t: pa.Table) -> pa.Table:
            return pa.table(
                {"node": t["node"].cast(pa.int64()), "c2": t["color"].cast(pa.int64())}
            )

        c2_schema = pa.schema([("node", pa.int64()), ("c2", pa.int64())])

        def merge_min(g: pd.DataFrame) -> pd.DataFrame:
            new = g.groupby("node", sort=False)["color"].min()
            old = g.loc[g["is_new"] == 0].set_index("node")["color"]
            out = new.reset_index()
            out["changed"] = (
                new.to_numpy() < old.reindex(new.index).to_numpy()
            ).astype(np.int64)
            return out

        # pointer doubling ⇒ O(log diameter) iterations; 96 covers any
        # int64-id graph with a wide safety margin, and the changed==0
        # break fires first in practice.
        for _it in range(96):
            msgs = hash_join(
                live,
                colors,
                on=["src"],
                right_on=["node"],
                left_schema=edge_schema,
                right_schema=color_schema,
                num_parts=num_parts,
            ).map_batches(msgs_to_inc, batch_format="pyarrow")
            shortcut = hash_join(
                colors,
                colors.map_batches(rename_c2, batch_format="pyarrow"),
                on=["color"],
                right_on=["node"],
                left_schema=color_schema,
                right_schema=c2_schema,
                num_parts=num_parts,
            ).map_batches(shortcut_to_inc, batch_format="pyarrow")
            merged = (
                colors.map_batches(flag_old, batch_format="pyarrow")
                .union(msgs)
                .union(shortcut)
            )
            colors = _bounded(
                merged.map_batches(tag_node, batch_format="pandas")
                .groupby("__part")
                .map_groups(merge_min, batch_format="pandas")
            )
            chg = colors.sum("changed")
            if _dbg:
                print(f"[scc-dist]  fwd it={_it} changed={chg}", flush=True)
            if not chg:
                break

        # ---- backward reachability within color classes -------------
        colors_src = colors.map_batches(
            lambda t: pa.table(
                {"node": t["node"].cast(pa.int64()), "cs": t["color"].cast(pa.int64())}
            ),
            batch_format="pyarrow",
        )
        colors_dst = colors.map_batches(
            lambda t: pa.table(
                {"node": t["node"].cast(pa.int64()), "cd": t["color"].cast(pa.int64())}
            ),
            batch_format="pyarrow",
        )
        cs_schema = pa.schema([("node", pa.int64()), ("cs", pa.int64())])
        cd_schema = pa.schema([("node", pa.int64()), ("cd", pa.int64())])
        j = hash_join(
            live, colors_src, on=["src"], right_on=["node"],
            left_schema=edge_schema, right_schema=cs_schema, num_parts=num_parts,
        )
        j_schema = pa.schema([("src", pa.int64()), ("dst", pa.int64()), ("cs", pa.int64())])
        j2 = hash_join(
            j, colors_dst, on=["dst"], right_on=["node"],
            left_schema=j_schema, right_schema=cd_schema, num_parts=num_parts,
        )

        def rev_same(t: pa.Table) -> pa.Table:
            cs = t["cs"].to_numpy(zero_copy_only=False)
            cd = t["cd"].to_numpy(zero_copy_only=False)
            keep = cs == cd
            s = t["src"].to_numpy(zero_copy_only=False)[keep]
            d = t["dst"].to_numpy(zero_copy_only=False)[keep]
            # reversed: propagate reach from dst back to src
            return pa.table(
                {"src": pa.array(d.astype(np.int64)), "dst": pa.array(s.astype(np.int64))}
            )

        if _dbg:
            print("[scc-dist]  building rev...", flush=True)
        rev = _bounded(j2.map_batches(rev_same, batch_format="pyarrow"))
        if _dbg:
            print(f"[scc-dist]  rev edges={rev.count()}", flush=True)
        roots = _bounded(
            colors.filter(expr="node == color").map_batches(
                _nodes_i64, batch_format="pyarrow"
            )
        )
        if _dbg:
            print(f"[scc-dist]  roots={roots.count()}", flush=True)
        reached = roots  # grows as a lazy union of materialized deltas
        frontier = roots
        for _it in range(node_count + 2):
            hop = hash_join(
                rev, frontier, on=["src"], right_on=["node"],
                left_schema=edge_schema, right_schema=node_schema,
                num_parts=num_parts,
            ).map_batches(
                lambda t: pa.table({"node": t["dst"].cast(pa.int64())}),
                batch_format="pyarrow",
            )
            # one fused execution: hop ∪ reached → max-flag anti-join
            # (also dedupes hop's candidate nodes)
            new = _bounded(_anti(hop, reached))
            if _dbg:
                print(f"[scc-dist]  bwd it={_it} new={new.count()}", flush=True)
            if new.count() == 0:
                break
            reached = reached.union(new)
            frontier = new

        # members: reached nodes, component = color (root = min member id)
        members = hash_join(
            reached, colors, on=["node"],
            left_schema=node_schema, right_schema=color_schema,
            num_parts=num_parts,
        ).map_batches(
            lambda t: pa.table(
                {
                    "node": t["node"].cast(pa.int64()),
                    "component": t["color"].cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        ).materialize()
        if members.count():
            assigned_parts.append(members)

        # peel: drop reached nodes and their incident edges
        unassigned = _bounded(_anti(unassigned, reached))
        ua_nodes = unassigned
        live = hash_join(
            live, ua_nodes, on=["src"], right_on=["node"],
            left_schema=edge_schema, right_schema=node_schema, num_parts=num_parts,
        )
        live = hash_join(
            live, ua_nodes, on=["dst"], right_on=["node"],
            left_schema=edge_schema, right_schema=node_schema, num_parts=num_parts,
        ).materialize()

    if return_ds:
        if not assigned_parts:
            return rd.from_arrow(
                pa.table(
                    {
                        "node": pa.array([], pa.int64()),
                        "component": pa.array([], pa.int64()),
                    }
                )
            )
        out = assigned_parts[0]
        for p in assigned_parts[1:]:
            out = out.union(p)
        return out
    assigned = np.full(node_count, -1, dtype=np.int64)
    if assigned_parts:
        adf = pd.concat(
            [p.to_pandas() for p in assigned_parts], ignore_index=True
        )
        assigned[adf["node"].to_numpy(dtype=np.int64)] = adf["component"].to_numpy(
            dtype=np.int64
        )
    node = idmap.keys if idmap is not None else np.arange(node_count, dtype=np.int64)
    comp = assigned
    if idmap is not None:
        comp = idmap.to_keys(assigned)
    return pd.DataFrame({"node": node, "component": comp})


def scc_ds(
    encoded_edges: rd.Dataset,
    node_count: int,
    max_rounds: int = 100,
    num_parts: int = 64,
) -> rd.Dataset:
    """Dataset-returning SCC (the 10^10-node result contract): the
    distributed FW-BW rounds accumulate per-round member Datasets and
    the (node, component) union is returned WITHOUT the driver gather
    that closes :func:`scc` — the result never lands on the driver.
    Dense ids; rows cover every node assigned within ``max_rounds``."""
    return _scc_distributed(
        encoded_edges, node_count, idmap=None, max_rounds=max_rounds,
        num_parts=num_parts, return_ds=True,
    )

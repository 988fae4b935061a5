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

from graph_data_science_ray.pipelines.agg import hash_distinct
from graph_data_science_ray.state.graph import GraphStore
from graph_data_science_ray.state.pregel import Pregel, PregelComputation

_I64_MAX = np.iinfo(np.int64).max


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


def scc(encoded_edges: rd.Dataset, node_count: int, idmap=None, max_rounds: int = 100) -> pd.DataFrame:
    """Exact SCC ids (min member id). Returns (node, component)."""
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
        engine = Pregel(gf, _MinForward(unassigned.copy()))
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
        engine_b = Pregel(gr, _BackwardReach(colors.copy()))
        refs_b = engine_b.run(max_iterations=node_count + 2)
        reached = engine_b.gather(refs_b, "reached").astype(bool)

        members = unassigned & reached & (colors < _I64_MAX)
        assigned[members] = colors[members]

    node = idmap.keys if idmap is not None else np.arange(node_count, dtype=np.int64)
    comp = assigned
    if idmap is not None:
        comp = idmap.to_keys(assigned)
    return pd.DataFrame({"node": node, "component": comp})

"""K-core: iterative peeling over the undirected edge table.

Reference: algo/src/main/java/org/neo4j/gds/kcore/KCoreDecomposition.java:40.
Each round removes nodes whose alive-neighbor count is below k
("repeat: degree filter + edge semi-join", SURVEY.md §2.5); the k-core is
the fixpoint. ``rounds`` pins the exact number of synchronous rounds so
the SQL oracle (same fixed round count) matches bit-for-bit; past the
fixpoint rounds are no-ops.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from graph_data_science_ray.pipelines.agg import hash_aggregate


def k_core(
    sym_edges: rd.Dataset,
    k: int,
    node_count: int,
    idmap=None,
    rounds: int | None = None,
) -> pd.DataFrame:
    """Nodes of the k-core. Returns ``(node, in_core)`` over ALL nodes.

    ``sym_edges``: symmetrized encoded edge Dataset (distinct neighbor
    pairs in both directions).
    """
    alive = np.ones(node_count, dtype=bool)
    max_rounds = rounds if rounds is not None else node_count + 1
    for _ in range(max_rounds):
        alive_ref = ray.put(alive)

        def partial_deg(t: pa.Table, *, aref=alive_ref) -> pa.Table:
            a = ray.get(aref)
            src = t["src"].to_numpy(zero_copy_only=False)
            dst = t["dst"].to_numpy(zero_copy_only=False)
            keep = a[src] & a[dst]
            counts = np.bincount(src[keep], minlength=len(a))
            nz = np.flatnonzero(counts)
            return pa.table(
                {"node": nz.astype(np.int64), "partial": counts[nz].astype(np.int64)}
            )

        deg_df = hash_aggregate(
            sym_edges.map_batches(partial_deg, batch_format="pyarrow"),
            ["node"], "partial", op="sum", out_col="deg",
        ).to_pandas()
        deg = np.zeros(node_count, dtype=np.int64)
        if len(deg_df):
            deg[deg_df["node"].to_numpy(dtype=np.int64)] = deg_df["deg"].to_numpy(
                dtype=np.int64
            )
        new_alive = alive & (deg >= k)
        changed = (new_alive != alive).any()
        alive = new_alive
        if rounds is None and not changed:
            break
    node = idmap.keys if idmap is not None else np.arange(node_count, dtype=np.int64)
    return pd.DataFrame({"node": node, "in_core": alive})

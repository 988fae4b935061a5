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


_DISTRIBUTED_NODE_CUTOFF = 5_000_000


def k_core(
    sym_edges: rd.Dataset,
    k: int,
    node_count: int,
    idmap=None,
    rounds: int | None = None,
    mode: str = "auto",
    num_parts: int = 64,
) -> pd.DataFrame:
    """Nodes of the k-core. Returns ``(node, in_core)`` over ALL nodes.

    ``sym_edges``: symmetrized encoded edge Dataset (distinct neighbor
    pairs in both directions).

    ``mode="broadcast"`` (default below 5M nodes): the alive mask is a
    V-bool ``ray.put`` per peel round — fastest while V fits a worker
    heap. ``mode="distributed"`` (auto above the cutoff): the alive set
    stays a hash-partitioned Dataset and each round SEMI-JOINS the edge
    table against it (edges with a dead endpoint drop out, degrees come
    from a hash-aggregate over the survivors) — no O(V) driver array or
    broadcast per round; the driver sees only row counts. Identical
    results (parity-tested); rounds are synchronous in both.
    """
    if mode == "auto":
        mode = "broadcast" if node_count <= _DISTRIBUTED_NODE_CUTOFF else "distributed"
    if mode == "distributed":
        return _k_core_distributed(
            sym_edges, k, node_count, idmap, rounds, num_parts=num_parts
        )
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
            num_parts=num_parts,
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


def _k_core_distributed(
    sym_edges: rd.Dataset,
    k: int,
    node_count: int,
    idmap=None,
    rounds: int | None = None,
    num_parts: int = 64,
) -> pd.DataFrame:
    """Peeling with Dataset-held alive state (see ``k_core`` docstring).

    Each synchronous round: degree = hash-aggregate over the surviving
    edge table; alive = nodes with degree >= k; edges semi-join against
    alive on BOTH endpoints. Equivalent to the broadcast mask because an
    edge is counted iff both endpoints were alive at round start."""
    from graph_data_science_ray.pipelines.agg import hash_join, materialize_bounded

    edge_schema = pa.schema([("src", pa.int64()), ("dst", pa.int64())])
    alive_schema = pa.schema([("node", pa.int64())])

    def slim(t: pa.Table) -> pa.Table:
        return pa.table(
            {"src": t["src"].cast(pa.int64()), "dst": t["dst"].cast(pa.int64())}
        )

    node = idmap.keys if idmap is not None else np.arange(node_count, dtype=np.int64)
    if k <= 0:
        return pd.DataFrame({"node": node, "in_core": np.ones(node_count, dtype=bool)})

    edges = sym_edges.map_batches(slim, batch_format="pyarrow").materialize()
    n_edges = edges.count()
    alive = None
    max_rounds = rounds if rounds is not None else node_count + 1
    for _ in range(max_rounds):
        def count_src(t: pa.Table) -> pa.Table:
            src = t["src"].to_numpy(zero_copy_only=False)
            nz, cnt = np.unique(src, return_counts=True)
            return pa.table(
                {"node": nz.astype(np.int64), "partial": cnt.astype(np.int64)}
            )

        deg = hash_aggregate(
            edges.map_batches(count_src, batch_format="pyarrow"),
            ["node"], "partial", op="sum", out_col="deg",
            num_parts=num_parts,
        )
        alive = deg.filter(expr=f"deg >= {k}").map_batches(
            lambda t: pa.table({"node": t["node"].cast(pa.int64())}),
            batch_format="pyarrow",
        ).materialize()
        j = hash_join(
            edges, alive, on=["src"], right_on=["node"],
            left_schema=edge_schema, right_schema=alive_schema,
            num_parts=num_parts,
        )
        # bounded materialize: hash_join is internally a union, so the
        # loop-carried edge table otherwise grows ~3x blocks per round
        edges = materialize_bounded(
            hash_join(
                j, alive, on=["dst"], right_on=["node"],
                left_schema=edge_schema, right_schema=alive_schema,
                num_parts=num_parts,
            ),
            num_parts,
        )
        new_count = edges.count()
        if rounds is None and new_count == n_edges:
            break
        n_edges = new_count

    # output = the LAST alive set (nodes whose degree over the surviving
    # edges met k), which equals the broadcast mask at the same round
    # count — distinct edge endpoints would lag it by one round mid-peel
    in_core = np.zeros(node_count, dtype=bool)
    if alive is not None:
        adf = alive.to_pandas()
        if len(adf):
            in_core[adf["node"].to_numpy(dtype=np.int64)] = True
    return pd.DataFrame({"node": node, "in_core": in_core})

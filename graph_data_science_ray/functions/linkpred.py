"""Topological link-prediction functions — pair-scoring operators.

Reference: alpha/alpha-proc/src/main/java/org/neo4j/gds/linkprediction/LinkPredictionFunc.java:39-121
(gds.alpha.linkprediction.{adamicAdar, resourceAllocation,
commonNeighbors, preferentialAttachment, totalNeighbors, sameCommunity})
with NeighborsFinder.java:42-69 semantics: neighborhoods exclude the node
itself, common = N(a) ∩ N(b), total = |N(a) ∪ N(b)|, default direction
BOTH (the undirected view — our symmetrized projected graph).

The reference scores ONE pair per Cypher-function call; the engine-shaped
re-expression scores a whole PAIRS DATASET in one distributed pass:

  pairs(node_a, node_b)
    ⋈ adjacency on node_a          → candidate shared neighbors
    ⋈ adjacency on (node_b, nbr)   → actual shared neighbors
    → per-neighbor integer terms   → hash-partitioned multi-sum
    union zero-rows for every pair → no pair lost when |common| = 0

Both joins are hash-partitioned (`pipelines.agg.hash_join`), the term
aggregation is a single shuffle over (node_a, node_b), and the only
broadcast is the O(V) per-node degree array (one `ray.put`, read by every
task) — at 10^12 edges nothing pair-shaped ever lands on the driver.

Float discipline (driver-oracle contract): Adamic-Adar terms are
quantized per NEIGHBOR before summation — ``1e12 // floor(ln(deg)*1e6)``
— so the pair score is an order-independent integer sum that DuckDB
reproduces bit-exactly; resource-allocation terms are the pure-integer
``1_000_000 // deg``. A common neighbor is adjacent to both endpoints of
a (node_a ≠ node_b) pair, hence deg ≥ 2 and ln(deg) > 0.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from graph_data_science_ray.pipelines.agg import _stable_row_hash, hash_join

_AA_SCALE = 1_000_000_000_000  # 1e12: ppm of 1e6-quantized ln
_RA_SCALE = 1_000_000


def _aa_terms(deg: np.ndarray) -> np.ndarray:
    """Adamic-Adar per-neighbor integer term: 1e12 // floor(ln(deg)*1e6)."""
    lnq = np.floor(np.log(deg.astype(np.float64)) * 1e6).astype(np.int64)
    return _AA_SCALE // lnq


def link_prediction_scores(
    sym_edges: rd.Dataset,
    pairs: rd.Dataset,
    node_count: int,
    community: np.ndarray | None = None,
    num_parts: int = 32,
    pairs_schema=None,
) -> rd.Dataset:
    """Score every (node_a, node_b) pair with the six reference
    link-prediction functions over the undirected projected graph.

    Output columns (all int64): node_a, node_b, common_neighbors,
    preferential_attachment, total_neighbors, adamic_adar_ppm,
    resource_allocation_ppm [, same_community when ``community`` given].

    ``sym_edges``: symmetrized distinct (src, dst[, weight]) Dataset —
    degree here is the projected undirected degree (the reference counts
    BOTH-direction relationships; parallel edges are pre-aggregated by
    projection, SURVEY.md §1.2).
    ``pairs``: Dataset with int64 ``node_a``/``node_b`` dense ids,
    node_a != node_b.
    ``community``: optional dense per-node label array for sameCommunity.
    """
    import pyarrow as pa

    from graph_data_science_ray.functions.degree import degree_centrality

    deg_df = degree_centrality(sym_edges, node_count=node_count, weighted=False)
    deg = deg_df["degree"].to_numpy(dtype=np.int64)
    deg_ref = ray.put(deg)
    com_ref = ray.put(community) if community is not None else None

    adj_schema = pa.schema([("k", pa.int64()), ("nbr", pa.int64())])
    if pairs_schema is None:
        pairs_schema = pa.schema([("node_a", pa.int64()), ("node_b", pa.int64())])

    def adj(t: pa.Table) -> pa.Table:
        return pa.table(
            {"k": t["src"].cast(pa.int64()), "nbr": t["dst"].cast(pa.int64())}
        )

    adjacency = sym_edges.map_batches(adj, batch_format="pyarrow")

    # shared-neighbor candidates: pairs ⋈ N(node_a), then keep nbr ∈ N(node_b)
    cand = hash_join(
        pairs,
        adjacency,
        on=["node_a"],
        right_on=["k"],
        num_parts=num_parts,
        left_schema=pairs_schema,
        right_schema=adj_schema,
    )
    cand_schema = pa.schema(
        [("node_a", pa.int64()), ("node_b", pa.int64()), ("nbr", pa.int64())]
    )
    common = hash_join(
        cand,
        adjacency,
        on=["node_b", "nbr"],
        right_on=["k", "nbr"],
        num_parts=num_parts,
        left_schema=cand_schema,
        right_schema=adj_schema,
    )

    def terms(df: pd.DataFrame, *, deg_arr) -> pd.DataFrame:
        deg_arr = ray.get(deg_arr)
        if not len(df) or "nbr" not in df.columns:
            return pd.DataFrame(
                {
                    "node_a": pd.Series([], dtype=np.int64),
                    "node_b": pd.Series([], dtype=np.int64),
                    "cn": pd.Series([], dtype=np.int64),
                    "aa": pd.Series([], dtype=np.int64),
                    "ra": pd.Series([], dtype=np.int64),
                }
            )
        d = deg_arr[df["nbr"].to_numpy(dtype=np.int64)]
        return pd.DataFrame(
            {
                "node_a": df["node_a"].to_numpy(dtype=np.int64),
                "node_b": df["node_b"].to_numpy(dtype=np.int64),
                "cn": np.ones(len(df), dtype=np.int64),
                "aa": _aa_terms(d),
                "ra": _RA_SCALE // d,
            }
        )

    def zeros(df: pd.DataFrame) -> pd.DataFrame:
        z = np.zeros(len(df), dtype=np.int64)
        return pd.DataFrame(
            {
                "node_a": df["node_a"].to_numpy(dtype=np.int64),
                "node_b": df["node_b"].to_numpy(dtype=np.int64),
                "cn": z,
                "aa": z,
                "ra": z,
            }
        )

    term_ds = common.map_batches(
        terms, batch_format="pandas", fn_kwargs={"deg_arr": deg_ref}
    ).union(pairs.map_batches(zeros, batch_format="pandas"))

    # multi-column hash-partitioned sum over (node_a, node_b)
    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__part"] = (
            _stable_row_hash(df, ["node_a", "node_b"]) % num_parts
        ).astype(np.int64)
        return df

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["node_a", "node_b"], sort=False)[["cn", "aa", "ra"]].sum()
        return agg.reset_index()

    sums = term_ds.map_batches(tag, batch_format="pandas").groupby(
        "__part"
    ).map_groups(combine, batch_format="pandas")

    def finish(df: pd.DataFrame, *, deg_arr, com_arr) -> pd.DataFrame:
        deg_arr = ray.get(deg_arr)
        com_arr = ray.get(com_arr) if com_arr is not None else None
        a = df["node_a"].to_numpy(dtype=np.int64)
        b = df["node_b"].to_numpy(dtype=np.int64)
        cn = df["cn"].to_numpy(dtype=np.int64)
        da, db = deg_arr[a], deg_arr[b]
        out = pd.DataFrame(
            {
                "node_a": a,
                "node_b": b,
                "common_neighbors": cn,
                "preferential_attachment": da * db,
                "total_neighbors": da + db - cn,
                "adamic_adar_ppm": df["aa"].to_numpy(dtype=np.int64),
                "resource_allocation_ppm": df["ra"].to_numpy(dtype=np.int64),
            }
        )
        if com_arr is not None:
            out["same_community"] = (com_arr[a] == com_arr[b]).astype(np.int64)
        return out

    return sums.map_batches(
        finish,
        batch_format="pandas",
        fn_kwargs={"deg_arr": deg_ref, "com_arr": com_ref},
    )

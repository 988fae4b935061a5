"""Degree centrality — pure Ray Data groupby over the edge table.

Reference: algo/src/main/java/org/neo4j/gds/degree/DegreeCentrality.java:42 —
per-node out-degree, optionally the sum of relationship weights. Nodes
without outgoing edges score 0 (they exist in the id space).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def degree_centrality(
    encoded_edges: rd.Dataset,
    idmap=None,
    node_count: int | None = None,
    weighted: bool = False,
    orientation: str = "natural",
) -> pd.DataFrame:
    """Degree per node over an encoded edge Dataset.

    ``orientation``: "natural" (out), "reverse" (in) — reference
    Orientation (graph-projection-api/src/main/java/org/neo4j/gds/Orientation.java:29-41).
    Map-side partial aggregation runs per batch before the groupby shuffle.
    """
    key = "src" if orientation == "natural" else "dst"

    def partial(t: pa.Table) -> pa.Table:
        if weighted:
            g = t.group_by([key]).aggregate([("weight", "sum")])
            return g.rename_columns(["node", "partial"])
        g = t.group_by([key]).aggregate([(key, "count")])
        return g.rename_columns(["node", "partial"])

    from graph_data_science_ray.pipelines.agg import hash_aggregate

    agg = hash_aggregate(
        encoded_edges.map_batches(partial, batch_format="pyarrow"),
        ["node"],
        "partial",
        op="sum",
        out_col="degree",
    )
    df = agg.to_pandas()
    if "node" not in df.columns:  # fully-empty edge set loses the schema
        df = pd.DataFrame({"node": pd.Series([], dtype=np.int64),
                           "degree": pd.Series([], dtype=np.float64)})
    n = node_count if node_count is not None else (len(idmap) if idmap is not None else None)
    if n is not None:
        dense = np.zeros(n, dtype=np.float64)
        dense[df["node"].to_numpy(dtype=np.int64)] = df["degree"].to_numpy(dtype=np.float64)
        out = pd.DataFrame({"node": np.arange(n, dtype=np.int64), "degree": dense})
    else:
        out = df.sort_values("node").reset_index(drop=True)
    if idmap is not None:
        out["node"] = idmap.to_keys(out["node"].to_numpy(dtype=np.int64))
    if not weighted:
        out["degree"] = out["degree"].astype(np.int64)
    return out


def local_degree_profile(
    sym_edges: rd.Dataset,
    idmap=None,
    node_count: int | None = None,
    num_parts: int = 64,
) -> pd.DataFrame:
    """Local Degree Profile node features over the symmetrized edge table.

    LDP (Cai & Wang, "A simple yet effective baseline for non-attributed
    graph classification", 2018) summarizes each node's 1-hop structure:
    its degree plus min / max / sum / sum-of-squares of its neighbors'
    degrees — the standard cheap structural feature for graphs without
    node attributes (mean and std are ``nbr_sum/degree`` and the usual
    moment identity, left to the consumer so every emitted value stays
    an exact int64).

    Two hash-partitioned passes, both with map-side partial aggregation:
    degree per node, then per-edge neighbor-degree attach (hash join on
    ``dst``) folded into per-source (n, min, max, sum, sumsq) partials
    before the single V-cardinality combine. Isolated nodes (when
    ``node_count``/``idmap`` is given) emit all-zero features.
    """
    import pyarrow as pa

    from graph_data_science_ray.pipelines.agg import hash_aggregate, hash_join

    def partial_deg(t: pa.Table) -> pa.Table:
        g = t.group_by(["src"]).aggregate([("src", "count")])
        return g.rename_columns(["node", "partial"])

    deg_ds = hash_aggregate(
        sym_edges.map_batches(partial_deg, batch_format="pyarrow"),
        ["node"],
        "partial",
        op="sum",
        out_col="degree",
        num_parts=num_parts,
    ).map_batches(lambda t: t, batch_format="pyarrow")

    edges = sym_edges.select_columns(["src", "dst"]).map_batches(
        lambda t: t, batch_format="pyarrow"
    )
    ids = pa.schema([("src", pa.int64()), ("dst", pa.int64())])
    dsch = pa.schema([("node", pa.int64()), ("degree", pa.int64())])
    j = hash_join(
        edges, deg_ds, on=["dst"], right_on=["node"],
        num_parts=num_parts, left_schema=ids, right_schema=dsch,
    )

    def partial_stats(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["degree"] = df["degree"].astype(np.int64)
        df["sq"] = df["degree"] * df["degree"]
        g = df.groupby("src", sort=False).agg(
            nbr_min=("degree", "min"),
            nbr_max=("degree", "max"),
            nbr_sum=("degree", "sum"),
            nbr_sumsq=("sq", "sum"),
        )
        return g.reset_index().rename(columns={"src": "node"})

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__part"] = (df["node"].to_numpy(dtype=np.int64) % num_parts)
        return df

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("node", sort=False).agg(
            nbr_min=("nbr_min", "min"),
            nbr_max=("nbr_max", "max"),
            nbr_sum=("nbr_sum", "sum"),
            nbr_sumsq=("nbr_sumsq", "sum"),
        )
        return out.reset_index()

    stats = (
        j.map_batches(partial_stats, batch_format="pandas")
        .map_batches(tag, batch_format="pandas")
        .groupby("__part")
        .map_groups(combine, batch_format="pandas")
    )
    sdf = stats.to_pandas()
    ddf = deg_ds.to_pandas()
    cols = ["nbr_min", "nbr_max", "nbr_sum", "nbr_sumsq"]
    if "node" not in sdf.columns:
        sdf = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in ["node"] + cols})
    if "node" not in ddf.columns:
        ddf = pd.DataFrame({"node": pd.Series([], dtype=np.int64),
                            "degree": pd.Series([], dtype=np.int64)})
    out = ddf.merge(sdf, on="node", how="outer")
    n = node_count if node_count is not None else (len(idmap) if idmap is not None else None)
    if n is not None:
        base = pd.DataFrame({"node": np.arange(n, dtype=np.int64)})
        out = base.merge(out, on="node", how="left")
    for c in ["degree"] + cols:
        out[c] = out[c].fillna(0).astype(np.int64)
    out = out.sort_values("node").reset_index(drop=True)
    if idmap is not None:
        out["node"] = idmap.to_keys(out["node"].to_numpy(dtype=np.int64))
    return out

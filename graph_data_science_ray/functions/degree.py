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

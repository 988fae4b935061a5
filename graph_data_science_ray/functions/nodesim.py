"""Node Similarity (Jaccard / Overlap) — inverted-index pair generation.

Reference: similarity/src/main/java/org/neo4j/gds/similarity/nodesim/NodeSimilarity.java:54
— all-pairs similarity over shared neighborhoods with degree cutoffs and
similarity threshold. Distributed shape (SURVEY.md §2.5): group the edge
table by the shared neighbor (the inverted index), emit candidate pairs
per group, sum common-neighbor counts, join against per-node degrees.

Hub guard: a shared neighbor of degree d yields d*(d-1)/2 candidate
pairs; ``max_group_degree`` skips mega-hubs (quadratic blowup), the same
safety valve as the reference's degree cutoffs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from graph_data_science_ray.pipelines.agg import _stable_row_hash, hash_aggregate


def node_similarity(
    sym_edges: rd.Dataset,
    node_count: int,
    idmap=None,
    metric: str = "jaccard",
    min_similarity_ppm: int = 0,
    max_group_degree: int = 10_000,
) -> pd.DataFrame:
    """Pairwise neighborhood similarity in exact parts-per-million.

    Returns ``(node_a, node_b, sim_ppm)`` for pairs with at least one
    common neighbor, node_a < node_b, integer-exact ppm:
    jaccard = C / (dA + dB - C); overlap = C / min(dA, dB).
    """
    from graph_data_science_ray.functions.degree import degree_centrality

    deg_df = degree_centrality(sym_edges, node_count=node_count, weighted=False)
    deg = deg_df["degree"].to_numpy(dtype=np.int64)

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__part"] = (_stable_row_hash(df, ["dst"]) % 64).astype(np.int64)
        return df

    def pairs_in_group(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, grp in g.groupby("dst", sort=False):
            srcs = np.sort(grp["src"].to_numpy(dtype=np.int64))
            if len(srcs) < 2 or len(srcs) > max_group_degree:
                continue
            a, b = np.triu_indices(len(srcs), k=1)
            out_a.append(srcs[a])
            out_b.append(srcs[b])
        if not out_a:
            return pd.DataFrame(
                {
                    "node_a": pd.Series([], dtype=np.int64),
                    "node_b": pd.Series([], dtype=np.int64),
                    "partial": pd.Series([], dtype=np.int64),
                }
            )
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        df = pd.DataFrame({"node_a": a, "node_b": b})
        df = df.groupby(["node_a", "node_b"], sort=False).size().reset_index(name="partial")
        return df

    common = hash_aggregate(
        sym_edges.select_columns(["src", "dst"])
        .map_batches(tag, batch_format="pandas")
        .groupby("__part")
        .map_groups(pairs_in_group, batch_format="pandas"),
        ["node_a", "node_b"],
        "partial",
        op="sum",
        out_col="common",
    ).to_pandas()

    if not len(common):
        return pd.DataFrame(
            {"node_a": [], "node_b": [], "sim_ppm": pd.Series([], dtype=np.int64)}
        )
    a = common["node_a"].to_numpy(dtype=np.int64)
    b = common["node_b"].to_numpy(dtype=np.int64)
    c = common["common"].to_numpy(dtype=np.int64)
    if metric == "jaccard":
        denom = deg[a] + deg[b] - c
    elif metric == "overlap":
        denom = np.minimum(deg[a], deg[b])
    else:
        raise ValueError(f"unknown metric {metric!r}")
    ppm = (1_000_000 * c) // np.where(denom > 0, denom, 1)
    out = pd.DataFrame({"node_a": a, "node_b": b, "sim_ppm": ppm.astype(np.int64)})
    out = out[out["sim_ppm"] >= min_similarity_ppm]
    if idmap is not None:
        out["node_a"] = idmap.to_keys(out["node_a"].to_numpy(dtype=np.int64))
        out["node_b"] = idmap.to_keys(out["node_b"].to_numpy(dtype=np.int64))
    return out.sort_values(["node_a", "node_b"]).reset_index(drop=True)

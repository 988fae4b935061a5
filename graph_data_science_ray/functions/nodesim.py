"""Node Similarity (Jaccard / Overlap / Cosine) — inverted-index pairs.

Reference: similarity/src/main/java/org/neo4j/gds/similarity/nodesim/NodeSimilarity.java:54
— all-pairs similarity over shared neighborhoods with degree cutoffs and
similarity threshold; metrics JACCARD, OVERLAP and COSINE (cosine over
the relationship-weight vectors indexed by neighbor). Distributed shape
(SURVEY.md §2.5): group the edge table by the shared neighbor (the
inverted index), emit candidate pairs per group (weight products for
cosine), sum per pair, join against per-node degrees / norms.

Filtered variants (similarity/filterednodesim/): ``source_nodes`` /
``target_nodes`` restrict which nodes may appear as node_a / node_b
(applied symmetrically since pairs are unordered: a pair survives if one
endpoint is a permitted source and the other a permitted target).

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
    source_nodes=None,
    target_nodes=None,
) -> pd.DataFrame:
    """Pairwise neighborhood similarity in exact parts-per-million.

    Returns ``(node_a, node_b, sim_ppm)`` for pairs with at least one
    common neighbor, node_a < node_b:
    jaccard = C / (dA + dB - C); overlap = C / min(dA, dB)
    (integer-exact ppm); cosine = Σ w_a·w_b / (‖w_a‖·‖w_b‖) over the
    weight vectors (float ppm, floored).
    """
    from graph_data_science_ray.functions.degree import degree_centrality

    cosine = metric == "cosine"
    deg_df = degree_centrality(sym_edges, node_count=node_count, weighted=False)
    deg = deg_df["degree"].to_numpy(dtype=np.int64)
    if cosine:
        # per-node weight-vector norm: sqrt(Σ w²) via one aggregate
        def sq(t):
            import pyarrow as pa

            df = pd.DataFrame(
                {
                    "node": t["src"].to_numpy(zero_copy_only=False),
                    "w2": t["weight"].to_numpy(zero_copy_only=False) ** 2,
                }
            )
            g = df.groupby("node", sort=False)["w2"].sum().reset_index()
            return pa.Table.from_pandas(g, preserve_index=False)

        nd = hash_aggregate(
            sym_edges.map_batches(sq, batch_format="pyarrow"), ["node"], "w2", op="sum"
        ).to_pandas()
        norms = np.zeros(node_count, dtype=np.float64)
        if len(nd):
            norms[nd["node"].to_numpy(dtype=np.int64)] = np.sqrt(
                nd["w2"].to_numpy(dtype=np.float64)
            )

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__part"] = (_stable_row_hash(df, ["dst"]) % 64).astype(np.int64)
        return df

    def pairs_in_group(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_w = [], [], []
        for _, grp in g.groupby("dst", sort=False):
            order = np.argsort(grp["src"].to_numpy(dtype=np.int64), kind="stable")
            srcs = grp["src"].to_numpy(dtype=np.int64)[order]
            if len(srcs) < 2 or len(srcs) > max_group_degree:
                continue
            a, b = np.triu_indices(len(srcs), k=1)
            out_a.append(srcs[a])
            out_b.append(srcs[b])
            if cosine:
                w = grp["weight"].to_numpy(dtype=np.float64)[order]
                out_w.append(w[a] * w[b])
        if not out_a:
            return pd.DataFrame(
                {
                    "node_a": pd.Series([], dtype=np.int64),
                    "node_b": pd.Series([], dtype=np.int64),
                    "partial": pd.Series([], dtype=np.float64 if cosine else np.int64),
                }
            )
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        df = pd.DataFrame({"node_a": a, "node_b": b})
        if cosine:
            df["w"] = np.concatenate(out_w)
            df = df.groupby(["node_a", "node_b"], sort=False)["w"].sum().reset_index(
                name="partial"
            )
        else:
            df = df.groupby(["node_a", "node_b"], sort=False).size().reset_index(
                name="partial"
            )
        return df

    cols = ["src", "dst", "weight"] if cosine else ["src", "dst"]
    common = hash_aggregate(
        sym_edges.select_columns(cols)
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
    if cosine:
        num = common["common"].to_numpy(dtype=np.float64)
        denom = norms[a] * norms[b]
        # half-up rounding (not banker's) so an exact cosine of 1.0 maps
        # to 1_000_000 despite float roundoff in the norm product
        ppm = np.floor(
            1_000_000.0 * num / np.where(denom > 0, denom, 1.0) + 0.5
        ).astype(np.int64)
    else:
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
    if source_nodes is not None or target_nodes is not None:
        smask = np.zeros(node_count, dtype=bool)
        tmask = np.zeros(node_count, dtype=bool)
        if source_nodes is not None:
            smask[np.asarray(source_nodes, dtype=np.int64)] = True
        else:
            smask[:] = True
        if target_nodes is not None:
            tmask[np.asarray(target_nodes, dtype=np.int64)] = True
        else:
            tmask[:] = True
        aa = out["node_a"].to_numpy(dtype=np.int64)
        bb = out["node_b"].to_numpy(dtype=np.int64)
        keep = (smask[aa] & tmask[bb]) | (smask[bb] & tmask[aa])
        out = out[keep]
    if idmap is not None:
        out["node_a"] = idmap.to_keys(out["node_a"].to_numpy(dtype=np.int64))
        out["node_b"] = idmap.to_keys(out["node_b"].to_numpy(dtype=np.int64))
    return out.sort_values(["node_a", "node_b"]).reset_index(drop=True)

"""Node Similarity (Jaccard / Overlap / Cosine) — inverted-index pairs.

Reference: similarity/src/main/java/org/neo4j/gds/similarity/nodesim/NodeSimilarity.java:54
— all-pairs similarity over shared neighborhoods with degree cutoffs and
similarity threshold; metrics JACCARD, OVERLAP and COSINE (cosine over
the relationship-weight vectors indexed by neighbor); result bounded per
node by ``topK`` and globally by ``topN``
(similarity/nodesim/NodeSimilarityBaseConfig). Distributed shape
(SURVEY.md §2.5): group the edge table by the shared neighbor (the
inverted index), emit candidate pairs per group (weight products for
cosine), sum per pair, score against broadcast per-node degrees / norms
— the pair table stays a Dataset end to end; top-K runs per-node inside
a hash-partitioned ``map_groups`` and top-N is a distributed
``sort().limit()``, so the unbounded all-pairs table never lands on the
driver.

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
import pyarrow as pa
import ray
import ray.data as rd

from graph_data_science_ray.pipelines.agg import _stable_row_hash, hash_aggregate


def node_similarity_ds(
    sym_edges: rd.Dataset,
    node_count: int,
    metric: str = "jaccard",
    min_similarity_ppm: int = 0,
    max_group_degree: int = 10_000,
    source_nodes=None,
    target_nodes=None,
    top_k: int | None = None,
    top_n: int | None = None,
    num_parts: int = 64,
) -> rd.Dataset:
    """Pairwise neighborhood similarity as a DATASET of
    ``(node_a, node_b, sim_ppm)`` — exact parts-per-million.

    Without ``top_k`` the pairs are unordered (node_a < node_b):
    jaccard = C / (dA + dB - C); overlap = C / min(dA, dB)
    (integer-exact ppm); cosine = Σ w_a·w_b / (‖w_a‖·‖w_b‖) over the
    weight vectors (float ppm, half-up).

    With ``top_k`` the result is DIRECTED — every node keeps its K most
    similar others (sim desc, smaller other id on ties), the reference's
    per-node topK contract — so a pair may appear in both orientations.
    ``top_n`` additionally bounds the global result (applied after topK,
    as in the reference): sim desc, then (node_a, node_b) asc.
    """
    from graph_data_science_ray.functions.degree import degree_centrality

    cosine = metric == "cosine"
    if metric not in ("jaccard", "overlap", "cosine"):
        raise ValueError(f"unknown metric {metric!r}")
    deg_df = degree_centrality(sym_edges, node_count=node_count, weighted=False)
    deg = deg_df["degree"].to_numpy(dtype=np.int64)
    norms = None
    if cosine:
        # per-node weight-vector norm: sqrt(Σ w²) via one aggregate
        def sq(t: pa.Table) -> pa.Table:
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
        df["__part"] = (_stable_row_hash(df, ["dst"]) % num_parts).astype(np.int64)
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
    )

    dref = ray.put(deg)
    nref = ray.put(norms) if cosine else None
    smask = tmask = None
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
    sref = ray.put(smask) if smask is not None else None
    tref = ray.put(tmask) if tmask is not None else None

    def score(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "node_a": pa.array([], type=pa.int64()),
                "node_b": pa.array([], type=pa.int64()),
                "sim_ppm": pa.array([], type=pa.int64()),
            }
        )
        if t.num_rows == 0 or "node_a" not in t.schema.names:
            return empty
        dg = ray.get(dref)
        a = t["node_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["node_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        if cosine:
            nm = ray.get(nref)
            num = t["common"].to_numpy(zero_copy_only=False).astype(np.float64)
            denom = nm[a] * nm[b]
            # half-up rounding (not banker's) so an exact cosine of 1.0
            # maps to 1_000_000 despite float roundoff in the norm product
            ppm = np.floor(
                1_000_000.0 * num / np.where(denom > 0, denom, 1.0) + 0.5
            ).astype(np.int64)
        else:
            c = t["common"].to_numpy(zero_copy_only=False).astype(np.int64)
            if metric == "jaccard":
                denom = dg[a] + dg[b] - c
            else:  # overlap
                denom = np.minimum(dg[a], dg[b])
            ppm = (1_000_000 * c) // np.where(denom > 0, denom, 1)
        keep = ppm >= min_similarity_ppm
        if sref is not None:
            sm = ray.get(sref)
            tm = ray.get(tref)
            keep &= (sm[a] & tm[b]) | (sm[b] & tm[a])
        return pa.table(
            {
                "node_a": pa.array(a[keep]),
                "node_b": pa.array(b[keep]),
                "sim_ppm": pa.array(ppm[keep]),
            }
        )

    scored = common.map_batches(score, batch_format="pyarrow")

    if top_k is not None:
        k = int(top_k)

        def mirror(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "node_a" not in t.schema.names:
                return pa.table(
                    {
                        "node_a": pa.array([], type=pa.int64()),
                        "node_b": pa.array([], type=pa.int64()),
                        "sim_ppm": pa.array([], type=pa.int64()),
                        "__part": pa.array([], type=pa.int64()),
                    }
                )
            a = t["node_a"].to_numpy(zero_copy_only=False)
            b = t["node_b"].to_numpy(zero_copy_only=False)
            s = t["sim_ppm"].to_numpy(zero_copy_only=False)
            na = np.concatenate([a, b])
            nb = np.concatenate([b, a])
            ss = np.concatenate([s, s])
            return pa.table(
                {
                    "node_a": pa.array(na),
                    "node_b": pa.array(nb),
                    "sim_ppm": pa.array(ss),
                    "__part": pa.array((na % num_parts).astype(np.int64)),
                }
            )

        def head_k(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(
                ["node_a", "sim_ppm", "node_b"],
                ascending=[True, False, True],
                kind="mergesort",
            )
            out = g.groupby("node_a", sort=False).head(k)
            return out[["node_a", "node_b", "sim_ppm"]]

        scored = (
            scored.map_batches(mirror, batch_format="pyarrow")
            .groupby("__part")
            .map_groups(head_k, batch_format="pandas")
        )

    if top_n is not None:
        scored = scored.sort(
            ["sim_ppm", "node_a", "node_b"], descending=[True, False, False]
        ).limit(int(top_n))
    return scored


def node_similarity(
    sym_edges: rd.Dataset,
    node_count: int,
    idmap=None,
    metric: str = "jaccard",
    min_similarity_ppm: int = 0,
    max_group_degree: int = 10_000,
    source_nodes=None,
    target_nodes=None,
    top_k: int | None = None,
    top_n: int | None = None,
) -> pd.DataFrame:
    """DataFrame convenience wrapper over :func:`node_similarity_ds`.

    Collects the (bounded, when ``top_k``/``top_n`` is set) result to the
    driver; at scale pass ``top_k`` or consume ``node_similarity_ds``
    directly (write_parquet / iter_batches)."""
    ds = node_similarity_ds(
        sym_edges,
        node_count,
        metric=metric,
        min_similarity_ppm=min_similarity_ppm,
        max_group_degree=max_group_degree,
        source_nodes=source_nodes,
        target_nodes=target_nodes,
        top_k=top_k,
        top_n=top_n,
    )
    out = ds.to_pandas()
    if not len(out):
        return pd.DataFrame(
            {"node_a": [], "node_b": [], "sim_ppm": pd.Series([], dtype=np.int64)}
        )
    out = out[["node_a", "node_b", "sim_ppm"]].astype(
        {"node_a": np.int64, "node_b": np.int64, "sim_ppm": np.int64}
    )
    if idmap is not None:
        out["node_a"] = idmap.to_keys(out["node_a"].to_numpy(dtype=np.int64))
        out["node_b"] = idmap.to_keys(out["node_b"].to_numpy(dtype=np.int64))
    return out.sort_values(["node_a", "node_b"]).reset_index(drop=True)

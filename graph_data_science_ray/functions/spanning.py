"""Minimum spanning tree — Borůvka rounds (distributed-friendly Prim).

Reference: algo/src/main/java/org/neo4j/gds/spanningtree/Prim.java:42 —
the output contract is the spanning tree (weight) per connected
component. Borůvka preserves it with shuffle-native rounds (SURVEY.md
§2.5 "Borůvka via groupby-min"):

repeat O(log V) times: every component picks its minimum outgoing edge
(groupby-min with deterministic (weight, src, dst) tie-break), the picked
edges merge components (pointer-jumping on the driver-held component
map), and internal edges drop out.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from graph_data_science_ray.pipelines.agg import hash_aggregate


def minimum_spanning_forest(
    sym_edges: rd.Dataset, node_count: int, idmap=None
) -> tuple[pd.DataFrame, float]:
    """MST edges over the symmetrized weighted graph.

    Returns (DataFrame(src, dst, weight) of tree edges with src<dst,
    total_weight). Deterministic tie-breaks make the tree unique.
    """
    comp = np.arange(node_count, dtype=np.int64)
    chosen: list[tuple[int, int, float]] = []
    for _ in range(int(np.ceil(np.log2(max(node_count, 2)))) + 1):
        cref = ray.put(comp)

        def min_out(df: pd.DataFrame) -> pd.DataFrame:
            c = ray.get(cref)
            src = df["src"].to_numpy(dtype=np.int64)
            dst = df["dst"].to_numpy(dtype=np.int64)
            w = df["weight"].to_numpy(dtype=np.float64)
            keep = c[src] != c[dst]
            if not keep.any():
                return pd.DataFrame(
                    {"comp": pd.Series([], dtype=np.int64),
                     "src": pd.Series([], dtype=np.int64),
                     "dst": pd.Series([], dtype=np.int64),
                     "weight": pd.Series([], dtype=np.float64)}
                )
            src, dst, w = src[keep], dst[keep], w[keep]
            df2 = pd.DataFrame({"comp": c[src], "src": src, "dst": dst, "weight": w})
            # deterministic per-batch minimum: (weight, src, dst)
            df2 = df2.sort_values(["comp", "weight", "src", "dst"], kind="mergesort")
            return df2.groupby("comp", sort=False).head(1)

        picks = (
            sym_edges.map_batches(min_out, batch_format="pandas")
            .groupby("comp")
            .map_groups(
                lambda g: g.sort_values(
                    ["weight", "src", "dst"], kind="mergesort"
                ).head(1),
                batch_format="pandas",
            )
            .to_pandas()
        )
        if not len(picks) or "comp" not in picks.columns:
            break
        merged = 0
        for r in picks.itertuples():
            a, b = _find(comp, int(r.src)), _find(comp, int(r.dst))
            if a != b:
                comp[max(a, b)] = min(a, b)
                lo, hi = (int(r.src), int(r.dst)) if r.src < r.dst else (int(r.dst), int(r.src))
                chosen.append((lo, hi, float(r.weight)))
                merged += 1
        # path-compress the component map
        for i in range(node_count):
            comp[i] = _find(comp, i)
        if merged == 0:
            break
    out = pd.DataFrame(chosen, columns=["src", "dst", "weight"]).drop_duplicates(
        subset=["src", "dst"]
    )
    if idmap is not None:
        out["src"] = idmap.to_keys(out["src"].to_numpy(dtype=np.int64))
        out["dst"] = idmap.to_keys(out["dst"].to_numpy(dtype=np.int64))
    out = out.sort_values(["src", "dst"]).reset_index(drop=True)
    return out, float(out["weight"].sum())


def _find(comp: np.ndarray, x: int) -> int:
    while comp[x] != x:
        comp[x] = comp[comp[x]]
        x = comp[x]
    return int(x)

"""Community quality metrics: modularity and conductance.

References:
- modularity: algo/src/main/java/org/neo4j/gds/modularity/ — score a
  given community assignment: ``Q = Σ_c [ L_c/m  −  (d_c / 2m)² ]`` over
  the undirected weighted graph (m = total undirected weight/2, L_c =
  intra-community weight, d_c = community weighted degree).
- conductance: algo/src/main/java/org/neo4j/gds/conductance/Conductance.java:40
  — per community: boundary weight / min(volume, total −volume); we report
  the reference's stream shape (community, conductance).

Both are single joined-aggregate passes over the edge table — labels are
broadcast (one int array), edges stream.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


def _label_stats(sym_edges: rd.Dataset, labels: np.ndarray) -> pd.DataFrame:
    """Per-(src_label, same_community) weight sums over symmetric edges."""
    lref = ray.put(labels)

    def partial(t: pa.Table) -> pa.Table:
        lab = ray.get(lref)
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        w = t["weight"].to_numpy(zero_copy_only=False)
        ls = lab[src]
        same = (ls == lab[dst]).astype(np.int64)
        df = pd.DataFrame({"community": ls, "same": same, "w": w})
        g = df.groupby(["community", "same"], sort=False)["w"].sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    from graph_data_science_ray.pipelines.agg import hash_aggregate

    return hash_aggregate(
        sym_edges.map_batches(partial, batch_format="pyarrow"),
        ["community", "same"], "w", op="sum",
    ).to_pandas()


def modularity(sym_edges: rd.Dataset, labels: np.ndarray) -> float:
    """Modularity Q of a labeling over the symmetrized weighted graph."""
    st = _label_stats(sym_edges, labels)
    two_m = st["w"].sum()  # symmetric table counts each undirected edge twice
    if two_m == 0:
        return 0.0
    q = 0.0
    for _, grp in st.groupby("community"):
        d_c = grp["w"].sum()
        l_in = grp.loc[grp["same"] == 1, "w"].sum()
        q += l_in / two_m - (d_c / two_m) ** 2
    return float(q)


def conductance(sym_edges: rd.Dataset, labels: np.ndarray, idmap=None) -> pd.DataFrame:
    """Per-community conductance; returns (community, conductance_ppm).

    conductance = boundary / min(volume, total_volume - volume), exact
    integer ppm when weights are integral (our derived counts are).
    """
    st = _label_stats(sym_edges, labels)
    total = st["w"].sum()
    rows = []
    for comm, grp in st.groupby("community"):
        vol = grp["w"].sum()
        boundary = grp.loc[grp["same"] == 0, "w"].sum()
        denom = min(vol, total - vol)
        ppm = int((1_000_000 * boundary) // denom) if denom > 0 else 0
        rows.append((comm, ppm))
    out = pd.DataFrame(rows, columns=["community", "conductance_ppm"])
    if idmap is not None:
        out["community"] = idmap.to_keys(out["community"].to_numpy(dtype=np.int64))
    return out.sort_values("community").reset_index(drop=True)

"""Triangle counting + local clustering coefficient — exact counts.

Reference: algo/src/main/java/org/neo4j/gds/triangle/IntersectingTriangleCount.java:53-158
with ordered sorted-adjacency intersection
(intersect/GraphIntersect.java:65-125): each triangle ``c < b < a`` is
found once; all three corner counts are incremented; parallel edges are
deduplicated. ``maxDegree`` excludes super-hub nodes: their count is the
sentinel ``-1`` and they are skipped entirely
(IntersectingTriangleCount.java:55,139-144).

Distributed formulation (SURVEY.md §2.1): orient every undirected edge
low→high, build the **forward adjacency** ``adj⁺(v) = sorted {u ∈ N(v):
u > v}`` as a partitioned CSR (same GraphStore machinery, partitioned by
the lower endpoint), then one intersect pass: for each forward edge
``(a, b)``, ``|adj⁺(a) ∩ adj⁺(b)|`` triangles close above ``b``. Corner
counts accumulate per partition and combine by integer sum (exact,
order-independent).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from graph_data_science_ray.state.graph import GraphStore


def forward_edges(sym_edges: rd.Dataset) -> rd.Dataset:
    """Distinct low→high pairs from a symmetrized encoded edge Dataset."""
    return sym_edges.map_batches(
        lambda t: t.filter(pc.less(t["src"], t["dst"])),
        batch_format="pyarrow",
    )


@ray.remote
def _intersect_partition(part: int, all_block_refs: list, node_count: int) -> tuple:
    """Count triangles whose lowest corner lives in partition ``part``."""
    all_blocks = ray.get(list(all_block_refs))  # zero-copy on-node reads
    block = all_blocks[part]
    start, end = block["start"], block["end"]
    indptr, indices = block["indptr"], block["indices"]
    counts = np.zeros(node_count, dtype=np.int64)
    total = 0
    # adjacency lookup across partitions (object-store blocks, zero-copy)
    starts = np.array([b["start"] for b in all_blocks], dtype=np.int64)

    def adj(v: int) -> np.ndarray:
        p = np.searchsorted(starts, v, side="right") - 1
        b = all_blocks[p]
        lo = v - b["start"]
        return b["indices"][b["indptr"][lo] : b["indptr"][lo + 1]]

    for a_local in range(end - start):
        nbrs = indices[indptr[a_local] : indptr[a_local + 1]]
        if len(nbrs) == 0:
            continue
        a = start + a_local
        for b_node in nbrs:
            common = np.intersect1d(nbrs, adj(int(b_node)), assume_unique=True)
            k = len(common)
            if k:
                total += k
                counts[a] += k
                counts[b_node] += k
                counts[common] += 1
    return counts, total


def triangle_count(
    sym_edges: rd.Dataset,
    idmap=None,
    node_count: int | None = None,
    max_degree: int | None = None,
    path: str = None,
    num_partitions: int = 16,
):
    """Exact per-node + global triangle counts.

    ``sym_edges``: symmetrized encoded edge Dataset (both directions
    present, parallel edges already aggregated — the UNDIRECTED projection
    the reference validates for (triangle/TriangleCountBaseConfig.java:50)).

    Returns ``(DataFrame(node, triangles), global_count)``; excluded
    super-hub nodes carry ``-1``.
    """
    import tempfile

    if node_count is None:
        if idmap is None:
            raise ValueError("need idmap or node_count")
        node_count = len(idmap)

    # undirected (distinct-neighbor) degree per node, for maxDegree exclusion
    excluded = np.zeros(node_count, dtype=bool)
    if max_degree is not None:
        from graph_data_science_ray.functions.degree import degree_centrality

        deg = degree_centrality(sym_edges, node_count=node_count, weighted=False)
        excluded = deg["degree"].to_numpy(dtype=np.int64) > int(max_degree)

    fwd = forward_edges(sym_edges)
    if max_degree is not None and excluded.any():
        exc_ref = ray.put(np.flatnonzero(excluded))

        def drop_excluded(t: pa.Table) -> pa.Table:
            exc = ray.get(exc_ref)
            s = t["src"].to_numpy(zero_copy_only=False)
            d = t["dst"].to_numpy(zero_copy_only=False)
            keep = ~(np.isin(s, exc) | np.isin(d, exc))
            return t.take(pa.array(np.flatnonzero(keep)))

        fwd = fwd.map_batches(drop_excluded, batch_format="pyarrow")

    if path is None:
        path = tempfile.mkdtemp(prefix="gdsr-tri-", dir="/tmp")
    fwd_graph = GraphStore.project(
        fwd, path, node_count=node_count, num_partitions=num_partitions, directed=True
    )
    blocks = fwd_graph.block_refs()
    results = ray.get(
        [
            _intersect_partition.remote(p, blocks, node_count)
            for p in range(fwd_graph.num_partitions)
        ]
    )
    counts = np.zeros(node_count, dtype=np.int64)
    total = 0
    for c, t in results:
        counts += c
        total += t
    counts[excluded] = -1
    node = idmap.keys if idmap is not None else np.arange(node_count, dtype=np.int64)
    return pd.DataFrame({"node": node, "triangles": counts}), int(total)


def local_clustering_coefficient(
    sym_edges: rd.Dataset, idmap=None, node_count: int | None = None, **kw
) -> pd.DataFrame:
    """LCC(v) = 2*T(v) / (d(v) * (d(v)-1)), d = distinct-neighbor degree.

    Reference: triangle/LocalClusteringCoefficient.java:37.
    """
    from graph_data_science_ray.functions.degree import degree_centrality

    if node_count is None:
        node_count = len(idmap)
    tri, _ = triangle_count(sym_edges, idmap=None, node_count=node_count, **kw)
    deg = degree_centrality(sym_edges, node_count=node_count, weighted=False)
    d = deg["degree"].to_numpy(dtype=np.float64)
    t = tri["triangles"].to_numpy(dtype=np.float64)
    denom = d * (d - 1.0)
    lcc = np.where(denom > 0, 2.0 * t / np.where(denom > 0, denom, 1.0), 0.0)
    node = idmap.keys if idmap is not None else np.arange(node_count, dtype=np.int64)
    return pd.DataFrame({"node": node, "lcc": lcc})

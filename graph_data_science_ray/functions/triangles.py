"""Triangle counting + local clustering coefficient — exact counts.

Reference: algo/src/main/java/org/neo4j/gds/triangle/IntersectingTriangleCount.java:53-158
with ordered sorted-adjacency intersection
(intersect/GraphIntersect.java:65-125): each triangle ``c < b < a`` is
found once; all three corner counts are incremented; parallel edges are
deduplicated. ``maxDegree`` excludes super-hub nodes: their count is the
sentinel ``-1`` and they are skipped entirely
(IntersectingTriangleCount.java:55,139-144).

Distributed formulation (wedge hash-join, SURVEY.md §2.1): orient every
undirected edge low→high into forward edges ``a < b``. Stage 1
co-locates each node's forward neighbors by ``hash(src)`` and emits, per
node ``a`` with sorted forward neighbors ``b1 < b2 < …``, all **wedge**
pairs ``(bi, bj), i < j`` keyed ``bi*V + bj`` with corner ``a`` — pure
repeat/arange vector ops, no Python loop. Stage 2 hash-joins wedge keys
against the forward-edge key set: a match is exactly one triangle
``a < bi < bj``; per-group corner tallies combine by a node groupby-sum.
Each task holds only its hash partition (O(edges/P + wedges/P) memory,
no whole-graph replication); ``max_degree`` is the hub-wedge safety
valve, same role as the reference's config.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from graph_data_science_ray._util import splitmix64
from graph_data_science_ray.pipelines.agg import hash_aggregate


def forward_edges(sym_edges: rd.Dataset) -> rd.Dataset:
    """Distinct low→high pairs from a symmetrized encoded edge Dataset."""
    return sym_edges.map_batches(
        lambda t: t.filter(pc.less(t["src"], t["dst"])),
        batch_format="pyarrow",
    )


def _emit_wedges(g: pd.DataFrame, V: int) -> pd.DataFrame:
    """All forward-neighbor pairs per src in this hash partition.

    For a node with forward neighbors ``b1 < … < bd`` emits the d(d-1)/2
    pairs ``(bi, bj), i<j`` as packed keys ``bi*V + bj`` plus the corner
    node — the candidate third edges of triangles cornered at src.
    """
    empty = pd.DataFrame(
        {"key": np.zeros(0, dtype=np.int64), "corner": np.zeros(0, dtype=np.int64)}
    )
    if len(g) == 0:
        return empty
    g = g.sort_values(["src", "dst"], kind="mergesort")
    src = g["src"].to_numpy(dtype=np.int64)
    dst = g["dst"].to_numpy(dtype=np.int64)
    new = np.empty(len(src), dtype=bool)
    new[0] = True
    new[1:] = src[1:] != src[:-1]
    seg_start = np.flatnonzero(new)
    d = np.diff(np.append(seg_start, len(src)))
    within = np.arange(len(src), dtype=np.int64) - np.repeat(seg_start, d)
    left_counts = np.repeat(d, d) - 1 - within
    n_pairs = int(left_counts.sum())
    if n_pairs == 0:
        return empty
    lefts = np.repeat(np.arange(len(src), dtype=np.int64), left_counts)
    cum = np.repeat(np.cumsum(left_counts) - left_counts, left_counts)
    k = np.arange(n_pairs, dtype=np.int64) - cum
    rights = lefts + 1 + k
    corner = np.repeat(src, left_counts)
    key = dst[lefts] * V + dst[rights]
    return pd.DataFrame({"key": key, "corner": corner})


def triangle_count(
    sym_edges: rd.Dataset,
    idmap=None,
    node_count: int | None = None,
    max_degree: int | None = None,
    path: str = None,
    num_partitions: int = 64,
):
    """Exact per-node + global triangle counts.

    ``sym_edges``: symmetrized encoded edge Dataset (both directions
    present, parallel edges already aggregated — the UNDIRECTED projection
    the reference validates for (triangle/TriangleCountBaseConfig.java:50)).

    Returns ``(DataFrame(node, triangles), global_count)``; excluded
    super-hub nodes carry ``-1``. ``path`` is accepted for backward
    compatibility and unused (the wedge-join needs no CSR projection).
    """
    import functools

    if node_count is None:
        if idmap is None:
            raise ValueError("need idmap or node_count")
        node_count = len(idmap)
    V = int(node_count)
    P = max(4, int(num_partitions))

    # undirected (distinct-neighbor) degree per node, for maxDegree exclusion
    excluded = np.zeros(V, dtype=bool)
    if max_degree is not None:
        from graph_data_science_ray.functions.degree import degree_centrality

        deg = degree_centrality(sym_edges, node_count=V, weighted=False)
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

    fwd = fwd.materialize()  # consumed twice: wedge emission + edge-key side

    # Stage 1: wedges, co-located by hash(src)
    def tag_src(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.uint64)
        part = (splitmix64(s) % np.uint64(P)).astype(np.int64)
        return pa.table({"src": t["src"], "dst": t["dst"], "part": pa.array(part)})

    wedges = (
        fwd.map_batches(tag_src, batch_format="pyarrow")
        .groupby("part")
        .map_groups(functools.partial(_emit_wedges, V=V), batch_format="pandas")
    )

    # Stage 2: hash-join wedges ∩ forward-edge keys on hash(key)
    def edge_keys(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = s * V + d
        return pa.table(
            {"key": pa.array(key), "corner": pa.array(np.full(len(key), -1, dtype=np.int64))}
        )

    both = wedges.union(fwd.map_batches(edge_keys, batch_format="pyarrow"))

    def tag_key(t: pa.Table) -> pa.Table:
        k = t["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
        part = (splitmix64(k) % np.uint64(P)).astype(np.int64)
        return t.append_column("kpart", pa.array(part))

    closer = functools.partial(_close_with_v, V=V)
    partials = (
        both.map_batches(tag_key, batch_format="pyarrow")
        .groupby("kpart")
        .map_groups(closer, batch_format="pandas")
    )
    agg = hash_aggregate(partials, ["node"], "cnt", op="sum").to_pandas()
    counts = np.zeros(V, dtype=np.int64)
    if len(agg):
        counts[agg["node"].to_numpy(dtype=np.int64)] = agg["cnt"].to_numpy(dtype=np.int64)
    total = int(counts.sum()) // 3
    counts[excluded] = -1
    node = idmap.keys if idmap is not None else np.arange(V, dtype=np.int64)
    return pd.DataFrame({"node": node, "triangles": counts}), total


def _close_with_v(g: pd.DataFrame, V: int) -> pd.DataFrame:
    """`_close_wedges` with V passed explicitly (partial-friendly)."""
    key = g["key"].to_numpy(dtype=np.int64)
    corner = g["corner"].to_numpy(dtype=np.int64)
    is_edge = corner < 0
    ek = np.sort(key[is_edge])
    wk = key[~is_edge]
    wc = corner[~is_edge]
    empty = pd.DataFrame(
        {"node": np.zeros(0, dtype=np.int64), "cnt": np.zeros(0, dtype=np.int64)}
    )
    if len(ek) == 0 or len(wk) == 0:
        return empty
    pos = np.searchsorted(ek, wk)
    pos = np.minimum(pos, len(ek) - 1)
    match = ek[pos] == wk
    mk = wk[match]
    if len(mk) == 0:
        return empty
    nodes = np.concatenate([wc[match], mk // V, mk % V])
    u, c = np.unique(nodes, return_counts=True)
    return pd.DataFrame({"node": u, "cnt": c.astype(np.int64)})


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

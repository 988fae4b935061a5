"""Triangle counting + local clustering coefficient — exact counts.

Reference: algo/src/main/java/org/neo4j/gds/triangle/IntersectingTriangleCount.java:53-158
with ordered sorted-adjacency intersection
(intersect/GraphIntersect.java:65-125): each triangle ``c < b < a`` is
found once; all three corner counts are incremented; parallel edges are
deduplicated. ``maxDegree`` excludes super-hub nodes: their count is the
sentinel ``-1`` and they are skipped entirely
(IntersectingTriangleCount.java:55,139-144).

Distributed formulation (SURVEY.md §2.1): orient every undirected edge by
**degree order** — forward means ``(deg(u), u) < (deg(v), v)`` — so a
node's forward degree is bounded by ~sqrt(2m) and total wedge work is
O(m^1.5) even under power-law skew. Orientation is a consistent total
order, so triangle counts are identical to the reference's ``c < b < a``
id-ordering. One shuffle co-locates each node's forward neighbors by
``hash(src)``; inside each partition, wedge pairs are generated with
repeat/arange vector ops (no Python loop) and closed immediately against
the BROADCAST sorted forward-edge key set (``ray.put`` once, binary
search per chunk) — the wedge set itself never hits the object store.
Per-node corner tallies combine via one small groupby-sum.

The broadcast is O(E) int64 keys — the classic small-side broadcast —
built WITHOUT driver materialization: per-block key arrays go straight
from the object store into one sorting Ray task (``to_numpy_refs`` →
remote concat+sort), the driver only ever holds the ObjectRef. For edge
sets beyond a worker-memory budget, ``strategy="shuffle"`` hash-joins
the wedge stream against the edge keys instead (one extra all-to-all
over the wedges); the default ``strategy="auto"`` picks shuffle when the
forward-edge count exceeds ``broadcast_edge_budget``. ``max_degree``
remains the reference's hub exclusion valve.
"""

from __future__ import annotations

import functools

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from graph_data_science_ray._util import splitmix64
from graph_data_science_ray.pipelines.agg import hash_aggregate

_CHUNK_PAIRS = 4_000_000  # wedge pairs processed per vector chunk


@ray.remote
def _sorted_key_array(*chunks: np.ndarray) -> np.ndarray:
    """Concat + sort per-block edge-key arrays OFF the driver; the result
    lives in the object store and is read by every closing task."""
    if not chunks:
        return np.zeros(0, dtype=np.int64)
    return np.sort(
        np.concatenate([np.asarray(c, dtype=np.int64).ravel() for c in chunks])
    )


def forward_edges(sym_edges: rd.Dataset, deg_ref=None) -> rd.Dataset:
    """Degree-order-oriented pairs from a symmetrized edge Dataset.

    Forward means ``(deg(src), src) < (deg(dst), dst)`` when ``deg_ref``
    (a broadcast degree array) is given — the O(m^1.5) wedge bound —
    else plain ``src < dst`` id order."""
    if deg_ref is None:
        return sym_edges.map_batches(
            lambda t: t.filter(pc.less(t["src"], t["dst"])),
            batch_format="pyarrow",
        )

    def fwd(t: pa.Table) -> pa.Table:
        d = ray.get(deg_ref)
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (d[s] < d[v]) | ((d[s] == d[v]) & (s < v))
        return t.take(pa.array(np.flatnonzero(keep)))

    return sym_edges.map_batches(fwd, batch_format="pyarrow")


def _wedge_arrays(g: pd.DataFrame, deg_ref):
    """(corner, b_lo, b_hi) wedge arrays for one hash partition — per-src
    forward adjacency sorted in degree order, pairs via repeat/arange."""
    d = ray.get(deg_ref)
    g = g.assign(_dd=d[g["dst"].to_numpy(dtype=np.int64)])
    g = g.sort_values(["src", "_dd", "dst"], kind="mergesort")
    src = g["src"].to_numpy(dtype=np.int64)
    dst = g["dst"].to_numpy(dtype=np.int64)
    new = np.empty(len(src), dtype=bool)
    new[0] = True
    new[1:] = src[1:] != src[:-1]
    seg_start = np.flatnonzero(new)
    dcounts = np.diff(np.append(seg_start, len(src)))
    within = np.arange(len(src), dtype=np.int64) - np.repeat(seg_start, dcounts)
    left_counts = np.repeat(dcounts, dcounts) - 1 - within
    n_pairs = int(left_counts.sum())
    if n_pairs == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z, z
    lefts = np.repeat(np.arange(len(src), dtype=np.int64), left_counts)
    cum = np.repeat(np.cumsum(left_counts) - left_counts, left_counts)
    k = np.arange(n_pairs, dtype=np.int64) - cum
    rights = lefts + 1 + k
    return np.repeat(src, left_counts), dst[lefts], dst[rights]


def _count_in_part(
    g: pd.DataFrame, V: int, deg_ref, ekeys_ref
) -> pd.DataFrame:
    """Generate this partition's wedges and close them in-task against the
    broadcast sorted edge-key array; returns (node, cnt) corner partials."""
    empty = pd.DataFrame(
        {"node": np.zeros(0, dtype=np.int64), "cnt": np.zeros(0, dtype=np.int64)}
    )
    if len(g) == 0:
        return empty
    corner, blo, bhi = _wedge_arrays(g, deg_ref)
    if len(corner) == 0:
        return empty
    ek = ray.get(ekeys_ref)
    tallies = {}
    parts = []
    for s in range(0, len(corner), _CHUNK_PAIRS):
        c = corner[s : s + _CHUNK_PAIRS]
        lo = blo[s : s + _CHUNK_PAIRS]
        hi = bhi[s : s + _CHUNK_PAIRS]
        key = lo * V + hi
        pos = np.searchsorted(ek, key)
        pos = np.minimum(pos, len(ek) - 1)
        match = ek[pos] == key if len(ek) else np.zeros(len(key), dtype=bool)
        if not match.any():
            continue
        nodes = np.concatenate([c[match], lo[match], hi[match]])
        u, cnt = np.unique(nodes, return_counts=True)
        parts.append(pd.DataFrame({"node": u, "cnt": cnt.astype(np.int64)}))
    if not parts:
        return empty
    out = pd.concat(parts, ignore_index=True)
    return out.groupby("node", sort=False)["cnt"].sum().reset_index()


def triangle_count(
    sym_edges: rd.Dataset,
    idmap=None,
    node_count: int | None = None,
    max_degree: int | None = None,
    path: str = None,
    num_partitions: int = 64,
    strategy: str = "auto",
    broadcast_edge_budget: int = 150_000_000,
):
    """Exact per-node + global triangle counts.

    ``sym_edges``: symmetrized encoded edge Dataset (both directions
    present, parallel edges already aggregated — the UNDIRECTED projection
    the reference validates for (triangle/TriangleCountBaseConfig.java:50)).

    Returns ``(DataFrame(node, triangles), global_count)``; excluded
    super-hub nodes carry ``-1``. ``path`` is accepted for backward
    compatibility and unused.
    """
    if node_count is None:
        if idmap is None:
            raise ValueError("need idmap or node_count")
        node_count = len(idmap)
    V = int(node_count)
    P = max(4, int(num_partitions))

    # undirected (distinct-neighbor) degree per node: drives BOTH the
    # degree-order orientation and maxDegree exclusion
    from graph_data_science_ray.functions.degree import degree_centrality

    deg_arr = degree_centrality(sym_edges, node_count=V, weighted=False)[
        "degree"
    ].to_numpy(dtype=np.int64)
    deg_ref = ray.put(deg_arr)
    excluded = np.zeros(V, dtype=bool)
    if max_degree is not None:
        excluded = deg_arr > int(max_degree)

    fwd = forward_edges(sym_edges, deg_ref=deg_ref)
    if max_degree is not None and excluded.any():
        exc_ref = ray.put(np.flatnonzero(excluded))

        def drop_excluded(t: pa.Table) -> pa.Table:
            exc = ray.get(exc_ref)
            s = t["src"].to_numpy(zero_copy_only=False)
            d = t["dst"].to_numpy(zero_copy_only=False)
            keep = ~(np.isin(s, exc) | np.isin(d, exc))
            return t.take(pa.array(np.flatnonzero(keep)))

        fwd = fwd.map_batches(drop_excluded, batch_format="pyarrow")

    fwd = fwd.materialize()  # consumed twice: wedge side + edge-key side

    def edge_keys(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"key": pa.array(s * V + d)})

    def tag_src(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.uint64)
        part = (splitmix64(s) % np.uint64(P)).astype(np.int64)
        return pa.table({"src": t["src"], "dst": t["dst"], "part": pa.array(part)})

    if strategy == "auto":
        # broadcast while the sorted key array fits a worker's heap
        # (~1.2 GB at the default budget); beyond that, the wedge-side
        # hash-join avoids any single-task edge-key materialization
        strategy = "broadcast" if fwd.count() <= broadcast_edge_budget else "shuffle"

    if strategy == "broadcast":
        # build the sorted key array WITHOUT driver pandas: per-block key
        # arrays flow as ObjectRefs into one remote concat+sort task
        refs = fwd.map_batches(edge_keys, batch_format="pyarrow").to_numpy_refs(
            column="key"
        )
        ekeys_ref = _sorted_key_array.remote(*refs)
        partials = (
            fwd.map_batches(tag_src, batch_format="pyarrow")
            .groupby("part")
            .map_groups(
                functools.partial(_count_in_part, V=V, deg_ref=deg_ref,
                                  ekeys_ref=ekeys_ref),
                batch_format="pandas",
            )
        )
    else:  # "shuffle": hash-join wedges against edge keys (huge-E path)
        def emit_wedges(g: pd.DataFrame) -> pd.DataFrame:
            corner, blo, bhi = _wedge_arrays(g, deg_ref) if len(g) else (
                np.zeros(0, dtype=np.int64),) * 3
            return pd.DataFrame({"key": blo * V + bhi, "corner": corner})

        wedges = (
            fwd.map_batches(tag_src, batch_format="pyarrow")
            .groupby("part")
            .map_groups(emit_wedges, batch_format="pandas")
        )
        ekds = fwd.map_batches(
            lambda t: edge_keys(t).append_column(
                "corner", pa.array(np.full(len(t), -1, dtype=np.int64))
            ),
            batch_format="pyarrow",
        )
        both = wedges.union(ekds)

        def tag_key(t: pa.Table) -> pa.Table:
            k = t["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
            part = (splitmix64(k) % np.uint64(P)).astype(np.int64)
            return t.append_column("kpart", pa.array(part))

        partials = (
            both.map_batches(tag_key, batch_format="pyarrow")
            .groupby("kpart")
            .map_groups(functools.partial(_close_with_v, V=V), batch_format="pandas")
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
    """Shuffle-strategy closer: match wedge keys against edge keys
    (corner = -1 marks edge rows) within one hash partition."""
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


def _emit_triangles(
    g: pd.DataFrame, V: int, deg_ref, ekeys_ref
) -> pd.DataFrame:
    """Oriented triangle rows (a, b, c) for one hash partition — the
    ``_count_in_part`` wedge-closing pass, emitting each closed triangle
    once (degree order a < b < c) instead of corner tallies."""
    empty = pd.DataFrame(
        {"a": np.zeros(0, dtype=np.int64),
         "b": np.zeros(0, dtype=np.int64),
         "c": np.zeros(0, dtype=np.int64)}
    )
    if len(g) == 0:
        return empty
    corner, blo, bhi = _wedge_arrays(g, deg_ref)
    if len(corner) == 0:
        return empty
    ek = ray.get(ekeys_ref)
    parts = []
    for s in range(0, len(corner), _CHUNK_PAIRS):
        c = corner[s : s + _CHUNK_PAIRS]
        lo = blo[s : s + _CHUNK_PAIRS]
        hi = bhi[s : s + _CHUNK_PAIRS]
        key = lo * V + hi
        pos = np.searchsorted(ek, key)
        pos = np.minimum(pos, len(ek) - 1)
        match = ek[pos] == key if len(ek) else np.zeros(len(key), dtype=bool)
        if match.any():
            parts.append(
                pd.DataFrame({"a": c[match], "b": lo[match], "c": hi[match]})
            )
    return pd.concat(parts, ignore_index=True) if parts else empty


def triangle_stream(
    sym_edges: rd.Dataset,
    idmap=None,
    node_count: int | None = None,
    num_partitions: int = 64,
) -> rd.Dataset:
    """Per-triangle ``(a, b, c)`` emission — each triangle exactly once.

    Reference: algo/src/main/java/org/neo4j/gds/triangle/TriangleStream.java:52
    (the stream procedure emits node triples, not counts).  Rides the
    degree-order wedge-close machinery of :func:`triangle_count`
    (generation in degree order bounds work at O(m^1.5)); rows are then
    re-canonicalized to ascending dense id, the reference's ``c < b < a``
    orientation.  Returns a Dataset of int64 ``(a, b, c)`` dense-id rows
    (a < b < c) — a stream, not a driver list: the triangle set can be
    orders of magnitude larger than E and never lands on one machine.
    """
    if node_count is None:
        if idmap is None:
            raise ValueError("need idmap or node_count")
        node_count = len(idmap)
    V = int(node_count)
    P = max(4, int(num_partitions))

    from graph_data_science_ray.functions.degree import degree_centrality

    deg_arr = degree_centrality(sym_edges, node_count=V, weighted=False)[
        "degree"
    ].to_numpy(dtype=np.int64)
    deg_ref = ray.put(deg_arr)
    fwd = forward_edges(sym_edges, deg_ref=deg_ref).materialize()

    def edge_keys(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"key": pa.array(s * V + d)})

    refs = fwd.map_batches(edge_keys, batch_format="pyarrow").to_numpy_refs(
        column="key"
    )
    ekeys_ref = _sorted_key_array.remote(*refs)

    def tag_src(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.uint64)
        part = (splitmix64(s) % np.uint64(P)).astype(np.int64)
        return pa.table({"src": t["src"], "dst": t["dst"], "part": pa.array(part)})

    tris = (
        fwd.map_batches(tag_src, batch_format="pyarrow")
        .groupby("part")
        .map_groups(
            functools.partial(_emit_triangles, V=V, deg_ref=deg_ref,
                              ekeys_ref=ekeys_ref),
            batch_format="pandas",
        )
    )

    def canon_ids(df: pd.DataFrame) -> pd.DataFrame:
        # degree-ordered corners → ascending dense id per row
        m = np.sort(
            np.stack(
                [df["a"].to_numpy(dtype=np.int64),
                 df["b"].to_numpy(dtype=np.int64),
                 df["c"].to_numpy(dtype=np.int64)],
                axis=1,
            ),
            axis=1,
        )
        return pd.DataFrame({"a": m[:, 0], "b": m[:, 1], "c": m[:, 2]})

    return tris.map_batches(canon_ids, batch_format="pandas")


def four_clique_count(
    sym_edges: rd.Dataset,
    idmap=None,
    node_count: int | None = None,
    num_partitions: int = 64,
):
    """Exact per-node + global 4-clique (K4) counts.

    Two chained wedge-closing passes over the degree-order-oriented
    edge set: pass one emits each triangle ``a < b < c`` once (the
    triangle machinery's orientation); pass two extends every triangle
    by the forward neighbors ``d`` of its highest corner ``c`` and
    keeps ``d`` iff edges ``(a,d)`` and ``(b,d)`` are in the broadcast
    forward-key set — so each K4 is found exactly once at its
    degree-ordered orientation.  Work is Σ_triangles deg⁺(c), bounded
    by the same O(m^1.5)-style degree-order argument as the triangle
    pass.  Partitioning: triangles co-locate with the adjacency of
    their ``c`` corner by one hash exchange; the forward-key set is the
    triangle pass's broadcast (sorted int64 array built off-driver).

    Returns ``(DataFrame(node, k4), global_count)``.
    """
    if node_count is None:
        if idmap is None:
            raise ValueError("need idmap or node_count")
        node_count = len(idmap)
    V = int(node_count)
    P = max(4, int(num_partitions))

    from graph_data_science_ray.functions.degree import degree_centrality

    deg_arr = degree_centrality(sym_edges, node_count=V, weighted=False)[
        "degree"
    ].to_numpy(dtype=np.int64)
    deg_ref = ray.put(deg_arr)
    fwd = forward_edges(sym_edges, deg_ref=deg_ref).materialize()

    def edge_keys(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"key": pa.array(s * V + d)})

    refs = fwd.map_batches(edge_keys, batch_format="pyarrow").to_numpy_refs(
        column="key"
    )
    ekeys_ref = _sorted_key_array.remote(*refs)

    def tag_src(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.uint64)
        part = (splitmix64(s) % np.uint64(P)).astype(np.int64)
        return pa.table({"src": t["src"], "dst": t["dst"], "part": pa.array(part)})

    tris = (
        fwd.map_batches(tag_src, batch_format="pyarrow")
        .groupby("part")
        .map_groups(
            functools.partial(_emit_triangles, V=V, deg_ref=deg_ref,
                              ekeys_ref=ekeys_ref),
            batch_format="pandas",
        )
    )

    # co-locate each triangle with the forward adjacency of its c corner
    # (arrow batches so the union's block types match edge_rows')
    def tag_tri(t: pa.Table) -> pa.Table:
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.uint64)
        part = (splitmix64(c) % np.uint64(P)).astype(np.int64)
        return pa.table(
            {"a": t["a"], "b": t["b"], "c": t["c"], "part": pa.array(part)}
        )

    def edge_rows(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        part = (splitmix64(s.astype(np.uint64)) % np.uint64(P)).astype(np.int64)
        return pa.table(
            {"a": pa.array(s), "b": pa.array(d),
             "c": pa.array(np.full(len(s), -1, dtype=np.int64)),
             "part": pa.array(part)}
        )

    both = tris.map_batches(tag_tri, batch_format="pyarrow").union(
        fwd.map_batches(edge_rows, batch_format="pyarrow")
    )

    def close_k4(g: pd.DataFrame, *, V=V, ekeys_ref=ekeys_ref) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"node": np.zeros(0, dtype=np.int64),
             "cnt": np.zeros(0, dtype=np.int64)}
        )
        cc = g["c"].to_numpy(dtype=np.int64)
        is_edge = cc < 0
        if is_edge.all() or (~is_edge).sum() == 0:
            return empty
        esrc = g["a"].to_numpy(dtype=np.int64)[is_edge]
        edst = g["b"].to_numpy(dtype=np.int64)[is_edge]
        order = np.argsort(esrc, kind="mergesort")
        esrc, edst = esrc[order], edst[order]
        ta = g["a"].to_numpy(dtype=np.int64)[~is_edge]
        tb = g["b"].to_numpy(dtype=np.int64)[~is_edge]
        tc = cc[~is_edge]
        start = np.searchsorted(esrc, tc, side="left")
        end = np.searchsorted(esrc, tc, side="right")
        reps = end - start
        total = int(reps.sum())
        if total == 0:
            return empty
        ek = ray.get(ekeys_ref)
        tri_idx = np.repeat(np.arange(len(ta), dtype=np.int64), reps)
        cum = np.repeat(np.cumsum(reps) - reps, reps)
        off = np.arange(total, dtype=np.int64) - cum
        dd = edst[start[tri_idx] + off]
        aa, bb = ta[tri_idx], tb[tri_idx]
        ka = aa * V + dd
        kb = bb * V + dd
        pos = np.minimum(np.searchsorted(ek, ka), len(ek) - 1)
        m = ek[pos] == ka
        pos = np.minimum(np.searchsorted(ek, kb), len(ek) - 1)
        m &= ek[pos] == kb
        if not m.any():
            return empty
        nodes = np.concatenate([aa[m], bb[m], tc[tri_idx][m], dd[m]])
        u, cnt = np.unique(nodes, return_counts=True)
        return pd.DataFrame({"node": u, "cnt": cnt.astype(np.int64)})

    partials = both.groupby("part").map_groups(close_k4, batch_format="pandas")
    agg = hash_aggregate(partials, ["node"], "cnt", op="sum").to_pandas()
    counts = np.zeros(V, dtype=np.int64)
    if len(agg):
        counts[agg["node"].to_numpy(dtype=np.int64)] = agg["cnt"].to_numpy(
            dtype=np.int64
        )
    total = int(counts.sum()) // 4
    node = idmap.keys if idmap is not None else np.arange(V, dtype=np.int64)
    return pd.DataFrame({"node": node, "k4": counts}), total

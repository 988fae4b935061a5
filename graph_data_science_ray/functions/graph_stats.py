"""Global link-graph structure statistics: reciprocity and degree
assortativity.

Two classic whole-graph metrics the reference's stats modes do not
cover but every link-graph analysis toolkit reports (Newman 2002/2003):

- :func:`reciprocity` — the fraction of directed edges whose reverse
  edge also exists. All-integer: one canonical-pair hash aggregate
  (``(min,max) -> sum of direction codes``; a pair summing to 3 has
  both directions), then scalar counts. ppm is non-negative so integer
  floor division matches ANSI SQL ``//`` exactly.
- :func:`degree_assortativity` — the Pearson correlation of endpoint
  degrees over the undirected edge set. Because the symmetrized table
  carries BOTH orientations of every edge, the x/y marginals coincide
  exactly (Sx == Sy, Sxx == Syy) and the correlation is the RATIONAL
  ``num/den`` with integer ``num = n*Sxy - Sx², den = n*Sxx - Sx²`` —
  no square root. The result row carries the exact integer sums plus
  one IEEE double division, bit-identical to the SQL oracle. int64
  overflow bound: ``n * Sxx`` must stay below 2^63 (documented; at
  larger scales the partials are small enough to re-reduce in Python
  ints driver-side, the sums being O(#blocks)).

Scale shape: one hash-partitioned aggregate (reciprocity) or one degree
aggregate + two hash joins (assortativity) + map-side integer partials;
the driver sees O(#blocks) partial rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

__all__ = ["reciprocity", "degree_assortativity", "rich_club"]


def reciprocity(edges: rd.Dataset, num_parts: int = 64) -> pd.DataFrame:
    """Directed-edge reciprocity over a distinct ``(src, dst)`` edge
    table (self-loop-free, as the derivation guarantees). Returns one
    row ``(n_edges, n_reciprocal, reciprocity_ppm)``."""
    from graph_data_science_ray.pipelines.agg import hash_aggregate

    def code(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {"a": pd.Series([], dtype=np.int64),
                 "b": pd.Series([], dtype=np.int64),
                 "v": pd.Series([], dtype=np.int64)}
            )
        s = df["src"].to_numpy(dtype=np.int64)
        d = df["dst"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {"a": np.minimum(s, d), "b": np.maximum(s, d),
             "v": np.where(s < d, 1, 2).astype(np.int64)}
        )

    pairs = hash_aggregate(
        edges.map_batches(code, batch_format="pandas"),
        ["a", "b"], "v", op="sum", num_parts=num_parts,
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"pairs3": np.array(
                [int((df["v"].to_numpy() == 3).sum()) if len(df) else 0],
                dtype=np.int64)}
        )

    n_edges = int(edges.count())
    both = int(
        pairs.map_batches(partial, batch_format="pandas").sum(on="pairs3")
        or 0
    )
    n_recip = 2 * both
    return pd.DataFrame(
        {"n_edges": np.array([n_edges], dtype=np.int64),
         "n_reciprocal": np.array([n_recip], dtype=np.int64),
         "reciprocity_ppm": np.array(
             [1_000_000 * n_recip // n_edges if n_edges else 0],
             dtype=np.int64)}
    )


def degree_assortativity(sym_edges: rd.Dataset, num_parts: int = 64) -> pd.DataFrame:
    """Degree assortativity over a symmetrized edge table (both
    orientations present). Returns one row ``(n, sum_x, sum_xx, sum_xy,
    num, den, r)`` — exact integer sums and the single-division double
    ``r = num / den`` (0.0 when den == 0, i.e. a regular graph)."""
    import pyarrow as pa

    from graph_data_science_ray.pipelines.agg import hash_aggregate, hash_join

    ones = sym_edges.map_batches(
        lambda df: pd.DataFrame(
            {"src": df["src"].to_numpy(dtype=np.int64),
             "one": np.ones(len(df), dtype=np.int64)}
        ),
        batch_format="pandas",
    )
    deg = hash_aggregate(ones, ["src"], "one", op="sum",
                         num_parts=num_parts, out_col="deg")

    e = sym_edges.map_batches(
        lambda df: pd.DataFrame(
            {"src": df["src"].to_numpy(dtype=np.int64),
             "dst": df["dst"].to_numpy(dtype=np.int64)}
        ),
        batch_format="pandas",
    )
    degx = deg.map_batches(
        lambda df: df.rename(columns={"deg": "degx"}), batch_format="pandas"
    )
    degy = deg.map_batches(
        lambda df: df.rename(columns={"src": "dst", "deg": "degy"}),
        batch_format="pandas",
    )
    j = hash_join(
        e, degx, on=["src"], num_parts=num_parts,
        left_schema=pa.schema([("src", pa.int64()), ("dst", pa.int64())]),
        right_schema=pa.schema([("src", pa.int64()), ("degx", pa.int64())]),
    )
    j = hash_join(
        j, degy, on=["dst"], num_parts=num_parts,
        left_schema=pa.schema(
            [("src", pa.int64()), ("dst", pa.int64()), ("degx", pa.int64())]
        ),
        right_schema=pa.schema([("dst", pa.int64()), ("degy", pa.int64())]),
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            z = np.zeros(1, dtype=np.int64)
            return pd.DataFrame({"n": z, "sx": z, "sxx": z, "sxy": z})
        x = df["degx"].to_numpy(dtype=np.int64)
        y = df["degy"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {"n": np.array([len(df)], dtype=np.int64),
             "sx": np.array([int(x.sum())], dtype=np.int64),
             "sxx": np.array([int((x * x).sum())], dtype=np.int64),
             "sxy": np.array([int((x * y).sum())], dtype=np.int64)}
        )

    parts = j.map_batches(partial, batch_format="pandas").to_pandas()
    n = int(parts["n"].sum())
    sx = int(parts["sx"].sum())
    sxx = int(parts["sxx"].sum())
    sxy = int(parts["sxy"].sum())
    num = n * sxy - sx * sx
    den = n * sxx - sx * sx
    r = float(np.float64(num) / np.float64(den)) if den else 0.0
    return pd.DataFrame(
        {"n": np.array([n], dtype=np.int64),
         "sum_x": np.array([sx], dtype=np.int64),
         "sum_xx": np.array([sxx], dtype=np.int64),
         "sum_xy": np.array([sxy], dtype=np.int64),
         "num": np.array([num], dtype=np.int64),
         "den": np.array([den], dtype=np.int64),
         "r": np.array([r], dtype=np.float64)}
    )


def rich_club(
    sym_edges: rd.Dataset,
    ks: tuple = (1, 2, 4, 8, 16),
    num_parts: int = 64,
) -> pd.DataFrame:
    """Rich-club coefficients φ(k) over the undirected graph (Zhou &
    Mondragón 2004): among nodes with degree > k, the realized fraction
    of possible links. Returns one row per threshold ``(k, n_nodes,
    n_edges, phi_ppm)`` with ``phi_ppm = 1e6 * 2*E_k //
    (N_k*(N_k-1))`` — all-integer, zero when fewer than 2 club nodes.

    Scale shape: one degree aggregate; per-edge ``min(degx, degy)``
    histogram + per-node degree histogram (both distinct-degree-sized,
    ≪ E) reduce driver-side to suffix counts — no per-k passes.
    ``sym_edges`` carries both orientations, so each undirected edge is
    counted twice and E_k = suffix_count / 2 exactly.
    """
    import pyarrow as pa

    from graph_data_science_ray.pipelines.agg import hash_aggregate, hash_join

    ones = sym_edges.map_batches(
        lambda df: pd.DataFrame(
            {"src": df["src"].to_numpy(dtype=np.int64),
             "one": np.ones(len(df), dtype=np.int64)}
        ),
        batch_format="pandas",
    )
    deg = hash_aggregate(ones, ["src"], "one", op="sum",
                         num_parts=num_parts, out_col="deg").materialize()

    # node-degree histogram (distinct-degree-sized)
    dh = hash_aggregate(
        deg.map_batches(
            lambda df: pd.DataFrame(
                {"d": df["deg"].to_numpy(dtype=np.int64),
                 "c": np.ones(len(df), dtype=np.int64)}
            ),
            batch_format="pandas",
        ),
        ["d"], "c", op="sum", num_parts=num_parts,
    ).to_pandas()

    # per-edge min-endpoint-degree histogram
    e = sym_edges.map_batches(
        lambda df: pd.DataFrame(
            {"src": df["src"].to_numpy(dtype=np.int64),
             "dst": df["dst"].to_numpy(dtype=np.int64)}
        ),
        batch_format="pandas",
    )
    degx = deg.map_batches(
        lambda df: df.rename(columns={"deg": "degx"}), batch_format="pandas"
    )
    degy = deg.map_batches(
        lambda df: df.rename(columns={"src": "dst", "deg": "degy"}),
        batch_format="pandas",
    )
    j = hash_join(
        e, degx, on=["src"], num_parts=num_parts,
        left_schema=pa.schema([("src", pa.int64()), ("dst", pa.int64())]),
        right_schema=pa.schema([("src", pa.int64()), ("degx", pa.int64())]),
    )
    j = hash_join(
        j, degy, on=["dst"], num_parts=num_parts,
        left_schema=pa.schema(
            [("src", pa.int64()), ("dst", pa.int64()), ("degx", pa.int64())]
        ),
        right_schema=pa.schema([("dst", pa.int64()), ("degy", pa.int64())]),
    )

    def mind_hist(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {"d": pd.Series([], dtype=np.int64),
                 "c": pd.Series([], dtype=np.int64)}
            )
        m = np.minimum(df["degx"].to_numpy(dtype=np.int64),
                       df["degy"].to_numpy(dtype=np.int64))
        g = pd.DataFrame({"d": m, "c": np.ones(len(m), dtype=np.int64)})
        return g.groupby("d", sort=False).sum().reset_index()

    eh = hash_aggregate(
        j.map_batches(mind_hist, batch_format="pandas"),
        ["d"], "c", op="sum", num_parts=num_parts,
    ).to_pandas()

    rows = []
    for k in ks:
        n_k = int(dh.loc[dh["d"] > k, "c"].sum())
        e_k = int(eh.loc[eh["d"] > k, "c"].sum()) // 2
        possible = n_k * (n_k - 1) // 2
        phi = 1_000_000 * 2 * e_k // (n_k * (n_k - 1)) if n_k >= 2 else 0
        rows.append((int(k), n_k, e_k, phi, possible))
    return pd.DataFrame(
        {"k": np.array([r[0] for r in rows], dtype=np.int64),
         "n_nodes": np.array([r[1] for r in rows], dtype=np.int64),
         "n_edges": np.array([r[2] for r in rows], dtype=np.int64),
         "phi_ppm": np.array([r[3] for r in rows], dtype=np.int64)}
    )


def degree_gini(
    enc_edges: rd.Dataset, node_count: int, num_parts: int = 16
) -> pd.DataFrame:
    """Gini coefficient of the out-degree distribution as an exact
    RATIONAL ``(n_nodes, gini_num, gini_den)`` — the inequality measure
    of hub concentration:

        G = (2·Σᵢ i·d₍ᵢ₎ − (n+1)·Σd) / (n·Σd)

    over ascending-sorted degrees, zero-degree nodes included.  The
    rank sum folds over the DISTINCT-DEGREE histogram (answer-sized):
    a run of ``c`` equal degrees ``v`` starting after cumulative count
    ``S`` contributes ``v·(S·c + c(c+1)/2)``.  Scale shape: one degree
    aggregate + one histogram aggregate, both hash-partitioned; the
    driver folds |distinct degrees| rows with Python-int arithmetic
    (the rank sums exceed int64 at 10^10 nodes).
    """
    from graph_data_science_ray.pipelines.agg import hash_aggregate

    ones = enc_edges.map_batches(
        lambda df: pd.DataFrame(
            {"node": df["src"].astype(np.int64),
             "d": np.ones(len(df), dtype=np.int64)}
        ),
        batch_format="pandas",
    )
    base = rd.from_pandas(
        pd.DataFrame(
            {"node": np.arange(int(node_count), dtype=np.int64),
             "d": np.zeros(int(node_count), dtype=np.int64)}
        )
    )
    deg = hash_aggregate(
        base.union(ones), ["node"], "d", op="sum", num_parts=num_parts,
        out_col="deg",
    )

    def one(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"deg": df["deg"].astype(np.int64),
             "c": np.ones(len(df), dtype=np.int64)}
        )

    hist = (
        hash_aggregate(
            deg.map_batches(one, batch_format="pandas"),
            ["deg"], "c", op="sum", num_parts=8,
        )
        .to_pandas()
        .sort_values("deg")
    )
    n = int(hist["c"].sum())
    tot = 0
    sr = 0
    s_prev = 0
    for v, c in zip(hist["deg"].tolist(), hist["c"].tolist()):
        v, c = int(v), int(c)
        sr += v * (s_prev * c + c * (c + 1) // 2)
        tot += v * c
        s_prev += c
    if n == 0 or tot == 0:
        num, den = 0, 1
    else:
        num, den = 2 * sr - (n + 1) * tot, n * tot
    return pd.DataFrame(
        {
            "n_nodes": np.array([n], dtype=np.int64),
            "gini_num": np.array([num], dtype=np.int64),
            "gini_den": np.array([den], dtype=np.int64),
        }
    )


def triad_census(
    enc: rd.Dataset,
    sym: rd.Dataset,
    node_count: int,
    num_parts: int = 64,
) -> pd.DataFrame:
    """Dyad + undirected triad census in one answer-sized row.

    The Holland & Leinhardt census ("A method for detecting structure
    in sociometric data", AJS 1970) at the undirected triad level plus
    the full directed dyad level:

    * dyads: ``dyad_mut`` (both directions present), ``dyad_asym``
      (exactly one), ``dyad_null`` (no edge) over all C(V,2) pairs;
    * triads over all C(V,3) triples: ``tri_closed`` (triangle),
      ``tri_wedge`` (open 2-path), ``tri_one_edge``, ``tri_empty``.

    Everything derives from distributed integer aggregates — degree
    moments (Σ C(deg,2), Σ deg²), the global triangle count (the
    degree-ordered wedge-close machinery), and the reciprocity pair
    codes — closed-form inclusion-exclusion does the rest on the
    driver, so no O(V³) work anywhere:

        wedge    = P2 − 3T
        one_edge = E(V−2) − Σdeg² + 2E + 3T
        empty    = C(V,3) − closed − wedge − one_edge
    """
    from graph_data_science_ray.functions.triangles import triangle_count
    from graph_data_science_ray.pipelines.agg import hash_aggregate

    V = int(node_count)

    # degree moments over the symmetrized table (deg = rows per src)
    def dcount(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"node": pd.Series([], dtype=np.int64),
                                 "c": pd.Series([], dtype=np.int64)})
        g = df.groupby("src", sort=False).size().reset_index(name="c")
        return g.rename(columns={"src": "node"})

    deg = hash_aggregate(
        sym.map_batches(dcount, batch_format="pandas"),
        ["node"], "c", op="sum", num_parts=num_parts,
    )

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        d = df["c"].to_numpy(dtype=np.int64) if len(df) else np.array([], np.int64)
        return pd.DataFrame(
            {"sum_d": np.array([int(d.sum())], dtype=np.int64),
             "sum_d2": np.array([int((d * d).sum())], dtype=np.int64),
             "sum_choose2": np.array([int((d * (d - 1) // 2).sum())],
                                     dtype=np.int64)}
        )

    mom = (
        deg.map_batches(moments, batch_format="pandas").to_pandas().sum()
    )
    E = int(mom["sum_d"]) // 2
    sum_d2 = int(mom["sum_d2"])
    P2 = int(mom["sum_choose2"])

    # wedge-close partitions scale with the caller's num_parts (capped:
    # triangle_count's per-partition constant dominates tiny inputs)
    _per_node, T = triangle_count(sym, idmap=None, node_count=V,
                                  num_partitions=max(2, min(num_parts, 64)))
    T = int(T)

    # directed dyad codes (reciprocity machinery)
    def code(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                                 "b": pd.Series([], dtype=np.int64),
                                 "v": pd.Series([], dtype=np.int64)})
        s = df["src"].to_numpy(dtype=np.int64)
        d = df["dst"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {"a": np.minimum(s, d), "b": np.maximum(s, d),
             "v": np.where(s < d, 1, 2).astype(np.int64)}
        )

    pairs = hash_aggregate(
        enc.map_batches(code, batch_format="pandas"),
        ["a", "b"], "v", op="sum", num_parts=num_parts,
    )

    def pairstats(df: pd.DataFrame) -> pd.DataFrame:
        v = df["v"].to_numpy(dtype=np.int64) if len(df) else np.array([], np.int64)
        return pd.DataFrame(
            {"mut": np.array([int((v == 3).sum())], dtype=np.int64),
             "tot": np.array([len(v)], dtype=np.int64)}
        )

    ps = pairs.map_batches(pairstats, batch_format="pandas").to_pandas().sum()
    mut = int(ps["mut"])
    linked = int(ps["tot"])
    asym = linked - mut
    null = V * (V - 1) // 2 - linked

    wedge = P2 - 3 * T
    one_edge = E * (V - 2) - sum_d2 + 2 * E + 3 * T
    empty = V * (V - 1) * (V - 2) // 6 - T - wedge - one_edge
    return pd.DataFrame(
        {"v": np.array([V], dtype=np.int64),
         "e": np.array([E], dtype=np.int64),
         "dyad_mut": np.array([mut], dtype=np.int64),
         "dyad_asym": np.array([asym], dtype=np.int64),
         "dyad_null": np.array([null], dtype=np.int64),
         "tri_closed": np.array([T], dtype=np.int64),
         "tri_wedge": np.array([wedge], dtype=np.int64),
         "tri_one_edge": np.array([one_edge], dtype=np.int64),
         "tri_empty": np.array([empty], dtype=np.int64)}
    )


def robustness_profile(
    sym_edges: rd.Dataset,
    p_ppms: tuple = (250_000, 500_000, 750_000),
    salt: str = "rb",
    num_parts: int = 32,
) -> pd.DataFrame:
    """Connectivity under random edge failure — the percolation profile.

    For each retention probability ``p`` (ppm), keeps every undirected
    edge whose canonical pair passes the all-integer md5 acceptance
    ``u32 · 10⁶ < p · 2³²`` (deterministic, engine-independent — the
    repo's sampling discipline), then measures the surviving subgraph:
    ``(p_ppm, n_edges, n_nodes, n_components, giant)`` where components
    are over TOUCHED nodes only and ``giant`` is the largest component
    size — the standard bond-percolation robustness readout (Albert,
    Jeong & Barabási, "Error and attack tolerance of complex networks",
    Nature 2000).

    Scale shape: each level reuses the distributed hash-min
    connected-components fixpoint over the sampled pair Dataset
    (``stages/dedup.dedup_clusters`` machinery — labels hash-join onto
    pairs, min-aggregate, scalar-sum convergence); the profile itself is
    answer-sized.
    """
    import hashlib

    import pyarrow as pa

    from graph_data_science_ray.pipelines.agg import (
        hash_aggregate,
        materialize_bounded,
    )
    from graph_data_science_ray.stages.dedup import dedup_clusters

    rows = []
    for p in p_ppms:
        def accept(t: pa.Table, _p=int(p)) -> pa.Table:
            s = np.asarray(t["src"].to_numpy(zero_copy_only=False),
                           dtype=np.int64)
            d = np.asarray(t["dst"].to_numpy(zero_copy_only=False),
                           dtype=np.int64)
            keep = s < d
            s, d = s[keep], d[keep]
            u32 = np.array(
                [
                    int(hashlib.md5(f"{salt}:{i}:{j}".encode())
                        .hexdigest()[:8], 16)
                    for i, j in zip(s, d)
                ],
                dtype=np.int64,
            )
            acc = u32 * 1_000_000 < _p * 4_294_967_296
            return pa.table(
                {"doc_a": s[acc], "doc_b": d[acc]},
                schema=pa.schema([("doc_a", pa.int64()),
                                  ("doc_b", pa.int64())]),
            )

        pairs = materialize_bounded(
            sym_edges.map_batches(accept, batch_format="pyarrow"), num_parts
        )
        n_edges = int(pairs.count())
        if n_edges == 0:
            rows.append({"p_ppm": int(p), "n_edges": 0, "n_nodes": 0,
                         "n_components": 0, "giant": 0})
            continue

        def explode(t: pa.Table) -> pa.Table:
            ids = pa.concat_arrays(
                [t["doc_a"].combine_chunks(), t["doc_b"].combine_chunks()]
            )
            return pa.table(
                {"doc_id": ids,
                 "one": pa.array(np.ones(len(ids), dtype=np.int64))},
                schema=pa.schema([("doc_id", pa.int64()),
                                  ("one", pa.int64())]),
            )

        touched = materialize_bounded(
            hash_aggregate(
                pairs.map_batches(explode, batch_format="pyarrow"),
                ["doc_id"], "one", op="min", num_parts=num_parts,
            ).map_batches(lambda t: t.select(["doc_id"]),
                          batch_format="pyarrow"),
            num_parts,
        )
        labels = dedup_clusters(touched, pairs=pairs, num_parts=num_parts)

        def csize(df: pd.DataFrame) -> pd.DataFrame:
            if not len(df):
                return pd.DataFrame({"cluster": pd.Series([], dtype=np.int64),
                                     "c": pd.Series([], dtype=np.int64)})
            g = df.groupby("cluster", sort=False).size().reset_index(name="c")
            g["c"] = g["c"].astype(np.int64)
            return g

        sizes = hash_aggregate(
            labels.map_batches(csize, batch_format="pandas"),
            ["cluster"], "c", op="sum", num_parts=num_parts,
        ).materialize()
        rows.append(
            {"p_ppm": int(p), "n_edges": n_edges,
             "n_nodes": int(touched.count()),
             "n_components": int(sizes.count()),
             "giant": int(sizes.max("c"))}
        )
    out = pd.DataFrame(rows)
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("p_ppm").reset_index(drop=True)


def densest_subgraph_profile(
    sym_edges: rd.Dataset,
    rounds: int = 8,
    num_parts: int = 32,
) -> pd.DataFrame:
    """Charikar greedy-peeling profile — densest-subgraph 2-approx.

    Charikar's parallel peeling ("Greedy approximation algorithms for
    finding dense components in a graph", APPROX 2000; the batched
    variant of Bahmani, Kumar & Vassilvitskii, VLDB 2012): each round
    removes EVERY node whose degree is ≤ the floor of the current
    average degree (``2E // V`` — at least the minimum-degree node, so
    progress is guaranteed and the surviving vertex sets halve
    geometrically).  The best-density round over the peel is the
    classic 2-approximation; emitting the whole profile gives the
    density-vs-size curve (the k-core decomposition's dual view).

    One row per executed round: ``(round, v_alive, e_alive, thr,
    density_ppm)`` with ``density_ppm = E·10⁶ // V`` over the
    round-START subgraph, all exact integers; alive = incident to a
    surviving edge.

    Scale shape: the edge set stays a hash-partitioned Dataset; each
    round is one degree aggregate plus the two-sided status join of the
    matching/peeling family, loop state bounded via
    ``materialize_bounded``.
    """
    import pyarrow as pa

    from graph_data_science_ray.pipelines.agg import (
        hash_aggregate,
        hash_join,
        materialize_bounded,
    )

    pair_schema = pa.schema([("src", pa.int64()), ("dst", pa.int64())])

    def canon(t: pa.Table) -> pa.Table:
        s = np.asarray(t["src"].to_numpy(zero_copy_only=False), dtype=np.int64)
        d = np.asarray(t["dst"].to_numpy(zero_copy_only=False), dtype=np.int64)
        keep = s < d
        return pa.table({"src": s[keep], "dst": d[keep]}, schema=pair_schema)

    edges = materialize_bounded(
        sym_edges.map_batches(canon, batch_format="pyarrow"), num_parts
    )

    def ends(t: pa.Table) -> pa.Table:
        ids = pa.concat_arrays(
            [t["src"].combine_chunks(), t["dst"].combine_chunks()]
        )
        return pa.table(
            {"node": ids, "d": pa.array(np.ones(len(ids), dtype=np.int64))},
            schema=pa.schema([("node", pa.int64()), ("d", pa.int64())]),
        )

    rows = []
    for r in range(int(rounds)):
        E = int(edges.count())
        if E == 0:
            break
        deg = materialize_bounded(
            hash_aggregate(
                edges.map_batches(ends, batch_format="pyarrow"),
                ["node"], "d", op="sum", num_parts=num_parts,
            ).map_batches(lambda t: t, batch_format="pyarrow"),
            num_parts,
        )
        V = int(deg.count())
        thr = (2 * E) // V
        rows.append(
            {"round": r, "v_alive": V, "e_alive": E, "thr": thr,
             "density_ppm": E * 1_000_000 // V}
        )

        def status(t: pa.Table, _thr=thr) -> pa.Table:
            d = np.asarray(t["d"].to_numpy(zero_copy_only=False),
                           dtype=np.int64)
            return pa.table(
                {"node": t["node"],
                 "f": (d <= _thr).astype(np.int64)},
                schema=pa.schema([("node", pa.int64()), ("f", pa.int64())]),
            )

        st = deg.map_batches(status, batch_format="pyarrow")
        e1 = hash_join(
            edges, st.map_batches(
                lambda t: t.rename_columns(["node", "fs"]),
                batch_format="pyarrow",
            ),
            on=["src"], right_on=["node"], num_parts=num_parts,
            left_schema=pair_schema,
            right_schema=pa.schema([("node", pa.int64()), ("fs", pa.int64())]),
        )
        e2 = hash_join(
            e1, st.map_batches(
                lambda t: t.rename_columns(["node", "fd"]),
                batch_format="pyarrow",
            ),
            on=["dst"], right_on=["node"], num_parts=num_parts,
            left_schema=pa.schema(
                [("src", pa.int64()), ("dst", pa.int64()), ("fs", pa.int64())]
            ),
            right_schema=pa.schema([("node", pa.int64()), ("fd", pa.int64())]),
        )
        edges = materialize_bounded(
            e2.filter(expr="fs == 0 and fd == 0").map_batches(
                lambda t: t.select(["src", "dst"]), batch_format="pyarrow"
            ),
            num_parts,
        )
    out = pd.DataFrame(rows)
    if not len(out):
        out = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in
                            ["round", "v_alive", "e_alive", "thr",
                             "density_ppm"]})
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out

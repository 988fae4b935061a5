"""K-truss decomposition — iterative support peeling, exact.

The k-truss (Cohen 2008) is the maximal subgraph in which every edge
participates in at least ``k - 2`` triangles; it is the standard
cohesive-core refinement of triangle counting (stronger than k-core)
used for community seeding and spam/link-farm detection on web-scale
link graphs.

Reference scope note: the reference engine (Neo4j GDS) has no k-truss
surface; this extends the engine's triangle family
(``functions/triangles.py``, whose degree-ordered wedge-close machinery
this reuses edge-wise) per the build brief.

Distributed formulation: each peel round recomputes per-EDGE support
with the triangle pipeline's shape — degree-order orientation bounds a
node's forward degree by ~sqrt(2m); wedges are generated per
hash(src) partition with repeat/arange vector ops and closed in-task
against the broadcast sorted forward-edge key array; each closed wedge
emits its THREE forward edge keys, tallied per chunk and hash-summed.
Edges with ``support < k - 2`` drop; the loop ends at the fixpoint (a
round that drops nothing) or after ``max_rounds``. Every round's edge
set is loop-carried through ``materialize_bounded`` (the repo's
geometric-block-growth guard).

Determinism/oracle contract: peeling is deterministic (no tie-breaks —
the whole sub-threshold batch drops each round), so the surviving edge
set and its final support table after a pinned round cap are
bit-reproducible in SQL: the driver oracle replays every round with
materialized CTEs (post-fixpoint rounds are no-ops, the repo's
fixed-round convention for every iterative oracle, ROADMAP.md).
"""

from __future__ import annotations

import functools

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from graph_data_science_ray._util import splitmix64
from graph_data_science_ray.functions.triangles import (
    _sorted_key_array,
    _wedge_arrays,
)
from graph_data_science_ray.pipelines.agg import (
    hash_aggregate,
    materialize_bounded,
)

__all__ = ["edge_support", "k_truss"]

_CHUNK_PAIRS = 4_000_000


@ray.remote
def _keys_of(t) -> np.ndarray:
    """Key column of one block (arrow or pandas), tolerating schema-less
    empty blocks."""
    cols = t.column_names if isinstance(t, pa.Table) else t.columns
    if "key" not in cols or len(t) == 0:
        return np.zeros(0, dtype=np.int64)
    if isinstance(t, pa.Table):
        return t["key"].to_numpy(zero_copy_only=False).astype(np.int64)
    return t["key"].to_numpy(dtype=np.int64)


def _support_in_part(
    g: pd.DataFrame, V: int, deg_ref, ekeys_ref
) -> pd.DataFrame:
    """Close this partition's wedges against the broadcast forward-edge
    key set; emit (ekey, cnt) partials — one tally per TRIANGLE EDGE
    (the per-edge variant of triangles._count_in_part)."""
    empty = pd.DataFrame(
        {"ekey": np.zeros(0, dtype=np.int64), "cnt": np.zeros(0, dtype=np.int64)}
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
        if not match.any():
            continue
        keys3 = np.concatenate(
            [c[match] * V + lo[match], c[match] * V + hi[match], key[match]]
        )
        u, cnt = np.unique(keys3, return_counts=True)
        parts.append(pd.DataFrame({"ekey": u, "cnt": cnt.astype(np.int64)}))
    if not parts:
        return empty
    out = pd.concat(parts, ignore_index=True)
    return out.groupby("ekey", sort=False)["cnt"].sum().reset_index()


def edge_support(
    cur: rd.Dataset, V: int, num_partitions: int = 64
) -> rd.Dataset:
    """Per-edge triangle support over a canonical (``src < dst``) edge
    Dataset → ``(src, dst, support)`` with zero-fill, canonical order
    preserved. One degree pass, one wedge shuffle, one support
    hash-sum; wedges close in-task against the broadcast key array."""
    P = max(4, int(num_partitions))

    if cur.count() == 0:  # peeled to nothing: typed-empty result
        return rd.from_pandas(
            pd.DataFrame(
                {
                    "src": pd.Series([], dtype=np.int64),
                    "dst": pd.Series([], dtype=np.int64),
                    "support": pd.Series([], dtype=np.int64),
                }
            )
        )

    # degrees within the CURRENT surviving graph (each canonical edge
    # contributes to both endpoints) — drives the per-round orientation
    def deg_partial(t: pa.Table) -> pa.Table:
        if "src" not in t.column_names or len(t) == 0:
            return pa.table(
                {"node": pa.array([], type=pa.int64()),
                 "deg": pa.array([], type=pa.int64())}
            )
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        u, cnt = np.unique(np.concatenate([s, d]), return_counts=True)
        return pa.table({"node": pa.array(u), "deg": pa.array(cnt.astype(np.int64))})

    deg_rows = hash_aggregate(
        cur.map_batches(deg_partial, batch_format="pyarrow"),
        ["node"], "deg", op="sum", num_parts=min(P, 16),
    ).to_pandas()
    deg = np.zeros(V, dtype=np.int64)
    deg[deg_rows["node"].to_numpy(dtype=np.int64)] = deg_rows["deg"].to_numpy(
        dtype=np.int64
    )
    deg_ref = ray.put(deg)

    # forward orientation by (deg, id) over the canonical pairs
    def fwd(t: pa.Table) -> pa.Table:
        if "src" not in t.column_names or len(t) == 0:
            return pa.table(
                {"src": pa.array([], type=pa.int64()),
                 "dst": pa.array([], type=pa.int64())}
            )
        d = ray.get(deg_ref)
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        swap = (d[v] < d[s]) | ((d[v] == d[s]) & (v < s))
        return pa.table(
            {
                "src": pa.array(np.where(swap, v, s)),
                "dst": pa.array(np.where(swap, s, v)),
            }
        )

    fwd_ds = cur.map_batches(fwd, batch_format="pyarrow").materialize()

    def edge_keys(t: pa.Table) -> pa.Table:
        if "src" not in t.column_names or len(t) == 0:
            return pa.table({"key": pa.array([], type=pa.int64())})
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"key": pa.array(s * V + d)})

    # to_arrow_refs + tolerant extraction: a repartitioned edge set can
    # carry schema-less EMPTY blocks that break to_numpy_refs(column=)
    refs = fwd_ds.map_batches(edge_keys, batch_format="pyarrow").to_arrow_refs()
    key_refs = [_keys_of.remote(r) for r in refs]
    ekeys_ref = _sorted_key_array.remote(*key_refs)

    def tag_src(t: pa.Table) -> pa.Table:
        if "src" not in t.column_names or len(t) == 0:
            return pa.table(
                {"src": pa.array([], type=pa.int64()),
                 "dst": pa.array([], type=pa.int64()),
                 "part": pa.array([], type=pa.int64())}
            )
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.uint64)
        part = (splitmix64(s) % np.uint64(P)).astype(np.int64)
        return pa.table({"src": t["src"], "dst": t["dst"], "part": pa.array(part)})

    sup = hash_aggregate(
        fwd_ds.map_batches(tag_src, batch_format="pyarrow")
        .groupby("part")
        .map_groups(
            functools.partial(_support_in_part, V=V, deg_ref=deg_ref,
                              ekeys_ref=ekeys_ref),
            batch_format="pandas",
        ),
        ["ekey"], "cnt", op="sum", num_parts=min(P, 16),
    )

    # join support back onto the canonical edges (zero-fill): hash the
    # forward key on the edge side, merge per partition
    sup_tagged = sup.map_batches(
        lambda df: df.assign(
            __p=(
                splitmix64(df["ekey"].to_numpy(dtype=np.int64).astype(np.uint64))
                % np.uint64(16)
            ).astype(np.int64)
        ),
        batch_format="pandas",
    )

    def edge_with_key(t: pa.Table) -> pa.Table:
        if "src" not in t.column_names or len(t) == 0:
            return pa.table(
                {"src": pa.array([], type=pa.int64()),
                 "dst": pa.array([], type=pa.int64()),
                 "ekey": pa.array([], type=pa.int64()),
                 "__p": pa.array([], type=pa.int64())}
            )
        d = ray.get(deg_ref)
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        swap = (d[v] < d[s]) | ((d[v] == d[s]) & (v < s))
        fs = np.where(swap, v, s)
        fd = np.where(swap, s, v)
        ekey = fs * V + fd
        part = (splitmix64(ekey.astype(np.uint64)) % np.uint64(16)).astype(
            np.int64
        )
        return pa.table(
            {
                "src": pa.array(np.minimum(s, v)),
                "dst": pa.array(np.maximum(s, v)),
                "ekey": pa.array(ekey),
                "__p": pa.array(part),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["__side"] == 0].drop(columns=["cnt"])
        right = g[g["__side"] == 1][["ekey", "cnt"]]
        out = left.merge(right, on="ekey", how="left")
        out["support"] = out["cnt"].fillna(0).astype(np.int64)
        return out[["src", "dst", "support"]]

    edge_side = cur.map_batches(edge_with_key, batch_format="pyarrow").map_batches(
        lambda df: df.assign(__side=0, cnt=np.int64(0)),
        batch_format="pandas",
    )
    sup_side = sup_tagged.map_batches(
        lambda df: pd.DataFrame(
            {
                "src": np.zeros(len(df), dtype=np.int64),
                "dst": np.zeros(len(df), dtype=np.int64),
                "ekey": df["ekey"].to_numpy(dtype=np.int64),
                "__p": df["__p"].to_numpy(dtype=np.int64),
                "__side": np.ones(len(df), dtype=np.int64),
                "cnt": df["cnt"].to_numpy(dtype=np.int64),
            }
        ),
        batch_format="pandas",
    )
    return (
        edge_side.union(sup_side)
        .groupby("__p")
        .map_groups(
            lambda g: merge(g.drop(columns="__p")), batch_format="pandas"
        )
    )


def k_truss(
    sym_edges: rd.Dataset,
    k: int,
    node_count: int,
    max_rounds: int = 16,
    num_partitions: int = 64,
) -> tuple[rd.Dataset, int]:
    """The k-truss of a symmetrized encoded edge Dataset.

    Returns ``(Dataset(src, dst, support), rounds_used)`` — the
    surviving canonical edges with their support measured IN the
    surviving subgraph. ``rounds_used`` counts peel rounds executed;
    the fixpoint is reached when a round drops nothing (then the last
    measured support table is final). ``max_rounds`` pins the oracle
    round cap — post-fixpoint rounds are no-ops on both sides.
    """
    V = int(node_count)
    thresh = int(k) - 2

    # canonicalize (src < dst); symmetric input carries each edge twice
    cur = materialize_bounded(
        sym_edges.map_batches(
            lambda t: t.filter(
                pa.compute.less(t["src"], t["dst"])
            ).select(["src", "dst"]),
            batch_format="pyarrow",
        ),
        num_parts=min(num_partitions, 16),
    )
    n_cur = cur.count()
    rounds = 0
    while rounds < int(max_rounds):
        sup = materialize_bounded(
            edge_support(cur, V, num_partitions),
            num_parts=min(num_partitions, 16),
        )
        rounds += 1
        kept = materialize_bounded(
            sup.map_batches(
                lambda df, *, th=thresh: df[df["support"] >= th][
                    ["src", "dst"]
                ],
                batch_format="pandas",
            ),
            num_parts=min(num_partitions, 16),
        )
        n_kept = kept.count()
        if n_kept == n_cur:
            return sup, rounds  # fixpoint: last measurement is final
        cur, n_cur = kept, n_kept
        if n_cur == 0:
            break
    # round cap reached (or emptied): one final measurement on the
    # surviving set — mirrors the oracle's trailing support computation
    return edge_support(cur, V, num_partitions), rounds

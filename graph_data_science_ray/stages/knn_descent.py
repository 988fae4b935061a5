"""KNN via NN-Descent — iterative neighbor-of-neighbor refinement.

Reference: similarity/src/main/java/org/neo4j/gds/similarity/knn/Knn.java:37
(NN-Descent with random init and sampling, Dong et al. WWW'11). Shape:

1. init: every vector gets k random (seeded, deterministic) candidates;
2. per round: propose neighbor-of-neighbor pairs (self-join of the
   current candidate lists through the shared middle vector), fetch both
   endpoint vectors by **hash-joining the pair list against the embedding
   table** (by id — the vector matrix is never collected or broadcast),
   score per batch (vectorized cosine), keep the per-node top-k of
   old ∪ new via a hash-partitioned group top-k; stop when the candidate
   set's digest stops changing (or max_rounds);
3. output (query_id, neighbor_id, rank, sim).

Everything is Dataset ops; the driver holds only per-round counters and
a 64-bit digest. At 100 TB the vector payload rides the candidate-pair
shuffles (2 vectors per proposal), the textbook distributed NN-Descent
cost model.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from graph_data_science_ray._util import mix2, splitmix64
from graph_data_science_ray.pipelines.agg import _stable_row_hash, hash_join


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.where(n > 0, n, 1.0)


def _score_pairs(pairs: rd.Dataset, emb_a: rd.Dataset, emb_b: rd.Dataset,
                 num_parts: int, pair_schema, vec_type) -> rd.Dataset:
    """(a, b) id pairs → (a, b, sim) by joining both endpoint vectors.

    Schemas are passed explicitly so the joins never probe (probing would
    partially execute the pair pipeline an extra time per round)."""
    import pyarrow as pa

    j = hash_join(
        pairs, emb_a, on=["a"], num_parts=num_parts,
        left_schema=pair_schema,
        right_schema=pa.schema([("a", pa.int64()), ("vec_a", vec_type)]),
    )
    mid_schema = pa.schema(
        list(zip(pair_schema.names, pair_schema.types)) + [("vec_a", vec_type)]
    )
    j = hash_join(
        j, emb_b, on=["b"], num_parts=num_parts,
        left_schema=mid_schema,
        right_schema=pa.schema([("b", pa.int64()), ("vec_b", vec_type)]),
    )

    def score(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {"a": pd.Series([], dtype=np.int64),
                 "b": pd.Series([], dtype=np.int64),
                 "sim": pd.Series([], dtype=np.float64)}
            )
        va = _normalize(np.stack([np.asarray(v, dtype=np.float64) for v in df["vec_a"]]))
        vb = _normalize(np.stack([np.asarray(v, dtype=np.float64) for v in df["vec_b"]]))
        sim = np.round(np.einsum("ij,ij->i", va, vb), 6)
        return pd.DataFrame(
            {"a": df["a"].astype(np.int64), "b": df["b"].astype(np.int64), "sim": sim}
        )

    return j.map_batches(score, batch_format="pandas")


def _topk(scored: rd.Dataset, k: int, num_parts: int = 32) -> rd.Dataset:
    """Per-node top-k of the symmetric closure of scored pairs."""

    def symm_tag(df: pd.DataFrame) -> pd.DataFrame:
        both = pd.concat(
            [df, df.rename(columns={"a": "b", "b": "a"})], ignore_index=True
        )
        both["__part"] = (_stable_row_hash(both, ["a"]) % num_parts).astype(np.int64)
        return both

    def keep_k(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(subset=["a", "b"])
        g = g.sort_values(["a", "sim", "b"], ascending=[True, False, True],
                          kind="mergesort")
        return g.groupby("a", sort=False).head(k)[["a", "b", "sim"]]

    return (
        scored.map_batches(symm_tag, batch_format="pandas")
        .groupby("__part")
        .map_groups(keep_k, batch_format="pandas")
    )


def _digest(current: rd.Dataset) -> tuple[int, int]:
    """(row_count, order-independent 64-bit digest) of the (a,b) set."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        with np.errstate(over="ignore"):
            h = splitmix64(
                df["a"].to_numpy(dtype=np.int64).astype(np.uint64)
                * np.uint64(0x9E3779B97F4A7C15)
                ^ df["b"].to_numpy(dtype=np.int64).astype(np.uint64)
            )
            s = np.uint64(0)
            for v in (np.bitwise_xor.reduce(h) if len(h) else np.uint64(0),):
                s ^= v
        return pd.DataFrame({"x": [int(s)], "n": [len(df)]})

    agg = current.map_batches(partial, batch_format="pandas").to_pandas()
    x = 0
    for v in agg["x"]:
        x ^= int(v)
    return int(agg["n"].sum()), x


def knn_descent(
    embeddings: rd.Dataset,
    k: int = 10,
    max_rounds: int = 6,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Approximate cosine top-k for every vector; returns
    (query_id, neighbor_id, rank, sim)."""
    import ray as _ray

    try:
        P = int(_ray.cluster_resources().get("CPU", 4))
    except Exception:
        P = 4
    P = max(4, min(32, P))  # shuffle width scaled to the cluster
    emb = embeddings.select_columns([id_col, vec_col]).materialize()
    # id vocabulary only (no vectors) — needed to draw random init partners
    ids = np.sort(
        emb.select_columns([id_col]).to_pandas()[id_col].to_numpy(dtype=np.int64)
    )
    n = len(ids)
    ids_ref = ray.put(ids)

    import pyarrow as pa

    def _rename(t: pa.Table, idn: str, vn: str) -> pa.Table:
        vec = t[vec_col]
        if isinstance(vec.type, pa.ExtensionType):
            vec = pa.chunked_array([c.storage for c in vec.chunks])
        if pa.types.is_fixed_size_list(vec.type):
            vec = vec.cast(pa.list_(vec.type.value_type))
        return pa.table({idn: t[id_col].cast(pa.int64()), vn: vec})

    import functools

    emb_a = emb.map_batches(
        functools.partial(_rename, idn="a", vn="vec_a"), batch_format="pyarrow"
    ).materialize()
    emb_b = emb.map_batches(
        functools.partial(_rename, idn="b", vn="vec_b"), batch_format="pyarrow"
    ).materialize()
    vec_type = emb_a.schema().types[1]
    PAIR_SCHEMA = pa.schema([("a", pa.int64()), ("b", pa.int64())])

    # deterministic random init: k draws per node, generated distributedly
    # over the id table (positions drawn via the seeded mix)
    def init_pairs(df: pd.DataFrame) -> pd.DataFrame:
        all_ids = ray.get(ids_ref)
        my = df[id_col].to_numpy(dtype=np.int64)
        pos = np.searchsorted(all_ids, my)
        reps_pos = np.repeat(pos, k)
        reps_id = np.repeat(my, k)
        slots = np.tile(np.arange(k, dtype=np.int64), len(my))
        cand_pos = (mix2(seed, reps_pos, slots) % np.uint64(len(all_ids))).astype(np.int64)
        cand = all_ids[cand_pos]
        good = cand != reps_id
        return pd.DataFrame({"a": reps_id[good], "b": cand[good]})

    pairs = emb.select_columns([id_col]).map_batches(init_pairs, batch_format="pandas")
    current = _topk(_score_pairs(pairs, emb_a, emb_b, P, PAIR_SCHEMA, vec_type), k, num_parts=P).materialize()
    cur_n, cur_digest = _digest(current)

    for _ in range(max_rounds):
        # neighbor-of-neighbor proposals through the shared middle node
        def tag_mid(df: pd.DataFrame) -> pd.DataFrame:
            df = df[["a", "b"]].copy()
            df["__part"] = (_stable_row_hash(df, ["b"]) % P).astype(np.int64)
            return df

        def propose(g: pd.DataFrame) -> pd.DataFrame:
            outs = []
            for _, grp in g.groupby("b", sort=False):
                nodes = grp["a"].to_numpy(dtype=np.int64)
                if len(nodes) < 2 or len(nodes) > 200:
                    continue
                x, y = np.triu_indices(len(nodes), k=1)
                outs.append(pd.DataFrame({"a": nodes[x], "b": nodes[y]}))
            if not outs:
                return pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                                     "b": pd.Series([], dtype=np.int64)})
            out = pd.concat(outs, ignore_index=True)
            return out[out["a"] != out["b"]]

        # no distinct pass: duplicate proposals re-score harmlessly and
        # are dropped in _topk's per-group dedup — one fewer shuffle/round
        proposals = (
            current.map_batches(tag_mid, batch_format="pandas")
            .groupby("__part")
            .map_groups(propose, batch_format="pandas")
        )
        scored_new = _score_pairs(proposals, emb_a, emb_b, P, PAIR_SCHEMA, vec_type)
        merged = _topk(current.select_columns(["a", "b", "sim"]).union(scored_new), k, num_parts=P)
        merged = merged.materialize()
        new_n, new_digest = _digest(merged)
        current = merged
        if (new_n, new_digest) == (cur_n, cur_digest):
            break
        cur_n, cur_digest = new_n, new_digest

    out = current.to_pandas().rename(columns={"a": "query_id", "b": "neighbor_id"})
    out = out.sort_values(
        ["query_id", "sim", "neighbor_id"], ascending=[True, False, True],
        kind="mergesort",
    ).reset_index(drop=True)
    out["rank"] = out.groupby("query_id").cumcount() + 1
    return out[["query_id", "neighbor_id", "rank", "sim"]]

"""KNN via NN-Descent — iterative neighbor-of-neighbor refinement.

Reference: similarity/src/main/java/org/neo4j/gds/similarity/knn/Knn.java:37
(NN-Descent with random init and sampling, Dong et al. WWW'11). Shape:

1. init: every vector gets k random (seeded, deterministic) candidates;
2. per round: propose neighbor-of-neighbor pairs (self-join of the
   current candidate lists through the shared middle vector), score the
   proposals per batch (vectorized cosine), keep the per-node top-k of
   old ∪ new; stop when a round improves nothing (or max_rounds);
3. output (query_id, neighbor_id, rank, sim).

All heavy steps are Dataset ops: the proposal join is a groupby on the
middle id; scoring is a broadcast-free pairwise batch kernel (vectors
join back by id through a broadcast matrix — fine for embedding tables
that fit the object store; the disk-backed variant shards the matrix).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from graph_data_science_ray._util import mix2
from graph_data_science_ray.pipelines.agg import hash_distinct


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.where(n > 0, n, 1.0)


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
    df = embeddings.select_columns([id_col, vec_col]).to_pandas().sort_values(id_col)
    ids = df[id_col].to_numpy(dtype=np.int64)
    mat = _normalize(np.stack([np.asarray(v, dtype=np.float64) for v in df[vec_col]]))
    n = len(ids)
    mat_ref = ray.put(mat)
    id_pos = {int(v): i for i, v in enumerate(ids)}

    # deterministic random init: k draws per node
    reps = np.repeat(np.arange(n, dtype=np.int64), k)
    slots = np.tile(np.arange(k, dtype=np.int64), n)
    cand = (mix2(seed, reps, slots) % np.uint64(n)).astype(np.int64)
    good = cand != reps
    pairs = pd.DataFrame({"a": reps[good], "b": cand[good]})

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(mat_ref)
        a = batch["a"].to_numpy(dtype=np.int64)
        b = batch["b"].to_numpy(dtype=np.int64)
        sim = np.round(np.einsum("ij,ij->i", m[a], m[b]), 6)
        return pd.DataFrame({"a": a, "b": b, "sim": sim})

    def topk(scored: pd.DataFrame) -> pd.DataFrame:
        # symmetric candidates: each scored pair serves both endpoints
        both = pd.concat(
            [scored, scored.rename(columns={"a": "b", "b": "a"})], ignore_index=True
        )
        both = both.drop_duplicates(subset=["a", "b"])
        both = both.sort_values(["a", "sim", "b"], ascending=[True, False, True],
                                kind="mergesort")
        return both.groupby("a", sort=False).head(k)

    current = topk(score(pairs))
    for _ in range(max_rounds):
        # neighbor-of-neighbor proposals through the shared middle node
        ds = rd.from_pandas(current[["a", "b"]])

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
            return pd.concat(outs, ignore_index=True)

        import pandas as _pd

        from graph_data_science_ray.pipelines.agg import _stable_row_hash

        def tag(t: _pd.DataFrame) -> _pd.DataFrame:
            t = t.copy()
            t["__part"] = (_stable_row_hash(t, ["b"]) % 32).astype(np.int64)
            return t

        proposals = (
            ds.map_batches(tag, batch_format="pandas")
            .groupby("__part")
            .map_groups(propose, batch_format="pandas")
        )
        proposals = hash_distinct(proposals, ["a", "b"]).to_pandas()
        if not len(proposals) or "a" not in proposals.columns:
            break
        proposals = proposals[proposals["a"] != proposals["b"]]
        scored_new = score(proposals)
        merged = topk(pd.concat([current, scored_new], ignore_index=True))
        # convergence: candidate sets unchanged
        if len(merged) == len(current) and np.array_equal(
            merged[["a", "b"]].to_numpy(), current[["a", "b"]].to_numpy()
        ):
            current = merged
            break
        current = merged

    out = current.rename(columns={"a": "query_id", "b": "neighbor_id"}).copy()
    out["rank"] = out.groupby("query_id").cumcount() + 1
    # translate positions back to ids
    out["query_id"] = ids[out["query_id"].to_numpy(dtype=np.int64)]
    out["neighbor_id"] = ids[out["neighbor_id"].to_numpy(dtype=np.int64)]
    return out[["query_id", "neighbor_id", "rank", "sim"]].reset_index(drop=True)

"""Knowledge-graph-embedding link prediction — TransE / DistMult top-k.

Reference: proc/machine-learning/src/main/java/org/neo4j/gds/ml/kge/
TopKMapComputer.java:40 (stream top-k predicted links per source node)
with the two scoring functions of .../kge/ScoreFunction.java:

* TransE  (Bordes et al., "Translating embeddings for modeling
  multi-relational data", NeurIPS 2013): score(h, r, t) = −‖h + r − t‖₂
  — ranked here through the repo's established similarity contract
  ``sim = 1 / (1 + dist)`` so higher is better;
* DistMult (Yang et al., "Embedding entities and relations for learning
  and inference in knowledge bases", ICLR 2015):
  score(h, r, t) = Σᵢ hᵢ·rᵢ·tᵢ.

Ranking contract (same as ``stages/similarity.py`` brute-force KNN —
the exact-oracle recipe): ``round(sim, 6)`` descending, candidate id
ascending — a total, SQL-replayable order; output is (query_id,
target_id, rank), rank 1..k.

Scale shape: the head matrix (Q×d) and relation vector ride the object
store once (``ray.put`` broadcast); candidate tails stream through
``map_batches`` with per-batch partial top-k (Q·k rows per block), so
the corpus never materializes and the driver folds an answer-sized
Q·k·#blocks partial table.  For corpus-scale candidate sets compose
with the IVF/LSH bucketing in ``stages/similarity.py`` exactly as the
KNN family does.
"""

from __future__ import annotations

import functools

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from graph_data_science_ray.stages.similarity import _stack


def _kge_score_batch(
    batch: pd.DataFrame, *, q_ref, k: int, score: str, exclude_self: bool
) -> pd.DataFrame:
    q = ray.get(q_ref)
    q_ids, hr, hw = q["ids"], q["hr"], q["hw"]
    ids = batch["vec_id"].to_numpy(dtype=np.int64)
    t = _stack(batch["embedding"])
    if score == "transe":
        # ‖(h+r) − t‖ via the expanded form (matches the euclidean
        # KNN contract's float path)
        d2 = (
            (hr**2).sum(axis=1)[:, None]
            + (t**2).sum(axis=1)[None, :]
            - 2.0 * (hr @ t.T)
        )
        sims = 1.0 / (1.0 + np.sqrt(np.maximum(d2, 0.0)))
    elif score == "distmult":
        sims = hw @ t.T  # hw = h ⊙ r, so (hw @ t) = Σ h·r·t
    else:
        raise ValueError(score)
    out_q, out_n, out_s = [], [], []
    for qi, qid in enumerate(q_ids):
        s = np.round(sims[qi], 6)
        if exclude_self:
            s = np.where(ids == qid, -np.inf, s)
        kk = min(k, len(ids))
        order = np.lexsort((ids, -s))[:kk]
        keep = s[order] > -np.inf
        order = order[keep]
        out_q.extend([qid] * len(order))
        out_n.extend(ids[order])
        out_s.extend(s[order])
    return pd.DataFrame(
        {
            "query_id": np.asarray(out_q, dtype=np.int64),
            "target_id": np.asarray(out_n, dtype=np.int64),
            "sim": np.asarray(out_s, dtype=np.float64),
        }
    )


def kge_topk(
    embeddings: rd.Dataset,
    query_ids: np.ndarray,
    rel_id: int = 0,
    rel_scale: float = 0.1,
    k: int = 5,
    score: str = "transe",
    exclude_self: bool = True,
) -> pd.DataFrame:
    """Top-k predicted links per source under TransE or DistMult.

    The relation embedding is ``rel_scale ×`` the embedding of
    ``rel_id`` — a deterministic stand-in for a trained relation vector
    (swap in a model-catalog vector in production; the scoring and
    ranking machinery is identical).  Returns ``(query_id, target_id,
    rank)`` with rank 1..k in (sim desc, target_id asc) order.
    """
    query_ids = np.asarray(query_ids, dtype=np.int64)
    want = np.unique(np.append(query_ids, np.int64(rel_id)))
    qdf = (
        embeddings.filter(expr=f"vec_id in {want.tolist()}")
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    mat = _stack(qdf["embedding"])
    ids = qdf["vec_id"].to_numpy(dtype=np.int64)
    r = rel_scale * mat[np.searchsorted(ids, rel_id)]
    sel = np.isin(ids, query_ids)
    h = mat[sel]
    q_ref = ray.put(
        {"ids": ids[sel], "hr": h + r[None, :], "hw": h * r[None, :]}
    )
    partials = embeddings.map_batches(
        functools.partial(
            _kge_score_batch, q_ref=q_ref, k=k, score=score,
            exclude_self=exclude_self,
        ),
        batch_format="pandas",
        batch_size=4096,
    ).to_pandas()
    out = []
    for qid, g in partials.groupby("query_id"):
        g = g.sort_values(
            ["sim", "target_id"], ascending=[False, True], kind="mergesort"
        )
        top = g.head(k).reset_index(drop=True)
        top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
        out.append(top)
    if not out:
        return pd.DataFrame(
            {
                "query_id": pd.Series([], dtype=np.int64),
                "target_id": pd.Series([], dtype=np.int64),
                "rank": pd.Series([], dtype=np.int64),
            }
        )
    res = pd.concat(out, ignore_index=True)
    return res[["query_id", "target_id", "rank"]].sort_values(
        ["query_id", "rank"]
    ).reset_index(drop=True)

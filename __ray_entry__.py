"""Driver contract for the graft builder (Ray Data target).

``queries()`` exposes the engine's operators over the driver testdata;
``oracle_sql()`` gives the DuckDB-equivalent SQL for each (same column
names, same rounding, same tie-breaks). The graph queries run the full
pipeline: events → transcript view → actor-interaction edge table →
dense ids → partitioned CSR → algorithm; the oracles re-derive the same
graph in SQL (window + join + recursive CTEs).

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd

# --------------------------------------------------------------------------
# shared graph-pipeline bundle per sf_dir (queries are called one by one)
# --------------------------------------------------------------------------

_BUNDLES: dict[str, dict] = {}

# iteration synchronization with the SQL oracles:
_PR_ITERS = 20  # Jacobi message rounds (engine max_iterations = _PR_ITERS + 1)
_LP_ROUNDS = 10
_K1_ROUNDS = 8  # pinned recolor rounds (post-fixpoint rounds are no-ops)
_FRP_DIM = 8  # fastrp_exact dimensions
_FRP_ROUNDS = 2  # fastrp_exact propagation rounds


def _strip(keys) -> np.ndarray:
    """'role:123' actor keys -> '123' (the events adapter uses role keys)."""
    return np.array([k.split(":", 1)[1] for k in keys], dtype=object)


def _bundle(sf_dir: str) -> dict:
    if sf_dir in _BUNDLES:
        return _BUNDLES[sf_dir]
    import graph_data_science_ray as gdsr

    from graph_data_science_ray.pipelines.edges import derive_edges_encoded_grouped

    ts = gdsr.events_as_transcripts(sf_dir)
    turns = gdsr.derive_turns(ts).materialize()
    idmap = gdsr.IdMap.from_turns(turns)
    enc = derive_edges_encoded_grouped(turns, idmap, num_partitions=8).materialize()
    sym = gdsr.symmetrize(enc, num_partitions=8).materialize()
    root = tempfile.mkdtemp(prefix="gdsr-entry-", dir="/tmp")
    gd = gdsr.GraphStore.project(
        enc, os.path.join(root, "gd"), idmap=idmap, num_partitions=8, directed=True
    )
    gu = gdsr.GraphStore.project(
        sym, os.path.join(root, "gu"), idmap=idmap, num_partitions=8, directed=False
    )
    from graph_data_science_ray.pipelines.transforms import reverse_edges

    grev = gdsr.GraphStore.project(
        reverse_edges(enc), os.path.join(root, "grev"), idmap=idmap,
        directed=True, boundaries=gd.boundaries,
    )
    b = {"idmap": idmap, "enc": enc, "sym": sym, "gd": gd, "gu": gu, "grev": grev}
    _BUNDLES[sf_dir] = b
    return b


def _docs(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )


# --------------------------------------------------------------------------
# graph queries
# --------------------------------------------------------------------------


def _q_edges(sf_dir: str) -> pd.DataFrame:
    b = _bundle(sf_dir)
    df = b["enc"].to_pandas()
    keys = b["idmap"].keys
    return pd.DataFrame(
        {
            "src": _strip(keys[df["src"].to_numpy()]),
            "dst": _strip(keys[df["dst"].to_numpy()]),
            "weight": df["weight"].astype(np.float64),
        }
    )


def _q_edges_distributed(sf_dir: str) -> pd.DataFrame:
    """Same edge table as ``edges``, but built with the fully distributed
    IdMap (``idmap_table`` + ``encode_edges_distributed``): the key
    vocabulary never lands on the driver — dense ids come from a
    distributed sort + per-block offsets, and encoding is two hash-joins.
    Shares the ``edges`` oracle; the driver hash-match proves the two
    paths are byte-equivalent."""
    import graph_data_science_ray as gdsr
    from graph_data_science_ray.pipelines.edges import (
        encode_edges_distributed,
        idmap_table,
    )

    ts = gdsr.events_as_transcripts(sf_dir)
    turns = gdsr.derive_turns(ts).materialize()
    ids = idmap_table(turns).materialize()
    enc = encode_edges_distributed(gdsr.derive_edges(turns, 8), ids)
    df = enc.to_pandas()
    # output decode only (V keys, small by the actor-vocabulary contract)
    tbl = ids.to_pandas().sort_values("id")
    keys = tbl["actor"].to_numpy(dtype=object)
    return pd.DataFrame(
        {
            "src": _strip(keys[df["src"].to_numpy()]),
            "dst": _strip(keys[df["dst"].to_numpy()]),
            "weight": df["weight"].astype(np.float64),
        }
    )


def _q_degree(sf_dir: str) -> pd.DataFrame:
    import graph_data_science_ray as gdsr

    b = _bundle(sf_dir)
    deg = gdsr.degree_centrality(b["enc"], idmap=b["idmap"], weighted=True)
    return pd.DataFrame(
        {"node": _strip(deg["node"]), "wdeg": deg["degree"].astype(np.float64)}
    )


def _q_degree_in(sf_dir: str) -> pd.DataFrame:
    """Unweighted in-degree (reference Orientation.REVERSE) — the
    orientation knob of degree centrality, zero-filled over all nodes."""
    import graph_data_science_ray as gdsr

    b = _bundle(sf_dir)
    deg = gdsr.degree_centrality(
        b["enc"], idmap=b["idmap"], weighted=False, orientation="reverse"
    )
    return pd.DataFrame(
        {"node": _strip(deg["node"]), "indeg": deg["degree"].astype(np.int64)}
    )


_TYPED: dict = {}


def _typed_store(sf_dir: str):
    """Cached multi-relationship-type store over the events adapter
    (conversation == event_type == relationship type)."""
    if sf_dir in _TYPED:
        return _TYPED[sf_dir]
    import graph_data_science_ray as gdsr
    from graph_data_science_ray.pipelines.edges import derive_edges_typed
    from graph_data_science_ray.state.typed import TypedGraphStore

    b = _bundle(sf_dir)
    ts = gdsr.events_as_transcripts(sf_dir)
    turns = gdsr.derive_turns(ts).materialize()
    typed = derive_edges_typed(turns, b["idmap"], num_partitions=8)
    root = tempfile.mkdtemp(prefix="gdsr-typed-", dir="/tmp")
    store = TypedGraphStore(typed, root, idmap=b["idmap"], num_partitions=8,
                            directed=True)
    _TYPED[sf_dir] = store
    return store


def _q_typed_edge_counts(sf_dir: str) -> pd.DataFrame:
    """Per-relationship-type edge counts from the multi-type store (the
    reference's GraphStore relationship-type map surface)."""
    out = _typed_store(sf_dir).edge_counts()
    return pd.DataFrame(
        {
            "rel_type": out["rel_type"].astype(str),
            "n_edges": out["n_edges"].astype(np.int64),
            "total_weight": out["total_weight"].astype(np.int64),
        }
    )


def _q_pagerank_typed(sf_dir: str) -> pd.DataFrame:
    """PageRank on a two-type union selection (relationshipTypes=
    ['click','view']) — the reference's getGraph(relTypes) contract."""
    import graph_data_science_ray as gdsr

    store = _typed_store(sf_dir)
    g = store.graph(["click", "view"])
    res = gdsr.pagerank(
        g, damping=0.85, tolerance=0.0, max_iterations=_PR_ITERS + 1, weighted=True
    )
    return pd.DataFrame(
        {"node": _strip(res["node"]), "score": np.round(res["score"].to_numpy(), 6)}
    )


def _q_degree_distribution(sf_dir: str) -> pd.DataFrame:
    """Stats-mode distribution summary of unweighted out-degree (the
    reference's `.stats` mode — PageRankDistributionComputer.java:44):
    one row of n/min/max/mean_ppm + discrete percentiles, computed by a
    distributed sort + order-statistic lookups (no driver column)."""
    import ray.data as rd

    from graph_data_science_ray.pipelines.agg import hash_aggregate
    from graph_data_science_ray.stages.stats import distribution_summary

    b = _bundle(sf_dir)
    ones = b["enc"].map_batches(
        lambda df: pd.DataFrame(
            {"node": df["src"].astype(np.int64),
             "d": np.ones(len(df), dtype=np.int64)}
        ),
        batch_format="pandas",
    )
    base = rd.from_pandas(
        pd.DataFrame(
            {"node": np.arange(len(b["idmap"]), dtype=np.int64),
             "d": np.zeros(len(b["idmap"]), dtype=np.int64)}
        )
    )
    deg = hash_aggregate(base.union(ones), ["node"], "d", op="sum",
                         num_parts=8, out_col="deg")
    return distribution_summary(deg, "deg")


def _q_component_size_distribution(sf_dir: str) -> pd.DataFrame:
    """Stats-mode summary of WCC component sizes (the reference's
    `.stats` community-count histograms) — exact integer order
    statistics via `distribution_summary`."""
    import ray.data as rd

    import graph_data_science_ray as gdsr
    from graph_data_science_ray.pipelines.agg import hash_aggregate
    from graph_data_science_ray.stages.stats import distribution_summary

    b = _bundle(sf_dir)
    comp = gdsr.wcc(b["gu"])
    ds = rd.from_pandas(
        pd.DataFrame(
            {"component": comp["component"].astype(str),
             "one": np.ones(len(comp), dtype=np.int64)}
        )
    )
    sizes = hash_aggregate(ds, ["component"], "one", op="sum",
                           num_parts=8, out_col="sz")
    return distribution_summary(sizes, "sz")


def _q_pagerank(sf_dir: str) -> pd.DataFrame:
    import graph_data_science_ray as gdsr

    b = _bundle(sf_dir)
    res = gdsr.pagerank(
        b["gd"], damping=0.85, tolerance=0.0, max_iterations=_PR_ITERS + 1, weighted=True
    )
    return pd.DataFrame(
        {"node": _strip(res["node"]), "score": np.round(res["score"].to_numpy(), 6)}
    )


def _q_pagerank_distribution(sf_dir: str) -> pd.DataFrame:
    """The reference's PageRankDistributionComputer.java:44 stats mode:
    n/min/max + discrete percentiles of the (rounded) score vector.
    Every reported value IS one of the per-node scores the `pagerank`
    oracle already exact-matches, so the summary hash-matches too (no
    re-associated float mean — see distribution_summary(integer=False))."""
    import ray.data as rd

    import graph_data_science_ray as gdsr
    from graph_data_science_ray.stages.stats import distribution_summary

    b = _bundle(sf_dir)
    res = gdsr.pagerank(
        b["gd"], damping=0.85, tolerance=0.0, max_iterations=_PR_ITERS + 1, weighted=True
    )
    ds = rd.from_pandas(
        pd.DataFrame({"score": np.round(res["score"].to_numpy(), 6)})
    )
    return distribution_summary(ds, "score", integer=False)


def _q_wcc(sf_dir: str) -> pd.DataFrame:
    import graph_data_science_ray as gdsr

    b = _bundle(sf_dir)
    res = gdsr.wcc(b["gu"])
    return pd.DataFrame(
        {"node": _strip(res["node"]), "component": _strip(res["component"])}
    )


def _q_labelprop(sf_dir: str) -> pd.DataFrame:
    import graph_data_science_ray as gdsr

    b = _bundle(sf_dir)
    res = gdsr.label_propagation(b["gu"], max_iterations=_LP_ROUNDS + 1, weighted=True)
    return pd.DataFrame({"node": _strip(res["node"]), "label": _strip(res["label"])})


def _q_triangles(sf_dir: str) -> pd.DataFrame:
    from graph_data_science_ray.functions.triangles import triangle_count

    b = _bundle(sf_dir)
    tri, _total = triangle_count(b["sym"], idmap=b["idmap"], num_partitions=8)
    return pd.DataFrame(
        {"node": _strip(tri["node"]), "triangles": tri["triangles"].astype(np.int64)}
    )


def _q_triangles_global(sf_dir: str) -> pd.DataFrame:
    from graph_data_science_ray.functions.triangles import triangle_count

    b = _bundle(sf_dir)
    _tri, total = triangle_count(b["sym"], idmap=b["idmap"], num_partitions=8)
    return pd.DataFrame({"triangles": np.array([total], dtype=np.int64)})


def _q_lcc(sf_dir: str) -> pd.DataFrame:
    """LCC in exact parts-per-million (integer arithmetic -> hash-stable)."""
    import graph_data_science_ray as gdsr
    from graph_data_science_ray.functions.triangles import triangle_count

    b = _bundle(sf_dir)
    n = len(b["idmap"])
    tri, _ = triangle_count(b["sym"], idmap=None, node_count=n, num_partitions=8)
    deg = gdsr.degree_centrality(b["sym"], node_count=n, weighted=False)
    t = tri["triangles"].to_numpy(dtype=np.int64)
    d = deg["degree"].to_numpy(dtype=np.int64)
    denom = d * (d - 1)
    ppm = np.where(denom > 0, (2_000_000 * t) // np.where(denom > 0, denom, 1), 0)
    return pd.DataFrame({"node": _strip(b["idmap"].keys), "lcc_ppm": ppm.astype(np.int64)})


_SSSP_ROUNDS = 30
_KCORE_K = 10
_KCORE_ROUNDS = 20
# >= directed diameter at both test scales (measured 2); post-fixpoint
# closure rounds are no-ops under the min-aggregate
_ECC_ROUNDS = 4


def _q_sssp(sf_dir: str) -> pd.DataFrame:
    from graph_data_science_ray.functions.sssp import shortest_paths

    b = _bundle(sf_dir)
    res = shortest_paths(b["gd"], source_id=0, weighted=True)
    return pd.DataFrame(
        {"node": _strip(res["node"]), "distance": res["distance"].astype(np.float64)}
    )


_APSP_SOURCES = 8


def _q_all_shortest_paths(sf_dir: str) -> pd.DataFrame:
    """Unweighted APSP stream from the first 8 nodes (MSBFS bit-parallel
    waves — allshortestpaths/MSBFSAllShortestPaths.java:36)."""
    from graph_data_science_ray.functions.apsp import all_shortest_paths

    b = _bundle(sf_dir)
    res = all_shortest_paths(
        b["gd"], sources=np.arange(_APSP_SOURCES, dtype=np.int64), weighted=False
    )
    return pd.DataFrame(
        {
            "source": _strip(res["source"]),
            "target": _strip(res["target"]),
            "distance": res["distance"].astype(np.float64),
        }
    )


def _q_apsp_weighted(sf_dir: str) -> pd.DataFrame:
    """Weighted APSP from the first 8 nodes — one BSP relaxation run per
    64-source wave on the 2-D min reducer
    (allshortestpaths/WeightedAllShortestPaths.java:41)."""
    from graph_data_science_ray.functions.apsp import all_shortest_paths

    b = _bundle(sf_dir)
    res = all_shortest_paths(
        b["gd"], sources=np.arange(_APSP_SOURCES, dtype=np.int64), weighted=True
    )
    return pd.DataFrame(
        {
            "source": _strip(res["source"]),
            "target": _strip(res["target"]),
            "distance": res["distance"].astype(np.float64),
        }
    )


def _q_hop_distribution(sf_dir: str) -> pd.DataFrame:
    """Distribution of pairwise hop distances from the sampled-source
    APSP stream (p9 ≈ the sampled effective diameter) — MSBFS waves +
    order-statistic summary, all integers."""
    import ray.data as rd

    from graph_data_science_ray.functions.apsp import all_shortest_paths
    from graph_data_science_ray.stages.stats import distribution_summary

    b = _bundle(sf_dir)
    res = all_shortest_paths(
        b["gd"], sources=np.arange(_APSP_SOURCES, dtype=np.int64), weighted=False
    )
    ds = rd.from_pandas(
        pd.DataFrame({"d": res["distance"].to_numpy().astype(np.int64)})
    )
    return distribution_summary(ds, "d")


def _q_bfs(sf_dir: str) -> pd.DataFrame:
    from graph_data_science_ray.functions.sssp import bfs_depths

    b = _bundle(sf_dir)
    res = bfs_depths(b["gd"], source_id=0)
    return pd.DataFrame(
        {"node": _strip(res["node"]), "depth": res["depth"].astype(np.float64)}
    )


def _q_kcore(sf_dir: str) -> pd.DataFrame:
    from graph_data_science_ray.functions.kcore import k_core

    b = _bundle(sf_dir)
    res = k_core(
        b["sym"], k=_KCORE_K, node_count=len(b["idmap"]), idmap=b["idmap"],
        rounds=_KCORE_ROUNDS,
    )
    return pd.DataFrame(
        {"node": _strip(res["node"]), "in_core": res["in_core"].astype(np.int64)}
    )


def _q_node_similarity(sf_dir: str) -> pd.DataFrame:
    from graph_data_science_ray.functions.nodesim import node_similarity

    b = _bundle(sf_dir)
    res = node_similarity(b["sym"], node_count=len(b["idmap"]), idmap=b["idmap"])
    return pd.DataFrame(
        {
            "node_a": _strip(res["node_a"]),
            "node_b": _strip(res["node_b"]),
            "sim_ppm": res["sim_ppm"].astype(np.int64),
        }
    )


_HITS_ITERS = 3
_EIG_ITERS = 16  # eigenvector power-iteration rounds (fixed, tolerance 0)
_BC_MAXD = 40    # BFS depth bound for the Brandes oracle
_KMEANS_ITERS = 5
_NODESIM_TOPK = 3


def _q_median_neighbor(sf_dir: str) -> pd.DataFrame:
    """Per-node median of in-neighbor actor ids — rides the Pregel QUEUE
    messenger (raw per-edge messages, reference SyncQueueMessenger)."""
    from graph_data_science_ray.functions.neighborhood import median_neighbor_value

    b = _bundle(sf_dir)
    vals = np.array(
        [float(k.split(":", 1)[1]) for k in b["idmap"].keys], dtype=np.float64
    )
    out = median_neighbor_value(b["gd"], values=vals)
    out = out[~out["median"].isna()]
    return pd.DataFrame(
        {
            "node": _strip(out["node"]),
            "median_val": out["median"].astype(np.float64),
        }
    )


def _q_hits(sf_dir: str) -> pd.DataFrame:
    from graph_data_science_ray.functions.hits import hits

    b = _bundle(sf_dir)
    res = hits(b["gd"], b["grev"], iterations=_HITS_ITERS, normalize=False)
    return pd.DataFrame(
        {
            "node": _strip(res["node"]),
            "hub": res["hub"].astype(np.float64),
            "auth": res["auth"].astype(np.float64),
        }
    )


def _q_collapse_path(sf_dir: str) -> pd.DataFrame:
    """2-hop contraction of the interaction graph (collapsePath)."""
    from graph_data_science_ray.pipelines.transforms import collapse_path

    b = _bundle(sf_dir)
    out = collapse_path(b["enc"], b["enc"], num_partitions=8).to_pandas()
    keys = b["idmap"].keys
    return pd.DataFrame(
        {
            "src": _strip(keys[out["src"].to_numpy(dtype=np.int64)]),
            "dst": _strip(keys[out["dst"].to_numpy(dtype=np.int64)]),
            "paths": out["weight"].astype(np.float64),
        }
    )


def _q_random_walks(sf_dir: str) -> pd.DataFrame:
    """Per-walk flag table (exact, oracle-checkable — the per-entity
    FLAG-table form of ``random_walks_valid``): at walks_per_node=1
    every node launches exactly one walk starting at itself
    (``started``), every consecutive step pair is a directed edge of
    the projection (``hops_ok`` — distributed hash-join of the hop
    table against the encoded edge Dataset), and no walk exceeds
    walk_length steps (``len_ok``). The node sequence itself is
    seed-specific — streamed rows-only by ``random_walks_stream``.
    Ref: algo/.../traversal/RandomWalkTest invariants."""
    import pyarrow as pa
    import ray.data as rd

    from graph_data_science_ray.functions.walks import random_walks
    from graph_data_science_ray.pipelines.agg import hash_join

    b = _bundle(sf_dir)
    n = len(b["idmap"])
    out = random_walks(b["gd"], walk_length=5, walks_per_node=1, seed=7)
    ids = b["idmap"].to_ids(out["node"].to_numpy(dtype="U"))
    wid = out["walk_id"].to_numpy(dtype=np.int64)
    step = out["step"].to_numpy(dtype=np.int64)
    order = np.lexsort((step, wid))
    wid, step, ids = wid[order], step[order], ids[order]
    same = wid[1:] == wid[:-1]
    hops = pd.DataFrame(
        {"wid": wid[:-1][same], "src": ids[:-1][same], "dst": ids[1:][same]}
    )
    hop_total = np.zeros(n, dtype=np.int64)
    np.add.at(hop_total, hops["wid"].to_numpy(), 1)
    hop_schema = pa.schema(
        [("wid", pa.int64()), ("src", pa.int64()), ("dst", pa.int64())]
    )
    edge_schema = pa.schema([("src", pa.int64()), ("dst", pa.int64())])
    matched = hash_join(
        rd.from_pandas(hops),
        b["enc"].select_columns(["src", "dst"]),
        on=["src", "dst"],
        left_schema=hop_schema,
        right_schema=edge_schema,
        num_parts=8,
    ).to_pandas()
    hop_match = np.zeros(n, dtype=np.int64)
    if len(matched):
        np.add.at(hop_match, matched["wid"].to_numpy(dtype=np.int64), 1)
    max_step = np.zeros(n, dtype=np.int64)
    np.maximum.at(max_step, wid, step)
    started = np.zeros(n, dtype=np.int64)
    started[wid[step == 0][ids[step == 0] == wid[step == 0]]] = 1
    return pd.DataFrame(
        {
            "node": _strip(b["idmap"].keys),
            "started": started,
            "hops_ok": (hop_match == hop_total).astype(np.int64),
            "len_ok": (max_step < 5).astype(np.int64),
        }
    )


def _q_random_walks_stream(sf_dir: str) -> pd.DataFrame:
    from graph_data_science_ray.functions.walks import random_walks

    b = _bundle(sf_dir)
    out = random_walks(b["gd"], walk_length=5, walks_per_node=1, seed=7)
    out["node"] = _strip(out["node"])
    return out


def _q_walks_valid(sf_dir: str) -> pd.DataFrame:
    """Random-walk validity invariant (exact, oracle-checkable): every
    consecutive step pair within a walk is a directed edge of the
    projected graph (checked by a distributed hash-join of the hop table
    against the encoded edge Dataset), every node launches exactly one
    walk starting at itself (walk_id == dense node id at
    walks_per_node=1), and no walk exceeds walk_length steps. The node
    sequence itself is seed-specific (covered rows-only by
    `random_walks`); the invariants are what the reference's walk tests
    assert (ref algo/.../traversal/RandomWalkTest). ``num_walks`` ties
    the row to the real node count, which the SQL oracle recomputes
    independently from the events table."""
    import pyarrow as pa
    import ray.data as rd

    from graph_data_science_ray.functions.walks import random_walks
    from graph_data_science_ray.pipelines.agg import hash_join

    b = _bundle(sf_dir)
    n = len(b["idmap"])
    out = random_walks(b["gd"], walk_length=5, walks_per_node=1, seed=7)
    ids = b["idmap"].to_ids(out["node"].to_numpy(dtype="U"))
    wid = out["walk_id"].to_numpy(dtype=np.int64)
    step = out["step"].to_numpy(dtype=np.int64)
    order = np.lexsort((step, wid))
    wid, step, ids = wid[order], step[order], ids[order]
    same = wid[1:] == wid[:-1]
    hops = pd.DataFrame({"src": ids[:-1][same], "dst": ids[1:][same]})
    hop_counts = hops.groupby(["src", "dst"]).size().reset_index(name="cnt")
    total_hops = int(len(hops))
    hops_ds = rd.from_pandas(hop_counts)
    edge_schema = pa.schema([("src", pa.int64()), ("dst", pa.int64())])
    hop_schema = pa.schema(
        [("src", pa.int64()), ("dst", pa.int64()), ("cnt", pa.int64())]
    )
    matched = hash_join(
        hops_ds,
        b["enc"].select_columns(["src", "dst"]),
        on=["src", "dst"],
        left_schema=hop_schema,
        right_schema=edge_schema,
        num_parts=8,
    ).sum("cnt")
    starts = ids[step == 0]
    start_wids = wid[step == 0]
    starts_ok = int(
        len(starts) == n
        and (np.sort(start_wids) == np.arange(n)).all()
        and (start_wids == starts).all()
    )
    return pd.DataFrame(
        {
            "num_walks": np.array([len(starts)], dtype=np.int64),
            "hop_violations": np.array(
                [total_hops - int(matched or 0)], dtype=np.int64
            ),
            "starts_ok": np.array([starts_ok], dtype=np.int64),
            "length_ok": np.array([int(step.max() < 5)], dtype=np.int64),
        }
    )


def _q_scc(sf_dir: str) -> pd.DataFrame:
    from graph_data_science_ray.functions.scc import scc

    b = _bundle(sf_dir)
    out = scc(b["enc"], node_count=len(b["idmap"]), idmap=b["idmap"])
    return pd.DataFrame(
        {"node": _strip(out["node"]), "component": _strip(out["component"])}
    )


def _pinned_round1_labels(b: dict) -> np.ndarray:
    """Parity-0 first local-move sub-round from singleton communities —
    the shared Louvain/Leiden move kernel, exactly reproducible in SQL
    (identical float gain expression, > 1e-12 move test, dense-rank
    parity, min-community tie-break). Returns the dense label array."""
    from graph_data_science_ray.functions.louvain import (
        _best_moves,
        _weighted_degrees,
    )

    n = len(b["idmap"])
    deg = _weighted_degrees(b["sym"], n)
    two_m = deg.sum()
    labels = np.arange(n, dtype=np.int64)
    movers = _best_moves(b["sym"], labels, deg, deg.copy(), two_m, 1.0, parity=0)
    if len(movers):
        labels[movers["node"].to_numpy(dtype=np.int64)] = movers[
            "community"
        ].to_numpy(dtype=np.int64)
    return labels


def _q_louvain(sf_dir: str) -> pd.DataFrame:
    """Exactly-checkable Louvain surface: the pinned parity-0 round-1
    assignment (``community`` — exact in SQL, the ``louvain_round1``
    kernel) plus per-node flags asserting the FULL multi-level run's
    invariants: every node assigned, community id == min original
    member id, and zero further local moves on the community-contracted
    graph (the multi-level local-optimum contract of the reference's
    Louvain.java). The full assignment itself is schedule-specific —
    streamed rows-only by ``louvain_communities``."""
    from graph_data_science_ray.functions.louvain import (
        _contract,
        _level_fn,
        louvain,
    )

    b = _bundle(sf_dir)
    n = len(b["idmap"])
    r1 = _pinned_round1_labels(b)
    out = louvain(b["sym"], node_count=n, max_levels=20, max_rounds=50)
    lab = np.full(n, -1, dtype=np.int64)
    lab[out["node"].to_numpy(dtype=np.int64)] = out["community"].to_numpy(
        dtype=np.int64
    )
    assigned_ok = int((lab >= 0).all())
    mins = pd.DataFrame({"n": np.arange(n, dtype=np.int64), "c": lab}).groupby(
        "c"
    )["n"].min()
    min_member_ok = int((mins.index.to_numpy() == mins.to_numpy()).all())
    uniq, dense = np.unique(lab, return_inverse=True)
    cedges = _contract(b["sym"], dense.astype(np.int64)).materialize()
    level = _level_fn("auto", len(uniq))
    _lvl, improved = level(cedges, len(uniq), max_rounds=1, gamma=1.0)
    converged_ok = int(not improved)
    keys = b["idmap"].keys
    return pd.DataFrame(
        {
            "node": _strip(keys),
            "community": _strip(keys[r1]),
            "assigned_ok": np.full(n, assigned_ok, dtype=np.int64),
            "min_member_ok": np.full(n, min_member_ok, dtype=np.int64),
            "converged_ok": np.full(n, converged_ok, dtype=np.int64),
        }
    )


def _q_louvain_communities(sf_dir: str) -> pd.DataFrame:
    from graph_data_science_ray.functions.louvain import louvain

    b = _bundle(sf_dir)
    out = louvain(b["sym"], node_count=len(b["idmap"]), idmap=b["idmap"], max_levels=3, max_rounds=5)
    return pd.DataFrame(
        {"node": _strip(out["node"]), "community": _strip(out["community"])}
    )


def _q_leiden(sf_dir: str) -> pd.DataFrame:
    """Exactly-checkable Leiden surface: the pinned parity-0 round-1
    assignment (``community`` — exact in SQL; Leiden's local-move phase
    is the same gain kernel as Louvain's, Traag et al. 2019 §2) plus
    per-node flags asserting the FULL run's Leiden-specific guarantees:
    every node assigned and every community internally CONNECTED (the
    refinement-phase contract that distinguishes Leiden from Louvain).
    The full assignment is schedule-specific — streamed rows-only by
    ``leiden_communities``."""
    from graph_data_science_ray.functions.louvain import leiden

    b = _bundle(sf_dir)
    n = len(b["idmap"])
    r1 = _pinned_round1_labels(b)
    out = leiden(b["sym"], node_count=n, max_levels=3, max_rounds=5)
    labels = np.full(n, -1, dtype=np.int64)
    labels[out["node"].to_numpy(dtype=np.int64)] = out["community"].to_numpy(
        dtype=np.int64
    )
    assigned_ok = int((labels >= 0).all())
    e = b["sym"].select_columns(["src", "dst"]).to_pandas()
    s = e["src"].to_numpy(dtype=np.int64)
    d = e["dst"].to_numpy(dtype=np.int64)
    keep = labels[s] == labels[d]
    s, d = s[keep], d[keep]
    comp = np.arange(n, dtype=np.int64)
    while True:
        before = comp.copy()
        np.minimum.at(comp, s, comp[d])
        np.minimum.at(comp, d, comp[s])
        while True:
            c2 = comp[comp]
            if np.array_equal(c2, comp):
                break
            comp = c2
        if np.array_equal(before, comp):
            break
    df = pd.DataFrame({"lab": labels, "comp": comp})
    connected_ok = int((df.groupby("lab")["comp"].nunique() <= 1).all())
    keys = b["idmap"].keys
    return pd.DataFrame(
        {
            "node": _strip(keys),
            "community": _strip(keys[r1]),
            "assigned_ok": np.full(n, assigned_ok, dtype=np.int64),
            "connected_ok": np.full(n, connected_ok, dtype=np.int64),
        }
    )


def _q_leiden_communities(sf_dir: str) -> pd.DataFrame:
    from graph_data_science_ray.functions.louvain import leiden

    b = _bundle(sf_dir)
    out = leiden(b["sym"], node_count=len(b["idmap"]), idmap=b["idmap"], max_levels=3, max_rounds=5)
    return pd.DataFrame(
        {"node": _strip(out["node"]), "community": _strip(out["community"])}
    )


def _q_modopt_valid(sf_dir: str) -> pd.DataFrame:
    """Modularity-optimization validity invariant (exact,
    oracle-checkable): at the converged fixpoint NO single-node move to
    a neighboring community improves modularity under the engine's own
    gain formula — the local-optimum contract of the reference's
    ModularityOptimization, and exactly the property that
    batch-boundary-dependent partial aggregation bugs violate. Node
    count ties to the graph via the SQL oracle; the assignment itself
    is schedule-specific (rows-only via `modularity_optimization`)."""
    from graph_data_science_ray.functions.louvain import modularity_optimization

    b = _bundle(sf_dir)
    n = len(b["idmap"])
    out, _q = modularity_optimization(b["sym"], node_count=n, max_rounds=50)
    labels = out.sort_values("node")["community"].to_numpy(dtype=np.int64)
    e = b["sym"].select_columns(["src", "dst", "weight"]).to_pandas()
    s = e["src"].to_numpy(dtype=np.int64)
    d = e["dst"].to_numpy(dtype=np.int64)
    w = e["weight"].to_numpy(dtype=np.float64)
    deg = np.zeros(n)
    np.add.at(deg, s, w)
    two_m = w.sum()
    tot = np.zeros(n)
    np.add.at(tot, labels, deg)  # indexed by community label (min member id)
    ns = s != d  # self-loops excluded, as in the move kernel
    conn = (
        pd.DataFrame({"n": s[ns], "c": labels[d[ns]], "w": w[ns]})
        .groupby(["n", "c"], sort=False)["w"].sum().reset_index()
    )
    node = conn["n"].to_numpy(dtype=np.int64)
    comm = conn["c"].to_numpy(dtype=np.int64)
    cw = conn["w"].to_numpy()
    own = labels[node]
    own_w = np.zeros(n)
    is_own = comm == own
    np.add.at(own_w, node[is_own], cw[is_own])
    stay = own_w[node] - deg[node] * (tot[own] - deg[node]) / two_m
    gain = cw - deg[node] * tot[comm] / two_m
    viol = int(((gain > stay + 1e-9) & ~is_own).sum())
    return pd.DataFrame(
        {
            "n_nodes": np.array([n], dtype=np.int64),
            "local_move_violations": np.array([viol], dtype=np.int64),
        }
    )


def _q_leiden_valid(sf_dir: str) -> pd.DataFrame:
    """Leiden validity invariants (exact, oracle-checkable): every
    community induces a CONNECTED subgraph — the guarantee that
    distinguishes Leiden from Louvain (Traag et al. 2019; the
    refinement phase enforces it) — every node is assigned, and the
    node count ties to the graph, which the SQL oracle recomputes
    independently. The community assignment itself is
    schedule-specific (covered rows-only by `leiden`)."""
    from graph_data_science_ray.functions.louvain import leiden

    b = _bundle(sf_dir)
    n = len(b["idmap"])
    out = leiden(b["sym"], node_count=n, max_levels=3, max_rounds=5)
    labels = np.full(n, -1, dtype=np.int64)
    labels[out["node"].to_numpy(dtype=np.int64)] = out["community"].to_numpy(
        dtype=np.int64
    )
    e = b["sym"].select_columns(["src", "dst"]).to_pandas()
    s = e["src"].to_numpy(dtype=np.int64)
    d = e["dst"].to_numpy(dtype=np.int64)
    keep = labels[s] == labels[d]
    s, d = s[keep], d[keep]
    comp = np.arange(n, dtype=np.int64)
    while True:
        before = comp.copy()
        np.minimum.at(comp, s, comp[d])
        np.minimum.at(comp, d, comp[s])
        while True:
            c2 = comp[comp]
            if np.array_equal(c2, comp):
                break
            comp = c2
        if np.array_equal(before, comp):
            break
    df = pd.DataFrame({"lab": labels, "comp": comp})
    disconnected = int((df.groupby("lab")["comp"].nunique() > 1).sum())
    return pd.DataFrame(
        {
            "n_nodes": np.array([n], dtype=np.int64),
            "unassigned": np.array([int((labels < 0).sum())], dtype=np.int64),
            "disconnected_communities": np.array([disconnected], dtype=np.int64),
        }
    )


def _q_louvain_valid(sf_dir: str) -> pd.DataFrame:
    """Louvain validity invariants (exact, oracle-checkable): the run is
    taken to CONVERGENCE (level loop exits on improved=False), so
    re-running one local-move round of the engine's own level kernel on
    the community-contracted graph must make ZERO moves — the multi-level
    local-optimum contract of the reference's Louvain
    (community/src/main/java/org/neo4j/gds/louvain/Louvain.java). Also:
    every node assigned, and community id == min original member id (the
    normalization `louvain()` documents). The assignment itself is
    schedule-specific (rows-only via `louvain`)."""
    from graph_data_science_ray.functions.louvain import (
        _contract,
        _level_fn,
        louvain,
    )

    b = _bundle(sf_dir)
    n = len(b["idmap"])
    out = louvain(b["sym"], node_count=n, max_levels=20, max_rounds=50)
    lab = np.full(n, -1, dtype=np.int64)
    lab[out["node"].to_numpy(dtype=np.int64)] = out["community"].to_numpy(
        dtype=np.int64
    )
    unassigned = int((lab < 0).sum())
    mins = pd.DataFrame({"n": np.arange(n, dtype=np.int64), "c": lab}).groupby(
        "c"
    )["n"].min()
    min_member_violations = int(
        (mins.index.to_numpy() != mins.to_numpy()).sum()
    )
    uniq, dense = np.unique(lab, return_inverse=True)
    cedges = _contract(b["sym"], dense.astype(np.int64)).materialize()
    level = _level_fn("auto", len(uniq))
    _lvl, improved = level(cedges, len(uniq), max_rounds=1, gamma=1.0)
    return pd.DataFrame(
        {
            "n_nodes": np.array([n], dtype=np.int64),
            "unassigned": np.array([unassigned], dtype=np.int64),
            "min_member_violations": np.array(
                [min_member_violations], dtype=np.int64
            ),
            "extra_level_moves": np.array([int(bool(improved))], dtype=np.int64),
        }
    )


def _q_max_k_cut_valid(sf_dir: str) -> pd.DataFrame:
    """Approx-max-k-cut validity invariants (exact, oracle-checkable): at
    the converged fixpoint NO single-node move to another partition
    strictly lowers its internal (same-part) weight — the local-optimum
    contract of the reference's ApproxMaxKCut local-move phase
    (algo/.../approxmaxkcut/LocalSearch) — every node is in [0, k), and
    the reported cut weight equals the cut recomputed from the final
    assignment. The assignment itself is seed/schedule-specific
    (rows-only via `max_k_cut`)."""
    from graph_data_science_ray.functions.community2 import approx_max_k_cut

    b = _bundle(sf_dir)
    n = len(b["idmap"])
    k = 3
    out, cut = approx_max_k_cut(b["sym"], n, k=k, rounds=64, seed=3)
    assign = np.zeros(n, dtype=np.int64)
    assign[out["node"].to_numpy(dtype=np.int64)] = out["part"].to_numpy(
        dtype=np.int64
    )
    e = b["sym"].select_columns(["src", "dst", "weight"]).to_pandas()
    s = e["src"].to_numpy(dtype=np.int64)
    d = e["dst"].to_numpy(dtype=np.int64)
    w = e["weight"].to_numpy(dtype=np.float64)
    ns = s != d
    mat = np.zeros((n, k), dtype=np.float64)
    np.add.at(mat, (s[ns], assign[d[ns]]), w[ns])
    cur_w = mat[np.arange(n), assign]
    viol = int((mat.min(axis=1) + 1e-9 < cur_w).sum())
    cut2 = float(w[ns & (assign[s] != assign[d])].sum()) / 2.0
    return pd.DataFrame(
        {
            "n_nodes": np.array([n], dtype=np.int64),
            "local_move_violations": np.array([viol], dtype=np.int64),
            "parts_ok": np.array(
                [int((assign >= 0).all() and (assign < k).all())], dtype=np.int64
            ),
            "cut_ok": np.array(
                [int(abs(cut - round(cut2, 6)) < 1e-6)], dtype=np.int64
            ),
        }
    )


def _q_sllpa_valid(sf_dir: str) -> pd.DataFrame:
    """SLLPA validity invariants (exact, oracle-checkable): output rows
    are distinct (node, community) pairs, every community id is a node
    id, and no node holds more labels than the memory can admit —
    floor((rounds+1) / ceil(threshold*(rounds+1))) — the overlapping-
    memory contract of the reference's SpeakerListenerLPA. The label
    sets themselves are seed-specific (rows-only via `sllpa`)."""
    from graph_data_science_ray.functions.community2 import sllpa

    b = _bundle(sf_dir)
    n = len(b["idmap"])
    rounds, threshold = 15, 0.1
    out = sllpa(b["gu"], rounds=rounds, threshold=threshold, seed=6)
    node = out["node"].astype(str)
    comm = out["community"].astype(str)
    dup_pairs = int(out.duplicated(subset=["node", "community"]).sum())
    keys = set(str(x) for x in b["idmap"].keys)
    invalid_ids = int((~node.isin(keys)).sum() + (~comm.isin(keys)).sum())
    min_count = max(1, int(np.ceil(threshold * (rounds + 1))))
    max_labels = (rounds + 1) // min_count
    per_node = out.groupby("node").size()
    overflow_nodes = int((per_node > max_labels).sum())
    return pd.DataFrame(
        {
            "n_nodes": np.array([n], dtype=np.int64),
            "dup_pairs": np.array([dup_pairs], dtype=np.int64),
            "invalid_ids": np.array([invalid_ids], dtype=np.int64),
            "overflow_nodes": np.array([overflow_nodes], dtype=np.int64),
        }
    )


def _q_minhash_valid(sf_dir: str) -> pd.DataFrame:
    """MinHash-LSH near-dup validity invariants (exact,
    oracle-checkable): every emitted pair is doc_a < doc_b, appears once,
    and its reported jaccard equals the EXACT shingle-set Jaccard of the
    two texts recomputed from the corpus — and is >= the 0.5 threshold.
    Which pairs surface depends on the banding layout (rows-only via
    `minhash_near_dup`); that every surfaced pair is a true near-dup does
    not."""
    from graph_data_science_ray.stages.dedup import dedup_minhash_lsh, jaccard

    docs_ds = _docs(sf_dir)
    pairs = dedup_minhash_lsh(docs_ds, threshold=0.5).to_pandas()
    texts = docs_ds.select_columns(["doc_id", "text"]).to_pandas()
    tmap = dict(zip(texts["doc_id"].astype(int), texts["text"].fillna("")))
    order_violations = int((pairs["doc_a"] >= pairs["doc_b"]).sum())
    dup_pairs = int(pairs.duplicated(subset=["doc_a", "doc_b"]).sum())
    viol = 0
    for a, bdoc, j in zip(pairs["doc_a"], pairs["doc_b"], pairs["jaccard"]):
        exact = jaccard(tmap[int(a)], tmap[int(bdoc)])
        if abs(float(j) - round(exact, 6)) > 1e-9 or exact < 0.5:
            viol += 1
    return pd.DataFrame(
        {
            "n_docs": np.array([len(texts)], dtype=np.int64),
            "order_violations": np.array([order_violations], dtype=np.int64),
            "dup_pairs": np.array([dup_pairs], dtype=np.int64),
            "jaccard_violations": np.array([viol], dtype=np.int64),
        }
    )


def _q_knn_descent_valid(sf_dir: str) -> pd.DataFrame:
    """NN-Descent validity invariants (exact, oracle-checkable): the
    approximate k-NN graph reaches recall >= 0.8 against the EXACT
    brute-force cosine top-k recomputed on the same embeddings (the
    reference KNN's sampledRate/deltaThreshold quality contract,
    similarity/knn), with exactly n·k rows and ranks 1..k per query.
    Which neighbors fill the sub-recall tail is round-schedule-specific
    (rows-only via `knn_descent`)."""
    import ray.data as rd

    from graph_data_science_ray.stages.knn_descent import knn_descent
    from graph_data_science_ray.stages.similarity import knn_brute_force

    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    k = 5
    appr = knn_descent(emb, k=k, max_rounds=4)
    n = appr["query_id"].nunique()
    exact = knn_brute_force(emb, query_ids=np.arange(n), k=k)
    a = set(zip(appr["query_id"].astype(int), appr["neighbor_id"].astype(int)))
    b = set(zip(exact["query_id"].astype(int), exact["neighbor_id"].astype(int)))
    recall = len(a & b) / max(1, len(b))
    ranks_ok = int(
        (appr.groupby("query_id")["rank"].agg(["min", "max", "count"])
         .eq([1, k, k]).all(axis=1)).all()
    )
    return pd.DataFrame(
        {
            "n_vectors": np.array([n], dtype=np.int64),
            "rows_ok": np.array([int(len(appr) == n * k)], dtype=np.int64),
            "ranks_ok": np.array([ranks_ok], dtype=np.int64),
            "recall_floor_ok": np.array([int(recall >= 0.8)], dtype=np.int64),
        }
    )


def _q_celf_valid(sf_dir: str) -> pd.DataFrame:
    """CELF validity invariants (exact, oracle-checkable): lazy-forward
    greedy on a submodular spread estimate picks NON-INCREASING marginal
    gains (Leskovec et al. 2007 — the property the reference's CELF
    exploits for lazy evaluation), k distinct valid seeds, positive
    gains. The seed identities are Monte-Carlo-seed-specific (rows-only
    via `celf`)."""
    from graph_data_science_ray.functions.influence import celf

    b = _bundle(sf_dir)
    out = celf(b["gd"], k=5, propagation_probability=0.2,
               monte_carlo_simulations=10, candidate_limit=30, seed=8)
    g = out["spread_gain"].to_numpy(dtype=np.float64)
    keys = set(str(x) for x in b["idmap"].keys)
    return pd.DataFrame(
        {
            "k_seeds": np.array([len(out)], dtype=np.int64),
            "distinct_ok": np.array(
                [int(out["node"].nunique() == len(out))], dtype=np.int64
            ),
            "valid_ids": np.array(
                [int(out["node"].astype(str).isin(keys).all())], dtype=np.int64
            ),
            "monotone_ok": np.array(
                [int(bool(np.all(g[1:] <= g[:-1] + 1e-9)))], dtype=np.int64
            ),
            # gains are NON-NEGATIVE (monotone spread); they can be 0 when
            # a candidate is already activated in every simulation
            "nonneg_ok": np.array(
                [int(bool(np.all(g >= 0)))], dtype=np.int64
            ),
        }
    )


def _q_fastrp_valid(sf_dir: str) -> pd.DataFrame:
    """FastRP validity invariants (exact, oracle-checkable): the final
    embedding is Σ_k w_k · x_k over L2-NORMALIZED iteration states
    (FastRP.java), so with weights (0,1,1) every row norm is <= 2 by the
    triangle inequality; dimension as configured; one row per node; and
    a SECOND run with the same seed is byte-identical (the projection is
    a pure function of (seed, node, dim) — the determinism contract).
    The vector values themselves are seed-specific (rows-only via
    `fastrp`)."""
    from graph_data_science_ray.functions.fastrp import fastrp

    b = _bundle(sf_dir)
    n = len(b["idmap"])
    out = fastrp(b["gu"], dim=32, seed=42)
    out2 = fastrp(b["gu"], dim=32, seed=42)
    vecs = np.stack([np.asarray(v, dtype=np.float64) for v in out["embedding"]])
    vecs2 = np.stack([np.asarray(v, dtype=np.float64) for v in out2["embedding"]])
    norms = np.linalg.norm(vecs, axis=1)
    bad = int((norms > 2.0 + 1e-9).sum())
    det = int(
        vecs.tobytes() == vecs2.tobytes()
        and list(out["node"]) == list(out2["node"])
    )
    return pd.DataFrame(
        {
            "n_nodes": np.array([n], dtype=np.int64),
            "rows_ok": np.array([int(len(out) == n)], dtype=np.int64),
            "dim_ok": np.array([int(vecs.shape[1] == 32)], dtype=np.int64),
            "norm_bound_violations": np.array([bad], dtype=np.int64),
            "deterministic_ok": np.array([det], dtype=np.int64),
        }
    )


def _q_k1_coloring(sf_dir: str) -> pd.DataFrame:
    """K-1 coloring at a PINNED round count — the engine's conflict-
    resolution schedule is fully deterministic (synchronous min-free-
    color recolor of the active set; conflicts resolved by recoloring
    the higher dense id), so the state after exactly ``_K1_ROUNDS``
    rounds is reproducible in SQL round by round. Post-fixpoint rounds
    are no-ops (empty active set), so the pin also matches converged
    runs; properness at the fixpoint is asserted by
    ``k1_coloring_valid``."""
    from graph_data_science_ray.functions.coloring import k1_coloring

    b = _bundle(sf_dir)
    out = k1_coloring(
        b["sym"], node_count=len(b["idmap"]), idmap=b["idmap"],
        max_rounds=_K1_ROUNDS,
    )
    return pd.DataFrame(
        {"node": _strip(out["node"]), "color": out["color"].astype(np.int64)}
    )


def _q_k1_valid(sf_dir: str) -> pd.DataFrame:
    """K1-coloring validity invariant (exact, oracle-checkable): zero
    adjacent equal-color pairs AND every color within the greedy bound
    color(v) <= degree(v). The coloring itself is schedule-specific
    (covered rows-only by `k1_coloring`); the invariant is what the
    reference's tests assert (K1ColoringTest: proper coloring)."""
    import pyarrow as pa
    import ray as _ray

    from graph_data_science_ray.functions.coloring import k1_coloring
    from graph_data_science_ray.functions.degree import degree_centrality

    b = _bundle(sf_dir)
    n = len(b["idmap"])
    out = k1_coloring(b["sym"], node_count=n)
    colors = np.zeros(n, dtype=np.int64)
    colors[out["node"].to_numpy(dtype=np.int64)] = out["color"].to_numpy(dtype=np.int64)
    cref = _ray.put(colors)

    def viol(t: pa.Table) -> pa.Table:
        c = _ray.get(cref)
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        bad = int(((c[src] == c[dst]) & (src != dst)).sum())
        return pa.table({"v": pa.array([bad], type=pa.int64())})

    violations = int(b["sym"].map_batches(viol, batch_format="pyarrow").sum("v") or 0)
    deg = degree_centrality(b["sym"], node_count=n, weighted=False)["degree"].to_numpy(
        dtype=np.int64
    )
    return pd.DataFrame(
        {
            "violations": np.array([violations], dtype=np.int64),
            "bound_ok": np.array([int(bool((colors <= deg).all()))], dtype=np.int64),
        }
    )


def _q_closeness(sf_dir: str) -> pd.DataFrame:
    from graph_data_science_ray.functions.closeness import closeness_harmonic

    b = _bundle(sf_dir)
    out = closeness_harmonic(b["gu"])
    return pd.DataFrame(
        {
            "node": _strip(out["node"]),
            "closeness_ppm": out["closeness_ppm"].astype(np.int64),
            "harmonic_ppm": out["harmonic_ppm"].astype(np.int64),
            "reached": out["reached"].astype(np.int64),
        }
    )


def _q_closeness_wf(sf_dir: str) -> pd.DataFrame:
    """Wasserman-Faust closeness (the reference's useWassermanFaust
    formula: (r−1)/Σd · (r−1)/(V−1)) as exact integer ppm."""
    from graph_data_science_ray.functions.closeness import closeness_harmonic

    b = _bundle(sf_dir)
    out = closeness_harmonic(b["gu"], wasserman_faust=True)
    return pd.DataFrame(
        {
            "node": _strip(out["node"]),
            "closeness_wf_ppm": out["closeness_wf_ppm"].astype(np.int64),
        }
    )


def _q_fastrp(sf_dir: str) -> pd.DataFrame:
    """Integer-exact FastRP contract (SQL-reproducible bit-for-bit):
    md5-parity hash-sign projection + 2 unweighted neighbor-sum rounds
    on the symmetrized projection — FastRP's projection/propagation
    structure with the float normalization removed (the
    ``eigenvector_exact`` recipe). One row per (node, dim); the float
    production embedding is covered by ``fastrp_embed`` (rows-only) and
    its invariants by ``fastrp_valid``."""
    from graph_data_science_ray.functions.fastrp import fastrp_exact

    b = _bundle(sf_dir)
    out = fastrp_exact(b["gu"], dim=_FRP_DIM, rounds=_FRP_ROUNDS)
    out["node"] = _strip(out["node"])
    return out


def _q_fastrp_embed(sf_dir: str) -> pd.DataFrame:
    from graph_data_science_ray.functions.fastrp import fastrp

    b = _bundle(sf_dir)
    out = fastrp(b["gu"], dim=32, seed=42)
    out["node"] = _strip(out["node"])
    # serialize vectors (rows-only check; list columns don't sort/hash)
    out["embedding"] = [",".join(f"{x:.6f}" for x in v) for v in out["embedding"]]
    return out.sort_values("node").reset_index(drop=True)




def _q_betweenness(sf_dir: str) -> pd.DataFrame:
    """Sampled Brandes (8 deterministic sources) — rows-only check."""
    from graph_data_science_ray.functions.betweenness import betweenness

    b = _bundle(sf_dir)
    res = betweenness(b["gd"], b["grev"], sources=np.arange(8))
    return pd.DataFrame(
        {
            "node": _strip(res["node"]),
            "betweenness": np.round(res["betweenness"].to_numpy(), 6),
        }
    )


def _q_spanning_tree(sf_dir: str) -> pd.DataFrame:
    from graph_data_science_ray.functions.spanning import minimum_spanning_forest

    b = _bundle(sf_dir)
    tree, total = minimum_spanning_forest(
        b["sym"], node_count=len(b["idmap"]), idmap=b["idmap"]
    )
    tree = tree.copy()
    tree["src"] = _strip(tree["src"])
    tree["dst"] = _strip(tree["dst"])
    return tree


def _q_shortest_path_route(sf_dir: str) -> pd.DataFrame:
    from graph_data_science_ray.functions.sssp import shortest_path_route

    b = _bundle(sf_dir)
    route = shortest_path_route(
        b["gd"], source_id=0, target_id=len(b["idmap"]) - 1, weighted=True
    )
    if not len(route):
        return pd.DataFrame({"position": [], "node": [], "distance": []})
    return pd.DataFrame(
        {
            "position": route["position"].astype(np.int64),
            "node": _strip(route["node"]),
            "distance": route["distance"].astype(np.float64),
        }
    )


def _q_dijkstra_route(sf_dir: str) -> pd.DataFrame:
    """Heap-Dijkstra route (paths/dijkstra/Dijkstra.java:45) — same
    contract and tie-breaking as shortest_path_route, early exit when the
    target settles; shares that query's recursive-SQL oracle."""
    from graph_data_science_ray.functions.paths import dijkstra_route

    b = _bundle(sf_dir)
    route = dijkstra_route(
        b["gd"], source_id=0, target_id=len(b["idmap"]) - 1, weighted=True
    )
    if not len(route):
        return pd.DataFrame({"position": [], "node": [], "distance": []})
    return pd.DataFrame(
        {
            "position": route["position"].astype(np.int64),
            "node": _strip(route["node"]),
            "distance": route["distance"].astype(np.float64),
        }
    )


def _q_rwr_sample(sf_dir: str) -> pd.DataFrame:
    from graph_data_science_ray.functions.walks import rwr_sample

    b = _bundle(sf_dir)
    out = rwr_sample(b["gu"], sample_size=50, seed=11)
    return pd.DataFrame({"node": _strip(out["node"])})




def _q_article_rank(sf_dir: str) -> pd.DataFrame:
    from graph_data_science_ray.functions.pagerank import article_rank

    b = _bundle(sf_dir)
    res = article_rank(
        b["gd"], damping=0.85, tolerance=0.0, max_iterations=_PR_ITERS + 1,
        weighted=True,
    )
    return pd.DataFrame(
        {"node": _strip(res["node"]), "score": np.round(res["score"].to_numpy(), 6)}
    )


def _q_eigenvector(sf_dir: str) -> pd.DataFrame:
    from graph_data_science_ray.functions.pagerank import eigenvector

    b = _bundle(sf_dir)
    res = eigenvector(b["gd"], max_iterations=_EIG_ITERS, tolerance=0.0)
    return pd.DataFrame(
        {"node": _strip(res["node"]), "score": np.round(res["score"].to_numpy(), 6)}
    )


def _q_eigenvector_exact(sf_dir: str) -> pd.DataFrame:
    """Integer-exact eigenvector contract: 6 UNNORMALIZED power-iteration
    rounds from the all-ones vector over the unweighted directed graph —
    values stay exact integers (< 2^53), so order-independent float sums
    make the fixed-round SQL mirror bit-exact. Same direction as the
    L2-normalized stream; only the scale differs."""
    from graph_data_science_ray.functions.pagerank import eigenvector

    b = _bundle(sf_dir)
    res = eigenvector(b["gd"], max_iterations=6, normalize="none")
    return pd.DataFrame(
        {
            "node": _strip(res["node"]),
            "score": res["score"].to_numpy().astype(np.int64),
        }
    )


def _mod5_labels(b) -> np.ndarray:
    """Deterministic demo communities: user_id % 5 (SQL-replicable)."""
    return np.array([int(k.split(":", 1)[1]) % 5 for k in b["idmap"].keys], dtype=np.int64)


def _q_modularity(sf_dir: str) -> pd.DataFrame:
    from graph_data_science_ray.functions.community_metrics import modularity

    b = _bundle(sf_dir)
    q = modularity(b["sym"], _mod5_labels(b))
    return pd.DataFrame({"modularity": [round(q, 6)]})


def _q_conductance(sf_dir: str) -> pd.DataFrame:
    from graph_data_science_ray.functions.community_metrics import conductance

    b = _bundle(sf_dir)
    out = conductance(b["sym"], _mod5_labels(b))
    return pd.DataFrame(
        {
            "community": out["community"].astype(np.int64),
            "conductance_ppm": out["conductance_ppm"].astype(np.int64),
        }
    )


def _q_kmeans_assign(sf_dir: str) -> pd.DataFrame:
    import ray.data as rd

    from graph_data_science_ray.functions.kmeans import kmeans_assign_fixed

    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return kmeans_assign_fixed(emb, k=8)


def _q_kmeans(sf_dir: str) -> pd.DataFrame:
    import ray.data as rd

    from graph_data_science_ray.functions.kmeans import kmeans

    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return kmeans(emb, k=8, iterations=_KMEANS_ITERS)


# --------------------------------------------------------------------------
# data-prep queries (documents / embeddings / events)
# --------------------------------------------------------------------------


def _q_dedup_exact(sf_dir: str) -> pd.DataFrame:
    from graph_data_science_ray.stages.dedup import dedup_exact

    out = dedup_exact(_docs(sf_dir)).to_pandas()
    return pd.DataFrame({"doc_id": np.sort(out["doc_id"].to_numpy(dtype=np.int64))})


def _q_fingerprint(sf_dir: str) -> pd.DataFrame:
    from graph_data_science_ray.stages.text import fingerprint

    out = fingerprint(_docs(sf_dir)).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _q_token_count(sf_dir: str) -> pd.DataFrame:
    from graph_data_science_ray.stages.text import token_count

    return token_count(_docs(sf_dir)).to_pandas().sort_values("doc_id").reset_index(drop=True)


def _q_hash_split(sf_dir: str) -> pd.DataFrame:
    """Deterministic md5 train/test split (25% test) — pure map-side;
    DuckDB reproduces the assignment from the same salted-md5 hex prefix."""
    import ray.data as rd

    from graph_data_science_ray.stages.sampling import hash_split

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )
    out = hash_split(docs, test_ratio=0.25, salt="split").to_pandas()
    return out[["doc_id", "split"]].sort_values("doc_id").reset_index(drop=True)


def _q_quantile_filter(sf_dir: str) -> pd.DataFrame:
    """Documents above the 90th length percentile (histogram quantile,
    left-bin-edge definition shared with the SQL oracle)."""
    import ray.data as rd

    from graph_data_science_ray.stages.sampling import quantile_filter

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "n_chars"]
    )
    out = quantile_filter(docs, "n_chars", 0.9).to_pandas()
    return out[["doc_id", "n_chars"]].sort_values("doc_id").reset_index(drop=True)


def _q_top_k_per_group(sf_dir: str) -> pd.DataFrame:
    """Top-5 longest documents per language, ties broken by doc_id —
    map-side partial top-k bounds the shuffle at k rows/key/block."""
    import ray.data as rd

    from graph_data_science_ray.stages.sampling import top_k_per_group

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang", "n_chars"],
    )
    out = top_k_per_group(docs, "lang", "n_chars", k=5).to_pandas()
    return (
        out[["lang", "doc_id", "n_chars"]]
        .sort_values(["lang", "doc_id"])
        .reset_index(drop=True)
    )


def _q_deterministic_shuffle(sf_dir: str) -> pd.DataFrame:
    """Global deterministic shuffle position per doc (salted-md5 order)."""
    import ray.data as rd

    from graph_data_science_ray.stages.sampling import deterministic_shuffle

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )
    out = deterministic_shuffle(docs, "doc_id", salt="shuffle").to_pandas()
    return out[["doc_id", "pos"]].sort_values("doc_id").reset_index(drop=True)


def _q_stratified_sample(sf_dir: str) -> pd.DataFrame:
    """Exact-count stratified sample — ceil(0.2 * |group|) docs per lang,
    selected by salted-md5 rank (parallelism-independent)."""
    import ray.data as rd

    from graph_data_science_ray.stages.sampling import stratified_sample

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "lang"]
    )
    out = stratified_sample(docs, "lang", 0.2, salt="strat").to_pandas()
    return out[["doc_id", "lang"]].sort_values("doc_id").reset_index(drop=True)


def _q_sample_global_k(sf_dir: str) -> pd.DataFrame:
    """Exactly 50 docs, globally deterministic (smallest salted-md5 ids) —
    distributed top-k by hash with map-side truncation."""
    import ray.data as rd

    from graph_data_science_ray.stages.sampling import sample_global_k

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "n_chars"]
    )
    out = sample_global_k(docs, k=50, salt="sample").to_pandas()
    return out[["doc_id", "n_chars"]].sort_values("doc_id").reset_index(drop=True)


def _q_doc_freq(sf_dir: str) -> pd.DataFrame:
    """Document frequencies (term, df) — the vocabulary table."""
    from graph_data_science_ray.stages.ir import doc_freq

    out = doc_freq(_docs(sf_dir)).to_pandas()
    out["df"] = out["df"].astype(np.int64)
    return out.sort_values("term").reset_index(drop=True)




def _q_vocab_topk(sf_dir: str) -> pd.DataFrame:
    """EXACT corpus-wide top-50 term frequencies (the exact complement
    of the CMS heavy-hitter sketch): map-side partial counts, term-hash
    shuffle, per-partition sound local top-k, answer-sized driver merge.
    Ordered (tf DESC, term ASC)."""
    from graph_data_science_ray.stages.ir import term_counts_topk

    out = term_counts_topk(_docs(sf_dir), k=50)
    return out.reset_index(drop=True)



def _q_hyperanf_registers(sf_dir: str) -> pd.DataFrame:
    """HyperANF (Boldi et al. 2011) register table after 3 BSP rounds on
    the undirected graph: every node's m=16 HLL registers of its 3-hop
    ball, bit-exact (md5 init, monotone max-merge) — the driver oracle
    reproduces all three rounds in SQL verbatim."""
    from graph_data_science_ray.functions.anf import anf_registers

    b = _bundle(sf_dir)
    out = anf_registers(b["gu"], rounds=3)
    out["node"] = _strip(out["node"].to_numpy())
    out["register"] = out["register"].astype(np.int64)
    out["rho"] = out["rho"].astype(np.int64)
    return out.sort_values(["node", "register"]).reset_index(drop=True)


def _q_k_truss(sf_dir: str) -> pd.DataFrame:
    """4-truss of the undirected graph (support-peeling fixpoint, round
    cap 6 pinned to the oracle): surviving canonical edges with their
    final in-subgraph support. Peeling is tie-break-free, so the result
    is exact; the oracle replays every round in materialized SQL CTEs."""
    from graph_data_science_ray.functions.truss import k_truss

    b = _bundle(sf_dir)
    keys = b["idmap"].keys
    out, _rounds = k_truss(
        b["sym"], k=4, node_count=len(keys), max_rounds=6, num_partitions=8
    )
    df = out.to_pandas()
    if "src" not in df.columns:  # fully-empty Dataset loses schema (Ray pitfall)
        df = pd.DataFrame(
            {"src": pd.Series([], dtype=np.int64),
             "dst": pd.Series([], dtype=np.int64),
             "support": pd.Series([], dtype=np.int64)}
        )
    df = pd.DataFrame(
        {
            "src": _strip(keys[df["src"].to_numpy(dtype=np.int64)]),
            "dst": _strip(keys[df["dst"].to_numpy(dtype=np.int64)]),
            "support": df["support"].astype(np.int64),
        }
    )
    return df.sort_values(["src", "dst"]).reset_index(drop=True)


def _q_knn_pq(sf_dir: str) -> pd.DataFrame:
    """Product-quantization ANN (ADC, Jegou et al. 2011): int8-quantized
    vectors PQ-encoded against an md5-rank-selected codebook (m=4
    subspaces, 16 centroids, 2 integer Lloyd refinement rounds);
    per-query integer ADC distance tables.
    All-integer, so ids + rank + dist hash-compare verbatim."""
    import ray.data as rd

    from graph_data_science_ray.stages.similarity import knn_pq

    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    res = knn_pq(emb, query_ids=np.arange(10), k=5, m=4, ncent=16)
    return res.sort_values(["query_id", "rank"]).reset_index(drop=True)


def _q_hashed_features(sf_dir: str) -> pd.DataFrame:
    """Feature hashing: 64-bucket md5 token folding, sparse long-format
    (doc_id, bucket, cnt) — the vocabulary-free featurizer. Exact."""
    from graph_data_science_ray.stages.ir import hashed_features

    out = hashed_features(_docs(sf_dir), dim=64).to_pandas()
    for c in ("doc_id", "bucket", "cnt"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["doc_id", "bucket"]).reset_index(drop=True)


def _q_latency_moments(sf_dir: str) -> pd.DataFrame:
    """Per-conversation latency moments (n, sum, sum-of-squares in
    exact int64 microseconds) — the burstiness/Fano-factor signal."""
    import graph_data_science_ray as gdsr

    from graph_data_science_ray.stages.trajectory import latency_moments

    turns = gdsr.events_as_transcripts(sf_dir)
    out = latency_moments(turns).to_pandas()
    for c in ("n_gaps", "sum_us", "sumsq_ms2"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("conv").reset_index(drop=True)


def _q_knn_ivfpq(sf_dir: str) -> pd.DataFrame:
    """IVF-PQ composed ANN: integer coarse quantizer (m=1 PQ codebook,
    8 lists, 2 Lloyd rounds) prunes to nprobe=2 lists; PQ ADC (m=4, 16
    centroids, 2 Lloyd rounds) scores survivors. The oracle replays the
    ENTIRE composition — both codebooks, probes, ranking — in SQL."""
    import ray.data as rd

    from graph_data_science_ray.stages.similarity import knn_ivfpq

    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    res = knn_ivfpq(
        emb, query_ids=np.arange(10), k=5, num_lists=8, nprobe=2,
        m=4, ncent=16, refine=2,
    )
    return res.sort_values(["query_id", "rank"]).reset_index(drop=True)


def _q_media_ahash(sf_dir: str) -> pd.DataFrame:
    """REAL perceptual-hash path, exactly oracled: the same synthesized
    8x8 netpbm images as media_resize go through the actor-pool AHasher
    (real decode -> integer grayscale -> division-free mean threshold
    64*gray > total -> 64-bit hex hash). The SQL oracle rebuilds every
    bit from the closed-form pixel grid and re-packs the hex string."""
    import ray.data as rd

    from graph_data_science_ray.stages.multimodal import (
        ahash_images,
        encode_netpbm,
    )

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )

    def synth(df: pd.DataFrame) -> pd.DataFrame:
        r = np.arange(8)[:, None, None]
        c = np.arange(8)[None, :, None]
        payloads = []
        for i in df["doc_id"].astype(np.int64):
            arr = np.concatenate(
                [(i + 3 * r + 5 * c) % 256, (2 * i + r + 0 * c) % 256,
                 (i + 7 * c + 0 * r) % 256],
                axis=2,
            ).astype(np.uint8)
            payloads.append(encode_netpbm(arr))
        return pd.DataFrame(
            {"media_id": df["doc_id"].astype(np.int64), "kind": "image",
             "payload": payloads}
        )

    media = docs.map_batches(synth, batch_format="pandas", batch_size=256)
    out = ahash_images(media, size=8, strict=True).to_pandas()
    out["nbits"] = out["nbits"].astype(np.int64)
    return out.sort_values("media_id").reset_index(drop=True)


def _q_doc_length_quantiles(sf_dir: str) -> pd.DataFrame:
    """EXACT discrete quantiles of document length via distributed
    rank-select: one range-partitioned sort, O(#blocks) counts on the
    driver, one value read per requested rank. DuckDB quantile_disc
    rank semantics (ceil(q*n)-1), so SQL compares verbatim."""
    import ray.data as rd

    from graph_data_science_ray.stages.window import quantiles_disc

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["n_chars"]
    )
    out = quantiles_disc(docs, "n_chars", [0.1, 0.25, 0.5, 0.75, 0.9, 0.99])
    out["q"] = out["q"].astype(np.float64)
    out["value"] = out["value"].astype(np.int64)
    return out.sort_values("q").reset_index(drop=True)


def _q_corpus_profile(sf_dir: str) -> pd.DataFrame:
    """One-pass corpus profile (docs, tokens, exact vocab size, max tf,
    exact length p50/p90) — all integers, five exact SQL aggregates."""
    import ray.data as rd

    from graph_data_science_ray.stages.ir import corpus_profile

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "n_chars"],
    )
    out = corpus_profile(docs)
    out["value"] = out["value"].astype(np.int64)
    return out.sort_values("metric").reset_index(drop=True)


def _q_image_near_dup(sf_dir: str) -> pd.DataFrame:
    """Perceptual image near-dup pairs: synthesized netpbm images (one
    per doc, id-mixing pixel formula) -> real decode -> aHash -> 4-band
    bucket join -> exact hamming verify. max_hamming=3 < num_bands, so
    banding is EXACT by pigeonhole (no recall loss) and the SQL oracle
    (bit_count(xor) over closed-form hashes) compares verbatim."""
    import ray.data as rd

    from graph_data_science_ray.stages.multimodal import (
        ahash_near_dup,
        encode_netpbm,
    )

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )

    def synth(df: pd.DataFrame) -> pd.DataFrame:
        r = np.arange(8)[:, None, None]
        c = np.arange(8)[None, :, None]
        payloads = []
        for i in df["doc_id"].astype(np.int64):
            arr = np.concatenate(
                [(i * (1 + 3 * r + 5 * c)) % 256,
                 (i * i + 7 * r + 11 * c) % 256,
                 (i * (r + c + 1) + 13) % 256],
                axis=2,
            ).astype(np.uint8)
            payloads.append(encode_netpbm(arr))
        return pd.DataFrame(
            {"media_id": df["doc_id"].astype(np.int64), "kind": "image",
             "payload": payloads}
        )

    media = docs.map_batches(synth, batch_format="pandas", batch_size=256)
    out = ahash_near_dup(media, max_hamming=3, num_bands=4)
    for col in ("id_a", "id_b", "hamming"):
        out[col] = out[col].astype(np.int64)
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def _q_audio_fingerprint(sf_dir: str) -> pd.DataFrame:
    """REAL audio fingerprint path, exactly oracled: 256-sample PCM16
    WAVs (closed-form samples) through the strict AudioFingerprinter —
    64 frame energies, division-free mean threshold, hex hash. The SQL
    oracle rebuilds every frame energy and re-packs the hex string."""
    import ray.data as rd

    from graph_data_science_ray.stages.multimodal import (
        encode_wav,
        fingerprint_audio,
    )

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )

    def synth(df: pd.DataFrame) -> pd.DataFrame:
        t = np.arange(256, dtype=np.int64)
        payloads = []
        for i in df["doc_id"].astype(np.int64):
            samples = ((i * 13 + t * 7) % 4001 - 2000).astype(np.int16)
            payloads.append(encode_wav(samples, rate=8000))
        return pd.DataFrame(
            {"media_id": df["doc_id"].astype(np.int64), "kind": "audio",
             "payload": payloads}
        )

    media = docs.map_batches(synth, batch_format="pandas", batch_size=256)
    out = fingerprint_audio(media, frames=64, strict=True).to_pandas()
    out["nbits"] = out["nbits"].astype(np.int64)
    return out.sort_values("media_id").reset_index(drop=True)


def _q_graph_profile(sf_dir: str) -> pd.DataFrame:
    """One-query graph profile (the corpus_profile analogue for the
    link graph): nodes, directed distinct edges, undirected edges, max
    undirected degree, global triangles, directed density in integer
    ppm — each an existing exact distributed primitive, composed."""
    import graph_data_science_ray as gdsr

    from graph_data_science_ray.functions.triangles import triangle_count

    b = _bundle(sf_dir)
    V = len(b["idmap"].keys)
    n_edges = b["enc"].count()
    n_und = b["sym"].count() // 2
    deg = gdsr.degree_centrality(b["sym"], node_count=V, weighted=False)
    max_deg = int(deg["degree"].max())
    _tri, total = triangle_count(b["sym"], idmap=b["idmap"], num_partitions=8)
    density_ppm = 1_000_000 * n_edges // (V * (V - 1)) if V > 1 else 0
    return pd.DataFrame(
        {
            "metric": ["density_ppm", "max_degree", "n_edges", "n_nodes",
                       "n_und_edges", "triangles"],
            "value": np.array(
                [density_ppm, max_deg, n_edges, V, n_und, int(total)],
                dtype=np.int64,
            ),
        }
    )


def _q_eccentricity(sf_dir: str) -> pd.DataFrame:
    """Exact per-node eccentricity over the directed graph: max hop
    distance to any reached node, computed as 64-way MSBFS waves with
    per-partition column maxima — driver traffic is answer-sized."""
    from graph_data_science_ray.functions.apsp import eccentricity

    b = _bundle(sf_dir)
    res = eccentricity(b["gd"])
    return pd.DataFrame(
        {"node": _strip(res["node"]), "ecc": res["ecc"].astype(np.int64)}
    )


def _q_graph_diameter(sf_dir: str) -> pd.DataFrame:
    """Exact directed diameter + radius (max/min eccentricity) — the
    exact companion of the HyperANF ``effective_diameter`` sketch."""
    from graph_data_science_ray.functions.apsp import graph_diameter

    b = _bundle(sf_dir)
    return graph_diameter(b["gd"])


def _q_tf_idf_topk(sf_dir: str) -> pd.DataFrame:
    """Per-doc top-3 terms by tf·ln(N/df); broadcast-df strategy (the
    join strategy is parity-tested in pytest)."""
    from graph_data_science_ray.stages.ir import tf_idf_topk

    out = tf_idf_topk(_docs(sf_dir), k=3, strategy="broadcast").to_pandas()
    out["tf"] = out["tf"].astype(np.int64)
    out["df"] = out["df"].astype(np.int64)
    return (
        out[["doc_id", "term", "tf", "df"]]
        .sort_values(["doc_id", "term"])
        .reset_index(drop=True)
    )


def _q_bm25_topk(sf_dir: str) -> pd.DataFrame:
    """Global BM25 top-20 for a fixed 3-term query; per-term partial
    scores added in explicit fixed order so the float is IEEE-identical
    to the SQL expression."""
    from graph_data_science_ray.stages.ir import bm25_topk

    out = bm25_topk(
        _docs(sf_dir), ["spark", "window", "hash"], n=20, k1=1.2, b=0.75
    ).to_pandas()
    out["score_ppm"] = out["score_ppm"].astype(np.int64)
    return out[["doc_id", "score_ppm"]].sort_values("doc_id").reset_index(drop=True)


def _q_token_entropy(sf_dir: str) -> pd.DataFrame:
    """Per-doc token-distribution self-entropy in integer micro-nats
    (repetitiveness quality filter) — shuffle-free row-local stage."""
    from graph_data_science_ray.stages.ir import token_entropy

    out = token_entropy(_docs(sf_dir)).to_pandas()
    for c in ("n_tokens", "ent_ppm"):
        out[c] = out[c].astype(np.int64)
    return (
        out[["doc_id", "n_tokens", "ent_ppm"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def _q_unigram_nll(sf_dir: str) -> pd.DataFrame:
    """Unigram-LM negative log-likelihood per doc in integer micro-nats
    (per-term ln floored to ppm BEFORE summing -> order-independent)."""
    from graph_data_science_ray.stages.ir import unigram_nll

    out = unigram_nll(_docs(sf_dir)).to_pandas()
    for c in ("n_tokens", "nll_ppm"):
        out[c] = out[c].astype(np.int64)
    return (
        out[["doc_id", "n_tokens", "nll_ppm"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def _q_c4_quality(sf_dir: str) -> pd.DataFrame:
    """C4-style rule filter (integer signals + keep flag)."""
    from graph_data_science_ray.stages.quality import c4_quality

    out = c4_quality(_docs(sf_dir), min_words=50).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _q_token_repetition(sf_dir: str) -> pd.DataFrame:
    """Gopher-style repetition signals (type-token + top-bigram rules,
    integer inequalities)."""
    from graph_data_science_ray.stages.quality import token_repetition

    out = token_repetition(_docs(sf_dir)).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _q_semantic_dedup(sf_dir: str) -> pd.DataFrame:
    """SemDeDup: fixed-centroid clustering (vec_id < 8) then
    within-cluster cosine>=0.35 pairs."""
    import ray.data as rd

    from graph_data_science_ray.stages.similarity import semantic_dedup

    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    out = semantic_dedup(emb, n_clusters=8, threshold=0.35).to_pandas()
    for c in ("cluster", "doc_a", "doc_b"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def _q_dag_longest_path(sf_dir: str) -> pd.DataFrame:
    """Longest-path layer per node over the DAG of forward edges
    (src < dst in dense-id == lexicographic key order): one BSP
    min-relaxation fixpoint with −1 edge weights (layer = −dist), the
    reference's computeMaxDistanceFromSource."""
    import graph_data_science_ray as gdsr

    from graph_data_science_ray.functions.coloring import dag_longest_path

    b = _bundle(sf_dir)
    if "gdag" not in b:

        def fwd(t):
            import pyarrow as _pa
            src = t["src"].to_numpy(zero_copy_only=False)
            dst = t["dst"].to_numpy(zero_copy_only=False)
            keep = src < dst
            return _pa.table(
                {"src": src[keep], "dst": dst[keep],
                 "weight": np.full(int(keep.sum()), -1.0, dtype=np.float64)}
            )

        dag = b["enc"].map_batches(fwd, batch_format="pyarrow")
        root = tempfile.mkdtemp(prefix="gdsr-dag-", dir="/tmp")
        b["gdag"] = gdsr.GraphStore.project(
            dag, os.path.join(root, "gdag"), idmap=b["idmap"], num_partitions=8,
            directed=True,
        )
    res = dag_longest_path(b["gdag"])
    return pd.DataFrame(
        {"node": _strip(res["node"]), "layer": res["layer"].astype(np.int64)}
    )


def _q_running_sum(sf_dir: str) -> pd.DataFrame:
    """Global running total (SUM OVER ORDER BY) — the two-pass
    distributed scan; exact integer sums."""
    import ray.data as rd

    from graph_data_science_ray.stages.window import running_sum

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "n_chars"]
    )
    out = running_sum(docs, ["doc_id"], "n_chars").to_pandas()
    out["running_sum"] = out["running_sum"].astype(np.int64)
    return (
        out[["doc_id", "n_chars", "running_sum"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def _q_row_number(sf_dir: str) -> pd.DataFrame:
    """Global row_number() OVER (ORDER BY ts, event_id) on events."""
    import ray.data as rd

    from graph_data_science_ray.stages.window import row_number

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id", "ts"]
    )
    out = row_number(ev, ["ts", "event_id"], out_col="rn").to_pandas()
    return (
        out[["event_id", "rn"]].astype(np.int64)
        .sort_values("event_id")
        .reset_index(drop=True)
    )


def _q_lag_delta(sf_dir: str) -> pd.DataFrame:
    """Per-user inter-event gap in microseconds: lag(ts) OVER (PARTITION
    BY user_id ORDER BY ts, event_id); first event per user -> -1."""
    import ray.data as rd

    from graph_data_science_ray.stages.window import lag_column

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts"],
    )
    out = lag_column(
        ev, ["ts", "event_id"], "ts", key_col="user_id", out_col="prev_ts"
    ).to_pandas()
    cur = out["ts"].astype("datetime64[us]")
    prev = out["prev_ts"].astype("datetime64[us]")
    mask = prev.isna().to_numpy()
    gap = np.full(len(out), -1, dtype=np.int64)
    gap[~mask] = (
        cur[~mask].astype(np.int64).to_numpy()
        - prev[~mask].astype(np.int64).to_numpy()
    )
    out["gap_us"] = gap
    return (
        out[["event_id", "gap_us"]]
        .astype(np.int64)
        .sort_values("event_id")
        .reset_index(drop=True)
    )


def _q_pack_sequences(sf_dir: str) -> pd.DataFrame:
    """Fixed-stride sequence packing: seq_id = cum_chars_before // 4096
    in doc_id order (the window-cumsum packing contract)."""
    import ray.data as rd

    from graph_data_science_ray.stages.window import pack_sequences

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "n_chars"]
    )
    out = pack_sequences(docs, budget=4096, token_col="n_chars").to_pandas()
    for c in ("doc_id", "n_chars", "seq_id", "offset"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


def _q_ngram_topk(sf_dir: str) -> pd.DataFrame:
    """Top-100 word bigrams by global count (vocabulary building) —
    deterministic cut: ties at the rank-100 boundary break by ngram
    ascending in both the engine sort and the SQL ORDER BY."""
    from graph_data_science_ray.stages.text import ngram_topk

    out = ngram_topk(_docs(sf_dir), n=2, k=100).to_pandas()
    out["cnt"] = out["cnt"].astype(np.int64)
    return out.reset_index(drop=True)


def _q_quality(sf_dir: str) -> pd.DataFrame:
    from graph_data_science_ray.stages.text import quality_stats

    out = quality_stats(_docs(sf_dir)).to_pandas().sort_values("doc_id")
    # integer columns only: exact value-hash equality with the SQL oracle
    return out[["doc_id", "n_words", "n_alpha", "n_chars"]].reset_index(drop=True)


def _q_scale_embedding_minmax(sf_dir: str) -> pd.DataFrame:
    """Per-dimension minmax scaling of the embedding LIST property,
    exploded to (vec_id, dim, sppm) integer ppm rows — extremes are
    order-independent so the SQL mirror is exact."""
    import ray.data as rd

    from graph_data_science_ray.stages.scale import scale_embedding

    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                          columns=["vec_id", "embedding"])
    out = scale_embedding(emb, "embedding", scaler="minmax").to_pandas()
    ids = np.repeat(out["vec_id"].to_numpy(dtype=np.int64),
                    [len(v) for v in out["scaled"]])
    m = np.concatenate([np.asarray(v, dtype=np.float64) for v in out["scaled"]])
    dims = np.concatenate([np.arange(1, len(v) + 1, dtype=np.int64)
                           for v in out["scaled"]])
    return pd.DataFrame(
        {"vec_id": ids, "dim": dims,
         "sppm": np.floor(1_000_000 * m).astype(np.int64)}
    ).sort_values(["vec_id", "dim"]).reset_index(drop=True)


def _q_normalize_text(sf_dir: str) -> pd.DataFrame:
    """NFC + lowercase + whitespace-collapse normalization (exact)."""
    from graph_data_science_ray.stages.text import normalize_text

    return (
        normalize_text(_docs(sf_dir)).to_pandas()
        .sort_values("doc_id").reset_index(drop=True)
    )


def _q_chunk_documents(sf_dir: str) -> pd.DataFrame:
    """Fixed-window chunking (32-token chunks, 8 overlap) — exact."""
    from graph_data_science_ray.stages.text import chunk_documents

    out = chunk_documents(_docs(sf_dir), chunk_tokens=32, overlap=8).to_pandas()
    return out.sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)


def _q_lang_id(sf_dir: str) -> pd.DataFrame:
    from graph_data_science_ray.stages.text import lang_id

    return lang_id(_docs(sf_dir)).to_pandas().sort_values("doc_id").reset_index(drop=True)


def _q_minhash_pairs(sf_dir: str) -> pd.DataFrame:
    from graph_data_science_ray.stages.dedup import dedup_minhash_lsh

    out = dedup_minhash_lsh(_docs(sf_dir), threshold=0.5).to_pandas()
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def _q_simhash(sf_dir: str) -> pd.DataFrame:
    """SimHash validity surface: one fingerprint per document (count
    pinned by the oracle's independent count), bit-exact determinism
    across two independent distributed runs, and the empty-doc contract
    (no ``\\S`` token → fingerprint 0). Fingerprint VALUES are pandas
    siphash-based and not ANSI-SQL-reproducible — the raw (doc_id,
    simhash) stream is exercised in tests/test_stages.py with hamming
    ground truth."""
    from graph_data_science_ray.stages.dedup import simhash

    docs = _docs(sf_dir)
    a = simhash(docs).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = simhash(_docs(sf_dir)).to_pandas().sort_values("doc_id").reset_index(drop=True)
    det = int(a.equals(b))
    texts = docs.to_pandas().sort_values("doc_id").reset_index(drop=True)
    has_tok = (
        texts["text"].fillna("").str.contains(r"\S", regex=True).to_numpy()
    )
    fp = a["simhash"].to_numpy(dtype=np.int64)
    empty_zero = int((fp[~has_tok] == 0).all()) if (~has_tok).any() else 1
    return pd.DataFrame(
        {
            "n_docs": np.array([len(a)], dtype=np.int64),
            "deterministic_ok": np.array([det], dtype=np.int64),
            "empty_zero_ok": np.array([empty_zero], dtype=np.int64),
        }
    )


def _q_ngram_jaccard(sf_dir: str) -> pd.DataFrame:
    from graph_data_science_ray.stages.dedup import ngram_jaccard_dedup

    out = ngram_jaccard_dedup(_docs(sf_dir), threshold=0.7).to_pandas()
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def _q_hll_registers(sf_dir: str) -> pd.DataFrame:
    """HyperLogLog 256-register table over document texts — the
    mergeable approximate-distinct sketch, integer registers exactly
    reproduced in SQL."""
    from graph_data_science_ray.stages.sketch import hll_registers

    out = hll_registers(_docs(sf_dir), "text").to_pandas()
    return out.sort_values("register").reset_index(drop=True)


def _q_hll_by_source(sf_dir: str) -> pd.DataFrame:
    """Per-source HyperLogLog register tables over document texts — the
    distributed ``approx COUNT(DISTINCT text) GROUP BY source``. Sparse
    contract: only observed (rho > 0) registers; the SQL oracle checks
    every integer register verbatim."""
    import ray.data as rd

    from graph_data_science_ray.stages.sketch import hll_registers_by

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "source"],
    )
    out = hll_registers_by(docs, "source", "text").to_pandas()
    out["register"] = out["register"].astype(np.int64)
    out["rho"] = out["rho"].astype(np.int64)
    return (
        out[["source", "register", "rho"]]
        .sort_values(["source", "register"])
        .reset_index(drop=True)
    )


_TOOL_BUNDLES: dict = {}


def _tool_bundle(sf_dir: str) -> dict:
    """Projected graph over the tool-filled transcript view (the
    north-star mixed role/tool actor space); cached per sf_dir like
    ``_bundle``."""
    if sf_dir in _TOOL_BUNDLES:
        return _TOOL_BUNDLES[sf_dir]
    import graph_data_science_ray as gdsr

    from graph_data_science_ray.pipelines.edges import (
        derive_edges_encoded_grouped,
    )
    from graph_data_science_ray.sources.transcripts import (
        events_as_transcripts_tools,
    )

    ts = events_as_transcripts_tools(sf_dir)
    turns = gdsr.derive_turns(ts).materialize()
    im = gdsr.IdMap.from_turns(turns)
    enc = derive_edges_encoded_grouped(turns, im, num_partitions=8).materialize()
    root = tempfile.mkdtemp(prefix="gdsr-toolg-", dir="/tmp")
    g = gdsr.GraphStore.project(
        enc, os.path.join(root, "g"), idmap=im, num_partitions=8, directed=True
    )
    b = {"idmap": im, "enc": enc, "gd": g}
    _TOOL_BUNDLES[sf_dir] = b
    return b


def _q_edges_tooled(sf_dir: str) -> pd.DataFrame:
    """Role/TOOL interaction edge table — the north-star mixed actor
    graph: the deterministic tool-fill adapter promotes a third of turns
    to ``tool:`` actors, and edge derivation keys consecutive turns by
    ``_actor_key`` (tool: wins over role: when set, pipelines/edges.py).
    SQL mirrors the fill rule verbatim."""
    b = _tool_bundle(sf_dir)
    df = b["enc"].to_pandas()
    keys = b["idmap"].keys
    return pd.DataFrame(
        {
            "src": keys[df["src"].to_numpy(dtype=np.int64)],
            "dst": keys[df["dst"].to_numpy(dtype=np.int64)],
            "weight": df["weight"].astype(np.float64),
        }
    )


def _q_pagerank_tooled(sf_dir: str) -> pd.DataFrame:
    """The flagship on the north-star mixed graph: weighted PageRank at
    fixed rounds over role/tool interaction edges — tool vertices rank
    alongside user roles in one actor space."""
    import graph_data_science_ray as gdsr

    b = _tool_bundle(sf_dir)
    res = gdsr.pagerank(
        b["gd"], damping=0.85, tolerance=0.0,
        max_iterations=_PR_ITERS + 1, weighted=True,
    )
    return pd.DataFrame(
        {"node": res["node"], "score": np.round(res["score"].to_numpy(), 6)}
    )


def _q_tool_usage(sf_dir: str) -> pd.DataFrame:
    """Per-tool usage census (turns + distinct conversations) over the
    tool-filled transcript view — two-level distributed aggregate."""
    from graph_data_science_ray.sources.transcripts import (
        events_as_transcripts_tools,
    )
    from graph_data_science_ray.stages.trajectory import tool_usage

    ts = events_as_transcripts_tools(sf_dir)
    out = tool_usage(ts).to_pandas()
    return out.sort_values("tool").reset_index(drop=True)


def _q_cms_registers(sf_dir: str) -> pd.DataFrame:
    """Count-Min 4x512 register table over document tokens — the
    mergeable frequency sketch, integer registers exactly reproduced
    in SQL (Cormode & Muthukrishnan 2005)."""
    from graph_data_science_ray.stages.sketch import cms_registers

    out = cms_registers(_docs(sf_dir), "text").to_pandas()
    return out.sort_values(["hrow", "col"]).reset_index(drop=True)


def _q_cms_heavy_hitters(sf_dir: str) -> pd.DataFrame:
    """CMS heavy hitters: tokens whose sketch estimate reaches 1 % of
    the total token count — broadcast-sketch probe, no per-token
    shuffle; integer estimates exactly reproduced in SQL."""
    from graph_data_science_ray.stages.sketch import cms_heavy_hitters

    out = cms_heavy_hitters(_docs(sf_dir), "text", min_share_ppm=10_000)
    return out.to_pandas().sort_values("token").reset_index(drop=True)


def _q_weighted_sample(sf_dir: str) -> pd.DataFrame:
    """Quality-weighted deterministic Bernoulli sampling flags:
    p(keep) = 0.4 * n_chars / max(n_chars), integer acceptance test."""
    import ray.data as rd

    from graph_data_science_ray.stages.sampling import weighted_sample_flags

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "n_chars"]
    )
    out = weighted_sample_flags(
        docs, "n_chars", rate_num=2, rate_den=5, salt="ws"
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _q_dedup_clusters(sf_dir: str) -> pd.DataFrame:
    """Near-dup clusters: exact 3-gram Jaccard pair graph at 0.5 →
    distributed hash-min connected components → canonical keeper."""
    from graph_data_science_ray.stages.dedup import dedup_clusters

    out = dedup_clusters(_docs(sf_dir), threshold=0.5).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _q_duplicate_spans(sf_dir: str) -> pd.DataFrame:
    """Cross-document duplicated 8-token spans (exact substring dedup
    signal): per-doc distinct span count, duplicated-span count, flag."""
    from graph_data_science_ray.stages.dedup import duplicate_spans

    out = duplicate_spans(_docs(sf_dir), window=8).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _q_decontaminate(sf_dir: str) -> pd.DataFrame:
    """Benchmark n-gram decontamination: docs with doc_id % 37 == 0 act
    as the held-out benchmark; every other doc is flagged when it shares
    any word-3-gram with the benchmark."""
    from graph_data_science_ray.stages.dedup import decontaminate

    docs = _docs(sf_dir)
    corpus = docs.map_batches(
        lambda df: df[df["doc_id"] % 37 != 0], batch_format="pandas"
    )
    bench = docs.map_batches(
        lambda df: df[df["doc_id"] % 37 == 0], batch_format="pandas"
    )
    out = decontaminate(corpus, bench).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _q_conversation_stats(sf_dir: str) -> pd.DataFrame:
    """Per-conversation trajectory quality metrics: turn count, distinct
    actors, actor alternation under stable turn ordering, payload
    chars — the structural filter signals for agent-trajectory
    curation."""
    import graph_data_science_ray as gdsr

    from graph_data_science_ray.stages.trajectory import conversation_stats

    turns = gdsr.events_as_transcripts(sf_dir)
    out = conversation_stats(turns).to_pandas()
    return out.sort_values("conv").reset_index(drop=True)


def _q_turn_dedup(sf_dir: str) -> pd.DataFrame:
    """Exact duplicate-turn flags across all conversations (keeper =
    lexicographically smallest (conv, turn_idx) per distinct text)."""
    import graph_data_science_ray as gdsr

    from graph_data_science_ray.stages.trajectory import turn_dedup_flags

    turns = gdsr.events_as_transcripts(sf_dir)
    out = turn_dedup_flags(turns).to_pandas()
    return out.sort_values(["conv", "turn_idx"]).reset_index(drop=True)


def _q_trajectory_pagerank(sf_dir: str) -> pd.DataFrame:
    """Composed trajectory-curation → graph-analytics flagship, oracled
    END-TO-END: per-conversation quality stats gate the transcript set
    (keep convs with actual back-and-forth, n_switches >= 1, then a
    deterministic md5(conv)-even subsample), the kept conversations are
    re-derived into a weighted edge graph, and fixed-round weighted
    PageRank runs on that filtered graph. Every stage is the
    individually-oracled operator; the composition is one pipeline."""
    import graph_data_science_ray as gdsr
    import ray

    from graph_data_science_ray.pipelines.edges import (
        derive_edges_encoded_grouped,
    )
    from graph_data_science_ray.stages.trajectory import conversation_stats

    ts = gdsr.events_as_transcripts(sf_dir)
    stats = conversation_stats(ts).to_pandas()  # |convs| rows — tiny
    keep = {
        c
        for c, sw in zip(stats["conv"], stats["n_switches"])
        if sw >= 1
        and int(hashlib.md5(c.encode("utf-8")).hexdigest()[:8], 16) % 2 == 0
    }
    keep_ref = ray.put(keep)

    kept = ts.map_batches(
        lambda df: df[df["conv_id"].isin(ray.get(keep_ref))],
        batch_format="pandas",
    )
    turns = gdsr.derive_turns(kept)
    im = gdsr.IdMap.from_turns(turns)
    enc = derive_edges_encoded_grouped(turns, im, num_partitions=8).materialize()
    root = tempfile.mkdtemp(prefix="gdsr-traj-", dir="/tmp")
    g = gdsr.GraphStore.project(
        enc, os.path.join(root, "g"), idmap=im, num_partitions=8,
        directed=True,
    )
    res = gdsr.pagerank(
        g, damping=0.85, tolerance=0.0, max_iterations=_PR_ITERS + 1,
        weighted=True,
    )
    return pd.DataFrame(
        {"node": _strip(res["node"]),
         "score": np.round(res["score"].to_numpy(), 6)}
    )


def _q_role_transitions(sf_dir: str) -> pd.DataFrame:
    """Global actor-transition (Markov) counts over consecutive turns,
    self-transitions included — the monologue/alternation structure of
    the trajectory set."""
    import graph_data_science_ray as gdsr

    from graph_data_science_ray.stages.trajectory import role_transitions

    turns = gdsr.events_as_transcripts(sf_dir)
    out = role_transitions(turns).to_pandas()
    return out.sort_values(["prev_role", "role"]).reset_index(drop=True)


def _q_turn_loops(sf_dir: str) -> pd.DataFrame:
    """Agent-loop detection: per-turn flags for same-actor repeated
    text within a conversation (stuck-agent signal)."""
    import graph_data_science_ray as gdsr

    from graph_data_science_ray.stages.trajectory import turn_loop_flags

    turns = gdsr.events_as_transcripts(sf_dir)
    out = turn_loop_flags(turns).to_pandas()
    return out.sort_values(["conv", "turn_idx"]).reset_index(drop=True)


def _q_turn_context(sf_dir: str) -> pd.DataFrame:
    """SFT context-assembly accounting: per-turn count/chars of the
    preceding 3-turn history window."""
    import graph_data_science_ray as gdsr

    from graph_data_science_ray.stages.trajectory import turn_context

    turns = gdsr.events_as_transcripts(sf_dir)
    out = turn_context(turns, k=3).to_pandas()
    return out.sort_values(["conv", "turn_idx"]).reset_index(drop=True)


def _q_pack_conversations(sf_dir: str) -> pd.DataFrame:
    """Conversation-integrity sequence packing: whole conversations
    assigned to training sequences by the exclusive token prefix sum
    (budget 256 whitespace tokens)."""
    import graph_data_science_ray as gdsr

    from graph_data_science_ray.stages.trajectory import pack_conversations

    turns = gdsr.events_as_transcripts(sf_dir)
    out = pack_conversations(turns, budget=256).to_pandas()
    return out.sort_values("conv").reset_index(drop=True)


def _q_conversation_jaccard(sf_dir: str) -> pd.DataFrame:
    """Conversation-level EXACT near-duplicate pairs: turn texts
    concatenate per conversation (stable turn order), then the exact
    word-3-gram Jaccard set-similarity join runs over those documents
    (threshold 0.1)."""
    import graph_data_science_ray as gdsr

    from graph_data_science_ray.stages.trajectory import conversation_jaccard

    turns = gdsr.events_as_transcripts(sf_dir)
    out = conversation_jaccard(turns, threshold=0.1).to_pandas()
    return out.sort_values(["conv_a", "conv_b"]).reset_index(drop=True)


def _q_turn_latency(sf_dir: str) -> pd.DataFrame:
    """Per-turn response latency in exact integer microseconds under
    stable turn ordering (first turn 0)."""
    import graph_data_science_ray as gdsr

    from graph_data_science_ray.stages.trajectory import turn_latency

    turns = gdsr.events_as_transcripts(sf_dir)
    out = turn_latency(turns).to_pandas()
    return out.sort_values(["conv", "turn_idx"]).reset_index(drop=True)


def _q_latency_stats(sf_dir: str) -> pd.DataFrame:
    """Per-conversation latency aggregates: gap count, wall span, max
    idle gap (exact int64 microseconds)."""
    import graph_data_science_ray as gdsr

    from graph_data_science_ray.stages.trajectory import latency_stats

    turns = gdsr.events_as_transcripts(sf_dir)
    out = latency_stats(turns).to_pandas()
    return out.sort_values("conv").reset_index(drop=True)


def _q_conversation_novelty(sf_dir: str) -> pd.DataFrame:
    """Per-conversation word-3-gram novelty (distinct/total as integer
    ppm) — the trajectory-level repetition signal."""
    import graph_data_science_ray as gdsr

    from graph_data_science_ray.stages.trajectory import conversation_novelty

    turns = gdsr.events_as_transcripts(sf_dir)
    out = conversation_novelty(turns).to_pandas()
    return out.sort_values("conv").reset_index(drop=True)


def _q_bigram_nll(sf_dir: str) -> pd.DataFrame:
    """Bigram-LM NLL per document in integer micro-nats (corpus MLE
    conditional model, per-ln floor-ppm discipline)."""
    from graph_data_science_ray.stages.ir import bigram_nll

    out = bigram_nll(_docs(sf_dir)).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _q_reciprocity(sf_dir: str) -> pd.DataFrame:
    """Directed-edge reciprocity (Newman): fraction of edges whose
    reverse also exists — all-integer canonical-pair aggregate."""
    from graph_data_science_ray.functions.graph_stats import reciprocity

    b = _bundle(sf_dir)
    return reciprocity(b["enc"])


def _q_assortativity(sf_dir: str) -> pd.DataFrame:
    """Degree assortativity over the undirected edge set: exact integer
    moment sums and the single-division Pearson r (rational — the
    symmetric marginals cancel the square root)."""
    from graph_data_science_ray.functions.graph_stats import (
        degree_assortativity,
    )

    b = _bundle(sf_dir)
    return degree_assortativity(b["sym"])


def _q_rich_club(sf_dir: str) -> pd.DataFrame:
    """Rich-club coefficients phi(k) at fixed thresholds — all-integer
    club-edge/possible-pair ratios over the undirected graph."""
    from graph_data_science_ray.functions.graph_stats import rich_club

    b = _bundle(sf_dir)
    return rich_club(b["sym"], ks=(1, 2, 4, 8, 16))


def _q_trajectory_pack(sf_dir: str) -> pd.DataFrame:
    """Composed trajectory flagship, oracled END-TO-END: exact
    duplicate-turn flags and agent-loop flags gate the turn set, the
    surviving turns pack into training sequences at conversation
    granularity (budget 256) — trajectory curation → packing in one
    streaming chain of individually-oracled stages."""
    import graph_data_science_ray as gdsr

    from graph_data_science_ray.stages.trajectory import trajectory_pack

    turns = gdsr.events_as_transcripts(sf_dir)
    out = trajectory_pack(turns, budget=256).to_pandas()
    return out.sort_values("conv").reset_index(drop=True)


def _q_source_mix(sf_dir: str) -> pd.DataFrame:
    """Deterministic domain-mixture reweighting: target weight
    ``(source_index % 4) + 1`` per source, global keep budget 50 % —
    per-source integer quotas + all-integer md5 acceptance, exactly
    reproduced in SQL."""
    import ray.data as rd

    from graph_data_science_ray.stages.sampling import source_mix_flags

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "source"],
    )
    out = source_mix_flags(
        docs, weight_of=lambda s: int(s[3:]) % 4 + 1,
        budget_ppm=500_000,
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _q_bloom_decontaminate(sf_dir: str) -> pd.DataFrame:
    """Bloom-filter benchmark decontamination (broadcast 8 KiB bit
    array, zero corpus shuffle): docs with doc_id % 37 == 0 are the
    benchmark; every other doc's distinct word-3-gram shingles probe
    the filter. Deterministic md5 bits make the flags — including any
    Bloom false positives — exactly SQL-reproducible."""
    from graph_data_science_ray.stages.sketch import bloom_decontaminate

    docs = _docs(sf_dir)
    corpus = docs.map_batches(
        lambda df: df[df["doc_id"] % 37 != 0], batch_format="pandas"
    )
    bench = docs.map_batches(
        lambda df: df[df["doc_id"] % 37 == 0], batch_format="pandas"
    )
    out = bloom_decontaminate(corpus, bench).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _q_split_relationships(sf_dir: str) -> pd.DataFrame:
    """Relationship holdout split (reference splitRelationships /
    EdgeSplitter.splitPositiveExamples): 20 % of edges become the
    'selected' positive set (label 1), the rest 'remaining' — decided
    per edge by an all-integer md5 acceptance, map-side only, exactly
    reproduced in SQL."""
    import ray

    from graph_data_science_ray.pipelines.ml import split_relationships

    b = _bundle(sf_dir)
    keys_ref = ray.put(_strip(b["idmap"].keys))

    def decode(df: pd.DataFrame) -> pd.DataFrame:
        keys = ray.get(keys_ref)
        return pd.DataFrame(
            {"src": keys[df["src"].to_numpy(dtype=np.int64)],
             "dst": keys[df["dst"].to_numpy(dtype=np.int64)],
             "weight": df["weight"].to_numpy(dtype=np.float64)}
        )

    edges = b["enc"].map_batches(decode, batch_format="pandas")
    out = split_relationships(edges, holdout_ppm=200_000).to_pandas()
    return out.sort_values(["src", "dst"]).reset_index(drop=True)


def _q_training_mix(sf_dir: str) -> pd.DataFrame:
    """FLAGSHIP composed curation pipeline, end-to-end as one streaming
    Dataset chain: exact dedup (keeper hash-join) → benchmark n-gram
    decontamination (docs % 37 == 0 are the held-out benchmark) →
    quality filter (≥5 tokens) → global deterministic shuffle →
    fixed-stride sequence packing at a 512-token budget. Every stage is
    individually oracled; this query oracles the COMPOSITION."""
    import pyarrow as pa
    import ray.data as rd

    from graph_data_science_ray.pipelines.agg import hash_join
    from graph_data_science_ray.stages.dedup import decontaminate, dedup_exact_filter
    from graph_data_science_ray.stages.sampling import deterministic_shuffle
    from graph_data_science_ray.stages.text import token_count
    from graph_data_science_ray.stages.window import running_sum

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    kept = dedup_exact_filter(docs)
    corpus = kept.map_batches(
        lambda df: df[df["doc_id"] % 37 != 0], batch_format="pandas"
    )
    bench = docs.map_batches(
        lambda df: df[df["doc_id"] % 37 == 0], batch_format="pandas"
    )
    clean_ids = decontaminate(corpus, bench).map_batches(
        lambda df: df[df["contaminated"] == 0][["doc_id"]].astype(np.int64),
        batch_format="pandas",
    )
    clean = hash_join(
        corpus, clean_ids, on=["doc_id"],
        left_schema=pa.schema([("doc_id", pa.int64()), ("text", pa.string())]),
        right_schema=pa.schema([("doc_id", pa.int64())]),
    )
    tc = token_count(clean).filter(expr="n_tokens >= 5")
    shuffled = deterministic_shuffle(tc, "doc_id", salt="mix")
    packed = running_sum(shuffled, ["pos"], "n_tokens", out_col="offset",
                         inclusive=False)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        off = df["offset"].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype(np.int64),
                "pos": df["pos"].astype(np.int64),
                "n_tokens": df["n_tokens"].astype(np.int64),
                "seq_id": off // np.int64(512),
                "offset": off,
            }
        )

    out = packed.map_batches(finish, batch_format="pandas").to_pandas()
    return out.sort_values("pos").reset_index(drop=True)


def _q_asof_join(sf_dir: str) -> pd.DataFrame:
    """Backward as-of join: each purchase matched to the user's latest
    click at-or-before it (inner; ties broken by max click event_id)."""
    import ray.data as rd

    from graph_data_science_ray.stages.sessions import asof_join

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )
    out = asof_join(
        ev.filter(expr="event_type == 'purchase'"),
        ev.filter(expr="event_type == 'click'"),
        inner=True,
    ).to_pandas()
    return pd.DataFrame(
        {
            "user_id": out["user_id"].astype(np.int64),
            "ts_us": out["ts"].astype("datetime64[us]").astype(np.int64),
            "event_id": out["event_id"].astype(np.int64),
            "value": out["value"].astype(np.float64),
            "r_event_id": out["r_event_id"].astype(np.int64),
            "r_value": out["r_value"].astype(np.float64),
        }
    ).sort_values("event_id").reset_index(drop=True)


def _q_feature_backfill(sf_dir: str) -> pd.DataFrame:
    """Composition: per-user 1h/15min sliding-window CLICK features,
    backfilled onto purchases with a backward as-of join (each purchase
    sees the latest CLOSED window at-or-before it) — the training-data
    feature-join shape."""
    import ray.data as rd

    from graph_data_science_ray.stages.sessions import feature_backfill

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )
    out = feature_backfill(
        ev.filter(expr="event_type == 'purchase'"),
        ev.filter(expr="event_type == 'click'"),
        window_seconds=3600, slide_seconds=900, inner=True,
    ).to_pandas()
    return pd.DataFrame(
        {
            "user_id": out["user_id"].astype(np.int64),
            "event_id": out["event_id"].astype(np.int64),
            "value": out["value"].astype(np.float64),
            "f_window_start": out["f_window_start"].astype(np.int64),
            "f_n": out["f_n"].astype(np.int64),
            "f_value_sum": np.round(
                out["f_value_sum"].to_numpy(dtype=np.float64), 6
            ),
        }
    ).sort_values("event_id").reset_index(drop=True)


def _q_knn(sf_dir: str) -> pd.DataFrame:
    import ray.data as rd

    from graph_data_science_ray.stages.similarity import knn_brute_force

    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    res = knn_brute_force(emb, query_ids=np.arange(10), k=5)
    # ids + rank only: the sim value is float and hash-fragile across engines
    res = res[["query_id", "neighbor_id", "rank"]].copy()
    return res.sort_values(["query_id", "rank"]).reset_index(drop=True)


def _q_knn_quantized(sf_dir: str) -> pd.DataFrame:
    """int8 scalar-quantized top-k: INTEGER dot-product scores are
    bit-exact, so ids + rank + score are all hash-compared."""
    import ray.data as rd

    from graph_data_science_ray.stages.similarity import knn_quantized

    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    res = knn_quantized(emb, query_ids=np.arange(10), k=5)
    return res.sort_values(["query_id", "rank"]).reset_index(drop=True)


def _q_knn_metric(sf_dir: str, metric: str) -> pd.DataFrame:
    """Brute-force top-k under the reference's euclidean/pearson knn
    metrics (similarity/knn/metrics/{Euclidean,Pearson}.java)."""
    import ray.data as rd

    from graph_data_science_ray.stages.similarity import knn_brute_force

    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    res = knn_brute_force(emb, query_ids=np.arange(10), k=5, metric=metric)
    res = res[["query_id", "neighbor_id", "rank"]].copy()
    return res.sort_values(["query_id", "rank"]).reset_index(drop=True)


def _q_linkpred_funcs(sf_dir: str) -> pd.DataFrame:
    """The six reference link-prediction topology functions
    (gds.alpha.linkprediction.*) scored distributedly over a deterministic
    pair set: all (a, b), a < b, among the first 25 dense ids (==
    lexicographically-first actors). sameCommunity uses the WCC min-id
    labels (exactly oracled by `wcc`)."""
    import ray.data as rd

    import graph_data_science_ray as gdsr
    from graph_data_science_ray.functions.linkpred import link_prediction_scores

    b = _bundle(sf_dir)
    n = len(b["idmap"])
    k = min(25, n)
    ids = np.arange(k, dtype=np.int64)
    ai, bi = np.meshgrid(ids, ids, indexing="ij")
    mask = ai < bi
    pairs = rd.from_pandas(
        pd.DataFrame({"node_a": ai[mask], "node_b": bi[mask]})
    )
    comp = gdsr.wcc(b["gu"])
    com = b["idmap"].to_ids(comp["component"].to_numpy(dtype=object))
    res = link_prediction_scores(b["sym"], pairs, n, community=com, num_parts=8)
    df = res.to_pandas()
    keys = b["idmap"].keys
    df["node_a"] = _strip(keys[df["node_a"].to_numpy(dtype=np.int64)])
    df["node_b"] = _strip(keys[df["node_b"].to_numpy(dtype=np.int64)])
    return df.sort_values(["node_a", "node_b"]).reset_index(drop=True)


def _q_vector_similarity(sf_dir: str) -> pd.DataFrame:
    """The six reference similarity functions (gds.similarity.*) over a
    deterministic pair stream: embedding vec i paired with vec i+1 via a
    hash-partitioned self-join, scored batch-locally (no shuffle)."""
    import pyarrow as pa
    import ray.data as rd

    from graph_data_science_ray.functions.simfunc import vector_similarity
    from graph_data_science_ray.pipelines.agg import hash_join

    emb = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )

    def left(t: "pa.Table") -> "pa.Table":
        return pa.table({"pair_id": t["vec_id"], "vec_a": t["embedding"]})

    def right(t: "pa.Table") -> "pa.Table":
        import pyarrow.compute as pc

        return pa.table(
            {"pair_id": pc.subtract(t["vec_id"], 1), "vec_b": t["embedding"]}
        )

    vec_t = pa.list_(pa.float32())
    pairs = hash_join(
        emb.map_batches(left, batch_format="pyarrow"),
        emb.map_batches(right, batch_format="pyarrow"),
        on=["pair_id"],
        num_parts=8,
        left_schema=pa.schema([("pair_id", pa.int64()), ("vec_a", vec_t)]),
        right_schema=pa.schema([("pair_id", pa.int64()), ("vec_b", vec_t)]),
    )
    df = vector_similarity(pairs).to_pandas()
    return df.sort_values("pair_id").reset_index(drop=True)


def _q_knn_ivf(sf_dir: str) -> pd.DataFrame:
    """IVF-Flat at FULL probe (nprobe = num_lists) is exhaustive, so it
    must reproduce the brute-force top-k exactly — shares that oracle.
    The rows-only recall contract for partial probes lives in pytest
    (test_knn_ivf_recall)."""
    import ray.data as rd

    from graph_data_science_ray.stages.similarity import knn_ivf

    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    res = knn_ivf(
        emb, query_ids=np.arange(10), k=5, num_lists=8, nprobe=8, seed=5
    )
    res = res[["query_id", "neighbor_id", "rank"]].copy()
    return res.sort_values(["query_id", "rank"]).reset_index(drop=True)


def _q_knn_lsh_multiband(sf_dir: str) -> pd.DataFrame:
    """Multi-band LSH at num_planes=0 degenerates to one all-corpus
    bucket per band, so the merged per-query top-k must reproduce the
    EXACT brute-force cosine top-k — the same full-probe-shares-the-
    exact-oracle pattern as `knn_ivf`. The amplified-recall contract for
    real plane counts lives in pytest
    (test_knn_lsh_multiband_amplifies_recall)."""
    import ray.data as rd

    from graph_data_science_ray.stages.similarity import knn_lsh_multiband

    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    res = knn_lsh_multiband(emb, k=5, num_planes=0, num_bands=2, seed=5).to_pandas()
    res = res[["query_id", "neighbor_id", "rank"]].astype(np.int64)
    return res.sort_values(["query_id", "rank"]).reset_index(drop=True)


def _q_knn_descent(sf_dir: str) -> pd.DataFrame:
    import ray.data as rd

    from graph_data_science_ray.stages.knn_descent import knn_descent

    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    out = knn_descent(emb, k=5, max_rounds=4)
    return out[["query_id", "neighbor_id", "rank"]].sort_values(
        ["query_id", "rank"]
    ).reset_index(drop=True)


def _q_embedding_near_dup(sf_dir: str) -> pd.DataFrame:
    import ray.data as rd

    from graph_data_science_ray.stages.similarity import embedding_near_dup

    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    out = embedding_near_dup(emb, threshold=0.35, id_limit=300)
    out = out[["doc_a", "doc_b"]].astype(np.int64)
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def _q_scale_minmax(sf_dir: str) -> pd.DataFrame:
    import ray.data as rd

    from graph_data_science_ray.stages.scale import scale_column

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id", "event_type", "value"]
    )
    out = scale_column(ev, "value", scaler="minmax", group_col="event_type").to_pandas()
    return (
        out[["event_id", "scaled"]]
        .sort_values("event_id")
        .reset_index(drop=True)
    )


def _q_sessionize(sf_dir: str) -> pd.DataFrame:
    import ray.data as rd

    from graph_data_science_ray.stages.sessions import sessionize

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id"],
    )
    out = sessionize(ev, gap_seconds=1800.0).to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


def _q_window_hourly(sf_dir: str) -> pd.DataFrame:
    import ray.data as rd

    from graph_data_science_ray.stages.sessions import tumbling_window

    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["ts", "value"])
    out = tumbling_window(ev, window_seconds=3600).to_pandas()
    out["value_sum"] = np.round(out["value_sum"].to_numpy(dtype=np.float64), 6)
    return out.sort_values("window_start").reset_index(drop=True)


def _q_range_join(sf_dir: str) -> pd.DataFrame:
    """Banded interval join: clicks within ±1h of each purchase, per
    user — count and value sum."""
    import ray.data as rd

    from graph_data_science_ray.stages.sessions import range_join

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )
    out = range_join(
        ev.filter(expr="event_type == 'purchase'"),
        ev.filter(expr="event_type == 'click'"),
        before_seconds=3600, after_seconds=3600,
    ).to_pandas()
    return pd.DataFrame(
        {
            "user_id": out["user_id"].astype(np.int64),
            "event_id": out["event_id"].astype(np.int64),
            "value": out["value"].astype(np.float64),
            "n_in_range": out["n_in_range"].astype(np.int64),
            "sum_in_range": np.round(
                out["sum_in_range"].to_numpy(dtype=np.float64), 6
            ),
        }
    ).sort_values("event_id").reset_index(drop=True)


def _q_window_sliding(sf_dir: str) -> pd.DataFrame:
    """1h windows sliding every 15min (each event in 4 windows)."""
    import ray.data as rd

    from graph_data_science_ray.stages.sessions import sliding_window

    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["ts", "value"])
    out = sliding_window(
        ev, window_seconds=3600, slide_seconds=900
    ).to_pandas()
    out["value_sum"] = np.round(out["value_sum"].to_numpy(dtype=np.float64), 6)
    return out.sort_values("window_start").reset_index(drop=True)


# --------------------------------------------------------------------------
# contract functions
# --------------------------------------------------------------------------


# --------------------------------------------------------------------------
# round-2 operators
# --------------------------------------------------------------------------

_YENS_MINW, _YENS_HOPS = 3.0, 6


def _q_yens_k3(sf_dir: str) -> pd.DataFrame:
    """3 shortest loopless paths on the weight>=3 subgraph.

    The (source, target) pair is data-driven on BOTH sides: the pair with
    the most 2-hop paths (ties: smaller src, dst — dense-id order equals
    the oracle's VARCHAR order because the IdMap sorts keys
    lexicographically). Only (path_rank, total_cost) are compared: the
    COST sequence of the K shortest paths is unique, while WHICH
    equal-cost path gets which rank is tie-break-dependent (Yens.java
    makes no promise either)."""
    from graph_data_science_ray.functions.paths import yens_k_shortest
    from graph_data_science_ray.pipelines.transforms import collapse_path

    b = _bundle(sf_dir)
    # adaptive threshold (mirrored in SQL): at scales where no edge
    # reaches _YENS_MINW the filter would empty the subgraph, so clamp to
    # the global max weight
    max_w = float(b["enc"].max("weight"))
    minw = min(_YENS_MINW, max_w)
    sub = b["enc"].filter(expr=f"weight >= {minw}").materialize()
    th = collapse_path(sub, sub, num_partitions=8).to_pandas()
    if not len(th) or "weight" not in th.columns:
        return pd.DataFrame(
            {"path_rank": pd.Series([], dtype=np.int64),
             "total_cost": pd.Series([], dtype=np.float64)}
        )
    th = th.sort_values(
        ["weight", "src", "dst"], ascending=[False, True, True], kind="mergesort"
    )
    src_id, dst_id = int(th.iloc[0]["src"]), int(th.iloc[0]["dst"])
    out = yens_k_shortest(sub, len(b["idmap"]), src_id, dst_id, k=3)
    ranks = out.groupby("path_rank")["total_cost"].first().reset_index()
    return pd.DataFrame(
        {"path_rank": ranks["path_rank"].astype(np.int64),
         "total_cost": ranks["total_cost"].astype(np.float64)}
    )


def _q_delta_stepping(sf_dir: str) -> pd.DataFrame:
    """Bucketed SSSP — same exact distances as the sssp query/oracle."""
    from graph_data_science_ray.functions.paths import delta_stepping

    b = _bundle(sf_dir)
    res = delta_stepping(b["gd"], source_id=0, delta=2.0, weighted=True)
    return pd.DataFrame(
        {"node": _strip(res["node"]), "distance": res["distance"].astype(np.float64)}
    )


def _q_astar(sf_dir: str) -> pd.DataFrame:
    """A* with the zero heuristic: target cost equals the SSSP distance."""
    from graph_data_science_ray.functions.paths import astar_route

    b = _bundle(sf_dir)
    target = len(b["idmap"]) - 1
    h = np.zeros(len(b["idmap"]))
    route = astar_route(b["gd"], 0, target, heuristic=h, weighted=True)
    cost = float(route["distance"].iloc[-1]) if len(route) else -1.0
    return pd.DataFrame({"total_cost": np.array([cost], dtype=np.float64)})


def _q_astar_haversine(sf_dir: str) -> pd.DataFrame:
    """A* with the reference's haversine lat/long heuristic (algo/.../
    paths/astar/AStar.java): deterministic synthetic coordinates per
    actor (uid-derived), scaled far below the minimum edge weight so
    admissibility is structural — the target cost must equal the plain
    SSSP distance (shared oracle shape with `astar`)."""
    from graph_data_science_ray.functions.paths import (
        astar_route, haversine_heuristic,
    )

    b = _bundle(sf_dir)
    uids = _strip(b["idmap"].keys).astype(np.int64)
    lat = (uids * 37 % 17000) / 100.0 - 85.0
    lon = (uids * 101 % 35000) / 100.0 - 175.0
    target = len(b["idmap"]) - 1
    # max haversine ~2e4 km x 1e-9 = 2e-5 << min weight 1 => admissible
    h = haversine_heuristic(lat, lon, target_id=target, scale=1e-9)
    route = astar_route(b["gd"], 0, target, heuristic=h, weighted=True)
    cost = float(route["distance"].iloc[-1]) if len(route) else -1.0
    return pd.DataFrame({"total_cost": np.array([cost], dtype=np.float64)})


def _q_dfs(sf_dir: str) -> pd.DataFrame:
    from graph_data_science_ray.functions.paths import dfs_preorder

    b = _bundle(sf_dir)
    out = dfs_preorder(b["gd"], 0)
    return pd.DataFrame(
        {"order": out["order"].astype(np.int64), "node": _strip(out["node"])}
    )


def _q_node2vec(sf_dir: str) -> pd.DataFrame:
    from graph_data_science_ray.functions.node2vec import node2vec

    b = _bundle(sf_dir)
    out = node2vec(b["gu"], dim=16, walk_length=10, walks_per_node=2, epochs=2, seed=9)
    out["node"] = _strip(out["node"])
    out["embedding"] = [",".join(f"{x:.6f}" for x in v) for v in out["embedding"]]
    return out.sort_values("node").reset_index(drop=True)


def _q_graphsage(sf_dir: str) -> pd.DataFrame:
    """GraphSAGE mean-aggregator embeddings (rows-only: sampled
    neighborhoods + iterative Adam training are not SQL-expressible).
    Deterministic at any parallelism — fixed shard-order combine."""
    from graph_data_science_ray.functions.graphsage import graphsage

    b = _bundle(sf_dir)
    out = graphsage(b["gu"], embedding_dim=16, sample_sizes=(10, 5),
                    epochs=5, seed=17)
    out["node"] = _strip(out["node"])
    out["embedding"] = [",".join(f"{x:.6f}" for x in v) for v in out["embedding"]]
    return out.sort_values("node").reset_index(drop=True)


def _q_graphsage_multilabel(sf_dir: str) -> pd.DataFrame:
    """Multi-label GraphSAGE (reference MultiLabelFeatureFunction.java:33):
    per-label TRAINED projections feed the shared layers. Labels are the
    dense-id parity (deterministic); label-1 rows carry a zero-padded
    third feature column, exercising the padding-exactness contract.
    Rows-only: sampled neighborhoods + Adam are not SQL-expressible."""
    from graph_data_science_ray.functions.graphsage import graphsage

    b = _bundle(sf_dir)
    gu = b["gu"]
    V = gu.node_count
    deg = gu.out_degrees().astype(np.float64)
    labels = np.arange(V, dtype=np.int64) % 2
    feats = np.stack([deg, np.ones(V), np.log1p(deg)], axis=1)
    feats[labels == 1, 2] = 0.0
    out = graphsage(gu, features=feats, node_labels=labels, projected_dim=3,
                    embedding_dim=16, sample_sizes=(10, 5), epochs=5, seed=19)
    out["node"] = _strip(out["node"])
    out["embedding"] = [",".join(f"{x:.6f}" for x in v) for v in out["embedding"]]
    return out.sort_values("node").reset_index(drop=True)


def _q_sllpa(sf_dir: str) -> pd.DataFrame:
    from graph_data_science_ray.functions.community2 import sllpa

    b = _bundle(sf_dir)
    out = sllpa(b["gu"], rounds=15, threshold=0.1, seed=6)
    return pd.DataFrame(
        {"node": _strip(out["node"]), "community": _strip(out["community"])}
    ).sort_values(["node", "community"]).reset_index(drop=True)


def _q_max_k_cut(sf_dir: str) -> pd.DataFrame:
    from graph_data_science_ray.functions.community2 import approx_max_k_cut

    b = _bundle(sf_dir)
    assign, cut = approx_max_k_cut(
        b["sym"], len(b["idmap"]), k=3, rounds=6, seed=3, idmap=b["idmap"]
    )
    return pd.DataFrame(
        {"node": _strip(assign["node"]), "part": assign["part"].astype(np.int64)}
    )


def _q_celf(sf_dir: str) -> pd.DataFrame:
    from graph_data_science_ray.functions.influence import celf

    b = _bundle(sf_dir)
    out = celf(b["gd"], k=5, propagation_probability=0.2,
               monte_carlo_simulations=10, candidate_limit=30, seed=8)
    return pd.DataFrame(
        {"node": _strip(out["node"]),
         "spread_gain": out["spread_gain"].astype(np.float64)}
    )


def _q_hashgnn(sf_dir: str) -> pd.DataFrame:
    from graph_data_science_ray.functions.hashgnn import hash_gnn

    b = _bundle(sf_dir)
    out = hash_gnn(b["gu"], dim=8, iterations=1, seed=5)
    out["node"] = _strip(out["node"])
    out["signature"] = [",".join(str(int(x)) for x in v) for v in out["signature"]]
    return out.sort_values("node").reset_index(drop=True)


def _q_k_spanning(sf_dir: str) -> pd.DataFrame:
    from graph_data_science_ray.functions.spanning import k_spanning_tree

    b = _bundle(sf_dir)
    out = k_spanning_tree(b["sym"], len(b["idmap"]), k=5, idmap=b["idmap"])
    return pd.DataFrame(
        {"node": _strip(out["node"]), "cluster": _strip(out["cluster"])}
    )


def _q_k_spanning_valid(sf_dir: str) -> pd.DataFrame:
    """k-spanning validity invariants (exact, oracle-checkable): the
    clustering must have exactly C + (k-1) clusters — every removed MST
    edge is a bridge of the forest, so each removal splits exactly one
    tree — where C is the WCC component count the SQL oracle recomputes
    independently via recursive reachability; and every cluster must
    induce a connected subgraph (checked by min-label propagation over
    the intra-cluster edges). The cluster assignment itself is
    tie-break-specific (covered rows-only by `k_spanning`)."""
    from graph_data_science_ray.functions.spanning import k_spanning_tree

    b = _bundle(sf_dir)
    n = len(b["idmap"])
    out = k_spanning_tree(b["sym"], n, k=5)
    clusters = np.zeros(n, dtype=np.int64)
    clusters[out["node"].to_numpy(dtype=np.int64)] = out["cluster"].to_numpy(
        dtype=np.int64
    )
    n_clusters = len(np.unique(clusters))
    # intra-cluster connectivity via min-label propagation (test-scale
    # driver pull of the slim edge list; the operator itself is the
    # distributed path)
    e = b["sym"].select_columns(["src", "dst"]).to_pandas()
    s = e["src"].to_numpy(dtype=np.int64)
    d = e["dst"].to_numpy(dtype=np.int64)
    keep = clusters[s] == clusters[d]
    s, d = s[keep], d[keep]
    comp = np.arange(n, dtype=np.int64)
    while True:
        before = comp.copy()
        np.minimum.at(comp, s, comp[d])
        np.minimum.at(comp, d, comp[s])
        while True:
            c2 = comp[comp]
            if np.array_equal(c2, comp):
                break
            comp = c2
        if np.array_equal(before, comp):
            break
    df = pd.DataFrame({"cl": clusters, "comp": comp})
    disconnected = int((df.groupby("cl")["comp"].nunique() > 1).sum())
    return pd.DataFrame(
        {
            "n_clusters": np.array([n_clusters], dtype=np.int64),
            "disconnected_clusters": np.array([disconnected], dtype=np.int64),
        }
    )


def _q_steiner(sf_dir: str) -> pd.DataFrame:
    from graph_data_science_ray.functions.spanning import steiner_tree

    b = _bundle(sf_dir)
    terminals = [len(b["idmap"]) - 1, len(b["idmap"]) // 2]
    tree, total = steiner_tree(b["gu"], 0, terminals, weighted=True)
    tree = tree.copy()
    tree["src"] = _strip(tree["src"])
    tree["dst"] = _strip(tree["dst"])
    return tree.sort_values(["src", "dst"]).reset_index(drop=True)


def _q_steiner_valid(sf_dir: str) -> pd.DataFrame:
    """Steiner-tree validity invariants (exact, oracle-checkable): the
    returned edge set is a tree (|E| = |nodes|-1, one component
    containing the source), every tree edge is a real graph edge with
    its real weight, and the number of terminals the tree connects
    equals the number of terminals REACHABLE from the source — which the
    SQL oracle recomputes independently by recursive reachability. The
    tree's edge choice is heuristic-specific (covered rows-only by
    `steiner`)."""
    from graph_data_science_ray.functions.spanning import steiner_tree

    b = _bundle(sf_dir)
    n = len(b["idmap"])
    terminals = [n - 1, n // 2]
    tree, _total = steiner_tree(b["gu"], 0, terminals, weighted=True)
    if len(tree):
        s = b["idmap"].to_ids(tree["src"].to_numpy(dtype="U"))
        d = b["idmap"].to_ids(tree["dst"].to_numpy(dtype="U"))
        w = tree["weight"].to_numpy(dtype=np.float64)
    else:
        s = d = np.zeros(0, dtype=np.int64)
        w = np.zeros(0)
    nodes = np.unique(np.concatenate([s, d, [0]]))
    comp = np.arange(n, dtype=np.int64)
    while True:
        before = comp.copy()
        np.minimum.at(comp, s, comp[d])
        np.minimum.at(comp, d, comp[s])
        while True:
            c2 = comp[comp]
            if np.array_equal(c2, comp):
                break
            comp = c2
        if np.array_equal(before, comp):
            break
    one_comp = len(np.unique(comp[nodes])) == 1
    tree_ok = int(len(s) == len(nodes) - 1 and one_comp)
    e = b["sym"].select_columns(["src", "dst", "weight"]).to_pandas()
    real = {
        (int(a), int(c)): float(v)
        for a, c, v in zip(e["src"], e["dst"], e["weight"])
    }
    edges_valid = int(
        all(real.get((int(a), int(c))) == v for a, c, v in zip(s, d, w))
    )
    tree_nodes = set(nodes.tolist())
    terminals_connected = sum(1 for t in terminals if t in tree_nodes)
    return pd.DataFrame(
        {
            "terminals_connected": np.array([terminals_connected], dtype=np.int64),
            "tree_ok": np.array([tree_ok], dtype=np.int64),
            "edges_valid": np.array([edges_valid], dtype=np.int64),
        }
    )


def _q_cnarw(sf_dir: str) -> pd.DataFrame:
    from graph_data_science_ray.functions.walks import cnarw_sample

    b = _bundle(sf_dir)
    out = cnarw_sample(b["gu"], sample_size=50, seed=13)
    return pd.DataFrame({"node": _strip(out["node"])})


def _q_dfs_valid(sf_dir: str) -> pd.DataFrame:
    """DFS validity invariants (exact, oracle-checkable): the visited set
    equals the directed reachable set from the source (count pinned by a
    recursive-CTE oracle), the emitted order is the permutation 0..n−1,
    the source is order 0, and every non-source node has an in-neighbor
    visited EARLIER (the preorder parent property). The visit sequence
    itself is covered rows-only by `dfs`."""
    import ray

    from graph_data_science_ray.functions.paths import dfs_preorder
    from graph_data_science_ray.pipelines.agg import hash_distinct

    b = _bundle(sf_dir)
    out = dfs_preorder(b["gd"], 0)
    ids = b["idmap"].to_ids(out["node"].to_numpy(dtype="U"))
    order = out["order"].to_numpy(dtype=np.int64)
    n = len(out)
    perm_ok = int(np.array_equal(np.sort(order), np.arange(n)))
    source_first = int(n > 0 and ids[np.argmin(order)] == 0)
    pos = np.full(len(b["idmap"]), -1, dtype=np.int64)
    pos[ids] = order
    pref = ray.put(pos)

    def viol(t):
        import pyarrow as _pa
        p = ray.get(pref)
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        ok = (p[src] >= 0) & (p[dst] >= 0) & (p[src] < p[dst])
        good = np.unique(dst[ok])
        return _pa.table({"node": good})

    with_parent = hash_distinct(
        b["enc"].map_batches(viol, batch_format="pyarrow"), ["node"]
    ).count()
    # every visited node except the source must have an earlier in-neighbor
    parent_ok = int(with_parent == max(n - 1, 0))
    return pd.DataFrame(
        {
            "n_visited": np.array([n], dtype=np.int64),
            "perm_ok": np.array([perm_ok], dtype=np.int64),
            "source_first": np.array([source_first], dtype=np.int64),
            "parent_ok": np.array([parent_ok], dtype=np.int64),
        }
    )


def _sample_valid(sf_dir: str, sampler: str, seed: int) -> pd.DataFrame:
    """Shared validity body for the RWR / CNARW node samplers: sample
    size equals min(50, |component of node 0|) (the component size is
    recomputed independently by the SQL oracle's recursive CTE), every
    sampled node lies in that component (checked engine-side against an
    unweighted BFS), nodes are distinct, and the start node is sampled."""
    from graph_data_science_ray.functions.sssp import shortest_paths
    from graph_data_science_ray.functions.walks import cnarw_sample, rwr_sample

    b = _bundle(sf_dir)
    fn = rwr_sample if sampler == "rwr" else cnarw_sample
    out = fn(b["gu"], sample_size=50, seed=seed)
    ids = out["node_id"].to_numpy(dtype=np.int64)
    reach = shortest_paths(b["gu"], source_id=0, weighted=False)
    rset = set(b["idmap"].to_ids(reach["node"].to_numpy(dtype="U")).tolist())
    return pd.DataFrame(
        {
            "n_sampled": np.array([len(ids)], dtype=np.int64),
            "distinct_ok": np.array(
                [int(len(np.unique(ids)) == len(ids))], dtype=np.int64
            ),
            "unreachable": np.array(
                [int(sum(1 for i in ids if int(i) not in rset))], dtype=np.int64
            ),
            "has_start": np.array([int(0 in ids)], dtype=np.int64),
        }
    )


def _q_rwr_valid(sf_dir: str) -> pd.DataFrame:
    return _sample_valid(sf_dir, "rwr", seed=11)


def _q_cnarw_valid(sf_dir: str) -> pd.DataFrame:
    return _sample_valid(sf_dir, "cnarw", seed=13)


def _embedding_valid(out: pd.DataFrame, col: str, dim: int) -> pd.DataFrame:
    """Shared shape/sanity invariants for trained embedding tables: one
    row per node (count pinned by the oracle's independent node count),
    fixed dimension, no non-finite values."""
    vals = np.stack(
        [np.array(v.split(","), dtype=np.float64) for v in out[col]]
    ) if len(out) else np.zeros((0, dim))
    return pd.DataFrame(
        {
            "n_rows": np.array([len(out)], dtype=np.int64),
            "dim": np.array(
                [int(vals.shape[1]) if len(out) else dim], dtype=np.int64
            ),
            "n_nonfinite": np.array(
                [int((~np.isfinite(vals)).sum())], dtype=np.int64
            ),
        }
    )


_TRAINED_CACHE: dict = {}


def _cached(name: str, sf_dir: str, fn) -> pd.DataFrame:
    """The *_valid wrappers re-read their trainer's output; cache one run
    per (query, sf_dir) so the driver doesn't train twice."""
    key = (name, sf_dir)
    if key not in _TRAINED_CACHE:
        _TRAINED_CACHE[key] = fn(sf_dir)
    return _TRAINED_CACHE[key]


def _q_node2vec_valid(sf_dir: str) -> pd.DataFrame:
    return _embedding_valid(
        _cached("node2vec", sf_dir, _q_node2vec), "embedding", 16
    )


def _q_graphsage_valid(sf_dir: str) -> pd.DataFrame:
    return _embedding_valid(
        _cached("graphsage", sf_dir, _q_graphsage), "embedding", 16
    )


def _q_graphsage_multilabel_valid(sf_dir: str) -> pd.DataFrame:
    return _embedding_valid(
        _cached("graphsage_multilabel", sf_dir, _q_graphsage_multilabel),
        "embedding", 16,
    )


def _q_hashgnn_valid(sf_dir: str) -> pd.DataFrame:
    out = _cached("hashgnn", sf_dir, _q_hashgnn)
    sigs = np.stack(
        [np.array(v.split(","), dtype=np.int64) for v in out["signature"]]
    )
    return pd.DataFrame(
        {
            "n_rows": np.array([len(out)], dtype=np.int64),
            "dim": np.array([int(sigs.shape[1])], dtype=np.int64),
            "n_invalid": np.array([int((sigs < 0).sum())], dtype=np.int64),
        }
    )


def _q_node_classification_valid(sf_dir: str) -> pd.DataFrame:
    """NodeClassification validity: one prediction per embedding row
    (count pinned by the oracle), predicted labels inside the observed
    label domain."""
    preds = _cached("node_classification", sf_dir, _q_node_classification)
    out_rows = len(preds)
    dom = set(preds["label"].unique().tolist())
    bad = int((~preds["predicted"].isin(list(dom))).sum())
    return pd.DataFrame(
        {
            "n_rows": np.array([out_rows], dtype=np.int64),
            "bad_labels": np.array([bad], dtype=np.int64),
        }
    )


def _q_scale_l2(sf_dir: str) -> pd.DataFrame:
    import ray.data as rd

    from graph_data_science_ray.stages.scale import scale_column

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "n_chars"]
    )
    out = scale_column(ds, "n_chars", scaler="l2norm").to_pandas()
    return (
        out[["doc_id", "scaled"]]
        .astype({"doc_id": np.int64, "scaled": np.float64})
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def _q_lp_node_weighted(sf_dir: str) -> pd.DataFrame:
    """Label propagation with nodeWeight(neighbor) = 1 + (user_id % 3)."""
    import graph_data_science_ray as gdsr

    b = _bundle(sf_dir)
    users = _strip(b["idmap"].keys).astype(np.int64)
    nw = 1.0 + (users % 3)
    res = gdsr.label_propagation(
        b["gu"], max_iterations=_LP_ROUNDS + 1, weighted=True, node_weights=nw
    )
    labels = res["label"].to_numpy()
    return pd.DataFrame({"node": _strip(res["node"]), "label": _strip(labels)})


def _q_edges_max(sf_dir: str) -> pd.DataFrame:
    """Parallel-edge MAX aggregation at derivation (reference Aggregation
    modes): weight = max inter-turn gap (microseconds) per (src, dst)."""
    import graph_data_science_ray as gdsr
    from graph_data_science_ray.pipelines.edges import derive_edges_agg

    ts = gdsr.events_as_transcripts(sf_dir)
    turns = gdsr.derive_turns(ts, keep_ts=True)
    df = derive_edges_agg(turns, aggregation="max", num_partitions=8).to_pandas()
    return pd.DataFrame(
        {
            "src": _strip(df["src"]),
            "dst": _strip(df["dst"]),
            "weight": df["weight"].astype(np.float64),
        }
    )


def _q_cypher_project(sf_dir: str) -> pd.DataFrame:
    """Cypher-style expression projection (arbitrary-rows surface):
    endpoints, weight and filter are per-row expressions over lineitem,
    parallel rows SUM-combined — the reference's graph.project.cypher
    contract re-expressed as vectorized batch eval."""
    import ray.data as rd

    from graph_data_science_ray.pipelines.edges import edges_from_expressions

    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_partkey", "l_quantity", "l_discount"],
    )
    out = edges_from_expressions(
        li,
        src="l_orderkey % 97",
        dst="l_partkey % 89",
        # integer-valued per-row weight: sums are exact in float64, so
        # numpy and DuckDB agree bit-for-bit regardless of sum order
        weight="l_quantity * 2 + 1",
        where="l_quantity > 45 and l_discount < 0.05",
        aggregation="sum",
        num_partitions=4,
    ).to_pandas()
    return pd.DataFrame(
        {
            "src": out["src"].astype(np.int64),
            "dst": out["dst"].astype(np.int64),
            "weight": out["weight"].astype(np.int64),
        }
    ).sort_values(["src", "dst"]).reset_index(drop=True)


def _q_nodesim_topk(sf_dir: str) -> pd.DataFrame:
    """Per-node top-K node similarity (the reference's topK contract):
    DIRECTED rows, each node keeps its K most similar others (sim desc,
    smaller other id on ties) — computed inside the distributed pipeline,
    never via a full-pair collect."""
    from graph_data_science_ray.functions.nodesim import node_similarity

    b = _bundle(sf_dir)
    res = node_similarity(
        b["sym"], node_count=len(b["idmap"]), idmap=b["idmap"],
        top_k=_NODESIM_TOPK,
    )
    return pd.DataFrame(
        {
            "node_a": _strip(res["node_a"]),
            "node_b": _strip(res["node_b"]),
            "sim_ppm": res["sim_ppm"].astype(np.int64),
        }
    )


def _q_nodesim_cosine(sf_dir: str) -> pd.DataFrame:
    """Cosine NodeSimilarity over the weight vectors (exact ppm: integer
    weights make every sum exact in float64, so numpy and DuckDB compute
    identical IEEE values)."""
    from graph_data_science_ray.functions.nodesim import node_similarity

    b = _bundle(sf_dir)
    res = node_similarity(
        b["sym"], node_count=len(b["idmap"]), idmap=b["idmap"], metric="cosine"
    )
    return pd.DataFrame(
        {
            "node_a": _strip(res["node_a"]),
            "node_b": _strip(res["node_b"]),
            "sim_ppm": res["sim_ppm"].astype(np.int64),
        }
    )


def _lr_score_weights(d: int):
    """Deterministic rational LR weights shared by the Ray query and the
    SQL oracle: W[j, k] = (((j*7 + k*13) % 21) - 10) / 10, b = ±0.05."""
    j = np.arange(d)[:, None]
    k = np.arange(2)[None, :]
    W = (((j * 7 + k * 13) % 21) - 10) / 10.0
    b = np.array([0.05, -0.05])
    return W, b


def _q_lr_score(sf_dir: str) -> pd.DataFrame:
    """Fixed-weight logistic-regression scoring over the embeddings table
    (the pipeline predict path; reference LogisticRegressionClassifier).
    Output is int-only (vec_id, predicted) — argmax of the 2-class logits
    flips between engines only if |z1 - z0| < ~1e-12, i.e. never."""
    import ray.data as rd

    from graph_data_science_ray.pipelines.ml import (
        LogisticRegressionModel, assemble_features,
    )

    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                          columns=["vec_id", "embedding"])
    first = emb.take(1)[0]
    d = len(first["embedding"])
    W, b = _lr_score_weights(d)
    model = LogisticRegressionModel(W, b, classes=np.array([0, 1]))
    ds = assemble_features(emb, ["embedding"])
    out = model.predict(ds).to_pandas()
    return pd.DataFrame(
        {
            "vec_id": out["vec_id"].astype(np.int64),
            "predicted": out["predicted"].astype(np.int64),
        }
    ).sort_values("vec_id").reset_index(drop=True)


def _q_node_classification(sf_dir: str) -> pd.DataFrame:
    """NodeClassification pipeline on the embeddings table: train softmax
    LR on `label`, predict every row (rows-only: iterative training is
    not SQL-expressible). Deterministic at any parallelism."""
    import ray.data as rd

    from graph_data_science_ray.pipelines.ml import node_classification_pipeline

    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    res = node_classification_pipeline(
        emb, label_col="label", feature_cols=["embedding"],
        id_col="vec_id", test_fraction=0.25, max_epochs=25,
        learning_rate=0.3,
    )
    preds = res["predictions"].to_pandas()
    return pd.DataFrame(
        {
            "vec_id": preds["vec_id"].astype(np.int64),
            "label": preds["label"].astype(np.int64),
            "predicted": preds["predicted"].astype(np.int64),
        }
    ).sort_values("vec_id").reset_index(drop=True)


def _q_wcc_threshold(sf_dir: str) -> pd.DataFrame:
    """WCC with the reference's relationship-weight threshold config
    (Wcc.java / SampledStrategy.java:258-264 — only edges with
    ``weight > threshold`` union): the documented caller-side contract
    (functions/wcc.py docstring) filters the directed edge table at
    weight > 2 BEFORE symmetrize + projection, so sub-threshold pairs
    never even shuffle; every node keeps its row (singletons stay
    self-labelled min-id components)."""
    import graph_data_science_ray as gdsr

    b = _bundle(sf_dir)

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["weight"].to_numpy() > 2.0]

    filt = b["enc"].map_batches(keep, batch_format="pandas")
    sym = gdsr.symmetrize(filt, num_partitions=8)
    root = tempfile.mkdtemp(prefix="gdsr-wcct-", dir="/tmp")
    g = gdsr.GraphStore.project(
        sym, os.path.join(root, "g"), idmap=b["idmap"],
        num_partitions=8, directed=False,
    )
    res = gdsr.wcc(g)
    return pd.DataFrame(
        {"node": _strip(res["node"]), "component": _strip(res["component"])}
    )


def _q_subgraph_filter_expr(sf_dir: str) -> pd.DataFrame:
    """Subgraph filter through the reference's EXPRESSION AST surface
    (subgraph-filtering/.../expression/ExpressionParser.java, parsed by
    ``pipelines.filter_expr``): edge predicate ``r.weight >= 2`` and
    node predicate ``n.uid_mod <> 1`` (uid % 3, bound as a node
    property) — both evaluated vectorized; surviving nodes re-densify
    and the filtered edge table decodes through the NEW IdMap. The SQL
    oracle applies the same predicates in WHERE."""
    from graph_data_science_ray.pipelines.transforms import subgraph_filter

    b = _bundle(sf_dir)
    uids = _strip(b["idmap"].keys).astype(np.int64)
    ds, im2 = subgraph_filter(
        b["enc"], b["idmap"],
        edge_filter="r.weight >= 2",
        node_filter="n.uid_mod <> 1",
        node_props={"uid_mod": uids % 3},
    )
    df = ds.to_pandas()
    keys = im2.keys
    return pd.DataFrame(
        {
            "src": _strip(keys[df["src"].to_numpy(dtype=np.int64)]),
            "dst": _strip(keys[df["dst"].to_numpy(dtype=np.int64)]),
            "weight": df["weight"].astype(np.float64),
        }
    )


def _q_node_regression(sf_dir: str) -> pd.DataFrame:
    """NodeRegression pipeline (the reference's third ML pipeline,
    pipeline/.../nodePipeline/regression/NodeRegressionTrain.java) on the
    embeddings table: target = Σ_j embedding_j (an exactly-linear
    functional, so the fit is near-perfect and the metrics are stable),
    linear regression via data-parallel Adam, predict every row
    (rows-only: iterative training is not SQL-expressible).
    Deterministic at any parallelism (canonical shard contract)."""
    import ray.data as rd

    from graph_data_science_ray.pipelines.ml import node_regression_pipeline

    emb = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )

    def add_target(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["target"] = [
            float(np.asarray(v, dtype=np.float64).sum()) for v in df["embedding"]
        ]
        return df

    res = node_regression_pipeline(
        emb.map_batches(add_target, batch_format="pandas"),
        target_col="target", feature_cols=["embedding"], id_col="vec_id",
        test_fraction=0.25, max_epochs=60, learning_rate=0.3,
    )
    preds = res["predictions"].to_pandas()
    return pd.DataFrame(
        {
            "vec_id": preds["vec_id"].astype(np.int64),
            "predicted_ppm": np.floor(
                preds["predicted"].to_numpy(dtype=np.float64) * 1_000
            ).astype(np.int64),
        }
    ).sort_values("vec_id").reset_index(drop=True)


def _q_node_regression_valid(sf_dir: str) -> pd.DataFrame:
    """NodeRegression validity invariants (exact, oracle-checkable): one
    prediction per embedding row (count recomputed independently by the
    SQL oracle), the fit explains the exactly-linear target (R² > 0.5 ⇒
    ``fit_ok``), and a second run is byte-identical (``det_ok`` — the
    canonical-shard determinism contract). The weights themselves are
    iterative floats (rows-only via `node_regression`)."""
    import ray.data as rd

    from graph_data_science_ray.pipelines.ml import node_regression_pipeline

    emb = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )

    def add_target(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["target"] = [
            float(np.asarray(v, dtype=np.float64).sum()) for v in df["embedding"]
        ]
        return df

    ds = emb.map_batches(add_target, batch_format="pandas")
    r1 = node_regression_pipeline(
        ds, target_col="target", feature_cols=["embedding"], id_col="vec_id",
        test_fraction=0.25, max_epochs=60, learning_rate=0.3,
    )
    r2 = node_regression_pipeline(
        ds, target_col="target", feature_cols=["embedding"], id_col="vec_id",
        test_fraction=0.25, max_epochs=60, learning_rate=0.3,
    )
    n_rows = int(r1["predictions"].count())
    det = int(
        r1["model"].weights.tobytes() == r2["model"].weights.tobytes()
        and r1["model"].bias == r2["model"].bias
    )
    return pd.DataFrame(
        {
            "n_rows": np.array([n_rows], dtype=np.int64),
            "fit_ok": np.array(
                [int(r1["metrics"]["r2"] > 0.5)], dtype=np.int64
            ),
            "det_ok": np.array([det], dtype=np.int64),
        }
    )


def _q_link_prediction(sf_dir: str) -> pd.DataFrame:
    """LinkPrediction pipeline over the cosine-KNN graph of the
    embeddings table: positives = top-5 neighbor pairs, negatives =
    seeded non-edge samples, hadamard+cosine link features, binary LR
    (rows-only: iterative training). The conversation graph at small sf
    is near-complete (no non-edges to sample), so the KNN graph is the
    well-posed LP universe."""
    import ray.data as rd

    from graph_data_science_ray.stages.similarity import knn_brute_force
    from graph_data_science_ray.pipelines.ml import link_prediction_pipeline

    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                          columns=["vec_id", "embedding"])
    V = emb.count()
    knn = knn_brute_force(emb, query_ids=np.arange(V), k=5)
    pos = rd.from_pandas(pd.DataFrame({
        "src": knn["query_id"].astype(np.int64),
        "dst": knn["neighbor_id"].astype(np.int64),
    }))
    vecs = emb.map_batches(
        lambda df: df.rename(columns={"vec_id": "node_id"}),
        batch_format="pandas",
    )
    res = link_prediction_pipeline(
        pos, vecs, node_count=V,
        combiners=["hadamard", "cosine"], max_epochs=30,
        learning_rate=0.3, seed=42,
    )
    return pd.DataFrame(
        {
            "n_pos": [int(res["n_pos"])],
            "n_neg": [int(res["n_neg"])],
            "accuracy": [round(float(res["metrics"]["accuracy"]), 4)],
        }
    )


def _q_bridges(sf_dir: str) -> pd.DataFrame:
    """Per-edge bridge FLAG over every undirected edge (src < dst) of the
    interaction graph (Tarjan low-link, single sequential task — the
    reference's own shape; rows-only, with the invariants oracled by
    `biconnected_valid`). Flag form so the row count is |E| even when the
    dense small-sf graph has zero bridges."""
    from graph_data_science_ray.functions.biconnected import bridges

    b = _bundle(sf_dir)
    out = bridges(b["gu"])
    bridge_set = set(zip(_strip(out["src"]), _strip(out["dst"])))
    df = b["sym"].to_pandas()
    df = df[df["src"] < df["dst"]]
    keys = b["idmap"].keys
    src = _strip(keys[df["src"].to_numpy()])
    dst = _strip(keys[df["dst"].to_numpy()])
    lo = np.minimum(src, dst)
    hi = np.maximum(src, dst)
    flag = np.fromiter(
        ((l, h) in bridge_set for l, h in zip(lo, hi)), dtype=np.int64, count=len(lo)
    )
    return (
        pd.DataFrame({"src": lo, "dst": hi, "is_bridge": flag})
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )


def _q_articulation_points(sf_dir: str) -> pd.DataFrame:
    """Per-node articulation FLAG (always V rows; see `_q_bridges`)."""
    from graph_data_science_ray.functions.biconnected import articulation_points

    b = _bundle(sf_dir)
    out = articulation_points(b["gu"])
    ap = set(_strip(out["node"]))
    nodes = _strip(b["idmap"].keys)
    flag = np.fromiter((n in ap for n in nodes), dtype=np.int64, count=len(nodes))
    return (
        pd.DataFrame({"node": nodes, "is_articulation": flag})
        .sort_values("node")
        .reset_index(drop=True)
    )


def _q_biconnected_valid(sf_dir: str) -> pd.DataFrame:
    """Bridge/articulation validity invariants: the undirected component
    count (recomputed independently by the SQL oracle's recursive CTE),
    removing ALL claimed bridges adds exactly one component per bridge
    (false if any claimed bridge lies on a cycle), and every bridge
    endpoint with degree >= 2 is reported as an articulation point."""
    import graph_data_science_ray as gdsr

    from graph_data_science_ray.functions.biconnected import (
        articulation_points,
        bridges,
    )

    b = _bundle(sf_dir)
    br = bridges(b["gu"])
    ap = articulation_points(b["gu"])
    wcc0 = gdsr.wcc(b["gu"])
    c0 = int(wcc0["component"].nunique())
    bset = set(
        zip(
            b["idmap"].to_ids(br["src"].to_numpy(dtype="U")),
            b["idmap"].to_ids(br["dst"].to_numpy(dtype="U")),
        )
    )
    # bset is bridge-count-sized; closure capture ships it with the task
    def drop_bridges(t):
        import pyarrow as _pa
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        lo = np.minimum(src, dst)
        hi = np.maximum(src, dst)
        keep = np.array(
            [(int(a), int(c)) not in bset for a, c in zip(lo, hi)], dtype=bool
        )
        return _pa.table(
            {"src": src[keep], "dst": dst[keep],
             "weight": t["weight"].to_numpy(zero_copy_only=False)[keep]}
        )

    import graph_data_science_ray as _g

    root = tempfile.mkdtemp(prefix="gdsr-bicon-", dir="/tmp")
    gub = _g.GraphStore.project(
        b["sym"].map_batches(drop_bridges, batch_format="pyarrow"),
        os.path.join(root, "gub"), idmap=b["idmap"], num_partitions=8,
        directed=False,
    )
    c1 = int(_g.wcc(gub)["component"].nunique())
    split_ok = int(c1 == c0 + len(br))

    deg = _g.degree_centrality(
        b["sym"], node_count=len(b["idmap"]), weighted=False
    )["degree"].to_numpy()
    ap_ids = set(b["idmap"].to_ids(ap["node"].to_numpy(dtype="U")).tolist())
    endpoint_ok = 1
    for a, c in bset:
        for v in (a, c):
            if deg[v] >= 2 and int(v) not in ap_ids:
                endpoint_ok = 0
    return pd.DataFrame(
        {
            "n_components": np.array([c0], dtype=np.int64),
            "split_ok": np.array([split_ok], dtype=np.int64),
            "endpoint_ok": np.array([endpoint_ok], dtype=np.int64),
        }
    )


def _q_link_prediction_valid(sf_dir: str) -> pd.DataFrame:
    """LinkPrediction validity: the positive set is exactly the k=5 KNN
    pairs (count pinned by the oracle as 5×|embeddings|), the seeded
    negative sample is non-empty and at most the positive count, and the
    held-out accuracy is a valid probability-scale value."""
    res = _cached("link_prediction", sf_dir, _q_link_prediction)
    n_pos = int(res["n_pos"].iloc[0])
    n_neg = int(res["n_neg"].iloc[0])
    acc = float(res["accuracy"].iloc[0])
    return pd.DataFrame(
        {
            "n_pos": np.array([n_pos], dtype=np.int64),
            "neg_ok": np.array([int(0 < n_neg <= n_pos)], dtype=np.int64),
            "acc_ok": np.array([int(0.0 <= acc <= 1.0)], dtype=np.int64),
        }
    )


def _q_dedup_exact_table(sf_dir: str) -> pd.DataFrame:
    import ray.data as rd

    from graph_data_science_ray.stages.dedup import dedup_exact_filter

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    out = dedup_exact_filter(docs).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _q_clean_corpus(sf_dir: str) -> pd.DataFrame:
    """Composed training-data cleaning pipeline, end-to-end as ONE
    streaming Dataset chain: exact dedup (keeper hash-join) → token
    count → quality filter (≥5 tokens) → corpus stats. The composition
    is the point — each stage's output Dataset feeds the next without
    a driver materialization until the final 1-row aggregate."""
    import ray.data as rd

    from graph_data_science_ray.stages.dedup import dedup_exact_filter
    from graph_data_science_ray.stages.text import token_count

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    tc = token_count(dedup_exact_filter(docs)).filter(expr="n_tokens >= 5")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "n_docs": np.array([len(df)], dtype=np.int64),
                "total_tokens": np.array(
                    [df["n_tokens"].sum() if len(df) else 0], dtype=np.int64
                ),
            }
        )

    agg = tc.map_batches(partial, batch_format="pandas").to_pandas()
    return pd.DataFrame(
        {
            "n_docs": np.array([agg["n_docs"].sum()], dtype=np.int64),
            "total_tokens": np.array([agg["total_tokens"].sum()], dtype=np.int64),
        }
    )


def _q_media_decode(sf_dir: str) -> pd.DataFrame:
    """REAL multimodal decode path, exactly oracled: one 8x8 RGB netpbm
    image is synthesized per document (pixel formula in closed form over
    (doc_id, row, col)), pushed as binary payloads through the actor-pool
    decode stage, and the decoded pixel SUM per image — exact integers —
    is what the SQL oracle recomputes arithmetically over a generated
    (r, c) grid. feature_ok additionally asserts the feature stage's
    vector matches the real per-channel statistics of the same pixels.
    """
    import ray.data as rd

    from graph_data_science_ray.stages.multimodal import (
        decode_netpbm,
        encode_netpbm,
        netpbm_features,
    )

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"])

    def synth(df: pd.DataFrame) -> pd.DataFrame:
        r = np.arange(8)[:, None, None]
        c = np.arange(8)[None, :, None]
        payloads = []
        for i in df["doc_id"].astype(np.int64):
            arr = np.concatenate(
                [(i + 3 * r + 5 * c) % 256, (2 * i + r + 0 * c) % 256,
                 (i + 7 * c + 0 * r) % 256],
                axis=2,
            ).astype(np.uint8)
            payloads.append(encode_netpbm(arr))
        return pd.DataFrame(
            {"media_id": df["doc_id"].astype(np.int64), "kind": "image",
             "payload": payloads}
        )

    media = docs.map_batches(synth, batch_format="pandas", batch_size=256)

    def decode_sum(df: pd.DataFrame) -> pd.DataFrame:
        from graph_data_science_ray.stages.multimodal import MediaFeatureExtractor

        # strict=True: every payload must take the REAL decode path
        feats = MediaFeatureExtractor(dim=14, strict=True)(df)
        sums, ok = [], []
        for p, vec in zip(df["payload"], feats["feature"]):
            arr = decode_netpbm(p)
            sums.append(int(arr.astype(np.int64).sum()))
            ok.append(
                int(np.allclose(np.asarray(vec, dtype=np.float32),
                                netpbm_features(arr, 14)))
            )
        return pd.DataFrame(
            {"media_id": df["media_id"].astype(np.int64),
             "pixel_sum": pd.Series(sums, dtype=np.int64),
             "feature_ok": pd.Series(ok, dtype=np.int64)}
        )

    out = media.map_batches(decode_sum, batch_format="pandas", batch_size=256).to_pandas()
    return out.sort_values("media_id").reset_index(drop=True)


def _q_media_resize(sf_dir: str) -> pd.DataFrame:
    """REAL resize path, exactly oracled: the same synthesized 8x8
    netpbm images go through the actor-pool ImageResizer (strict — real
    pixel-center nearest-neighbor on decoded pixels) down to 4x4; the
    decoded pixel sum of the RESIZED image is what the SQL oracle
    recomputes over the sampled grid (rows/cols 1,3,5,7 of the closed-
    form pixel formula)."""
    import ray.data as rd

    from graph_data_science_ray.stages.multimodal import (
        ImageResizer,
        decode_netpbm,
        encode_netpbm,
    )

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"])

    def synth(df: pd.DataFrame) -> pd.DataFrame:
        r = np.arange(8)[:, None, None]
        c = np.arange(8)[None, :, None]
        payloads = []
        for i in df["doc_id"].astype(np.int64):
            arr = np.concatenate(
                [(i + 3 * r + 5 * c) % 256, (2 * i + r + 0 * c) % 256,
                 (i + 7 * c + 0 * r) % 256],
                axis=2,
            ).astype(np.uint8)
            payloads.append(encode_netpbm(arr))
        return pd.DataFrame(
            {"media_id": df["doc_id"].astype(np.int64), "kind": "image",
             "payload": payloads}
        )

    media = docs.map_batches(synth, batch_format="pandas", batch_size=256)

    def resize_sum(df: pd.DataFrame) -> pd.DataFrame:
        out = ImageResizer(4, 4, strict=True)(df)
        sums = [
            int(decode_netpbm(p).astype(np.int64).sum()) for p in out["payload"]
        ]
        return pd.DataFrame(
            {"media_id": out["media_id"].astype(np.int64),
             "pixel_sum": pd.Series(sums, dtype=np.int64)}
        )

    out = media.map_batches(resize_sum, batch_format="pandas", batch_size=256).to_pandas()
    return out.sort_values("media_id").reset_index(drop=True)


def _q_media_frames(sf_dir: str) -> pd.DataFrame:
    """REAL video frame-sampling path, exactly oracled: per document a
    3-frame concatenated-netpbm "video" (4x4 RGB, pixel formula indexed
    by (doc_id, frame, row, col)) goes through the strict FrameSampler;
    the decoded pixel sum of every emitted frame is recomputed by the
    SQL oracle over a generated (frame, r, c) grid."""
    import ray.data as rd

    from graph_data_science_ray.stages.multimodal import (
        FrameSampler,
        decode_netpbm,
        encode_netpbm,
    )

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"])

    def synth(df: pd.DataFrame) -> pd.DataFrame:
        r = np.arange(4)[:, None, None]
        c = np.arange(4)[None, :, None]
        payloads = []
        for i in df["doc_id"].astype(np.int64):
            parts = []
            for j in range(3):
                arr = np.concatenate(
                    [(i + 11 * j + 2 * r + c) % 256,
                     (3 * i + j + r + 0 * c) % 256,
                     (i + 5 * j + 3 * c + 0 * r) % 256],
                    axis=2,
                ).astype(np.uint8)
                parts.append(encode_netpbm(arr))
            payloads.append(b"".join(parts))
        return pd.DataFrame(
            {"media_id": df["doc_id"].astype(np.int64), "kind": "video",
             "payload": payloads,
             "duration_ms": np.full(len(df), 3000, dtype=np.int64)}
        )

    media = docs.map_batches(synth, batch_format="pandas", batch_size=256)

    def frame_sums(df: pd.DataFrame) -> pd.DataFrame:
        out = FrameSampler(every_ms=1000, strict=True)(df)
        sums = [
            int(decode_netpbm(p).astype(np.int64).sum()) for p in out["payload"]
        ]
        return pd.DataFrame(
            {"media_id": out["media_id"].astype(np.int64),
             "frame_idx": out["frame_idx"].astype(np.int64),
             "pixel_sum": pd.Series(sums, dtype=np.int64)}
        )

    out = media.map_batches(frame_sums, batch_format="pandas", batch_size=64).to_pandas()
    return out.sort_values(["media_id", "frame_idx"]).reset_index(drop=True)


def _q_media_audio(sf_dir: str) -> pd.DataFrame:
    """REAL audio decode path, exactly oracled: per document a 64-sample
    mono PCM16 WAV (closed-form sample formula over (doc_id, t)) goes
    through the strict feature stage (every payload must take the real
    WAV path); the decoded integer sample sum is recomputed by the SQL
    oracle over a generated t grid."""
    import ray.data as rd

    from graph_data_science_ray.stages.multimodal import (
        MediaFeatureExtractor,
        decode_wav,
        encode_wav,
    )

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"])

    def synth(df: pd.DataFrame) -> pd.DataFrame:
        t = np.arange(64, dtype=np.int64)
        payloads = []
        for i in df["doc_id"].astype(np.int64):
            samples = ((i * 13 + t * 7) % 4001 - 2000).astype(np.int16)
            payloads.append(encode_wav(samples, rate=8000))
        return pd.DataFrame(
            {"media_id": df["doc_id"].astype(np.int64), "kind": "audio",
             "payload": payloads}
        )

    media = docs.map_batches(synth, batch_format="pandas", batch_size=256)

    def sample_sum(df: pd.DataFrame) -> pd.DataFrame:
        MediaFeatureExtractor(dim=6, strict=True)(df)  # real-path gate
        sums = [
            int(decode_wav(p).astype(np.int64).sum()) for p in df["payload"]
        ]
        return pd.DataFrame(
            {"media_id": df["media_id"].astype(np.int64),
             "sample_sum": pd.Series(sums, dtype=np.int64)}
        )

    out = media.map_batches(sample_sum, batch_format="pandas", batch_size=256).to_pandas()
    return out.sort_values("media_id").reset_index(drop=True)


def _q_bpe_token_count(sf_dir: str) -> pd.DataFrame:
    from graph_data_science_ray.stages.text import bpe_token_count

    out = bpe_token_count(_docs(sf_dir)).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _q_winnow_fp(sf_dir: str) -> pd.DataFrame:
    from graph_data_science_ray.stages.text import winnow_fingerprints

    out = winnow_fingerprints(_docs(sf_dir), k=8, window=16).to_pandas()
    return out.sort_values(["doc_id", "fp"]).reset_index(drop=True)


def _q_pagerank_personalized(sf_dir: str) -> pd.DataFrame:
    """Personalized PageRank from the 3 lexicographically-smallest users
    (dense ids 0..2 — the IdMap sorts keys, so both sides pick the same
    sources)."""
    import graph_data_science_ray as gdsr

    b = _bundle(sf_dir)
    res = gdsr.pagerank(
        b["gd"], damping=0.85, tolerance=0.0, max_iterations=_PR_ITERS + 1,
        weighted=True, source_nodes=np.array([0, 1, 2], dtype=np.int64),
    )
    return pd.DataFrame(
        {"node": _strip(res["node"]), "score": np.round(res["score"].to_numpy(), 6)}
    )


def _q_modularity_optimization(sf_dir: str) -> pd.DataFrame:
    from graph_data_science_ray.functions.louvain import modularity_optimization

    b = _bundle(sf_dir)
    out, q = modularity_optimization(
        b["sym"], node_count=len(b["idmap"]), idmap=b["idmap"], max_rounds=5
    )
    return pd.DataFrame(
        {"node": _strip(out["node"]), "community": _strip(out["community"])}
    )


def _q_louvain_round1(sf_dir: str) -> pd.DataFrame:
    """ONE parity-0 local-move sub-round from singleton communities —
    the distributed argmax-gain kernel, exactly reproducible in SQL
    (identical float expression w - (d_n*d_c)/2m, identical > 1e-12 move
    test, dense-rank parity and min-community tie-break)."""
    from graph_data_science_ray.functions.louvain import (
        _best_moves,
        _weighted_degrees,
    )

    b = _bundle(sf_dir)
    n = len(b["idmap"])
    deg = _weighted_degrees(b["sym"], n)
    two_m = deg.sum()
    labels = np.arange(n, dtype=np.int64)
    movers = _best_moves(b["sym"], labels, deg, deg.copy(), two_m, 1.0, parity=0)
    if len(movers):
        labels[movers["node"].to_numpy(dtype=np.int64)] = movers[
            "community"
        ].to_numpy(dtype=np.int64)
    keys = b["idmap"].keys
    return pd.DataFrame(
        {"node": _strip(keys), "community": _strip(keys[labels])}
    )


def _mod_numerator(sym: "Any", labels: np.ndarray) -> tuple[int, int]:
    """Exact integer modularity numerator: with integral edge weights,
    Q * (2m)^2 = 2m * sum_c(l_in_c) - sum_c(d_c^2) is an integer —
    the hash-safe float discipline for comparing modularities."""
    from graph_data_science_ray.functions.community_metrics import _label_stats

    st = _label_stats(sym, labels)
    two_m = int(st["w"].sum())
    d_c = st.groupby("community")["w"].sum()
    l_in = st.loc[st["same"] == 1].groupby("community")["w"].sum()
    num = two_m * int(l_in.sum()) - int((d_c.astype(np.int64) ** 2).sum())
    return two_m, num


def _q_louvain_modularity(sf_dir: str) -> pd.DataFrame:
    """Modularity of the multi-level Louvain partition, exactly
    anchored: the pinned parity-0 round-1 partition's integer modularity
    numerator Q*(2m)^2 (recomputed verbatim by the SQL oracle over the
    round-1 kernel CTE) plus the invariant that the FULL run's
    modularity does not fall below it — both sides integer arithmetic,
    so no float-rounding hash risk. The raw float Q is available via
    functions.community_metrics.modularity (tests/test_community.py)."""
    from graph_data_science_ray.functions.louvain import louvain

    b = _bundle(sf_dir)
    n = len(b["idmap"])
    out = louvain(b["sym"], node_count=n, max_levels=3, max_rounds=5)
    labels = np.zeros(n, dtype=np.int64)
    labels[out["node"].to_numpy(dtype=np.int64)] = out["community"].to_numpy(dtype=np.int64)
    two_m, full_num = _mod_numerator(b["sym"], labels)
    _, r1_num = _mod_numerator(b["sym"], _pinned_round1_labels(b))
    return pd.DataFrame(
        {
            "two_m": np.array([two_m], dtype=np.int64),
            "round1_mod_num": np.array([r1_num], dtype=np.int64),
            "improved_ok": np.array([int(full_num >= r1_num)], dtype=np.int64),
        }
    )


def _q_funnel(sf_dir: str) -> pd.DataFrame:
    """Ordered min-time-greedy funnel over the events stream: users
    reaching each of signup → view → click → purchase in order (stage k
    counted only strictly after the stage-(k-1) reach time)."""
    import ray.data as rd

    from graph_data_science_ray.stages.sessions import funnel_counts

    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"))
    out = funnel_counts(
        ev, stages=("signup", "view", "click", "purchase")
    ).to_pandas()
    return out.sort_values("stage_idx").reset_index(drop=True)


def _q_retention(sf_dir: str) -> pd.DataFrame:
    """Cohort retention matrix: (cohort_day, offset_days, users) with
    the cohort = integer epoch-day of a user's first event."""
    import ray.data as rd

    from graph_data_science_ray.stages.sessions import retention_cohorts

    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"))
    out = retention_cohorts(ev).to_pandas()
    return out.sort_values(["cohort_day", "offset_days"]).reset_index(drop=True)


def _q_actor_trigrams(sf_dir: str) -> pd.DataFrame:
    """Consecutive actor trigram counts over the transcript turns — the
    common-path structure of the trajectory set."""
    import graph_data_science_ray as gdsr

    from graph_data_science_ray.stages.trajectory import actor_ngrams

    turns = gdsr.events_as_transcripts(sf_dir)
    out = actor_ngrams(turns, n=3).to_pandas()
    return out.sort_values("gram").reset_index(drop=True)


def _q_pmi_bigrams(sf_dir: str) -> pd.DataFrame:
    """Corpus PMI collocations over adjacent token bigrams, integer-ppm
    ln discipline, min_count=5."""
    from graph_data_science_ray.stages.ir import pmi_bigrams

    out = pmi_bigrams(_docs(sf_dir), min_count=5).to_pandas()
    return out.sort_values(["w1", "w2"]).reset_index(drop=True)


def _q_readability(sf_dir: str) -> pd.DataFrame:
    """Flesch readability accounting per document: exact word /
    sentence / syllable-heuristic counts."""
    from graph_data_science_ray.stages.quality import readability

    out = readability(_docs(sf_dir)).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


_PCA_ROUNDS = 8


def _q_pca_power(sf_dir: str) -> pd.DataFrame:
    """Top principal component of the embedding table by integer-exact
    power iteration (quantize → integer centered scatter → fixed-round
    floor-division iteration) — bit-exact at any parallelism and
    replayed verbatim by the SQL oracle."""
    import ray.data as rd

    from graph_data_science_ray.stages.scale import pca_power

    emb = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    return pca_power(emb, rounds=_PCA_ROUNDS).reset_index(drop=True)


def _pca_oracle_sql() -> str:
    """Verbatim SQL replay of ``stages.scale.pca_power``: the quantize
    floor is the only float op; every later step is BIGINT arithmetic
    with floor division spelled via the positive-mod trick (DuckDB
    ``//`` truncates; numpy ``//`` floors)."""
    parts = [
        """e0 AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
)""",
        """x AS MATERIALIZED (
  SELECT vec_id, i - 1 AS dim, CAST(floor(v[i] * 4096e0) AS BIGINT) AS q
  FROM e0, LATERAL (SELECT unnest(generate_series(1, len(v))) AS i) g
)""",
        "nn AS (SELECT count(*) AS n FROM embeddings)",
        "s AS (SELECT dim, CAST(sum(q) AS BIGINT) AS sv FROM x GROUP BY dim)",
        """m AS (
  SELECT dim, CAST((sv - ((sv % n + n) % n)) // n AS BIGINT) AS mv
  FROM s, nn
)""",
        """xc AS MATERIALIZED (
  SELECT x.vec_id, x.dim, x.q - m.mv AS qc FROM x JOIN m ON m.dim = x.dim
)""",
        """c AS MATERIALIZED (
  SELECT a.dim AS i, b.dim AS j, CAST(sum(a.qc * b.qc) AS BIGINT) AS cv
  FROM xc a JOIN xc b ON a.vec_id = b.vec_id GROUP BY 1, 2
)""",
        "den AS (SELECT greatest(1, max(abs(cv)) // 65536) AS dv FROM c)",
        """cn AS MATERIALIZED (
  SELECT i, j, CAST((cv - ((cv % dv + dv) % dv)) // dv AS BIGINT) AS cv
  FROM c, den
)""",
        "v0 AS (SELECT DISTINCT i AS dim, CAST(16384 AS BIGINT) AS v FROM cn)",
    ]
    for r in range(1, _PCA_ROUNDS + 1):
        p = r - 1
        parts.append(
            f"""w{r} AS MATERIALIZED (
  SELECT cn.i AS dim, CAST(sum(cn.cv * v{p}.v) AS BIGINT) AS w
  FROM cn JOIN v{p} ON v{p}.dim = cn.j GROUP BY 1
)"""
        )
        parts.append(
            f"""v{r} AS MATERIALIZED (
  SELECT dim,
         CAST((w * 16384 - ((w * 16384 % mx + mx) % mx)) // mx AS BIGINT) AS v
  FROM w{r}, (SELECT max(abs(w)) AS mx FROM w{r})
)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT dim, v FROM v{_PCA_ROUNDS} ORDER BY dim"
    )


def _q_four_cliques(sf_dir: str) -> pd.DataFrame:
    """Exact per-node 4-clique (K4) membership counts — two chained
    wedge-closing passes on the degree-ordered edge set."""
    from graph_data_science_ray.functions.triangles import four_clique_count

    b = _bundle(sf_dir)
    k4, _total = four_clique_count(b["sym"], idmap=b["idmap"])
    return pd.DataFrame(
        {"node": _strip(k4["node"]), "k4": k4["k4"].to_numpy(dtype=np.int64)}
    ).sort_values("node").reset_index(drop=True)


def _q_zipf_fit(sf_dir: str) -> pd.DataFrame:
    """Zipf slope over the top-64 term frequencies as an exact rational
    (integer-ppm ln discipline)."""
    from graph_data_science_ray.stages.ir import zipf_fit

    return zipf_fit(_docs(sf_dir), k=64)


def _q_degree_gini(sf_dir: str) -> pd.DataFrame:
    """Gini coefficient of the out-degree distribution as an exact
    rational — hub-concentration inequality."""
    from graph_data_science_ray.functions.graph_stats import degree_gini

    b = _bundle(sf_dir)
    return degree_gini(b["enc"], node_count=len(b["idmap"]))


_KATZ_ROUNDS = 4
_KATZ_BETA = 1024


def _q_katz(sf_dir: str) -> pd.DataFrame:
    """Integer fixed-round truncated Katz centrality over the directed
    graph: x0 = beta*1; x_{t+1} = beta + floor(A^T x_t / 2) — every
    value an exact integer, SQL-mirrored round by round."""
    from graph_data_science_ray.functions.pagerank import katz

    b = _bundle(sf_dir)
    res = katz(b["gd"], rounds=_KATZ_ROUNDS, beta_scale=_KATZ_BETA)
    return pd.DataFrame(
        {
            "node": _strip(res["node"]),
            "score": res["score"].to_numpy().astype(np.int64),
        }
    ).sort_values("node").reset_index(drop=True)


def _katz_oracle_sql() -> str:
    parts = [
        "uedges AS (SELECT DISTINCT src, dst FROM edges)",
        f"x0 AS (SELECT node, CAST({_KATZ_BETA} AS BIGINT) AS v FROM nodes)",
    ]
    for r in range(1, _KATZ_ROUNDS + 1):
        p_ = r - 1
        parts.append(
            f"""m{r} AS MATERIALIZED (
  SELECT e.dst AS node, CAST(sum(x{p_}.v) // 2 AS BIGINT) AS mv
  FROM uedges e JOIN x{p_} ON x{p_}.node = e.src GROUP BY 1
)"""
        )
        parts.append(
            f"""x{r} AS MATERIALIZED (
  SELECT n.node, CAST({_KATZ_BETA} + coalesce(m{r}.mv, 0) AS BIGINT) AS v
  FROM nodes n LEFT JOIN m{r} USING (node)
)"""
        )
    return (
        f"WITH {_GRAPH_CTE},\n"
        + ",\n".join(parts)
        + f"\nSELECT node, v AS score FROM x{_KATZ_ROUNDS} ORDER BY node"
    )


def _q_props_field_stats(sf_dir: str) -> pd.DataFrame:
    """Semi-structured payload aggregation: integer field k extracted
    from the props JSON column, per-type n/sum/min/max."""
    import ray.data as rd

    from graph_data_science_ray.stages.sessions import props_field_stats

    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_type", "props"])
    out = props_field_stats(ev, field="k").to_pandas()
    return out.sort_values("event_type").reset_index(drop=True)


def _q_value_stats(sf_dir: str) -> pd.DataFrame:
    """Exact integer-cents revenue stats per event type."""
    import ray.data as rd

    from graph_data_science_ray.stages.sessions import value_stats_cents

    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_type", "value"])
    out = value_stats_cents(ev).to_pandas()
    return out.sort_values("event_type").reset_index(drop=True)


def _q_funnel_latency(sf_dir: str) -> pd.DataFrame:
    """Funnel with exact integer time-to-convert accounting: per stage,
    users plus the sum and max of advancing users' reach-time gaps in
    microseconds."""
    import ray.data as rd

    from graph_data_science_ray.stages.sessions import funnel_transition_stats

    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"))
    return funnel_transition_stats(
        ev, stages=("signup", "view", "click", "purchase")
    )


def _q_product_report(sf_dir: str) -> pd.DataFrame:
    """Composed product-analytics flagship over ONE pruned events read:
    funnel reach counts, retention aggregates and session totals in a
    single (metric, value) table — each constituent individually
    oracled (funnel / retention_cohorts / sessionize), here the
    COMPOSITION is checked end-to-end."""
    import ray.data as rd

    from graph_data_science_ray.stages.sessions import (
        funnel_counts,
        retention_cohorts,
        sessionize,
    )

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "event_type", "ts"],
    ).materialize()  # shared by the three branches
    fu = funnel_counts(
        ev, stages=("signup", "view", "click", "purchase")
    ).to_pandas().sort_values("stage_idx")
    re_ = retention_cohorts(ev).to_pandas()
    se = sessionize(ev, gap_seconds=1800.0).to_pandas()
    rows = [("funnel_" + s, int(u)) for s, u in zip(fu["stage"], fu["users"])]
    rows += [
        ("cohorts", int(re_["cohort_day"].nunique())),
        ("active_user_days", int(re_["users"].sum())),
        ("max_offset_days", int(re_["offset_days"].max())),
        ("sessions_total", int(se["n_sessions"].sum())),
        ("sessionized_users", int(len(se))),
    ]
    out = pd.DataFrame(rows, columns=["metric", "value"])
    out["value"] = out["value"].astype(np.int64)
    return out.sort_values("metric").reset_index(drop=True)


def _q_ams_registers(sf_dir: str) -> pd.DataFrame:
    """AMS/Tug-of-War F2 sketch registers: 16 signed token-count sums
    under md5-parity sign hashes (exact integer oracle surface)."""
    from graph_data_science_ray.stages.sketch import ams_registers

    out = ams_registers(_docs(sf_dir), "text").to_pandas()
    return out.sort_values("srow").reset_index(drop=True)


def _q_conversation_dedup(sf_dir: str) -> pd.DataFrame:
    """Exact whole-conversation duplicate flags (keeper = min conv id
    per identical stable-order text concatenation)."""
    import graph_data_science_ray as gdsr

    from graph_data_science_ray.stages.trajectory import (
        conversation_dedup_flags,
    )

    turns = gdsr.events_as_transcripts(sf_dir)
    out = conversation_dedup_flags(turns).to_pandas()
    return out.sort_values("conv").reset_index(drop=True)


def _q_tool_latency(sf_dir: str) -> pd.DataFrame:
    """Per-tool response latency over the tooled adapter: exact
    integer-microsecond (n, sum, max) per tool actor."""
    from graph_data_science_ray.sources.transcripts import (
        events_as_transcripts_tools,
    )

    from graph_data_science_ray.stages.trajectory import tool_latency

    turns = events_as_transcripts_tools(sf_dir)
    out = tool_latency(turns).to_pandas()
    return out.sort_values("tool").reset_index(drop=True)


def _q_monologue_runs(sf_dir: str) -> pd.DataFrame:
    """Per-conversation same-actor run-length profile (longest
    monologue, multi-turn-run volume)."""
    import graph_data_science_ray as gdsr

    from graph_data_science_ray.stages.trajectory import monologue_runs

    turns = gdsr.events_as_transcripts(sf_dir)
    out = monologue_runs(turns).to_pandas()
    return out.sort_values("conv").reset_index(drop=True)


_WL_ROUNDS = 2
_MIS_ROUNDS = 4
_MARKOV_ROUNDS = 4


def _q_wl_colors(sf_dir: str) -> pd.DataFrame:
    """1-WL color refinement (functions/wl.py) at pinned rounds — the
    integer multiset-hash contract makes all V colors SQL-exact."""
    from graph_data_science_ray.functions.wl import wl_colors

    b = _bundle(sf_dir)
    res = wl_colors(b["gu"], rounds=_WL_ROUNDS)
    return (
        pd.DataFrame(
            {"node": _strip(res["node"]),
             "color": res["color"].to_numpy().astype(np.int64)}
        )
        .sort_values("node")
        .reset_index(drop=True)
    )


def _q_mis(sf_dir: str) -> pd.DataFrame:
    """Luby maximal independent set (functions/mis.py) at pinned rounds:
    md5 priorities make the whole selection trajectory deterministic, so
    the per-round SQL mirror reproduces every status bit."""
    from graph_data_science_ray.functions.mis import maximal_independent_set

    b = _bundle(sf_dir)
    res = maximal_independent_set(b["gu"], rounds=_MIS_ROUNDS)
    return (
        pd.DataFrame(
            {"node": _strip(res["node"]),
             "status": res["status"].to_numpy().astype(np.int64)}
        )
        .sort_values("node")
        .reset_index(drop=True)
    )


def _q_ldp_features(sf_dir: str) -> pd.DataFrame:
    """Local Degree Profile structural node features — all-integer
    (degree, neighbor-degree min/max/sum/sumsq)."""
    from graph_data_science_ray.functions.degree import local_degree_profile

    b = _bundle(sf_dir)
    res = local_degree_profile(b["sym"], idmap=b["idmap"]).copy()
    res["node"] = _strip(res["node"])
    return res.sort_values("node").reset_index(drop=True)


def _q_turn_cooccurrence(sf_dir: str) -> pd.DataFrame:
    """Gap-resolved sequential co-occurrence counts (skip-gram statistic
    over trajectories); gap=1 marginal equals role_transitions."""
    import graph_data_science_ray as gdsr

    from graph_data_science_ray.stages.trajectory import turn_cooccurrence

    ts = gdsr.events_as_transcripts(sf_dir)
    out = turn_cooccurrence(ts, max_gap=3).to_pandas()
    return (
        out.sort_values(["prev_role", "role", "gap"]).reset_index(drop=True)
    )


def _q_markov_stationary(sf_dir: str) -> pd.DataFrame:
    """Bounded-round integer stationary mass of the actor-transition
    chain — distributed counts, answer-sized exact power iteration."""
    import graph_data_science_ray as gdsr

    from graph_data_science_ray.stages.trajectory import markov_stationary

    ts = gdsr.events_as_transcripts(sf_dir)
    out = markov_stationary(ts, rounds=_MARKOV_ROUNDS)
    return out.sort_values("role").reset_index(drop=True)


_TEMPORAL_ROUNDS = 6


def _q_temporal_reachability(sf_dir: str) -> pd.DataFrame:
    """Bounded-round earliest-arrival times over the transcript contact
    stream (functions/temporal.py), from the lexicographically smallest
    actor at t0=0 — exact int64 microsecond arrivals."""
    import graph_data_science_ray as gdsr

    from graph_data_science_ray.functions.temporal import (
        derive_contacts,
        temporal_reachability,
    )

    ts = gdsr.events_as_transcripts(sf_dir)
    turns = gdsr.derive_turns(ts, keep_ts=True)
    source = turns.select_columns(["actor"]).min("actor")
    contacts = derive_contacts(turns)
    out = temporal_reachability(
        contacts, source=source, t0=0, rounds=_TEMPORAL_ROUNDS, num_parts=8
    )
    out = out.copy()
    out["node"] = _strip(out["node"].to_numpy(dtype=object))
    return out.sort_values("node").reset_index(drop=True)


_SALSA_ROUNDS = 3
_SALSA_SCALE = 1 << 20


def _q_salsa(sf_dir: str) -> pd.DataFrame:
    """SALSA hubs & authorities (functions/hits.py::salsa) — exact
    integer floor-division contract, SQL-mirrored round by round."""
    from graph_data_science_ray.functions.hits import salsa

    b = _bundle(sf_dir)
    res = salsa(
        b["gd"], b["grev"], iterations=_SALSA_ROUNDS, scale=_SALSA_SCALE
    )
    return (
        pd.DataFrame(
            {"node": _strip(res["node"]),
             "hub": res["hub"].to_numpy().astype(np.int64),
             "auth": res["auth"].to_numpy().astype(np.int64)}
        )
        .sort_values("node")
        .reset_index(drop=True)
    )


def _salsa_oracle_sql() -> str:
    parts = [
        "uedges AS (SELECT DISTINCT src, dst FROM edges)",
        "od AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS d"
        " FROM uedges GROUP BY 1)",
        "idg AS (SELECT dst AS node, CAST(count(*) AS BIGINT) AS d"
        " FROM uedges GROUP BY 1)",
        f"h0 AS (SELECT node, CAST({_SALSA_SCALE} AS BIGINT) AS v FROM nodes)",
    ]
    for r in range(1, _SALSA_ROUNDS + 1):
        parts.append(
            f"""a{r} AS MATERIALIZED (
  SELECT n.node, CAST(coalesce(s.m, 0) AS BIGINT) AS v
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, sum(h.v // o.d) AS m
    FROM uedges e JOIN h{r - 1} h ON h.node = e.src
                  JOIN od o ON o.node = e.src
    GROUP BY 1) s USING (node))"""
        )
        parts.append(
            f"""h{r} AS MATERIALIZED (
  SELECT n.node, CAST(coalesce(s.m, 0) AS BIGINT) AS v
  FROM nodes n LEFT JOIN (
    SELECT e.src AS node, sum(a.v // i.d) AS m
    FROM uedges e JOIN a{r} a ON a.node = e.dst
                  JOIN idg i ON i.node = e.dst
    GROUP BY 1) s USING (node))"""
    )
    return (
        f"WITH {_GRAPH_CTE},\n"
        + ",\n".join(parts)
        + f"""
SELECT h.node, h.v AS hub, a.v AS auth
FROM h{_SALSA_ROUNDS} h JOIN a{_SALSA_ROUNDS} a USING (node)
ORDER BY node"""
    )


_SPREAD_ROUNDS = 4
_SPREAD_SCALE = 1 << 20
_SPREAD_MOD = 17


def _q_seeded_propagation(sf_dir: str) -> pd.DataFrame:
    """Clamped seed-set spreading (functions/spread.py): seeds are dense
    ids ≡ 0 mod 17; integer floor-quotient push, SQL-exact per round."""
    from graph_data_science_ray.functions.spread import seeded_propagation

    b = _bundle(sf_dir)
    res = seeded_propagation(
        b["gu"], rounds=_SPREAD_ROUNDS, scale=_SPREAD_SCALE,
        seed_modulus=_SPREAD_MOD,
    )
    return (
        pd.DataFrame(
            {"node": _strip(res["node"]),
             "score": res["score"].to_numpy().astype(np.int64)}
        )
        .sort_values("node")
        .reset_index(drop=True)
    )


def _spread_oracle_sql() -> str:
    parts = [
        "ids AS (SELECT node, CAST(dense_rank() OVER (ORDER BY node) - 1"
        " AS BIGINT) AS id FROM nodes)",
        "deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS d"
        " FROM undw GROUP BY 1)",
        f"""x0 AS MATERIALIZED (
  SELECT node, CAST(CASE WHEN id % {_SPREAD_MOD} = 0
                         THEN {_SPREAD_SCALE} ELSE 0 END AS BIGINT) AS v
  FROM ids)""",
    ]
    for r in range(1, _SPREAD_ROUNDS + 1):
        parts.append(
            f"""x{r} AS MATERIALIZED (
  SELECT i.node,
         CAST(CASE WHEN i.id % {_SPREAD_MOD} = 0 THEN {_SPREAD_SCALE}
                   ELSE coalesce(s.m, 0) END AS BIGINT) AS v
  FROM ids i LEFT JOIN (
    SELECT e.dst AS node, sum(x.v // d.d) AS m
    FROM undw e JOIN x{r - 1} x ON x.node = e.src
                JOIN deg d ON d.node = e.src
    GROUP BY 1) s USING (node))"""
        )
    return (
        f"WITH {_GRAPH_CTE}, {_UND_CTE},\n"
        + ",\n".join(parts)
        + f"\nSELECT node, v AS score FROM x{_SPREAD_ROUNDS} ORDER BY node"
    )


def _q_user_paths(sf_dir: str) -> pd.DataFrame:
    """Top-20 user journey paths (first 8 events per user, stable
    order) — the product-analytics conversion-path readout."""
    import ray.data as rd

    from graph_data_science_ray.stages.sessions import user_paths

    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    return user_paths(ev, max_steps=8, top_k=20)


_MM_ROUNDS = 4


def _q_maximal_matching(sf_dir: str) -> pd.DataFrame:
    """Parallel greedy maximal matching (functions/matching.py) at
    pinned rounds — every matched pair SQL-exact."""
    from graph_data_science_ray.functions.matching import maximal_matching

    b = _bundle(sf_dir)
    out = maximal_matching(b["sym"], rounds=_MM_ROUNDS, num_parts=8, idmap=b["idmap"])
    return (
        pd.DataFrame(
            {"src": _strip(out["src"].to_numpy(dtype=object)),
             "dst": _strip(out["dst"].to_numpy(dtype=object))}
        )
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )


def _matching_cte_parts(prefix: str = "", source: str | None = None,
                        weighted: bool = False) -> list:
    """Matching-round CTE chain, name-prefixed so a second level can run
    inside the same WITH (the multilevel coarsening oracle). ``source``
    overrides the canonical integer pair set; the default derives it
    from ``undw`` + dense ids."""
    P = prefix
    u48 = ("CAST(CAST(('0x' || substr(md5('mm:' || CAST(src AS VARCHAR)"
           " || ':' || CAST(dst AS VARCHAR)), 1, 12)) AS UBIGINT) AS BIGINT)")
    parts = []
    if source is None:
        parts.append(
            "ids AS (SELECT node, CAST(dense_rank() OVER (ORDER BY node) - 1"
            " AS BIGINT) AS id FROM nodes)"
        )
        source = """
  SELECT a.id AS src, b.id AS dst
  FROM (SELECT DISTINCT src, dst FROM undw) e
  JOIN ids a ON a.node = e.src JOIN ids b ON b.node = e.dst
  WHERE a.id < b.id"""
    parts.append(f"ce{P} AS MATERIALIZED ({source})")
    if weighted:
        u40 = ("CAST(CAST(('0x' || substr(md5('mm:' || CAST(src AS VARCHAR)"
               " || ':' || CAST(dst AS VARCHAR)), 1, 10)) AS UBIGINT)"
               " AS BIGINT)")
        pri = (f"(1048576 - least(CAST(w AS BIGINT), 1048575))"
               f" * 1099511627776 + {u40}")
    else:
        pri = u48
    parts.append(
        f"e{P}_0 AS MATERIALIZED (SELECT src, dst, {pri} AS pri FROM ce{P})"
    )
    for r in range(_MM_ROUNDS):
        parts.append(
            f"""mn{P}_{r} AS MATERIALIZED (
  SELECT node, min(pri) AS m FROM (
    SELECT src AS node, pri FROM e{P}_{r}
    UNION ALL SELECT dst AS node, pri FROM e{P}_{r}
  ) GROUP BY 1)"""
        )
        parts.append(
            f"""mt{P}_{r} AS MATERIALIZED (
  SELECT e.src, e.dst FROM e{P}_{r} e
  JOIN mn{P}_{r} a ON a.node = e.src JOIN mn{P}_{r} b ON b.node = e.dst
  WHERE e.pri = a.m AND e.pri = b.m)"""
        )
        parts.append(
            f"""dd{P}_{r} AS MATERIALIZED (
  SELECT src AS node FROM mt{P}_{r} UNION SELECT dst AS node FROM mt{P}_{r})"""
        )
        parts.append(
            f"""e{P}_{r + 1} AS MATERIALIZED (
  SELECT e.src, e.dst, e.pri FROM e{P}_{r} e
  WHERE e.src NOT IN (SELECT node FROM dd{P}_{r})
    AND e.dst NOT IN (SELECT node FROM dd{P}_{r}))"""
        )
    un = "\n    UNION ALL ".join(
        f"SELECT src, dst FROM mt{P}_{r}" for r in range(_MM_ROUNDS)
    )
    parts.append(f"allm{P} AS ({un})")
    return parts


def _matching_oracle_sql() -> str:
    parts = _matching_cte_parts()
    return (
        f"WITH {_GRAPH_CTE}, {_UND_CTE},\n"
        + ",\n".join(parts)
        + """
SELECT a.node AS src, b.node AS dst
FROM allm m JOIN ids a ON a.id = m.src JOIN ids b ON b.id = m.dst
ORDER BY 1, 2"""
    )


def _coarsen_oracle_sql() -> str:
    parts = _matching_cte_parts()
    parts.append(
        """rep AS (
  SELECT src AS node, src AS rep FROM allm
  UNION ALL SELECT dst AS node, src AS rep FROM allm)"""
    )
    parts.append(
        """nmap AS (
  SELECT i.id AS node, coalesce(r.rep, i.id) AS rep
  FROM ids i LEFT JOIN rep r ON r.node = i.id)"""
    )
    parts.append(
        """coarse AS (
  SELECT ms.rep AS rs, md.rep AS rd, sum(e.w) AS w
  FROM undw e
  JOIN ids a ON a.node = e.src JOIN ids b ON b.node = e.dst
  JOIN nmap ms ON ms.node = a.id JOIN nmap md ON md.node = b.id
  WHERE ms.rep <> md.rep
  GROUP BY 1, 2)"""
    )
    return (
        f"WITH {_GRAPH_CTE}, {_UND_CTE},\n"
        + ",\n".join(parts)
        + """
SELECT x.node AS src, y.node AS dst, CAST(c.w AS DOUBLE) AS weight
FROM coarse c JOIN ids x ON x.id = c.rs JOIN ids y ON y.id = c.rd
ORDER BY 1, 2"""
    )


def _q_coarsen_graph(sf_dir: str) -> pd.DataFrame:
    """Matching-based coarsening (functions/matching.py::coarsen_graph):
    matched pairs contract to their smaller endpoint, parallel edges
    sum — the multilevel-method primitive, exact end to end."""
    from graph_data_science_ray.functions.matching import coarsen_graph

    b = _bundle(sf_dir)
    coarse, _m = coarsen_graph(b["sym"], rounds=_MM_ROUNDS, num_parts=8)
    df = coarse.to_pandas()
    keys = b["idmap"].keys
    return (
        pd.DataFrame(
            {"src": _strip(keys[df["src"].to_numpy(dtype=np.int64)]),
             "dst": _strip(keys[df["dst"].to_numpy(dtype=np.int64)]),
             "weight": df["weight"].astype(np.float64)}
        )
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )


def _q_triad_census(sf_dir: str) -> pd.DataFrame:
    """Dyad + undirected triad census (functions/graph_stats.py) — all
    eight counts exact integers from distributed degree moments, the
    triangle count and reciprocity pair codes."""
    from graph_data_science_ray.functions.graph_stats import triad_census

    b = _bundle(sf_dir)
    return triad_census(b["enc"], b["sym"], node_count=len(b["idmap"]))


def _q_dedup_cap(sf_dir: str) -> pd.DataFrame:
    """Frequency-capped dedup flags (stages/dedup.py::dedup_cap_flags):
    at most 2 keepers per identical text, md5-rank order."""
    from graph_data_science_ray.stages.dedup import dedup_cap_flags

    out = dedup_cap_flags(_docs(sf_dir), max_copies=2, salt="cap").to_pandas()
    out = out.rename(columns={"rank": "copy_rank"})
    out["doc_id"] = out["doc_id"].astype(np.int64)
    out["copy_rank"] = out["copy_rank"].astype(np.int64)
    out["keep"] = out["keep"].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


def _q_tool_chains(sf_dir: str) -> pd.DataFrame:
    """Top-20 tool invocation chains over the tooled transcript adapter
    (stages/trajectory.py::tool_chains)."""
    from graph_data_science_ray.sources.transcripts import (
        events_as_transcripts_tools,
    )
    from graph_data_science_ray.stages.trajectory import tool_chains

    turns = events_as_transcripts_tools(sf_dir)
    return tool_chains(turns, top_k=20)


def _q_transition_latency(sf_dir: str) -> pd.DataFrame:
    """Per-transition response-latency quantiles (exact integer µs order
    statistics at the shared quantile_disc rank contract)."""
    import graph_data_science_ray as gdsr

    from graph_data_science_ray.stages.trajectory import (
        transition_latency_quantiles,
    )

    ts = gdsr.events_as_transcripts(sf_dir)
    return transition_latency_quantiles(ts)


_ROBUST_PPMS = (250_000, 500_000, 750_000)


def _q_robustness_profile(sf_dir: str) -> pd.DataFrame:
    """Bond-percolation robustness profile (functions/graph_stats.py):
    giant-component size under deterministic md5 edge retention."""
    from graph_data_science_ray.functions.graph_stats import (
        robustness_profile,
    )

    b = _bundle(sf_dir)
    return robustness_profile(b["sym"], p_ppms=_ROBUST_PPMS)


def _robustness_oracle_sql() -> str:
    parts = [
        "ids AS (SELECT node, CAST(dense_rank() OVER (ORDER BY node) - 1"
        " AS BIGINT) AS id FROM nodes)",
        """ce AS MATERIALIZED (
  SELECT a.id AS i, b.id AS j
  FROM (SELECT DISTINCT src, dst FROM undw) e
  JOIN ids a ON a.node = e.src JOIN ids b ON b.node = e.dst
  WHERE a.id < b.id)""",
    ]
    selects = []
    for k, p in enumerate(_ROBUST_PPMS):
        parts.append(
            f"""kept{k} AS MATERIALIZED (
  SELECT i, j FROM ce
  WHERE CAST(CAST(('0x' || substr(md5('rb:' || CAST(i AS VARCHAR) || ':'
          || CAST(j AS VARCHAR)), 1, 8)) AS UBIGINT) AS BIGINT)
        * 1000000 < {int(p)} * 4294967296)"""
        )
        parts.append(
            f"""und{k} AS (
  SELECT i AS s, j AS d FROM kept{k}
  UNION SELECT j AS s, i AS d FROM kept{k})"""
        )
        parts.append(
            f"tn{k} AS (SELECT DISTINCT s AS node FROM und{k})"
        )
        parts.append(
            f"""reach{k} AS (
  SELECT node, node AS lab FROM tn{k}
  UNION
  SELECT u.d AS node, r.lab FROM reach{k} r JOIN und{k} u ON u.s = r.node)"""
        )
        parts.append(
            f"""comp{k} AS (
  SELECT node, min(lab) AS cl FROM reach{k} GROUP BY 1)"""
        )
        parts.append(
            f"cs{k} AS (SELECT cl, count(*) AS c FROM comp{k} GROUP BY 1)"
        )
        selects.append(
            f"""SELECT CAST({int(p)} AS BIGINT) AS p_ppm,
       CAST((SELECT count(*) FROM kept{k}) AS BIGINT) AS n_edges,
       CAST((SELECT count(*) FROM tn{k}) AS BIGINT) AS n_nodes,
       CAST((SELECT count(*) FROM cs{k}) AS BIGINT) AS n_components,
       CAST((SELECT coalesce(max(c), 0) FROM cs{k}) AS BIGINT) AS giant"""
        )
    return (
        f"WITH RECURSIVE {_GRAPH_CTE}, {_UND_CTE},\n"
        + ",\n".join(parts)
        + "\n"
        + "\nUNION ALL\n".join(selects)
        + "\nORDER BY p_ppm"
    )


def _q_knn_hamming(sf_dir: str) -> pd.DataFrame:
    """Binary-signature ANN: 64 sign bits in two u32 registers, exact
    XOR-popcount Hamming top-10 per fixed query."""
    import ray.data as rd

    from graph_data_science_ray.stages.similarity import knn_hamming

    emb = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    return knn_hamming(emb, query_ids=(1, 2, 3), k=10)


_TOPIC_THR = 100_000


def _q_topic_segments(sf_dir: str) -> pd.DataFrame:
    """Lexical topic segmentation per conversation (integer-ppm
    adjacent-turn Jaccard boundaries)."""
    import graph_data_science_ray as gdsr

    from graph_data_science_ray.stages.trajectory import topic_segments

    ts = gdsr.events_as_transcripts(sf_dir)
    out = topic_segments(ts, threshold_ppm=_TOPIC_THR).to_pandas()
    return out.sort_values("conv").reset_index(drop=True)


def _q_co_participation(sf_dir: str) -> pd.DataFrame:
    """Actor co-participation pairs — the one-mode bipartite projection
    of the actor×conversation incidence."""
    import graph_data_science_ray as gdsr

    from graph_data_science_ray.stages.trajectory import co_participation

    ts = gdsr.events_as_transcripts(sf_dir)
    out = co_participation(ts).to_pandas()
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def _q_knn_label_purity(sf_dir: str) -> pd.DataFrame:
    """Hamming k-NN label purity — the intrinsic embedding-quality
    metric, integer-exact end to end."""
    import ray.data as rd

    from graph_data_science_ray.stages.similarity import knn_label_purity

    emb = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding", "label"],
    )
    return knn_label_purity(emb, k=10)


_DSG_ROUNDS = 6


def _q_densest_subgraph(sf_dir: str) -> pd.DataFrame:
    """Charikar peeling profile (functions/graph_stats.py) — per-round
    alive counts, threshold, exact integer density."""
    from graph_data_science_ray.functions.graph_stats import (
        densest_subgraph_profile,
    )

    b = _bundle(sf_dir)
    return densest_subgraph_profile(b["sym"], rounds=_DSG_ROUNDS, num_parts=8)


def _densest_oracle_sql() -> str:
    parts = [
        "ids AS (SELECT node, CAST(dense_rank() OVER (ORDER BY node) - 1"
        " AS BIGINT) AS id FROM nodes)",
        """pe0 AS MATERIALIZED (
  SELECT a.id AS src, b.id AS dst
  FROM (SELECT DISTINCT src, dst FROM undw) e
  JOIN ids a ON a.node = e.src JOIN ids b ON b.node = e.dst
  WHERE a.id < b.id)""",
    ]
    selects = []
    for r in range(_DSG_ROUNDS):
        parts.append(
            f"""dg{r} AS MATERIALIZED (
  SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
    SELECT src AS node FROM pe{r} UNION ALL SELECT dst AS node FROM pe{r}
  ) GROUP BY 1)"""
        )
        parts.append(
            f"""st{r} AS MATERIALIZED (
  SELECT CAST((SELECT count(*) FROM dg{r}) AS BIGINT) AS v,
         CAST((SELECT count(*) FROM pe{r}) AS BIGINT) AS e)"""
        )
        parts.append(
            f"""rm{r} AS MATERIALIZED (
  SELECT g.node FROM dg{r} g, st{r} s WHERE g.d <= 2 * s.e // s.v)"""
        )
        parts.append(
            f"""pe{r + 1} AS MATERIALIZED (
  SELECT p.src, p.dst FROM pe{r} p
  WHERE p.src NOT IN (SELECT node FROM rm{r})
    AND p.dst NOT IN (SELECT node FROM rm{r}))"""
        )
        selects.append(
            f"""SELECT CAST({r} AS BIGINT) AS round, s.v AS v_alive,
       s.e AS e_alive, 2 * s.e // s.v AS thr,
       s.e * 1000000 // s.v AS density_ppm
FROM st{r} s WHERE s.v > 0"""
        )
    return (
        f"WITH {_GRAPH_CTE}, {_UND_CTE},\n"
        + ",\n".join(parts)
        + "\n"
        + "\nUNION ALL\n".join(selects)
        + "\nORDER BY round"
    )


def _q_coarsen_graph2(sf_dir: str) -> pd.DataFrame:
    """Two-level multilevel coarsening: coarsen ∘ coarsen, the METIS
    V-cycle contraction chain, oracled end to end."""
    from graph_data_science_ray.functions.matching import coarsen_graph

    b = _bundle(sf_dir)
    c1, _m1 = coarsen_graph(b["sym"], rounds=_MM_ROUNDS, num_parts=8)
    c2, _m2 = coarsen_graph(c1.materialize(), rounds=_MM_ROUNDS, num_parts=8)
    df = c2.to_pandas()
    keys = b["idmap"].keys
    return (
        pd.DataFrame(
            {"src": _strip(keys[df["src"].to_numpy(dtype=np.int64)]),
             "dst": _strip(keys[df["dst"].to_numpy(dtype=np.int64)]),
             "weight": df["weight"].astype(np.float64)}
        )
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )


def _coarsen2_oracle_sql() -> str:
    parts = _matching_cte_parts()
    parts.append(
        """rep AS (
  SELECT src AS node, src AS rep FROM allm
  UNION ALL SELECT dst AS node, src AS rep FROM allm)"""
    )
    parts.append(
        """nmap AS (
  SELECT i.id AS node, coalesce(r.rep, i.id) AS rep
  FROM ids i LEFT JOIN rep r ON r.node = i.id)"""
    )
    parts.append(
        """coarse AS MATERIALIZED (
  SELECT ms.rep AS rs, md.rep AS rd, sum(e.w) AS w
  FROM undw e
  JOIN ids a ON a.node = e.src JOIN ids b ON b.node = e.dst
  JOIN nmap ms ON ms.node = a.id JOIN nmap md ON md.node = b.id
  WHERE ms.rep <> md.rep
  GROUP BY 1, 2)"""
    )
    parts.extend(
        _matching_cte_parts(
            prefix="2",
            source="SELECT DISTINCT rs AS src, rd AS dst FROM coarse"
                   " WHERE rs < rd",
        )
    )
    parts.append(
        """rep2 AS (
  SELECT src AS node, src AS rep FROM allm2
  UNION ALL SELECT dst AS node, src AS rep FROM allm2)"""
    )
    parts.append(
        """nmap2 AS (
  SELECT n.node, coalesce(r.rep, n.node) AS rep
  FROM (SELECT DISTINCT rs AS node FROM coarse) n
  LEFT JOIN rep2 r ON r.node = n.node)"""
    )
    parts.append(
        """coarse2 AS MATERIALIZED (
  SELECT ms.rep AS rs, md.rep AS rd, sum(c.w) AS w
  FROM coarse c
  JOIN nmap2 ms ON ms.node = c.rs JOIN nmap2 md ON md.node = c.rd
  WHERE ms.rep <> md.rep
  GROUP BY 1, 2)"""
    )
    return (
        f"WITH {_GRAPH_CTE}, {_UND_CTE},\n"
        + ",\n".join(parts)
        + """
SELECT x.node AS src, y.node AS dst, CAST(c.w AS DOUBLE) AS weight
FROM coarse2 c JOIN ids x ON x.id = c.rs JOIN ids y ON y.id = c.rd
ORDER BY 1, 2"""
    )


def _q_kmv_registers(sf_dir: str) -> pd.DataFrame:
    """KMV bottom-k distinct sketch — 64 verbatim integer registers."""
    from graph_data_science_ray.stages.sketch import kmv_registers

    return kmv_registers(_docs(sf_dir), k=64)


def _q_wl_cells(sf_dir: str) -> pd.DataFrame:
    """WL color-class histogram — refinement cell sizes."""
    from graph_data_science_ray.functions.wl import wl_partition_sizes

    b = _bundle(sf_dir)
    out = wl_partition_sizes(b["gu"], rounds=_WL_ROUNDS)
    out["color"] = out["color"].astype(np.int64)
    out["n"] = out["n"].astype(np.int64)
    return out


def _q_lang_report(sf_dir: str) -> pd.DataFrame:
    """Composed curation readout: per detected language, document and
    token totals — lang_id ∘ token_count ∘ hash-join ∘ group, all
    streaming (the per-doc tables never leave the cluster)."""
    import pyarrow as pa

    from graph_data_science_ray.pipelines.agg import hash_aggregate, hash_join
    from graph_data_science_ray.stages.text import lang_id, token_count

    docs = _docs(sf_dir)
    langs = lang_id(docs).map_batches(
        lambda df: pd.DataFrame(
            {"doc_id": df["doc_id"].astype(np.int64),
             "lang_pred": df["lang_pred"].astype(str)}
        ),
        batch_format="pandas",
    )
    toks = token_count(docs).map_batches(
        lambda df: pd.DataFrame(
            {"doc_id": df["doc_id"].astype(np.int64),
             "n_tokens": df["n_tokens"].astype(np.int64)}
        ),
        batch_format="pandas",
    )
    j = hash_join(
        langs, toks, on=["doc_id"],
        left_schema=pa.schema([("doc_id", pa.int64()),
                               ("lang_pred", pa.string())]),
        right_schema=pa.schema([("doc_id", pa.int64()),
                                ("n_tokens", pa.int64())]),
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("lang_pred", sort=False).agg(
            n_docs=("doc_id", "size"), total_tokens=("n_tokens", "sum")
        ).reset_index().rename(columns={"lang_pred": "lang"})
        return g

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("lang", sort=False).agg(
            n_docs=("n_docs", "sum"), total_tokens=("total_tokens", "sum")
        ).reset_index()
        return out

    agg = (
        j.map_batches(partial, batch_format="pandas")
        .groupby("lang")
        .map_groups(combine, batch_format="pandas")
        .to_pandas()
    )
    for c in ("n_docs", "total_tokens"):
        agg[c] = agg[c].astype(np.int64)
    return agg.sort_values("lang").reset_index(drop=True)


_TEMPORAL_HORIZON = 4_102_444_800_000_000  # 2100-01-01 in µs


def _q_temporal_departure(sf_dir: str) -> pd.DataFrame:
    """Latest-departure dual of temporal_reachability: to the
    lexicographically largest actor by a fixed horizon."""
    import graph_data_science_ray as gdsr

    from graph_data_science_ray.functions.temporal import (
        derive_contacts,
        temporal_departure,
    )

    ts = gdsr.events_as_transcripts(sf_dir)
    turns = gdsr.derive_turns(ts, keep_ts=True)
    target = turns.select_columns(["actor"]).max("actor")
    contacts = derive_contacts(turns)
    out = temporal_departure(
        contacts, target=target, horizon=_TEMPORAL_HORIZON,
        rounds=_TEMPORAL_ROUNDS, num_parts=8,
    )
    out = out.copy()
    out["node"] = _strip(out["node"].to_numpy(dtype=object))
    return out.sort_values("node").reset_index(drop=True)


def _q_actor_activity(sf_dir: str) -> pd.DataFrame:
    """Per-actor activity profile: turns, distinct conversations, exact
    µs first/last activity."""
    import graph_data_science_ray as gdsr

    from graph_data_science_ray.stages.trajectory import actor_activity

    ts = gdsr.events_as_transcripts(sf_dir)
    out = actor_activity(ts, ts_col="ts").to_pandas()
    for c in ("n_turns", "n_convs", "first_us", "last_us"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("role").reset_index(drop=True)


def _q_graph_snapshots(sf_dir: str) -> pd.DataFrame:
    """Tumbling-day temporal-graph snapshots over the contact stream."""
    import graph_data_science_ray as gdsr

    from graph_data_science_ray.functions.temporal import derive_contacts
    from graph_data_science_ray.stages.trajectory import graph_snapshots

    ts = gdsr.events_as_transcripts(sf_dir)
    turns = gdsr.derive_turns(ts, keep_ts=True)
    return graph_snapshots(derive_contacts(turns))


def _q_actor_jaccard(sf_dir: str) -> pd.DataFrame:
    """Conversation-set Jaccard between co-participating actors."""
    import graph_data_science_ray as gdsr

    from graph_data_science_ray.stages.trajectory import actor_jaccard

    ts = gdsr.events_as_transcripts(sf_dir)
    return actor_jaccard(ts)


def _q_condensation(sf_dir: str) -> pd.DataFrame:
    """SCC condensation DAG: distinct component-to-component edges after
    contracting strongly connected components — the standard SCC
    follow-up (the quotient is acyclic). Labels from the exact min-id
    SCC; the label map broadcasts (actor-vocabulary-bounded) and edges
    rekey + dedup distributedly."""
    import pyarrow as pa

    from graph_data_science_ray.functions.scc import scc
    from graph_data_science_ray.pipelines.agg import hash_aggregate

    b = _bundle(sf_dir)
    lab = scc(b["enc"], node_count=len(b["idmap"]), idmap=None)
    comp = lab["component"].to_numpy(dtype=np.int64)

    def rekey(t: pa.Table) -> pa.Table:
        src = np.asarray(t["src"].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        dst = np.asarray(t["dst"].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        cs, cd = comp[src], comp[dst]
        keep = cs != cd
        return pa.table(
            {"src_comp": cs[keep], "dst_comp": cd[keep],
             "one": np.ones(int(keep.sum()), dtype=np.int64)},
            schema=pa.schema([("src_comp", pa.int64()),
                              ("dst_comp", pa.int64()),
                              ("one", pa.int64())]),
        )

    dag = hash_aggregate(
        b["enc"].map_batches(rekey, batch_format="pyarrow"),
        ["src_comp", "dst_comp"], "one", op="min", num_parts=8,
    ).to_pandas()
    keys = b["idmap"].keys
    if "src_comp" not in dag.columns or not len(dag):
        return pd.DataFrame({"src_comp": pd.Series([], dtype=object),
                             "dst_comp": pd.Series([], dtype=object)})
    return (
        pd.DataFrame(
            {"src_comp": _strip(keys[dag["src_comp"].to_numpy(np.int64)]),
             "dst_comp": _strip(keys[dag["dst_comp"].to_numpy(np.int64)])}
        )
        .sort_values(["src_comp", "dst_comp"])
        .reset_index(drop=True)
    )


def _q_hem_matching(sf_dir: str) -> pd.DataFrame:
    """Heavy-edge matching (METIS HEM visit rule made deterministic):
    priorities order by weight desc then md5 — heaviest edges matched
    first."""
    from graph_data_science_ray.functions.matching import maximal_matching

    b = _bundle(sf_dir)
    out = maximal_matching(b["sym"], rounds=_MM_ROUNDS, num_parts=8,
                           idmap=b["idmap"], weighted=True)
    return (
        pd.DataFrame(
            {"src": _strip(out["src"].to_numpy(dtype=object)),
             "dst": _strip(out["dst"].to_numpy(dtype=object))}
        )
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )


def _hem_oracle_sql() -> str:
    src = """
  SELECT a.id AS src, b.id AS dst, CAST(e.w AS BIGINT) AS w
  FROM undw e
  JOIN ids a ON a.node = e.src JOIN ids b ON b.node = e.dst
  WHERE a.id < b.id"""
    parts = [
        "ids AS (SELECT node, CAST(dense_rank() OVER (ORDER BY node) - 1"
        " AS BIGINT) AS id FROM nodes)",
    ] + _matching_cte_parts(prefix="w", source=src, weighted=True)
    return (
        f"WITH {_GRAPH_CTE}, {_UND_CTE},\n"
        + ",\n".join(parts)
        + """
SELECT a.node AS src, b.node AS dst
FROM allmw m JOIN ids a ON a.id = m.src JOIN ids b ON b.id = m.dst
ORDER BY 1, 2"""
    )


def _q_blocklist(sf_dir: str) -> pd.DataFrame:
    """C4-style token-blocklist flags over the document corpus."""
    from graph_data_science_ray.stages.quality import blocklist_flags

    out = blocklist_flags(_docs(sf_dir)).to_pandas()
    for c in ("doc_id", "hits", "blocked"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


def _q_coarsen_hem(sf_dir: str) -> pd.DataFrame:
    """Heavy-edge-contraction coarsening (weighted matching mode) —
    the true METIS HEM coarsen level, oracled end to end."""
    from graph_data_science_ray.functions.matching import coarsen_graph

    b = _bundle(sf_dir)
    coarse, _m = coarsen_graph(b["sym"], rounds=_MM_ROUNDS, num_parts=8,
                               weighted=True)
    df = coarse.to_pandas()
    keys = b["idmap"].keys
    return (
        pd.DataFrame(
            {"src": _strip(keys[df["src"].to_numpy(dtype=np.int64)]),
             "dst": _strip(keys[df["dst"].to_numpy(dtype=np.int64)]),
             "weight": df["weight"].astype(np.float64)}
        )
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )


def _coarsen_hem_oracle_sql() -> str:
    src = """
  SELECT a.id AS src, b.id AS dst, CAST(e.w AS BIGINT) AS w
  FROM undw e
  JOIN ids a ON a.node = e.src JOIN ids b ON b.node = e.dst
  WHERE a.id < b.id"""
    parts = [
        "ids AS (SELECT node, CAST(dense_rank() OVER (ORDER BY node) - 1"
        " AS BIGINT) AS id FROM nodes)",
    ] + _matching_cte_parts(prefix="w", source=src, weighted=True)
    parts.append(
        """repw AS (
  SELECT src AS node, src AS rep FROM allmw
  UNION ALL SELECT dst AS node, src AS rep FROM allmw)"""
    )
    parts.append(
        """nmapw AS (
  SELECT i.id AS node, coalesce(r.rep, i.id) AS rep
  FROM ids i LEFT JOIN repw r ON r.node = i.id)"""
    )
    parts.append(
        """coarsew AS (
  SELECT ms.rep AS rs, md.rep AS rd, sum(e.w) AS w
  FROM undw e
  JOIN ids a ON a.node = e.src JOIN ids b ON b.node = e.dst
  JOIN nmapw ms ON ms.node = a.id JOIN nmapw md ON md.node = b.id
  WHERE ms.rep <> md.rep
  GROUP BY 1, 2)"""
    )
    return (
        f"WITH {_GRAPH_CTE}, {_UND_CTE},\n"
        + ",\n".join(parts)
        + """
SELECT x.node AS src, y.node AS dst, CAST(c.w AS DOUBLE) AS weight
FROM coarsew c JOIN ids x ON x.id = c.rs JOIN ids y ON y.id = c.rd
ORDER BY 1, 2"""
    )


def _q_activity_decay(sf_dir: str) -> pd.DataFrame:
    """Exact integer recency-decay engagement score per actor."""
    import graph_data_science_ray as gdsr

    from graph_data_science_ray.stages.trajectory import activity_decay

    ts = gdsr.events_as_transcripts(sf_dir)
    return activity_decay(ts)


def _q_actor_lift(sf_dir: str) -> pd.DataFrame:
    """Association-rule lift over conversation casts (integer ppm)."""
    import graph_data_science_ray as gdsr

    from graph_data_science_ray.stages.trajectory import actor_lift

    ts = gdsr.events_as_transcripts(sf_dir)
    return actor_lift(ts)


def _q_graph_fingerprint(sf_dir: str) -> pd.DataFrame:
    """Isomorphism-invariant graph fingerprint: md5 over the sorted WL
    color histogram — equal across node relabelings, the standard WL
    graph-hash readout (one row)."""
    import hashlib

    from graph_data_science_ray.functions.wl import wl_partition_sizes

    b = _bundle(sf_dir)
    hist = wl_partition_sizes(b["gu"], rounds=_WL_ROUNDS)
    blob = ",".join(
        f"{int(c)}:{int(n)}"
        for c, n in zip(hist["color"], hist["n"])
    )
    return pd.DataFrame({"fingerprint": [hashlib.md5(blob.encode()).hexdigest()]})


def _q_transitivity(sf_dir: str) -> pd.DataFrame:
    """Global clustering coefficient (transitivity): 3·triangles·10⁶ //
    open+closed wedges — the one-row ratio readout of the triad census."""
    from graph_data_science_ray.functions.graph_stats import triad_census

    b = _bundle(sf_dir)
    c = triad_census(b["enc"], b["sym"], node_count=len(b["idmap"])).iloc[0]
    t = int(c["tri_closed"])
    p2 = 3 * t + int(c["tri_wedge"])
    return pd.DataFrame(
        {"triangles": np.array([t], dtype=np.int64),
         "wedges": np.array([p2], dtype=np.int64),
         "transitivity_ppm": np.array(
             [3 * t * 1_000_000 // p2 if p2 else 0], dtype=np.int64
         )}
    )


def entry() -> Any:
    """Flagship pipeline on sf0.001: events → edge table → weighted
    PageRank; returns (node, score) rows."""
    return _q_pagerank("/root/testdata/sf0.001")


def _q_rf_score(sf_dir: str) -> pd.DataFrame:
    """Fixed-tree RandomForest scoring over the embeddings table (the
    forest predict path; reference randomforest/RandomForestClassifier):
    three planted depth-2 trees vote, majority wins — every threshold is
    0.0 so the engine/SQL float comparison is exact."""
    import ray.data as rd

    from graph_data_science_ray.pipelines.ml import assemble_features
    from graph_data_science_ray.pipelines.trees import RandomForestModel

    trees = []
    for t in range(3):
        trees.append(
            {
                "feature": np.array([t, t + 1, -1, -1, -1], dtype=np.int64),
                "threshold": np.array([0.0, 0.0, 0.0, 0.0, 0.0]),
                "left": np.array([1, 3, -1, -1, -1], dtype=np.int64),
                "right": np.array([2, 4, -1, -1, -1], dtype=np.int64),
                "value": np.array([0.0, 0.0, 1.0, 0.0, 1.0]),
            }
        )
    model = RandomForestModel(trees, classes=np.array([0, 1]))
    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                          columns=["vec_id", "embedding"])
    out = model.predict(assemble_features(emb, ["embedding"])).to_pandas()
    return pd.DataFrame(
        {"vec_id": out["vec_id"].astype(np.int64),
         "predicted": out["predicted"].astype(np.int64)}
    ).sort_values("vec_id").reset_index(drop=True)


def _q_mlp_score(sf_dir: str) -> pd.DataFrame:
    """Fixed-weight MLP forward pass over the embeddings table (the
    reference mlp/MLPClassifier predict shape): 4 ReLU hidden units +
    2-class head, rational closed-form weights shared with the SQL
    oracle; int-only argmax output (lr_score contract)."""
    import ray.data as rd

    from graph_data_science_ray.pipelines.ml import (
        MLPClassifierModel, assemble_features,
    )

    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                          columns=["vec_id", "embedding"])
    first = emb.take(1)[0]
    d = len(first["embedding"])
    i = np.arange(d)[:, None]
    j = np.arange(4)[None, :]
    W1 = (((i * 3 + j * 5) % 11) - 5) / 10.0
    jj = np.arange(4)[:, None]
    k = np.arange(2)[None, :]
    W2 = (((jj * 7 + k * 3) % 9) - 4) / 10.0
    model = MLPClassifierModel(
        [W1, W2], [np.zeros(4), np.zeros(2)], classes=np.array([0, 1])
    )
    out = model.predict(assemble_features(emb, ["embedding"])).to_pandas()
    return pd.DataFrame(
        {"vec_id": out["vec_id"].astype(np.int64),
         "predicted": out["predicted"].astype(np.int64)}
    ).sort_values("vec_id").reset_index(drop=True)


def _q_node_classification_rf(sf_dir: str) -> pd.DataFrame:
    """RandomForest node classification validity: one prediction per
    embedding row, labels inside the observed domain, and a re-train is
    byte-identical (canonical-matrix determinism contract)."""
    import ray.data as rd

    from graph_data_science_ray.pipelines.ml import node_classification_pipeline

    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    kw = dict(
        label_col="label", feature_cols=["embedding"], id_col="vec_id",
        test_fraction=0.25, model="rf",
        model_params={"num_trees": 5, "max_depth": 5},
    )
    r1 = node_classification_pipeline(emb, **kw)
    r2 = node_classification_pipeline(emb, **kw)
    preds = r1["predictions"].to_pandas()
    dom = set(preds["label"].unique().tolist())
    bad = int((~preds["predicted"].isin(list(dom))).sum())
    det = int(
        all(
            (t1[c] == t2[c]).all()
            for t1, t2 in zip(r1["model"].trees, r2["model"].trees)
            for c in t1
        )
    )
    return pd.DataFrame(
        {"n_rows": np.array([len(preds)], dtype=np.int64),
         "bad_labels": np.array([bad], dtype=np.int64),
         "det_ok": np.array([det], dtype=np.int64)}
    )


def _q_node_regression_rf(sf_dir: str) -> pd.DataFrame:
    """RandomForest node regression validity on a planted piecewise
    target (sign of embedding[0] → ±5): one prediction per row, the
    forest explains the step function (R² > 0.5), re-train
    byte-identical."""
    import ray.data as rd

    from graph_data_science_ray.pipelines.ml import node_regression_pipeline

    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                          columns=["vec_id", "embedding"])

    def add_target(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["target"] = [
            5.0 if float(np.asarray(v, dtype=np.float64)[0]) > 0 else -5.0
            for v in df["embedding"]
        ]
        return df

    ds = emb.map_batches(add_target, batch_format="pandas")
    kw = dict(
        target_col="target", feature_cols=["embedding"], id_col="vec_id",
        test_fraction=0.25, model="rf",
        model_params={"num_trees": 4, "max_depth": 4},
    )
    r1 = node_regression_pipeline(ds, **kw)
    r2 = node_regression_pipeline(ds, **kw)
    n_rows = int(r1["predictions"].count())
    det = int(
        all(
            (t1[c] == t2[c]).all()
            for t1, t2 in zip(r1["model"].trees, r2["model"].trees)
            for c in t1
        )
    )
    return pd.DataFrame(
        {"n_rows": np.array([n_rows], dtype=np.int64),
         "fit_ok": np.array([int(r1["metrics"]["r2"] > 0.5)], dtype=np.int64),
         "det_ok": np.array([det], dtype=np.int64)}
    )


def _q_autotune_select(sf_dir: str) -> pd.DataFrame:
    """Auto-tuning validity (reference pipeline/.../AutoTuningConfig):
    a tunable learning-rate candidate expands to exactly max_trials
    deterministic concrete configs, the two-run winner is identical
    (det_ok), and the winner's metric equals the max over sampled trials
    (monotone_ok — selection is metric-monotone by construction)."""
    import ray.data as rd

    from graph_data_science_ray.state.pipeline_catalog import TrainingPipeline

    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    p = TrainingPipeline("autotune-q", "node_classification")
    p.select_features(["embedding"])
    p.add_trainer_candidate(
        learning_rate={"range": [0.05, 0.5]}, max_epochs=15,
    )
    p.configure_auto_tuning(max_trials=3)
    r1 = p.train(emb, label_col="label", id_col="vec_id")
    r2 = p.train(emb, label_col="label", id_col="vec_id")
    det = int(r1["best_candidate"] == r2["best_candidate"])
    best = max(m["score"] for m in r1["candidate_metrics"])
    mono = int(r1["metrics"]["accuracy"] == best)
    return pd.DataFrame(
        {"n_cands": np.array([len(r1["candidate_metrics"])], dtype=np.int64),
         "det_ok": np.array([det], dtype=np.int64),
         "monotone_ok": np.array([mono], dtype=np.int64)}
    )


def _q_kge(sf_dir: str, score: str) -> pd.DataFrame:
    """KGE link prediction (ref proc/machine-learning/.../kge/
    TopKMapComputer.java:40): TransE / DistMult top-5 targets per head
    (heads = vec_id < 10; relation = 0.1 x embedding of vec 0)."""
    import ray.data as rd

    from graph_data_science_ray.functions.kge import kge_topk

    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                          columns=["vec_id", "embedding"])
    return kge_topk(emb, np.arange(10), rel_id=0, rel_scale=0.1, k=5,
                    score=score)


def _q_triangle_stream(sf_dir: str) -> pd.DataFrame:
    """Per-triangle (a,b,c) emission — the reference's TriangleStream
    (algo/.../triangle/TriangleStream.java:52): each triangle exactly
    once, corners ascending (dense-id order == sorted-key order)."""
    from graph_data_science_ray.functions.triangles import triangle_stream

    b = _bundle(sf_dir)
    df = triangle_stream(b["sym"], idmap=b["idmap"], num_partitions=8).to_pandas()
    if "a" not in df.columns or not len(df):
        return pd.DataFrame({"a": pd.Series([], dtype=object),
                             "b": pd.Series([], dtype=object),
                             "c": pd.Series([], dtype=object)})
    keys = _strip(b["idmap"].keys)
    out = pd.DataFrame(
        {"a": keys[df["a"].to_numpy(dtype=np.int64)],
         "b": keys[df["b"].to_numpy(dtype=np.int64)],
         "c": keys[df["c"].to_numpy(dtype=np.int64)]}
    )
    return out.sort_values(["a", "b", "c"]).reset_index(drop=True)


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "edges": _q_edges,
        "edges_distributed": _q_edges_distributed,
        "degree": _q_degree,
        "degree_distribution": _q_degree_distribution,
        "component_size_distribution": _q_component_size_distribution,
        "pagerank_distribution": _q_pagerank_distribution,
        "typed_edge_counts": _q_typed_edge_counts,
        "pagerank_typed": _q_pagerank_typed,
        "pagerank": _q_pagerank,
        "article_rank": _q_article_rank,
        "eigenvector": _q_eigenvector,
        "eigenvector_exact": _q_eigenvector_exact,
        "wcc": _q_wcc,
        "label_propagation": _q_labelprop,
        "triangles": _q_triangles,
        "triangles_global": _q_triangles_global,
        "lcc": _q_lcc,
        "sssp": _q_sssp,
        "all_shortest_paths": _q_all_shortest_paths,
        "apsp_weighted": _q_apsp_weighted,
        "hop_distribution": _q_hop_distribution,
        "bfs": _q_bfs,
        "k_core": _q_kcore,
        "node_similarity": _q_node_similarity,
        "hits": _q_hits,
        "median_neighbor": _q_median_neighbor,
        "collapse_path": _q_collapse_path,
        "random_walks": _q_random_walks,
        "random_walks_valid": _q_walks_valid,
        "modularity": _q_modularity,
        "conductance": _q_conductance,
        "kmeans_assign": _q_kmeans_assign,
        "kmeans": _q_kmeans,
        "closeness": _q_closeness,
        "closeness_wf": _q_closeness_wf,
        "fastrp": _q_fastrp,
        "louvain": _q_louvain,
        "leiden": _q_leiden,
        "leiden_valid": _q_leiden_valid,
        "louvain_valid": _q_louvain_valid,
        "fastrp_valid": _q_fastrp_valid,
        "k1_coloring": _q_k1_coloring,
        "k1_coloring_valid": _q_k1_valid,
        "scc": _q_scc,
        "betweenness": _q_betweenness,
        "spanning_tree": _q_spanning_tree,
        "shortest_path_route": _q_shortest_path_route,
        "dijkstra_route": _q_dijkstra_route,
        "rwr_sample": _q_rwr_valid,
        "dedup_exact": _q_dedup_exact,
        "fingerprint": _q_fingerprint,
        "token_count": _q_token_count,
        "ngram_topk": _q_ngram_topk,
        "hash_split": _q_hash_split,
        "quantile_filter": _q_quantile_filter,
        "top_k_per_group": _q_top_k_per_group,
        "stratified_sample": _q_stratified_sample,
        "deterministic_shuffle": _q_deterministic_shuffle,
        "sample_global_k": _q_sample_global_k,
        "doc_freq": _q_doc_freq,
        "tf_idf_topk": _q_tf_idf_topk,
        "bm25_topk": _q_bm25_topk,
        "unigram_nll": _q_unigram_nll,
        "c4_quality": _q_c4_quality,
        "token_repetition": _q_token_repetition,
        "semantic_dedup": _q_semantic_dedup,
        "dag_longest_path": _q_dag_longest_path,
        "running_sum": _q_running_sum,
        "row_number_global": _q_row_number,
        "lag_delta": _q_lag_delta,
        "pack_sequences": _q_pack_sequences,
        "media_decode": _q_media_decode,
        "media_resize": _q_media_resize,
        "media_frames": _q_media_frames,
        "media_audio": _q_media_audio,
        "quality_stats": _q_quality,
        "lang_id": _q_lang_id,
        "normalize_text": _q_normalize_text,
        "scale_embedding_minmax": _q_scale_embedding_minmax,
        "chunk_documents": _q_chunk_documents,
        "minhash_near_dup": _q_minhash_valid,
        "simhash": _q_simhash,
        "ngram_jaccard": _q_ngram_jaccard,
        "duplicate_spans": _q_duplicate_spans,
        "dedup_clusters": _q_dedup_clusters,
        "weighted_sample": _q_weighted_sample,
        "hll_registers": _q_hll_registers,
        "cms_registers": _q_cms_registers,
        "cms_heavy_hitters": _q_cms_heavy_hitters,
        "decontaminate": _q_decontaminate,
        "bloom_decontaminate": _q_bloom_decontaminate,
        "source_mix": _q_source_mix,
        "conversation_stats": _q_conversation_stats,
        "turn_dedup": _q_turn_dedup,
        "trajectory_pagerank": _q_trajectory_pagerank,
        "training_mix": _q_training_mix,
        "asof_join": _q_asof_join,
        "feature_backfill": _q_feature_backfill,
        "knn_cosine_topk": _q_knn,
        "knn_euclidean": lambda sf: _q_knn_metric(sf, "euclidean"),
        "knn_pearson": lambda sf: _q_knn_metric(sf, "pearson"),
        "knn_ivf": _q_knn_ivf,
        "knn_quantized": _q_knn_quantized,
        "knn_lsh_multiband": _q_knn_lsh_multiband,
        "knn_descent": _q_knn_descent_valid,
        "embedding_near_dup": _q_embedding_near_dup,
        "scale_minmax": _q_scale_minmax,
        "sessionize": _q_sessionize,
        "window_hourly": _q_window_hourly,
        "window_sliding": _q_window_sliding,
        "range_join": _q_range_join,
        "yens_k3": _q_yens_k3,
        "delta_stepping": _q_delta_stepping,
        "astar": _q_astar,
        "dfs": _q_dfs_valid,
        "cnarw_sample": _q_cnarw_valid,
        "node2vec": _q_node2vec_valid,
        "graphsage": _q_graphsage_valid,
        "graphsage_multilabel": _q_graphsage_multilabel_valid,
        "sllpa": _q_sllpa_valid,
        "max_k_cut": _q_max_k_cut_valid,
        "celf": _q_celf_valid,
        "hashgnn": _q_hashgnn_valid,
        "k_spanning": _q_k_spanning_valid,
        "steiner": _q_steiner_valid,
        "node_classification": _q_node_classification_valid,
        "link_prediction": _q_link_prediction_valid,
        "bridges": _q_bridges,
        "articulation_points": _q_articulation_points,
        "biconnected_valid": _q_biconnected_valid,
        "scale_l2": _q_scale_l2,
        "lp_node_weighted": _q_lp_node_weighted,
        "louvain_modularity": _q_louvain_modularity,
        "louvain_round1": _q_louvain_round1,
        "pagerank_personalized": _q_pagerank_personalized,
        "bpe_token_count": _q_bpe_token_count,
        "dedup_exact_table": _q_dedup_exact_table,
        "clean_corpus": _q_clean_corpus,
        "winnow_fingerprints": _q_winnow_fp,
        "modularity_optimization": _q_modopt_valid,
        "node_similarity_cosine": _q_nodesim_cosine,
        "node_similarity_topk": _q_nodesim_topk,
        "edges_max": _q_edges_max,
        "cypher_project": _q_cypher_project,
        "lr_score": _q_lr_score,
        # node regression (the reference's third ML pipeline)
        "node_regression": _q_node_regression_valid,
        "subgraph_filter_expr": _q_subgraph_filter_expr,
        # reference function surface: gds.alpha.linkprediction.* and
        # gds.similarity.* as distributed pair-scoring operators
        "linkpred_funcs": _q_linkpred_funcs,
        "vector_similarity": _q_vector_similarity,
        "split_relationships": _q_split_relationships,
        "degree_in": _q_degree_in,
        # trajectory batch 2: transition structure, loop detection,
        # context-window accounting, conversation-integrity packing,
        # conversation-level near-dup
        "role_transitions": _q_role_transitions,
        "turn_loops": _q_turn_loops,
        "turn_context": _q_turn_context,
        "pack_conversations": _q_pack_conversations,
        "conversation_jaccard": _q_conversation_jaccard,
        "turn_latency": _q_turn_latency,
        "latency_stats": _q_latency_stats,
        "conversation_novelty": _q_conversation_novelty,
        "trajectory_pack": _q_trajectory_pack,
        # global graph-structure stats (Newman reciprocity/assortativity)
        "reciprocity": _q_reciprocity,
        "assortativity": _q_assortativity,
        "bigram_nll": _q_bigram_nll,
        "rich_club": _q_rich_club,
        "vocab_topk": _q_vocab_topk,
        "hyperanf_registers": _q_hyperanf_registers,
        "k_truss": _q_k_truss,
        "knn_pq": _q_knn_pq,
        "hashed_features": _q_hashed_features,
        "latency_moments": _q_latency_moments,
        "knn_ivfpq": _q_knn_ivfpq,
        "media_ahash": _q_media_ahash,
        "doc_length_quantiles": _q_doc_length_quantiles,
        "corpus_profile": _q_corpus_profile,
        "image_near_dup": _q_image_near_dup,
        "audio_fingerprint": _q_audio_fingerprint,
        "graph_profile": _q_graph_profile,
        "eccentricity": _q_eccentricity,
        "graph_diameter": _q_graph_diameter,
        "token_entropy": _q_token_entropy,
        "wcc_threshold": _q_wcc_threshold,
        "hll_by_source": _q_hll_by_source,
        "edges_tooled": _q_edges_tooled,
        "tool_usage": _q_tool_usage,
        "pagerank_tooled": _q_pagerank_tooled,
        # session-8 batch: events-stream product analytics + corpus
        # collocation/readability + actor paths
        "funnel": _q_funnel,
        "retention_cohorts": _q_retention,
        "actor_trigrams": _q_actor_trigrams,
        "pmi_bigrams": _q_pmi_bigrams,
        "readability": _q_readability,
        "pca_power": _q_pca_power,
        "four_cliques": _q_four_cliques,
        "zipf_fit": _q_zipf_fit,
        "degree_gini": _q_degree_gini,
        "katz": _q_katz,
        "props_field_stats": _q_props_field_stats,
        "value_stats": _q_value_stats,
        "funnel_latency": _q_funnel_latency,
        "product_report": _q_product_report,
        "ams_registers": _q_ams_registers,
        "conversation_dedup": _q_conversation_dedup,
        "tool_latency": _q_tool_latency,
        "monologue_runs": _q_monologue_runs,
        "wl_colors": _q_wl_colors,
        "mis": _q_mis,
        "ldp_features": _q_ldp_features,
        "turn_cooccurrence": _q_turn_cooccurrence,
        "markov_stationary": _q_markov_stationary,
        "temporal_reachability": _q_temporal_reachability,
        "salsa": _q_salsa,
        "seeded_propagation": _q_seeded_propagation,
        "user_paths": _q_user_paths,
        "maximal_matching": _q_maximal_matching,
        "triad_census": _q_triad_census,
        "dedup_cap": _q_dedup_cap,
        "tool_chains": _q_tool_chains,
        "transition_latency": _q_transition_latency,
        "robustness_profile": _q_robustness_profile,
        "knn_hamming": _q_knn_hamming,
        "coarsen_graph": _q_coarsen_graph,
        "topic_segments": _q_topic_segments,
        "co_participation": _q_co_participation,
        "knn_label_purity": _q_knn_label_purity,
        "densest_subgraph": _q_densest_subgraph,
        "coarsen_graph2": _q_coarsen_graph2,
        "kmv_registers": _q_kmv_registers,
        "wl_cells": _q_wl_cells,
        "lang_report": _q_lang_report,
        "temporal_departure": _q_temporal_departure,
        "actor_activity": _q_actor_activity,
        "graph_snapshots": _q_graph_snapshots,
        "actor_jaccard": _q_actor_jaccard,
        "condensation": _q_condensation,
        "hem_matching": _q_hem_matching,
        "coarsen_hem": _q_coarsen_hem,
        "blocklist": _q_blocklist,
        "activity_decay": _q_activity_decay,
        "actor_lift": _q_actor_lift,
        "graph_fingerprint": _q_graph_fingerprint,
        "transitivity": _q_transitivity,
        "triangle_stream": _q_triangle_stream,
        "kge_transe_topk": lambda sf: _q_kge(sf, "transe"),
        "kge_distmult_topk": lambda sf: _q_kge(sf, "distmult"),
        "astar_haversine": _q_astar_haversine,
        "rf_score": _q_rf_score,
        "mlp_score": _q_mlp_score,
        "node_classification_rf": _q_node_classification_rf,
        "node_regression_rf": _q_node_regression_rf,
        "autotune_select": _q_autotune_select,
    }


# --------------------------------------------------------------------------
# oracle SQL
# --------------------------------------------------------------------------

# shared derivation prelude: events -> turn table -> weighted edge table
_GRAPH_CTE = """
turns AS (
    SELECT event_type AS conv,
           row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS idx,
           CAST(user_id AS VARCHAR) AS actor
    FROM events
),
nodes AS (SELECT DISTINCT actor AS node FROM turns),
pairs AS (
    SELECT a.actor AS src, b.actor AS dst
    FROM turns a JOIN turns b ON a.conv = b.conv AND b.idx = a.idx + 1
    WHERE a.actor <> b.actor
),
edges AS (
    SELECT src, dst, CAST(count(*) AS DOUBLE) AS weight FROM pairs GROUP BY src, dst
)
"""

# tooled variant of _GRAPH_CTE: mirrors events_as_transcripts_tools'
# deterministic fill (tool = 't' || user_id % 7 on event_id % 3 == 0) and
# _actor_key's tool-over-role promotion (pipelines/edges.py)
_GRAPH_TOOL_CTE = """
turns AS (
    SELECT event_type AS conv,
           row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS idx,
           CASE WHEN event_id % 3 = 0
                THEN 'tool:t' || CAST(user_id % 7 AS VARCHAR)
                ELSE 'role:' || CAST(user_id AS VARCHAR) END AS actor
    FROM events
),
nodes AS (SELECT DISTINCT actor AS node FROM turns),
pairs AS (
    SELECT a.actor AS src, b.actor AS dst
    FROM turns a JOIN turns b ON a.conv = b.conv AND b.idx = a.idx + 1
    WHERE a.actor <> b.actor
),
edges AS (
    SELECT src, dst, CAST(count(*) AS DOUBLE) AS weight FROM pairs GROUP BY src, dst
)
"""

_UND_CTE = """
undw AS (
    SELECT src, dst, sum(weight) AS w FROM (
        SELECT src, dst, weight FROM edges
        UNION ALL
        SELECT dst AS src, src AS dst, weight FROM edges
    ) GROUP BY src, dst
)
"""


def _bm25_oracle_sql() -> str:
    """BM25 oracle for the fixed query (spark, window, hash), k1=1.2,
    b=0.75 — every float op in the same order as ``stages/ir.bm25_topk``
    (idf and the per-term quotient parenthesized identically; per-term
    scores added left-to-right in the caller's term order), so the score
    doubles are bit-identical. All numeric literals carry ``e0`` so
    DuckDB parses them as DOUBLE, not DECIMAL."""

    def term_score(t: str, df: str) -> str:
        tf = f"CAST(len(list_filter(arr, x -> x = '{t}')) AS DOUBLE)"
        idf = f"ln(1.0e0 + (s.n - q.{df} + 0.5e0) / (q.{df} + 0.5e0))"
        denom = (
            "1.2e0 * (1.0e0 - 0.75e0 + 0.75e0 * CAST(len(arr) AS DOUBLE) / s.avgdl)"
        )
        return f"{idf} * ({tf} * (1.2e0 + 1.0e0)) / ({tf} + {denom})"

    terms = [("spark", "df1"), ("window", "df2"), ("hash", "df3")]
    score = " + ".join(term_score(t, df) for t, df in terms)
    df_cols = ",\n    ".join(
        f"CAST(sum(CASE WHEN list_contains(arr, '{t}') THEN 1 ELSE 0 END) AS DOUBLE)"
        f" AS {df}"
        for t, df in terms
    )
    return rf"""
WITH d AS (
  SELECT doc_id,
         list_transform(regexp_extract_all(coalesce(text, ''), '\S+'),
                        x -> lower(x)) AS arr
  FROM documents),
stats AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                 CAST(sum(len(arr)) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
          FROM d),
dfq AS (SELECT
    {df_cols}
  FROM d),
scored AS (SELECT d.doc_id,
                  CAST(floor(({score}) * 1000000e0) AS BIGINT) AS score_ppm
           FROM d, stats s, dfq q)
SELECT doc_id, score_ppm FROM scored WHERE score_ppm > 0
ORDER BY score_ppm DESC, doc_id LIMIT 20"""




def _wl_oracle_sql() -> str:
    """Per-round replay of functions/wl.py: uniform u48 init color, u36
    per-element hashes summed over undirected neighbors, re-hash."""
    u48 = ("CAST(CAST(('0x' || substr(md5({expr}), 1, 12)) AS UBIGINT)"
           " AS BIGINT)")
    u36 = ("CAST(CAST(('0x' || substr(md5({expr}), 1, 9)) AS UBIGINT)"
           " AS BIGINT)")
    parts = [
        "c0 AS MATERIALIZED (SELECT node, "
        + u48.format(expr="'wl:init'")
        + " AS c FROM nodes)"
    ]
    for r in range(_WL_ROUNDS):
        parts.append(
            f"h{r} AS MATERIALIZED (SELECT node, "
            + u36.format(expr=f"'wlh:' || CAST(c AS VARCHAR)")
            + f" AS h FROM c{r})"
        )
        parts.append(
            f"""m{r + 1} AS MATERIALIZED (
  SELECT e.dst AS node, CAST(sum(h.h) AS BIGINT) AS m
  FROM undw e JOIN h{r} h ON h.node = e.src GROUP BY 1)"""
        )
        new_c = u48.format(
            expr=(
                "'wlc:' || CAST(c.c AS VARCHAR) || ':' || "
                f"CAST(coalesce(m.m, 0) AS VARCHAR)"
            )
        )
        parts.append(
            f"""c{r + 1} AS MATERIALIZED (
  SELECT c.node, {new_c} AS c
  FROM c{r} c LEFT JOIN m{r + 1} m USING (node))"""
        )
    return (
        f"WITH {_GRAPH_CTE}, {_UND_CTE},\n"
        + ",\n".join(parts)
        + f"\nSELECT node, c AS color FROM c{_WL_ROUNDS} ORDER BY node"
    )


def _mis_oracle_sql() -> str:
    """Per-round replay of functions/mis.py: md5-u48 priorities on dense
    ids, one select + one deactivate layer per round."""
    parts = [
        "ids AS (SELECT node, CAST(dense_rank() OVER (ORDER BY node) - 1"
        " AS BIGINT) AS id FROM nodes)",
        """st0 AS MATERIALIZED (
  SELECT node,
         CAST(CAST(('0x' || substr(md5('mis:' || CAST(id AS VARCHAR)), 1, 12))
              AS UBIGINT) AS BIGINT) AS p,
         0 AS st
  FROM ids)""",
    ]
    for r in range(_MIS_ROUNDS):
        parts.append(
            f"""sel{r} AS MATERIALIZED (
  SELECT s.node FROM st{r} s LEFT JOIN (
      SELECT e.dst AS node, min(s2.p) AS mn
      FROM undw e JOIN st{r} s2 ON s2.node = e.src AND s2.st = 0
      GROUP BY 1) nb USING (node)
  WHERE s.st = 0 AND (nb.mn IS NULL OR s.p < nb.mn))"""
        )
        parts.append(
            f"""inn{r} AS MATERIALIZED (
  SELECT node FROM st{r} WHERE st = 1 UNION SELECT node FROM sel{r})"""
        )
        parts.append(
            f"""cov{r} AS MATERIALIZED (
  SELECT DISTINCT e.dst AS node FROM undw e JOIN inn{r} i ON i.node = e.src)"""
        )
        parts.append(
            f"""st{r + 1} AS MATERIALIZED (
  SELECT s.node, s.p,
         CASE WHEN s.st <> 0 THEN s.st
              WHEN s.node IN (SELECT node FROM sel{r}) THEN 1
              WHEN s.node IN (SELECT node FROM cov{r}) THEN 2
              ELSE 0 END AS st
  FROM st{r} s)"""
        )
    return (
        f"WITH {_GRAPH_CTE}, {_UND_CTE},\n"
        + ",\n".join(parts)
        + f"\nSELECT node, CAST(st AS BIGINT) AS status FROM st{_MIS_ROUNDS}"
        " ORDER BY node"
    )


def oracle_sql() -> dict[str, str]:
    sqls: dict[str, str] = {}

    sqls["edges"] = f"WITH {_GRAPH_CTE} SELECT src, dst, weight FROM edges"
    # distributed-IdMap path must produce the byte-identical table
    sqls["edges_distributed"] = sqls["edges"]

    sqls["degree"] = (
        f"WITH {_GRAPH_CTE} "
        "SELECT n.node AS node, CAST(coalesce(o.wdeg, 0) AS DOUBLE) AS wdeg "
        "FROM nodes n LEFT JOIN (SELECT src AS node, sum(weight) AS wdeg "
        "FROM edges GROUP BY src) o USING(node)"
    )

    sqls["degree_in"] = (
        f"WITH {_GRAPH_CTE} "
        "SELECT n.node AS node, CAST(coalesce(o.indeg, 0) AS BIGINT) AS indeg "
        "FROM nodes n LEFT JOIN (SELECT dst AS node, count(*) AS indeg "
        "FROM edges GROUP BY dst) o USING(node)"
    )

    sqls["degree_distribution"] = f"""
WITH {_GRAPH_CTE},
deg AS (
    SELECT CAST(coalesce(o.d, 0) AS BIGINT) AS d
    FROM nodes n LEFT JOIN (
        SELECT src AS node, count(*) AS d FROM edges GROUP BY src
    ) o USING(node)
)
SELECT CAST(count(*) AS BIGINT) AS n,
       CAST(min(d) AS BIGINT) AS min_value,
       CAST(max(d) AS BIGINT) AS max_value,
       CAST(1000000 * sum(d) // count(*) AS BIGINT) AS mean_ppm,
       CAST(quantile_disc(d, 0.5) AS BIGINT) AS p5,
       CAST(quantile_disc(d, 0.75) AS BIGINT) AS p75,
       CAST(quantile_disc(d, 0.9) AS BIGINT) AS p9,
       CAST(quantile_disc(d, 0.95) AS BIGINT) AS p95,
       CAST(quantile_disc(d, 0.99) AS BIGINT) AS p99,
       CAST(quantile_disc(d, 0.999) AS BIGINT) AS p999
FROM deg
"""

    sqls["median_neighbor"] = (
        f"WITH {_GRAPH_CTE} "
        "SELECT dst AS node, median(CAST(src AS DOUBLE)) AS median_val "
        "FROM edges GROUP BY dst"
    )

    sqls["pagerank"] = f"""
WITH RECURSIVE {_GRAPH_CTE},
outdeg AS (SELECT src AS node, sum(weight) AS wdeg FROM edges GROUP BY src),
fan AS (
    SELECT e.src AS src, e.dst AS dst, e.weight / o.wdeg AS frac, FALSE AS is_self
    FROM edges e JOIN outdeg o ON o.node = e.src
    UNION ALL
    SELECT node, node, 0.0, TRUE FROM nodes
),
pr AS (
    SELECT 0 AS it, node, CAST(0.15 AS DOUBLE) AS rank FROM nodes
    UNION ALL
    SELECT p.it + 1 AS it, f.dst AS node,
           0.15 + 0.85 * sum(CASE WHEN f.is_self THEN 0.0 ELSE p.rank * f.frac END) AS rank
    FROM pr p JOIN fan f ON f.src = p.node
    WHERE p.it < {_PR_ITERS}
    GROUP BY p.it, f.dst
)
SELECT node, round(rank, 6) AS score FROM pr WHERE it = {_PR_ITERS}
"""

    sqls["pagerank_distribution"] = f"""
WITH RECURSIVE {_GRAPH_CTE},
outdeg AS (SELECT src AS node, sum(weight) AS wdeg FROM edges GROUP BY src),
fan AS (
    SELECT e.src AS src, e.dst AS dst, e.weight / o.wdeg AS frac, FALSE AS is_self
    FROM edges e JOIN outdeg o ON o.node = e.src
    UNION ALL
    SELECT node, node, 0.0, TRUE FROM nodes
),
pr AS (
    SELECT 0 AS it, node, CAST(0.15 AS DOUBLE) AS rank FROM nodes
    UNION ALL
    SELECT p.it + 1 AS it, f.dst AS node,
           0.15 + 0.85 * sum(CASE WHEN f.is_self THEN 0.0 ELSE p.rank * f.frac END) AS rank
    FROM pr p JOIN fan f ON f.src = p.node
    WHERE p.it < {_PR_ITERS}
    GROUP BY p.it, f.dst
),
sc AS (SELECT round(rank, 6) AS s FROM pr WHERE it = {_PR_ITERS})
SELECT CAST(count(*) AS BIGINT) AS n,
       CAST(min(s) AS DOUBLE) AS min_value,
       CAST(max(s) AS DOUBLE) AS max_value,
       CAST(quantile_disc(s, 0.5) AS DOUBLE) AS p5,
       CAST(quantile_disc(s, 0.75) AS DOUBLE) AS p75,
       CAST(quantile_disc(s, 0.9) AS DOUBLE) AS p9,
       CAST(quantile_disc(s, 0.95) AS DOUBLE) AS p95,
       CAST(quantile_disc(s, 0.99) AS DOUBLE) AS p99,
       CAST(quantile_disc(s, 0.999) AS DOUBLE) AS p999
FROM sc
"""

    sqls["eigenvector_exact"] = f"""
WITH RECURSIVE {_GRAPH_CTE},
uedges AS (SELECT DISTINCT src, dst FROM edges),
r AS (
    SELECT 0 AS it, node, CAST(1 AS DOUBLE) AS val FROM nodes
    UNION ALL
    SELECT p.it + 1 AS it, e.dst AS node, sum(p.val) AS val
    FROM r p JOIN uedges e ON e.src = p.node
    WHERE p.it < 6
    GROUP BY p.it, e.dst
)
SELECT n.node AS node, CAST(coalesce(k.val, 0) AS BIGINT) AS score
FROM nodes n LEFT JOIN (SELECT node, val FROM r WHERE it = 6) k USING(node)
"""

    sqls["typed_edge_counts"] = """
WITH turns AS (
    SELECT event_type AS conv,
           row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS idx,
           CAST(user_id AS VARCHAR) AS actor
    FROM events
),
tpairs AS (
    SELECT a.conv AS rel_type, a.actor AS src, b.actor AS dst
    FROM turns a JOIN turns b ON a.conv = b.conv AND b.idx = a.idx + 1
    WHERE a.actor <> b.actor
),
tedges AS (
    SELECT rel_type, src, dst, count(*) AS w FROM tpairs GROUP BY 1, 2, 3
)
SELECT rel_type, CAST(count(*) AS BIGINT) AS n_edges,
       CAST(sum(w) AS BIGINT) AS total_weight
FROM tedges GROUP BY rel_type ORDER BY rel_type
"""

    sqls["pagerank_typed"] = f"""
WITH RECURSIVE turns AS (
    SELECT event_type AS conv,
           row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS idx,
           CAST(user_id AS VARCHAR) AS actor
    FROM events
),
nodes AS (SELECT DISTINCT actor AS node FROM turns),
tpairs AS (
    SELECT a.actor AS src, b.actor AS dst
    FROM turns a JOIN turns b ON a.conv = b.conv AND b.idx = a.idx + 1
    WHERE a.actor <> b.actor AND a.conv IN ('click', 'view')
),
sedges AS (
    SELECT src, dst, CAST(count(*) AS DOUBLE) AS weight FROM tpairs GROUP BY src, dst
),
outdeg AS (SELECT src AS node, sum(weight) AS wdeg FROM sedges GROUP BY src),
fan AS (
    SELECT e.src AS src, e.dst AS dst, e.weight / o.wdeg AS frac, FALSE AS is_self
    FROM sedges e JOIN outdeg o ON o.node = e.src
    UNION ALL
    SELECT node, node, 0.0, TRUE FROM nodes
),
pr AS (
    SELECT 0 AS it, node, CAST(0.15 AS DOUBLE) AS rank FROM nodes
    UNION ALL
    SELECT p.it + 1 AS it, f.dst AS node,
           0.15 + 0.85 * sum(CASE WHEN f.is_self THEN 0.0 ELSE p.rank * f.frac END) AS rank
    FROM pr p JOIN fan f ON f.src = p.node
    WHERE p.it < {_PR_ITERS}
    GROUP BY p.it, f.dst
)
SELECT node, round(rank, 6) AS score FROM pr WHERE it = {_PR_ITERS}
"""

    sqls["article_rank"] = f"""
WITH RECURSIVE {_GRAPH_CTE},
outdeg AS (
    SELECT n.node AS node, coalesce(o.wdeg, 0) AS wdeg
    FROM nodes n LEFT JOIN (
        SELECT src AS node, sum(weight) AS wdeg FROM edges GROUP BY src
    ) o USING(node)
),
avgdeg AS (SELECT avg(wdeg) AS a FROM outdeg),
fan AS (
    SELECT e.src AS src, e.dst AS dst,
           e.weight / (o.wdeg + (SELECT a FROM avgdeg)) AS frac,
           FALSE AS is_self
    FROM edges e JOIN outdeg o ON o.node = e.src
    UNION ALL
    SELECT node, node, 0.0, TRUE FROM nodes
),
pr AS (
    SELECT 0 AS it, node, CAST(0.15 AS DOUBLE) AS rank FROM nodes
    UNION ALL
    SELECT p.it + 1 AS it, f.dst AS node,
           0.15 + 0.85 * sum(CASE WHEN f.is_self THEN 0.0 ELSE p.rank * f.frac END) AS rank
    FROM pr p JOIN fan f ON f.src = p.node
    WHERE p.it < {_PR_ITERS}
    GROUP BY p.it, f.dst
)
SELECT node, round(rank, 6) AS score FROM pr WHERE it = {_PR_ITERS}
"""

    sqls["wcc"] = f"""
WITH RECURSIVE {_GRAPH_CTE},
und AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
reach AS (
    SELECT node, node AS lab FROM nodes
    UNION
    SELECT u.dst AS node, r.lab FROM reach r JOIN und u ON u.src = r.node
)
SELECT node, min(lab) AS component FROM reach GROUP BY node
"""

    sqls["wcc_threshold"] = f"""
WITH RECURSIVE {_GRAPH_CTE},
ef AS (SELECT src, dst FROM edges WHERE weight > 2),
und AS (SELECT src, dst FROM ef UNION SELECT dst, src FROM ef),
reach AS (
    SELECT node, node AS lab FROM nodes
    UNION
    SELECT u.dst AS node, r.lab FROM reach r JOIN und u ON u.src = r.node
)
SELECT node, min(lab) AS component FROM reach GROUP BY node
"""

    sqls["articulation_points"] = f"""
WITH RECURSIVE {_GRAPH_CTE},
und AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
base_reach AS (
    SELECT node, node AS lab FROM nodes
    UNION
    SELECT u.dst AS node, r.lab FROM base_reach r JOIN und u ON u.src = r.node
),
base_cnt AS (
    SELECT count(DISTINCT c) AS n FROM (
        SELECT node, min(lab) AS c FROM base_reach GROUP BY node
    )
),
fanu AS (
    SELECT src, dst FROM und
    UNION ALL
    SELECT node, node FROM nodes
),
mr AS (
    SELECT 0 AS it, e.node AS v, n.node, n.node AS lab
    FROM nodes n, nodes e WHERE n.node <> e.node
    UNION ALL
    SELECT p.it + 1 AS it, p.v, f.dst AS node, min(p.lab) AS lab
    FROM mr p JOIN fanu f ON f.src = p.node
    WHERE p.it < 30 AND f.dst <> p.v
    GROUP BY p.it, p.v, f.dst
),
cnt AS (
    SELECT v, count(DISTINCT lab) AS n FROM mr WHERE it = 30 GROUP BY v
)
SELECT c.v AS node,
       CAST(c.n > (SELECT n FROM base_cnt) AS BIGINT) AS is_articulation
FROM cnt c ORDER BY node
"""

    sqls["bridges"] = f"""
WITH RECURSIVE {_GRAPH_CTE},
und AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
-- DuckDB quirk: under WITH RECURSIVE the inner UNION above degrades to
-- UNION ALL, so cand must dedup explicitly
cand AS (SELECT DISTINCT src AS a, dst AS b FROM und WHERE src < dst),
reach AS (
    SELECT c.a, c.b, c.a AS node FROM cand c
    UNION
    SELECT r.a, r.b, u.dst AS node
    FROM reach r JOIN und u ON u.src = r.node
    WHERE NOT (least(u.src, u.dst) = r.a AND greatest(u.src, u.dst) = r.b)
)
SELECT c.a AS src, c.b AS dst,
       CAST(CASE WHEN rr.node IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_bridge
FROM cand c LEFT JOIN reach rr ON rr.a = c.a AND rr.b = c.b AND rr.node = c.b
ORDER BY src, dst
"""

    sqls["component_size_distribution"] = f"""
WITH RECURSIVE {_GRAPH_CTE},
und AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
reach AS (
    SELECT node, node AS lab FROM nodes
    UNION
    SELECT u.dst AS node, r.lab FROM reach r JOIN und u ON u.src = r.node
),
comp AS (SELECT node, min(lab) AS component FROM reach GROUP BY node),
sz AS (SELECT CAST(count(*) AS BIGINT) AS s FROM comp GROUP BY component)
SELECT CAST(count(*) AS BIGINT) AS n,
       CAST(min(s) AS BIGINT) AS min_value,
       CAST(max(s) AS BIGINT) AS max_value,
       CAST(1000000 * sum(s) // count(*) AS BIGINT) AS mean_ppm,
       CAST(quantile_disc(s, 0.5) AS BIGINT) AS p5,
       CAST(quantile_disc(s, 0.75) AS BIGINT) AS p75,
       CAST(quantile_disc(s, 0.9) AS BIGINT) AS p9,
       CAST(quantile_disc(s, 0.95) AS BIGINT) AS p95,
       CAST(quantile_disc(s, 0.99) AS BIGINT) AS p99,
       CAST(quantile_disc(s, 0.999) AS BIGINT) AS p999
FROM sz
"""

    sqls["label_propagation"] = f"""
WITH RECURSIVE {_GRAPH_CTE},
{_UND_CTE},
fanlp AS (
    SELECT src, dst, w FROM undw
    UNION ALL
    SELECT node AS src, node AS dst, 0.0 AS w FROM nodes
),
lp AS (
    SELECT 0 AS it, node, node AS label FROM nodes
    UNION ALL
    SELECT it, dst AS node, label FROM (
        SELECT p.it + 1 AS it, f.dst AS dst, p.label AS label, sum(f.w) AS wsum,
               row_number() OVER (
                   PARTITION BY p.it, f.dst
                   ORDER BY sum(f.w) DESC, p.label ASC
               ) AS rn
        FROM lp p JOIN fanlp f ON f.src = p.node
        WHERE p.it < {_LP_ROUNDS}
        GROUP BY p.it, f.dst, p.label
    ) WHERE rn = 1
)
SELECT node, label FROM lp WHERE it = {_LP_ROUNDS}
"""

    tri_cte = f"""
WITH {_GRAPH_CTE},
fwd AS (
    SELECT DISTINCT
        CASE WHEN src < dst THEN src ELSE dst END AS a,
        CASE WHEN src < dst THEN dst ELSE src END AS b
    FROM edges
),
tri AS (
    SELECT e1.a AS x, e1.b AS y, e3.b AS z
    FROM fwd e1
    JOIN fwd e2 ON e2.a = e1.b
    JOIN fwd e3 ON e3.a = e1.a AND e3.b = e2.b
),
corners AS (
    SELECT x AS node FROM tri
    UNION ALL SELECT y FROM tri
    UNION ALL SELECT z FROM tri
),
cnt AS (SELECT node, count(*) AS c FROM corners GROUP BY node)
"""
    sqls["triangles"] = (
        tri_cte
        + "SELECT n.node AS node, CAST(coalesce(c.c, 0) AS BIGINT) AS triangles "
        "FROM nodes n LEFT JOIN cnt c USING(node)"
    )
    sqls["triangles_global"] = tri_cte + "SELECT CAST(count(*) AS BIGINT) AS triangles FROM tri"
    sqls["triangle_stream"] = (
        tri_cte + "SELECT x AS a, y AS b, z AS c FROM tri ORDER BY 1, 2, 3"
    )

    _kge_cte = """
WITH r AS (SELECT CAST(embedding AS DOUBLE[]) AS e FROM embeddings WHERE vec_id = 0),
q AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS h,
      list_transform(list_zip(CAST(embedding AS DOUBLE[]), (SELECT e FROM r)), x -> x[1] + 0.1*x[2]) AS hr
      FROM embeddings WHERE vec_id < 10),
c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS target_id, {expr} AS sim
  FROM q CROSS JOIN c, r WHERE q.vec_id <> c.vec_id
),
ranked AS (SELECT query_id, target_id, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, target_id ASC) AS rank FROM scored)
SELECT query_id, target_id, CAST(rank AS BIGINT) AS rank FROM ranked WHERE rank <= 5 ORDER BY query_id, rank
"""
    sqls["kge_transe_topk"] = _kge_cte.format(
        expr="round(1.0/(1.0 + list_distance(q.hr, c.e)), 6)"
    )
    sqls["kge_distmult_topk"] = _kge_cte.format(
        expr="round(list_sum(list_transform(list_zip(q.h, r.e, c.e),"
             " x -> (x[1] * (0.1 * x[2])) * x[3])), 6)"
    )

    # three planted depth-2 trees (thresholds all 0.0 → exact float
    # comparison on both sides), majority vote
    _rf_votes = " + ".join(
        f"(CASE WHEN e[{t + 1}] <= 0.0 THEN"
        f" (CASE WHEN e[{t + 2}] <= 0.0 THEN 0 ELSE 1 END)"
        f" ELSE 1 END)"
        for t in range(3)
    )
    sqls["rf_score"] = f"""
WITH x AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
SELECT vec_id, CAST(CASE WHEN ({_rf_votes}) >= 2 THEN 1 ELSE 0 END AS BIGINT)
       AS predicted
FROM x ORDER BY vec_id
"""

    sqls["mlp_score"] = """
WITH x AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         unnest(CAST(embedding AS DOUBLE[])) AS v
  FROM embeddings
),
h AS (
  SELECT x.vec_id, j.j,
         greatest(0.0, sum(x.v * ((((CAST(x.i - 1 AS BIGINT) * 3 + j.j * 5) % 11) - 5) / 10.0))) AS hv
  FROM x CROSS JOIN (SELECT unnest([0,1,2,3]) AS j) j
  GROUP BY x.vec_id, j.j
),
z AS (
  SELECT vec_id,
         sum(hv * (((j * 7 + 0 * 3) % 9) - 4) / 10.0) AS z0,
         sum(hv * (((j * 7 + 1 * 3) % 9) - 4) / 10.0) AS z1
  FROM h GROUP BY vec_id
)
SELECT vec_id, CAST(CASE WHEN z1 > z0 THEN 1 ELSE 0 END AS BIGINT) AS predicted
FROM z ORDER BY vec_id
"""

    sqls["node_classification_rf"] = (
        "SELECT CAST((SELECT count(*) FROM embeddings) AS BIGINT) AS n_rows, "
        "CAST(0 AS BIGINT) AS bad_labels, CAST(1 AS BIGINT) AS det_ok"
    )
    sqls["node_regression_rf"] = (
        "SELECT CAST((SELECT count(*) FROM embeddings) AS BIGINT) AS n_rows, "
        "CAST(1 AS BIGINT) AS fit_ok, CAST(1 AS BIGINT) AS det_ok"
    )
    sqls["autotune_select"] = (
        "SELECT CAST(3 AS BIGINT) AS n_cands, CAST(1 AS BIGINT) AS det_ok, "
        "CAST(1 AS BIGINT) AS monotone_ok"
    )

    sqls["lcc"] = f"""
WITH {_GRAPH_CTE},
{_UND_CTE},
fwd AS (
    SELECT DISTINCT
        CASE WHEN src < dst THEN src ELSE dst END AS a,
        CASE WHEN src < dst THEN dst ELSE src END AS b
    FROM edges
),
tri AS (
    SELECT e1.a AS x, e1.b AS y, e3.b AS z
    FROM fwd e1
    JOIN fwd e2 ON e2.a = e1.b
    JOIN fwd e3 ON e3.a = e1.a AND e3.b = e2.b
),
corners AS (
    SELECT x AS node FROM tri
    UNION ALL SELECT y FROM tri
    UNION ALL SELECT z FROM tri
),
cnt AS (SELECT node, count(*) AS c FROM corners GROUP BY node),
udeg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS d FROM undw GROUP BY src)
SELECT n.node AS node,
       CAST(CASE WHEN coalesce(u.d, 0) >= 2
            THEN (2000000 * coalesce(c.c, 0)) // (u.d * (u.d - 1)) ELSE 0 END AS BIGINT) AS lcc_ppm
FROM nodes n LEFT JOIN cnt c USING(node) LEFT JOIN udeg u USING(node)
"""

    sqls["sssp"] = f"""
WITH RECURSIVE {_GRAPH_CTE},
fan AS (
    SELECT src, dst, weight AS w FROM edges
    UNION ALL
    SELECT node, node, 0.0 FROM nodes
),
dist AS (
    SELECT 0 AS it, (SELECT min(node) FROM nodes) AS node, CAST(0 AS DOUBLE) AS d
    UNION ALL
    SELECT p.it + 1 AS it, f.dst AS node, min(p.d + f.w) AS d
    FROM dist p JOIN fan f ON f.src = p.node
    WHERE p.it < {_SSSP_ROUNDS}
    GROUP BY p.it, f.dst
)
SELECT node, d AS distance FROM dist WHERE it = {_SSSP_ROUNDS}
"""

    sqls["all_shortest_paths"] = f"""
WITH RECURSIVE {_GRAPH_CTE},
srcs AS (SELECT node FROM nodes ORDER BY node LIMIT {_APSP_SOURCES}),
fan AS (
    SELECT src, dst, 1.0 AS w FROM edges
    UNION ALL
    SELECT node, node, 0.0 FROM nodes
),
dist AS (
    SELECT 0 AS it, node AS source, node AS target, CAST(0 AS DOUBLE) AS d FROM srcs
    UNION ALL
    SELECT p.it + 1 AS it, p.source AS source, f.dst AS target, min(p.d + f.w) AS d
    FROM dist p JOIN fan f ON f.src = p.target
    WHERE p.it < {_SSSP_ROUNDS}
    GROUP BY p.it, p.source, f.dst
)
SELECT source, target, d AS distance FROM dist WHERE it = {_SSSP_ROUNDS}
"""

    sqls["hop_distribution"] = f"""
WITH RECURSIVE {_GRAPH_CTE},
srcs AS (SELECT node FROM nodes ORDER BY node LIMIT {_APSP_SOURCES}),
fan AS (
    SELECT src, dst, 1.0 AS w FROM edges
    UNION ALL
    SELECT node, node, 0.0 FROM nodes
),
dist AS (
    SELECT 0 AS it, node AS source, node AS target, CAST(0 AS DOUBLE) AS d FROM srcs
    UNION ALL
    SELECT p.it + 1 AS it, p.source AS source, f.dst AS target, min(p.d + f.w) AS d
    FROM dist p JOIN fan f ON f.src = p.target
    WHERE p.it < {_SSSP_ROUNDS}
    GROUP BY p.it, p.source, f.dst
),
hd AS (SELECT CAST(d AS BIGINT) AS h FROM dist WHERE it = {_SSSP_ROUNDS})
SELECT CAST(count(*) AS BIGINT) AS n,
       CAST(min(h) AS BIGINT) AS min_value,
       CAST(max(h) AS BIGINT) AS max_value,
       CAST(1000000 * sum(h) // count(*) AS BIGINT) AS mean_ppm,
       CAST(quantile_disc(h, 0.5) AS BIGINT) AS p5,
       CAST(quantile_disc(h, 0.75) AS BIGINT) AS p75,
       CAST(quantile_disc(h, 0.9) AS BIGINT) AS p9,
       CAST(quantile_disc(h, 0.95) AS BIGINT) AS p95,
       CAST(quantile_disc(h, 0.99) AS BIGINT) AS p99,
       CAST(quantile_disc(h, 0.999) AS BIGINT) AS p999
FROM hd
"""

    sqls["apsp_weighted"] = f"""
WITH RECURSIVE {_GRAPH_CTE},
srcs AS (SELECT node FROM nodes ORDER BY node LIMIT {_APSP_SOURCES}),
fan AS (
    SELECT src, dst, weight AS w FROM edges
    UNION ALL
    SELECT node, node, 0.0 FROM nodes
),
dist AS (
    SELECT 0 AS it, node AS source, node AS target, CAST(0 AS DOUBLE) AS d FROM srcs
    UNION ALL
    SELECT p.it + 1 AS it, p.source AS source, f.dst AS target, min(p.d + f.w) AS d
    FROM dist p JOIN fan f ON f.src = p.target
    WHERE p.it < {_SSSP_ROUNDS}
    GROUP BY p.it, p.source, f.dst
)
SELECT source, target, d AS distance FROM dist WHERE it = {_SSSP_ROUNDS}
"""

    sqls["bfs"] = f"""
WITH RECURSIVE {_GRAPH_CTE},
fan AS (
    SELECT src, dst, 1.0 AS w FROM edges
    UNION ALL
    SELECT node, node, 0.0 FROM nodes
),
dist AS (
    SELECT 0 AS it, (SELECT min(node) FROM nodes) AS node, CAST(0 AS DOUBLE) AS d
    UNION ALL
    SELECT p.it + 1 AS it, f.dst AS node, min(p.d + f.w) AS d
    FROM dist p JOIN fan f ON f.src = p.node
    WHERE p.it < {_SSSP_ROUNDS}
    GROUP BY p.it, f.dst
)
SELECT node, d AS depth FROM dist WHERE it = {_SSSP_ROUNDS}
"""

    sqls["k_core"] = f"""
WITH RECURSIVE {_GRAPH_CTE},
{_UND_CTE},
fank AS (
    SELECT src, dst, FALSE AS is_self FROM undw
    UNION ALL
    SELECT node, node, TRUE FROM nodes
),
alive AS (
    SELECT 0 AS it, node FROM nodes
    UNION ALL
    SELECT it, node FROM (
        SELECT p.it + 1 AS it, f.dst AS node,
               sum(CASE WHEN f.is_self THEN 0 ELSE 1 END) AS d,
               max(CASE WHEN f.is_self THEN 1 ELSE 0 END) AS was_alive
        FROM alive p JOIN fank f ON f.src = p.node
        WHERE p.it < {_KCORE_ROUNDS}
        GROUP BY p.it, f.dst
    ) WHERE was_alive = 1 AND d >= {_KCORE_K}
)
SELECT n.node AS node,
       CAST(CASE WHEN a.node IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS in_core
FROM nodes n LEFT JOIN (SELECT node FROM alive WHERE it = {_KCORE_ROUNDS}) a USING(node)
"""

    sqls["node_similarity"] = f"""
WITH {_GRAPH_CTE},
{_UND_CTE},
deg AS (SELECT src AS node, count(*) AS d FROM undw GROUP BY src),
common AS (
    SELECT a.src AS node_a, b.src AS node_b, count(*) AS c
    FROM undw a JOIN undw b ON a.dst = b.dst AND a.src < b.src
    GROUP BY a.src, b.src
)
SELECT node_a, node_b,
       CAST((1000000 * c) // (da.d + db.d - c) AS BIGINT) AS sim_ppm
FROM common
JOIN deg da ON da.node = node_a
JOIN deg db ON db.node = node_b
ORDER BY node_a, node_b
"""

    sqls["hits"] = f"""
WITH RECURSIVE {_GRAPH_CTE},
adj AS (SELECT DISTINCT src, dst FROM edges),
fanf AS (
    SELECT src, dst, FALSE AS is_self FROM adj
    UNION ALL SELECT node, node, TRUE FROM nodes
),
fanr AS (
    SELECT dst AS src, src AS dst, FALSE AS is_self FROM adj
    UNION ALL SELECT node, node, TRUE FROM nodes
),
st AS (
    SELECT 0 AS it, node, CAST(1 AS DOUBLE) AS hub FROM nodes
    UNION ALL
    SELECT it, node, hub FROM (
        SELECT a.it AS it, fr.dst AS node,
               sum(CASE WHEN fr.is_self THEN 0 ELSE a.auth END) AS hub
        FROM (
            SELECT p.it + 1 AS it, ff.dst AS node,
                   sum(CASE WHEN ff.is_self THEN 0 ELSE p.hub END) AS auth
            FROM st p JOIN fanf ff ON ff.src = p.node
            WHERE p.it < {_HITS_ITERS}
            GROUP BY p.it, ff.dst
        ) a JOIN fanr fr ON fr.src = a.node
        GROUP BY a.it, fr.dst
    )
),
final_hub AS (SELECT node, hub FROM st WHERE it = {_HITS_ITERS}),
prev_hub AS (SELECT node, hub FROM st WHERE it = {_HITS_ITERS} - 1),
final_auth AS (
    SELECT ff.dst AS node, sum(CASE WHEN ff.is_self THEN 0 ELSE p.hub END) AS auth
    FROM prev_hub p JOIN fanf ff ON ff.src = p.node
    GROUP BY ff.dst
)
SELECT h.node AS node, h.hub AS hub, a.auth AS auth
FROM final_hub h JOIN final_auth a USING(node)
"""

    sqls["shortest_path_route"] = f"""
WITH RECURSIVE {_GRAPH_CTE},
fan AS (
    SELECT src, dst, weight AS w FROM edges
    UNION ALL
    SELECT node, node, 0.0 FROM nodes
),
dist AS (
    SELECT 0 AS it, (SELECT min(node) FROM nodes) AS node, CAST(0 AS DOUBLE) AS d
    UNION ALL
    SELECT p.it + 1 AS it, f.dst AS node, min(p.d + f.w) AS d
    FROM dist p JOIN fan f ON f.src = p.node
    WHERE p.it < {_SSSP_ROUNDS}
    GROUP BY p.it, f.dst
),
dmin AS (SELECT node, d FROM dist WHERE it = {_SSSP_ROUNDS}),
pred AS (
    SELECT e.dst AS v, min(e.src) AS p
    FROM edges e
    JOIN dmin du ON du.node = e.src
    JOIN dmin dv ON dv.node = e.dst
    WHERE du.d + e.weight = dv.d
    GROUP BY e.dst
),
walk AS (
    SELECT (SELECT max(node) FROM nodes) AS v, 0 AS i
    UNION ALL
    SELECT p.p, w.i + 1 FROM walk w JOIN pred p ON p.v = w.v
    WHERE w.v <> (SELECT min(node) FROM nodes) AND w.i < 100000
)
SELECT CAST((SELECT max(i) FROM walk) - i AS BIGINT) AS position,
       v AS node, d.d AS distance
FROM walk JOIN dmin d ON d.node = walk.v
ORDER BY position
"""

    # dijkstra_route: identical contract to shortest_path_route
    sqls["dijkstra_route"] = sqls["shortest_path_route"]

    sqls["scc"] = f"""
WITH RECURSIVE {_GRAPH_CTE},
adj AS (SELECT DISTINCT src, dst FROM edges),
fwd AS (
    SELECT node AS s, node AS v FROM nodes
    UNION
    SELECT f.s, a.dst AS v FROM fwd f JOIN adj a ON a.src = f.v
)
SELECT v1.s AS node, min(v1.v) AS component
FROM fwd v1 JOIN fwd v2 ON v2.s = v1.v AND v2.v = v1.s
GROUP BY v1.s
"""

    sqls["closeness"] = f"""
WITH RECURSIVE {_GRAPH_CTE},
und AS (
    SELECT DISTINCT src, dst FROM (
        SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges
    )
),
r AS (
    SELECT node AS s, node AS v, 0 AS d FROM nodes
    UNION
    SELECT r.s, u.dst AS v, r.d + 1 FROM r JOIN und u ON u.src = r.v WHERE r.d < 20
),
dm AS (SELECT s, v, min(d) AS d FROM r GROUP BY s, v),
agg AS (
    SELECT s, count(*) - 1 AS reached, sum(d) AS sumd,
           sum(CASE WHEN d > 0 THEN 1000000 // d ELSE 0 END) AS harm
    FROM dm GROUP BY s
)
SELECT s AS node,
       CAST(CASE WHEN sumd > 0 THEN (1000000 * reached) // sumd ELSE 0 END AS BIGINT)
           AS closeness_ppm,
       CAST(harm AS BIGINT) AS harmonic_ppm,
       CAST(reached AS BIGINT) AS reached
FROM agg ORDER BY node
"""

    sqls["closeness_wf"] = f"""
WITH RECURSIVE {_GRAPH_CTE},
und AS (
    SELECT DISTINCT src, dst FROM (
        SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges
    )
),
r AS (
    SELECT node AS s, node AS v, 0 AS d FROM nodes
    UNION
    SELECT r.s, u.dst AS v, r.d + 1 FROM r JOIN und u ON u.src = r.v WHERE r.d < 20
),
dm AS (SELECT s, v, min(d) AS d FROM r GROUP BY s, v),
agg AS (
    SELECT s, count(*) - 1 AS reached, sum(d) AS sumd FROM dm GROUP BY s
)
SELECT s AS node,
       CAST(CASE WHEN sumd > 0
            THEN (1000000 * reached * reached)
                 // (sumd * ((SELECT count(*) FROM nodes) - 1))
            ELSE 0 END AS BIGINT) AS closeness_wf_ppm
FROM agg ORDER BY node
"""

    sqls["modularity"] = f"""
WITH {_GRAPH_CTE},
{_UND_CTE},
lab AS (SELECT node, CAST(node AS BIGINT) % 5 AS community FROM nodes),
es AS (
    SELECT la.community AS c,
           CASE WHEN la.community = lb.community THEN 1 ELSE 0 END AS same,
           sum(u.w) AS w
    FROM undw u
    JOIN lab la ON la.node = u.src
    JOIN lab lb ON lb.node = u.dst
    GROUP BY 1, 2
),
tot AS (SELECT sum(w) AS m2 FROM es),
per_c AS (
    SELECT c, sum(CASE WHEN same = 1 THEN w ELSE 0 END) AS l_in, sum(w) AS d_c
    FROM es GROUP BY c
)
SELECT round(sum(l_in / m2 - (d_c / m2) * (d_c / m2)), 6) AS modularity
FROM per_c, tot
"""

    sqls["conductance"] = f"""
WITH {_GRAPH_CTE},
{_UND_CTE},
lab AS (SELECT node, CAST(node AS BIGINT) % 5 AS community FROM nodes),
es AS (
    SELECT la.community AS c,
           CASE WHEN la.community = lb.community THEN 1 ELSE 0 END AS same,
           sum(u.w) AS w
    FROM undw u
    JOIN lab la ON la.node = u.src
    JOIN lab lb ON lb.node = u.dst
    GROUP BY 1, 2
),
tot AS (SELECT sum(w) AS total FROM es),
per_c AS (
    SELECT c, sum(CASE WHEN same = 0 THEN w ELSE 0 END) AS boundary, sum(w) AS vol
    FROM es GROUP BY c
)
SELECT CAST(c AS BIGINT) AS community,
       CAST(CASE WHEN least(vol, total - vol) > 0
            THEN CAST(1000000 * boundary AS BIGINT) // CAST(least(vol, total - vol) AS BIGINT)
            ELSE 0 END AS BIGINT) AS conductance_ppm
FROM per_c, tot ORDER BY community
"""

    sqls["kmeans_assign"] = """
WITH c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS e FROM embeddings WHERE vec_id < 8),
v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
SELECT vec_id, CAST(cid AS BIGINT) AS cluster FROM (
    SELECT v.vec_id, c.cid,
           row_number() OVER (
               PARTITION BY v.vec_id ORDER BY list_distance(v.e, c.e) ASC, c.cid ASC
           ) AS rn
    FROM v CROSS JOIN c
) WHERE rn = 1 ORDER BY vec_id
"""

    sqls["collapse_path"] = f"""
WITH {_GRAPH_CTE}
SELECT e1.src AS src, e2.dst AS dst, CAST(count(*) AS DOUBLE) AS paths
FROM edges e1 JOIN edges e2 ON e1.dst = e2.src
WHERE e1.src <> e2.dst
GROUP BY e1.src, e2.dst
"""

    sqls["dedup_exact"] = (
        "SELECT min(doc_id) AS doc_id FROM documents GROUP BY text ORDER BY doc_id"
    )

    sqls["fingerprint"] = "SELECT doc_id, md5(text) AS fp FROM documents ORDER BY doc_id"

    # backward as-of join via the portable union + window formulation
    # (equivalent to DuckDB's native ASOF JOIN on this data; spelled out
    # so the right-side tie order — max event_id at equal ts — is explicit)
    sqls["asof_join"] = """
WITH l AS (SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase'),
     r AS (SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'click'),
u AS (
  SELECT user_id, ts, 1 AS side, event_id AS l_eid, value AS l_val,
         NULL::BIGINT AS r_eid, NULL::DOUBLE AS r_val FROM l
  UNION ALL
  SELECT user_id, ts, 0, NULL, NULL, event_id, value FROM r
),
w AS (
  SELECT *,
    LAST_VALUE(r_eid IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, side, r_eid
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m_eid,
    LAST_VALUE(r_val IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, side, r_eid
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m_val
  FROM u
)
SELECT user_id, epoch_us(ts) AS ts_us, l_eid AS event_id, l_val AS value,
       m_eid AS r_event_id, m_val AS r_value
FROM w WHERE side = 1 AND m_eid IS NOT NULL
ORDER BY event_id
"""

    # sliding-window features (1h window / 15min slide over clicks)
    # backfilled onto purchases: each purchase matched to the latest
    # CLOSED window (visible at window_start + 1h) at-or-before it
    sqls["feature_backfill"] = """
WITH clicks AS (
  SELECT user_id, epoch_us(ts) AS tu, value FROM events
  WHERE event_type = 'click'
),
exp AS (
  SELECT user_id, (tu // 900000000) * 900000000 - i * 900000000 AS ws, value
  FROM clicks, generate_series(0, 3) AS t(i)
),
feats AS (
  SELECT user_id, ws, count(*) AS n, sum(value) AS vs
  FROM exp GROUP BY 1, 2
),
fv AS (SELECT user_id, ws + 3600000000 AS vis, ws, n, vs FROM feats),
pur AS (
  SELECT user_id, event_id, value, epoch_us(ts) AS tu FROM events
  WHERE event_type = 'purchase'
)
SELECT p.user_id, p.event_id, p.value,
       f.ws AS f_window_start, CAST(f.n AS BIGINT) AS f_n,
       round(f.vs, 6) AS f_value_sum
FROM pur p ASOF JOIN fv f ON p.user_id = f.user_id AND f.vis <= p.tu
ORDER BY event_id
"""

    # banded interval join: left join keeps zero-click purchases
    sqls["range_join"] = """
SELECT l.user_id, l.event_id, l.value,
       CAST(count(r.event_id) AS BIGINT) AS n_in_range,
       coalesce(round(sum(r.value), 6), 0.0) AS sum_in_range
FROM (SELECT * FROM events WHERE event_type = 'purchase') l
LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') r
  ON l.user_id = r.user_id
 AND r.ts BETWEEN l.ts - INTERVAL 1 HOUR AND l.ts + INTERVAL 1 HOUR
GROUP BY 1, 2, 3 ORDER BY l.event_id
"""

    # exact word-3-gram Jaccard similarity join: shingles as strings on
    # both sides (no hashing), jaccard = |A∩B| / (|A|+|B|-|A∩B|)
    sqls["ngram_jaccard"] = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(coalesce(text, ''), '\s+'),
                     x -> x <> '') AS arr
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] AS s
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(arr)-2)) AS i) g
  WHERE len(arr) >= 3
  UNION
  SELECT doc_id, array_to_string(arr, ' ') AS s
  FROM toks WHERE len(arr) BETWEEN 1 AND 2
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b,
       round(CAST(i.c AS DOUBLE) / (sa.n + sb.n - i.c), 6) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE CAST(i.c AS DOUBLE) / (sa.n + sb.n - i.c) >= 0.7
ORDER BY doc_a, doc_b
"""

    sqls["hll_registers"] = r"""
WITH h AS (
  SELECT CAST(('0x' || substr(md5(coalesce(text, '')), 1, 8)) AS UBIGINT)
         AS h32
  FROM documents
),
bw AS (SELECT h32 // 16777216 AS register, h32 % 16777216 AS w FROM h),
r AS (
  SELECT register,
         max(CASE WHEN w = 0 THEN 25
             ELSE 25 - (CAST(floor(log2(CAST(w AS DOUBLE))) AS BIGINT) + 1)
             END) AS rho
  FROM bw GROUP BY 1
),
regs AS (SELECT unnest(generate_series(0, 255)) AS register)
SELECT CAST(regs.register AS BIGINT) AS register,
       CAST(coalesce(r.rho, 0) AS BIGINT) AS rho
FROM regs LEFT JOIN r USING (register)
ORDER BY register
"""

    sqls["edges_tooled"] = (
        f"WITH {_GRAPH_TOOL_CTE} SELECT src, dst, weight FROM edges"
    )

    sqls["pagerank_tooled"] = f"""
WITH RECURSIVE {_GRAPH_TOOL_CTE},
outdeg AS (SELECT src AS node, sum(weight) AS wdeg FROM edges GROUP BY src),
fan AS (
    SELECT e.src AS src, e.dst AS dst, e.weight / o.wdeg AS frac, FALSE AS is_self
    FROM edges e JOIN outdeg o ON o.node = e.src
    UNION ALL
    SELECT node, node, 0.0, TRUE FROM nodes
),
pr AS (
    SELECT 0 AS it, node, CAST(0.15 AS DOUBLE) AS rank FROM nodes
    UNION ALL
    SELECT p.it + 1 AS it, f.dst AS node,
           0.15 + 0.85 * sum(CASE WHEN f.is_self THEN 0.0 ELSE p.rank * f.frac END) AS rank
    FROM pr p JOIN fan f ON f.src = p.node
    WHERE p.it < {_PR_ITERS}
    GROUP BY p.it, f.dst
)
SELECT node, round(rank, 6) AS score FROM pr WHERE it = {_PR_ITERS}
"""

    sqls["tool_usage"] = """
SELECT 't' || CAST(user_id % 7 AS VARCHAR) AS tool,
       CAST(count(*) AS BIGINT) AS n_turns,
       CAST(count(DISTINCT event_type) AS BIGINT) AS n_convs
FROM events WHERE event_id % 3 = 0
GROUP BY 1 ORDER BY 1
"""

    sqls["hll_by_source"] = r"""
WITH h AS (
  SELECT source,
         CAST(('0x' || substr(md5(coalesce(text, '')), 1, 8)) AS UBIGINT)
         AS h32
  FROM documents
),
bw AS (SELECT source, h32 // 16777216 AS register, h32 % 16777216 AS w FROM h)
SELECT source,
       CAST(register AS BIGINT) AS register,
       CAST(max(CASE WHEN w = 0 THEN 25
                ELSE 25 - (CAST(floor(log2(CAST(w AS DOUBLE))) AS BIGINT) + 1)
                END) AS BIGINT) AS rho
FROM bw GROUP BY source, register
HAVING max(CASE WHEN w = 0 THEN 25
           ELSE 25 - (CAST(floor(log2(CAST(w AS DOUBLE))) AS BIGINT) + 1)
           END) > 0
ORDER BY source, register
"""

    sqls["cms_registers"] = r"""
WITH toks AS (
  SELECT unnest(list_filter(string_split_regex(coalesce(text, ''), '\s+'),
                x -> x <> '')) AS tok
  FROM documents
),
rows_ AS (SELECT unnest(generate_series(0, 3)) AS hrow),
h AS (
  SELECT hrow,
         CAST(('0x' || substr(md5(tok || ':cms' || CAST(hrow AS VARCHAR)),
               1, 8)) AS UBIGINT) % 512 AS col
  FROM toks CROSS JOIN rows_
),
c AS (SELECT hrow, col, count(*) AS cnt FROM h GROUP BY 1, 2),
base AS (
  SELECT r.hrow, u.col
  FROM rows_ r CROSS JOIN (SELECT unnest(generate_series(0, 511)) AS col) u
)
SELECT CAST(base.hrow AS BIGINT) AS hrow, CAST(base.col AS BIGINT) AS col,
       CAST(coalesce(c.cnt, 0) AS BIGINT) AS cnt
FROM base LEFT JOIN c ON c.hrow = base.hrow AND c.col = base.col
ORDER BY hrow, col
"""

    sqls["cms_heavy_hitters"] = r"""
WITH toks AS (
  SELECT unnest(list_filter(string_split_regex(coalesce(text, ''), '\s+'),
                x -> x <> '')) AS tok
  FROM documents
),
rows_ AS (SELECT unnest(generate_series(0, 3)) AS hrow),
h AS (
  SELECT hrow,
         CAST(('0x' || substr(md5(tok || ':cms' || CAST(hrow AS VARCHAR)),
               1, 8)) AS UBIGINT) % 512 AS col
  FROM toks CROSS JOIN rows_
),
c AS (SELECT hrow, col, count(*) AS cnt FROM h GROUP BY 1, 2),
total AS (SELECT count(*) AS n FROM toks),
dt AS (SELECT DISTINCT tok FROM toks),
dh AS (
  SELECT dt.tok, rows_.hrow,
         CAST(('0x' || substr(md5(dt.tok || ':cms' ||
               CAST(rows_.hrow AS VARCHAR)), 1, 8)) AS UBIGINT) % 512 AS col
  FROM dt CROSS JOIN rows_
),
est AS (
  SELECT dh.tok, min(c.cnt) AS est
  FROM dh JOIN c ON c.hrow = dh.hrow AND c.col = dh.col
  GROUP BY dh.tok
)
SELECT est.tok AS token, CAST(est.est AS BIGINT) AS est
FROM est, total
WHERE est.est >= (total.n * 10000) // 1000000
ORDER BY token
"""

    sqls["weighted_sample"] = r"""
WITH mw AS (SELECT max(n_chars) AS m FROM documents)
SELECT doc_id,
       CAST(
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':ws'), 1, 8))
              AS UBIGINT)
         < (2 * n_chars * 4294967296) // (5 * mw.m)
         AS BIGINT) AS kept
FROM documents, mw
ORDER BY doc_id
"""

    sqls["dedup_clusters"] = r"""
WITH RECURSIVE toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(coalesce(text, ''), '\s+'),
                     x -> x <> '') AS arr
  FROM documents
),
sh0 AS (
  SELECT DISTINCT doc_id, arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] AS s
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(arr)-2)) AS i) g
  WHERE len(arr) >= 3
  UNION
  SELECT doc_id, array_to_string(arr, ' ') AS s
  FROM toks WHERE len(arr) BETWEEN 1 AND 2
),
-- DuckDB quirk: under WITH RECURSIVE a non-recursive CTE's inner UNION
-- degrades to UNION ALL, so dedup explicitly before counting
sh AS (SELECT DISTINCT doc_id, s FROM sh0),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT i.doc_a, i.doc_b
  FROM inter i
  JOIN sizes sa ON sa.doc_id = i.doc_a
  JOIN sizes sb ON sb.doc_id = i.doc_b
  WHERE CAST(i.c AS DOUBLE) / (sa.n + sb.n - i.c) >= 0.5
),
und AS (
  SELECT doc_a AS s, doc_b AS d FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
),
reach AS (
  SELECT doc_id AS node, doc_id AS lab FROM documents
  UNION
  SELECT u.d AS node, r.lab FROM reach r JOIN und u ON u.s = r.node
),
comp AS (SELECT node AS doc_id, min(lab) AS cluster FROM reach GROUP BY node)
SELECT doc_id, cluster,
       CAST(doc_id = cluster AS BIGINT) AS is_keeper
FROM comp ORDER BY doc_id
"""

    sqls["duplicate_spans"] = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(coalesce(text, ''), '\s+'),
                     x -> x <> '') AS arr
  FROM documents
),
sp AS (
  SELECT DISTINCT doc_id, array_to_string(arr[i:i+7], ' ') AS s
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(arr)-7)) AS i) g
  WHERE len(arr) >= 8
),
nsp AS (SELECT doc_id, count(*) AS n_spans FROM sp GROUP BY 1),
dup AS (SELECT s FROM sp GROUP BY s HAVING count(*) >= 2),
dcnt AS (
  SELECT sp.doc_id, count(*) AS dup_spans
  FROM sp JOIN dup USING (s) GROUP BY 1
)
SELECT d.doc_id,
       CAST(coalesce(n.n_spans, 0) AS BIGINT) AS n_spans,
       CAST(coalesce(c.dup_spans, 0) AS BIGINT) AS dup_spans,
       CAST(coalesce(c.dup_spans, 0) >= 1 AS BIGINT) AS dup_flag
FROM documents d
LEFT JOIN nsp n USING (doc_id)
LEFT JOIN dcnt c USING (doc_id)
ORDER BY d.doc_id
"""

    sqls["decontaminate"] = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(coalesce(text, ''), '\s+'),
                     x -> x <> '') AS arr
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] AS s
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(arr)-2)) AS i) g
  WHERE len(arr) >= 3
  UNION
  SELECT doc_id, array_to_string(arr, ' ') AS s
  FROM toks WHERE len(arr) BETWEEN 1 AND 2
),
bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 37 = 0),
corpus AS (SELECT doc_id, s FROM sh WHERE doc_id % 37 <> 0),
hits AS (
  SELECT c.doc_id, count(*) AS hits
  FROM corpus c JOIN bench b ON c.s = b.s
  GROUP BY 1
)
SELECT d.doc_id,
       CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
       CAST(coalesce(h.hits, 0) >= 1 AS BIGINT) AS contaminated
FROM (SELECT doc_id FROM documents WHERE doc_id % 37 <> 0) d
LEFT JOIN hits h USING(doc_id)
ORDER BY d.doc_id
"""

    sqls["split_relationships"] = f"""
WITH {_GRAPH_CTE}
SELECT src, dst, weight,
       CASE WHEN CAST(('0x' || substr(md5(src || '>' || dst || ':split'),
                 1, 8)) AS UBIGINT) * 1000000 < 200000 * 4294967296
            THEN 'selected' ELSE 'remaining' END AS split,
       CAST(CAST(('0x' || substr(md5(src || '>' || dst || ':split'),
                 1, 8)) AS UBIGINT) * 1000000 < 200000 * 4294967296
            AS BIGINT) AS label
FROM edges
ORDER BY src, dst
"""

    sqls["trajectory_pagerank"] = f"""
WITH RECURSIVE
t0 AS (
    SELECT event_type AS conv,
           row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id)
             AS idx,
           CAST(user_id AS VARCHAR) AS actor
    FROM events
),
l AS (
    SELECT conv, actor,
           lag(actor) OVER (PARTITION BY conv ORDER BY idx) AS prev
    FROM t0
),
st AS (
    SELECT conv,
           coalesce(sum(CASE WHEN prev IS NOT NULL AND actor <> prev
                          THEN 1 ELSE 0 END), 0) AS n_switches
    FROM l GROUP BY conv
),
keep AS (
    SELECT conv FROM st
    WHERE n_switches >= 1
      AND CAST(('0x' || substr(md5(conv), 1, 8)) AS UBIGINT) % 2 = 0
),
turns AS (SELECT * FROM t0 WHERE conv IN (SELECT conv FROM keep)),
nodes AS (SELECT DISTINCT actor AS node FROM turns),
pairs AS (
    SELECT a.actor AS src, b.actor AS dst
    FROM turns a JOIN turns b ON a.conv = b.conv AND b.idx = a.idx + 1
    WHERE a.actor <> b.actor
),
edges AS (
    SELECT src, dst, CAST(count(*) AS DOUBLE) AS weight
    FROM pairs GROUP BY src, dst
),
outdeg AS (SELECT src AS node, sum(weight) AS wdeg FROM edges GROUP BY src),
fan AS (
    SELECT e.src AS src, e.dst AS dst, e.weight / o.wdeg AS frac,
           FALSE AS is_self
    FROM edges e JOIN outdeg o ON o.node = e.src
    UNION ALL
    SELECT node, node, 0.0, TRUE FROM nodes
),
pr AS (
    SELECT 0 AS it, node, CAST(0.15 AS DOUBLE) AS rank FROM nodes
    UNION ALL
    SELECT p.it + 1 AS it, f.dst AS node,
           0.15 + 0.85 * sum(CASE WHEN f.is_self THEN 0.0
                              ELSE p.rank * f.frac END) AS rank
    FROM pr p JOIN fan f ON f.src = p.node
    WHERE p.it < {_PR_ITERS}
    GROUP BY p.it, f.dst
)
SELECT node, round(rank, 6) AS score FROM pr WHERE it = {_PR_ITERS}
"""

    sqls["conversation_stats"] = r"""
WITH t AS (
  SELECT event_type AS conv,
         row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id)
           AS idx,
         CAST(user_id AS VARCHAR) AS actor,
         props AS txt
  FROM events
),
l AS (
  SELECT conv, actor, txt,
         lag(actor) OVER (PARTITION BY conv ORDER BY idx) AS prev
  FROM t
)
SELECT conv,
       CAST(count(*) AS BIGINT) AS n_turns,
       CAST(count(DISTINCT actor) AS BIGINT) AS n_actors,
       CAST(coalesce(sum(CASE WHEN prev IS NOT NULL AND actor <> prev
                          THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_switches,
       CAST(sum(length(txt)) AS BIGINT) AS sum_chars
FROM l GROUP BY conv ORDER BY conv
"""

    sqls["turn_dedup"] = r"""
WITH t AS (
  SELECT event_type AS conv,
         row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id)
           AS idx,
         props AS txt
  FROM events
)
SELECT conv, CAST(idx - 1 AS BIGINT) AS turn_idx,
       CAST(row_number() OVER (
            PARTITION BY txt
            ORDER BY conv || '#' || lpad(CAST(idx - 1 AS VARCHAR), 9, '0')
       ) > 1 AS BIGINT) AS dup
FROM t
ORDER BY conv, turn_idx
"""

    sqls["role_transitions"] = r"""
WITH t AS (
  SELECT event_type AS conv,
         row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id)
           AS idx,
         CAST(user_id AS VARCHAR) AS actor
  FROM events
),
l AS (
  SELECT conv, actor,
         lag(actor) OVER (PARTITION BY conv ORDER BY idx) AS prev
  FROM t
)
SELECT prev AS prev_role, actor AS role, CAST(count(*) AS BIGINT) AS n
FROM l WHERE prev IS NOT NULL
GROUP BY 1, 2 ORDER BY 1, 2
"""

    sqls["turn_loops"] = r"""
WITH t AS (
  SELECT event_type AS conv,
         row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id)
           AS idx,
         CAST(user_id AS VARCHAR) AS actor,
         props AS txt
  FROM events
),
l AS (
  SELECT conv, idx, txt,
         lag(txt) OVER (PARTITION BY conv, actor ORDER BY idx) AS prev
  FROM t
)
SELECT conv, CAST(idx - 1 AS BIGINT) AS turn_idx,
       CAST(coalesce(txt = prev, FALSE) AS BIGINT) AS looped
FROM l ORDER BY conv, turn_idx
"""

    sqls["turn_context"] = r"""
WITH t AS (
  SELECT event_type AS conv,
         row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id)
           AS idx,
         props AS txt
  FROM events
)
SELECT conv, CAST(idx - 1 AS BIGINT) AS turn_idx,
       CAST(count(txt) OVER w AS BIGINT) AS ctx_turns,
       CAST(coalesce(sum(length(txt)) OVER w, 0) AS BIGINT) AS ctx_chars
FROM t
WINDOW w AS (PARTITION BY conv ORDER BY idx
             ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)
ORDER BY conv, turn_idx
"""

    sqls["pack_conversations"] = r"""
WITH t AS (
  SELECT event_type AS conv, props AS txt FROM events
),
c AS (
  SELECT conv,
         CAST(sum(len(regexp_extract_all(txt, '\S+'))) AS BIGINT) AS n_tokens
  FROM t GROUP BY conv
),
p AS (
  SELECT conv, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (ORDER BY conv
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS o
  FROM c
)
SELECT conv, n_tokens, o // 256 AS seq_id, o AS offset FROM p ORDER BY conv
"""

    sqls["conversation_jaccard"] = r"""
WITH t AS (
  SELECT event_type AS conv,
         row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id)
           AS idx,
         props AS txt
  FROM events
),
ct AS (SELECT conv, string_agg(txt, ' ' ORDER BY idx) AS text
       FROM t GROUP BY conv),
ids AS (
  SELECT conv,
         CAST(CAST(('0x' || substr(md5(conv), 1, 15)) AS UBIGINT) AS BIGINT)
           AS did,
         text
  FROM ct
),
toks AS (
  SELECT did, conv,
         list_filter(string_split_regex(coalesce(text, ''), '\s+'),
                     x -> x <> '') AS arr
  FROM ids
),
sh AS (
  SELECT DISTINCT did, arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] AS s
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(arr)-2)) AS i) g
  WHERE len(arr) >= 3
  UNION
  SELECT did, array_to_string(arr, ' ') AS s
  FROM toks WHERE len(arr) BETWEEN 1 AND 2
),
sizes AS (SELECT did, count(*) AS n FROM sh GROUP BY 1),
inter AS (
  SELECT a.did AS da, b.did AS db, count(*) AS c
  FROM sh a JOIN sh b ON a.s = b.s AND a.did < b.did
  GROUP BY 1, 2
)
SELECT ia.conv AS conv_a, ib.conv AS conv_b,
       round(CAST(i.c AS DOUBLE) / (sa.n + sb.n - i.c), 6) AS jaccard
FROM inter i
JOIN sizes sa ON sa.did = i.da
JOIN sizes sb ON sb.did = i.db
JOIN ids ia ON ia.did = i.da
JOIN ids ib ON ib.did = i.db
WHERE CAST(i.c AS DOUBLE) / (sa.n + sb.n - i.c) >= 0.1
ORDER BY conv_a, conv_b
"""

    sqls["turn_latency"] = r"""
WITH t AS (
  SELECT event_type AS conv,
         row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id)
           AS idx,
         ts
  FROM events
)
SELECT conv, CAST(idx - 1 AS BIGINT) AS turn_idx,
       CAST(coalesce(date_diff('microsecond',
            lag(ts) OVER (PARTITION BY conv ORDER BY idx), ts), 0) AS BIGINT)
         AS latency_us
FROM t ORDER BY conv, turn_idx
"""

    sqls["latency_stats"] = r"""
WITH t AS (
  SELECT event_type AS conv,
         row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id)
           AS idx,
         ts
  FROM events
),
d AS (
  SELECT conv,
         date_diff('microsecond',
                   lag(ts) OVER (PARTITION BY conv ORDER BY idx), ts) AS gap
  FROM t
)
SELECT conv,
       CAST(count(gap) AS BIGINT) AS n_gaps,
       CAST(coalesce(sum(gap), 0) AS BIGINT) AS total_us,
       CAST(coalesce(max(gap), 0) AS BIGINT) AS max_us
FROM d GROUP BY conv ORDER BY conv
"""

    sqls["conversation_novelty"] = r"""
WITH t AS (
  SELECT event_type AS conv,
         row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id)
           AS idx,
         props AS txt
  FROM events
),
ct AS (SELECT conv, string_agg(txt, ' ' ORDER BY idx) AS text
       FROM t GROUP BY conv),
toks AS (
  SELECT conv,
         list_filter(string_split_regex(coalesce(text, ''), '\s+'),
                     x -> x <> '') AS arr
  FROM ct
),
sh AS (
  SELECT conv, arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] AS s
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(arr)-2)) AS i) g
  WHERE len(arr) >= 3
),
agg AS (
  SELECT conv, CAST(count(*) AS BIGINT) AS n_shingles,
         CAST(count(DISTINCT s) AS BIGINT) AS n_distinct
  FROM sh GROUP BY conv
)
SELECT c.conv,
       CAST(coalesce(a.n_shingles, 0) AS BIGINT) AS n_shingles,
       CAST(coalesce(a.n_distinct, 0) AS BIGINT) AS n_distinct,
       CAST(CASE WHEN coalesce(a.n_shingles, 0) > 0
            THEN 1000000 * a.n_distinct // a.n_shingles ELSE 0 END AS BIGINT)
         AS novelty_ppm
FROM ct c LEFT JOIN agg a USING (conv) ORDER BY c.conv
"""

    sqls["bigram_nll"] = r"""
WITH toks AS (
  SELECT doc_id,
         list_transform(regexp_extract_all(coalesce(text, ''), '\S+'),
                        x -> lower(x)) AS arr
  FROM documents
),
bg AS (
  SELECT doc_id, arr[i] AS w1, arr[i] || ' ' || arr[i+1] AS b
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(arr)-1)) AS i) g
  WHERE len(arr) >= 2
),
tfb AS (
  SELECT doc_id, w1, b, CAST(count(*) AS BIGINT) AS tf
  FROM bg GROUP BY 1, 2, 3
),
cb AS (SELECT b, sum(tf) AS c FROM tfb GROUP BY 1),
cp AS (SELECT w1, sum(tf) AS c FROM tfb GROUP BY 1),
lnb AS (SELECT b,
        CAST(floor(ln(CAST(c AS DOUBLE)) * 1000000e0) AS BIGINT) AS lnb_ppm
        FROM cb),
lnp AS (SELECT w1,
        CAST(floor(ln(CAST(c AS DOUBLE)) * 1000000e0) AS BIGINT) AS lnp_ppm
        FROM cp),
s AS (
  SELECT t.doc_id,
         CAST(sum(t.tf) AS BIGINT) AS n_bigrams,
         CAST(sum(t.tf * (lnp.lnp_ppm - lnb.lnb_ppm)) AS BIGINT) AS nll_ppm
  FROM tfb t
  JOIN lnb ON lnb.b = t.b
  JOIN lnp ON lnp.w1 = t.w1
  GROUP BY 1
)
SELECT d.doc_id,
       CAST(coalesce(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CAST(coalesce(s.nll_ppm, 0) AS BIGINT) AS nll_ppm
FROM documents d LEFT JOIN s USING (doc_id) ORDER BY d.doc_id
"""

    sqls["reciprocity"] = f"""
WITH {_GRAPH_CTE},
c AS (
  SELECT least(src, dst) AS a, greatest(src, dst) AS b,
         sum(CASE WHEN src < dst THEN 1 ELSE 2 END) AS s
  FROM edges GROUP BY 1, 2
),
t AS (
  SELECT (SELECT count(*) FROM edges) AS n_edges,
         2 * (SELECT count(*) FROM c WHERE s = 3) AS n_reciprocal
)
SELECT CAST(n_edges AS BIGINT) AS n_edges,
       CAST(n_reciprocal AS BIGINT) AS n_reciprocal,
       CAST(1000000 * n_reciprocal // n_edges AS BIGINT) AS reciprocity_ppm
FROM t
"""

    sqls["assortativity"] = f"""
WITH {_GRAPH_CTE},
{_UND_CTE},
deg AS (SELECT src AS node, count(*) AS d FROM undw GROUP BY 1),
e AS (
  SELECT dx.d AS degx, dy.d AS degy
  FROM undw u
  JOIN deg dx ON dx.node = u.src
  JOIN deg dy ON dy.node = u.dst
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(degx) AS BIGINT) AS sx,
         CAST(sum(degx * degx) AS BIGINT) AS sxx,
         CAST(sum(degx * degy) AS BIGINT) AS sxy
  FROM e
)
SELECT n, sx AS sum_x, sxx AS sum_xx, sxy AS sum_xy,
       CAST(n * sxy - sx * sx AS BIGINT) AS num,
       CAST(n * sxx - sx * sx AS BIGINT) AS den,
       CASE WHEN n * sxx - sx * sx = 0 THEN 0.0e0
            ELSE CAST(n * sxy - sx * sx AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE) END AS r
FROM s
"""

    sqls["rich_club"] = f"""
WITH {_GRAPH_CTE},
{_UND_CTE},
deg AS (SELECT src AS node, count(*) AS d FROM undw GROUP BY 1),
e AS (
  SELECT least(dx.d, dy.d) AS m
  FROM undw u
  JOIN deg dx ON dx.node = u.src
  JOIN deg dy ON dy.node = u.dst
),
ks AS (SELECT unnest([1, 2, 4, 8, 16]) AS k),
stats AS (
  SELECT ks.k,
         (SELECT count(*) FROM deg WHERE d > ks.k) AS n_nodes,
         (SELECT count(*) FROM e WHERE m > ks.k) // 2 AS n_edges
  FROM ks
)
SELECT CAST(k AS BIGINT) AS k,
       CAST(n_nodes AS BIGINT) AS n_nodes,
       CAST(n_edges AS BIGINT) AS n_edges,
       CAST(CASE WHEN n_nodes >= 2
            THEN 1000000 * 2 * n_edges // (n_nodes * (n_nodes - 1))
            ELSE 0 END AS BIGINT) AS phi_ppm
FROM stats ORDER BY k
"""

    sqls["trajectory_pack"] = r"""
WITH t AS (
  SELECT event_type AS conv,
         row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id)
           AS idx,
         CAST(user_id AS VARCHAR) AS actor,
         props AS txt
  FROM events
),
dup AS (
  SELECT conv, idx,
         row_number() OVER (
              PARTITION BY txt
              ORDER BY conv || '#' || lpad(CAST(idx - 1 AS VARCHAR), 9, '0')
         ) > 1 AS is_dup
  FROM t
),
lp AS (
  SELECT conv, idx,
         coalesce(txt = lag(txt) OVER (PARTITION BY conv, actor
                                       ORDER BY idx), FALSE) AS is_loop
  FROM t
),
kept AS (
  SELECT t.conv, t.txt
  FROM t JOIN dup USING (conv, idx) JOIN lp USING (conv, idx)
  WHERE NOT dup.is_dup AND NOT lp.is_loop
),
c AS (
  SELECT conv,
         CAST(sum(len(regexp_extract_all(txt, '\S+'))) AS BIGINT) AS n_tokens
  FROM kept GROUP BY conv
),
p AS (
  SELECT conv, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (ORDER BY conv
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS o
  FROM c
)
SELECT conv, n_tokens, o // 256 AS seq_id, o AS offset FROM p ORDER BY conv
"""

    sqls["source_mix"] = r"""
WITH n AS (SELECT source, count(*) AS ns FROM documents GROUP BY 1),
w AS (
  SELECT source, ns,
         (CAST(substr(source, 4) AS BIGINT) % 4) + 1 AS wt
  FROM n
),
tot AS (
  SELECT (SELECT sum(wt * ns) FROM w) AS wsum,
         (SELECT count(*) FROM documents) AS n_total
),
k AS (
  SELECT w.source, w.ns,
         ((tot.n_total * 500000) // 1000000) * w.wt * w.ns // tot.wsum AS ks
  FROM w, tot
)
SELECT d.doc_id, d.source,
       CAST(CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':mix'),
                 1, 8)) AS UBIGINT) * k.ns
            < k.ks * 4294967296 AS BIGINT) AS kept
FROM documents d JOIN k ON d.source = k.source
ORDER BY d.doc_id
"""

    sqls["bloom_decontaminate"] = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(coalesce(text, ''), '\s+'),
                     x -> x <> '') AS arr
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] AS s
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(arr)-2)) AS i) g
  WHERE len(arr) >= 3
  UNION
  SELECT doc_id, array_to_string(arr, ' ') AS s
  FROM toks WHERE len(arr) BETWEEN 1 AND 2
),
ks AS (SELECT unnest(generate_series(0, 3)) AS i),
bbits AS (
  SELECT DISTINCT
         CAST(('0x' || substr(md5(b.s || ':bf' || CAST(ks.i AS VARCHAR)),
               1, 8)) AS UBIGINT) % 65536 AS bit
  FROM (SELECT DISTINCT s FROM sh WHERE doc_id % 37 = 0) b CROSS JOIN ks
),
corpus AS (SELECT doc_id, s FROM sh WHERE doc_id % 37 <> 0),
probe AS (
  SELECT c.doc_id, c.s,
         CAST(('0x' || substr(md5(c.s || ':bf' || CAST(ks.i AS VARCHAR)),
               1, 8)) AS UBIGINT) % 65536 AS bit
  FROM corpus c CROSS JOIN ks
),
shhit AS (
  SELECT doc_id, s, count(*) AS c
  FROM probe JOIN bbits USING (bit)
  GROUP BY doc_id, s
),
dochits AS (
  SELECT doc_id, count(*) AS bloom_hits FROM shhit WHERE c = 4 GROUP BY 1
)
SELECT d.doc_id,
       CAST(coalesce(h.bloom_hits, 0) AS BIGINT) AS bloom_hits,
       CAST(coalesce(h.bloom_hits, 0) >= 1 AS BIGINT) AS contaminated
FROM (SELECT doc_id FROM documents WHERE doc_id % 37 <> 0) d
LEFT JOIN dochits h USING (doc_id)
ORDER BY d.doc_id
"""

    sqls["training_mix"] = r"""
WITH kept AS (
  SELECT doc_id, text FROM documents
  WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY text)
),
toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(coalesce(text, ''), '\s+'),
                     x -> x <> '') AS arr
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] AS s
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(arr)-2)) AS i) g
  WHERE len(arr) >= 3
  UNION
  SELECT doc_id, array_to_string(arr, ' ') AS s
  FROM toks WHERE len(arr) BETWEEN 1 AND 2
),
bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 37 = 0),
contaminated AS (
  SELECT DISTINCT c.doc_id
  FROM sh c JOIN bench b ON c.s = b.s
  WHERE c.doc_id % 37 <> 0
),
clean AS (
  SELECT k.doc_id,
         CAST(len(list_filter(regexp_split_to_array(k.text, '\s+'),
              x -> x <> '')) AS BIGINT) AS n_tokens
  FROM kept k
  WHERE k.doc_id % 37 <> 0
    AND k.doc_id NOT IN (SELECT doc_id FROM contaminated)
),
filtered AS (SELECT * FROM clean WHERE n_tokens >= 5),
shuffled AS (
  SELECT doc_id, n_tokens,
         CAST(row_number() OVER (
              ORDER BY md5(CAST(doc_id AS VARCHAR) || ':mix'), doc_id
         ) AS BIGINT) AS pos
  FROM filtered
),
packed AS (
  SELECT doc_id, pos, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (ORDER BY pos
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS "offset"
  FROM shuffled
)
SELECT doc_id, pos, n_tokens, "offset" // 512 AS seq_id, "offset"
FROM packed ORDER BY pos
"""

    sqls["lang_id"] = r"""
WITH t AS (
  SELECT doc_id,
         list_transform(
           regexp_extract_all(coalesce(text, ''),
             '[a-zA-Zàâçéèêëîïôûùüáíóúñäöß]+'),
           x -> lower(x)) AS toks
  FROM documents
),
f AS (SELECT doc_id, len(toks) AS cnt, unnest(toks) AS w FROM t WHERE len(toks) > 0),
s AS (
  SELECT doc_id, any_value(cnt) AS cnt,
    sum(CASE WHEN w IN ('der','die','das','und','in','den','von','zu','mit','ist') THEN 1 ELSE 0 END) AS h_de,
    sum(CASE WHEN w IN ('the','a','of','to','and','in','is','it','that','for') THEN 1 ELSE 0 END) AS h_en,
    sum(CASE WHEN w IN ('el','la','de','que','y','en','un','una','es','los') THEN 1 ELSE 0 END) AS h_es,
    sum(CASE WHEN w IN ('le','la','de','et','les','des','un','une','est','que') THEN 1 ELSE 0 END) AS h_fr
  FROM f GROUP BY doc_id
),
sc AS (
  SELECT d.doc_id,
         coalesce(s.h_de, 0) / CAST(greatest(coalesce(s.cnt, 0), 1) AS DOUBLE) AS s_de,
         coalesce(s.h_en, 0) / CAST(greatest(coalesce(s.cnt, 0), 1) AS DOUBLE) AS s_en,
         coalesce(s.h_es, 0) / CAST(greatest(coalesce(s.cnt, 0), 1) AS DOUBLE) AS s_es,
         coalesce(s.h_fr, 0) / CAST(greatest(coalesce(s.cnt, 0), 1) AS DOUBLE) AS s_fr
  FROM (SELECT doc_id FROM documents) d LEFT JOIN s USING(doc_id)
),
sel AS (
  SELECT doc_id,
    CASE WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
         WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
         WHEN s_es >= s_fr THEN 'es'
         ELSE 'fr' END AS blang,
    greatest(s_de, s_en, s_es, s_fr) AS bscore
  FROM sc
)
SELECT doc_id, CASE WHEN bscore > 0.02 THEN blang ELSE 'unk' END AS lang_pred
FROM sel ORDER BY doc_id
"""

    sqls["scale_embedding_minmax"] = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
x AS (
  SELECT vec_id, i, v[i] AS x
  FROM e, LATERAL (SELECT unnest(generate_series(1, len(v))) AS i) g
),
st AS (SELECT i, min(x) AS mn, max(x) AS mx FROM x GROUP BY i)
SELECT vec_id, CAST(i AS BIGINT) AS dim,
       CAST(CASE WHEN mx > mn
            THEN floor(1000000 * ((x - mn) / (mx - mn))) ELSE 0 END AS BIGINT) AS sppm
FROM x JOIN st USING(i) ORDER BY vec_id, i
"""

    sqls["normalize_text"] = r"""
SELECT doc_id,
       trim(regexp_replace(lower(nfc_normalize(coalesce(text, ''))), '\s+', ' ', 'g')) AS norm_text
FROM documents ORDER BY doc_id
"""

    sqls["chunk_documents"] = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(coalesce(text, ''), '\s+'),
                     x -> x <> '') AS arr
  FROM documents
),
ch AS (
  SELECT doc_id, i AS chunk_idx,
         array_to_string(arr[(i*24+1):(i*24+32)], ' ') AS chunk_text,
         least(32, len(arr) - i*24) AS n_tokens
  FROM toks,
       LATERAL (SELECT unnest(generate_series(0, CAST((len(arr)-1)//24 AS BIGINT))) AS i) g
  WHERE len(arr) > 0
)
SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx, chunk_text,
       CAST(n_tokens AS BIGINT) AS n_tokens
FROM ch ORDER BY doc_id, chunk_idx
"""

    sqls["token_count"] = (
        "SELECT doc_id, CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), "
        "x -> x <> '')) AS BIGINT) AS n_tokens FROM documents ORDER BY doc_id"
    )

    from graph_data_science_ray.stages.sampling import split_threshold_hex

    sqls["hash_split"] = f"""
SELECT doc_id,
       CASE WHEN substr(md5(doc_id::VARCHAR || ':split'), 1, 8)
                 < '{split_threshold_hex(0.25)}'
            THEN 'test' ELSE 'train' END AS split
FROM documents ORDER BY doc_id"""

    sqls["quantile_filter"] = """
WITH stats AS (SELECT min(n_chars) AS lo, max(n_chars) AS hi, count(*) AS n
               FROM documents),
binned AS (SELECT LEAST(CAST(floor((n_chars - lo) * 4096.0 / (hi - lo)) AS BIGINT),
                        4095) AS b
           FROM documents, stats),
hist AS (SELECT b, count(*) AS c FROM binned GROUP BY b),
cum AS (SELECT b, sum(c) OVER (ORDER BY b) AS cc FROM hist),
pick AS (SELECT min(b) AS pb FROM cum, stats WHERE cc >= ceil(0.9 * n)),
thr AS (SELECT lo + pb * (hi - lo) / 4096.0 AS t FROM pick, stats)
SELECT doc_id, n_chars FROM documents, thr
WHERE CAST(n_chars AS DOUBLE) >= t ORDER BY doc_id"""

    sqls["top_k_per_group"] = """
SELECT lang, doc_id, n_chars FROM (
  SELECT lang, doc_id, n_chars,
         row_number() OVER (PARTITION BY lang
                            ORDER BY n_chars DESC, doc_id ASC) AS rn
  FROM documents) t
WHERE rn <= 5 ORDER BY lang, doc_id"""

    sqls["deterministic_shuffle"] = """
SELECT doc_id,
       CAST(row_number() OVER (
            ORDER BY md5(CAST(doc_id AS VARCHAR) || ':shuffle'), doc_id
       ) AS BIGINT) AS pos
FROM documents ORDER BY doc_id
"""

    sqls["stratified_sample"] = """
WITH r AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang
                            ORDER BY md5(doc_id::VARCHAR || ':strat'), doc_id) AS rn,
         count(*) OVER (PARTITION BY lang) AS cnt
  FROM documents)
SELECT doc_id, lang FROM r
WHERE rn <= ceil(0.2e0 * cnt) ORDER BY doc_id"""

    sqls["sample_global_k"] = """
SELECT doc_id, n_chars FROM documents
ORDER BY md5(doc_id::VARCHAR || ':sample'), doc_id LIMIT 50"""

    sqls["running_sum"] = """
SELECT doc_id, n_chars,
       CAST(sum(n_chars) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS running_sum
FROM documents ORDER BY doc_id"""

    sqls["row_number_global"] = """
SELECT event_id,
       CAST(row_number() OVER (ORDER BY ts, event_id) AS BIGINT) AS rn
FROM events ORDER BY event_id"""

    sqls["lag_delta"] = """
SELECT event_id,
       coalesce(date_diff('microsecond',
                lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                ts), -1) AS gap_us
FROM events ORDER BY event_id"""

    sqls["pack_sequences"] = """
WITH w AS (
  SELECT doc_id, n_chars,
         CAST(coalesce(sum(n_chars) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS o
  FROM documents)
SELECT doc_id, n_chars, o // 4096 AS seq_id, o AS offset
FROM w ORDER BY doc_id"""

    # shared tokenization CTE: lowercased \S+ runs (the repo-wide tokenizer)
    _TOKS_CTE = r"""
toks AS (
  SELECT doc_id, lower(t) AS term
  FROM (SELECT doc_id, unnest(regexp_extract_all(coalesce(text, ''), '\S+')) AS t
        FROM documents)
),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       FROM toks GROUP BY doc_id, term)
"""

    sqls["doc_freq"] = f"""
WITH {_TOKS_CTE}
SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term ORDER BY term"""

    sqls["tf_idf_topk"] = f"""
WITH {_TOKS_CTE},
df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
nd AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
ranked AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         row_number() OVER (
           PARTITION BY tf.doc_id
           ORDER BY CAST(tf.tf AS DOUBLE) * ln(nd.n / CAST(df.df AS DOUBLE)) DESC,
                    tf.term ASC) AS rn
  FROM tf JOIN df USING (term), nd)
SELECT doc_id, term, tf, df FROM ranked WHERE rn <= 3 ORDER BY doc_id, term"""

    sqls["unigram_nll"] = f"""
WITH {_TOKS_CTE},
cnt AS (SELECT term, CAST(sum(tf) AS BIGINT) AS c FROM tf GROUP BY term),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM cnt),
lnt AS (SELECT CAST(floor(ln(CAST(t AS DOUBLE)) * 1000000e0) AS BIGINT)
               AS lnt_ppm FROM tot),
lnc AS (SELECT term, CAST(floor(ln(CAST(c AS DOUBLE)) * 1000000e0) AS BIGINT)
               AS lnc_ppm FROM cnt),
per AS (SELECT tf.doc_id, CAST(sum(tf.tf) AS BIGINT) AS n_tokens,
               CAST(sum(tf.tf * lnc.lnc_ppm) AS BIGINT) AS s
        FROM tf JOIN lnc USING (term) GROUP BY tf.doc_id)
SELECT d.doc_id,
       coalesce(per.n_tokens, 0) AS n_tokens,
       coalesce(per.n_tokens * lnt.lnt_ppm - per.s, 0) AS nll_ppm
FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id, lnt
ORDER BY d.doc_id"""

    sqls["token_entropy"] = f"""
WITH {_TOKS_CTE},
per AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n,
               CAST(sum(tf * CAST(floor(ln(CAST(tf AS DOUBLE)) * 1000000e0)
                                  AS BIGINT)) AS BIGINT) AS s
        FROM tf GROUP BY doc_id)
SELECT d.doc_id,
       coalesce(per.n, 0) AS n_tokens,
       CAST(coalesce(
           (per.n * CAST(floor(ln(CAST(per.n AS DOUBLE)) * 1000000e0)
                         AS BIGINT) - per.s) // per.n,
           0) AS BIGINT) AS ent_ppm
FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
ORDER BY d.doc_id"""

    sqls["bm25_topk"] = _bm25_oracle_sql()

    sqls["c4_quality"] = r"""
WITH s AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(coalesce(text, ''), '\S+')) AS BIGINT)
           AS n_words,
         CAST(len(string_split(coalesce(text, ''), chr(10))) AS BIGINT)
           AS n_lines,
         CAST(len(list_filter(string_split(coalesce(text, ''), chr(10)),
                              x -> regexp_matches(x, '[.!?"]$'))) AS BIGINT)
           AS n_terminal_lines,
         CASE WHEN contains(coalesce(text, ''), '{') THEN 1 ELSE 0 END
           AS has_brace,
         CASE WHEN contains(lower(coalesce(text, '')), 'lorem ipsum')
              THEN 1 ELSE 0 END AS has_lorem
  FROM documents)
SELECT doc_id, n_words, n_lines, n_terminal_lines,
       CAST(has_brace AS BIGINT) AS has_brace,
       CAST(has_lorem AS BIGINT) AS has_lorem,
       CAST(CASE WHEN n_words >= 50 AND has_brace = 0 AND has_lorem = 0
                 THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM s ORDER BY doc_id"""

    sqls["token_repetition"] = r"""
WITH d AS (
  SELECT doc_id,
         list_transform(regexp_extract_all(coalesce(text, ''), '\S+'),
                        x -> lower(x)) AS arr
  FROM documents),
base AS (SELECT doc_id, CAST(len(arr) AS BIGINT) AS n_tokens FROM d),
tok AS (SELECT doc_id, unnest(arr) AS term FROM d),
dist AS (SELECT doc_id, CAST(count(DISTINCT term) AS BIGINT) AS n_distinct
         FROM tok GROUP BY doc_id),
bg AS (SELECT doc_id, arr[i] || ' ' || arr[i + 1] AS gram
       FROM d, LATERAL (SELECT unnest(generate_series(1, len(arr) - 1)) AS i) g),
topbg AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS top_cnt
          FROM (SELECT doc_id, gram, count(*) AS c FROM bg GROUP BY doc_id, gram)
          GROUP BY doc_id),
s AS (
  SELECT base.doc_id, base.n_tokens,
         coalesce(dist.n_distinct, 0) AS n_distinct_tokens,
         CAST(greatest(base.n_tokens - 1, 0) AS BIGINT) AS n_bigrams,
         coalesce(topbg.top_cnt, 0) AS top_bigram_cnt
  FROM base LEFT JOIN dist USING (doc_id) LEFT JOIN topbg USING (doc_id))
SELECT doc_id, n_tokens, n_distinct_tokens, n_bigrams, top_bigram_cnt,
       CAST(CASE WHEN 2 * n_distinct_tokens >= n_tokens
                  AND 5 * top_bigram_cnt <= n_bigrams
                 THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM s ORDER BY doc_id"""

    sqls["semantic_dedup"] = """
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
c AS (SELECT vec_id AS cid, e FROM v WHERE vec_id < 8),
a AS (SELECT v.vec_id, v.e, c.cid,
             row_number() OVER (PARTITION BY v.vec_id
                                ORDER BY list_distance(v.e, c.e), c.cid) AS rn
      FROM v, c),
asg AS (SELECT vec_id, e, cid FROM a WHERE rn = 1)
SELECT x.cid AS cluster, x.vec_id AS doc_a, y.vec_id AS doc_b
FROM asg x JOIN asg y ON x.cid = y.cid AND x.vec_id < y.vec_id
WHERE round(list_cosine_similarity(x.e, y.e), 6) >= 0.35
ORDER BY doc_a, doc_b"""

    sqls["dag_longest_path"] = f"""
WITH RECURSIVE {_GRAPH_CTE},
dag AS (SELECT src, dst FROM edges WHERE src < dst),
r AS (SELECT node, 0 AS d FROM nodes
      UNION
      SELECT dag.dst AS node, r.d + 1 AS d FROM r JOIN dag ON r.node = dag.src)
SELECT node, CAST(max(d) AS BIGINT) AS layer FROM r GROUP BY node ORDER BY node"""

    sqls["media_decode"] = """
WITH grid AS (
  SELECT r.r, c.c FROM generate_series(0, 7) AS r(r), generate_series(0, 7) AS c(c)
)
SELECT d.doc_id AS media_id,
       CAST(sum((d.doc_id + 3 * g.r + 5 * g.c) % 256
              + (2 * d.doc_id + g.r) % 256
              + (d.doc_id + 7 * g.c) % 256) AS BIGINT) AS pixel_sum,
       CAST(1 AS BIGINT) AS feature_ok
FROM documents d, grid g
GROUP BY d.doc_id
ORDER BY media_id
"""

    sqls["media_resize"] = """
WITH grid AS (
  SELECT r.r, c.c
  FROM (VALUES (1), (3), (5), (7)) AS r(r), (VALUES (1), (3), (5), (7)) AS c(c)
)
SELECT d.doc_id AS media_id,
       CAST(sum((d.doc_id + 3 * g.r + 5 * g.c) % 256
              + (2 * d.doc_id + g.r) % 256
              + (d.doc_id + 7 * g.c) % 256) AS BIGINT) AS pixel_sum
FROM documents d, grid g
GROUP BY d.doc_id
ORDER BY media_id
"""

    sqls["media_frames"] = """
WITH grid AS (
  SELECT j.j, r.r, c.c
  FROM generate_series(0, 2) AS j(j),
       generate_series(0, 3) AS r(r), generate_series(0, 3) AS c(c)
)
SELECT d.doc_id AS media_id, g.j AS frame_idx,
       CAST(sum((d.doc_id + 11 * g.j + 2 * g.r + g.c) % 256
              + (3 * d.doc_id + g.j + g.r) % 256
              + (d.doc_id + 5 * g.j + 3 * g.c) % 256) AS BIGINT) AS pixel_sum
FROM documents d, grid g
GROUP BY d.doc_id, g.j
ORDER BY media_id, frame_idx
"""

    sqls["media_audio"] = """
SELECT d.doc_id AS media_id,
       CAST(sum((d.doc_id * 13 + t.t * 7) % 4001 - 2000) AS BIGINT) AS sample_sum
FROM documents d, generate_series(0, 63) AS t(t)
GROUP BY d.doc_id
ORDER BY media_id
"""

    sqls["ngram_topk"] = r"""
WITH arrs AS (
  SELECT list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS arr
  FROM documents
),
grams AS (
  SELECT list_transform(generate_series(1, len(arr) - 1),
                        i -> arr[i] || ' ' || arr[i + 1]) AS gl
  FROM arrs
),
flat AS (SELECT unnest(gl) AS ngram FROM grams)
SELECT ngram, CAST(count(*) AS BIGINT) AS cnt
FROM flat GROUP BY ngram
ORDER BY cnt DESC, ngram LIMIT 100
"""

    # winnowing fingerprints: base-257 polynomial rolling hash mod 2^64
    # over UTF-8 BYTES (hex(encode(..)) + per-byte strpos parse mirrors the
    # engine's np.frombuffer(utf-8) exactly), windowed min over 16 grams,
    # distinct per doc. POW[i] = 257^i mod 2^64, precomputed.
    _wpow = [1]
    for _ in range(7):
        _wpow.append((_wpow[-1] * 257) % (1 << 64))
    _wterms = " + ".join(
        f"CAST(((strpos('0123456789ABCDEF', substr(hx, 2*(p+{j})+1, 1))-1)*16 + "
        f"strpos('0123456789ABCDEF', substr(hx, 2*(p+{j})+2, 1))-1) AS HUGEINT)"
        f" * {_wpow[7 - j]}"
        for j in range(8)
    )
    sqls["winnow_fingerprints"] = f"""
WITH d AS (
  SELECT doc_id, hex(encode(coalesce(text, ''))) AS hx,
         octet_length(encode(coalesce(text, ''))) AS L
  FROM documents
),
pos AS (
  SELECT doc_id, hx, L, unnest(range(0, greatest(L - 7, 0))) AS p FROM d
),
grams AS (
  SELECT doc_id, p, ({_wterms}) % 18446744073709551616::HUGEINT AS h,
         L - 7 AS cnt
  FROM pos
),
wmins AS (
  SELECT doc_id, p, cnt,
         min(h) OVER (PARTITION BY doc_id ORDER BY p
                      ROWS BETWEEN CURRENT ROW AND 15 FOLLOWING) AS mn
  FROM grams
),
sel AS (SELECT DISTINCT doc_id, mn FROM wmins WHERE p <= greatest(cnt - 16, 0))
SELECT doc_id,
       CAST(CASE WHEN mn >= 9223372036854775808::HUGEINT
                 THEN mn - 18446744073709551616::HUGEINT
                 ELSE mn END AS BIGINT) AS fp
FROM sel ORDER BY doc_id, fp
"""

    sqls["quality_stats"] = """
SELECT doc_id,
       CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS BIGINT) AS n_words,
       CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS BIGINT) AS n_alpha,
       CAST(length(text) AS BIGINT) AS n_chars
FROM documents ORDER BY doc_id
"""

    sqls["scale_minmax"] = """
SELECT event_id,
       round(CASE WHEN mx <> mn THEN (value - mn) / (mx - mn) ELSE 0.0 END, 6) AS scaled
FROM (
    SELECT event_id, value,
           min(value) OVER (PARTITION BY event_type) AS mn,
           max(value) OVER (PARTITION BY event_type) AS mx
    FROM events
) ORDER BY event_id
"""

    sqls["sessionize"] = """
SELECT user_id,
       CAST(1 + sum(CASE WHEN gap > 1800.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
       CAST(count(*) AS BIGINT) AS n_events
FROM (
    SELECT user_id,
           epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS gap
    FROM events
) GROUP BY user_id ORDER BY user_id
"""

    sqls["window_hourly"] = """
SELECT CAST(floor(epoch_us(ts) / 3600000000.0) AS BIGINT) * 3600000000 AS window_start,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 6) AS value_sum
FROM events GROUP BY 1 ORDER BY 1
"""

    # sliding windows: each event contributes to the 4 window starts
    # w0, w0-15min, w0-30min, w0-45min (w0 = its 15-min floor)
    sqls["window_sliding"] = """
WITH expanded AS (
  SELECT (CAST(floor(epoch_us(ts) / 900000000.0) AS BIGINT) * 900000000
          - 900000000 * k.i) AS window_start,
         value
  FROM events, LATERAL (SELECT unnest(generate_series(0, 3)) AS i) k
)
SELECT window_start, CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 6) AS value_sum
FROM expanded GROUP BY 1 ORDER BY 1
"""

    sqls["knn_cosine_topk"] = """
WITH q AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings WHERE vec_id < 10),
c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
scored AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           round(list_cosine_similarity(q.e, c.e), 6) AS sim
    FROM q CROSS JOIN c WHERE q.vec_id <> c.vec_id
),
ranked AS (
    SELECT query_id, neighbor_id, sim,
           row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
    FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 5 ORDER BY query_id, rank
"""

    # full-probe IVF is exhaustive: identical contract to brute force
    sqls["knn_ivf"] = sqls["knn_cosine_topk"]

    # int8 scalar quantization: integer dot products are bit-exact, so
    # the score column itself is hash-compared (no float tie hazard)
    sqls["knn_quantized"] = """
WITH m AS (
  SELECT max(abs(x)) AS mx FROM (
    SELECT unnest(CAST(embedding AS DOUBLE[])) AS x FROM embeddings)
),
ve AS (
  SELECT vec_id, i, CAST(floor(127 * (e[i] / m.mx)) AS BIGINT) AS qi
  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings) t,
       m,
       LATERAL (SELECT unnest(generate_series(1, len(e))) AS i) g
),
qe AS (SELECT vec_id, i, qi FROM ve WHERE vec_id < 10),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         sum(q.qi * c.qi) AS score
  FROM qe q JOIN ve c ON c.i = q.i AND c.vec_id <> q.vec_id
  GROUP BY 1, 2
),
ranked AS (
  SELECT query_id, neighbor_id, score,
         row_number() OVER (
             PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC
         ) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank,
       CAST(score AS BIGINT) AS score
FROM ranked WHERE rank <= 5 ORDER BY query_id, rank
"""

    sqls["knn_euclidean"] = """
WITH q AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings WHERE vec_id < 10),
c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
scored AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           round(1.0 / (1.0 + list_distance(q.e, c.e)), 6) AS sim
    FROM q CROSS JOIN c WHERE q.vec_id <> c.vec_id
),
ranked AS (
    SELECT query_id, neighbor_id, sim,
           row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
    FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 5 ORDER BY query_id, rank
"""

    sqls["knn_pearson"] = """
WITH q0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings WHERE vec_id < 10),
c0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
q AS (SELECT vec_id, list_transform(e, x -> x - list_avg(e)) AS e FROM q0),
c AS (SELECT vec_id, list_transform(e, x -> x - list_avg(e)) AS e FROM c0),
scored AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           round((list_cosine_similarity(q.e, c.e) + 1.0) / 2.0, 6) AS sim
    FROM q CROSS JOIN c WHERE q.vec_id <> c.vec_id
),
ranked AS (
    SELECT query_id, neighbor_id, sim,
           row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
    FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 5 ORDER BY query_id, rank
"""

    # zero-plane multi-band LSH is exhaustive over ALL queries: the
    # brute-force contract without the vec_id < 10 query restriction
    sqls["knn_lsh_multiband"] = """
WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
scored AS (
    SELECT q.vec_id AS query_id, c2.vec_id AS neighbor_id,
           round(list_cosine_similarity(q.e, c2.e), 6) AS sim
    FROM c q CROSS JOIN c c2 WHERE q.vec_id <> c2.vec_id
),
ranked AS (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
    FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 5 ORDER BY query_id, rank
"""

    sqls["embedding_near_dup"] = """
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings WHERE vec_id < 300)
SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
FROM v a JOIN v b ON a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.e, b.e), 6) >= 0.35
ORDER BY doc_a, doc_b
"""

    sqls["yens_k3"] = f"""
WITH RECURSIVE {_GRAPH_CTE},
f AS (SELECT src, dst, weight FROM edges
       WHERE weight >= LEAST({_YENS_MINW}, (SELECT max(weight) FROM edges))),
twohop AS (
    SELECT a.src AS src, b.dst AS dst, count(*) AS c
    FROM f a JOIN f b ON b.src = a.dst AND a.src <> b.dst
    GROUP BY a.src, b.dst
),
sel AS (SELECT src, dst FROM twohop ORDER BY c DESC, src, dst LIMIT 1),
paths AS (
    SELECT dst AS node, weight AS cost, [src, dst] AS path, 1 AS hops
    FROM f WHERE src = (SELECT src FROM sel)
    UNION ALL
    SELECT e.dst, p.cost + e.weight, list_append(p.path, e.dst), p.hops + 1
    FROM paths p JOIN f e ON e.src = p.node
    WHERE p.hops < {_YENS_HOPS} AND NOT list_contains(p.path, e.dst)
)
SELECT CAST(row_number() OVER (ORDER BY cost) AS BIGINT) AS path_rank,
       round(cost, 6) AS total_cost
FROM paths WHERE node = (SELECT dst FROM sel) ORDER BY cost LIMIT 3
"""
    # (hop bound is safe while the 3rd-best cost < {_YENS_HOPS + 1} *
    # {_YENS_MINW}: any path longer than {_YENS_HOPS} hops on the filtered
    # subgraph is strictly costlier — verified 3rd-best <= 10 at the
    # driver scales.)

    sqls["delta_stepping"] = sqls["sssp"]  # identical distance contract

    sqls["astar"] = f"""
WITH RECURSIVE {_GRAPH_CTE},
fan AS (
    SELECT src, dst, weight AS w FROM edges
    UNION ALL
    SELECT node, node, 0.0 FROM nodes
),
dist AS (
    SELECT 0 AS it, (SELECT min(node) FROM nodes) AS node, CAST(0 AS DOUBLE) AS d
    UNION ALL
    SELECT p.it + 1 AS it, f.dst AS node, min(p.d + f.w) AS d
    FROM dist p JOIN fan f ON f.src = p.node
    WHERE p.it < {_SSSP_ROUNDS}
    GROUP BY p.it, f.dst
)
SELECT d AS total_cost FROM dist
WHERE it = {_SSSP_ROUNDS} AND node = (SELECT max(node) FROM nodes)
"""

    sqls["astar_haversine"] = sqls["astar"]

    sqls["scale_l2"] = """
SELECT doc_id,
       round(CASE WHEN nrm <> 0 THEN n_chars / nrm ELSE 0.0 END, 6) AS scaled
FROM (
    SELECT doc_id, CAST(n_chars AS DOUBLE) AS n_chars,
           sqrt(sum(CAST(n_chars AS DOUBLE) * n_chars) OVER ()) AS nrm
    FROM documents
) ORDER BY doc_id
"""

    sqls["lp_node_weighted"] = f"""
WITH RECURSIVE {_GRAPH_CTE},
{_UND_CTE},
fanlp AS (
    SELECT src, dst, w * (1 + (CAST(src AS BIGINT) % 3)) AS w FROM undw
    UNION ALL
    SELECT node AS src, node AS dst, 0.0 AS w FROM nodes
),
lp AS (
    SELECT 0 AS it, node, node AS label FROM nodes
    UNION ALL
    SELECT it, dst AS node, label FROM (
        SELECT p.it + 1 AS it, f.dst AS dst, p.label AS label, sum(f.w) AS wsum,
               row_number() OVER (
                   PARTITION BY p.it, f.dst
                   ORDER BY sum(f.w) DESC, p.label ASC
               ) AS rn
        FROM lp p JOIN fanlp f ON f.src = p.node
        WHERE p.it < {_LP_ROUNDS}
        GROUP BY p.it, f.dst, p.label
    ) WHERE rn = 1
)
SELECT node, label FROM lp WHERE it = {_LP_ROUNDS}
"""

    sqls["dedup_exact_table"] = """
SELECT * FROM documents
WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY text)
ORDER BY doc_id
"""

    sqls["clean_corpus"] = r"""
WITH kept AS (
  SELECT doc_id, text FROM documents
  WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY text)
),
tok AS (
  SELECT CAST(len(list_filter(regexp_split_to_array(text, '\s+'),
                              x -> x <> '')) AS BIGINT) AS n
  FROM kept
)
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(coalesce(sum(n), 0) AS BIGINT) AS total_tokens
FROM tok WHERE n >= 5
"""

    sqls["bpe_token_count"] = """
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]+')) AS BIGINT)
           AS n_bpe_tokens
FROM documents ORDER BY doc_id
"""

    sqls["pagerank_personalized"] = f"""
WITH RECURSIVE {_GRAPH_CTE},
srcs AS (SELECT node FROM nodes ORDER BY node LIMIT 3),
outdeg AS (SELECT src AS node, sum(weight) AS wdeg FROM edges GROUP BY src),
fan AS (
    SELECT e.src AS src, e.dst AS dst, e.weight / o.wdeg AS frac, FALSE AS is_self
    FROM edges e JOIN outdeg o ON o.node = e.src
    UNION ALL
    SELECT node, node, 0.0, TRUE FROM nodes
),
pr AS (
    SELECT 0 AS it, node,
           CAST(CASE WHEN node IN (SELECT node FROM srcs) THEN 0.15 ELSE 0.0 END AS DOUBLE) AS rank
    FROM nodes
    UNION ALL
    SELECT p.it + 1 AS it, f.dst AS node,
           CASE WHEN f.dst IN (SELECT node FROM srcs) THEN 0.15 ELSE 0.0 END
           + 0.85 * sum(CASE WHEN f.is_self THEN 0.0 ELSE p.rank * f.frac END) AS rank
    FROM pr p JOIN fan f ON f.src = p.node
    WHERE p.it < {_PR_ITERS}
    GROUP BY p.it, f.dst
)
SELECT node, round(rank, 6) AS score FROM pr WHERE it = {_PR_ITERS}
"""

    # parity-0 round-1 local-move kernel (shared by louvain_round1 and the
    # pinned-surface louvain/leiden base oracles)
    _round1_ctes = """
ranked AS (SELECT node, row_number() OVER (ORDER BY node) - 1 AS rk FROM nodes),
deg AS (SELECT src AS node, sum(w) AS d FROM undw GROUP BY src),
m2 AS (SELECT sum(d) AS two_m FROM deg),
cand AS (
    SELECT e.src AS node, e.dst AS comm,
           e.w - (dn.d * dc.d) / (SELECT two_m FROM m2) AS gain
    FROM undw e
    JOIN deg dn ON dn.node = e.src
    JOIN deg dc ON dc.node = e.dst
    JOIN ranked r ON r.node = e.src
    WHERE r.rk % 2 = 0 AND e.src <> e.dst
),
best AS (
    SELECT node, comm, gain,
           row_number() OVER (PARTITION BY node ORDER BY gain DESC, comm ASC) AS rn
    FROM cand
)"""
    _round1_comm = (
        "CASE WHEN b.gain > 1e-12 THEN b.comm ELSE n.node END AS community"
    )
    sqls["louvain_round1"] = f"""
WITH {_GRAPH_CTE},
{_UND_CTE},
{_round1_ctes}
SELECT n.node AS node, {_round1_comm}
FROM nodes n LEFT JOIN best b ON b.node = n.node AND b.rn = 1
"""

    # louvain / leiden base contracts: pinned round-1 assignment (exact)
    # + constant flags the engine computes from the FULL run's invariants
    sqls["louvain"] = f"""
WITH {_GRAPH_CTE},
{_UND_CTE},
{_round1_ctes}
SELECT n.node AS node, {_round1_comm},
       CAST(1 AS BIGINT) AS assigned_ok,
       CAST(1 AS BIGINT) AS min_member_ok,
       CAST(1 AS BIGINT) AS converged_ok
FROM nodes n LEFT JOIN best b ON b.node = n.node AND b.rn = 1
"""

    sqls["leiden"] = f"""
WITH {_GRAPH_CTE},
{_UND_CTE},
{_round1_ctes}
SELECT n.node AS node, {_round1_comm},
       CAST(1 AS BIGINT) AS assigned_ok,
       CAST(1 AS BIGINT) AS connected_ok
FROM nodes n LEFT JOIN best b ON b.node = n.node AND b.rn = 1
"""

    # louvain_modularity: the pinned round-1 partition's INTEGER
    # modularity numerator Q*(2m)^2 = 2m*Σ_c l_in_c − Σ_c d_c² recomputed
    # verbatim over the round-1 kernel CTE (weights integral so every
    # term is exact BIGINT arithmetic); improved_ok asserts the full
    # multi-level run never falls below the round-1 modularity (local
    # moves only accept positive gains — Louvain.java's monotonicity).
    sqls["louvain_modularity"] = f"""
WITH {_GRAPH_CTE},
{_UND_CTE},
{_round1_ctes},
lab AS (
    SELECT n.node AS node,
           CASE WHEN b.gain > 1e-12 THEN b.comm ELSE n.node END AS community
    FROM nodes n LEFT JOIN best b ON b.node = n.node AND b.rn = 1
),
agg AS (
    SELECT ls.community AS community,
           CAST(sum(e.w) AS BIGINT) AS d_c,
           CAST(sum(CASE WHEN ls.community = ld.community THEN e.w
                         ELSE 0 END) AS BIGINT) AS l_in
    FROM undw e
    JOIN lab ls ON ls.node = e.src
    JOIN lab ld ON ld.node = e.dst
    GROUP BY ls.community
)
SELECT CAST((SELECT sum(d) FROM deg) AS BIGINT) AS two_m,
       CAST((SELECT sum(d) FROM deg) AS BIGINT) * CAST(sum(l_in) AS BIGINT)
         - CAST(sum(d_c * d_c) AS BIGINT) AS round1_mod_num,
       CAST(1 AS BIGINT) AS improved_ok
FROM agg
"""

    # k1_coloring: the engine's deterministic conflict-resolution schedule
    # reproduced round by round for the pinned _K1_ROUNDS (round 1: every
    # node picks the smallest color unused by its neighbors; later rounds
    # recolor only conflict losers — equal adjacent colors, higher dense
    # rank). Post-fixpoint rounds are no-ops on both sides.
    _k1_parts = [
        "c0 AS MATERIALIZED (SELECT node, 0 AS color FROM nodes)",
        "a1 AS MATERIALIZED (SELECT node FROM nodes)",
    ]
    for _t in range(1, _K1_ROUNDS + 1):
        _p = _t - 1
        _k1_parts.append(
            f"""nbr{_t} AS MATERIALIZED (
    SELECT DISTINCT u.src AS node, c.color AS color
    FROM undw u JOIN c{_p} c ON c.node = u.dst
    WHERE u.src IN (SELECT node FROM a{_t}))"""
        )
        _k1_parts.append(
            f"cnt{_t} AS (SELECT node, count(*) AS k FROM nbr{_t} GROUP BY node)"
        )
        _k1_parts.append(
            f"cand{_t} AS (SELECT node, unnest(generate_series(0, k)) AS g"
            f" FROM cnt{_t})"
        )
        _k1_parts.append(
            f"""pick{_t} AS MATERIALIZED (
    SELECT cd.node, min(cd.g) AS color
    FROM cand{_t} cd
    LEFT JOIN nbr{_t} nb ON nb.node = cd.node AND nb.color = cd.g
    WHERE nb.node IS NULL GROUP BY cd.node)"""
        )
        _k1_parts.append(
            f"""c{_t} AS MATERIALIZED (
    SELECT c.node, coalesce(p.color, c.color) AS color
    FROM c{_p} c LEFT JOIN pick{_t} p ON p.node = c.node)"""
        )
        if _t < _K1_ROUNDS:
            _k1_parts.append(
                f"""a{_t + 1} AS MATERIALIZED (
    SELECT DISTINCT u.src AS node
    FROM undw u
    JOIN c{_t} cs ON cs.node = u.src
    JOIN c{_t} cd ON cd.node = u.dst
    JOIN ranked rs ON rs.node = u.src
    JOIN ranked rd ON rd.node = u.dst
    WHERE cs.color = cd.color AND rs.rk > rd.rk)"""
            )
    _k1_body = ",\n".join(_k1_parts)
    sqls["k1_coloring"] = f"""
WITH {_GRAPH_CTE},
{_UND_CTE},
ranked AS (SELECT node, row_number() OVER (ORDER BY node) - 1 AS rk FROM nodes),
{_k1_body}
SELECT node, CAST(color AS BIGINT) AS color FROM c{_K1_ROUNDS}
"""

    # fastrp: integer-exact contract — md5-parity hash signs on dense
    # ranks, then _FRP_ROUNDS unweighted neighbor-sum rounds (identical
    # md5 inputs engine-side)
    _frp_rounds_sql = []
    for _t in range(1, _FRP_ROUNDS + 1):
        _frp_rounds_sql.append(
            f"""h{_t} AS (
    SELECT u.src AS node, h.j, sum(h.v) AS v
    FROM undw u JOIN h{_t - 1} h ON h.node = u.dst GROUP BY u.src, h.j)"""
        )
    _frp_body = ",\n".join(_frp_rounds_sql)
    sqls["fastrp"] = f"""
WITH {_GRAPH_CTE},
{_UND_CTE},
ranked AS (SELECT node, row_number() OVER (ORDER BY node) - 1 AS rk FROM nodes),
dims AS (SELECT unnest(generate_series(0, {_FRP_DIM - 1})) AS j),
h0 AS (
    SELECT r.node, d.j,
           CASE WHEN substr(md5(r.rk::VARCHAR || ':frp:' || d.j::VARCHAR), 32, 1)
                     IN ('0','2','4','6','8','a','c','e')
                THEN 1 ELSE -1 END AS v
    FROM ranked r CROSS JOIN dims d
),
{_frp_body}
SELECT r.node AS node, CAST(d.j AS BIGINT) AS dim,
       CAST(coalesce(h.v, 0) AS BIGINT) AS value
FROM ranked r CROSS JOIN dims d
LEFT JOIN h{_FRP_ROUNDS} h ON h.node = r.node AND h.j = d.j
"""

    sqls["subgraph_filter_expr"] = f"""
WITH {_GRAPH_CTE}
SELECT src, dst, weight FROM edges
WHERE weight >= 2
  AND CAST(src AS BIGINT) % 3 <> 1
  AND CAST(dst AS BIGINT) % 3 <> 1
"""

    sqls["node_regression"] = (
        "SELECT CAST((SELECT count(*) FROM embeddings) AS BIGINT) AS n_rows, "
        "CAST(1 AS BIGINT) AS fit_ok, CAST(1 AS BIGINT) AS det_ok"
    )

    # random_walks: per-node flag table (every node starts one valid walk)
    sqls["random_walks"] = (
        f"WITH {_GRAPH_CTE} "
        "SELECT node, CAST(1 AS BIGINT) AS started, "
        "CAST(1 AS BIGINT) AS hops_ok, CAST(1 AS BIGINT) AS len_ok "
        "FROM nodes"
    )

    sqls["node_similarity_cosine"] = f"""
WITH {_GRAPH_CTE},
{_UND_CTE},
norms AS (SELECT src AS node, sqrt(sum(w * w)) AS nrm FROM undw GROUP BY src),
pairs2 AS (
    SELECT a.src AS na, b.src AS nb, sum(a.w * b.w) AS num
    FROM undw a JOIN undw b ON a.dst = b.dst AND a.src < b.src
    GROUP BY a.src, b.src
)
SELECT na AS node_a, nb AS node_b,
       CAST(floor(1000000.0 * num / (x.nrm * y.nrm) + 0.5) AS BIGINT) AS sim_ppm
FROM pairs2 JOIN norms x ON x.node = na JOIN norms y ON y.node = nb
"""

    # lang_id, minhash_near_dup, simhash, dfs, node2vec, sllpa, max_k_cut,
    # celf, hashgnn, k_spanning, steiner, cnarw_sample, louvain_modularity:
    # heuristic / seeded / traversal-order operators with no faithful SQL
    # equivalent -> rows-only checks (intentional).

    sqls["eigenvector"] = f"""
WITH RECURSIVE {_GRAPH_CTE},
adj AS (SELECT DISTINCT src, dst FROM edges),
fan AS (
    SELECT src, dst, FALSE AS is_self FROM adj
    UNION ALL SELECT node, node, TRUE FROM nodes
),
st AS (
    SELECT 0 AS it, node, CAST(1 AS DOUBLE) AS r FROM nodes
    UNION ALL
    SELECT it, node, raw / greatest(sqrt(sum(raw * raw) OVER ()), 1e-300) AS r
    FROM (
        SELECT p.it + 1 AS it, f.dst AS node,
               sum(CASE WHEN f.is_self THEN 0.0 ELSE p.r END) AS raw
        FROM st p JOIN fan f ON f.src = p.node
        WHERE p.it < {_EIG_ITERS}
        GROUP BY p.it + 1, f.dst
    )
)
SELECT node, round(r, 6) AS score FROM st WHERE it = {_EIG_ITERS}
"""

    sqls["betweenness"] = f"""
WITH RECURSIVE {_GRAPH_CTE},
adj AS (SELECT DISTINCT src, dst FROM edges),
srcs AS (SELECT node AS s FROM nodes ORDER BY node LIMIT 8),
reach AS (
    SELECT s AS src, s AS node, 0 AS it FROM srcs
    UNION
    SELECT r.src, a.dst AS node, r.it + 1 AS it
    FROM reach r JOIN adj a ON a.src = r.node
    WHERE r.it < {_BC_MAXD}
),
dist AS (SELECT src, node, min(it) AS dist FROM reach GROUP BY src, node),
sig AS (
    SELECT s AS src, s AS node, 0 AS dist, CAST(1 AS DOUBLE) AS sigma FROM srcs
    UNION ALL
    SELECT g.src, d.node, d.dist, sum(g.sigma) AS sigma
    FROM sig g
    JOIN adj a ON a.src = g.node
    JOIN dist d ON d.src = g.src AND d.node = a.dst AND d.dist = g.dist + 1
    GROUP BY g.src, d.node, d.dist
),
maxd AS (SELECT src, max(dist) AS m FROM dist GROUP BY src),
del AS (
    SELECT d.src, d.node, d.dist, CAST(0 AS DOUBLE) AS delta, 0 AS it
    FROM dist d JOIN maxd m ON m.src = d.src AND d.dist = m.m
    UNION ALL
    SELECT d.src, d.node, d.dist,
           max(sv.sigma) * sum(CASE WHEN a.src IS NULL THEN 0.0
                                    ELSE (1.0 + p.delta) / sw.sigma END) AS delta,
           p.it + 1 AS it
    FROM del p
    JOIN maxd m ON m.src = p.src
    JOIN dist d ON d.src = p.src AND d.dist = m.m - p.it - 1
    JOIN sig sv ON sv.src = d.src AND sv.node = d.node
    JOIN sig sw ON sw.src = p.src AND sw.node = p.node
    LEFT JOIN adj a ON a.src = d.node AND a.dst = p.node
    GROUP BY d.src, d.node, d.dist, p.it + 1
),
bc AS (SELECT node, sum(delta) AS b FROM del WHERE node <> src GROUP BY node)
SELECT n.node AS node, round(coalesce(b.b, 0), 6) AS betweenness
FROM nodes n LEFT JOIN bc b USING(node)
"""

    # Kruskal under the strict total order (weight, lo, hi): an edge is in
    # the unique MSF of that order iff its endpoints are NOT connected by
    # strictly-smaller edges (cycle property). The engine's Boruvka uses
    # the same order, so the edge SETS match exactly.
    sqls["spanning_tree"] = f"""
WITH RECURSIVE {_GRAPH_CTE},
{_UND_CTE},
ue AS (SELECT src AS lo, dst AS hi, w FROM undw WHERE src < dst),
ranked AS (SELECT lo, hi, w, row_number() OVER (ORDER BY w, lo, hi) AS rk FROM ue),
reach AS (
    SELECT rk AS eid, lo AS node FROM ranked
    UNION
    SELECT r.eid, CASE WHEN u.lo = r.node THEN u.hi ELSE u.lo END AS node
    FROM reach r
    JOIN ranked u ON (u.lo = r.node OR u.hi = r.node) AND u.rk < r.eid
)
SELECT e.lo AS src, e.hi AS dst, e.w AS weight
FROM ranked e
WHERE NOT EXISTS (SELECT 1 FROM reach r WHERE r.eid = e.rk AND r.node = e.hi)
ORDER BY src, dst
"""

    sqls["k1_coloring_valid"] = (
        "SELECT CAST(0 AS BIGINT) AS violations, CAST(1 AS BIGINT) AS bound_ok"
    )

    sqls["k_spanning"] = f"""
WITH RECURSIVE {_GRAPH_CTE},
und AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
reach AS (
    SELECT node, node AS lab FROM nodes
    UNION
    SELECT u.dst AS node, r.lab FROM reach r JOIN und u ON u.src = r.node
),
wcc AS (SELECT node, min(lab) AS component FROM reach GROUP BY node)
SELECT CAST((SELECT count(DISTINCT component) FROM wcc) + 4 AS BIGINT)
           AS n_clusters,
       CAST(0 AS BIGINT) AS disconnected_clusters
"""

    sqls["modularity_optimization"] = (
        f"WITH {_GRAPH_CTE} "
        "SELECT CAST((SELECT count(*) FROM nodes) AS BIGINT) AS n_nodes, "
        "CAST(0 AS BIGINT) AS local_move_violations"
    )

    sqls["leiden_valid"] = (
        f"WITH {_GRAPH_CTE} "
        "SELECT CAST((SELECT count(*) FROM nodes) AS BIGINT) AS n_nodes, "
        "CAST(0 AS BIGINT) AS unassigned, "
        "CAST(0 AS BIGINT) AS disconnected_communities"
    )

    sqls["louvain_valid"] = (
        f"WITH {_GRAPH_CTE} "
        "SELECT CAST((SELECT count(*) FROM nodes) AS BIGINT) AS n_nodes, "
        "CAST(0 AS BIGINT) AS unassigned, "
        "CAST(0 AS BIGINT) AS min_member_violations, "
        "CAST(0 AS BIGINT) AS extra_level_moves"
    )

    sqls["max_k_cut"] = (
        f"WITH {_GRAPH_CTE} "
        "SELECT CAST((SELECT count(*) FROM nodes) AS BIGINT) AS n_nodes, "
        "CAST(0 AS BIGINT) AS local_move_violations, "
        "CAST(1 AS BIGINT) AS parts_ok, "
        "CAST(1 AS BIGINT) AS cut_ok"
    )

    sqls["sllpa"] = (
        f"WITH {_GRAPH_CTE} "
        "SELECT CAST((SELECT count(*) FROM nodes) AS BIGINT) AS n_nodes, "
        "CAST(0 AS BIGINT) AS dup_pairs, "
        "CAST(0 AS BIGINT) AS invalid_ids, "
        "CAST(0 AS BIGINT) AS overflow_nodes"
    )

    # simhash: fingerprint values are siphash-based (not ANSI-SQL
    # reproducible); the exactly-checkable surface is the document count
    # plus the determinism (two independent distributed runs bit-equal)
    # and empty-doc (no \S token -> fingerprint 0) contracts.
    sqls["simhash"] = (
        "SELECT CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(1 AS BIGINT) AS deterministic_ok, "
        "CAST(1 AS BIGINT) AS empty_zero_ok FROM documents"
    )

    sqls["minhash_near_dup"] = (
        "SELECT CAST((SELECT count(*) FROM documents) AS BIGINT) AS n_docs, "
        "CAST(0 AS BIGINT) AS order_violations, "
        "CAST(0 AS BIGINT) AS dup_pairs, "
        "CAST(0 AS BIGINT) AS jaccard_violations"
    )

    sqls["knn_descent"] = (
        "SELECT CAST((SELECT count(*) FROM embeddings) AS BIGINT) AS n_vectors, "
        "CAST(1 AS BIGINT) AS rows_ok, CAST(1 AS BIGINT) AS ranks_ok, "
        "CAST(1 AS BIGINT) AS recall_floor_ok"
    )

    sqls["celf"] = (
        "SELECT CAST(5 AS BIGINT) AS k_seeds, CAST(1 AS BIGINT) AS distinct_ok, "
        "CAST(1 AS BIGINT) AS valid_ids, CAST(1 AS BIGINT) AS monotone_ok, "
        "CAST(1 AS BIGINT) AS nonneg_ok"
    )

    sqls["fastrp_valid"] = (
        f"WITH {_GRAPH_CTE} "
        "SELECT CAST((SELECT count(*) FROM nodes) AS BIGINT) AS n_nodes, "
        "CAST(1 AS BIGINT) AS rows_ok, CAST(1 AS BIGINT) AS dim_ok, "
        "CAST(0 AS BIGINT) AS norm_bound_violations, "
        "CAST(1 AS BIGINT) AS deterministic_ok"
    )

    sqls["steiner"] = f"""
WITH RECURSIVE {_GRAPH_CTE},
und AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
nsz AS (SELECT count(*) AS c FROM nodes),
terms AS (
    SELECT node FROM (
        SELECT node, row_number() OVER (ORDER BY node) - 1 AS rid FROM nodes
    ) WHERE rid IN (
        (SELECT c - 1 FROM nsz),
        (SELECT CAST(floor(c / 2) AS BIGINT) FROM nsz)
    )
),
reach AS (
    SELECT (SELECT min(node) FROM nodes) AS node
    UNION
    SELECT u.dst FROM reach r JOIN und u ON u.src = r.node
)
SELECT CAST((SELECT count(*) FROM terms WHERE node IN (SELECT node FROM reach))
            AS BIGINT) AS terminals_connected,
       CAST(1 AS BIGINT) AS tree_ok,
       CAST(1 AS BIGINT) AS edges_valid
"""

    sqls["random_walks_valid"] = (
        f"WITH {_GRAPH_CTE} "
        "SELECT CAST((SELECT count(*) FROM nodes) AS BIGINT) AS num_walks, "
        "CAST(0 AS BIGINT) AS hop_violations, "
        "CAST(1 AS BIGINT) AS starts_ok, CAST(1 AS BIGINT) AS length_ok"
    )

    sqls["dfs"] = f"""
WITH RECURSIVE {_GRAPH_CTE},
src AS (SELECT min(node) AS s FROM nodes),
reach AS (SELECT s AS node FROM src
          UNION
          SELECT e.dst FROM reach r JOIN edges e ON e.src = r.node)
SELECT CAST((SELECT count(*) FROM reach) AS BIGINT) AS n_visited,
       CAST(1 AS BIGINT) AS perm_ok,
       CAST(1 AS BIGINT) AS source_first,
       CAST(1 AS BIGINT) AS parent_ok"""

    _SAMPLE_VALID_SQL = f"""
WITH RECURSIVE {_GRAPH_CTE},
und AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
srcn AS (SELECT min(node) AS s FROM nodes),
reach AS (SELECT s AS node FROM srcn
          UNION
          SELECT u.dst FROM reach r JOIN und u ON u.src = r.node)
SELECT CAST(least(50, (SELECT count(*) FROM reach)) AS BIGINT) AS n_sampled,
       CAST(1 AS BIGINT) AS distinct_ok,
       CAST(0 AS BIGINT) AS unreachable,
       CAST(1 AS BIGINT) AS has_start"""
    sqls["rwr_sample"] = _SAMPLE_VALID_SQL
    sqls["cnarw_sample"] = _SAMPLE_VALID_SQL

    _EMB_VALID_SQL = (
        f"WITH {_GRAPH_CTE} "
        "SELECT CAST((SELECT count(*) FROM nodes) AS BIGINT) AS n_rows, "
        "CAST({d} AS BIGINT) AS dim, CAST(0 AS BIGINT) AS n_nonfinite"
    )
    sqls["node2vec"] = _EMB_VALID_SQL.format(d=16)
    sqls["graphsage"] = _EMB_VALID_SQL.format(d=16)
    sqls["graphsage_multilabel"] = _EMB_VALID_SQL.format(d=16)
    sqls["hashgnn"] = (
        f"WITH {_GRAPH_CTE} "
        "SELECT CAST((SELECT count(*) FROM nodes) AS BIGINT) AS n_rows, "
        "CAST(8 AS BIGINT) AS dim, CAST(0 AS BIGINT) AS n_invalid"
    )

    sqls["node_classification"] = (
        "SELECT CAST(count(*) AS BIGINT) AS n_rows, "
        "CAST(0 AS BIGINT) AS bad_labels FROM embeddings"
    )

    sqls["biconnected_valid"] = f"""
WITH RECURSIVE {_GRAPH_CTE},
und AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
reach AS (SELECT node, node AS m FROM nodes
          UNION
          SELECT r.node, u.dst AS m FROM reach r JOIN und u ON u.src = r.m),
comp AS (SELECT node, min(m) AS c FROM reach GROUP BY node)
SELECT CAST(count(DISTINCT c) AS BIGINT) AS n_components,
       CAST(1 AS BIGINT) AS split_ok,
       CAST(1 AS BIGINT) AS endpoint_ok FROM comp"""

    sqls["link_prediction"] = (
        "SELECT CAST(5 * count(*) AS BIGINT) AS n_pos, "
        "CAST(1 AS BIGINT) AS neg_ok, CAST(1 AS BIGINT) AS acc_ok "
        "FROM embeddings"
    )

    sqls["kmeans"] = f"""
WITH RECURSIVE
v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
vd AS (
    SELECT vec_id, dim, e[dim] AS val
    FROM (SELECT vec_id, e, unnest(generate_series(1, len(e))) AS dim FROM v)
),
cent AS (
    SELECT 0 AS it, vec_id AS cid, dim, val FROM vd WHERE vec_id < 8
    UNION ALL
    SELECT asg.it, asg.cid, x2.dim, avg(x2.val) AS val
    FROM (
        SELECT it, vec_id, cid FROM (
            SELECT dd.it, dd.vec_id, dd.cid,
                   row_number() OVER (
                       PARTITION BY dd.it, dd.vec_id ORDER BY dd.d2 ASC, dd.cid ASC
                   ) AS rn
            FROM (
                SELECT p.it + 1 AS it, x.vec_id, p.cid,
                       sum((x.val - p.val) * (x.val - p.val)) AS d2
                FROM cent p JOIN vd x ON x.dim = p.dim
                WHERE p.it < {_KMEANS_ITERS}
                GROUP BY p.it + 1, x.vec_id, p.cid
            ) dd
        ) WHERE rn = 1
    ) asg
    JOIN vd x2 ON x2.vec_id = asg.vec_id
    GROUP BY asg.it, asg.cid, x2.dim
),
fin AS (
    SELECT x.vec_id, p.cid, sum((x.val - p.val) * (x.val - p.val)) AS d2
    FROM cent p JOIN vd x ON x.dim = p.dim
    WHERE p.it = {_KMEANS_ITERS}
    GROUP BY x.vec_id, p.cid
)
SELECT vec_id, CAST(cid AS BIGINT) AS cluster FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cid ASC) AS rn
    FROM fin
) WHERE rn = 1 ORDER BY vec_id
"""

    from graph_data_science_ray.stages.text import _STOPWORDS as _TEXT_STOPWORDS

    _sw_vals = ", ".join(
        f"('{lang}', '{w}')"
        for lang in sorted(_TEXT_STOPWORDS)
        for w in sorted(_TEXT_STOPWORDS[lang])
    )
    sqls["lang_id"] = f"""
WITH toks AS (
    SELECT doc_id,
           lower(unnest(regexp_extract_all(coalesce(text, ''),
               '[a-zA-Zàâçéèêëîïôûùüáíóúñäöüß]+'))) AS tok
    FROM documents
),
cnt AS (SELECT doc_id, count(*) AS n FROM toks GROUP BY doc_id),
sw(lang, w) AS (VALUES {_sw_vals}),
hits AS (
    SELECT t.doc_id, s.lang, count(*) AS h
    FROM toks t JOIN sw s ON s.w = t.tok
    GROUP BY t.doc_id, s.lang
),
langs(lang) AS (VALUES ('de'), ('en'), ('es'), ('fr')),
scores AS (
    SELECT d.doc_id, l.lang,
           coalesce(h.h, 0) * 1.0 / greatest(coalesce(c.n, 0), 1) AS score
    FROM documents d CROSS JOIN langs l
    LEFT JOIN cnt c ON c.doc_id = d.doc_id
    LEFT JOIN hits h ON h.doc_id = d.doc_id AND h.lang = l.lang
)
SELECT doc_id, CASE WHEN score > 0.02 THEN lang ELSE 'unk' END AS lang_pred
FROM (
    SELECT doc_id, lang, score,
           row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang ASC) AS rn
    FROM scores
) WHERE rn = 1 ORDER BY doc_id
"""


    sqls["node_similarity_topk"] = f"""
WITH {_GRAPH_CTE},
{_UND_CTE},
deg AS (SELECT src AS node, count(*) AS d FROM undw GROUP BY src),
common AS (
    SELECT a.src AS node_a, b.src AS node_b, count(*) AS c
    FROM undw a JOIN undw b ON a.dst = b.dst AND a.src < b.src
    GROUP BY a.src, b.src
),
simpairs AS (
    SELECT node_a, node_b,
           CAST((1000000 * c) // (da.d + db.d - c) AS BIGINT) AS sim_ppm
    FROM common
    JOIN deg da ON da.node = node_a
    JOIN deg db ON db.node = node_b
),
directed AS (
    SELECT node_a, node_b, sim_ppm FROM simpairs
    UNION ALL
    SELECT node_b AS node_a, node_a AS node_b, sim_ppm FROM simpairs
)
SELECT node_a, node_b, sim_ppm FROM (
    SELECT node_a, node_b, sim_ppm,
           row_number() OVER (
               PARTITION BY node_a ORDER BY sim_ppm DESC, node_b ASC
           ) AS rn
    FROM directed
) WHERE rn <= {_NODESIM_TOPK}
ORDER BY node_a, node_b
"""


    sqls["edges_max"] = """
WITH turns AS (
    SELECT event_type AS conv,
           row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS idx,
           CAST(user_id AS VARCHAR) AS actor, ts
    FROM events
),
gaps AS (
    SELECT a.actor AS src, b.actor AS dst,
           date_diff('microseconds', a.ts, b.ts) AS gap
    FROM turns a JOIN turns b ON a.conv = b.conv AND b.idx = a.idx + 1
    WHERE a.actor <> b.actor
)
SELECT src, dst, CAST(max(gap) AS DOUBLE) AS weight
FROM gaps GROUP BY src, dst ORDER BY src, dst
"""

    sqls["cypher_project"] = """
SELECT CAST(l_orderkey % 97 AS BIGINT) AS src,
       CAST(l_partkey % 89 AS BIGINT) AS dst,
       CAST(SUM(l_quantity * 2 + 1) AS BIGINT) AS weight
FROM lineitem
WHERE l_quantity > 45 AND l_discount < 0.05
GROUP BY 1, 2
ORDER BY src, dst
"""

    # lr_score: the same deterministic rational weights as the Ray side
    # (d=64, the embeddings-table width at every sf). predicted = argmax
    # of the 2-class logits; int-only output so float last-ulp engine
    # differences cannot flip the hash.
    _W, _b = _lr_score_weights(64)
    _w0 = "[" + ", ".join(f"{x:.1f}" for x in _W[:, 0]) + "]"
    _w1 = "[" + ", ".join(f"{x:.1f}" for x in _W[:, 1]) + "]"
    sqls["lr_score"] = f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
z AS (
    SELECT vec_id,
           list_dot_product(e, {_w0}) + {_b[0]:.2f} AS z0,
           list_dot_product(e, {_w1}) + {_b[1]:.2f} AS z1
    FROM v
)
SELECT vec_id, CAST(CASE WHEN z1 > z0 THEN 1 ELSE 0 END AS BIGINT) AS predicted
FROM z ORDER BY vec_id
"""

    # linkpred_funcs: the six gds.alpha.linkprediction.* functions over
    # pairs (a < b) of the 25 lexicographically-first actors. Integer
    # term discipline mirrors functions/linkpred.py: AA term =
    # 1e12 // floor(ln(deg)*1e6) per common neighbor, RA = 1e6 // deg.
    # `und` dedups EXPLICITLY (UNION under WITH RECURSIVE degrades to
    # UNION ALL in a non-recursive CTE — duplicate rows would double
    # degrees here, unlike the reachability oracles).
    sqls["linkpred_funcs"] = f"""
WITH RECURSIVE {_GRAPH_CTE},
und AS (
    SELECT DISTINCT src, dst FROM (
        SELECT src, dst FROM edges UNION ALL SELECT dst AS src, src AS dst FROM edges
    )
),
deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS d FROM und GROUP BY src),
degall AS (
    SELECT n.node, coalesce(g.d, 0) AS d FROM nodes n LEFT JOIN deg g USING(node)
),
sel AS (SELECT node FROM nodes ORDER BY node LIMIT 25),
prs AS (
    SELECT a.node AS node_a, b.node AS node_b
    FROM sel a JOIN sel b ON a.node < b.node
),
cmn AS (
    SELECT p.node_a, p.node_b, u1.dst AS nbr
    FROM prs p
    JOIN und u1 ON u1.src = p.node_a
    JOIN und u2 ON u2.src = p.node_b AND u2.dst = u1.dst
),
terms AS (
    SELECT c.node_a, c.node_b,
           count(*) AS cn,
           sum(1000000000000 //
               CAST(floor(ln(CAST(g.d AS DOUBLE)) * 1000000e0) AS BIGINT)) AS aa,
           sum(1000000 // g.d) AS ra
    FROM cmn c JOIN degall g ON g.node = c.nbr
    GROUP BY c.node_a, c.node_b
),
reach AS (
    SELECT node, node AS lab FROM nodes
    UNION
    SELECT u.dst AS node, r.lab FROM reach r JOIN und u ON u.src = r.node
),
comp AS (SELECT node, min(lab) AS c FROM reach GROUP BY node)
SELECT p.node_a, p.node_b,
       CAST(coalesce(t.cn, 0) AS BIGINT) AS common_neighbors,
       CAST(ga.d * gb.d AS BIGINT) AS preferential_attachment,
       CAST(ga.d + gb.d - coalesce(t.cn, 0) AS BIGINT) AS total_neighbors,
       CAST(coalesce(t.aa, 0) AS BIGINT) AS adamic_adar_ppm,
       CAST(coalesce(t.ra, 0) AS BIGINT) AS resource_allocation_ppm,
       CAST(CASE WHEN ca.c = cb.c THEN 1 ELSE 0 END AS BIGINT) AS same_community
FROM prs p
JOIN degall ga ON ga.node = p.node_a
JOIN degall gb ON gb.node = p.node_b
JOIN comp ca ON ca.node = p.node_a
JOIN comp cb ON cb.node = p.node_b
LEFT JOIN terms t ON t.node_a = p.node_a AND t.node_b = p.node_b
ORDER BY p.node_a, p.node_b
"""

    # vector_similarity: the six gds.similarity.* functions over
    # (vec i, vec i+1) pairs. Inputs quantized to milli-units (floor of
    # v*1000 in DOUBLE — float32→float64 is exact on both engines) so
    # every sum is an order-independent BIGINT; each metric then applies
    # the identical single-float association as functions/simfunc.py.
    sqls["vector_similarity"] = """
WITH q AS (
    SELECT vec_id,
           generate_subscripts(embedding, 1) AS i,
           CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000e0) AS BIGINT) AS v
    FROM embeddings
),
p AS (
    SELECT a.vec_id AS pair_id, a.v AS va, b.v AS vb
    FROM q a JOIN q b ON b.vec_id = a.vec_id + 1 AND b.i = a.i
),
sums AS (
    SELECT pair_id,
           sum(va * vb) AS sab, sum(va * va) AS saa, sum(vb * vb) AS sbb,
           sum(va) AS sa, sum(vb) AS sb,
           sum((va - vb) * (va - vb)) AS d2,
           CAST(count(*) AS BIGINT) AS d
    FROM p GROUP BY pair_id
),
inter AS (
    SELECT pair_id,
           sum(least(ca, cb)) AS im,
           sum(CASE WHEN ca > 0 AND cb > 0 THEN 1 ELSE 0 END) AS idist
    FROM (
        SELECT pair_id, val,
               count(*) FILTER (WHERE side = 0) AS ca,
               count(*) FILTER (WHERE side = 1) AS cb
        FROM (
            SELECT pair_id, va AS val, 0 AS side FROM p
            UNION ALL
            SELECT pair_id, vb AS val, 1 AS side FROM p
        )
        GROUP BY pair_id, val
    )
    GROUP BY pair_id
)
SELECT s.pair_id,
    CAST(CASE WHEN (2 * s.d - i.im) > 0
         THEN (1000000 * i.im) // (2 * s.d - i.im)
         ELSE 1000000 END AS BIGINT) AS jaccard_ppm,
    CAST((1000000 * i.idist) // s.d AS BIGINT) AS overlap_ppm,
    CAST(CASE WHEN s.saa * s.sbb = 0 THEN 0
         ELSE floor(1000000e0 * CAST(s.sab AS DOUBLE)
                    / sqrt(CAST(s.saa AS DOUBLE) * CAST(s.sbb AS DOUBLE)))
         END AS BIGINT) AS cosine_ppm,
    CAST(CASE WHEN (s.d * s.saa - s.sa * s.sa) * (s.d * s.sbb - s.sb * s.sb) <= 0
         THEN 0
         ELSE floor(1000000e0 * CAST(s.d * s.sab - s.sa * s.sb AS DOUBLE)
                    / sqrt(CAST(s.d * s.saa - s.sa * s.sa AS DOUBLE)
                           * CAST(s.d * s.sbb - s.sb * s.sb AS DOUBLE)))
         END AS BIGINT) AS pearson_ppm,
    CAST(floor(sqrt(CAST(s.d2 AS DOUBLE))) AS BIGINT) AS euclidean_distance_q,
    CAST(floor(1000000000e0 / (1000e0 + sqrt(CAST(s.d2 AS DOUBLE)))) AS BIGINT)
        AS euclidean_sim_ppm
FROM sums s JOIN inter i USING (pair_id)
ORDER BY s.pair_id
"""


    sqls["vocab_topk"] = r"""
WITH toks AS (
  SELECT lower(t) AS term
  FROM (SELECT unnest(regexp_extract_all(coalesce(text, ''), '\S+')) AS t
        FROM documents)
)
SELECT term, CAST(count(*) AS BIGINT) AS tf
FROM toks GROUP BY term
ORDER BY tf DESC, term ASC LIMIT 50"""


    sqls["hyperanf_registers"] = f"""
WITH {_GRAPH_CTE}, {_UND_CTE},
ids AS (
  SELECT node, CAST(row_number() OVER (ORDER BY node) - 1 AS BIGINT) AS gid
  FROM nodes
),
e AS (
  SELECT s.gid AS src, d.gid AS dst
  FROM undw u JOIN ids s ON s.node = u.src JOIN ids d ON d.node = u.dst
),
h AS (
  SELECT gid,
         CAST(('0x' || substr(md5(CAST(gid AS VARCHAR)), 1, 8)) AS UBIGINT)
           AS h32
  FROM ids
),
init AS (
  SELECT gid,
         CAST(h32 // 268435456 AS BIGINT) AS register,
         CAST(CASE WHEN h32 % 268435456 = 0 THEN 29
              ELSE 29 - (CAST(floor(log2(CAST(h32 % 268435456 AS DOUBLE)))
                         AS BIGINT) + 1)
              END AS BIGINT) AS rho
  FROM h
),
r1 AS MATERIALIZED (
  SELECT gid, register, max(rho) AS rho FROM (
    SELECT gid, register, rho FROM init
    UNION ALL
    SELECT e.dst AS gid, i.register, i.rho FROM e JOIN init i ON i.gid = e.src
  ) GROUP BY gid, register
),
r2 AS MATERIALIZED (
  SELECT gid, register, max(rho) AS rho FROM (
    SELECT gid, register, rho FROM r1
    UNION ALL
    SELECT e.dst AS gid, i.register, i.rho FROM e JOIN r1 i ON i.gid = e.src
  ) GROUP BY gid, register
),
r3 AS MATERIALIZED (
  SELECT gid, register, max(rho) AS rho FROM (
    SELECT gid, register, rho FROM r2
    UNION ALL
    SELECT e.dst AS gid, i.register, i.rho FROM e JOIN r2 i ON i.gid = e.src
  ) GROUP BY gid, register
),
regs AS (SELECT CAST(unnest(generate_series(0, 15)) AS BIGINT) AS register),
grid AS (SELECT ids.node, ids.gid, regs.register FROM ids CROSS JOIN regs)
SELECT g.node AS node, g.register AS register,
       CAST(coalesce(r3.rho, 0) AS BIGINT) AS rho
FROM grid g LEFT JOIN r3 ON r3.gid = g.gid AND r3.register = g.register
ORDER BY node, register"""


    sqls["k_truss"] = f"""
WITH {_GRAPH_CTE},
e0 AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v FROM edges
),
tri1 AS MATERIALIZED (
  SELECT x.u AS a, x.v AS b, y.v AS c
  FROM e0 x JOIN e0 y ON y.u = x.v
  JOIN e0 z ON z.u = x.u AND z.v = y.v
),
sup1 AS MATERIALIZED (
  SELECT u, v, CAST(count(*) AS BIGINT) AS cnt FROM (
    SELECT a AS u, b AS v FROM tri1
    UNION ALL SELECT b AS u, c AS v FROM tri1
    UNION ALL SELECT a AS u, c AS v FROM tri1
  ) GROUP BY u, v
),
e1 AS MATERIALIZED (
  SELECT e.u, e.v FROM e0 e
  LEFT JOIN sup1 s ON s.u = e.u AND s.v = e.v
  WHERE coalesce(s.cnt, 0) >= 2
),
tri2 AS MATERIALIZED (
  SELECT x.u AS a, x.v AS b, y.v AS c
  FROM e1 x JOIN e1 y ON y.u = x.v
  JOIN e1 z ON z.u = x.u AND z.v = y.v
),
sup2 AS MATERIALIZED (
  SELECT u, v, CAST(count(*) AS BIGINT) AS cnt FROM (
    SELECT a AS u, b AS v FROM tri2
    UNION ALL SELECT b AS u, c AS v FROM tri2
    UNION ALL SELECT a AS u, c AS v FROM tri2
  ) GROUP BY u, v
),
e2 AS MATERIALIZED (
  SELECT e.u, e.v FROM e1 e
  LEFT JOIN sup2 s ON s.u = e.u AND s.v = e.v
  WHERE coalesce(s.cnt, 0) >= 2
),
tri3 AS MATERIALIZED (
  SELECT x.u AS a, x.v AS b, y.v AS c
  FROM e2 x JOIN e2 y ON y.u = x.v
  JOIN e2 z ON z.u = x.u AND z.v = y.v
),
sup3 AS MATERIALIZED (
  SELECT u, v, CAST(count(*) AS BIGINT) AS cnt FROM (
    SELECT a AS u, b AS v FROM tri3
    UNION ALL SELECT b AS u, c AS v FROM tri3
    UNION ALL SELECT a AS u, c AS v FROM tri3
  ) GROUP BY u, v
),
e3 AS MATERIALIZED (
  SELECT e.u, e.v FROM e2 e
  LEFT JOIN sup3 s ON s.u = e.u AND s.v = e.v
  WHERE coalesce(s.cnt, 0) >= 2
),
tri4 AS MATERIALIZED (
  SELECT x.u AS a, x.v AS b, y.v AS c
  FROM e3 x JOIN e3 y ON y.u = x.v
  JOIN e3 z ON z.u = x.u AND z.v = y.v
),
sup4 AS MATERIALIZED (
  SELECT u, v, CAST(count(*) AS BIGINT) AS cnt FROM (
    SELECT a AS u, b AS v FROM tri4
    UNION ALL SELECT b AS u, c AS v FROM tri4
    UNION ALL SELECT a AS u, c AS v FROM tri4
  ) GROUP BY u, v
),
e4 AS MATERIALIZED (
  SELECT e.u, e.v FROM e3 e
  LEFT JOIN sup4 s ON s.u = e.u AND s.v = e.v
  WHERE coalesce(s.cnt, 0) >= 2
),
tri5 AS MATERIALIZED (
  SELECT x.u AS a, x.v AS b, y.v AS c
  FROM e4 x JOIN e4 y ON y.u = x.v
  JOIN e4 z ON z.u = x.u AND z.v = y.v
),
sup5 AS MATERIALIZED (
  SELECT u, v, CAST(count(*) AS BIGINT) AS cnt FROM (
    SELECT a AS u, b AS v FROM tri5
    UNION ALL SELECT b AS u, c AS v FROM tri5
    UNION ALL SELECT a AS u, c AS v FROM tri5
  ) GROUP BY u, v
),
e5 AS MATERIALIZED (
  SELECT e.u, e.v FROM e4 e
  LEFT JOIN sup5 s ON s.u = e.u AND s.v = e.v
  WHERE coalesce(s.cnt, 0) >= 2
),
tri6 AS MATERIALIZED (
  SELECT x.u AS a, x.v AS b, y.v AS c
  FROM e5 x JOIN e5 y ON y.u = x.v
  JOIN e5 z ON z.u = x.u AND z.v = y.v
),
sup6 AS MATERIALIZED (
  SELECT u, v, CAST(count(*) AS BIGINT) AS cnt FROM (
    SELECT a AS u, b AS v FROM tri6
    UNION ALL SELECT b AS u, c AS v FROM tri6
    UNION ALL SELECT a AS u, c AS v FROM tri6
  ) GROUP BY u, v
),
e6 AS MATERIALIZED (
  SELECT e.u, e.v FROM e5 e
  LEFT JOIN sup6 s ON s.u = e.u AND s.v = e.v
  WHERE coalesce(s.cnt, 0) >= 2
),
triF AS MATERIALIZED (
  SELECT x.u AS a, x.v AS b, y.v AS c
  FROM e6 x JOIN e6 y ON y.u = x.v
  JOIN e6 z ON z.u = x.u AND z.v = y.v
),
supF AS MATERIALIZED (
  SELECT u, v, CAST(count(*) AS BIGINT) AS cnt FROM (
    SELECT a AS u, b AS v FROM triF
    UNION ALL SELECT b AS u, c AS v FROM triF
    UNION ALL SELECT a AS u, c AS v FROM triF
  ) GROUP BY u, v
)
SELECT e.u AS src, e.v AS dst,
       CAST(coalesce(s.cnt, 0) AS BIGINT) AS support
FROM e6 e LEFT JOIN supF s ON s.u = e.u AND s.v = e.v
ORDER BY src, dst"""


    sqls["knn_pq"] = """
WITH m AS (
  SELECT max(abs(x)) AS mx FROM (
    SELECT unnest(CAST(embedding AS DOUBLE[])) AS x FROM embeddings)
),
dd AS (SELECT min(len(CAST(embedding AS DOUBLE[]))) AS D FROM embeddings),
ve AS (
  SELECT vec_id, i, CAST(floor(127 * (e[i] / m.mx)) AS BIGINT) AS qi
  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings) t,
       m,
       LATERAL (SELECT unnest(generate_series(1, len(e))) AS i) g
),
anchors AS (
  SELECT vec_id,
         row_number() OVER (
           ORDER BY CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))
                         AS UBIGINT), vec_id
         ) - 1 AS c
  FROM embeddings
),
cent0 AS MATERIALIZED (
  SELECT ((v.i - 1) * 4) // dd.D AS s, a.c, v.i, v.qi
  FROM anchors a JOIN ve v USING (vec_id), dd
  WHERE a.c < 16
),
cdr1 AS MATERIALIZED (
  SELECT v.vec_id, ct.c, ct.s,
         sum((v.qi - ct.qi) * (v.qi - ct.qi)) AS d
  FROM ve v JOIN cent0 ct ON ct.i = v.i
  GROUP BY 1, 2, 3
),
asg1 AS MATERIALIZED (
  SELECT vec_id, s, c FROM (
    SELECT vec_id, s, c,
           row_number() OVER (PARTITION BY vec_id, s ORDER BY d ASC, c ASC)
             AS rn
    FROM cdr1
  ) WHERE rn = 1
),
sums1 AS MATERIALIZED (
  SELECT a.s, a.c, v.i, sum(v.qi) AS sq, count(*) AS n
  FROM asg1 a JOIN ve v ON v.vec_id = a.vec_id, dd
  WHERE ((v.i - 1) * 4) // dd.D = a.s
  GROUP BY 1, 2, 3
),
cent1 AS MATERIALIZED (
  SELECT p.s, p.c, p.i,
         coalesce((u.sq + 127 * u.n) // u.n - 127, p.qi) AS qi
  FROM cent0 p LEFT JOIN sums1 u
    ON u.s = p.s AND u.c = p.c AND u.i = p.i
),
cdr2 AS MATERIALIZED (
  SELECT v.vec_id, ct.c, ct.s,
         sum((v.qi - ct.qi) * (v.qi - ct.qi)) AS d
  FROM ve v JOIN cent1 ct ON ct.i = v.i
  GROUP BY 1, 2, 3
),
asg2 AS MATERIALIZED (
  SELECT vec_id, s, c FROM (
    SELECT vec_id, s, c,
           row_number() OVER (PARTITION BY vec_id, s ORDER BY d ASC, c ASC)
             AS rn
    FROM cdr2
  ) WHERE rn = 1
),
sums2 AS MATERIALIZED (
  SELECT a.s, a.c, v.i, sum(v.qi) AS sq, count(*) AS n
  FROM asg2 a JOIN ve v ON v.vec_id = a.vec_id, dd
  WHERE ((v.i - 1) * 4) // dd.D = a.s
  GROUP BY 1, 2, 3
),
cent2 AS MATERIALIZED (
  SELECT p.s, p.c, p.i,
         coalesce((u.sq + 127 * u.n) // u.n - 127, p.qi) AS qi
  FROM cent1 p LEFT JOIN sums2 u
    ON u.s = p.s AND u.c = p.c AND u.i = p.i
),
cd AS (
  SELECT v.vec_id, ct.c, ct.s,
         sum((v.qi - ct.qi) * (v.qi - ct.qi)) AS d
  FROM ve v JOIN cent2 ct ON ct.i = v.i
  GROUP BY 1, 2, 3
),
codes AS (
  SELECT vec_id, s, c FROM (
    SELECT vec_id, s, c,
           row_number() OVER (PARTITION BY vec_id, s ORDER BY d ASC, c ASC)
             AS rn
    FROM cd
  ) WHERE rn = 1
),
qt AS (SELECT vec_id AS qid, c, s, d FROM cd WHERE vec_id < 10),
scored AS (
  SELECT qt.qid AS query_id, x.vec_id AS neighbor_id, sum(qt.d) AS dist
  FROM codes x JOIN qt ON qt.s = x.s AND qt.c = x.c
  WHERE x.vec_id <> qt.qid
  GROUP BY 1, 2
),
ranked AS (
  SELECT query_id, neighbor_id, dist,
         row_number() OVER (
             PARTITION BY query_id ORDER BY dist ASC, neighbor_id ASC
         ) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank,
       CAST(dist AS BIGINT) AS dist
FROM ranked WHERE rank <= 5 ORDER BY query_id, rank
"""


    sqls["hashed_features"] = r"""
WITH toks AS (
  SELECT doc_id, lower(t) AS term
  FROM (SELECT doc_id, unnest(regexp_extract_all(coalesce(text, ''), '\S+'))
          AS t
        FROM documents)
)
SELECT doc_id,
       CAST(CAST(('0x' || substr(md5(term), 1, 8)) AS UBIGINT) % 64
            AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS cnt
FROM toks GROUP BY 1, 2
ORDER BY doc_id, bucket"""


    sqls["latency_moments"] = r"""
WITH t AS (
  SELECT event_type AS conv,
         row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id)
           AS idx,
         ts
  FROM events
),
d AS (
  SELECT conv,
         date_diff('microsecond',
                   lag(ts) OVER (PARTITION BY conv ORDER BY idx), ts) AS gap
  FROM t
)
SELECT conv,
       CAST(count(gap) AS BIGINT) AS n_gaps,
       CAST(coalesce(sum(gap), 0) AS BIGINT) AS sum_us,
       CAST(coalesce(sum((gap // 1000) * (gap // 1000)), 0) AS BIGINT)
         AS sumsq_ms2
FROM d GROUP BY conv ORDER BY conv"""


    sqls["knn_ivfpq"] = """
WITH m AS (
  SELECT max(abs(x)) AS mx FROM (
    SELECT unnest(CAST(embedding AS DOUBLE[])) AS x FROM embeddings)
),
dd AS (SELECT min(len(CAST(embedding AS DOUBLE[]))) AS D FROM embeddings),
ve AS (
  SELECT vec_id, i, CAST(floor(127 * (e[i] / m.mx)) AS BIGINT) AS qi
  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings) t,
       m,
       LATERAL (SELECT unnest(generate_series(1, len(e))) AS i) g
),
anchors AS (
  SELECT vec_id,
         row_number() OVER (
           ORDER BY CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))
                         AS UBIGINT), vec_id
         ) - 1 AS c
  FROM embeddings
),
ccent0 AS MATERIALIZED (
  SELECT ((v.i - 1) * 1) // dd.D AS s, a.c, v.i, v.qi
  FROM anchors a JOIN ve v USING (vec_id), dd
  WHERE a.c < 8
),
ccdr1 AS MATERIALIZED (
  SELECT v.vec_id, ct.c, ct.s,
         sum((v.qi - ct.qi) * (v.qi - ct.qi)) AS d
  FROM ve v JOIN ccent0 ct ON ct.i = v.i
  GROUP BY 1, 2, 3
),
casg1 AS MATERIALIZED (
  SELECT vec_id, s, c FROM (
    SELECT vec_id, s, c,
           row_number() OVER (PARTITION BY vec_id, s ORDER BY d ASC, c ASC)
             AS rn
    FROM ccdr1
  ) WHERE rn = 1
),
csums1 AS MATERIALIZED (
  SELECT a.s, a.c, v.i, sum(v.qi) AS sq, count(*) AS n
  FROM casg1 a JOIN ve v ON v.vec_id = a.vec_id, dd
  WHERE ((v.i - 1) * 1) // dd.D = a.s
  GROUP BY 1, 2, 3
),
ccent1 AS MATERIALIZED (
  SELECT pp.s, pp.c, pp.i,
         coalesce((u.sq + 127 * u.n) // u.n - 127, pp.qi) AS qi
  FROM ccent0 pp LEFT JOIN csums1 u
    ON u.s = pp.s AND u.c = pp.c AND u.i = pp.i
),
ccdr2 AS MATERIALIZED (
  SELECT v.vec_id, ct.c, ct.s,
         sum((v.qi - ct.qi) * (v.qi - ct.qi)) AS d
  FROM ve v JOIN ccent1 ct ON ct.i = v.i
  GROUP BY 1, 2, 3
),
casg2 AS MATERIALIZED (
  SELECT vec_id, s, c FROM (
    SELECT vec_id, s, c,
           row_number() OVER (PARTITION BY vec_id, s ORDER BY d ASC, c ASC)
             AS rn
    FROM ccdr2
  ) WHERE rn = 1
),
csums2 AS MATERIALIZED (
  SELECT a.s, a.c, v.i, sum(v.qi) AS sq, count(*) AS n
  FROM casg2 a JOIN ve v ON v.vec_id = a.vec_id, dd
  WHERE ((v.i - 1) * 1) // dd.D = a.s
  GROUP BY 1, 2, 3
),
ccent2 AS MATERIALIZED (
  SELECT pp.s, pp.c, pp.i,
         coalesce((u.sq + 127 * u.n) // u.n - 127, pp.qi) AS qi
  FROM ccent1 pp LEFT JOIN csums2 u
    ON u.s = pp.s AND u.c = pp.c AND u.i = pp.i
),
fcent0 AS MATERIALIZED (
  SELECT ((v.i - 1) * 4) // dd.D AS s, a.c, v.i, v.qi
  FROM anchors a JOIN ve v USING (vec_id), dd
  WHERE a.c < 16
),
fcdr1 AS MATERIALIZED (
  SELECT v.vec_id, ct.c, ct.s,
         sum((v.qi - ct.qi) * (v.qi - ct.qi)) AS d
  FROM ve v JOIN fcent0 ct ON ct.i = v.i
  GROUP BY 1, 2, 3
),
fasg1 AS MATERIALIZED (
  SELECT vec_id, s, c FROM (
    SELECT vec_id, s, c,
           row_number() OVER (PARTITION BY vec_id, s ORDER BY d ASC, c ASC)
             AS rn
    FROM fcdr1
  ) WHERE rn = 1
),
fsums1 AS MATERIALIZED (
  SELECT a.s, a.c, v.i, sum(v.qi) AS sq, count(*) AS n
  FROM fasg1 a JOIN ve v ON v.vec_id = a.vec_id, dd
  WHERE ((v.i - 1) * 4) // dd.D = a.s
  GROUP BY 1, 2, 3
),
fcent1 AS MATERIALIZED (
  SELECT pp.s, pp.c, pp.i,
         coalesce((u.sq + 127 * u.n) // u.n - 127, pp.qi) AS qi
  FROM fcent0 pp LEFT JOIN fsums1 u
    ON u.s = pp.s AND u.c = pp.c AND u.i = pp.i
),
fcdr2 AS MATERIALIZED (
  SELECT v.vec_id, ct.c, ct.s,
         sum((v.qi - ct.qi) * (v.qi - ct.qi)) AS d
  FROM ve v JOIN fcent1 ct ON ct.i = v.i
  GROUP BY 1, 2, 3
),
fasg2 AS MATERIALIZED (
  SELECT vec_id, s, c FROM (
    SELECT vec_id, s, c,
           row_number() OVER (PARTITION BY vec_id, s ORDER BY d ASC, c ASC)
             AS rn
    FROM fcdr2
  ) WHERE rn = 1
),
fsums2 AS MATERIALIZED (
  SELECT a.s, a.c, v.i, sum(v.qi) AS sq, count(*) AS n
  FROM fasg2 a JOIN ve v ON v.vec_id = a.vec_id, dd
  WHERE ((v.i - 1) * 4) // dd.D = a.s
  GROUP BY 1, 2, 3
),
fcent2 AS MATERIALIZED (
  SELECT pp.s, pp.c, pp.i,
         coalesce((u.sq + 127 * u.n) // u.n - 127, pp.qi) AS qi
  FROM fcent1 pp LEFT JOIN fsums2 u
    ON u.s = pp.s AND u.c = pp.c AND u.i = pp.i
),
ccd AS (
  SELECT v.vec_id, ct.c, sum((v.qi - ct.qi) * (v.qi - ct.qi)) AS d
  FROM ve v JOIN ccent2 ct ON ct.i = v.i
  GROUP BY 1, 2
),
casg AS (
  SELECT vec_id, c FROM (
    SELECT vec_id, c,
           row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, c ASC)
             AS rn
    FROM ccd
  ) WHERE rn = 1
),
probe AS (
  SELECT vec_id AS qid, c FROM (
    SELECT vec_id, c,
           row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, c ASC)
             AS rn
    FROM ccd WHERE vec_id < 10
  ) WHERE rn <= 2
),
fcd AS (
  SELECT v.vec_id, ct.c, ct.s,
         sum((v.qi - ct.qi) * (v.qi - ct.qi)) AS d
  FROM ve v JOIN fcent2 ct ON ct.i = v.i
  GROUP BY 1, 2, 3
),
codes AS (
  SELECT vec_id, s, c FROM (
    SELECT vec_id, s, c,
           row_number() OVER (PARTITION BY vec_id, s ORDER BY d ASC, c ASC)
             AS rn
    FROM fcd
  ) WHERE rn = 1
),
qt AS (SELECT vec_id AS qid, c, s, d FROM fcd WHERE vec_id < 10),
scored AS (
  SELECT qt.qid AS query_id, x.vec_id AS neighbor_id, sum(qt.d) AS dist
  FROM codes x
  JOIN qt ON qt.s = x.s AND qt.c = x.c
  JOIN casg ON casg.vec_id = x.vec_id
  JOIN probe ON probe.qid = qt.qid AND probe.c = casg.c
  WHERE x.vec_id <> qt.qid
  GROUP BY 1, 2
),
ranked AS (
  SELECT query_id, neighbor_id, dist,
         row_number() OVER (
             PARTITION BY query_id ORDER BY dist ASC, neighbor_id ASC
         ) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank,
       CAST(dist AS BIGINT) AS dist
FROM ranked WHERE rank <= 5 ORDER BY query_id, rank
"""


    sqls["media_ahash"] = """
WITH grid AS (
  SELECT d.doc_id AS media_id, r.r, c.c,
         ((d.doc_id + 3 * r.r + 5 * c.c) % 256
          + (2 * d.doc_id + r.r) % 256
          + (d.doc_id + 7 * c.c) % 256) // 3 AS gray
  FROM documents d
  CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS r) r
  CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS c) c
),
tot AS (SELECT media_id, sum(gray) AS total FROM grid GROUP BY media_id),
bits AS (
  SELECT g.media_id, g.r * 8 + g.c AS b,
         CASE WHEN 64 * g.gray > t.total THEN 1 ELSE 0 END AS bit
  FROM grid g JOIN tot t USING (media_id)
),
nib AS (
  SELECT media_id, 15 - (b // 4) AS k,
         sum(bit * (CASE b % 4 WHEN 0 THEN 1 WHEN 1 THEN 2
                    WHEN 2 THEN 4 ELSE 8 END)) AS v
  FROM bits GROUP BY 1, 2
)
SELECT n.media_id,
       string_agg(substr('0123456789abcdef', CAST(n.v AS INTEGER) + 1, 1),
                  '' ORDER BY n.k) AS ahash,
       CAST(b.nbits AS BIGINT) AS nbits
FROM nib n
JOIN (SELECT media_id, sum(bit) AS nbits FROM bits GROUP BY 1) b
  USING (media_id)
GROUP BY n.media_id, b.nbits
ORDER BY media_id
"""


    sqls["doc_length_quantiles"] = """
SELECT 0.1e0 AS q, CAST(quantile_disc(n_chars, 0.1) AS BIGINT) AS value FROM documents
UNION ALL
SELECT 0.25e0 AS q, CAST(quantile_disc(n_chars, 0.25) AS BIGINT) AS value FROM documents
UNION ALL
SELECT 0.5e0 AS q, CAST(quantile_disc(n_chars, 0.5) AS BIGINT) AS value FROM documents
UNION ALL
SELECT 0.75e0 AS q, CAST(quantile_disc(n_chars, 0.75) AS BIGINT) AS value FROM documents
UNION ALL
SELECT 0.9e0 AS q, CAST(quantile_disc(n_chars, 0.9) AS BIGINT) AS value FROM documents
UNION ALL
SELECT 0.99e0 AS q, CAST(quantile_disc(n_chars, 0.99) AS BIGINT) AS value FROM documents
ORDER BY q
"""


    sqls["corpus_profile"] = f"""
WITH {_TOKS_CTE}
SELECT 'len_p50' AS metric,
       CAST(quantile_disc(n_chars, 0.5) AS BIGINT) AS value FROM documents
UNION ALL
SELECT 'len_p90', CAST(quantile_disc(n_chars, 0.9) AS BIGINT) FROM documents
UNION ALL
SELECT 'max_tf', CAST(max(tf) AS BIGINT)
FROM (SELECT term, sum(tf) AS tf FROM tf GROUP BY term)
UNION ALL
SELECT 'n_docs', CAST(count(*) AS BIGINT) FROM documents
UNION ALL
SELECT 'n_tokens', CAST(count(*) AS BIGINT) FROM toks
UNION ALL
SELECT 'vocab_size', CAST(count(DISTINCT term) AS BIGINT) FROM toks
ORDER BY metric
"""


    sqls["image_near_dup"] = """
WITH grid AS (
  SELECT d.doc_id AS media_id, r.r, c.c,
         ((d.doc_id * (1 + 3 * r.r + 5 * c.c)) % 256
          + (d.doc_id * d.doc_id + 7 * r.r + 11 * c.c) % 256
          + (d.doc_id * (r.r + c.c + 1) + 13) % 256) // 3 AS gray
  FROM documents d
  CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS r) r
  CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS c) c
),
tot AS (SELECT media_id, sum(gray) AS total FROM grid GROUP BY media_id),
hh AS (
  SELECT g.media_id,
         CAST(sum(CASE WHEN 64 * g.gray > t.total
                  THEN CAST(CAST(2 AS HUGEINT) ** (g.r * 8 + g.c) AS HUGEINT)
                  ELSE 0 END) AS UBIGINT) AS h
  FROM grid g JOIN tot t USING (media_id)
  GROUP BY g.media_id
)
SELECT a.media_id AS id_a, b.media_id AS id_b,
       CAST(bit_count(xor(a.h, b.h)) AS BIGINT) AS hamming
FROM hh a JOIN hh b ON a.media_id < b.media_id
WHERE bit_count(xor(a.h, b.h)) <= 3
ORDER BY id_a, id_b
"""


    sqls["audio_fingerprint"] = """
WITH grid AS (
  SELECT d.doc_id AS media_id, t.t,
         abs((d.doc_id * 13 + t.t * 7) % 4001 - 2000) AS a,
         (t.t * 64) // 256 AS frame
  FROM documents d
  CROSS JOIN (SELECT unnest(generate_series(0, 255)) AS t) t
),
fe AS (
  SELECT media_id, frame, sum(a) AS energy
  FROM grid GROUP BY 1, 2
),
tot AS (SELECT media_id, sum(energy) AS total FROM fe GROUP BY media_id),
bits AS (
  SELECT f.media_id, f.frame AS b,
         CASE WHEN 64 * f.energy > t.total THEN 1 ELSE 0 END AS bit
  FROM fe f JOIN tot t USING (media_id)
),
nib AS (
  SELECT media_id, 15 - (b // 4) AS k,
         sum(bit * (CASE b % 4 WHEN 0 THEN 1 WHEN 1 THEN 2
                    WHEN 2 THEN 4 ELSE 8 END)) AS v
  FROM bits GROUP BY 1, 2
)
SELECT n.media_id,
       string_agg(substr('0123456789abcdef', CAST(n.v AS INTEGER) + 1, 1),
                  '' ORDER BY n.k) AS afp,
       CAST(bc.nbits AS BIGINT) AS nbits
FROM nib n
JOIN (SELECT media_id, sum(bit) AS nbits FROM bits GROUP BY 1) bc
  USING (media_id)
GROUP BY n.media_id, bc.nbits
ORDER BY media_id
"""


    sqls["graph_profile"] = f"""
WITH {_GRAPH_CTE},
{_UND_CTE},
fwd AS (
    SELECT DISTINCT
        CASE WHEN src < dst THEN src ELSE dst END AS a,
        CASE WHEN src < dst THEN dst ELSE src END AS b
    FROM edges
),
tri AS (
    SELECT e1.a AS x, e1.b AS y, e3.b AS z
    FROM fwd e1
    JOIN fwd e2 ON e2.a = e1.b
    JOIN fwd e3 ON e3.a = e1.a AND e3.b = e2.b
),
vv AS (SELECT count(*) AS v FROM nodes),
ee AS (SELECT count(*) AS e FROM edges)
SELECT 'density_ppm' AS metric,
       CAST(1000000 * ee.e // (vv.v * (vv.v - 1)) AS BIGINT) AS value
FROM vv, ee
UNION ALL
SELECT 'max_degree', CAST(max(d) AS BIGINT)
FROM (SELECT src, count(*) AS d FROM undw GROUP BY src)
UNION ALL
SELECT 'n_edges', CAST(count(*) AS BIGINT) FROM edges
UNION ALL
SELECT 'n_nodes', CAST(count(*) AS BIGINT) FROM nodes
UNION ALL
SELECT 'n_und_edges', CAST(count(*) AS BIGINT) FROM fwd
UNION ALL
SELECT 'triangles', CAST(count(*) AS BIGINT) FROM tri
ORDER BY metric
"""

    # fixed-round BFS closure (K=4 >= directed diameter at both test
    # scales; post-fixpoint rounds are no-ops under the min-aggregate,
    # so early engine convergence stays equal — the apsp discipline)
    _ecc_closure = f"""
WITH RECURSIVE {_GRAPH_CTE},
fan AS (
    SELECT src, dst, 1 AS w FROM edges
    UNION ALL
    SELECT node, node, 0 FROM nodes
),
dist AS (
    SELECT 0 AS it, node AS source, node AS target, 0 AS d FROM nodes
    UNION ALL
    SELECT p.it + 1 AS it, p.source AS source, f.dst AS target,
           min(p.d + f.w) AS d
    FROM dist p JOIN fan f ON f.src = p.target
    WHERE p.it < {_ECC_ROUNDS}
    GROUP BY p.it, p.source, f.dst
),
ecc AS (
    SELECT source, max(d) AS e FROM dist
    WHERE it = {_ECC_ROUNDS} GROUP BY source
)"""

    sqls["eccentricity"] = (
        _ecc_closure
        + "\nSELECT source AS node, CAST(e AS BIGINT) AS ecc FROM ecc"
    )

    sqls["graph_diameter"] = (
        _ecc_closure
        + """
SELECT 'diameter' AS metric, CAST(max(e) AS BIGINT) AS value FROM ecc
UNION ALL
SELECT 'radius', CAST(min(e) AS BIGINT) FROM ecc
ORDER BY metric"""
    )

    # ordered funnel: stage k's reach time = earliest stage-k event
    # STRICTLY after the stage-(k-1) reach time (min-time greedy)
    sqls["funnel"] = """
WITH s0 AS (
  SELECT user_id, min(ts) AS t FROM events
  WHERE event_type = 'signup' GROUP BY 1
),
s1 AS (
  SELECT e.user_id, min(e.ts) AS t FROM events e
  JOIN s0 ON s0.user_id = e.user_id AND e.ts > s0.t
  WHERE e.event_type = 'view' GROUP BY 1
),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t FROM events e
  JOIN s1 ON s1.user_id = e.user_id AND e.ts > s1.t
  WHERE e.event_type = 'click' GROUP BY 1
),
s3 AS (
  SELECT e.user_id, min(e.ts) AS t FROM events e
  JOIN s2 ON s2.user_id = e.user_id AND e.ts > s2.t
  WHERE e.event_type = 'purchase' GROUP BY 1
)
SELECT * FROM (
  SELECT CAST(0 AS BIGINT) AS stage_idx, 'signup' AS stage,
         CAST((SELECT count(*) FROM s0) AS BIGINT) AS users
  UNION ALL SELECT 1, 'view', (SELECT count(*) FROM s1)
  UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2)
  UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3)
) ORDER BY stage_idx
"""

    sqls["retention_cohorts"] = """
WITH d AS (
  SELECT user_id,
         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
  FROM events
),
c AS (SELECT user_id, min(day) AS cohort FROM d GROUP BY 1),
a AS (
  SELECT DISTINCT d.user_id, c.cohort, d.day - c.cohort AS off
  FROM d JOIN c ON c.user_id = d.user_id
)
SELECT cohort AS cohort_day, off AS offset_days,
       CAST(count(*) AS BIGINT) AS users
FROM a GROUP BY 1, 2 ORDER BY 1, 2
"""

    sqls["actor_trigrams"] = """
WITH t AS (
  SELECT event_type AS conv,
         row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id)
           AS idx,
         CAST(user_id AS VARCHAR) AS actor
  FROM events
),
l AS (
  SELECT conv, actor,
         lag(actor) OVER (PARTITION BY conv ORDER BY idx) AS p1,
         lag(actor, 2) OVER (PARTITION BY conv ORDER BY idx) AS p2
  FROM t
)
SELECT p2 || '>' || p1 || '>' || actor AS gram,
       CAST(count(*) AS BIGINT) AS cnt
FROM l WHERE p2 IS NOT NULL
GROUP BY 1 ORDER BY 1
"""

    # PMI collocations: every ln floored to integer ppm independently
    # (the unigram_nll discipline), then pure BIGINT arithmetic
    sqls["pmi_bigrams"] = r"""
WITH toks AS (
  SELECT doc_id,
         list_transform(regexp_extract_all(coalesce(text, ''), '\S+'),
                        x -> lower(x)) AS arr
  FROM documents
),
bg AS (
  SELECT arr[i] AS w1, arr[i+1] AS w2
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(arr)-1)) AS i) g
  WHERE len(arr) >= 2
),
cb AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_xy FROM bg GROUP BY 1, 2),
tot AS (SELECT sum(c_xy) AS t FROM cb),
cx AS (SELECT w1, CAST(floor(ln(CAST(sum(c_xy) AS DOUBLE)) * 1000000e0)
               AS BIGINT) AS lnx FROM cb GROUP BY 1),
cy AS (SELECT w2, CAST(floor(ln(CAST(sum(c_xy) AS DOUBLE)) * 1000000e0)
               AS BIGINT) AS lny FROM cb GROUP BY 1)
SELECT b.w1, b.w2, b.c_xy,
       CAST(floor(ln(CAST((SELECT t FROM tot) AS DOUBLE)) * 1000000e0)
            AS BIGINT)
       + CAST(floor(ln(CAST(b.c_xy AS DOUBLE)) * 1000000e0) AS BIGINT)
       - cx.lnx - cy.lny AS pmi_ppm
FROM cb b
JOIN cx ON cx.w1 = b.w1
JOIN cy ON cy.w2 = b.w2
WHERE b.c_xy >= 5
ORDER BY b.w1, b.w2
"""

    sqls["readability"] = r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(coalesce(text, ''), '[A-Za-z]+'))
            AS BIGINT) AS n_words,
       CAST(CASE
         WHEN len(regexp_extract_all(coalesce(text, ''), '[A-Za-z]+')) = 0
         THEN 0
         ELSE greatest(1, len(list_filter(
           regexp_extract_all(coalesce(text, ''), '[^.!?]+'),
           s -> regexp_matches(s, '[A-Za-z]+'))))
       END AS BIGINT) AS n_sentences,
       CAST(coalesce(list_sum(list_transform(
         regexp_extract_all(lower(coalesce(text, '')), '[a-z]+'),
         w -> greatest(1, len(regexp_extract_all(w, '[aeiouy]+'))))), 0)
       AS BIGINT) AS n_syllables
FROM documents ORDER BY doc_id
"""

    sqls["pca_power"] = _pca_oracle_sql()

    sqls["four_cliques"] = f"""
WITH {_GRAPH_CTE},
u AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
tri AS MATERIALIZED (
  SELECT ab.src AS a, ab.dst AS b, ac.dst AS c
  FROM u ab
  JOIN u ac ON ac.src = ab.src AND ac.dst > ab.dst
  JOIN u bc ON bc.src = ab.dst AND bc.dst = ac.dst
  WHERE ab.src < ab.dst
),
q AS MATERIALIZED (
  SELECT t.a, t.b, t.c, cd.dst AS d
  FROM tri t
  JOIN u cd ON cd.src = t.c AND cd.dst > t.c
  JOIN u ad ON ad.src = t.a AND ad.dst = cd.dst
  JOIN u bd ON bd.src = t.b AND bd.dst = cd.dst
),
m AS (
  SELECT node, count(*) AS k4 FROM (
    SELECT a AS node FROM q UNION ALL SELECT b FROM q
    UNION ALL SELECT c FROM q UNION ALL SELECT d FROM q
  ) GROUP BY node
)
SELECT n.node, CAST(coalesce(m.k4, 0) AS BIGINT) AS k4
FROM nodes n LEFT JOIN m USING (node) ORDER BY n.node
"""

    sqls["zipf_fit"] = r"""
WITH toks AS (
  SELECT lower(t) AS term
  FROM (SELECT unnest(regexp_extract_all(coalesce(text, ''), '\S+')) AS t
        FROM documents)
),
tc AS (SELECT term, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY term),
top AS (
  SELECT tf, row_number() OVER (ORDER BY tf DESC, term ASC) AS r
  FROM tc QUALIFY r <= 64
),
v AS (
  SELECT CAST(floor(ln(CAST(r AS DOUBLE)) * 1000000e0) AS BIGINT) AS x,
         CAST(floor(ln(CAST(tf AS DOUBLE)) * 1000000e0) AS BIGINT) AS y
  FROM top
),
s AS (SELECT count(*) AS kk, sum(x) AS sx, sum(y) AS sy,
             sum(x*y) AS sxy, sum(x*x) AS sxx FROM v)
SELECT CAST(kk AS BIGINT) AS k,
       CAST(kk*sxy - sx*sy AS BIGINT) AS slope_num,
       CAST(kk*sxx - sx*sx AS BIGINT) AS slope_den FROM s
"""

    sqls["degree_gini"] = f"""
WITH {_GRAPH_CTE},
deg AS (
  SELECT n.node, CAST(coalesce(c.c, 0) AS BIGINT) AS dv
  FROM nodes n
  LEFT JOIN (SELECT src, count(*) AS c FROM edges GROUP BY src) c
    ON c.src = n.node
),
h AS (SELECT dv, CAST(count(*) AS BIGINT) AS c FROM deg GROUP BY dv),
w AS (
  SELECT dv, c,
         CAST(coalesce(sum(c) OVER (ORDER BY dv
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS sp
  FROM h
),
s AS (SELECT sum(c) AS n, sum(dv*c) AS tot,
             sum(dv*(sp*c + c*(c+1)//2)) AS sr FROM w)
SELECT CAST(n AS BIGINT) AS n_nodes,
       CAST(2*sr - (n+1)*tot AS BIGINT) AS gini_num,
       CAST(n*tot AS BIGINT) AS gini_den FROM s
"""

    sqls["katz"] = _katz_oracle_sql()

    sqls["props_field_stats"] = r"""
WITH x AS (
  SELECT event_type,
         regexp_extract(coalesce(props, ''), '"k"\s*:\s*(-?\d+)', 1) AS s
  FROM events
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(s AS BIGINT)) AS BIGINT) AS sum_v,
       CAST(min(CAST(s AS BIGINT)) AS BIGINT) AS min_v,
       CAST(max(CAST(s AS BIGINT)) AS BIGINT) AS max_v
FROM x WHERE s <> '' GROUP BY 1 ORDER BY 1
"""

    sqls["value_stats"] = """
WITH x AS (
  SELECT event_type, CAST(floor(value * 100e0 + 0.5e0) AS BIGINT) AS c
  FROM events WHERE value IS NOT NULL
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(c) AS BIGINT) AS sum_cents,
       CAST(min(c) AS BIGINT) AS min_cents,
       CAST(max(c) AS BIGINT) AS max_cents
FROM x GROUP BY 1 ORDER BY 1
"""

    sqls["funnel_latency"] = """
WITH s0 AS (
  SELECT user_id, min(ts) AS t FROM events
  WHERE event_type = 'signup' GROUP BY 1
),
s1 AS (
  SELECT e.user_id, min(e.ts) AS t, any_value(s0.t) AS pt FROM events e
  JOIN s0 ON s0.user_id = e.user_id AND e.ts > s0.t
  WHERE e.event_type = 'view' GROUP BY 1
),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t, any_value(s1.t) AS pt FROM events e
  JOIN s1 ON s1.user_id = e.user_id AND e.ts > s1.t
  WHERE e.event_type = 'click' GROUP BY 1
),
s3 AS (
  SELECT e.user_id, min(e.ts) AS t, any_value(s2.t) AS pt FROM events e
  JOIN s2 ON s2.user_id = e.user_id AND e.ts > s2.t
  WHERE e.event_type = 'purchase' GROUP BY 1
)
SELECT * FROM (
  SELECT CAST(0 AS BIGINT) AS stage_idx, 'signup' AS stage,
         CAST((SELECT count(*) FROM s0) AS BIGINT) AS users,
         CAST(0 AS BIGINT) AS sum_gap_us, CAST(0 AS BIGINT) AS max_gap_us
  UNION ALL SELECT 1, 'view', (SELECT count(*) FROM s1),
    CAST(coalesce((SELECT sum(epoch_us(t) - epoch_us(pt)) FROM s1), 0) AS BIGINT),
    CAST(coalesce((SELECT max(epoch_us(t) - epoch_us(pt)) FROM s1), 0) AS BIGINT)
  UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2),
    CAST(coalesce((SELECT sum(epoch_us(t) - epoch_us(pt)) FROM s2), 0) AS BIGINT),
    CAST(coalesce((SELECT max(epoch_us(t) - epoch_us(pt)) FROM s2), 0) AS BIGINT)
  UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3),
    CAST(coalesce((SELECT sum(epoch_us(t) - epoch_us(pt)) FROM s3), 0) AS BIGINT),
    CAST(coalesce((SELECT max(epoch_us(t) - epoch_us(pt)) FROM s3), 0) AS BIGINT)
) ORDER BY stage_idx
"""

    sqls["product_report"] = """
WITH s0 AS (
  SELECT user_id, min(ts) AS t FROM events
  WHERE event_type = 'signup' GROUP BY 1
),
s1 AS (
  SELECT e.user_id, min(e.ts) AS t FROM events e
  JOIN s0 ON s0.user_id = e.user_id AND e.ts > s0.t
  WHERE e.event_type = 'view' GROUP BY 1
),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t FROM events e
  JOIN s1 ON s1.user_id = e.user_id AND e.ts > s1.t
  WHERE e.event_type = 'click' GROUP BY 1
),
s3 AS (
  SELECT e.user_id, min(e.ts) AS t FROM events e
  JOIN s2 ON s2.user_id = e.user_id AND e.ts > s2.t
  WHERE e.event_type = 'purchase' GROUP BY 1
),
d AS (
  SELECT user_id, CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
  FROM events
),
c AS (SELECT user_id, min(day) AS cohort FROM d GROUP BY 1),
a AS (
  SELECT DISTINCT d.user_id, c.cohort, d.day - c.cohort AS off
  FROM d JOIN c ON c.user_id = d.user_id
),
o AS (
  SELECT user_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
  FROM events
),
sess AS (
  SELECT user_id,
         sum(CASE WHEN pts IS NULL
                  OR epoch_us(ts) - epoch_us(pts) > 1800000000
                  THEN 1 ELSE 0 END) AS ns
  FROM o GROUP BY 1
)
SELECT * FROM (
  SELECT 'funnel_signup' AS metric,
         CAST((SELECT count(*) FROM s0) AS BIGINT) AS value
  UNION ALL SELECT 'funnel_view', (SELECT count(*) FROM s1)
  UNION ALL SELECT 'funnel_click', (SELECT count(*) FROM s2)
  UNION ALL SELECT 'funnel_purchase', (SELECT count(*) FROM s3)
  UNION ALL SELECT 'cohorts', (SELECT count(DISTINCT cohort) FROM a)
  UNION ALL SELECT 'active_user_days', (SELECT count(*) FROM a)
  UNION ALL SELECT 'max_offset_days', (SELECT max(off) FROM a)
  UNION ALL SELECT 'sessions_total', (SELECT sum(ns) FROM sess)
  UNION ALL SELECT 'sessionized_users', (SELECT count(*) FROM sess)
) ORDER BY metric
"""

    sqls["ams_registers"] = r"""
WITH toks AS (
  SELECT unnest(regexp_extract_all(coalesce(text, ''), '\S+')) AS t
  FROM documents
),
tc AS (SELECT t, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY t),
rows_ AS (SELECT unnest(generate_series(0, 15)) AS srow),
signed AS (
  SELECT r.srow,
         CASE WHEN CAST(('0x' || substr(md5(tc.t || ':ams' ||
                CAST(r.srow AS VARCHAR)), 1, 8)) AS UBIGINT) % 2 = 0
              THEN tc.c ELSE -tc.c END AS sv
  FROM tc CROSS JOIN rows_ r
)
SELECT r.srow, CAST(coalesce(s.sv, 0) AS BIGINT) AS s
FROM rows_ r LEFT JOIN (
  SELECT srow, sum(sv) AS sv FROM signed GROUP BY srow
) s USING (srow)
ORDER BY r.srow
"""

    sqls["conversation_dedup"] = """
WITH t AS (
  SELECT event_type AS conv,
         row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id)
           AS idx,
         props AS txt
  FROM events
),
ct AS (SELECT conv, string_agg(txt, ' ' ORDER BY idx) AS text
       FROM t GROUP BY conv),
k AS (SELECT text, min(conv) AS keeper FROM ct GROUP BY text)
SELECT ct.conv,
       CAST(CASE WHEN ct.conv = k.keeper THEN 1 ELSE 0 END AS BIGINT)
         AS keep
FROM ct JOIN k ON k.text = ct.text ORDER BY ct.conv
"""

    sqls["tool_latency"] = """
WITH t AS (
  SELECT event_type AS conv,
         row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id)
           AS idx,
         CASE WHEN event_id % 3 = 0
              THEN 'tool:t' || CAST(user_id % 7 AS VARCHAR)
              ELSE 'role:' || CAST(user_id AS VARCHAR) END AS actor,
         ts
  FROM events
),
l AS (
  SELECT conv, actor, ts,
         lag(ts) OVER (PARTITION BY conv ORDER BY idx) AS pts
  FROM t
)
SELECT actor AS tool, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(epoch_us(ts) - epoch_us(pts)) AS BIGINT) AS sum_us,
       CAST(max(epoch_us(ts) - epoch_us(pts)) AS BIGINT) AS max_us
FROM l
WHERE pts IS NOT NULL AND actor LIKE 'tool:%'
GROUP BY 1 ORDER BY 1
"""

    sqls["monologue_runs"] = """
WITH t AS (
  SELECT event_type AS conv,
         row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id)
           AS idx,
         CAST(user_id AS VARCHAR) AS actor
  FROM events
),
ch AS (
  SELECT conv, idx, actor,
         CASE WHEN lag(actor) OVER (PARTITION BY conv ORDER BY idx)
                   IS DISTINCT FROM actor THEN 1 ELSE 0 END AS chg
  FROM t
),
runs AS (
  SELECT conv, sum(chg) OVER (
    PARTITION BY conv ORDER BY idx
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) AS run_id
  FROM ch
),
rl AS (SELECT conv, run_id, count(*) AS len FROM runs GROUP BY 1, 2)
SELECT conv, CAST(count(*) AS BIGINT) AS n_runs,
       CAST(max(len) AS BIGINT) AS max_run,
       CAST(coalesce(sum(CASE WHEN len > 1 THEN len END), 0) AS BIGINT)
         AS sum_run_gt1
FROM rl GROUP BY conv ORDER BY conv
"""

    sqls["wl_colors"] = _wl_oracle_sql()

    sqls["mis"] = _mis_oracle_sql()

    sqls["ldp_features"] = f"""
WITH {_GRAPH_CTE}, {_UND_CTE},
deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS degree
        FROM undw GROUP BY 1),
nb AS (SELECT e.src AS node,
              CAST(min(d.degree) AS BIGINT) AS nbr_min,
              CAST(max(d.degree) AS BIGINT) AS nbr_max,
              CAST(sum(d.degree) AS BIGINT) AS nbr_sum,
              CAST(sum(d.degree * d.degree) AS BIGINT) AS nbr_sumsq
       FROM undw e JOIN deg d ON d.node = e.dst GROUP BY 1)
SELECT n.node,
       CAST(coalesce(g.degree, 0) AS BIGINT) AS degree,
       CAST(coalesce(nb.nbr_min, 0) AS BIGINT) AS nbr_min,
       CAST(coalesce(nb.nbr_max, 0) AS BIGINT) AS nbr_max,
       CAST(coalesce(nb.nbr_sum, 0) AS BIGINT) AS nbr_sum,
       CAST(coalesce(nb.nbr_sumsq, 0) AS BIGINT) AS nbr_sumsq
FROM nodes n LEFT JOIN deg g USING (node) LEFT JOIN nb USING (node)
ORDER BY node
"""

    sqls["turn_cooccurrence"] = r"""
WITH t AS (
  SELECT event_type AS conv,
         row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id)
           AS idx,
         CAST(user_id AS VARCHAR) AS actor
  FROM events
)
SELECT a.actor AS prev_role, b.actor AS role,
       CAST(b.idx - a.idx AS BIGINT) AS gap,
       CAST(count(*) AS BIGINT) AS n
FROM t a JOIN t b ON a.conv = b.conv AND b.idx - a.idx BETWEEN 1 AND 3
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""

    _markov_rounds = []
    for _r in range(_MARKOV_ROUNDS):
        _markov_rounds.append(f"""x{_r + 1} AS MATERIALIZED (
  SELECT a.actor, CAST(coalesce(s.m, 0) AS BIGINT) AS v
  FROM actors a LEFT JOIN (
      SELECT tr.actor, sum((x.v * tr.n) // od.o) AS m
      FROM tr JOIN x{_r} x ON x.actor = tr.prev JOIN od ON od.prev = tr.prev
      GROUP BY 1) s USING (actor))""")
    sqls["markov_stationary"] = (
        r"""
WITH t AS (
  SELECT event_type AS conv,
         row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id)
           AS idx,
         CAST(user_id AS VARCHAR) AS actor
  FROM events
),
l AS (
  SELECT conv, actor,
         lag(actor) OVER (PARTITION BY conv ORDER BY idx) AS prev
  FROM t
),
tr AS MATERIALIZED (
  SELECT prev, actor, CAST(count(*) AS BIGINT) AS n
  FROM l WHERE prev IS NOT NULL GROUP BY 1, 2),
od AS (SELECT prev, CAST(sum(n) AS BIGINT) AS o FROM tr GROUP BY 1),
actors AS (SELECT DISTINCT actor FROM (
  SELECT prev AS actor FROM tr UNION SELECT actor FROM tr)),
x0 AS (SELECT actor, CAST(1000000 AS BIGINT) AS v FROM actors),
"""
        + ",\n".join(_markov_rounds)
        + f"\nSELECT actor AS role, v AS mass FROM x{_MARKOV_ROUNDS}"
        " ORDER BY role"
    )

    sqls["temporal_reachability"] = r"""
WITH t AS (
  SELECT event_type AS conv,
         row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id)
           AS idx,
         CAST(user_id AS VARCHAR) AS actor,
         ts
  FROM events
),
c AS MATERIALIZED (
  SELECT a.actor AS src, b.actor AS dst,
         CAST(epoch_us(b.ts) AS BIGINT) AS t
  FROM t a JOIN t b ON a.conv = b.conv AND b.idx = a.idx + 1
  WHERE a.actor <> b.actor
),
a0 AS MATERIALIZED (
  SELECT min(actor) AS node, CAST(0 AS BIGINT) AS at FROM t),
a1 AS MATERIALIZED (
  SELECT node, CAST(min(at) AS BIGINT) AS at FROM (
    SELECT node, at FROM a0
    UNION ALL
    SELECT c.dst AS node, c.t AS at
    FROM c JOIN a0 ar ON ar.node = c.src AND ar.at <= c.t
  ) GROUP BY 1),
a2 AS MATERIALIZED (
  SELECT node, CAST(min(at) AS BIGINT) AS at FROM (
    SELECT node, at FROM a1
    UNION ALL
    SELECT c.dst AS node, c.t AS at
    FROM c JOIN a1 ar ON ar.node = c.src AND ar.at <= c.t
  ) GROUP BY 1),
a3 AS MATERIALIZED (
  SELECT node, CAST(min(at) AS BIGINT) AS at FROM (
    SELECT node, at FROM a2
    UNION ALL
    SELECT c.dst AS node, c.t AS at
    FROM c JOIN a2 ar ON ar.node = c.src AND ar.at <= c.t
  ) GROUP BY 1),
a4 AS MATERIALIZED (
  SELECT node, CAST(min(at) AS BIGINT) AS at FROM (
    SELECT node, at FROM a3
    UNION ALL
    SELECT c.dst AS node, c.t AS at
    FROM c JOIN a3 ar ON ar.node = c.src AND ar.at <= c.t
  ) GROUP BY 1),
a5 AS MATERIALIZED (
  SELECT node, CAST(min(at) AS BIGINT) AS at FROM (
    SELECT node, at FROM a4
    UNION ALL
    SELECT c.dst AS node, c.t AS at
    FROM c JOIN a4 ar ON ar.node = c.src AND ar.at <= c.t
  ) GROUP BY 1),
a6 AS MATERIALIZED (
  SELECT node, CAST(min(at) AS BIGINT) AS at FROM (
    SELECT node, at FROM a5
    UNION ALL
    SELECT c.dst AS node, c.t AS at
    FROM c JOIN a5 ar ON ar.node = c.src AND ar.at <= c.t
  ) GROUP BY 1)
SELECT node, at FROM a6 ORDER BY node
"""

    sqls["salsa"] = _salsa_oracle_sql()

    sqls["seeded_propagation"] = _spread_oracle_sql()

    sqls["user_paths"] = r"""
WITH o AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS rn
  FROM events
),
p AS (
  SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
  FROM o WHERE rn <= 8 GROUP BY user_id
),
c AS (SELECT path, CAST(count(*) AS BIGINT) AS n FROM p GROUP BY 1)
SELECT path, n FROM c ORDER BY n DESC, path LIMIT 20
"""

    sqls["maximal_matching"] = _matching_oracle_sql()

    sqls["triad_census"] = f"""
WITH {_GRAPH_CTE}, {_UND_CTE},
vv AS (SELECT CAST(count(*) AS BIGINT) AS v FROM nodes),
deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS d
        FROM undw GROUP BY 1),
mom AS (SELECT CAST(coalesce(sum(d), 0) AS BIGINT) AS sum_d,
               CAST(coalesce(sum(d * d), 0) AS BIGINT) AS sum_d2,
               CAST(coalesce(sum(d * (d - 1) // 2), 0) AS BIGINT) AS p2
        FROM deg),
tri AS (SELECT CAST(count(*) // 6 AS BIGINT) AS t
        FROM undw e1
        JOIN undw e2 ON e2.src = e1.dst
        JOIN undw e3 ON e3.src = e2.dst AND e3.dst = e1.src),
dy AS (SELECT CAST(coalesce(sum(CASE WHEN cnt = 2 THEN 1 ELSE 0 END), 0)
                   AS BIGINT) AS mut,
              CAST(count(*) AS BIGINT) AS linked
       FROM (SELECT least(src, dst) AS a, greatest(src, dst) AS b,
                    count(*) AS cnt
             FROM edges GROUP BY 1, 2))
SELECT v.v AS v,
       m.sum_d // 2 AS e,
       dy.mut AS dyad_mut,
       dy.linked - dy.mut AS dyad_asym,
       v.v * (v.v - 1) // 2 - dy.linked AS dyad_null,
       t.t AS tri_closed,
       m.p2 - 3 * t.t AS tri_wedge,
       (m.sum_d // 2) * (v.v - 2) - m.sum_d2 + 2 * (m.sum_d // 2)
         + 3 * t.t AS tri_one_edge,
       v.v * (v.v - 1) * (v.v - 2) // 6 - t.t - (m.p2 - 3 * t.t)
         - ((m.sum_d // 2) * (v.v - 2) - m.sum_d2 + 2 * (m.sum_d // 2)
            + 3 * t.t) AS tri_empty
FROM vv v, mom m, tri t, dy
"""

    sqls["dedup_cap"] = r"""
WITH r AS (
  SELECT doc_id,
         CAST(row_number() OVER (
             PARTITION BY md5(coalesce(text, ''))
             ORDER BY md5(CAST(doc_id AS VARCHAR) || ':cap'), doc_id)
           AS BIGINT) AS copy_rank
  FROM documents
)
SELECT doc_id, copy_rank,
       CAST(CASE WHEN copy_rank <= 2 THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM r ORDER BY doc_id
"""

    sqls["tool_chains"] = r"""
WITH t AS (
  SELECT event_type AS conv, event_id, user_id,
         row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id)
           AS idx
  FROM events
),
tt AS (
  SELECT conv, idx, 't' || CAST(user_id % 7 AS VARCHAR) AS tool
  FROM t WHERE event_id % 3 = 0
),
ch AS (
  SELECT conv, string_agg(tool, '>' ORDER BY idx) AS chain
  FROM tt GROUP BY conv
),
c AS (SELECT chain, CAST(count(*) AS BIGINT) AS n FROM ch GROUP BY 1)
SELECT chain, n FROM c ORDER BY n DESC, chain LIMIT 20
"""

    sqls["transition_latency"] = r"""
WITH t AS (
  SELECT event_type AS conv,
         row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id)
           AS idx,
         CAST(user_id AS VARCHAR) AS actor, ts
  FROM events
),
l AS (
  SELECT conv, actor,
         lag(actor) OVER (PARTITION BY conv ORDER BY idx) AS prev,
         CAST(epoch_us(ts) AS BIGINT)
           - CAST(epoch_us(lag(ts) OVER (PARTITION BY conv ORDER BY idx))
                  AS BIGINT) AS gap
  FROM t
)
SELECT prev AS prev_role, actor AS role,
       CAST(count(*) AS BIGINT) AS n,
       CAST(min(gap) AS BIGINT) AS min_us,
       CAST(max(gap) AS BIGINT) AS max_us,
       CAST(quantile_disc(gap, 0.5) AS BIGINT) AS p5,
       CAST(quantile_disc(gap, 0.9) AS BIGINT) AS p9,
       CAST(quantile_disc(gap, 0.99) AS BIGINT) AS p99
FROM l WHERE prev IS NOT NULL
GROUP BY 1, 2 ORDER BY 1, 2
"""

    sqls["robustness_profile"] = _robustness_oracle_sql()

    sqls["knn_hamming"] = r"""
WITH p AS (
  SELECT vec_id,
         CAST(sum(CASE WHEN embedding[i] >= 0
                       THEN (CAST(1 AS BIGINT) << (i - 1)) ELSE 0 END)
           AS BIGINT) AS lo,
         CAST(sum(CASE WHEN embedding[i + 32] >= 0
                       THEN (CAST(1 AS BIGINT) << (i - 1)) ELSE 0 END)
           AS BIGINT) AS hi
  FROM embeddings,
       LATERAL (SELECT unnest(generate_series(1, 32)) AS i) g
  GROUP BY vec_id
),
q AS (SELECT * FROM p WHERE vec_id IN (1, 2, 3)),
d AS (
  SELECT q.vec_id AS query_id, p.vec_id,
         CAST(bit_count(xor(q.lo, p.lo)) + bit_count(xor(q.hi, p.hi))
           AS BIGINT) AS hamming
  FROM q JOIN p ON p.vec_id <> q.vec_id
),
r AS (
  SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY hamming, vec_id) AS rk
  FROM d
)
SELECT query_id, vec_id, hamming FROM r WHERE rk <= 10
ORDER BY query_id, hamming, vec_id
"""

    sqls["coarsen_graph"] = _coarsen_oracle_sql()

    sqls["topic_segments"] = rf"""
WITH t AS (
  SELECT event_type AS conv,
         row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id)
           AS idx,
         props AS txt
  FROM events
),
tk AS (
  SELECT conv, idx,
         list_distinct(list_filter(
             string_split_regex(lower(coalesce(txt, '')), '\s+'),
             x -> x <> '')) AS arr
  FROM t
),
l AS (
  SELECT conv, idx, arr,
         lag(arr) OVER (PARTITION BY conv ORDER BY idx) AS prev
  FROM tk
),
sim AS (
  SELECT conv, idx,
         CASE WHEN prev IS NULL THEN CAST(1 AS BIGINT)
              WHEN len(list_distinct(list_concat(prev, arr))) = 0
                THEN CAST(1 AS BIGINT)  -- empty-union pair: ppm 0 < thr
              WHEN CAST(len(list_intersect(prev, arr)) AS BIGINT) * 1000000
                   // len(list_distinct(list_concat(prev, arr)))
                   < {_TOPIC_THR} THEN CAST(1 AS BIGINT)
              ELSE CAST(0 AS BIGINT) END AS bd
  FROM l
),
seg AS (
  SELECT conv, idx,
         sum(bd) OVER (PARTITION BY conv ORDER BY idx
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS seg_id
  FROM sim
),
sl AS (SELECT conv, seg_id, count(*) AS slen FROM seg GROUP BY 1, 2)
SELECT conv,
       CAST(sum(slen) AS BIGINT) AS n_turns,
       CAST(count(*) AS BIGINT) AS n_segments,
       CAST(max(slen) AS BIGINT) AS max_segment
FROM sl GROUP BY conv ORDER BY conv
"""

    sqls["co_participation"] = r"""
WITH t AS (
  SELECT event_type AS conv, CAST(user_id AS VARCHAR) AS actor
  FROM events
),
d AS (SELECT DISTINCT conv, actor FROM t)
SELECT a.actor AS a, b.actor AS b, CAST(count(*) AS BIGINT) AS n
FROM d a JOIN d b ON a.conv = b.conv AND a.actor < b.actor
GROUP BY 1, 2 ORDER BY 1, 2
"""

    sqls["knn_label_purity"] = r"""
WITH p AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label,
         CAST(sum(CASE WHEN embedding[i] >= 0
                       THEN (CAST(1 AS BIGINT) << (i - 1)) ELSE 0 END)
           AS BIGINT) AS lo,
         CAST(sum(CASE WHEN embedding[i + 32] >= 0
                       THEN (CAST(1 AS BIGINT) << (i - 1)) ELSE 0 END)
           AS BIGINT) AS hi
  FROM embeddings,
       LATERAL (SELECT unnest(generate_series(1, 32)) AS i) g
  GROUP BY vec_id, label
),
d AS (
  SELECT q.vec_id AS qid, q.label AS ql, c.vec_id AS nid, c.label AS nl,
         CAST(bit_count(xor(q.lo, c.lo)) + bit_count(xor(q.hi, c.hi))
           AS BIGINT) AS ham
  FROM p q JOIN p c ON c.vec_id <> q.vec_id
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY ham, nid) AS rk
  FROM d
),
t AS (SELECT * FROM r WHERE rk <= 10),
agg AS (
  SELECT CAST(sum(CASE WHEN ql = nl THEN 1 ELSE 0 END) AS BIGINT) AS same,
         CAST(count(*) AS BIGINT) AS pairs
  FROM t
)
SELECT CAST((SELECT count(*) FROM p) AS BIGINT) AS n_vecs,
       CAST(10 AS BIGINT) AS k,
       a.same AS same_label,
       a.pairs AS pairs,
       CAST(a.same * 1000000 // a.pairs AS BIGINT) AS purity_ppm
FROM agg a
"""

    sqls["densest_subgraph"] = _densest_oracle_sql()

    sqls["coarsen_graph2"] = _coarsen2_oracle_sql()

    sqls["kmv_registers"] = r"""
WITH toks AS (
  SELECT DISTINCT lower(t) AS term
  FROM (SELECT unnest(regexp_extract_all(coalesce(text, ''), '\S+')) AS t
        FROM documents)
),
h AS (
  SELECT DISTINCT
         CAST(CAST(('0x' || substr(md5('kmv:' || term), 1, 8)) AS UBIGINT)
           AS BIGINT) AS register
  FROM toks
),
r AS (SELECT register, row_number() OVER (ORDER BY register) AS rank FROM h)
SELECT CAST(rank AS BIGINT) AS rank, register FROM r
WHERE rank <= 64 ORDER BY rank
"""

    sqls["wl_cells"] = (
        _wl_oracle_sql().replace(
            f"SELECT node, c AS color FROM c{_WL_ROUNDS} ORDER BY node",
            f"SELECT c AS color, CAST(count(*) AS BIGINT) AS n"
            f" FROM c{_WL_ROUNDS} GROUP BY 1 ORDER BY 1",
        )
    )

    _lang_base = sqls["lang_id"].strip()
    if _lang_base.endswith("ORDER BY doc_id"):
        _lang_base = _lang_base[: -len("ORDER BY doc_id")]
    sqls["lang_report"] = rf"""
WITH lp AS ({_lang_base}),
tc AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(coalesce(text, ''), '\S+')) AS BIGINT)
           AS n_tokens
  FROM documents
)
SELECT lp.lang_pred AS lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(tc.n_tokens) AS BIGINT) AS total_tokens
FROM lp JOIN tc USING (doc_id)
GROUP BY 1 ORDER BY 1
"""

    sqls["temporal_departure"] = r"""
WITH t AS (
  SELECT event_type AS conv,
         row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id)
           AS idx,
         CAST(user_id AS VARCHAR) AS actor,
         ts
  FROM events
),
c AS MATERIALIZED (
  SELECT a.actor AS src, b.actor AS dst,
         CAST(epoch_us(b.ts) AS BIGINT) AS t
  FROM t a JOIN t b ON a.conv = b.conv AND b.idx = a.idx + 1
  WHERE a.actor <> b.actor
),
b0 AS MATERIALIZED (
  SELECT max(actor) AS node, CAST(4102444800000000 AS BIGINT) AS at FROM t),
b1 AS MATERIALIZED (
  SELECT node, CAST(max(at) AS BIGINT) AS at FROM (
    SELECT node, at FROM b0
    UNION ALL
    SELECT c.src AS node, c.t AS at
    FROM c JOIN b0 bb ON bb.node = c.dst AND c.t <= bb.at
  ) GROUP BY 1),
b2 AS MATERIALIZED (
  SELECT node, CAST(max(at) AS BIGINT) AS at FROM (
    SELECT node, at FROM b1
    UNION ALL
    SELECT c.src AS node, c.t AS at
    FROM c JOIN b1 bb ON bb.node = c.dst AND c.t <= bb.at
  ) GROUP BY 1),
b3 AS MATERIALIZED (
  SELECT node, CAST(max(at) AS BIGINT) AS at FROM (
    SELECT node, at FROM b2
    UNION ALL
    SELECT c.src AS node, c.t AS at
    FROM c JOIN b2 bb ON bb.node = c.dst AND c.t <= bb.at
  ) GROUP BY 1),
b4 AS MATERIALIZED (
  SELECT node, CAST(max(at) AS BIGINT) AS at FROM (
    SELECT node, at FROM b3
    UNION ALL
    SELECT c.src AS node, c.t AS at
    FROM c JOIN b3 bb ON bb.node = c.dst AND c.t <= bb.at
  ) GROUP BY 1),
b5 AS MATERIALIZED (
  SELECT node, CAST(max(at) AS BIGINT) AS at FROM (
    SELECT node, at FROM b4
    UNION ALL
    SELECT c.src AS node, c.t AS at
    FROM c JOIN b4 bb ON bb.node = c.dst AND c.t <= bb.at
  ) GROUP BY 1),
b6 AS MATERIALIZED (
  SELECT node, CAST(max(at) AS BIGINT) AS at FROM (
    SELECT node, at FROM b5
    UNION ALL
    SELECT c.src AS node, c.t AS at
    FROM c JOIN b5 bb ON bb.node = c.dst AND c.t <= bb.at
  ) GROUP BY 1)
SELECT node, at FROM b6 ORDER BY node
"""

    sqls["actor_activity"] = r"""
WITH t AS (
  SELECT CAST(user_id AS VARCHAR) AS role, event_type AS conv,
         CAST(epoch_us(ts) AS BIGINT) AS t
  FROM events
)
SELECT role,
       CAST(count(*) AS BIGINT) AS n_turns,
       CAST(count(DISTINCT conv) AS BIGINT) AS n_convs,
       CAST(min(t) AS BIGINT) AS first_us,
       CAST(max(t) AS BIGINT) AS last_us
FROM t GROUP BY role ORDER BY role
"""

    sqls["graph_snapshots"] = r"""
WITH t AS (
  SELECT event_type AS conv,
         row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id)
           AS idx,
         CAST(user_id AS VARCHAR) AS actor, ts
  FROM events
),
c AS (
  SELECT a.actor AS src, b.actor AS dst,
         CAST(epoch_us(b.ts) AS BIGINT) AS t
  FROM t a JOIN t b ON a.conv = b.conv AND b.idx = a.idx + 1
  WHERE a.actor <> b.actor
),
w AS (SELECT t // 86400000000 AS win, src, dst FROM c),
actors AS (
  SELECT win, src AS actor FROM w UNION SELECT win, dst AS actor FROM w
),
na AS (SELECT win, CAST(count(*) AS BIGINT) AS n_actors
       FROM actors GROUP BY win),
ne AS (SELECT win, CAST(count(*) AS BIGINT) AS n_contacts
       FROM w GROUP BY win)
SELECT CAST(ne.win AS BIGINT) AS win, ne.n_contacts, na.n_actors
FROM ne JOIN na USING (win) ORDER BY win
"""

    sqls["actor_jaccard"] = r"""
WITH t AS (
  SELECT event_type AS conv, CAST(user_id AS VARCHAR) AS actor
  FROM events
),
d AS (SELECT DISTINCT conv, actor FROM t),
sz AS (SELECT actor, CAST(count(*) AS BIGINT) AS nc FROM d GROUP BY 1),
sh AS (
  SELECT a.actor AS a, b.actor AS b, CAST(count(*) AS BIGINT) AS shared
  FROM d a JOIN d b ON a.conv = b.conv AND a.actor < b.actor
  GROUP BY 1, 2
)
SELECT sh.a, sh.b, sh.shared,
       CAST(sh.shared * 1000000 // (x.nc + y.nc - sh.shared) AS BIGINT)
         AS jaccard_ppm
FROM sh JOIN sz x ON x.actor = sh.a JOIN sz y ON y.actor = sh.b
ORDER BY 1, 2
"""

    sqls["condensation"] = f"""
WITH RECURSIVE {_GRAPH_CTE},
adj AS (SELECT DISTINCT src, dst FROM edges),
fwd AS (
    SELECT node AS s, node AS v FROM nodes
    UNION
    SELECT f.s, a.dst AS v FROM fwd f JOIN adj a ON a.src = f.v
),
comp AS (
    SELECT v1.s AS node, min(v1.v) AS component
    FROM fwd v1 JOIN fwd v2 ON v2.s = v1.v AND v2.v = v1.s
    GROUP BY v1.s
)
SELECT DISTINCT ca.component AS src_comp, cb.component AS dst_comp
FROM adj e
JOIN comp ca ON ca.node = e.src JOIN comp cb ON cb.node = e.dst
WHERE ca.component <> cb.component
ORDER BY 1, 2
"""

    sqls["hem_matching"] = _hem_oracle_sql()

    sqls["blocklist"] = r"""
WITH t AS (
  SELECT doc_id,
         list_filter(
             list_transform(
                 regexp_extract_all(coalesce(text, ''), '\S+'),
                 x -> lower(x)),
             x -> x IN ('slow', 'dup', 'stale')) AS hits_l
  FROM documents
)
SELECT doc_id,
       CAST(len(hits_l) AS BIGINT) AS hits,
       CAST(CASE WHEN len(hits_l) > 0 THEN 1 ELSE 0 END AS BIGINT)
         AS blocked
FROM t ORDER BY doc_id
"""

    sqls["coarsen_hem"] = _coarsen_hem_oracle_sql()

    sqls["activity_decay"] = r"""
WITH t AS (
  SELECT CAST(user_id AS VARCHAR) AS role,
         CAST(epoch_us(ts) AS BIGINT) AS t
  FROM events
),
mx AS (SELECT max(t) AS tmax FROM t),
c AS (
  SELECT role,
         1048576 >> CAST(least((m.tmax - t.t) // 86400000000, 63)
                         AS BIGINT) AS contrib
  FROM t, mx m
)
SELECT role, CAST(sum(contrib) AS BIGINT) AS score
FROM c GROUP BY role ORDER BY role
"""

    sqls["actor_lift"] = r"""
WITH t AS (
  SELECT event_type AS conv, CAST(user_id AS VARCHAR) AS actor
  FROM events
),
d AS (SELECT DISTINCT conv, actor FROM t),
tot AS (SELECT CAST(count(DISTINCT conv) AS BIGINT) AS n FROM t),
sz AS (SELECT actor, CAST(count(*) AS BIGINT) AS nc FROM d GROUP BY 1),
sh AS (
  SELECT a.actor AS a, b.actor AS b, CAST(count(*) AS BIGINT) AS shared
  FROM d a JOIN d b ON a.conv = b.conv AND a.actor < b.actor
  GROUP BY 1, 2
)
SELECT sh.a, sh.b, sh.shared,
       CAST(sh.shared * tot.n * 1000000 // (x.nc * y.nc) AS BIGINT)
         AS lift_ppm
FROM sh JOIN sz x ON x.actor = sh.a JOIN sz y ON y.actor = sh.b, tot
ORDER BY 1, 2
"""

    sqls["graph_fingerprint"] = (
        "WITH hist AS ("
        + sqls["wl_cells"].strip().rstrip()
        + """)
SELECT md5(string_agg(CAST(color AS VARCHAR) || ':' || CAST(n AS VARCHAR),
                      ',' ORDER BY color)) AS fingerprint
FROM hist"""
    )

    sqls["transitivity"] = f"""
WITH {_GRAPH_CTE}, {_UND_CTE},
deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS d
        FROM undw GROUP BY 1),
p2 AS (SELECT CAST(coalesce(sum(d * (d - 1) // 2), 0) AS BIGINT) AS w
       FROM deg),
tri AS (SELECT CAST(count(*) // 6 AS BIGINT) AS t
        FROM undw e1
        JOIN undw e2 ON e2.src = e1.dst
        JOIN undw e3 ON e3.src = e2.dst AND e3.dst = e1.src)
SELECT t.t AS triangles, p.w AS wedges,
       CAST(CASE WHEN p.w > 0 THEN 3 * t.t * 1000000 // p.w
                 ELSE 0 END AS BIGINT) AS transitivity_ppm
FROM tri t, p2 p
"""

    return sqls

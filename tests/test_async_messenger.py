"""Async (same-superstep) message delivery — the reference
AsyncQueueMessenger re-expressed as a partition-local fixpoint. Output
must be byte-identical to sync mode; global superstep count must drop on
long-diameter graphs (the fewer-shuffles claim)."""

import numpy as np
import pandas as pd

from graph_data_science_ray.functions.wcc import WccComputation, wcc
from graph_data_science_ray.state.pregel import Pregel


def _path_edges(n):
    return [(i, i + 1) for i in range(n - 1)]


def test_async_local_wcc_identical_output(graph_from_edges):
    # a 24-node path (diameter 23) + a separate triangle + an isolate
    edges = _path_edges(24) + [(30, 31), (31, 32), (32, 30)]
    _, gu, idmap, _, _ = graph_from_edges(edges, isolated=[40])
    sync = wcc(gu).sort_values("node").reset_index(drop=True)
    asyn = wcc(gu, async_local=True).sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(sync, asyn)


def test_async_local_fewer_supersteps(graph_from_edges):
    edges = _path_edges(24)
    _, gu, _, _, _ = graph_from_edges(edges, num_partitions=3)

    def run(async_local):
        comp = WccComputation()
        comp.async_local = async_local
        eng = Pregel(gu, comp)
        refs = eng.run(max_iterations=200)
        out = eng.gather(refs, "component")
        return out, len(eng.history)

    out_s, iters_s = run(False)
    out_a, iters_a = run(True)
    assert np.array_equal(out_s, out_a)
    # sync needs O(diameter) supersteps; async collapses each partition's
    # chain locally, leaving only the cross-partition hops
    assert iters_a < iters_s
    assert iters_a <= 8


def test_async_local_weighted_sssp_identical(graph_from_edges):
    # async relaxation also covers edge_combine="add" (Bellman-Ford)
    import graph_data_science_ray as gdsr
    from graph_data_science_ray.functions.sssp import SsspComputation

    edges = _path_edges(12) + [(0, 5), (3, 9)]
    _, gu, idmap, _, _ = graph_from_edges(edges)
    src_key = idmap.keys[0]

    def run(async_local):
        comp = SsspComputation(source=0)
        comp.async_local = async_local
        eng = Pregel(gu, comp)
        refs = eng.run(max_iterations=200)
        return eng.gather(refs, "dist")

    a = run(False)
    b = run(True)
    assert np.array_equal(a, b)

    # public-API surface: shortest_paths(async_local=True)
    from graph_data_science_ray.functions.sssp import shortest_paths

    s = shortest_paths(gu, source_key=src_key).sort_values("node").reset_index(drop=True)
    t = (
        shortest_paths(gu, source_key=src_key, async_local=True)
        .sort_values("node")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(s, t)


def test_async_local_or_reducer_taint(graph_from_edges):
    # the OR (bitmask) reducer is monotone like hash-min, so taint
    # propagation admits the same partition-local fixpoint
    from graph_data_science_ray.functions.sssp import _TaintProp

    edges = _path_edges(24)
    _, gu, _, _, _ = graph_from_edges(edges, num_partitions=3)
    V = gu.node_count
    seeds = np.zeros(V, dtype=bool)
    seeds[0] = True

    def run(async_local):
        comp = _TaintProp(seeds.copy())
        comp.async_local = async_local
        comp.active_state_key = "new"
        eng = Pregel(gu, comp)
        refs = eng.run(max_iterations=200)
        return eng.gather(refs, "taint"), len(eng.history)

    a, it_s = run(False)
    b, it_a = run(True)
    assert np.array_equal(a.astype(bool), b.astype(bool))
    assert a.astype(bool).all()  # path is connected: everything tainted
    assert it_a < it_s


def test_async_local_scc_parity(graph_from_edges):
    # two directed cycles joined by a one-way bridge + a long tail
    from graph_data_science_ray.functions.scc import scc

    edges = (
        [(i, (i + 1) % 6) for i in range(6)]
        + [(10 + i, 10 + (i + 1) % 5) for i in range(5)]
        + [(5, 10)]
        + [(20 + i, 21 + i) for i in range(6)]  # acyclic tail: singletons
    )
    gd, _gu, idmap, enc, _sym = graph_from_edges(edges, num_partitions=3)
    n = len(idmap)
    a = scc(enc, n, idmap=idmap).sort_values("node").reset_index(drop=True)
    b = (
        scc(enc, n, idmap=idmap, async_local=True)
        .sort_values("node")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    assert a["component"].nunique() > 2

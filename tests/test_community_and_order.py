"""Louvain, K1-coloring, topological sort fixtures."""

import itertools

import numpy as np
import pandas as pd

from graph_data_science_ray.functions.coloring import k1_coloring, topological_sort
from graph_data_science_ray.functions.community_metrics import modularity
from graph_data_science_ray.functions.louvain import louvain
from tests.conftest import keys_to_ids


def test_louvain_two_cliques_with_bridge(graph_from_edges):
    k5a = list(itertools.combinations(range(5), 2))
    k5b = list(itertools.combinations(range(5, 10), 2))
    _, _, idmap, _, sym = graph_from_edges(k5a + k5b + [(4, 5)], undirected_only=True)
    res = louvain(sym, node_count=10)
    lab = dict(zip(res["node"], res["community"]))
    assert len({lab[i] for i in range(5)}) == 1
    assert len({lab[i] for i in range(5, 10)}) == 1
    assert lab[0] != lab[9]
    q = modularity(sym, res.sort_values("node")["community"].to_numpy())
    assert q > 0.4


def test_k1_coloring_proper(graph_from_edges):
    edges = list(itertools.combinations(range(4), 2)) + [(3, 4), (4, 5)]
    _, _, idmap, _, sym = graph_from_edges(edges, undirected_only=True)
    res = k1_coloring(sym, node_count=len(idmap), idmap=idmap)
    col = dict(zip(keys_to_ids(res["node"]), res["color"]))
    for u, v in edges:
        assert col[u] != col[v], f"conflict on edge {(u, v)}"
    # K4 needs >= 4 colors
    assert len({col[i] for i in range(4)}) == 4


def test_k1_coloring_distributed_parity(graph_from_edges):
    """Dataset-held color state == broadcast arrays, mid-iteration
    (pinned rounds) and at the fixpoint."""
    edges = list(itertools.combinations(range(4), 2)) + [(3, 4), (4, 5), (6, 7)]
    _, _, idmap, _, sym = graph_from_edges(edges, undirected_only=True)
    V = len(idmap)
    for rounds in (1, 100):  # mid-iteration pin + fixpoint
        a = k1_coloring(sym, node_count=V, idmap=idmap, max_rounds=rounds,
                        mode="broadcast")
        b = k1_coloring(sym, node_count=V, idmap=idmap, max_rounds=rounds,
                        mode="distributed", num_parts=4)
        assert (a["color"].to_numpy() == b["color"].to_numpy()).all(), rounds


def test_topological_sort_dag(graph_from_edges):
    # 0->1->3, 0->2->3, 3->4
    _, _, idmap, enc, _ = graph_from_edges([(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)])
    res = topological_sort(enc, node_count=len(idmap), idmap=idmap)
    lay = dict(zip(keys_to_ids(res["node"]), res["layer"]))
    assert lay == {0: 0, 1: 1, 2: 1, 3: 2, 4: 3}


def test_topological_sort_cycle_marked(graph_from_edges):
    _, _, idmap, enc, _ = graph_from_edges([(0, 1), (1, 2), (2, 0), (2, 3)])
    res = topological_sort(enc, node_count=len(idmap), idmap=idmap)
    lay = dict(zip(keys_to_ids(res["node"]), res["layer"]))
    assert lay[0] == lay[1] == lay[2] == lay[3] == -1  # cycle + downstream


def test_scc_two_cycles_bridge(graph_from_edges):
    from graph_data_science_ray.functions.scc import scc

    edges = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3), (5, 6)]
    _, _, idmap, enc, _ = graph_from_edges(edges)
    res = scc(enc, node_count=len(idmap), idmap=idmap)
    comp = dict(zip(keys_to_ids(res["node"]), keys_to_ids(res["component"])))
    assert comp == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 3, 6: 6}


def test_scc_dag_is_all_singletons(graph_from_edges):
    from graph_data_science_ray.functions.scc import scc

    _, _, idmap, enc, _ = graph_from_edges([(0, 1), (1, 2), (0, 2)])
    res = scc(enc, node_count=len(idmap), idmap=idmap)
    comp = dict(zip(keys_to_ids(res["node"]), keys_to_ids(res["component"])))
    assert comp == {0: 0, 1: 1, 2: 2}


def test_leiden_two_cliques_and_connectivity(graph_from_edges):
    from graph_data_science_ray.functions.louvain import leiden

    k5a = list(itertools.combinations(range(5), 2))
    k5b = list(itertools.combinations(range(5, 10), 2))
    edges = k5a + k5b + [(4, 5)]
    _, _, idmap, _, sym = graph_from_edges(edges, undirected_only=True)
    res = leiden(sym, node_count=10)
    lab = res.sort_values("node")["community"].to_numpy()
    assert len({lab[i] for i in range(5)}) == 1
    assert len({lab[i] for i in range(5, 10)}) == 1
    assert lab[0] != lab[9]
    # every community induces a connected subgraph
    edge_set = {(a, b) for a, b in edges} | {(b, a) for a, b in edges}
    for comm in set(lab):
        members = [i for i in range(10) if lab[i] == comm]
        seen = {members[0]}
        frontier = [members[0]]
        while frontier:
            u = frontier.pop()
            for v in members:
                if v not in seen and (u, v) in edge_set:
                    seen.add(v)
                    frontier.append(v)
        assert seen == set(members), f"community {comm} disconnected"


def test_louvain_planted_partition_recovery(tmp_path):
    """Distributed local moves recover a seeded planted partition exactly
    and match a straight single-threaded reimplementation's modularity."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from graph_data_science_ray.functions.community_metrics import modularity
    from graph_data_science_ray.functions.louvain import louvain

    rng = np.random.default_rng(3)
    n, k = 60, 4
    truth = np.repeat(np.arange(k), n // k)
    edges = set()
    for i in range(n):
        for j in range(i + 1, n):
            p = 0.6 if truth[i] == truth[j] else 0.02
            if rng.random() < p:
                edges.add((i, j))
    src = np.array([e[0] for e in edges] + [e[1] for e in edges], dtype=np.int64)
    dst = np.array([e[1] for e in edges] + [e[0] for e in edges], dtype=np.int64)
    sym = rd.from_arrow(pa.table({
        "src": pa.array(src), "dst": pa.array(dst),
        "weight": pa.array(np.ones(len(src))),
    }))
    res = louvain(sym, node_count=n).sort_values("node")
    found = res["community"].to_numpy()
    # exact recovery: each planted block maps to one community
    for c in range(k):
        blk = found[truth == c]
        assert len(set(blk)) == 1, f"block {c} split: {set(blk)}"
    assert len(set(found)) == k
    q = modularity(sym, found)
    # reference upper bound: modularity of the planted partition itself
    q_truth = modularity(sym, truth)
    assert q >= q_truth - 1e-9


def test_louvain_partitioned_state_matches_broadcast(graph_from_edges):
    """The partition-held label/volume state path (the >5M-node scale
    mode) must produce the identical labeling to the broadcast path."""
    from graph_data_science_ray.functions.louvain import (
        leiden,
        louvain,
        modularity_optimization,
    )

    edges = []
    for grp in (range(0, 5), range(5, 10)):
        grp = list(grp)
        edges += [(i, j) for i in grp for j in grp if i < j]
    edges += [(4, 5), (9, 0)]
    _, _, idmap, _, sym = graph_from_edges(edges)
    n = len(idmap)
    a = louvain(sym, n, state_mode="broadcast")
    b = louvain(sym, n, state_mode="partitioned")
    pd.testing.assert_frame_equal(a, b)
    la = leiden(sym, n, state_mode="broadcast")
    lb = leiden(sym, n, state_mode="partitioned")
    pd.testing.assert_frame_equal(la, lb)
    ma, qa = modularity_optimization(sym, n, state_mode="broadcast")
    mb, qb = modularity_optimization(sym, n, state_mode="partitioned")
    pd.testing.assert_frame_equal(ma, mb)
    assert qa == qb


def test_scc_distributed_parity(graph_from_edges):
    """Dataset-held FW-BW state == broadcast arrays.

    Graph exercises every peel shape — a big cycle with chords, two
    2-cycles downstream of it (forcing successive outer rounds), DAG
    bridge nodes (singleton SCCs with live edges) and isolated-by-peel
    singletons — while keeping the DAG depth small: each outer FW-BW
    round peels one layer, and a distributed round is ~15 Dataset
    executions, so a deep random periphery would make this test crawl
    without adding coverage."""
    from graph_data_science_ray.functions.scc import scc

    big = [(i, (i + 1) % 8) for i in range(8)]          # SCC {0..7}
    chords = [(0, 4), (5, 2)]
    bridge = [(3, 8), (8, 9)]                            # 8 is a DAG node
    two_a = [(9, 10), (10, 9)]                           # SCC {9,10}
    two_b = [(8, 11), (11, 12), (12, 11)]                # SCC {11,12}
    edges = sorted(set(big + chords + bridge + two_a + two_b + [(13, 0)]))
    _, _, idmap, enc, _ = graph_from_edges(edges)
    V = len(idmap)
    a = scc(enc, node_count=V, idmap=idmap, mode="broadcast")
    b = scc(enc, node_count=V, idmap=idmap, mode="distributed", num_parts=4)
    a = a.sort_values("node").reset_index(drop=True)
    b = b.sort_values("node").reset_index(drop=True)
    assert (a["node"] == b["node"]).all()
    assert (a["component"] == b["component"]).all()
    # sanity against the known partition
    assert a["component"].nunique() == 5  # {0..7}, {8}, {9,10}, {11,12}, {13}



def test_scc_distributed_parity_pinned_round(graph_from_edges):
    """Mid-run (max_rounds=1) parity: the Dataset-held and broadcast
    formulations must agree on WHICH nodes round 1 assigns and to what —
    the advisor-flagged drift point for dual-mode operators (mid-state,
    not just the fixpoint)."""
    from graph_data_science_ray.functions.scc import scc

    big = [(i, (i + 1) % 6) for i in range(6)]
    edges = sorted(set(big + [(2, 6), (6, 7), (7, 6), (8, 0)]))
    _, _, idmap, enc, _ = graph_from_edges(edges)
    V = len(idmap)
    a = scc(enc, node_count=V, max_rounds=1, mode="broadcast")
    b = scc(enc, node_count=V, max_rounds=1, mode="distributed", num_parts=4)
    a = a.sort_values("node").reset_index(drop=True)
    b = b.sort_values("node").reset_index(drop=True)
    assert (a["component"] == b["component"]).all()
    # round 1 must leave the downstream 2-cycle {6,7} unassigned (-1)
    assert (a["component"] == -1).sum() == 2


def test_louvain_intermediate_levels(graph_from_edges):
    """includeIntermediateCommunities: per-level columns, each level a
    coarsening of the previous (reference LouvainResult dendrogram)."""
    import numpy as np

    from graph_data_science_ray.functions.louvain import louvain
    from tests.conftest import keys_to_ids

    # two 4-cliques joined by one edge: clear 2-community structure
    edges = []
    for base in (0, 4):
        for i in range(4):
            for j in range(i + 1, 4):
                edges.append((base + i, base + j))
    edges.append((0, 4))
    _, gu, idmap, enc, sym = graph_from_edges(edges)
    out = louvain(sym, node_count=len(idmap), idmap=None,
                  include_intermediate=True)
    lvl_cols = [c for c in out.columns if c.startswith("community_l")]
    assert lvl_cols, "expected at least one dendrogram level"
    # final column equals the last level
    assert (out["community"] == out[lvl_cols[-1]]).all()
    # each level coarsens the previous: a level-k community never splits
    for a, b in zip(lvl_cols, lvl_cols[1:]):
        grp = out.groupby(a)[b].nunique()
        assert (grp == 1).all()


def test_leiden_intermediate_levels(graph_from_edges):
    import numpy as np

    from graph_data_science_ray.functions.louvain import leiden

    edges = []
    for base in (0, 4):
        for i in range(4):
            for j in range(i + 1, 4):
                edges.append((base + i, base + j))
    edges.append((0, 4))
    _, gu, idmap, enc, sym = graph_from_edges(edges)
    out = leiden(sym, node_count=len(idmap), idmap=None,
                 include_intermediate=True)
    lvl_cols = [c for c in out.columns if c.startswith("community_l")]
    assert lvl_cols
    assert (out["community"] == out[lvl_cols[-1]]).all()
    for a, b in zip(lvl_cols, lvl_cols[1:]):
        assert (out.groupby(a)[b].nunique() == 1).all()

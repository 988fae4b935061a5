"""All-shortest-paths stream: MSBFS waves (unweighted) + 2-D min-reducer
relaxation waves (weighted); parity between the two on unit weights."""

import numpy as np
import pandas as pd
import pytest

from graph_data_science_ray.functions.apsp import all_shortest_paths
from tests.conftest import keys_to_ids


def _pairs(df: pd.DataFrame) -> dict:
    return {
        (s, t): d
        for s, t, d in zip(
            keys_to_ids(df["source"]), keys_to_ids(df["target"]), df["distance"]
        )
    }


def test_unweighted_path_graph(graph_from_edges):
    # directed path 0 -> 1 -> 2 -> 3
    gd, _, _, _, _ = graph_from_edges([(0, 1), (1, 2), (2, 3)])
    got = _pairs(all_shortest_paths(gd))
    want = {
        (0, 0): 0, (0, 1): 1, (0, 2): 2, (0, 3): 3,
        (1, 1): 0, (1, 2): 1, (1, 3): 2,
        (2, 2): 0, (2, 3): 1,
        (3, 3): 0,
    }
    assert got == want


def test_weighted_matches_edge_counts(graph_from_edges):
    # duplicated transcript edges give weight 2 on (0,1)
    gd, _, _, _, _ = graph_from_edges([(0, 1), (0, 1), (1, 2)])
    got = _pairs(all_shortest_paths(gd, weighted=True))
    assert got[(0, 1)] == 2.0
    assert got[(0, 2)] == 3.0
    assert got[(1, 2)] == 1.0


def test_weighted_unit_equals_unweighted(graph_from_edges):
    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 1)]
    gd, gu, _, _, _ = graph_from_edges(edges)
    hop = _pairs(all_shortest_paths(gu, weighted=False))
    # single-occurrence edges carry unit weights, so the weighted
    # relaxation waves must reproduce the MSBFS hop counts exactly
    w = _pairs(all_shortest_paths(gu, weighted=True))
    assert {k: float(v) for k, v in hop.items()} == {
        k: float(v) for k, v in w.items()
    }

    # symmetric graph: distance matrix symmetric
    for (s, t), d in hop.items():
        assert hop[(t, s)] == d


def test_sources_subset(graph_from_edges):
    gd, _, _, _, _ = graph_from_edges([(0, 1), (1, 2), (2, 3), (3, 0)])
    out = all_shortest_paths(gd, sources=np.array([0, 2]))
    srcs = set(keys_to_ids(out["source"]))
    assert srcs == {0, 2}
    assert len(out) == 8  # each source reaches all 4 nodes on the cycle


def test_wave_split_parity(graph_from_edges):
    # >64 sources forces two MSBFS waves; compare against one-wave subsets
    edges = [(i, (i + 1) % 70) for i in range(70)]
    gd, _, _, _, _ = graph_from_edges(edges)
    full = _pairs(all_shortest_paths(gd))
    lo = _pairs(all_shortest_paths(gd, sources=np.arange(64)))
    hi = _pairs(all_shortest_paths(gd, sources=np.arange(64, 70)))
    merged = {**lo, **hi}
    assert full == merged


def test_eccentricity_matches_apsp_max(graph_from_edges):
    from graph_data_science_ray.functions.apsp import eccentricity

    # two components: a directed path and an isolated 2-cycle
    edges = [(0, 1), (1, 2), (2, 3), (4, 5), (5, 4)]
    gd, _, _, _, _ = graph_from_edges(edges)
    pairs = _pairs(all_shortest_paths(gd))
    want = {}
    for (s, _t), d in pairs.items():
        want[s] = max(want.get(s, 0), int(d))
    ecc = eccentricity(gd)
    got = dict(zip(keys_to_ids(ecc["node"]), ecc["ecc"].astype(int)))
    assert got == want
    # path head reaches 3 hops; cycle nodes reach 1; sink node 0
    assert got[0] == 3 and got[3] == 0 and got[4] == 1


def test_graph_diameter_readout(graph_from_edges):
    from graph_data_science_ray.functions.apsp import graph_diameter

    gd, gu, _, _, _ = graph_from_edges([(0, 1), (1, 2), (2, 3)])
    d = graph_diameter(gd).set_index("metric")["value"]
    assert d["diameter"] == 3  # head of the path
    assert d["radius"] == 0  # the sink only reaches itself
    du = graph_diameter(gu).set_index("metric")["value"]
    assert du["diameter"] == 3 and du["radius"] == 2


def test_eccentricity_sources_subset(graph_from_edges):
    from graph_data_science_ray.functions.apsp import eccentricity

    gd, _, _, _, _ = graph_from_edges([(0, 1), (1, 2), (2, 3), (3, 0)])
    ecc = eccentricity(gd, sources=np.array([0, 2]))
    got = dict(zip(keys_to_ids(ecc["node"]), ecc["ecc"].astype(int)))
    assert got == {0: 3, 2: 3}

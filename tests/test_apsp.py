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

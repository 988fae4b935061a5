"""Bridges / articulation points (Tarjan low-link, single-task)."""

import numpy as np

from graph_data_science_ray.functions.biconnected import (
    articulation_points,
    bridges,
)
from tests.conftest import keys_to_ids


def _ids(df, cols):
    return sorted(zip(*[keys_to_ids(df[c]) for c in cols])) if len(df) else []


def test_path_graph_all_bridges(graph_from_edges):
    _, gu, *_ = graph_from_edges([(0, 1), (1, 2), (2, 3)], undirected_only=True)
    assert _ids(bridges(gu), ["src", "dst"]) == [(0, 1), (1, 2), (2, 3)]
    ap = sorted(keys_to_ids(articulation_points(gu)["node"]))
    assert ap == [1, 2]


def test_cycle_has_none(graph_from_edges):
    _, gu, *_ = graph_from_edges([(0, 1), (1, 2), (2, 0)], undirected_only=True)
    assert len(bridges(gu)) == 0
    assert len(articulation_points(gu)) == 0


def test_barbell(graph_from_edges):
    # two triangles {0,1,2} and {3,4,5} joined by bridge (2,3)
    _, gu, *_ = graph_from_edges(
        [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3)],
        undirected_only=True,
    )
    assert _ids(bridges(gu), ["src", "dst"]) == [(2, 3)]
    ap = sorted(keys_to_ids(articulation_points(gu)["node"]))
    assert ap == [2, 3]


def test_two_components_and_isolated(graph_from_edges):
    _, gu, *_ = graph_from_edges(
        [(0, 1), (2, 3), (3, 4), (4, 2)], isolated=[9], undirected_only=True
    )
    assert _ids(bridges(gu), ["src", "dst"]) == [(0, 1)]
    assert len(articulation_points(gu)) == 0

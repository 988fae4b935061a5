"""HITS, random walks, and graph-transform fixtures."""

import pandas as pd
import numpy as np
import pytest

import graph_data_science_ray as gdsr
from graph_data_science_ray.functions.hits import hits
from graph_data_science_ray.functions.walks import random_walks
from graph_data_science_ray.pipelines.transforms import (
    collapse_path,
    reverse_edges,
    subgraph_filter,
)
from tests.conftest import keys_to_ids


def _rev_graph(enc, idmap, gd, tmp_path):
    return gdsr.GraphStore.project(
        reverse_edges(enc), str(tmp_path / "grev"), idmap=idmap,
        directed=True, boundaries=gd.boundaries,
    )


def test_hits_star(graph_from_edges, tmp_path):
    # 0->2, 1->2: hubs are {0,1}, authority is {2}
    gd, _, idmap, enc, _ = graph_from_edges([(0, 2), (1, 2)])
    grev = _rev_graph(enc, idmap, gd, tmp_path)
    res = hits(gd, grev, iterations=5, normalize=True)
    got = {k: (h, a) for k, h, a in zip(keys_to_ids(res["node"]), res["hub"], res["auth"])}
    assert got[2][1] == pytest.approx(1.0, abs=1e-9)  # only authority
    assert got[2][0] == pytest.approx(0.0, abs=1e-9)
    assert got[0][0] == pytest.approx(got[1][0], abs=1e-12)
    assert got[0][0] == pytest.approx(1 / np.sqrt(2), abs=1e-9)


def test_hits_unnormalized_integer_valued(graph_from_edges, tmp_path):
    gd, _, idmap, enc, _ = graph_from_edges([(0, 1), (1, 2), (2, 0), (0, 2)])
    grev = _rev_graph(enc, idmap, gd, tmp_path)
    res = hits(gd, grev, iterations=3, normalize=False)
    assert (res["hub"] == res["hub"].round()).all()
    assert (res["auth"] == res["auth"].round()).all()
    assert (res["auth"] > 0).all()


def test_random_walks_follow_edges_and_deterministic(graph_from_edges):
    edges = [(0, 1), (1, 2), (2, 0), (0, 2), (2, 3)]
    gd, _, idmap, _, _ = graph_from_edges(edges)
    a = random_walks(gd, walk_length=6, walks_per_node=2, seed=9)
    b = random_walks(gd, walk_length=6, walks_per_node=2, seed=9)
    assert a.equals(b)
    edge_set = set(edges)
    for _, w in a.groupby("walk_id"):
        nodes = keys_to_ids(w.sort_values("step")["node"])
        for u, v in zip(nodes, nodes[1:]):
            assert (u, v) in edge_set
    # walks from node 3 (sink) stop at length 1
    n3 = a[keys_to_ids(a["node"]) == 3]
    sink_walks = a.groupby("walk_id").first()
    assert (a.groupby("walk_id")["step"].max() >= 0).all()


def test_collapse_path_counts_two_hop_paths(graph_from_edges):
    # 0->1->3 and 0->2->3: two distinct 2-hop paths 0=>3
    gd, _, idmap, enc, _ = graph_from_edges([(0, 1), (0, 2), (1, 3), (2, 3)])
    out = collapse_path(enc, enc, num_partitions=2).to_pandas()
    got = {(a, b): w for a, b, w in zip(out["src"], out["dst"], out["weight"])}
    assert got == {(0, 3): 2.0}


def test_subgraph_filter_reindexes(graph_from_edges):
    gd, _, idmap, enc, _ = graph_from_edges([(0, 1), (1, 2), (2, 3)])
    keep = lambda keys: np.char.find(keys.astype("U"), "n000") >= 0  # all
    ds, im2 = subgraph_filter(
        enc.map_batches(
            lambda t: t, batch_format="pyarrow"
        ),
        idmap,
        node_predicate=lambda keys: keys != "role:n0003",
    )
    # the filtered edge table should drop edges touching node 3
    import graph_data_science_ray as g

    df = ds.to_pandas()
    assert len(im2) == 3
    assert len(df) == 2  # (0,1) and (1,2) survive as key-space rows


def test_reverse_edges(graph_from_edges):
    _, _, idmap, enc, _ = graph_from_edges([(0, 1), (1, 2)])
    rev = reverse_edges(enc).to_pandas()
    pairs = set(zip(rev["src"], rev["dst"]))
    assert pairs == {(1, 0), (2, 1)}


def test_random_walks_frontier_matches_local(graph_from_edges):
    """The frontier-exchange walker (one-block-per-task, the cluster
    path) must emit byte-identical trajectories to the local walker."""
    edges = [(0, 1), (1, 2), (2, 0), (0, 2), (2, 3), (3, 4), (4, 0), (1, 4)]
    gd, _, idmap, _, _ = graph_from_edges(edges)
    a = random_walks(gd, walk_length=7, walks_per_node=3, seed=5, mode="local")
    b = random_walks(gd, walk_length=7, walks_per_node=3, seed=5, mode="frontier")
    pd.testing.assert_frame_equal(a, b)

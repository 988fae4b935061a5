"""Randomized conformance: engine vs brute-force numpy references.

The SURVEY §5 oracle layer: seeded random graphs (uniform + power-law,
mirroring the reference's generator distributions), checked against
dense/naive implementations configured to the reference semantics
(damped-delta PageRank, min-id components, exact triangle counts).
"""

import numpy as np
import pytest
import ray.data as rd

import graph_data_science_ray as gdsr
from graph_data_science_ray.functions.triangles import triangle_count
from tests.conftest import keys_to_ids


def _random_edges(n_nodes: int, n_edges: int, seed: int, powerlaw: bool):
    rng = np.random.default_rng(seed)
    if powerlaw:
        # skewed endpoint draws -> hub nodes
        u = rng.random((n_edges, 2))
        pairs = (n_nodes * u**2.5).astype(np.int64)
    else:
        pairs = rng.integers(0, n_nodes, size=(n_edges, 2))
    pairs = pairs[pairs[:, 0] != pairs[:, 1]]
    return [tuple(p) for p in pairs]


def _ref_pagerank(n, edges, damping=0.85, iters=60):
    """Dense damped-delta PageRank (push formulation, unnormalized)."""
    adj = {}
    outdeg = np.zeros(n)
    for u, v in edges:
        adj.setdefault(u, []).append(v)
    # parallel edges collapse to weight=count; unweighted run treats the
    # aggregated edge once — replicate by deduplicating
    dedup = {}
    for u, v in edges:
        dedup[(u, v)] = dedup.get((u, v), 0) + 1
    adj = {}
    for (u, v), w in dedup.items():
        adj.setdefault(u, []).append(v)
        outdeg[u] += 1
    alpha = 1 - damping
    rank = np.full(n, alpha)
    delta = np.full(n, alpha)
    for _ in range(iters):
        msg = np.zeros(n)
        for u, targets in adj.items():
            if delta[u] > 0:
                share = delta[u] / outdeg[u]
                for v in targets:
                    msg[v] += share
        delta = damping * msg
        rank += delta
    return rank


def _ref_components(n, edges):
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        a, b = find(u), find(v)
        if a != b:
            parent[max(a, b)] = min(a, b)
    return np.array([find(i) for i in range(n)])


def _ref_triangles(n, edges):
    nbrs = [set() for _ in range(n)]
    for u, v in edges:
        if u != v:
            nbrs[u].add(v)
            nbrs[v].add(u)
    counts = np.zeros(n, dtype=np.int64)
    total = 0
    for a in range(n):
        for b in nbrs[a]:
            if b <= a:
                continue
            common = nbrs[a] & nbrs[b]
            for c in common:
                if c > b:
                    total += 1
                    counts[a] += 1
                    counts[b] += 1
                    counts[c] += 1
    return counts, total


@pytest.mark.parametrize("seed,powerlaw", [(1, False), (2, True)])
def test_random_graph_conformance(graph_from_edges, seed, powerlaw):
    n = 40
    edges = _random_edges(n, 150, seed, powerlaw)
    present = sorted({x for e in edges for x in e})
    gd, gu, idmap, enc, sym = graph_from_edges(edges, num_partitions=4)

    # PageRank (unweighted over deduplicated edges)
    got = gdsr.pagerank(gd, tolerance=0.0, max_iterations=61)
    got_by_id = dict(zip(keys_to_ids(got["node"]), got["score"]))
    ref = _ref_pagerank(n, edges, iters=60)
    for node in present:
        assert got_by_id[node] == pytest.approx(ref[node], abs=1e-6)

    # WCC exact min-id
    cc = gdsr.wcc(gu)
    cc_by_id = dict(zip(keys_to_ids(cc["node"]), keys_to_ids(cc["component"])))
    refc = _ref_components(n, edges)
    # min-id over PRESENT nodes only: re-normalize reference within present set
    for node in present:
        members = [m for m in present if refc[m] == refc[node]]
        assert cc_by_id[node] == min(members)

    # Triangles exact
    tri, total = triangle_count(sym, idmap=idmap, num_partitions=3)
    tri_by_id = dict(zip(keys_to_ids(tri["node"]), tri["triangles"]))
    reft, reftotal = _ref_triangles(n, edges)
    assert total == reftotal
    for node in present:
        assert tri_by_id[node] == reft[node]

"""Reciprocity and degree assortativity: closed-form fixtures."""

import numpy as np
import pandas as pd
import ray.data as rd


def _edges(pairs):
    return rd.from_pandas(pd.DataFrame({
        "src": np.array([p[0] for p in pairs], dtype=np.int64),
        "dst": np.array([p[1] for p in pairs], dtype=np.int64),
        "weight": np.ones(len(pairs), dtype=np.float64),
    })).repartition(3)


def test_reciprocity_counts():
    from graph_data_science_ray.functions.graph_stats import reciprocity

    # 0<->1 reciprocal; 0->2, 2->3 one-way
    out = reciprocity(_edges([(0, 1), (1, 0), (0, 2), (2, 3)]))
    assert out["n_edges"].iloc[0] == 4
    assert out["n_reciprocal"].iloc[0] == 2
    assert out["reciprocity_ppm"].iloc[0] == 500_000


def test_reciprocity_extremes():
    from graph_data_science_ray.functions.graph_stats import reciprocity

    full = reciprocity(_edges([(0, 1), (1, 0), (1, 2), (2, 1)]))
    assert full["reciprocity_ppm"].iloc[0] == 1_000_000
    none = reciprocity(_edges([(0, 1), (1, 2), (2, 0)]))
    assert none["reciprocity_ppm"].iloc[0] == 0


def test_degree_assortativity_star_is_negative():
    from graph_data_science_ray.functions.graph_stats import (
        degree_assortativity,
    )

    # star K1,3 (symmetrized): hub deg 3, leaves deg 1 -> r = -1
    pairs = [(0, i) for i in (1, 2, 3)] + [(i, 0) for i in (1, 2, 3)]
    out = degree_assortativity(_edges(pairs))
    assert out["n"].iloc[0] == 6
    # x marginal: hub appears 3x as src (deg 3), leaves once each (deg 1)
    assert out["sum_x"].iloc[0] == 3 * 3 + 3 * 1
    assert out["r"].iloc[0] == -1.0


def test_degree_assortativity_regular_graph_zero_den():
    from graph_data_science_ray.functions.graph_stats import (
        degree_assortativity,
    )

    # 4-cycle symmetrized: every degree 2 -> den == 0 -> r defined 0.0
    cyc = [(0, 1), (1, 2), (2, 3), (3, 0)]
    pairs = cyc + [(b, a) for a, b in cyc]
    out = degree_assortativity(_edges(pairs))
    assert out["den"].iloc[0] == 0
    assert out["r"].iloc[0] == 0.0


def test_rich_club_star_plus_clique():
    from graph_data_science_ray.functions.graph_stats import rich_club

    # triangle {0,1,2} (deg>=2 each) plus pendant 3-0 (deg 1 for node 3;
    # node 0 deg 3)
    und = [(0, 1), (1, 2), (2, 0), (0, 3)]
    pairs = und + [(b, a) for a, b in und]
    out = rich_club(_edges(pairs), ks=(1, 2))
    row = {k: (n, e, p) for k, n, e, p in
           zip(out["k"], out["n_nodes"], out["n_edges"], out["phi_ppm"])}
    # k=1: club = {0,1,2} (degs 3,2,2) -> 3 nodes, 3 edges among them,
    # phi = 3/3 = 1
    assert row[1] == (3, 3, 1_000_000)
    # k=2: club = {0} -> fewer than 2 nodes, phi 0
    assert row[2] == (1, 0, 0)

"""Dataset-returning result contracts (*_ds variants): the O(V) result
is assembled in the object store and must match the DataFrame wrappers
row for row (dense-id space)."""

import numpy as np
import pandas as pd

from tests.conftest import keys_to_ids


def _dense(df: pd.DataFrame, val_col: str, idmap) -> pd.DataFrame:
    out = pd.DataFrame(
        {
            "node": keys_to_ids(df["node"]),
            val_col: keys_to_ids(df[val_col]),
        }
    )
    return out.sort_values("node").reset_index(drop=True)


def test_wcc_ds_matches_wrapper(graph_from_edges):
    from graph_data_science_ray.functions.wcc import wcc, wcc_ds

    edges = [(0, 1), (1, 2), (3, 4), (5, 6), (6, 5)]
    _, gu, idmap, _, _ = graph_from_edges(edges, isolated=[7])
    want = _dense(wcc(gu), "component", idmap)
    got = (
        wcc_ds(gu).to_pandas().sort_values("node").reset_index(drop=True)
    )
    assert np.array_equal(got["node"].to_numpy(), want["node"].to_numpy())
    assert np.array_equal(
        got["component"].to_numpy(), want["component"].to_numpy()
    )


def test_label_propagation_ds_matches_wrapper(graph_from_edges):
    from graph_data_science_ray.functions.labelprop import (
        label_propagation,
        label_propagation_ds,
    )

    edges = [(0, 1), (1, 0), (1, 2), (2, 1), (3, 4), (4, 3)]
    gd, gu, idmap, _, _ = graph_from_edges(edges)
    want = _dense(label_propagation(gu, max_iterations=5), "label", idmap)
    got = (
        label_propagation_ds(gu, max_iterations=5)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    assert np.array_equal(got["node"].to_numpy(), want["node"].to_numpy())
    assert np.array_equal(got["label"].to_numpy(), want["label"].to_numpy())


def test_scc_ds_matches_wrapper(graph_from_edges):
    from graph_data_science_ray.functions.scc import scc, scc_ds

    # two cycles + a bridge + a tail
    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 3), (4, 5)]
    gd, gu, idmap, enc, sym = graph_from_edges(edges)
    n = len(idmap)
    # no idmap: scc returns dense ids directly (broadcast mode)
    want = scc(enc, node_count=n).sort_values("node").reset_index(drop=True)
    got = (
        scc_ds(enc, node_count=n, num_parts=4)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    assert np.array_equal(got["node"].to_numpy(), want["node"].to_numpy())
    assert np.array_equal(
        got["component"].to_numpy(), want["component"].to_numpy()
    )


def test_louvain_ds_matches_partitioned_wrapper(graph_from_edges):
    from graph_data_science_ray.functions.louvain import louvain, louvain_ds

    # two triangle cliques joined by one edge + a pendant
    edges = [
        (0, 1), (1, 2), (2, 0),
        (3, 4), (4, 5), (5, 3),
        (2, 3), (5, 6),
    ]
    gd, gu, idmap, enc, sym = graph_from_edges(edges)
    n = len(idmap)
    for ml, mr in ((3, 5), (1, 2)):
        want = louvain(
            sym, node_count=n, max_levels=ml, max_rounds=mr,
            state_mode="partitioned",
        ).sort_values("node").reset_index(drop=True)
        base = louvain(
            sym, node_count=n, max_levels=ml, max_rounds=mr,
            state_mode="broadcast",
        ).sort_values("node").reset_index(drop=True)
        got = (
            louvain_ds(sym, node_count=n, max_levels=ml, max_rounds=mr,
                       num_parts=4)
            .to_pandas().sort_values("node").reset_index(drop=True)
        )
        assert np.array_equal(
            want["community"].to_numpy(), base["community"].to_numpy()
        ), "wrapper modes disagree"
        assert np.array_equal(got["node"].to_numpy(), want["node"].to_numpy())
        assert np.array_equal(
            got["community"].to_numpy(), want["community"].to_numpy()
        ), (ml, mr)


def test_leiden_ds_matches_partitioned_wrapper(graph_from_edges):
    from graph_data_science_ray.functions.louvain import leiden, leiden_ds

    # two triangle cliques joined by one edge + a pendant + a 4-cycle
    edges = [
        (0, 1), (1, 2), (2, 0),
        (3, 4), (4, 5), (5, 3),
        (2, 3), (5, 6),
        (7, 8), (8, 9), (9, 10), (10, 7),
    ]
    gd, gu, idmap, enc, sym = graph_from_edges(edges)
    n = len(idmap)
    # broadcast==partitioned parity is covered by test_community_and_order;
    # here only the Dataset contract vs the partitioned wrapper (one config
    # — the partitioned/ds paths cost many materialize rounds each)
    ml, mr = 3, 5
    want = leiden(
        sym, node_count=n, max_levels=ml, max_rounds=mr,
        state_mode="partitioned",
    ).sort_values("node").reset_index(drop=True)
    got = (
        leiden_ds(sym, node_count=n, max_levels=ml, max_rounds=mr,
                  num_parts=4)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    assert np.array_equal(got["node"].to_numpy(), want["node"].to_numpy())
    assert np.array_equal(
        got["community"].to_numpy(), want["community"].to_numpy()
    )

"""CSV export/import round-trip — the reference's CsvGraphStoreExporter /
CsvFileInput surface on the partitioned-CSR GraphStore."""

import numpy as np
import pytest

import graph_data_science_ray as gdsr
from graph_data_science_ray.state.graph import export_csv, import_csv


def test_csv_round_trip(graph_from_edges, tmp_path):
    gd, _, idmap, enc, _ = graph_from_edges(
        [(0, 1), (0, 1), (1, 2), (2, 3), (3, 0)], isolated=[7]
    )
    gd.add_node_property("score", np.arange(gd.node_count, dtype=np.float64))

    info = export_csv(gd, str(tmp_path / "csv"))
    assert info["node_count"] == gd.node_count
    assert info["edge_count"] == gd.edge_count
    assert (tmp_path / "csv" / "nodes.csv").exists()

    g2 = import_csv(str(tmp_path / "csv"), str(tmp_path / "g2"))
    assert g2.node_count == gd.node_count
    assert g2.edge_count == gd.edge_count
    assert g2.directed == gd.directed
    # isolated node and its key survive
    assert list(g2.idmap.keys) == list(gd.idmap.keys)
    # mutated property survives
    assert (g2.node_property("score") == gd.node_property("score")).all()
    # algorithm output identical on both
    a = gdsr.pagerank(gd, max_iterations=10)
    b = gdsr.pagerank(g2, max_iterations=10)
    ma = a.sort_values("node").reset_index(drop=True)
    mb = b.sort_values("node").reset_index(drop=True)
    assert (ma["score"].to_numpy() == mb["score"].to_numpy()).all()


def test_csv_weights_survive(graph_from_edges, tmp_path):
    gd, _, _, _, _ = graph_from_edges([(0, 1), (0, 1), (0, 1), (1, 2)])
    export_csv(gd, str(tmp_path / "c"))
    g2 = import_csv(str(tmp_path / "c"), str(tmp_path / "g"))
    # weighted totals via block reconstruction
    import ray

    w1 = sum(float(b["weights"].sum()) for b in ray.get(gd.block_refs()))
    w2 = sum(float(b["weights"].sum()) for b in ray.get(g2.block_refs()))
    assert w1 == w2 == 4.0

import warnings

import numpy as np
import pytest
import ray
import ray.data as rd

import graph_data_science_ray as gdsr


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    warnings.filterwarnings("ignore")
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture()
def graph_from_edges(tmp_path):
    """Build (directed_graph, undirected_graph, idmap, enc, sym) from a golden
    edge list, exercising the full transcript→edge→projection path."""

    def build(edge_list, isolated=(), num_partitions=3, undirected_only=False):
        t = gdsr.transcripts_from_edge_list(edge_list, isolated_nodes=list(isolated))
        turns = gdsr.derive_turns(rd.from_arrow(t))
        edges = gdsr.derive_edges(turns, num_partitions=2)
        idmap = gdsr.IdMap.from_turns(turns)
        enc = gdsr.encode_edges(edges, idmap).materialize()
        sym = gdsr.symmetrize(enc, num_partitions=2).materialize()
        gd = None
        if not undirected_only:
            gd = gdsr.GraphStore.project(
                enc, str(tmp_path / "gd"), idmap=idmap,
                num_partitions=num_partitions, directed=True,
            )
        gu = gdsr.GraphStore.project(
            sym, str(tmp_path / "gu"), idmap=idmap,
            num_partitions=num_partitions, directed=False,
        )
        return gd, gu, idmap, enc, sym

    return build


def keys_to_ids(series):
    """Map 'role:nXXXX' actor keys back to integer node ids."""
    return np.array([int(k.split(":n")[1]) for k in series], dtype=np.int64)

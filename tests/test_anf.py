"""HyperANF: register parity vs a dense brute-force max-merge, curve
monotonicity, and the 2-D OR-reducer kernel extension it rides."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

import graph_data_science_ray as gdsr
from graph_data_science_ray.functions.anf import (
    _M,
    _init_registers,
    _rho_from_thermo,
    anf_registers,
    anf_registers_ds,
    effective_diameter,
    neighborhood_function,
)


def _line_graph(tmp_path, n=6, parts=3):
    """0-1-2-...-(n-1) undirected path with string keys."""
    keys = [f"n{i:02d}" for i in range(n)]
    src, dst = [], []
    for i in range(n - 1):
        src += [keys[i], keys[i + 1]]
        dst += [keys[i + 1], keys[i]]
    edges = rd.from_pandas(
        pd.DataFrame({"src": src, "dst": dst, "weight": 1.0})
    )
    im = gdsr.IdMap(np.array(keys, dtype=object))
    enc = gdsr.encode_edges(edges, im).materialize()
    return gdsr.GraphStore.project(
        enc, str(tmp_path / "anf-line"), idmap=im,
        num_partitions=parts, directed=False,
    )


def _brute(g, rounds):
    V = g.node_count
    regs = _rho_from_thermo(_init_registers(np.arange(V)))
    eb = [(i, i + 1) for i in range(V - 1)]
    for _ in range(rounds):
        new = regs.copy()
        for a, b in eb:
            np.maximum(new[b], regs[a], out=new[b])
            np.maximum(new[a], regs[b], out=new[a])
        regs = new
    return regs


@pytest.mark.parametrize("rounds", [1, 2, 5])
def test_anf_registers_match_brute_force(tmp_path, rounds):
    g = _line_graph(tmp_path)
    out = anf_registers(g, rounds=rounds)
    ref = _brute(g, rounds)
    got = np.zeros_like(ref)
    pos = {k: i for i, k in enumerate(g.idmap.keys)}
    for n, r, v in zip(out["node"], out["register"], out["rho"]):
        got[pos[n], r] = v
    assert (got == ref).all()
    assert len(out) == g.node_count * _M


def test_anf_partition_invariance(tmp_path):
    a = anf_registers(_line_graph(tmp_path, parts=2), rounds=3)
    b = anf_registers(_line_graph(tmp_path, parts=5), rounds=3)
    assert a.equals(b)


def test_anf_ds_contract(tmp_path):
    """The Dataset variant builds per-partition blocks (driver touches
    refs only) and carries dense ids."""
    g = _line_graph(tmp_path)
    ds = anf_registers_ds(g, rounds=2)
    df = ds.to_pandas()
    assert set(df.columns) == {"node", "register", "rho"}
    assert df["node"].nunique() == g.node_count


def test_neighborhood_function_monotone_and_converges(tmp_path):
    g = _line_graph(tmp_path, n=8)
    nf = neighborhood_function(g, rounds=20)
    est = nf["n_pairs_est"].to_numpy()
    assert (np.diff(est) >= -1e-9).all()  # monotone curve
    # a path of 8 nodes has diameter 7: curve stops by round 7 + 1
    assert nf["t"].iloc[-1] <= 8
    assert est[0] == 8.0  # exact at t=0
    d = effective_diameter(g, q=0.9, max_rounds=20)
    assert 1 <= d["effective_diameter"] <= 7

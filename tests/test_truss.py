"""K-truss: brute-force parity, fixpoint behavior, empty-truss path."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from graph_data_science_ray.functions.truss import edge_support, k_truss


def _sym(pairs, parts=4):
    src = [a for a, b in pairs] + [b for a, b in pairs]
    dst = [b for a, b in pairs] + [a for a, b in pairs]
    return rd.from_pandas(
        pd.DataFrame(
            {
                "src": np.array(src, dtype=np.int64),
                "dst": np.array(dst, dtype=np.int64),
                "weight": 1.0,
            }
        )
    ).repartition(parts)


def _brute_support(E):
    adj = {}
    for a, b in E:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return {(a, b): len(adj[a] & adj[b]) for a, b in E}


def _brute_ktruss(E, k):
    E = set(E)
    while True:
        s = _brute_support(E)
        kept = {e for e in E if s[e] >= k - 2}
        if kept == E:
            return s
        E = kept
        if not E:
            return {}


def _rand_pairs(seed=3, V=40, m=160):
    rng = np.random.default_rng(seed)
    pairs = set()
    while len(pairs) < m:
        a, b = rng.integers(0, V, 2)
        if a != b:
            pairs.add((min(int(a), int(b)), max(int(a), int(b))))
    return sorted(pairs), V


@pytest.mark.parametrize("k", [3, 4, 5])
def test_ktruss_matches_brute_force(k):
    pairs, V = _rand_pairs()
    out, rounds = k_truss(_sym(pairs), k=k, node_count=V, num_partitions=4)
    df = out.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    ref_s = _brute_ktruss(pairs, k)
    ref = pd.DataFrame(
        {
            "src": [a for a, b in sorted(ref_s)],
            "dst": [b for a, b in sorted(ref_s)],
            "support": [ref_s[e] for e in sorted(ref_s)],
        }
    )
    assert len(df) == len(ref) > 0
    assert df.astype(np.int64).equals(ref.astype(np.int64))
    assert rounds >= 1


def test_ktruss_triangle_free_empties():
    # 4-cycle has no triangles: 3-truss is empty (schema may drop at the
    # pandas boundary for a fully-empty Dataset — engine-wide Ray
    # pitfall; callers re-assert columns)
    out, rounds = k_truss(
        _sym([(0, 1), (1, 2), (2, 3), (0, 3)]), k=3, node_count=4,
        num_partitions=4,
    )
    assert out.count() == 0


def test_edge_support_zero_fill_and_parity():
    # triangle 0-1-2 plus pendant edge 2-3: supports 1,1,1,0
    pairs = [(0, 1), (0, 2), (1, 2), (2, 3)]
    sup = (
        edge_support(
            _sym(pairs).map_batches(
                lambda df: df[df["src"] < df["dst"]][["src", "dst"]],
                batch_format="pandas",
            ),
            V=4,
            num_partitions=4,
        )
        .to_pandas()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    assert sup["support"].tolist() == [1, 1, 1, 0]


def test_ktruss_partition_invariance():
    pairs, V = _rand_pairs(seed=9, V=30, m=120)
    a, _ = k_truss(_sym(pairs, parts=2), k=4, node_count=V, num_partitions=4)
    b, _ = k_truss(_sym(pairs, parts=7), k=4, node_count=V, num_partitions=16)
    pa_ = a.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    pb = b.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    assert pa_.equals(pb)

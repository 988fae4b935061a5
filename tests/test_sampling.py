"""Corpus sampling stages: hash split, histogram quantile, per-group top-k."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from graph_data_science_ray.stages.sampling import (
    hash_split,
    quantile_filter,
    quantile_threshold,
    split_threshold_hex,
    top_k_per_group,
)


def _table(n=400, seed=7):
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "lang": pa.array([["en", "de", "fr"][i % 3] for i in range(n)]),
            "score": pa.array(rng.integers(0, 1000, n), pa.int64()),
        }
    )


def test_hash_split_deterministic_and_ratio():
    ds = rd.from_arrow(_table())
    out = hash_split(ds, test_ratio=0.25, id_col="doc_id").to_pandas()
    out2 = (
        hash_split(rd.from_arrow(_table()).repartition(7), 0.25, id_col="doc_id")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    out = out.sort_values("doc_id").reset_index(drop=True)
    # identical at any block layout
    assert out["split"].tolist() == out2["split"].tolist()
    frac = (out["split"] == "test").mean()
    assert 0.15 < frac < 0.35
    # threshold hex is the 32-bit ratio boundary
    assert split_threshold_hex(0.5) == "80000000"
    assert split_threshold_hex(0.0) == "00000000"
    # ratio 1.0: "g" sorts above every hex prefix -> everything is test
    assert split_threshold_hex(1.0) == "g"
    all_test = hash_split(rd.from_arrow(_table(50)), 1.0).to_pandas()
    assert (all_test["split"] == "test").all()
    with pytest.raises(ValueError):
        split_threshold_hex(1.5)


def test_quantile_threshold_matches_exact_definition():
    t = _table()
    ds = rd.from_arrow(t).repartition(5)
    thr = quantile_threshold(ds, "score", 0.9, bins=4096)
    x = np.asarray(t["score"], dtype=np.float64)
    lo, hi, n = x.min(), x.max(), len(x)
    b = np.minimum(np.floor((x - lo) * 4096.0 / (hi - lo)).astype(np.int64), 4095)
    counts = np.bincount(b, minlength=4096)
    pick = int(np.searchsorted(np.cumsum(counts), int(np.ceil(0.9 * n))))
    assert thr == lo + pick * (hi - lo) / 4096.0
    kept = quantile_filter(ds, "score", 0.9).to_pandas()
    assert (kept["score"].to_numpy().astype(np.float64) >= thr).all()
    # roughly the top decile survives
    assert 0.05 * n < len(kept) < 0.2 * n


def test_quantile_threshold_constant_column():
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()), "v": [5, 5, 5]})
    )
    assert quantile_threshold(ds, "v", 0.9) == 5.0
    assert quantile_filter(ds, "v", 0.9).count() == 3


def test_top_k_per_group_matches_pandas_and_layout_invariant():
    t = _table()
    want = (
        t.to_pandas()
        .sort_values(["score", "doc_id"], ascending=[False, True])
        .groupby("lang", sort=False)
        .head(7)
        .sort_values(["lang", "doc_id"])
        .reset_index(drop=True)
    )
    for parts in (1, 9):
        ds = rd.from_arrow(t).repartition(parts)
        got = (
            top_k_per_group(ds, "lang", "score", 7, id_col="doc_id")
            .to_pandas()[["doc_id", "lang", "score"]]
            .sort_values(["lang", "doc_id"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want[["doc_id", "lang", "score"]])


def test_top_k_per_group_tie_break_by_id():
    # every score equal: the k smallest ids per group must win
    t = pa.table(
        {
            "doc_id": pa.array(range(30), pa.int64()),
            "lang": pa.array(["en" if i % 2 else "de" for i in range(30)]),
            "score": pa.array([1] * 30, pa.int64()),
        }
    )
    got = (
        top_k_per_group(rd.from_arrow(t).repartition(4), "lang", "score", 3)
        .to_pandas()
        .sort_values(["lang", "doc_id"])
    )
    assert got[got["lang"] == "de"]["doc_id"].tolist() == [0, 2, 4]
    assert got[got["lang"] == "en"]["doc_id"].tolist() == [1, 3, 5]


def test_deterministic_shuffle_stable_across_layouts(ray_session):
    import pandas as pd
    import ray.data as rd

    from graph_data_science_ray.stages.sampling import deterministic_shuffle

    df = pd.DataFrame({"doc_id": np.arange(100, dtype=np.int64)})
    a = (
        deterministic_shuffle(rd.from_pandas(df), "doc_id")
        .to_pandas().sort_values("doc_id")["pos"].to_numpy()
    )
    b = (
        deterministic_shuffle(rd.from_pandas(df).repartition(7), "doc_id")
        .to_pandas().sort_values("doc_id")["pos"].to_numpy()
    )
    assert (a == b).all()
    # a permutation of 1..n, and not the identity
    assert sorted(a.tolist()) == list(range(1, 101))
    assert (a != np.arange(1, 101)).any()


def test_weighted_sample_flags_monotone_and_exact():
    """Keep-rate must rise with weight; weight == max with rate 1/1 is
    always kept; zero weight is never kept; flags are layout-invariant."""
    from graph_data_science_ray.stages.sampling import weighted_sample_flags

    n = 600
    w = np.concatenate([
        np.zeros(200, dtype=np.int64),          # never kept
        np.full(200, 100, dtype=np.int64),      # p = 0.5 * 100/1000
        np.full(200, 1000, dtype=np.int64),     # p = 0.5
    ])
    t = pa.table({"doc_id": pa.array(range(n), pa.int64()),
                  "w": pa.array(w, pa.int64())})
    out = (
        weighted_sample_flags(rd.from_arrow(t), "w", rate_num=1, rate_den=2)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert out["kept"][:200].sum() == 0
    low = out["kept"][200:400].mean()
    high = out["kept"][400:].mean()
    assert low < high
    assert abs(high - 0.5) < 0.15  # Bernoulli(0.5) over 200 draws

    # rate 1/1 at max weight keeps EVERY max-weight row
    full = (
        weighted_sample_flags(rd.from_arrow(t), "w", rate_num=1, rate_den=1)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert full["kept"][400:].all()

    # layout invariance: different block structure, identical flags
    re = (
        weighted_sample_flags(
            rd.from_arrow(t).repartition(7), "w", rate_num=1, rate_den=2)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert (re["kept"] == out["kept"]).all()


def test_source_mix_flags_quota_and_determinism():
    """source_mix_flags: per-source kept counts stay within the integer
    quota, shares track the target weights, and flags are identical
    across repartitionings."""
    import pyarrow as pa

    from graph_data_science_ray.stages.sampling import source_mix_flags

    n = 3000
    src = [f"src{i % 3}" for i in range(n)]
    t = pa.table({"doc_id": pa.array(range(n), pa.int64()),
                  "source": pa.array(src, pa.string())})
    wf = lambda s: {"src0": 1, "src1": 2, "src2": 4}[s]
    a = (source_mix_flags(rd.from_arrow(t), weight_of=wf, budget_ppm=500_000)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (source_mix_flags(rd.from_arrow(t).repartition(11), weight_of=wf,
                          budget_ppm=500_000)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert a.equals(b)
    kept = a[a["kept"] == 1].groupby("source").size()
    # quotas: W = 1000*(1+2+4) = 7000, B = 1500 -> k = 1500*w*1000//7000
    quota = {s: 1500 * wf(s) * 1000 // 7000 for s in ["src0", "src1", "src2"]}
    for s in quota:
        got = int(kept.get(s, 0))
        # Bernoulli around k_s/n_s: within 5 sigma of the quota
        sig = (quota[s] * (1 - quota[s] / 1000)) ** 0.5
        assert abs(got - quota[s]) < 5 * sig + 1
    # heavier sources keep proportionally more
    assert kept["src2"] > kept["src1"] > kept["src0"]

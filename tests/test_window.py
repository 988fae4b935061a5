"""Window-function primitives: running_sum, row_number, lag, packing."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from graph_data_science_ray.stages.window import (
    lag_column,
    pack_sequences,
    row_number,
    running_sum,
)


def _ds(n=100, blocks=7, seed=1):
    rng = np.random.default_rng(seed)
    t = pa.table(
        {
            "id": pa.array(range(n), pa.int64()),
            "k": pa.array((np.arange(n) % 5).astype(np.int64)),
            "v": pa.array(rng.integers(1, 50, n), pa.int64()),
        }
    )
    return rd.from_arrow(t).repartition(blocks)


def test_running_sum_matches_pandas_any_blocks():
    for blocks in (1, 3, 11):
        out = (
            running_sum(_ds(blocks=blocks), ["id"], "v")
            .to_pandas().sort_values("id").reset_index(drop=True)
        )
        expect = _ds().to_pandas().sort_values("id")["v"].cumsum().to_numpy()
        assert (out["running_sum"].to_numpy() == expect).all()
    # exclusive prefix
    out = (
        running_sum(_ds(), ["id"], "v", inclusive=False)
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    assert out["running_sum"].iloc[0] == 0
    assert (out["running_sum"].to_numpy()[1:] == expect[:-1]).all()


def test_row_number_is_global_permutation():
    out = (
        row_number(_ds(blocks=9), ["v", "id"], out_col="rn")
        .to_pandas()
    )
    assert sorted(out["rn"]) == list(range(1, 101))
    # rn order == (v, id) order
    s = out.sort_values("rn")
    key = list(zip(s["v"], s["id"]))
    assert key == sorted(key)


def test_lag_resets_at_key_boundaries():
    out = (
        lag_column(_ds(blocks=8), ["id"], "v", key_col="k", out_col="prev")
        .to_pandas().sort_values(["k", "id"]).reset_index(drop=True)
    )
    expect = (
        _ds().to_pandas().sort_values(["k", "id"])
        .groupby("k")["v"].shift(1).reset_index(drop=True)
    )
    got = out["prev"].reset_index(drop=True)
    assert got.isna().equals(expect.isna())
    assert (got.dropna().to_numpy() == expect.dropna().to_numpy()).all()
    # exactly one null per key (the first row of each of the 5 keys)
    assert int(got.isna().sum()) == 5


def test_lag_global_no_key():
    out = (
        lag_column(_ds(blocks=4), ["id"], "v", out_col="prev")
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    v = _ds().to_pandas().sort_values("id")["v"].to_numpy()
    assert np.isnan(out["prev"].iloc[0])
    assert (out["prev"].to_numpy()[1:] == v[:-1]).all()


def test_pack_sequences_contract():
    docs = rd.from_arrow(
        pa.table(
            {"doc_id": pa.array(range(10), pa.int64()),
             "n_tokens": pa.array([100] * 10, pa.int64())}
        )
    ).repartition(3)
    out = (
        pack_sequences(docs, budget=250)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert out["offset"].tolist() == [i * 100 for i in range(10)]
    assert out["seq_id"].tolist() == [i * 100 // 250 for i in range(10)]


def test_rank_select_and_quantiles_disc():
    """Order statistics across many blocks; tie values; DuckDB
    quantile_disc parity on a known vector."""
    import duckdb
    import ray.data as rd

    from graph_data_science_ray.stages.window import quantiles_disc, rank_select

    vals = np.array([5, 1, 3, 3, 9, 7, 1, 8, 2, 6], dtype=np.int64)
    ds = rd.from_pandas(pd.DataFrame({"x": vals})).repartition(4)
    sel = rank_select(ds, "x", [0, 4, 9])
    srt = np.sort(vals)
    assert sel["value"].tolist() == [srt[0], srt[4], srt[9]]
    qs = [0.0, 0.3, 0.5, 0.9, 1.0]
    out = quantiles_disc(ds, "x", qs)
    for q, v in zip(out["q"], out["value"]):
        ref = duckdb.sql(
            f"SELECT quantile_disc(x, {q}) FROM (SELECT unnest({vals.tolist()}) AS x)"
        ).fetchone()[0]
        assert v == ref, (q, v, ref)
    import pytest

    with pytest.raises(ValueError):
        rank_select(ds, "x", [10])

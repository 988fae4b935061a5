"""Funnel / retention semantics over a hand-built event log, plus the
collocation and readability corpus ops on tiny fixtures."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def _events():
    # user 1: full ordered funnel; user 2: purchase BEFORE click (stage
    # order violated at the last hop); user 3: signup only.
    rows = [
        (0, "2024-01-01 00:00:00", 1, "signup"),
        (1, "2024-01-01 01:00:00", 1, "view"),
        (2, "2024-01-02 02:00:00", 1, "click"),
        (3, "2024-01-03 03:00:00", 1, "purchase"),
        (4, "2024-01-01 00:00:00", 2, "signup"),
        (5, "2024-01-01 01:00:00", 2, "view"),
        (6, "2024-01-01 03:00:00", 2, "purchase"),
        (7, "2024-01-01 04:00:00", 2, "click"),
        (8, "2024-01-05 00:00:00", 3, "signup"),
    ]
    return rd.from_arrow(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(
            [np.datetime64(r[1], "us") for r in rows], pa.timestamp("us")
        ),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
    }))


def test_funnel_ordered_strictly_after():
    from graph_data_science_ray.stages.sessions import funnel_counts

    out = (funnel_counts(_events()).to_pandas()
           .sort_values("stage_idx").reset_index(drop=True))
    assert out["stage"].tolist() == ["signup", "view", "click", "purchase"]
    # user 2 reaches click (after view) but its purchase precedes click
    assert out["users"].tolist() == [3, 2, 2, 1]


def test_funnel_strict_inequality_on_tied_ts():
    from graph_data_science_ray.stages.sessions import funnel_counts

    ev = rd.from_arrow(pa.table({
        "event_id": pa.array([0, 1], pa.int64()),
        "ts": pa.array(
            [np.datetime64("2024-01-01", "us")] * 2, pa.timestamp("us")
        ),
        "user_id": pa.array([7, 7], pa.int64()),
        "event_type": pa.array(["signup", "view"], pa.string()),
    }))
    out = (funnel_counts(ev, stages=("signup", "view")).to_pandas()
           .sort_values("stage_idx").reset_index(drop=True))
    assert out["users"].tolist() == [1, 0]  # tie is NOT strictly after


def test_retention_cohorts_offsets():
    from graph_data_science_ray.stages.sessions import retention_cohorts

    out = (retention_cohorts(_events()).to_pandas()
           .sort_values(["cohort_day", "offset_days"])
           .reset_index(drop=True))
    d0 = 19723  # 2024-01-01 epoch day
    # users 1+2 cohort d0: both active offset 0; user 1 also offsets 1, 2
    # user 3 cohort d0+4, offset 0
    assert out.values.tolist() == [
        [d0, 0, 2], [d0, 1, 1], [d0, 2, 1], [d0 + 4, 0, 1],
    ]


def _docs(texts):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))


def test_pmi_exact_integer_ppm():
    from graph_data_science_ray.stages.ir import pmi_bigrams

    # "x y x y z": bigrams x>y (2), y>x (1), y>z (1); T=4.
    # PMI(x,y) = ln(T*c_xy/(c_x*c_y)) = ln(4*2/(2*2)) = ln 2, and the
    # floored-ppm discipline gives floor(ln4e6)+floor(ln2e6)-2*floor(ln2e6)
    out = pmi_bigrams(_docs(["x y x y z"]), min_count=2).to_pandas()
    assert len(out) == 1
    assert out["w1"].iloc[0] == "x" and out["w2"].iloc[0] == "y"
    assert int(out["c_xy"].iloc[0]) == 2
    ln = lambda v: int(np.floor(np.log(float(v)) * 1e6))
    assert int(out["pmi_ppm"].iloc[0]) == ln(4) + ln(2) - ln(2) - ln(2)


def test_readability_counts():
    from graph_data_science_ray.stages.quality import readability

    out = (readability(_docs([
        "The cat sat. The dog ran!",   # 6 words, 2 sentences
        "",                             # empty
        "rhythm",                       # no vowel group -> clamped to 1
    ])).to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["n_words"].tolist() == [6, 0, 1]
    assert out["n_sentences"].tolist() == [2, 0, 1]
    # the(1) cat(1) sat(1) the(1) dog(1) ran(1) = 6; rhythm: y group = 1
    assert out["n_syllables"].tolist() == [6, 0, 1]


def test_degree_gini_extremes():
    from graph_data_science_ray.functions.graph_stats import degree_gini

    # equal degrees -> Gini 0
    eq = rd.from_arrow(pa.table({
        "src": pa.array([0, 1, 2], pa.int64()),
        "dst": pa.array([1, 2, 0], pa.int64()),
    }))
    out = degree_gini(eq, node_count=3)
    assert int(out["gini_num"].iloc[0]) == 0
    # one hub holds all edges among n nodes -> G = (n-1)/n
    hub = rd.from_arrow(pa.table({
        "src": pa.array([0, 0, 0], pa.int64()),
        "dst": pa.array([1, 2, 3], pa.int64()),
    }))
    out = degree_gini(hub, node_count=4)
    num, den = int(out["gini_num"].iloc[0]), int(out["gini_den"].iloc[0])
    assert num * 4 == den * 3  # 3/4


def test_zipf_fit_exact_slope():
    from graph_data_science_ray.stages.ir import zipf_fit

    # counts 4,2,1 at ranks 1,2,3: y = ln c, x = ln r
    docs = _docs(["a a a a b b c"])
    out = zipf_fit(docs, k=3)
    x = np.floor(np.log(np.arange(1, 4, dtype=np.float64)) * 1e6).astype(int)
    y = np.floor(np.log(np.array([4.0, 2.0, 1.0])) * 1e6).astype(int)
    num = 3 * int((x * y).sum()) - int(x.sum()) * int(y.sum())
    den = 3 * int((x * x).sum()) - int(x.sum()) ** 2
    assert int(out["slope_num"].iloc[0]) == num
    assert int(out["slope_den"].iloc[0]) == den
    assert num / den < -0.5  # decreasing, roughly zipfian


def test_funnel_transition_gaps():
    from graph_data_science_ray.stages.sessions import funnel_transition_stats

    out = funnel_transition_stats(_events())
    assert out["users"].tolist() == [3, 2, 2, 1]
    h = 3_600_000_000  # one hour in microseconds
    # view gaps: user1 1h, user2 1h; click gaps: user1 25h, user2 3h;
    # purchase gaps: user1 25h
    assert out["sum_gap_us"].tolist() == [0, 2 * h, 28 * h, 25 * h]
    assert out["max_gap_us"].tolist() == [0, h, 25 * h, 25 * h]


def test_ams_f2_merge_and_estimate():
    from graph_data_science_ray.stages.sketch import (
        ams_f2_estimate,
        ams_registers,
    )

    a = _docs(["x x x y", "z z"])
    b = _docs(["x y y w"])
    both = _docs(["x x x y", "z z", "x y y w"])
    ra = ams_registers(a, "text").to_pandas().sort_values("srow")
    rb = ams_registers(b, "text").to_pandas().sort_values("srow")
    rc = ams_registers(both, "text").to_pandas().sort_values("srow")
    # mergeable by addition
    assert (ra["s"].to_numpy() + rb["s"].to_numpy()
            == rc["s"].to_numpy()).all()
    # F2 = sum of squared counts: x:4, y:3, z:2, w:1 -> 16+9+4+1 = 30
    est = ams_f2_estimate(rc)
    assert 0 < est < 300  # unbiased estimator, wide tolerance at r=16

"""Trajectory curation: conversation stats + duplicate-turn flags."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def _turns():
    rows = [
        # conv a: alternating actors, one duped text
        ("a", 0, "u1", "hello"),
        ("a", 1, "u2", "world"),
        ("a", 2, "u1", "hello"),
        # conv b: single actor, no switches
        ("b", 0, "u3", "solo"),
        ("b", 1, "u3", "solo"),
        # conv c: cross-conv dup of "world"
        ("c", 0, "u4", "world"),
    ]
    return rd.from_arrow(pa.table({
        "conv_id": pa.array([r[0] for r in rows], pa.string()),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "role": pa.array([r[2] for r in rows], pa.string()),
        "text": pa.array([r[3] for r in rows], pa.string()),
    }))


def test_conversation_stats():
    from graph_data_science_ray.stages.trajectory import conversation_stats

    out = (conversation_stats(_turns()).to_pandas()
           .sort_values("conv").reset_index(drop=True))
    assert out["conv"].tolist() == ["a", "b", "c"]
    assert out["n_turns"].tolist() == [3, 2, 1]
    assert out["n_actors"].tolist() == [2, 1, 1]
    assert out["n_switches"].tolist() == [2, 0, 0]
    assert out["sum_chars"].tolist() == [15, 8, 5]


def test_turn_dedup_flags_keeper_order_and_determinism():
    from graph_data_science_ray.stages.trajectory import turn_dedup_flags

    a = (turn_dedup_flags(_turns()).to_pandas()
         .sort_values(["conv", "turn_idx"]).reset_index(drop=True))
    b = (turn_dedup_flags(_turns().repartition(5)).to_pandas()
         .sort_values(["conv", "turn_idx"]).reset_index(drop=True))
    assert a.equals(b)
    flags = dict(zip(zip(a["conv"], a["turn_idx"]), a["dup"]))
    assert flags[("a", 0)] == 0   # first "hello"
    assert flags[("a", 2)] == 1   # repeated within conv
    assert flags[("a", 1)] == 0   # first "world"
    assert flags[("c", 0)] == 1   # repeated across convs
    assert flags[("b", 0)] == 0 and flags[("b", 1)] == 1

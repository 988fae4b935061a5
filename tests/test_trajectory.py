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


def test_role_transitions_counts_and_self_transitions():
    from graph_data_science_ray.stages.trajectory import role_transitions

    out = (role_transitions(_turns()).to_pandas()
           .sort_values(["prev_role", "role"]).reset_index(drop=True))
    got = {(p, r): n for p, r, n in
           zip(out["prev_role"], out["role"], out["n"])}
    # conv a: u1->u2, u2->u1; conv b: u3->u3 (self-transition kept)
    assert got == {("u1", "u2"): 1, ("u2", "u1"): 1, ("u3", "u3"): 1}
    b = (role_transitions(_turns().repartition(5)).to_pandas()
         .sort_values(["prev_role", "role"]).reset_index(drop=True))
    assert out.equals(b)


def test_turn_loop_flags_same_actor_repeat():
    from graph_data_science_ray.stages.trajectory import turn_loop_flags

    out = (turn_loop_flags(_turns()).to_pandas()
           .sort_values(["conv", "turn_idx"]).reset_index(drop=True))
    flags = dict(zip(zip(out["conv"], out["turn_idx"]), out["looped"]))
    # conv a: u1 repeats "hello" at idx 2 (same actor, intervening u2 turn)
    assert flags[("a", 2)] == 1
    assert flags[("a", 0)] == 0 and flags[("a", 1)] == 0
    # conv b: u3 repeats "solo" consecutively
    assert flags[("b", 1)] == 1 and flags[("b", 0)] == 0
    # cross-conv dup is NOT a loop
    assert flags[("c", 0)] == 0


def test_turn_context_window_accounting():
    from graph_data_science_ray.stages.trajectory import turn_context

    out = (turn_context(_turns(), k=2).to_pandas()
           .sort_values(["conv", "turn_idx"]).reset_index(drop=True))
    row = {(c, i): (t, ch) for c, i, t, ch in
           zip(out["conv"], out["turn_idx"],
               out["ctx_turns"], out["ctx_chars"])}
    # conv a texts: hello(5), world(5), hello(5)
    assert row[("a", 0)] == (0, 0)
    assert row[("a", 1)] == (1, 5)
    assert row[("a", 2)] == (2, 10)
    # conv b: solo(4), solo(4)
    assert row[("b", 1)] == (1, 4)
    assert row[("c", 0)] == (0, 0)


def test_pack_conversations_prefix_sum_contract():
    from graph_data_science_ray.stages.trajectory import pack_conversations

    out = (pack_conversations(_turns(), budget=3).to_pandas()
           .sort_values("conv").reset_index(drop=True))
    # token totals: a=3, b=2, c=1 (one \S+ token per turn)
    assert out["conv"].tolist() == ["a", "b", "c"]
    assert out["n_tokens"].tolist() == [3, 2, 1]
    assert out["offset"].tolist() == [0, 3, 5]
    assert out["seq_id"].tolist() == [0, 1, 1]
    b = (pack_conversations(_turns().repartition(5), budget=3).to_pandas()
         .sort_values("conv").reset_index(drop=True))
    assert out.equals(b)


def test_conversation_jaccard_exact_pairs():
    import pyarrow as pa
    import ray.data as rd

    from graph_data_science_ray.stages.trajectory import conversation_jaccard

    rows = [
        ("x", 0, "u1", "the quick brown fox jumps"),
        ("x", 1, "u2", "over the lazy dog"),
        # y = same dialogue, different turn split -> near-dup of x
        ("y", 0, "u1", "the quick brown fox"),
        ("y", 1, "u2", "jumps over the lazy dog"),
        ("z", 0, "u3", "completely different content here entirely"),
    ]
    turns = rd.from_arrow(pa.table({
        "conv_id": pa.array([r[0] for r in rows], pa.string()),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "role": pa.array([r[2] for r in rows], pa.string()),
        "text": pa.array([r[3] for r in rows], pa.string()),
    }))
    out = conversation_jaccard(turns, threshold=0.5).to_pandas()
    # x and y concatenate to the identical 9-token document: jaccard 1.0
    assert len(out) == 1
    pair = {out["conv_a"].iloc[0], out["conv_b"].iloc[0]}
    assert pair == {"x", "y"}
    assert out["jaccard"].iloc[0] == 1.0


def test_hash_join_preserves_int64_above_2_53():
    """Regression: null-widened int64 columns used to ride Ray's
    groupby/sort as double, corrupting values above 2^53 (64-bit hash
    keys). The zero-filler widening must keep every bit, including
    through a CHAINED second join (whose left side is join-1 output
    blocks)."""
    import pyarrow as pa
    import ray.data as rd

    from graph_data_science_ray.pipelines.agg import hash_join

    big_a, big_b = 294186462471603296, 710810379057940483
    left = rd.from_pandas(pd.DataFrame({
        "doc_a": np.array([big_a], dtype=np.int64),
        "doc_b": np.array([big_b], dtype=np.int64),
        "c": np.array([7], dtype=np.int64)}))
    ra = rd.from_pandas(pd.DataFrame({
        "doc_a": np.array([big_a, 12345], dtype=np.int64),
        "na": np.array([7, 1], dtype=np.int64)}))
    rb = rd.from_pandas(pd.DataFrame({
        "doc_b": np.array([big_b, 67890], dtype=np.int64),
        "nb": np.array([7, 1], dtype=np.int64)}))
    s = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()),
                   ("c", pa.int64())])
    j1 = hash_join(left, ra, on=["doc_a"], left_schema=s,
                   right_schema=pa.schema([("doc_a", pa.int64()),
                                           ("na", pa.int64())]))
    j2 = hash_join(
        j1, rb, on=["doc_b"],
        left_schema=pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()),
                               ("c", pa.int64()), ("na", pa.int64())]),
        right_schema=pa.schema([("doc_b", pa.int64()), ("nb", pa.int64())]))
    out = j2.to_pandas()
    assert len(out) == 1
    assert int(out["doc_a"].iloc[0]) == big_a
    assert int(out["doc_b"].iloc[0]) == big_b
    assert out["na"].iloc[0] == 7 and out["nb"].iloc[0] == 7


def _ts_turns():
    import pyarrow as pa
    import ray.data as rd

    us = np.array([0, 5_000_000, 12_000_000, 100, 200],
                  dtype="datetime64[us]")
    rows = [("a", 0, "u1", "x y z"), ("a", 1, "u2", "x y z"),
            ("a", 2, "u1", "w q r"), ("b", 0, "u3", "p"), ("b", 1, "u3", "p")]
    return rd.from_arrow(pa.table({
        "conv_id": pa.array([r[0] for r in rows], pa.string()),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "role": pa.array([r[2] for r in rows], pa.string()),
        "text": pa.array([r[3] for r in rows], pa.string()),
        "ts": pa.array(us),
    }))


def test_turn_latency_exact_microseconds():
    from graph_data_science_ray.stages.trajectory import turn_latency

    out = (turn_latency(_ts_turns()).to_pandas()
           .sort_values(["conv", "turn_idx"]).reset_index(drop=True))
    lat = dict(zip(zip(out["conv"], out["turn_idx"]), out["latency_us"]))
    assert lat[("a", 0)] == 0
    assert lat[("a", 1)] == 5_000_000
    assert lat[("a", 2)] == 7_000_000
    assert lat[("b", 0)] == 0 and lat[("b", 1)] == 100


def test_latency_stats_span_and_max_gap():
    from graph_data_science_ray.stages.trajectory import latency_stats

    out = (latency_stats(_ts_turns()).to_pandas()
           .sort_values("conv").reset_index(drop=True))
    assert out["conv"].tolist() == ["a", "b"]
    assert out["n_gaps"].tolist() == [2, 1]
    assert out["total_us"].tolist() == [12_000_000, 100]
    assert out["max_us"].tolist() == [7_000_000, 100]


def test_conversation_novelty_ppm():
    from graph_data_science_ray.stages.trajectory import conversation_novelty

    out = (conversation_novelty(_ts_turns()).to_pandas()
           .sort_values("conv").reset_index(drop=True))
    row = {c: (s, d, p) for c, s, d, p in
           zip(out["conv"], out["n_shingles"], out["n_distinct"],
               out["novelty_ppm"])}
    # conv a doc: "x y z x y z w q r" -> 7 shingles, 6 distinct
    # ("x y z" repeats)
    assert row["a"] == (7, 6, 1_000_000 * 6 // 7)
    # conv b doc: "p p" -> fewer than 3 tokens: zero shingles, ppm 0
    assert row["b"] == (0, 0, 0)


def test_trajectory_pack_composition():
    """Dup turns and looped turns are dropped before packing; token
    totals reflect only surviving turns."""
    from graph_data_science_ray.stages.trajectory import trajectory_pack

    # conv a: "hello"(u1), "world"(u2), "hello"(u1 dup+loop -> dropped)
    # conv b: "solo"(u3), "solo"(u3 dup+loop -> dropped)
    # conv c: "world"(u4) cross-conv dup -> dropped; conv c vanishes
    out = (trajectory_pack(_turns(), budget=2).to_pandas()
           .sort_values("conv").reset_index(drop=True))
    assert out["conv"].tolist() == ["a", "b"]
    assert out["n_tokens"].tolist() == [2, 1]   # a: hello world; b: solo
    assert out["offset"].tolist() == [0, 2]
    assert out["seq_id"].tolist() == [0, 1]
    b = (trajectory_pack(_turns().repartition(5), budget=2).to_pandas()
         .sort_values("conv").reset_index(drop=True))
    assert out.equals(b)


def test_latency_moments_exact():
    """Hand-computed gaps; ms-squared discipline; empty-gap conv."""
    import ray.data as rd

    from graph_data_science_ray.stages.trajectory import latency_moments

    base = np.datetime64("2026-01-01T00:00:00", "us")
    turns = rd.from_pandas(pd.DataFrame({
        "conv_id": ["a", "a", "a", "b"],
        "turn_idx": np.array([0, 1, 2, 0], dtype=np.int32),
        "ts": [base, base + np.timedelta64(1_500_000, "us"),
               base + np.timedelta64(4_500_000, "us"), base],
    }))
    out = (latency_moments(turns).to_pandas()
           .sort_values("conv").reset_index(drop=True))
    # conv a: gaps 1.5s, 3.0s -> sum 4.5e6 us; ms^2: 1500^2 + 3000^2
    assert out["conv"].tolist() == ["a", "b"]
    assert out["n_gaps"].tolist() == [2, 0]
    assert out["sum_us"].tolist() == [4_500_000, 0]
    assert out["sumsq_ms2"].tolist() == [1500**2 + 3000**2, 0]

def test_tool_usage_counts():
    from graph_data_science_ray.stages.trajectory import tool_usage

    def mk():
        rows = [
            ("c1", 0, "a", "x", None),
            ("c1", 1, "b", "y", "grep"),
            ("c1", 2, "a", "z", "grep"),
            ("c2", 0, "a", "x", "grep"),
            ("c2", 1, "b", "y", "bash"),
            ("c3", 0, "a", "x", ""),  # empty string is not a tool
        ]
        return rd.from_arrow(pa.table({
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows], pa.string()),
            "text": pa.array([r[3] for r in rows], pa.string()),
            "tool": pa.array([r[4] for r in rows], pa.string()),
        }))

    out = tool_usage(mk()).to_pandas().sort_values("tool").reset_index(drop=True)
    assert list(out["tool"]) == ["bash", "grep"]
    assert list(out["n_turns"]) == [1, 3]
    assert list(out["n_convs"]) == [1, 2]
    # partition-invariant
    out2 = (tool_usage(mk().repartition(5)).to_pandas()
            .sort_values("tool").reset_index(drop=True))
    pd.testing.assert_frame_equal(out, out2)


def test_actor_ngrams_trigrams():
    from graph_data_science_ray.stages.trajectory import actor_ngrams

    out = (actor_ngrams(_turns(), n=3).to_pandas()
           .sort_values("gram").reset_index(drop=True))
    # conv a: u1>u2>u1; conv b/c too short to emit
    assert out["gram"].tolist() == ["u1>u2>u1"]
    assert out["cnt"].tolist() == [1]


def test_actor_ngrams_pairs_match_transitions():
    from graph_data_science_ray.stages.trajectory import (
        actor_ngrams,
        role_transitions,
    )

    bi = (actor_ngrams(_turns(), n=2).to_pandas()
          .sort_values("gram").reset_index(drop=True))
    tr = role_transitions(_turns()).to_pandas()
    tr["gram"] = tr["prev_role"] + ">" + tr["role"]
    tr = tr.sort_values("gram").reset_index(drop=True)
    assert bi["gram"].tolist() == tr["gram"].tolist()
    assert bi["cnt"].tolist() == tr["n"].tolist()


def test_conversation_dedup_flags():
    from graph_data_science_ray.stages.trajectory import (
        conversation_dedup_flags,
    )
    import pyarrow as pa

    rows = [
        ("a", 0, "u1", "x"), ("a", 1, "u2", "y"),   # "x y"
        ("c", 0, "u3", "x"), ("c", 1, "u4", "y"),   # dup of a
        ("b", 0, "u5", "x y"),                       # "x y" too (same concat)
        ("d", 0, "u6", "z"),                         # unique
    ]
    turns = rd.from_arrow(pa.table({
        "conv_id": pa.array([r[0] for r in rows], pa.string()),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "role": pa.array([r[2] for r in rows], pa.string()),
        "text": pa.array([r[3] for r in rows], pa.string()),
    }))
    out = (conversation_dedup_flags(turns).to_pandas()
           .sort_values("conv").reset_index(drop=True))
    got = dict(zip(out["conv"], out["keep"]))
    # "x y" concat keeper is min conv id 'a'; b and c are dups
    assert got == {"a": 1, "b": 0, "c": 0, "d": 1}


def test_monologue_runs():
    from graph_data_science_ray.stages.trajectory import monologue_runs

    out = (monologue_runs(_turns()).to_pandas()
           .sort_values("conv").reset_index(drop=True))
    # conv a: u1,u2,u1 -> 3 runs, max 1, gt1 sum 0
    # conv b: u3,u3 -> 1 run of 2; conv c: single turn
    assert out["n_runs"].tolist() == [3, 1, 1]
    assert out["max_run"].tolist() == [1, 2, 1]
    assert out["sum_run_gt1"].tolist() == [0, 2, 0]


def test_tool_latency_promotes_tool_actor():
    from graph_data_science_ray.stages.trajectory import tool_latency
    import pyarrow as pa

    ts = [np.datetime64("2024-01-01 00:00:00", "us"),
          np.datetime64("2024-01-01 00:00:05", "us"),
          np.datetime64("2024-01-01 00:00:07", "us")]
    turns = rd.from_arrow(pa.table({
        "conv_id": pa.array(["a"] * 3, pa.string()),
        "turn_idx": pa.array([0, 1, 2], pa.int32()),
        "role": pa.array(["u1", "u2", "u1"], pa.string()),
        "tool": pa.array([None, "grep", None], pa.string()),
        "text": pa.array(["q", "r", "s"], pa.string()),
        "ts": pa.array(ts, pa.timestamp("us")),
    }))
    out = tool_latency(turns).to_pandas()
    assert out["tool"].tolist() == ["tool:grep"]
    assert out["n"].tolist() == [1]
    assert out["sum_us"].tolist() == [5_000_000]
    assert out["max_us"].tolist() == [5_000_000]


def test_turn_cooccurrence_matches_brute():
    from graph_data_science_ray.stages.trajectory import turn_cooccurrence

    out = (turn_cooccurrence(_turns(), max_gap=2).to_pandas()
           .sort_values(["prev_role", "role", "gap"]).reset_index(drop=True))
    # brute force over the fixture
    convs = {"a": ["u1", "u2", "u1"], "b": ["u3", "u3"], "c": ["u4"]}
    want = {}
    for seq in convs.values():
        for gap in (1, 2):
            for i in range(len(seq) - gap):
                k = (seq[i], seq[i + gap], gap)
                want[k] = want.get(k, 0) + 1
    got = {(r.prev_role, r.role, int(r.gap)): int(r.n) for r in out.itertuples()}
    assert got == want
    # gap=1 marginal equals role_transitions
    from graph_data_science_ray.stages.trajectory import role_transitions

    rt = role_transitions(_turns()).to_pandas()
    rt_map = {(r.prev_role, r.role): int(r.n) for r in rt.itertuples()}
    g1 = {(a, b): n for (a, b, g), n in got.items() if g == 1}
    assert g1 == rt_map


def test_markov_stationary_exact_and_parallelism_invariant():
    from graph_data_science_ray.stages.trajectory import markov_stationary

    out = markov_stationary(_turns(), rounds=3, scale=1000)
    # transitions: u1->u2 (1), u2->u1 (1), u3->u3 (1); u4 dangling-only
    # appears as no margin (single-turn conv) -> absent from state space
    x = {"u1": 1000, "u2": 1000, "u3": 1000}
    for _ in range(3):
        nxt = {a: 0 for a in x}
        nxt["u2"] += x["u1"] * 1 // 1
        nxt["u1"] += x["u2"] * 1 // 1
        nxt["u3"] += x["u3"] * 1 // 1
        x = nxt
    got = dict(zip(out["role"], out["mass"]))
    assert got == x
    # invariant under repartition
    out2 = markov_stationary(_turns().repartition(4), rounds=3, scale=1000)
    assert dict(zip(out2["role"], out2["mass"])) == x


def test_tool_chains_counts_and_order():
    from graph_data_science_ray.stages.trajectory import tool_chains

    rows = [
        ("a", 0, "t1"), ("a", 1, None), ("a", 2, "t2"),
        ("b", 0, "t1"), ("b", 1, "t2"),
        ("c", 0, None),          # no tools: skipped
        ("d", 0, "t9"),
    ]
    turns = rd.from_arrow(pa.table({
        "conv_id": pa.array([r[0] for r in rows], pa.string()),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "tool": pa.array([r[2] for r in rows], pa.string()),
    }))
    out = tool_chains(turns, top_k=10)
    got = dict(zip(out["chain"], out["n"]))
    assert got == {"t1>t2": 2, "t9": 1}
    # deterministic ordering: count desc then chain asc
    assert out["chain"].tolist() == ["t1>t2", "t9"]


def test_dedup_cap_flags_brute():
    import hashlib

    from graph_data_science_ray.stages.dedup import dedup_cap_flags

    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": ["a", "a", "a", "b", "b", "c"],
    }))
    out = (dedup_cap_flags(docs, max_copies=2).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    r = {i: hashlib.md5(f"{i}:cap".encode()).hexdigest() for i in range(6)}
    for ids in ([0, 1, 2], [3, 4], [5]):
        order = sorted(ids, key=lambda i: (r[i], i))
        for rk, i in enumerate(order, 1):
            row = out[out.doc_id == i].iloc[0]
            assert row["rank"] == rk
            assert row["keep"] == (1 if rk <= 2 else 0)
    # every group keeps at most 2
    assert int(out["keep"].sum()) == 2 + 2 + 1

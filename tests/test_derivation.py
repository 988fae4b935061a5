"""Edge-derivation rule coverage (FIXTURES.md §2, §3.5) + row invariant."""

import numpy as np
import pyarrow as pa
import ray.data as rd

import graph_data_science_ray as gdsr

_EPOCH = np.datetime64("2024-01-01T00:00:00", "us")


def _multi_tool_transcript() -> pa.Table:
    """3 conversations mixing roles/tools, nulls, consecutive same-actor
    turns, out-of-order row storage but in-order turn_idx."""
    rows = [
        # conv A: user -> assistant -> tool(search) -> assistant -> assistant
        ("A", 0, "user", "hi", None),
        ("A", 1, "assistant", "hello", None),
        ("A", 2, "tool", "results", "search"),
        ("A", 3, "assistant", "done", None),
        ("A", 4, "assistant", "more", None),  # self-edge assistant->assistant dropped
        # conv B: user -> tool(python) -> tool(python) -> user
        ("B", 0, "user", "calc", None),
        ("B", 1, "tool", "3", "python"),
        ("B", 2, "tool", "4", "python"),  # self-edge dropped
        ("B", 3, "user", "ty", None),
        # conv C: single turn (node only)
        ("C", 0, "system", "boot", None),
        # conv D: empty-string tool behaves as role turn
        ("D", 0, "assistant", "a", ""),
        ("D", 1, "user", "b", None),
    ]
    # store out of order to prove stable ordering by (conv_id, turn_idx)
    rows = rows[::-1]
    return pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows], pa.string()),
            "text": pa.array([r[3] for r in rows], pa.string()),
            "tool": pa.array([r[4] for r in rows], pa.string()),
            "ts": pa.array([_EPOCH + np.timedelta64(i, "s") for i in range(len(rows))]),
        }
    )


def test_multi_tool_derivation():
    ds = rd.from_arrow(_multi_tool_transcript())
    turns = gdsr.derive_turns(ds)
    edges = gdsr.derive_edges(turns, num_partitions=2).to_pandas()
    got = {
        (r.src, r.dst): r.weight for r in edges.itertuples()
    }
    expected = {
        ("role:user", "role:assistant"): 2.0,  # A0->A1 and D... no: A0->A1 only
        ("role:assistant", "tool:search"): 1.0,
        ("tool:search", "role:assistant"): 1.0,
        ("role:user", "tool:python"): 1.0,
        ("tool:python", "role:user"): 1.0,
        ("role:assistant", "role:user"): 1.0,  # D0->D1 (empty tool = role turn)
    }
    # A: user->assistant, assistant->search, search->assistant, (assistant->assistant dropped)
    # B: user->python, (python->python dropped), python->user
    # D: assistant->user
    expected[("role:user", "role:assistant")] = 1.0
    assert got == expected


def test_derive_strategies_agree():
    """grouped (default, collector-free) == sorted (boundary side-channel)."""
    ds = rd.from_arrow(_multi_tool_transcript())
    turns = gdsr.derive_turns(ds)
    a = (
        gdsr.derive_edges(turns, strategy="grouped").to_pandas()
        .sort_values(["src", "dst"]).reset_index(drop=True)
    )
    b = (
        gdsr.derive_edges(turns, strategy="sorted").to_pandas()
        .sort_values(["src", "dst"]).reset_index(drop=True)
    )
    assert a.equals(b)


def test_edges_from_expressions(tmp_path):
    """Cypher-style expression projection: endpoints/weight/filter as
    per-row expressions, SUM combine, composes into GraphStore."""
    import pandas as pd

    rows = rd.from_pandas(pd.DataFrame({
        "a": [1, 1, 2, 3, 3, 3],
        "b": [2, 2, 3, 1, 1, 9],
        "q": [10.0, 5.0, 1.0, 2.0, 4.0, 100.0],
    }))
    edges = gdsr.edges_from_expressions(
        rows, src="a - 1", dst="b - 1", weight="q * 2",
        where="q < 50", aggregation="sum", num_partitions=2,
    ).to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    assert edges.values.tolist() == [
        [0.0, 1.0, 30.0],   # (1,2) twice: (10+5)*2
        [1.0, 2.0, 2.0],
        [2.0, 0.0, 12.0],   # (3,1) twice: (2+4)*2
    ]
    # count mode ignores the weight expression
    cnt = gdsr.edges_from_expressions(
        rows, src="a", dst="b", aggregation="count", num_partitions=2,
    ).to_pandas()
    assert dict(zip(zip(cnt["src"], cnt["dst"]), cnt["weight"])) == {
        (1, 2): 2.0, (2, 3): 1.0, (3, 1): 2.0, (3, 9): 1.0,
    }
    # dense-int endpoints project directly
    g = gdsr.GraphStore.project(
        gdsr.edges_from_expressions(
            rows, src="a - 1", dst="b - 1", where="b < 9", num_partitions=2,
        ),
        str(tmp_path / "gexpr"), node_count=3, num_partitions=2,
    )
    assert g.node_count == 3 and g.edge_count == 3


def test_distributed_idmap_matches_broadcast():
    """idmap_table/encode_edges_distributed == IdMap.from_turns/encode_edges:
    same sorted-key numbering, identical encoded edge table — the key
    vocabulary never on the driver (only per-block counts)."""
    import numpy as np

    from graph_data_science_ray.pipelines.edges import (
        encode_edges_distributed,
        idmap_table,
    )
    from graph_data_science_ray.sources.transcripts import synthesize_transcripts

    ts = synthesize_transcripts(120, num_actors=40, seed=7)
    turns = gdsr.derive_turns(ts)
    im = gdsr.IdMap.from_turns(turns)
    tbl = idmap_table(turns).to_pandas().sort_values("id").reset_index(drop=True)
    assert (tbl["actor"].to_numpy(dtype="U") == im.keys).all()
    assert (tbl["id"].to_numpy() == np.arange(len(im))).all()
    edges = gdsr.derive_edges(turns, 4)
    a = (
        gdsr.encode_edges(edges, im).to_pandas()
        .sort_values(["src", "dst"]).reset_index(drop=True)
    )
    b = (
        encode_edges_distributed(edges, idmap_table(turns)).to_pandas()
        .sort_values(["src", "dst"]).reset_index(drop=True)
    )
    assert a.equals(b)


def test_node_set_includes_isolated_actors():
    ds = rd.from_arrow(_multi_tool_transcript())
    turns = gdsr.derive_turns(ds)
    idmap = gdsr.IdMap.from_turns(turns)
    assert "role:system" in set(idmap.keys)  # single-turn conv C
    assert sorted(idmap.keys) == list(idmap.keys)  # lexicographic dense order


def test_text_invariant_under_stable_ordering():
    """Per-row invariant: text byte-equal to input under (conv_id, turn_idx)."""
    from graph_data_science_ray.pipelines.edges import sorted_transcript_view

    t = _multi_tool_transcript()
    view = sorted_transcript_view(rd.from_arrow(t)).to_pandas()
    inp = t.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert (view["text"].to_numpy() == inp["text"].to_numpy()).all()
    assert (view["conv_id"].to_numpy() == inp["conv_id"].to_numpy()).all()


def test_synthesis_deterministic_across_block_layout():
    a = (
        gdsr.synthesize_transcripts(80, num_actors=30, seed=9, override_num_blocks=1)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    b = (
        gdsr.synthesize_transcripts(80, num_actors=30, seed=9, override_num_blocks=11)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert a.equals(b)
    assert set(a.columns) == {"conv_id", "turn_idx", "role", "text", "tool", "ts"}


def test_symmetrize_sums_both_directions(graph_from_edges):
    _, _, idmap, enc, sym = graph_from_edges([(0, 1), (1, 0), (1, 2)])
    s = sym.to_pandas().set_index(["src", "dst"])["weight"]
    # (0,1) and (1,0) each weight 1 -> symmetric weight 2 both ways
    assert s[(0, 1)] == 2.0 and s[(1, 0)] == 2.0
    assert s[(1, 2)] == 1.0 and s[(2, 1)] == 1.0


def test_grouped_conv_key_modes_identical():
    """hash128 conv keys (the shuffle-payload default) must produce the
    byte-identical edge table to exact string grouping."""
    import pandas as pd

    from graph_data_science_ray.pipelines.edges import derive_edges_encoded_grouped

    ts = gdsr.synthesize_transcripts(120, num_actors=25, seed=4)
    turns = gdsr.derive_turns(ts).materialize()
    idmap = gdsr.IdMap.from_turns(turns)
    a = (
        derive_edges_encoded_grouped(turns, idmap, num_partitions=5, conv_key="hash128")
        .to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    )
    b = (
        derive_edges_encoded_grouped(turns, idmap, num_partitions=5, conv_key="string")
        .to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0


def test_contiguous_derivation_matches_grouped():
    """Zero-turn-shuffle contiguous pairing must produce the
    byte-identical edge table to the conversation-hash grouped path on a
    conversation-contiguous input (synthesized transcripts are written
    one conversation at a time)."""
    import pandas as pd

    from graph_data_science_ray.pipelines.edges import (
        derive_edges_encoded_contiguous,
        derive_edges_encoded_grouped,
    )

    ts = gdsr.synthesize_transcripts(200, num_actors=30, seed=9)
    turns = gdsr.derive_turns(ts).materialize()
    idmap = gdsr.IdMap.from_turns(turns)
    a = (
        derive_edges_encoded_contiguous(turns, idmap, num_partitions=5)
        .to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    )
    b = (
        derive_edges_encoded_grouped(turns, idmap, num_partitions=5)
        .to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0


def test_contiguity_probe_and_auto_fallback():
    """The probe is exact: True on conversation-contiguous input, False
    after a shuffle; the contiguous path refuses non-contiguous input
    (raises, never silently wrong); auto picks a correct path for both."""
    import pandas as pd
    import pytest

    from graph_data_science_ray.pipelines.edges import (
        derive_edges_encoded_auto,
        derive_edges_encoded_contiguous,
        derive_edges_encoded_grouped,
        probe_conv_contiguity,
    )

    ts = gdsr.synthesize_transcripts(150, num_actors=20, seed=3)
    turns = gdsr.derive_turns(ts).materialize()
    idmap = gdsr.IdMap.from_turns(turns)
    assert probe_conv_contiguity(turns) is True
    shuffled = turns.random_shuffle(seed=1).materialize()
    assert probe_conv_contiguity(shuffled) is False
    with pytest.raises(Exception):
        derive_edges_encoded_contiguous(shuffled, idmap).to_pandas()
    ref = (
        derive_edges_encoded_grouped(turns, idmap)
        .to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    )
    # prefer_contiguous=True exercises the probe gate on both layouts
    # (contiguous input -> contiguous path; shuffled -> grouped fallback);
    # the default (None) resolves to grouped on this single-node cluster
    for src in (turns, shuffled):
        for pref in (True, None):
            got = (
                derive_edges_encoded_auto(src, idmap, prefer_contiguous=pref)
                .to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
            )
            pd.testing.assert_frame_equal(got, ref)


def test_feature_backfill_small_fixture():
    """Purchases see the latest CLOSED click window at-or-before them;
    purchases before any closed window drop under inner=True."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from graph_data_science_ray.stages.sessions import feature_backfill

    us = 1_000_000
    def ev(eid, t_sec, user, typ, val):
        return {"event_id": eid, "ts": t_sec * us, "user_id": user,
                "event_type": typ, "value": float(val)}
    rows = [
        # clicks at t=100,200 fall in windows starting 0,-900,-1800,-2700
        # (1h window, 15min slide), which close at 3600,2700,1800,900
        ev(1, 100, 7, "click", 2.0),
        ev(2, 200, 7, "click", 3.0),
        ev(3, 500, 7, "purchase", 1.0),   # before ANY window closes -> drop
        ev(4, 1000, 7, "purchase", 1.0),  # sees window closing at 900
        ev(5, 9999, 7, "purchase", 1.0),  # sees the LAST closed window (3600)
    ]
    t = pa.table({k: [r[k] for r in rows] for k in rows[0]})
    t = t.set_column(1, "ts", pa.array(t["ts"].to_numpy(), pa.timestamp("us")))
    ds = rd.from_arrow(t)
    out = feature_backfill(
        ds.filter(expr="event_type == 'purchase'"),
        ds.filter(expr="event_type == 'click'"),
        window_seconds=3600, slide_seconds=900, inner=True,
    ).to_pandas().sort_values("event_id").reset_index(drop=True)
    assert list(out["event_id"]) == [4, 5]
    # purchase 4 at t=1000: only the window starting -2700 has closed
    # (end 900 <= 1000); it contains both clicks
    r4 = out[out["event_id"] == 4].iloc[0]
    assert r4["f_window_start"] == -2700 * us
    assert r4["f_n"] == 2 and r4["f_value_sum"] == 5.0
    # purchase 5 at t=9999: the LATEST closed window is the one starting
    # at 0 (end 3600) — still both clicks
    r5 = out[out["event_id"] == 5].iloc[0]
    assert r5["f_window_start"] == 0
    assert r5["f_n"] == 2 and r5["f_value_sum"] == 5.0


def test_typed_derivation_and_selection(ray_session, tmp_path):
    """Multi-relationship-type store: typed edges partition the untyped
    edge multiset, and a type selection projects only its union."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    import graph_data_science_ray as gdsr
    from graph_data_science_ray.pipelines.edges import derive_edges_typed
    from graph_data_science_ray.state.typed import TypedGraphStore

    # two conversations = two relationship types, shared actors
    rows = []
    for conv, seq in (("typeA", [0, 1, 2, 1]), ("typeB", [1, 2, 0])):
        for i, a in enumerate(seq):
            rows.append({"conv_id": conv, "turn_idx": i, "role": f"n{a:04d}",
                         "text": "", "tool": None,
                         "ts": pd.Timestamp("2024-01-01")})
    t = pa.Table.from_pandas(pd.DataFrame(rows))
    turns = gdsr.derive_turns(rd.from_arrow(t)).materialize()
    idmap = gdsr.IdMap.from_turns(turns)
    typed = derive_edges_typed(turns, idmap, num_partitions=2)
    store = TypedGraphStore(typed, str(tmp_path / "ts"), idmap=idmap,
                            num_partitions=2, directed=True)
    assert store.types() == ["typeA", "typeB"]
    counts = store.edge_counts().set_index("rel_type")
    assert counts.loc["typeA", "n_edges"] == 3   # 0->1,1->2,2->1
    assert counts.loc["typeB", "n_edges"] == 2   # 1->2,2->0

    # typed union == untyped derivation
    untyped = gdsr.encode_edges(gdsr.derive_edges(turns, 2), idmap).to_pandas()
    union = store.graph()  # all types
    assert union.edge_count == len(untyped)

    # single-type selection only sees its edges
    ga = store.graph(["typeA"])
    assert ga.edge_count == 3
    # PageRank runs on the selection without error
    pr = gdsr.pagerank(ga, max_iterations=5)
    assert len(pr) == len(idmap)

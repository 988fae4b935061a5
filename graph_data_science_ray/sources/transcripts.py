"""Transcript sources: schema, readers, deterministic synthesis, adapters.

The engine's authoritative input (BASELINE.json ``input_hint``) is a Parquet
table of multi-turn conversation / agent transcripts:

    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string (nullable), ts:timestamp[us]

This module provides:
- ``read_transcripts``  — pruned parquet read + schema validation,
- ``synthesize_transcripts`` — seeded, fully deterministic synthetic
  transcripts at any scale (vectorized; identical output for any block
  layout / parallelism — the sandbox substitute for external data),
- ``transcripts_from_edge_list`` — encode a golden edge list as transcripts
  (FIXTURES.md §2), so conformance tests exercise the full
  transcript→edge→algorithm path (mirrors the reference's GDL literal
  graphs, test-utils/src/main/java/org/neo4j/gds/gdl/GdlFactory.java:79-171),
- ``events_as_transcripts`` — view the driver testdata ``events`` table as a
  transcript table (conversations = event_type streams, actors = users).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from graph_data_science_ray._util import mix2, uniform01

TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

_EPOCH_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in microseconds


def read_transcripts(paths, columns=None) -> rd.Dataset:
    """Read a transcript parquet table, pruning columns at the read.

    Column pruning matters at scale: deriving edges only needs
    (conv_id, turn_idx, role, tool) — the text payload (the bulk of the
    bytes) never leaves storage unless asked for.
    """
    ds = rd.read_parquet(paths, columns=columns)
    schema = ds.schema()
    want = columns or TRANSCRIPT_SCHEMA.names
    missing = [c for c in want if c not in schema.names]
    if missing:
        raise ValueError(f"transcript table missing columns {missing}; has {schema.names}")
    return ds


# ---------------------------------------------------------------------------
# Deterministic synthesis
# ---------------------------------------------------------------------------


class _SynthBatch:
    """Vectorized synthetic transcript generator over conv-id ranges.

    A pure function of (seed, conv_id, turn_idx) via splitmix64 mixing —
    block layout and parallelism cannot change the output. Actor draws use
    a power-law-ish inverse CDF (``idx = floor(A * u**skew)``) so hub
    actors exist, exercising the skew/mirror paths (mirrors the
    reference's generator distributions,
    core/src/main/java/org/neo4j/gds/beta/generator/RelationshipDistribution.java:34-74).
    ~20% of the actor space are tool keys, the rest role keys
    (FIXTURES.md §4).
    """

    def __init__(self, seed: int, num_actors: int, min_turns: int, max_turns: int, skew: float):
        self.seed = int(seed)
        self.num_actors = int(num_actors)
        self.min_turns = int(min_turns)
        self.max_turns = int(max_turns)
        self.skew = float(skew)

    def __call__(self, batch: pa.Table) -> pa.Table:
        convs = batch["id"].to_numpy()
        span = self.max_turns - self.min_turns + 1
        n_turns = (
            self.min_turns + (mix2(self.seed, convs, 1) % np.uint64(span)).astype(np.int64)
        )
        conv_rep = np.repeat(convs, n_turns)
        # turn_idx = position within conversation
        total = int(n_turns.sum())
        turn_idx = np.arange(total, dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(n_turns)[:-1])), n_turns
        )
        u = uniform01(mix2(self.seed + 1, conv_rep, turn_idx))
        actor = np.minimum(
            (self.num_actors * np.power(u, self.skew)).astype(np.int64),
            self.num_actors - 1,
        )
        is_tool = actor % 5 == 0
        role = np.where(is_tool, "tool", np.char.add("a", np.char.zfill(actor.astype("U8"), 7)))
        tool = np.where(is_tool, np.char.add("t", np.char.zfill(actor.astype("U8"), 7)), "")
        text = np.char.add(
            np.char.add("x-", conv_rep.astype("U12")), np.char.add("-", turn_idx.astype("U6"))
        )
        ts = _EPOCH_US + conv_rep * 100_000_000 + turn_idx * 1_000_000
        return pa.table(
            {
                "conv_id": pa.array(np.char.add("c", np.char.zfill(conv_rep.astype("U12"), 10))),
                "turn_idx": pa.array(turn_idx.astype(np.int32)),
                "role": pa.array(role.astype(object), type=pa.string()),
                "text": pa.array(text.astype(object), type=pa.string()),
                "tool": pa.array(
                    np.where(is_tool, tool, None).astype(object), type=pa.string()
                ),
                "ts": pa.array(ts.astype("datetime64[us]")),
            }
        )


def synthesize_transcripts(
    num_convs: int,
    num_actors: int = 1000,
    seed: int = 42,
    min_turns: int = 2,
    max_turns: int = 12,
    skew: float = 2.0,
    override_num_blocks: int | None = None,
) -> rd.Dataset:
    """Deterministic synthetic transcript Dataset (see ``_SynthBatch``)."""
    ds = rd.range(num_convs, override_num_blocks=override_num_blocks)
    return ds.map_batches(
        _SynthBatch(seed, num_actors, min_turns, max_turns, skew),
        batch_format="pyarrow",
        batch_size=64 * 1024,
    )


# ---------------------------------------------------------------------------
# Golden-fixture encoding (FIXTURES.md §2)
# ---------------------------------------------------------------------------


def transcripts_from_edge_list(
    edges: list[tuple[int, int]], isolated_nodes: list[int] = ()
) -> pa.Table:
    """Encode a directed edge list as a transcript table.

    Edge k ``(u, v)`` becomes a two-turn conversation ``c{k:08d}`` whose
    turns have roles ``n{u:04d}`` / ``n{v:04d}`` — under the derivation
    rule this yields exactly the target edge list, with actor-key
    lexicographic order equal to numeric node order. Isolated nodes are
    single-turn conversations (they contribute a node, no edge).
    """
    conv, idx, role, text, ts = [], [], [], [], []
    for k, (u, v) in enumerate(edges):
        for pos, node in ((0, u), (1, v)):
            conv.append(f"c{k:08d}")
            idx.append(pos)
            role.append(f"n{node:04d}")
            text.append(f"t-c{k}-{pos}")
            ts.append(_EPOCH_US + k * 2_000_000 + pos * 1_000_000)
    for j, node in enumerate(isolated_nodes):
        conv.append(f"ciso{j:04d}")
        idx.append(0)
        role.append(f"n{node:04d}")
        text.append(f"t-iso{j}")
        ts.append(_EPOCH_US + 10_000_000_000 + j * 1_000_000)
    return pa.table(
        {
            "conv_id": pa.array(conv, pa.string()),
            "turn_idx": pa.array(idx, pa.int32()),
            "role": pa.array(role, pa.string()),
            "text": pa.array(text, pa.string()),
            "tool": pa.array([None] * len(conv), pa.string()),
            "ts": pa.array(np.array(ts, dtype="datetime64[us]")),
        }
    )


# ---------------------------------------------------------------------------
# Events adapter (driver testdata -> transcript shape)
# ---------------------------------------------------------------------------


def events_as_transcripts(sf_dir: str) -> rd.Dataset:
    """View ``{sf_dir}/events.parquet`` as a transcript table.

    Mapping (documented, also mirrored in SQL by the correctness oracles):
    each ``event_type`` stream is one conversation ordered by
    ``(ts, event_id)``; the acting user is the turn's role. This gives a
    real user-interaction graph over the driver's deterministic testdata.

    The required dense 0-based ``turn_idx`` is a per-conversation rank —
    event_type cardinality is tiny (5), so a per-group window via
    ``groupby().map_groups`` is cheap here; transcripts proper come with
    ``turn_idx`` already materialized and skip this step.
    """
    import pandas as pd

    ds = rd.read_parquet(
        f"{sf_dir.rstrip('/')}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "props"],
    )

    def to_turns(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        return pd.DataFrame(
            {
                "conv_id": g["event_type"].astype(str),
                "turn_idx": np.arange(len(g), dtype=np.int32),
                "role": g["user_id"].astype(np.int64).astype(str),
                "text": g["props"].astype(str),
                "tool": pd.Series([None] * len(g), dtype=object),
                "ts": g["ts"].values,
            }
        )

    return ds.groupby("event_type").map_groups(to_turns, batch_format="pandas")


def events_as_transcripts_tools(sf_dir: str) -> rd.Dataset:
    """:func:`events_as_transcripts` with a deterministic tool fill.

    The driver's events table has no tool column, so this adapter binds
    one by a fixed rule (mirrored verbatim in the SQL oracles):
    ``tool = 't' || (user_id % 7)`` on every turn whose ``event_id`` is
    divisible by 3, else NULL — about a third of turns become tool
    invocations over 7 distinct tools. Downstream, edge derivation's
    ``_actor_key`` promotes those turns to ``tool:`` actor keys (the
    north-star role/tool interaction graph), exactly as it does for real
    transcripts whose tool column is populated.
    """
    import pandas as pd

    ds = rd.read_parquet(
        f"{sf_dir.rstrip('/')}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "props"],
    )

    def to_turns(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        uid = g["user_id"].astype(np.int64).to_numpy()
        eid = g["event_id"].astype(np.int64).to_numpy()
        tool = np.where(
            eid % 3 == 0,
            np.char.add("t", (uid % 7).astype("U1")).astype(object),
            None,
        )
        return pd.DataFrame(
            {
                "conv_id": g["event_type"].astype(str),
                "turn_idx": np.arange(len(g), dtype=np.int32),
                "role": uid.astype(str),
                "text": g["props"].astype(str),
                "tool": pd.Series(tool, dtype=object),
                "ts": g["ts"].values,
            }
        )

    return ds.groupby("event_type").map_groups(to_turns, batch_format="pandas")

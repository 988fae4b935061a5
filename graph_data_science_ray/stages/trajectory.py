"""Conversation / agent-trajectory curation stages.

The engine's input payload is multi-turn transcripts
(``conv_id, turn_idx, role, text, tool, ts``); before a trajectory set
is worth training on, a pipeline filters whole conversations on
structural quality and drops repeated turn payloads. Two operators:

- :func:`conversation_stats` — per-conversation structural metrics
  (turn count, distinct actors, actor alternation, payload size), the
  trajectory analogue of the C4/Gopher document-quality signals. Scale
  shape: ``groupby(conv).map_groups`` — conversations are the natural
  partition key (bounded length by construction), so each group is one
  in-memory frame and the only shuffle is the conversation hash
  exchange the edge-derivation pipeline already pays.
- :func:`turn_dedup_flags` — exact duplicate-turn detection across the
  WHOLE transcript set: the keeper of each distinct turn text is the
  lexicographically smallest ``(conv, turn_idx)``; every later
  occurrence is flagged. Same hash-partitioned keeper shape as
  ``stages.dedup.dedup_exact`` (O(turns) shuffle, no driver state),
  with the composite order key packed into one string so a plain
  ``min`` aggregate decides keepers deterministically.

Both are integer/string-exact (no floats), so their driver oracles are
verbatim ANSI SQL.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

__all__ = ["conversation_stats", "turn_dedup_flags"]


def conversation_stats(
    turns: rd.Dataset,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    actor_col: str = "role",
    text_col: str = "text",
) -> rd.Dataset:
    """Per-conversation structural quality metrics.

    One row per conversation: ``(conv, n_turns, n_actors, n_switches,
    sum_chars)`` where ``n_switches`` counts consecutive-turn actor
    changes under stable turn ordering (the same ordering contract the
    edge derivation uses) and ``sum_chars`` totals payload length.
    A trajectory filter then selects on these (e.g. require actual
    back-and-forth: ``n_switches >= 1``).
    """

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(idx_col, kind="mergesort")
        a = g[actor_col].astype(str).to_numpy(dtype=object)
        switches = int((a[1:] != a[:-1]).sum()) if len(a) > 1 else 0
        return pd.DataFrame(
            {"conv": [str(g[conv_col].iloc[0])],
             "n_turns": np.array([len(g)], dtype=np.int64),
             "n_actors": np.array([len(set(a))], dtype=np.int64),
             "n_switches": np.array([switches], dtype=np.int64),
             "sum_chars": np.array(
                 [sum(len(t) for t in g[text_col].astype(str))],
                 dtype=np.int64,
             )}
        )

    return turns.groupby(conv_col).map_groups(
        per_group, batch_format="pandas"
    )


def turn_dedup_flags(
    turns: rd.Dataset,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    text_col: str = "text",
) -> rd.Dataset:
    """Exact duplicate-turn flags across all conversations.

    Returns one row per turn ``(conv, turn_idx, dup)`` with ``dup = 1``
    iff an earlier turn (smaller ``(conv, turn_idx)`` lexicographically)
    carries the identical text. The keeper key packs the composite
    order into ``conv + '#' + zero-padded idx`` so a single hash-
    partitioned ``min`` aggregate decides keepers; flags come from a
    text-keyed hash join back to the turn rows — O(turns) shuffle, no
    driver state, deterministic at any parallelism.
    """
    import pyarrow as pa

    from graph_data_science_ray.pipelines.agg import hash_aggregate, hash_join

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {"text": pd.Series([], dtype=object),
                 "k": pd.Series([], dtype=object)}
            )
        idx = df[idx_col].to_numpy(dtype=np.int64)
        k = (
            df[conv_col].astype(str)
            + "#"
            + pd.Series([f"{i:09d}" for i in idx], index=df.index)
        )
        return pd.DataFrame(
            {"text": df[text_col].astype(str).to_numpy(dtype=object),
             "k": k.to_numpy(dtype=object)}
        )

    rows = turns.map_batches(keyed, batch_format="pandas", batch_size=8192)
    keepers = hash_aggregate(
        rows, ["text"], "k", op="min", out_col="keeper"
    )
    joined = hash_join(
        rows, keepers, on=["text"],
        left_schema=pa.schema([("text", pa.string()), ("k", pa.string())]),
        right_schema=pa.schema(
            [("text", pa.string()), ("keeper", pa.string())]
        ),
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {"conv": pd.Series([], dtype=object),
                 "turn_idx": pd.Series([], dtype=np.int64),
                 "dup": pd.Series([], dtype=np.int64)}
            )
        k = df["k"].astype(str)
        conv = k.str.rsplit("#", n=1).str[0]
        idx = k.str.rsplit("#", n=1).str[1].astype(np.int64)
        return pd.DataFrame(
            {"conv": conv.to_numpy(dtype=object),
             "turn_idx": idx.to_numpy(dtype=np.int64),
             "dup": (
                 df["k"].astype(str) != df["keeper"].astype(str)
             ).to_numpy().astype(np.int64)}
        )

    return joined.map_batches(finish, batch_format="pandas")

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

Second batch (same scale shape — conversations are the natural
partition key, the only shuffle is the conv hash exchange):

- :func:`role_transitions` — the global actor-transition (Markov)
  count matrix over consecutive turns, self-transitions INCLUDED (the
  edge derivation drops them; trajectory analysis wants them — a
  same-actor run is a "monologue" signal).
- :func:`turn_loop_flags` — agent-loop detection: a turn is flagged
  when the SAME actor's previous turn in the conversation carries
  identical text (the stuck-tool-call / repeated-action signal).
- :func:`turn_context` — SFT example-construction accounting: per
  turn, how many of the preceding ``k`` turns exist and their total
  payload chars (the context-window cost of training on that turn).
- :func:`pack_conversations` — conversation-integrity sequence
  packing: whole conversations assigned to training sequences by the
  exclusive token prefix sum (``seq_id = tokens_before // budget``) in
  deterministic conv order — the fixed-stride contract of
  ``stages.window.pack_sequences`` lifted to conversation granularity
  so no conversation is ever split mid-dialogue.
- :func:`conversation_texts` / :func:`conversation_jaccard` —
  conversation-level near-duplicate pairs: turns concatenate (stable
  turn order) into one document per conversation, then the EXACT
  word-3-gram Jaccard set-similarity join runs over those documents.

All integer/string-exact (no floats except the final rounded jaccard,
shared with :func:`stages.dedup.ngram_jaccard_dedup`), so the driver
oracles are verbatim ANSI SQL.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import ray.data as rd

__all__ = [
    "conversation_stats",
    "turn_dedup_flags",
    "role_transitions",
    "turn_loop_flags",
    "turn_context",
    "pack_conversations",
    "conversation_texts",
    "conversation_jaccard",
    "turn_latency",
    "latency_stats",
    "conversation_novelty",
    "trajectory_pack",
    "latency_moments",
    "actor_ngrams",
]


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


def role_transitions(
    turns: rd.Dataset,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    actor_col: str = "role",
    num_parts: int = 64,
) -> rd.Dataset:
    """Global actor-transition counts over consecutive turns.

    One row per ordered actor pair: ``(prev_role, role, n)`` where
    ``n`` counts conversations' adjacent-turn transitions under stable
    turn ordering — the Markov transition matrix of the trajectory set.
    Self-transitions are INCLUDED (unlike the edge derivation, which
    drops them): a same-actor run is a monologue signal trajectory
    filters select on.

    Scale shape: per-conversation groups emit PARTIAL pair counts
    (value_counts inside the group — one row per distinct pair per
    conversation), then a hash-partitioned sum collapses them; the
    final table is |actors|² at most, the shuffle is conv-hash +
    tiny-partial exchange.
    """
    from graph_data_science_ray.pipelines.agg import hash_aggregate

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(idx_col, kind="mergesort")
        a = g[actor_col].astype(str).to_numpy(dtype=object)
        if len(a) < 2:
            return pd.DataFrame(
                {"prev_role": pd.Series([], dtype=object),
                 "role": pd.Series([], dtype=object),
                 "n": pd.Series([], dtype=np.int64)}
            )
        pairs = pd.DataFrame({"prev_role": a[:-1], "role": a[1:]})
        cnt = (
            pairs.groupby(["prev_role", "role"], sort=False)
            .size()
            .reset_index(name="n")
        )
        cnt["n"] = cnt["n"].astype(np.int64)
        return cnt

    partials = turns.groupby(conv_col).map_groups(
        per_group, batch_format="pandas"
    )
    return hash_aggregate(
        partials, ["prev_role", "role"], "n", op="sum", num_parts=num_parts
    )


def turn_loop_flags(
    turns: rd.Dataset,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    actor_col: str = "role",
    text_col: str = "text",
) -> rd.Dataset:
    """Agent-loop detection: per-turn repeated-action flags.

    Returns ``(conv, turn_idx, looped)`` with ``looped = 1`` iff the
    SAME actor's previous turn within the conversation (by stable turn
    order) carries byte-identical text — the stuck-agent / repeated
    tool-call signal trajectory curation drops or truncates on.
    Row-local per conversation group; no global state.
    """

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(idx_col, kind="mergesort")
        txt = g[text_col].astype(str)
        prev = txt.groupby(g[actor_col].astype(str).to_numpy()).shift(1)
        looped = (txt.to_numpy(dtype=object) == prev.to_numpy(dtype=object))
        return pd.DataFrame(
            {"conv": g[conv_col].astype(str).to_numpy(dtype=object),
             "turn_idx": g[idx_col].to_numpy().astype(np.int64),
             "looped": looped.astype(np.int64)}
        )

    return turns.groupby(conv_col).map_groups(per_group, batch_format="pandas")


def turn_context(
    turns: rd.Dataset,
    k: int = 3,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    text_col: str = "text",
) -> rd.Dataset:
    """SFT context-assembly accounting for a ``k``-turn history window.

    Returns ``(conv, turn_idx, ctx_turns, ctx_chars)``: how many of the
    preceding ``k`` turns exist in the conversation and their total
    payload chars — the context-window cost of constructing a training
    example ending at this turn. Sliding prefix-sum per conversation
    group (numpy cumsum difference), no cross-conversation state.
    """

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(idx_col, kind="mergesort")
        lens = g[text_col].astype(str).str.len().to_numpy(dtype=np.int64)
        n = len(lens)
        cum = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(lens)])
        pos = np.arange(n, dtype=np.int64)
        lo = np.maximum(0, pos - k)
        return pd.DataFrame(
            {"conv": g[conv_col].astype(str).to_numpy(dtype=object),
             "turn_idx": g[idx_col].to_numpy().astype(np.int64),
             "ctx_turns": pos - lo,
             "ctx_chars": cum[pos] - cum[lo]}
        )

    return turns.groupby(conv_col).map_groups(per_group, batch_format="pandas")


def pack_conversations(
    turns: rd.Dataset,
    budget: int,
    conv_col: str = "conv_id",
    text_col: str = "text",
) -> rd.Dataset:
    """Conversation-integrity sequence packing.

    Whole conversations (never split mid-dialogue) are assigned to
    training sequences in deterministic ``conv`` order: per-conversation
    whitespace-token totals feed the exclusive running sum, and
    ``seq_id = tokens_before // budget`` — the fixed-stride contract of
    :func:`stages.window.pack_sequences` lifted to conversation
    granularity. A conversation longer than the residual bin capacity
    overflows its bin (documented best-effort packing — the price of
    the boundary guarantee).

    Returns ``(conv, n_tokens, seq_id, offset)`` with ``offset`` = total
    tokens before the conversation. Scale shape: conv-hash groupby for
    the token totals (one row per conversation), then the O(#blocks)
    two-pass running-sum scan.
    """
    from graph_data_science_ray.stages.window import running_sum

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        toks = int(g[text_col].astype(str).str.count(r"\S+").sum())
        return pd.DataFrame(
            {"conv": [str(g[conv_col].iloc[0])],
             "n_tokens": np.array([toks], dtype=np.int64)}
        )

    counts = turns.groupby(conv_col).map_groups(
        per_group, batch_format="pandas"
    )
    out = running_sum(
        counts, ["conv"], "n_tokens", out_col="offset", inclusive=False
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        off = df["offset"].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {"conv": df["conv"].astype(str).to_numpy(dtype=object),
             "n_tokens": df["n_tokens"].to_numpy().astype(np.int64),
             "seq_id": off // np.int64(budget),
             "offset": off}
        )

    return out.map_batches(finish, batch_format="pandas")


def conversation_texts(
    turns: rd.Dataset,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    text_col: str = "text",
) -> rd.Dataset:
    """One document per conversation: turn texts joined with a single
    space in stable turn order — the document view conversation-level
    dedup / fingerprinting operators run on. Returns ``(conv, text)``.
    Conversations are bounded length by construction, so each group's
    concat is a bounded in-memory string."""

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(idx_col, kind="mergesort")
        return pd.DataFrame(
            {"conv": [str(g[conv_col].iloc[0])],
             "text": [" ".join(g[text_col].astype(str))]}
        )

    return turns.groupby(conv_col).map_groups(per_group, batch_format="pandas")


def _conv_int_id(conv: pd.Series) -> np.ndarray:
    """Deterministic md5-u60 int64 id for a conversation key (the
    join key :func:`conversation_jaccard` feeds the int-keyed exact
    set-similarity join with; 60 bits keeps it BIGINT-safe in SQL)."""
    return np.fromiter(
        (int(hashlib.md5(c.encode("utf-8")).hexdigest()[:15], 16)
         for c in conv.astype(str)),
        dtype=np.int64, count=len(conv),
    )


def conversation_jaccard(
    turns: rd.Dataset,
    threshold: float = 0.7,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    text_col: str = "text",
    num_parts: int = 64,
) -> rd.Dataset:
    """Conversation-level EXACT near-duplicate pairs.

    Composes :func:`conversation_texts` with the exact word-3-gram
    Jaccard set-similarity join (:func:`stages.dedup.ngram_jaccard_dedup`)
    — the whole-trajectory dedup step (repeated conversations with
    trivially different turn splits still share almost all shingles).

    Conversation keys ride the join as deterministic md5-u60 int ids
    (SQL-reproducible) and the tiny surviving pair set hash-joins the
    string keys back. Returns ``(conv_a, conv_b, jaccard)`` with
    ``conv_a`` / ``conv_b`` ordered by id.
    """
    import pyarrow as pa

    from graph_data_science_ray.pipelines.agg import hash_join
    from graph_data_science_ray.stages.dedup import ngram_jaccard_dedup

    texts = conversation_texts(
        turns, conv_col=conv_col, idx_col=idx_col, text_col=text_col
    ).materialize()  # consumed twice: docs + id->conv mapping

    def with_ids(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {"doc_id": pd.Series([], dtype=np.int64),
                 "text": pd.Series([], dtype=object)}
            )
        return pd.DataFrame(
            {"doc_id": _conv_int_id(df["conv"]),
             "text": df["text"].astype(str).to_numpy(dtype=object)}
        )

    docs = texts.map_batches(with_ids, batch_format="pandas")
    pairs = ngram_jaccard_dedup(
        docs, threshold=threshold, num_parts=num_parts
    )

    def mapping(col: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            if not len(df):
                return pd.DataFrame(
                    {col: pd.Series([], dtype=np.int64),
                     col.replace("doc", "conv"): pd.Series([], dtype=object)}
                )
            return pd.DataFrame(
                {col: _conv_int_id(df["conv"]),
                 col.replace("doc", "conv"):
                     df["conv"].astype(str).to_numpy(dtype=object)}
            )
        return fn

    pair_schema = pa.schema(
        [("doc_a", pa.int64()), ("doc_b", pa.int64()),
         ("jaccard", pa.float64())]
    )
    map_a = texts.map_batches(mapping("doc_a"), batch_format="pandas")
    map_b = texts.map_batches(mapping("doc_b"), batch_format="pandas")
    joined = hash_join(
        pairs, map_a, on=["doc_a"], num_parts=num_parts,
        left_schema=pair_schema,
        right_schema=pa.schema([("doc_a", pa.int64()), ("conv_a", pa.string())]),
    )
    joined = hash_join(
        joined, map_b, on=["doc_b"], num_parts=num_parts,
        left_schema=pa.schema(
            [("doc_a", pa.int64()), ("doc_b", pa.int64()),
             ("jaccard", pa.float64()), ("conv_a", pa.string())]
        ),
        right_schema=pa.schema([("doc_b", pa.int64()), ("conv_b", pa.string())]),
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {"conv_a": pd.Series([], dtype=object),
                 "conv_b": pd.Series([], dtype=object),
                 "jaccard": pd.Series([], dtype=np.float64)}
            )
        return df[["conv_a", "conv_b", "jaccard"]].astype(
            {"conv_a": object, "conv_b": object, "jaccard": np.float64}
        )

    return joined.map_batches(finish, batch_format="pandas")


def turn_latency(
    turns: rd.Dataset,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    ts_col: str = "ts",
) -> rd.Dataset:
    """Per-turn response latency in EXACT integer microseconds.

    Returns ``(conv, turn_idx, latency_us)`` where ``latency_us`` is
    the timestamp delta to the previous turn in the conversation under
    stable turn ordering (first turn: 0). The latency profile is a
    trajectory-quality signal (abandoned sessions, tool stalls) and the
    deltas are exact int64, so the oracle is verbatim SQL
    ``date_diff``. Row-local per conversation group.
    """

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(idx_col, kind="mergesort")
        t = g[ts_col].to_numpy(dtype="datetime64[us]").astype(np.int64)
        lat = np.zeros(len(t), dtype=np.int64)
        if len(t) > 1:
            lat[1:] = t[1:] - t[:-1]
        return pd.DataFrame(
            {"conv": g[conv_col].astype(str).to_numpy(dtype=object),
             "turn_idx": g[idx_col].to_numpy().astype(np.int64),
             "latency_us": lat}
        )

    return turns.groupby(conv_col).map_groups(per_group, batch_format="pandas")


def latency_stats(
    turns: rd.Dataset,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    ts_col: str = "ts",
) -> rd.Dataset:
    """Per-conversation latency aggregates: ``(conv, n_gaps, total_us,
    max_us)`` over consecutive-turn timestamp deltas (stable turn
    order). ``total_us`` is the conversation's wall span, ``max_us``
    its longest idle gap — the session-staleness filter signal. All
    exact int64."""

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(idx_col, kind="mergesort")
        t = g[ts_col].to_numpy(dtype="datetime64[us]").astype(np.int64)
        d = t[1:] - t[:-1] if len(t) > 1 else np.array([], dtype=np.int64)
        return pd.DataFrame(
            {"conv": [str(g[conv_col].iloc[0])],
             "n_gaps": np.array([len(d)], dtype=np.int64),
             "total_us": np.array([int(d.sum())], dtype=np.int64),
             "max_us": np.array(
                 [int(d.max()) if len(d) else 0], dtype=np.int64)}
        )

    return turns.groupby(conv_col).map_groups(per_group, batch_format="pandas")


def conversation_novelty(
    turns: rd.Dataset,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    text_col: str = "text",
) -> rd.Dataset:
    """Per-conversation n-gram novelty: ``(conv, n_shingles,
    n_distinct, novelty_ppm)`` over word-3-grams of the concatenated
    turn text (stable order) — the trajectory-level repetition signal
    (a looping agent's novelty collapses). ``novelty_ppm =
    1e6 * n_distinct // n_shingles`` (integer, order-independent);
    conversations with fewer than 3 tokens report zero shingles and
    ppm 0. Row-local per conversation document."""
    import re

    word = re.compile(r"\S+")

    def per_doc(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {"conv": pd.Series([], dtype=object),
                 "n_shingles": pd.Series([], dtype=np.int64),
                 "n_distinct": pd.Series([], dtype=np.int64),
                 "novelty_ppm": pd.Series([], dtype=np.int64)}
            )
        convs, total, dist = [], [], []
        for conv, text in zip(df["conv"], df["text"]):
            toks = word.findall(text)
            n = max(0, len(toks) - 2)
            sh = {" ".join(toks[i:i + 3]) for i in range(n)}
            convs.append(str(conv))
            total.append(n)
            dist.append(len(sh))
        total = np.array(total, dtype=np.int64)
        dist = np.array(dist, dtype=np.int64)
        ppm = np.where(total > 0, 1_000_000 * dist // np.maximum(total, 1), 0)
        return pd.DataFrame(
            {"conv": np.array(convs, dtype=object),
             "n_shingles": total,
             "n_distinct": dist,
             "novelty_ppm": ppm.astype(np.int64)}
        )

    texts = conversation_texts(
        turns, conv_col=conv_col, idx_col=idx_col, text_col=text_col
    )
    return texts.map_batches(per_doc, batch_format="pandas", batch_size=256)


def trajectory_pack(
    turns: rd.Dataset,
    budget: int,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    actor_col: str = "role",
    text_col: str = "text",
    num_parts: int = 64,
) -> rd.Dataset:
    """Composed trajectory-curation flagship: duplicate-turn flags and
    agent-loop flags gate the turn set, and the surviving turns pack
    into training sequences at conversation granularity.

    ONE streaming chain of the individually-oracled stages:
    :func:`turn_dedup_flags` (cross-conversation exact dedup, keeper =
    smallest ``(conv, turn_idx)``) ∘ :func:`turn_loop_flags`
    (same-actor repeated-text turns dropped) → hash-join both flag
    tables back onto the turns → :func:`pack_conversations` over the
    kept turns. Returns ``(conv, n_tokens, seq_id, offset)``;
    conversations whose every turn is dropped vanish. Every shuffle is
    conv- or text-hash-partitioned; the only driver state is the
    O(#blocks) running-sum scan inside the packer.
    """
    import pyarrow as pa

    from graph_data_science_ray.pipelines.agg import hash_join

    def base(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {"conv": pd.Series([], dtype=object),
                 "turn_idx": pd.Series([], dtype=np.int64),
                 "text": pd.Series([], dtype=object)}
            )
        return pd.DataFrame(
            {"conv": df[conv_col].astype(str).to_numpy(dtype=object),
             "turn_idx": df[idx_col].to_numpy().astype(np.int64),
             "text": df[text_col].astype(str).to_numpy(dtype=object)}
        )

    rows = turns.map_batches(base, batch_format="pandas")
    dup = turn_dedup_flags(
        turns, conv_col=conv_col, idx_col=idx_col, text_col=text_col
    )
    loops = turn_loop_flags(
        turns, conv_col=conv_col, idx_col=idx_col,
        actor_col=actor_col, text_col=text_col,
    )
    j = hash_join(
        rows, dup, on=["conv", "turn_idx"], num_parts=num_parts,
        left_schema=pa.schema(
            [("conv", pa.string()), ("turn_idx", pa.int64()),
             ("text", pa.string())]
        ),
        right_schema=pa.schema(
            [("conv", pa.string()), ("turn_idx", pa.int64()),
             ("dup", pa.int64())]
        ),
    )
    j = hash_join(
        j, loops, on=["conv", "turn_idx"], num_parts=num_parts,
        left_schema=pa.schema(
            [("conv", pa.string()), ("turn_idx", pa.int64()),
             ("text", pa.string()), ("dup", pa.int64())]
        ),
        right_schema=pa.schema(
            [("conv", pa.string()), ("turn_idx", pa.int64()),
             ("looped", pa.int64())]
        ),
    )
    kept = j.map_batches(
        lambda df: df[(df["dup"] == 0) & (df["looped"] == 0)][
            ["conv", "turn_idx", "text"]
        ],
        batch_format="pandas",
    )
    return pack_conversations(
        kept, budget, conv_col="conv", text_col="text"
    )


def latency_moments(
    turns: rd.Dataset,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    ts_col: str = "ts",
) -> rd.Dataset:
    """Per-conversation response-latency MOMENTS: ``(conv, n_gaps,
    sum_us, sumsq_us)`` over consecutive-turn timestamp deltas (stable
    turn order) — the burstiness signal :func:`latency_stats` can't
    express (variance / Fano factor = f(sum, sumsq, n); a steady agent
    and a stall-then-burst agent share the same total but not the same
    second moment). Exact int64 discipline: ``sum_us`` is exact
    microseconds; the squared term uses MILLISECOND gaps
    (``sumsq_ms2 = sum((gap_us // 1000)^2)``) so a multi-hour gap
    squared stays far below 2^63 — squaring raw microseconds overflows
    int64 at ~2.5 hours. Same scale shape as every trajectory op: one
    conv-hash groupby, conversations are bounded."""

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(idx_col, kind="mergesort")
        t = g[ts_col].to_numpy(dtype="datetime64[us]").astype(np.int64)
        d = t[1:] - t[:-1] if len(t) > 1 else np.array([], dtype=np.int64)
        return pd.DataFrame(
            {"conv": [str(g[conv_col].iloc[0])],
             "n_gaps": np.array([len(d)], dtype=np.int64),
             "sum_us": np.array([int(d.sum())], dtype=np.int64),
             "sumsq_ms2": np.array(
                 [int(((d // 1000) * (d // 1000)).sum())], dtype=np.int64)}
        )

    return turns.groupby(conv_col).map_groups(per_group, batch_format="pandas")


def tool_usage(turns: rd.Dataset, num_parts: int = 16) -> rd.Dataset:
    """Per-tool usage stats: ``(tool, n_turns, n_convs)`` over turns
    whose tool column is set — the tool-call census a trajectory
    curation pass starts from.

    Two-level distributed aggregate: map-side (tool, conv) partial
    counts hash-sum to per-conversation counts (bounded by
    tools x convs), then one tiny per-tool combine yields turn totals
    and distinct-conversation counts — the distinct never shuffles raw
    turns twice.
    """
    from graph_data_science_ray.pipelines.agg import hash_aggregate

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {"tool": pd.Series([], dtype=object),
                 "conv_id": pd.Series([], dtype=object),
                 "c": pd.Series([], dtype=np.int64)}
            )
        m = df["tool"].notna() & (df["tool"].astype(object) != "")
        sub = df[m]
        return pd.DataFrame(
            {"tool": sub["tool"].astype(str),
             "conv_id": sub["conv_id"].astype(str),
             "c": np.ones(int(m.sum()), dtype=np.int64)}
        )

    per_conv = hash_aggregate(
        turns.map_batches(pairs, batch_format="pandas"),
        ["tool", "conv_id"], "c", op="sum", num_parts=num_parts,
    )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("tool", sort=False)
        out = g["c"].agg(n_turns="sum", n_convs="count").reset_index()
        out["n_turns"] = out["n_turns"].astype(np.int64)
        out["n_convs"] = out["n_convs"].astype(np.int64)
        return out

    return (
        per_conv.groupby("tool").map_groups(combine, batch_format="pandas")
    )


def actor_ngrams(
    turns: rd.Dataset,
    n: int = 3,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    actor_col: str = "role",
    num_parts: int = 64,
) -> rd.Dataset:
    """Consecutive actor n-gram counts — the "common path" structure of
    the trajectory set (``role_transitions`` generalized from pairs to
    length-``n`` runs).  One row per distinct actor sequence:
    ``(gram, cnt)`` with the sequence joined by ``>``.

    Scale shape identical to :func:`role_transitions`: per-conversation
    groups emit partial gram counts (one shifted elementwise string
    concat over the ordered actor array — no per-gram Python loop),
    then a hash-partitioned sum collapses them; the output is at most
    |actors|^n rows and the only shuffle is the conv hash exchange.
    """
    from graph_data_science_ray.pipelines.agg import hash_aggregate

    if n < 2:
        raise ValueError("actor_ngrams needs n >= 2")

    empty = pd.DataFrame(
        {"gram": pd.Series([], dtype=object),
         "cnt": pd.Series([], dtype=np.int64)}
    )

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(idx_col, kind="mergesort")
        a = g[actor_col].astype(str).to_numpy(dtype=object)
        m = len(a) - n + 1
        if m <= 0:
            return empty
        gram = a[:m].copy()
        for k in range(1, n):
            gram = gram + ">" + a[k : m + k]
        cnt = (
            pd.DataFrame({"gram": gram})
            .groupby("gram", sort=False)
            .size()
            .reset_index(name="cnt")
        )
        cnt["cnt"] = cnt["cnt"].astype(np.int64)
        return cnt

    partials = turns.groupby(conv_col).map_groups(
        per_group, batch_format="pandas"
    )
    return hash_aggregate(partials, ["gram"], "cnt", op="sum", num_parts=num_parts)


def conversation_dedup_flags(
    turns: rd.Dataset,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    text_col: str = "text",
    num_parts: int = 64,
) -> rd.Dataset:
    """Exact whole-conversation duplicate flags: two conversations are
    duplicates when their stable-order turn-text concatenations are
    byte-identical; the keeper is the lexicographically smallest conv
    id.  Returns ``(conv, keep)`` — the conversation-granularity
    analogue of :func:`turn_dedup_flags` (a trajectory set routinely
    contains re-ingested identical dialogues).

    Scale shape: conversation concat (conv-hash groupby, bounded
    groups) → text-hash-partitioned min-conv keeper → flag join, all
    vectorized; nothing conversation-count-sized on the driver.
    """
    from graph_data_science_ray.pipelines.agg import hash_aggregate, hash_join
    import pyarrow as pa

    texts = conversation_texts(
        turns, conv_col=conv_col, idx_col=idx_col, text_col=text_col
    )

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"text": df["text"].astype(str).to_numpy(dtype=object),
             "keeper": df["conv"].astype(str).to_numpy(dtype=object)}
        )

    keepers = hash_aggregate(
        texts.map_batches(keyed, batch_format="pandas"),
        ["text"], "keeper", op="min", num_parts=num_parts,
    )
    joined = hash_join(
        texts, keepers, on=["text"],
        left_schema=pa.schema([("conv", pa.string()), ("text", pa.string())]),
        right_schema=pa.schema(
            [("text", pa.string()), ("keeper", pa.string())]
        ),
        num_parts=num_parts,
    )

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"conv": df["conv"].astype(str).to_numpy(dtype=object),
             "keep": (df["conv"].astype(str) == df["keeper"].astype(str))
             .astype(np.int64).to_numpy()}
        )

    return joined.map_batches(flag, batch_format="pandas")


def tool_latency(
    turns: rd.Dataset,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    actor_col: str = "role",
    ts_col: str = "ts",
    prefix: str = "tool:",
    num_parts: int = 16,
) -> rd.Dataset:
    """Per-tool response-latency profile: for every turn whose actor is
    a tool (``actor`` starts with ``prefix``), the exact integer-µs
    delta to the previous turn, aggregated per tool as
    ``(tool, n, sum_us, max_us)`` — the agent-observability cut of
    :func:`turn_latency` (which tools stall the trajectory).  First
    turns of a conversation are excluded (no predecessor).
    """
    from graph_data_science_ray.pipelines.agg import hash_aggregate, hash_join
    import pyarrow as pa

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(idx_col, kind="mergesort")
        t = g[ts_col].to_numpy(dtype="datetime64[us]").astype(np.int64)
        if "tool" in g.columns:
            # mirror pipelines.edges._actor_key: a non-empty tool value
            # promotes the turn's actor to 'tool:<name>'
            tool = g["tool"].fillna("").astype(str)
            role = g[actor_col].astype(str)
            a = np.where(
                tool != "", "tool:" + tool, "role:" + role
            ).astype(object)
        else:
            a = g[actor_col].astype(str).to_numpy(dtype=object)
        if len(t) < 2:
            return pd.DataFrame(
                {"tool": pd.Series([], dtype=object),
                 "n": pd.Series([], dtype=np.int64),
                 "sum_us": pd.Series([], dtype=np.int64),
                 "max_us": pd.Series([], dtype=np.int64)}
            )
        lat = t[1:] - t[:-1]
        cur = a[1:]
        is_tool = np.array([s.startswith(prefix) for s in cur], dtype=bool)
        if not is_tool.any():
            return pd.DataFrame(
                {"tool": pd.Series([], dtype=object),
                 "n": pd.Series([], dtype=np.int64),
                 "sum_us": pd.Series([], dtype=np.int64),
                 "max_us": pd.Series([], dtype=np.int64)}
            )
        sub = pd.DataFrame({"tool": cur[is_tool], "lat": lat[is_tool]})
        g2 = sub.groupby("tool", sort=False)["lat"]
        out = g2.agg(n="size", sum_us="sum", max_us="max").reset_index()
        for c in ("n", "sum_us", "max_us"):
            out[c] = out[c].astype(np.int64)
        return out

    parts = turns.groupby(conv_col).map_groups(
        per_group, batch_format="pandas"
    )

    # reassert columns: an all-empty group emits a schema-less block
    # that would KeyError inside the downstream hash aggregates
    def assert_cols(df: pd.DataFrame) -> pd.DataFrame:
        if "tool" not in df.columns:
            return pd.DataFrame(
                {"tool": pd.Series([], dtype=object),
                 "n": pd.Series([], dtype=np.int64),
                 "sum_us": pd.Series([], dtype=np.int64),
                 "max_us": pd.Series([], dtype=np.int64)}
            )
        return df

    parts = parts.map_batches(assert_cols, batch_format="pandas")
    a_ = hash_aggregate(parts, ["tool"], "n", op="sum", num_parts=num_parts)
    b_ = hash_aggregate(parts, ["tool"], "sum_us", op="sum",
                        num_parts=num_parts)
    c_ = hash_aggregate(parts, ["tool"], "max_us", op="max",
                        num_parts=num_parts)
    s1 = pa.schema([("tool", pa.string()), ("n", pa.int64())])
    s2 = pa.schema([("tool", pa.string()), ("sum_us", pa.int64())])
    j = hash_join(a_, b_, on=["tool"], left_schema=s1, right_schema=s2,
                  num_parts=num_parts)
    s3 = pa.schema([("tool", pa.string()), ("n", pa.int64()),
                    ("sum_us", pa.int64())])
    s4 = pa.schema([("tool", pa.string()), ("max_us", pa.int64())])
    return hash_join(j, c_, on=["tool"], left_schema=s3, right_schema=s4,
                     num_parts=num_parts)


def monologue_runs(
    turns: rd.Dataset,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    actor_col: str = "role",
) -> rd.Dataset:
    """Per-conversation same-actor run-length profile:
    ``(conv, n_runs, max_run, sum_run_gt1)`` where a run is a maximal
    stretch of consecutive turns by one actor — ``max_run`` is the
    longest monologue and ``sum_run_gt1`` the turns inside multi-turn
    runs (the stuck-agent volume complementing
    :func:`turn_loop_flags`' exact-repeat signal).  Vectorized
    gaps-and-islands per conversation group; all integers.
    """

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(idx_col, kind="mergesort")
        a = g[actor_col].astype(str).to_numpy(dtype=object)
        n = len(a)
        starts = np.ones(n, dtype=bool)
        starts[1:] = a[1:] != a[:-1]
        run_id = np.cumsum(starts) - 1
        lens = np.bincount(run_id)
        return pd.DataFrame(
            {"conv": [str(g[conv_col].iloc[0])],
             "n_runs": np.array([len(lens)], dtype=np.int64),
             "max_run": np.array([int(lens.max())], dtype=np.int64),
             "sum_run_gt1": np.array(
                 [int(lens[lens > 1].sum())], dtype=np.int64
             )}
        )

    return turns.groupby(conv_col).map_groups(per_group, batch_format="pandas")


def turn_cooccurrence(
    turns: rd.Dataset,
    max_gap: int = 3,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    actor_col: str = "role",
    num_parts: int = 64,
) -> rd.Dataset:
    """Windowed sequential co-occurrence counts: ``(prev_role, role, gap, n)``.

    For every conversation and every ordered turn pair at distance
    ``gap`` (1 ≤ gap ≤ ``max_gap``) under stable turn ordering, counts
    how often actor ``role`` follows actor ``prev_role`` exactly ``gap``
    turns later — the gap-resolved generalization of
    :func:`role_transitions` (gap=1 marginal equals it exactly) and the
    standard sequential-pattern / skip-gram statistic over trajectories.

    Scale shape: identical to ``role_transitions`` — per-conversation
    groups emit distinct-pair PARTIAL counts (``max_gap`` shifted
    overlays, all vectorized), then a hash-partitioned sum; the result
    is at most ``|actors|² · max_gap`` rows.
    """
    from graph_data_science_ray.pipelines.agg import hash_aggregate

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(idx_col, kind="mergesort")
        a = g[actor_col].astype(str).to_numpy(dtype=object)
        frames = []
        for gap in range(1, int(max_gap) + 1):
            if len(a) > gap:
                frames.append(
                    pd.DataFrame(
                        {"prev_role": a[:-gap], "role": a[gap:],
                         "gap": np.int64(gap)}
                    )
                )
        if not frames:
            return pd.DataFrame(
                {"prev_role": pd.Series([], dtype=object),
                 "role": pd.Series([], dtype=object),
                 "gap": pd.Series([], dtype=np.int64),
                 "n": pd.Series([], dtype=np.int64)}
            )
        pairs = pd.concat(frames, ignore_index=True)
        cnt = (
            pairs.groupby(["prev_role", "role", "gap"], sort=False)
            .size()
            .reset_index(name="n")
        )
        cnt["n"] = cnt["n"].astype(np.int64)
        return cnt

    partials = turns.groupby(conv_col).map_groups(
        per_group, batch_format="pandas"
    )
    return hash_aggregate(
        partials, ["prev_role", "role", "gap"], "n", op="sum",
        num_parts=num_parts,
    )


def markov_stationary(
    turns: rd.Dataset,
    rounds: int = 6,
    scale: int = 1_000_000,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    actor_col: str = "role",
) -> pd.DataFrame:
    """Bounded-round stationary mass of the actor-transition Markov chain.

    The transition counts come from :func:`role_transitions` (fully
    distributed; the matrix itself is the answer-sized aggregate —
    ``|actors|²`` at most), then ``rounds`` exact INTEGER power-iteration
    steps run on the driver:

        ``x⁰_i = scale;  x^{t+1}_j = Σ_i floor(x^t_i · n_ij / out_i)``

    with ``out_i = Σ_j n_ij``. Every term floors a nonnegative integer
    quotient, so the whole trajectory is order-independent, bit-exact at
    any parallelism, and replayable verbatim in SQL (DuckDB ``//``
    truncates, which equals floor on nonnegatives). Dangling actors
    (no outgoing transition) leak their mass, the standard truncated
    treatment. The state space is the union of both transition margins.
    Keep ``|actors| · scale · max(n_ij)`` under 2^63.

    Returns ``(role, mass)`` after ``rounds`` steps — the unnormalized
    stationary-distribution estimate (divide by its sum for
    probabilities).
    """
    from graph_data_science_ray.stages.trajectory import role_transitions as _rt

    counts = _rt(
        turns, conv_col=conv_col, idx_col=idx_col, actor_col=actor_col
    ).to_pandas()
    if "prev_role" not in counts.columns or not len(counts):
        return pd.DataFrame(
            {"role": pd.Series([], dtype=object),
             "mass": pd.Series([], dtype=np.int64)}
        )
    actors = sorted(set(counts["prev_role"]) | set(counts["role"]))
    pos = {a: i for i, a in enumerate(actors)}
    src = counts["prev_role"].map(pos).to_numpy(dtype=np.int64)
    dst = counts["role"].map(pos).to_numpy(dtype=np.int64)
    n = counts["n"].to_numpy(dtype=np.int64)
    out = np.zeros(len(actors), dtype=np.int64)
    np.add.at(out, src, n)
    x = np.full(len(actors), int(scale), dtype=np.int64)
    for _ in range(int(rounds)):
        term = (x[src] * n) // out[src]
        nxt = np.zeros(len(actors), dtype=np.int64)
        np.add.at(nxt, dst, term)
        x = nxt
    return pd.DataFrame({"role": np.array(actors, dtype=object), "mass": x})


def tool_chains(
    turns: rd.Dataset,
    top_k: int = 20,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    tool_col: str = "tool",
    num_parts: int = 32,
) -> pd.DataFrame:
    """Top-k tool invocation chains: ``(chain, n)``.

    Within each conversation the tool turns (non-null ``tool``), in
    stable turn order, join into a ``'t1>t4>t1'`` chain string; chains
    are counted across conversations and the ``top_k`` most frequent
    returned (ties by chain string).  The agent-observability readout
    for "what tool sequences do trajectories actually run" —
    conversations with no tool turns are skipped.

    Scale shape: conv-hash groups emit one chain row each; a
    hash-partitioned count collapses them; per-block top-k candidates
    after full aggregation bound the driver merge (the ``user_paths``
    soundness argument).
    """
    from graph_data_science_ray.pipelines.agg import hash_aggregate

    def per_conv(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(idx_col, kind="mergesort")
        t = g[tool_col]
        t = t[t.notna()].astype(str)
        if not len(t):
            return pd.DataFrame({"chain": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype=np.int64)})
        return pd.DataFrame(
            {"chain": [">".join(t)], "n": np.array([1], dtype=np.int64)}
        )

    chains = turns.groupby(conv_col).map_groups(
        per_conv, batch_format="pandas"
    )
    counts = hash_aggregate(chains, ["chain"], "n", op="sum",
                            num_parts=num_parts)

    def topk_part(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["n", "chain"], ascending=[False, True],
                             kind="mergesort").head(int(top_k))

    cand = counts.map_batches(topk_part, batch_format="pandas").to_pandas()
    if "chain" not in cand.columns:
        return pd.DataFrame({"chain": pd.Series([], dtype=object),
                             "n": pd.Series([], dtype=np.int64)})
    cand["n"] = cand["n"].astype(np.int64)
    return (
        cand.sort_values(["n", "chain"], ascending=[False, True],
                         kind="mergesort")
        .head(int(top_k))
        .reset_index(drop=True)
    )


def transition_latency_quantiles(
    turns: rd.Dataset,
    percentiles: tuple = (0.5, 0.9, 0.99),
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    actor_col: str = "role",
    ts_col: str = "ts",
    num_parts: int = 32,
) -> pd.DataFrame:
    """Per-transition response-latency quantiles: one row per ordered
    actor pair ``(prev_role, role)`` with ``n``, ``min_us``, ``max_us``
    and ``p50/p90/p99`` — exact int64 microsecond order statistics at
    DuckDB ``quantile_disc`` rank semantics (``ceil(q·n) − 1``), the
    repo's shared discrete-quantile contract.

    Scale shape: conversations emit their adjacent-turn gap rows
    map-side (conv-hash groups), then one (prev, role)-hash shuffle
    sorts each transition's gaps locally; the output is
    ``|actors|²``-bounded. A single transition's gap list must fit one
    task — re-shard onto the ``distribution_summary`` rank-select path
    for pathological hub pairs.
    """

    def gaps_block(g: pd.DataFrame) -> pd.DataFrame:
        """Adjacent-turn gaps for EVERY conversation of a hash
        partition at once (per-conv callables cost ~1 pandas frame per
        conversation; one lexsort + boundary mask replaces them)."""
        if not len(g) or ts_col not in g.columns:
            return pd.DataFrame(
                {"prev_role": pd.Series([], dtype=object),
                 "role": pd.Series([], dtype=object),
                 "gap": pd.Series([], dtype=np.int64)}
            )
        cvc, _cv_u = pd.factorize(
            g[conv_col].astype(str).to_numpy(dtype=object), sort=False
        )
        idx = g[idx_col].to_numpy(dtype=np.int64)
        order = np.lexsort((idx, cvc))
        a = g[actor_col].astype(str).to_numpy(dtype=object)[order]
        t = (
            g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        )[order]
        same = cvc[order][1:] == cvc[order][:-1]
        return pd.DataFrame(
            {"prev_role": a[:-1][same], "role": a[1:][same],
             "gap": (t[1:] - t[:-1])[same].astype(np.int64)}
        )

    def summarize_block(g: pd.DataFrame) -> pd.DataFrame:
        """All groups of one hash partition, vectorized at once — at
        |actors|² output pairs a per-group pandas callable dominates
        wall time (measured 25 s → ~3 s at sf0.1)."""
        cols = ["n", "min_us", "max_us"] + [
            f"p{str(q)[2:]}" for q in percentiles
        ]
        if not len(g) or "gap" not in g.columns:
            return pd.DataFrame(
                {"prev_role": pd.Series([], dtype=object),
                 "role": pd.Series([], dtype=object),
                 **{c: pd.Series([], dtype=np.int64) for c in cols}}
            )
        # positional factorize per column (Series + Series would align
        # on the block's duplicated indexes and corrupt the pair keys)
        pvc, pv_u = pd.factorize(
            g["prev_role"].astype(str).to_numpy(dtype=object), sort=True
        )
        rlc, rl_u = pd.factorize(
            g["role"].astype(str).to_numpy(dtype=object), sort=True
        )
        gap = g["gap"].to_numpy(dtype=np.int64)
        order = np.lexsort((gap, rlc, pvc))
        key_s = pvc[order] * np.int64(len(rl_u)) + rlc[order]
        gap_s = gap[order]
        starts = np.flatnonzero(np.r_[True, key_s[1:] != key_s[:-1]])
        counts = np.diff(np.r_[starts, len(key_s)])
        pv_u = np.asarray(pv_u, dtype=object)
        rl_u = np.asarray(rl_u, dtype=object)
        row = {
            "prev_role": pv_u[key_s[starts] // len(rl_u)],
            "role": rl_u[key_s[starts] % len(rl_u)],
            "n": counts.astype(np.int64),
            "min_us": gap_s[starts],
            "max_us": gap_s[starts + counts - 1],
        }
        for q in percentiles:
            r = np.minimum(
                np.maximum(np.ceil(q * counts).astype(np.int64) - 1, 0),
                counts - 1,
            )
            row[f"p{str(q)[2:]}"] = gap_s[starts + r]
        return pd.DataFrame(row)

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        from graph_data_science_ray.pipelines.agg import _stable_row_hash

        df = df.copy()
        df["__part"] = (
            _stable_row_hash(df, ["prev_role", "role"]) % num_parts
        ).astype(np.int64)
        return df

    def conv_tag(df: pd.DataFrame) -> pd.DataFrame:
        from graph_data_science_ray.pipelines.agg import _stable_row_hash

        df = df.copy()
        df["__cpart"] = (
            _stable_row_hash(df, [conv_col]) % num_parts
        ).astype(np.int64)
        return df

    rows = (
        turns.map_batches(conv_tag, batch_format="pandas")
        .groupby("__cpart")
        .map_groups(gaps_block, batch_format="pandas")
    )
    out = (
        rows.map_batches(tag, batch_format="pandas")
        .groupby("__part")
        .map_groups(summarize_block, batch_format="pandas")
        .to_pandas()
    )
    if "__part" in out.columns:
        out = out.drop(columns=["__part"])
    if "prev_role" not in out.columns:
        cols = ["n", "min_us", "max_us"] + [
            f"p{str(q)[2:]}" for q in percentiles
        ]
        out = pd.DataFrame(
            {"prev_role": pd.Series([], dtype=object),
             "role": pd.Series([], dtype=object),
             **{c: pd.Series([], dtype=np.int64) for c in cols}}
        )
    return out.sort_values(["prev_role", "role"]).reset_index(drop=True)


def topic_segments(
    turns: rd.Dataset,
    threshold_ppm: int = 100_000,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    text_col: str = "text",
) -> rd.Dataset:
    """Lexical topic segmentation per conversation: ``(conv, n_turns,
    n_segments, max_segment)``.

    A segment boundary opens between adjacent turns whose DISTINCT-token
    Jaccard similarity (exact integer ppm: ``|∩|·10⁶ // |∪|``) falls
    below ``threshold_ppm`` — the TextTiling-style lexical-cohesion
    break signal (Hearst, "TextTiling: segmenting text into multi-
    paragraph subtopic passages", CL 1997) reduced to the repo's
    integer discipline so every boundary decision is SQL-replayable.
    Tokens are lowercased whitespace splits; an empty-∪ pair (two empty
    turns) counts as similarity 0.

    Scale shape: one conv-hash shuffle; everything else is group-local
    string work; output is conversation-cardinality.
    """

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(idx_col, kind="mergesort")
        toks = [
            set(str(t).lower().split()) if t is not None else set()
            for t in g[text_col]
        ]
        n = len(toks)
        bounds = 0
        seg_len, max_seg = 1, 1
        for i in range(1, n):
            inter = len(toks[i - 1] & toks[i])
            union = len(toks[i - 1] | toks[i])
            ppm = (inter * 1_000_000) // union if union else 0
            if ppm < threshold_ppm:
                bounds += 1
                seg_len = 1
            else:
                seg_len += 1
            max_seg = max(max_seg, seg_len)
        return pd.DataFrame(
            {"conv": [str(g[conv_col].iloc[0])],
             "n_turns": np.array([n], dtype=np.int64),
             "n_segments": np.array([bounds + 1], dtype=np.int64),
             "max_segment": np.array([max_seg], dtype=np.int64)}
        )

    return turns.groupby(conv_col).map_groups(per_group, batch_format="pandas")


def co_participation(
    turns: rd.Dataset,
    conv_col: str = "conv_id",
    actor_col: str = "role",
    num_parts: int = 64,
) -> rd.Dataset:
    """Actor co-participation counts — the bipartite projection graph.

    One row per unordered actor pair ``(a, b, n)`` (a < b) counting the
    conversations in which BOTH appear — the one-mode projection of the
    actor×conversation bipartite graph, the standard alternative graph
    construction to adjacency-derived interaction edges (co-occurrence
    links actors who never speak consecutively).

    Scale shape: per-conversation groups emit their distinct-actor pairs
    (conversation casts are small — the per-conv actor set is bounded),
    then a hash-partitioned sum; output ≤ |actors|².
    """
    from itertools import combinations

    from graph_data_science_ray.pipelines.agg import hash_aggregate

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        actors = sorted(set(g[actor_col].astype(str)))
        pairs = list(combinations(actors, 2))
        if not pairs:
            return pd.DataFrame(
                {"a": pd.Series([], dtype=object),
                 "b": pd.Series([], dtype=object),
                 "n": pd.Series([], dtype=np.int64)}
            )
        return pd.DataFrame(
            {"a": [p[0] for p in pairs], "b": [p[1] for p in pairs],
             "n": np.ones(len(pairs), dtype=np.int64)}
        )

    partials = turns.groupby(conv_col).map_groups(
        per_group, batch_format="pandas"
    )
    return hash_aggregate(partials, ["a", "b"], "n", op="sum",
                          num_parts=num_parts)


def actor_activity(
    turns: rd.Dataset,
    conv_col: str = "conv_id",
    actor_col: str = "role",
    ts_col: str = "ts",
    num_parts: int = 64,
) -> rd.Dataset:
    """Per-actor activity profile: ``(role, n_turns, n_convs, first_us,
    last_us)`` — exact integers (µs timestamps, distinct-conversation
    counts), the actor-level health/engagement readout.

    Map-side partials per batch (count / distinct-conv set via a
    two-stage aggregate: per (actor, conv) first, then per actor), one
    actor-hash shuffle; output is actor-cardinality.
    """
    from graph_data_science_ray.pipelines.agg import _stable_row_hash

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        t = df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        g = pd.DataFrame(
            {"role": df[actor_col].astype(str),
             "conv": df[conv_col].astype(str), "t": t}
        ).groupby(["role", "conv"], sort=False).agg(
            n=("t", "size"), mn=("t", "min"), mx=("t", "max")
        )
        return g.reset_index()

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        # deterministic (process-independent) partitioner — Python hash()
        # is salted per process and would split a role across groups
        df["__part"] = (_stable_row_hash(df, ["role"]) % num_parts).astype(
            np.int64
        )
        return df

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("role", sort=False).agg(
            n_turns=("n", "sum"), n_convs=("conv", "nunique"),
            first_us=("mn", "min"), last_us=("mx", "max"),
        )
        return out.reset_index()

    rows = turns.map_batches(pairs, batch_format="pandas")
    out = (
        rows.map_batches(tag, batch_format="pandas")
        .groupby("__part")
        .map_groups(combine, batch_format="pandas")
    )
    return out


def graph_snapshots(
    contacts: rd.Dataset,
    window_us: int = 86_400_000_000,
    num_parts: int = 32,
) -> pd.DataFrame:
    """Tumbling-window graph snapshots over the contact stream.

    One row per window: ``(win, n_contacts, n_actors)`` with
    ``win = t // window_us`` (epoch-day buckets at the default) —
    the temporal-graph evolution readout (how edge volume and the
    active node set move through time).  Counts are exact: contacts
    per window sum map-side; actors per window go through a
    (win, actor)-distinct pre-aggregate so the final nunique is over
    deduplicated rows.
    """
    from graph_data_science_ray.pipelines.agg import (
        _stable_row_hash,
        hash_aggregate,
    )

    def base(df: pd.DataFrame) -> pd.DataFrame:
        w = (df["t"].to_numpy(dtype=np.int64) // int(window_us))
        a = pd.DataFrame(
            {"win": np.concatenate([w, w]),
             "actor": np.concatenate(
                 [df["src"].astype(str).to_numpy(dtype=object),
                  df["dst"].astype(str).to_numpy(dtype=object)]
             ),
             "c": np.concatenate(
                 [np.ones(len(w), dtype=np.int64),
                  np.zeros(len(w), dtype=np.int64)]
             )}
        )
        # c sums to the contact count (each contact counted once, on the
        # src row); actor rows carry the window membership for nunique
        g = a.groupby(["win", "actor"], sort=False).agg(c=("c", "sum"))
        return g.reset_index()

    rows = hash_aggregate(
        contacts.map_batches(base, batch_format="pandas"),
        ["win", "actor"], "c", op="sum", num_parts=num_parts,
    )

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("win", sort=False).agg(
            n_contacts=("c", "sum"), n_actors=("actor", "size")
        )
        return out.reset_index()

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__part"] = (_stable_row_hash(df, ["win"]) % num_parts).astype(
            np.int64
        )
        return df

    out = (
        rows.map_batches(tag, batch_format="pandas")
        .groupby("__part")
        .map_groups(finish, batch_format="pandas")
        .to_pandas()
    )
    if "win" not in out.columns:
        out = pd.DataFrame({c: pd.Series([], dtype=np.int64)
                            for c in ["win", "n_contacts", "n_actors"]})
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("win").reset_index(drop=True)


def actor_jaccard(
    turns: rd.Dataset,
    conv_col: str = "conv_id",
    actor_col: str = "role",
    num_parts: int = 64,
) -> pd.DataFrame:
    """Actor similarity by conversation-set overlap: ``(a, b, shared,
    jaccard_ppm)`` for every co-participating pair.

    Node similarity on the actor×conversation bipartite incidence
    (exact set Jaccard in integer ppm) — the reference NodeSimilarity
    contract re-expressed over conversation membership instead of the
    derived edge neighborhoods.  Composes :func:`co_participation`
    (shared-conversation counts) with per-actor distinct-conversation
    sizes; ``jaccard_ppm = shared·10⁶ // (|A| + |B| − shared)``.
    """
    from graph_data_science_ray.pipelines.agg import hash_aggregate

    shared = co_participation(
        turns, conv_col=conv_col, actor_col=actor_col, num_parts=num_parts
    ).to_pandas()  # ≤ |actors|² — answer-sized

    def sizes(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame(
            {"role": df[actor_col].astype(str),
             "conv": df[conv_col].astype(str)}
        ).drop_duplicates()
        g["one"] = np.int64(1)
        return g

    per = hash_aggregate(
        turns.map_batches(sizes, batch_format="pandas"),
        ["role", "conv"], "one", op="min", num_parts=num_parts,
    )

    def count_convs(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("role", sort=False).size().reset_index(name="nc")
        g["nc"] = g["nc"].astype(np.int64)
        return g

    sz = hash_aggregate(
        per.map_batches(count_convs, batch_format="pandas"),
        ["role"], "nc", op="sum", num_parts=num_parts,
    ).to_pandas()  # actor-cardinality
    nc = dict(zip(sz["role"], sz["nc"].astype(np.int64)))
    if "a" not in shared.columns or not len(shared):
        return pd.DataFrame(
            {"a": pd.Series([], dtype=object),
             "b": pd.Series([], dtype=object),
             "shared": pd.Series([], dtype=np.int64),
             "jaccard_ppm": pd.Series([], dtype=np.int64)}
        )
    n = shared["n"].to_numpy(dtype=np.int64)
    sa = shared["a"].map(nc).to_numpy(dtype=np.int64)
    sb = shared["b"].map(nc).to_numpy(dtype=np.int64)
    out = pd.DataFrame(
        {"a": shared["a"], "b": shared["b"], "shared": n,
         "jaccard_ppm": (n * 1_000_000) // (sa + sb - n)}
    )
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def activity_decay(
    turns: rd.Dataset,
    half_life_days: int = 1,
    scale: int = 1 << 20,
    actor_col: str = "role",
    ts_col: str = "ts",
    num_parts: int = 64,
) -> pd.DataFrame:
    """Recency-weighted activity score with EXACT integer decay.

    Each turn contributes ``scale >> (age_days // half_life_days)``
    (capped at 63 shifts) where age is measured from the corpus-max
    timestamp in whole days — the exponential-decay engagement score
    with the float ``2^(-age/h)`` replaced by a bit shift so every
    contribution and sum is an exact int64 (order-independent,
    SQL-verbatim).  Returns ``(role, score)``.

    Two passes: a scalar distributed max(ts), then one actor-hash
    aggregate of map-side partial sums.
    """
    from graph_data_science_ray.pipelines.agg import hash_aggregate

    mx = turns.select_columns([ts_col]).max(ts_col)
    # Dataset.max returns a pandas Timestamp for timestamp columns
    tmax = int(pd.Timestamp(mx).value // 1000)  # ns -> µs

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        age = (tmax - t) // 86_400_000_000 // int(half_life_days)
        contrib = int(scale) >> np.minimum(age, 63).astype(np.int64)
        g = pd.DataFrame(
            {"role": df[actor_col].astype(str), "score": contrib}
        ).groupby("role", sort=False).agg(score=("score", "sum"))
        return g.reset_index()

    out = hash_aggregate(
        turns.map_batches(partial, batch_format="pandas"),
        ["role"], "score", op="sum", num_parts=num_parts,
    ).to_pandas()
    out["score"] = out["score"].astype(np.int64)
    return out.sort_values("role").reset_index(drop=True)


def actor_lift(
    turns: rd.Dataset,
    conv_col: str = "conv_id",
    actor_col: str = "role",
    num_parts: int = 64,
) -> pd.DataFrame:
    """Co-participation affinity lift: ``(a, b, shared, lift_ppm)``.

    ``lift = P(A∩B) / (P(A)·P(B))`` over conversations, in exact
    integer ppm: ``lift_ppm = shared · N · 10⁶ // (n_A · n_B)`` with N
    the total conversation count — the association-rule lift of the
    market-basket literature applied to conversation casts (> 10⁶ means
    the pair co-occurs more than independence predicts).  Composes
    :func:`co_participation` with per-actor distinct sizes.
    """
    from graph_data_science_ray.pipelines.agg import hash_aggregate

    shared = co_participation(
        turns, conv_col=conv_col, actor_col=actor_col, num_parts=num_parts
    ).to_pandas()

    def dconv(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({"conv": df[conv_col].astype(str)}).drop_duplicates()
        g["one"] = np.int64(1)
        return g

    total = int(
        hash_aggregate(
            turns.map_batches(dconv, batch_format="pandas"),
            ["conv"], "one", op="min", num_parts=num_parts,
        ).count()
    )

    def sizes(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame(
            {"role": df[actor_col].astype(str),
             "conv": df[conv_col].astype(str)}
        ).drop_duplicates()
        g["one"] = np.int64(1)
        return g

    per = hash_aggregate(
        turns.map_batches(sizes, batch_format="pandas"),
        ["role", "conv"], "one", op="min", num_parts=num_parts,
    )

    def count_convs(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("role", sort=False).size().reset_index(name="nc")
        g["nc"] = g["nc"].astype(np.int64)
        return g

    sz = hash_aggregate(
        per.map_batches(count_convs, batch_format="pandas"),
        ["role"], "nc", op="sum", num_parts=num_parts,
    ).to_pandas()
    nc = dict(zip(sz["role"], sz["nc"].astype(np.int64)))
    if "a" not in shared.columns or not len(shared):
        return pd.DataFrame(
            {"a": pd.Series([], dtype=object),
             "b": pd.Series([], dtype=object),
             "shared": pd.Series([], dtype=np.int64),
             "lift_ppm": pd.Series([], dtype=np.int64)}
        )
    n = shared["n"].to_numpy(dtype=np.int64)
    sa = shared["a"].map(nc).to_numpy(dtype=np.int64)
    sb = shared["b"].map(nc).to_numpy(dtype=np.int64)
    # arbitrary-precision Python ints on the answer-sized table: the
    # n·total·10^6 numerator wraps int64 once shared and total reach ~1e6
    tot = int(total)
    lift = np.array(
        [ni * tot * 1_000_000 // (sai * sbi)
         for ni, sai, sbi in zip(n.tolist(), sa.tolist(), sb.tolist())],
        dtype=np.int64,
    )
    out = pd.DataFrame(
        {"a": shared["a"], "b": shared["b"], "shared": n, "lift_ppm": lift}
    )
    return out.sort_values(["a", "b"]).reset_index(drop=True)

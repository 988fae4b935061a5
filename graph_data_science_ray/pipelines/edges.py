"""Transcript → weighted edge-table derivation and dense id mapping.

This is the engine's "graph projection" (the reference's
``gds.graph.project`` native projection,
native-projection/src/main/java/org/neo4j/gds/projection/NativeFactory.java:44):

1. ``derive_turns``   — vectorized actor-key computation per turn
   (``"tool:"+tool`` when tool is set, else ``"role:"+role``; FIXTURES.md §2).
2. ``derive_edges``   — consecutive-turn pairing as a hash join of the slim
   turn table with itself on ``(conv_id, turn_idx) = (conv_id, turn_idx+1)``
   (turn_idx is the dense 0-based position within a conversation, so
   position adjacency == turn_idx adjacency). Self-edges dropped; parallel
   edges aggregated to ``weight = count`` — the reference's
   parallel-edge Aggregation semantics
   (graph-projection-api/src/main/java/org/neo4j/gds/core/Aggregation.java:31-85).
   A map-side partial count runs inside ``map_batches`` before the global
   groupby so the shuffle moves pre-combined rows, not raw pairs.
3. ``IdMap``          — dense bidirectional id mapping, keys sorted
   lexicographically (the reference's dense internal id space,
   core/src/main/java/org/neo4j/gds/api/IdMap.java:34-106). Broadcast once
   via ``ray.put``; lookups are vectorized ``pc.index_in`` hash probes per batch.
4. ``encode_edges``   — map string keys to dense int64 ids; dangling keys
   raise by default (reference
   core/src/main/java/org/neo4j/gds/core/loading/construction/RelationshipsBuilder.java:52-58).
5. ``symmetrize``     — undirected view: union both directions, weights
   summed (reference toUndirected,
   algo/src/main/java/org/neo4j/gds/undirected/ToUndirected.java:48).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Sum

def _actor_key(batch: pa.Table) -> pa.Array:
    tool = batch["tool"].combine_chunks()
    if pa.types.is_null(tool.type):
        tool = tool.cast(pa.string())
    has_tool = pc.and_(tool.is_valid(), pc.not_equal(pc.coalesce(tool, ""), ""))
    tool_key = pc.binary_join_element_wise("tool:", pc.coalesce(tool, ""), "")
    role_key = pc.binary_join_element_wise("role:", batch["role"], "")
    return pc.if_else(has_tool, tool_key, role_key)


def derive_turns(transcripts: rd.Dataset, keep_ts: bool = False) -> rd.Dataset:
    """Slim per-turn table ``(conv_id, turn_idx, actor[, ts])``.

    Drops the text payload immediately — edge derivation never ships it.
    ``keep_ts`` carries the turn timestamp through for property-aggregated
    derivation (``derive_edges_agg``).
    """

    def to_turns(batch: pa.Table) -> pa.Table:
        cols = {
            "conv_id": batch["conv_id"],
            "turn_idx": pc.cast(batch["turn_idx"], pa.int32()),
            "actor": _actor_key(batch),
        }
        if keep_ts:
            cols["ts"] = batch["ts"]
        return pa.table(cols)

    return transcripts.map_batches(to_turns, batch_format="pyarrow")


def _partial_count(batch: pa.Table) -> pa.Table:
    """Map-side combine: per-batch (src, dst) counts before the shuffle."""
    g = batch.group_by(["src", "dst"]).aggregate([("src", "count")])
    return g.rename_columns(["src", "dst", "partial"])


def _check_packable(V: int) -> None:
    """Guard the packed edge key ``src * V + dst`` against int64 overflow.

    Packing requires ``(V-1) * V + (V-1) < 2^63`` i.e. V <= ~3.03e9. Above
    that, callers must use the unpacked string/struct groupby path
    (``derive_edges``).
    """
    if V > 0 and (V - 1) > ((2**63 - 1) - (V - 1)) // V:
        raise OverflowError(
            f"IdMap cardinality {V} too large for packed int64 edge keys; "
            "use derive_edges() (unpacked groupby) instead"
        )


def _auto_join_partitions() -> int:
    """Join shuffle parallelism sized to the cluster.

    The hash-shuffle join spins up one aggregator per partition; asking
    for many more partitions than CPUs deadlocks the pool on a small
    cluster. Join partitioning does NOT affect results (the determinism
    contract lives in the fixed CSR partition count), so size it to the
    cluster.
    """
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return max(2, min(cpus, 64))


@ray.remote(num_cpus=0)
class _BoundaryCollector:
    """Side-channel for block-boundary turns during sort-based pairing.

    Each pairing task registers its batch's first and last rows; after the
    pass, the driver sorts the collected rows by (conv_id, turn_idx) — a
    total order, since that pair is a primary key — and emits the pairs
    that span batch boundaries (a batch's last row immediately followed by
    the next batch's first row of the same conversation). 2 rows per
    batch: negligible at any scale.
    """

    def __init__(self):
        self.rows: list[tuple] = []

    def add(self, recs: list[tuple]) -> None:
        self.rows.extend(recs)

    def get(self) -> list[tuple]:
        return self.rows


def _pair_batch(t: pa.Table, *, collector) -> pa.Table:
    if len(t) == 0:
        return pa.table(
            {"src": pa.array([], pa.string()), "dst": pa.array([], pa.string()),
             "partial": pa.array([], pa.int64())}
        )
    conv = t["conv_id"].to_numpy(zero_copy_only=False)
    actor = t["actor"].to_numpy(zero_copy_only=False)
    idx = t["turn_idx"].to_numpy(zero_copy_only=False)
    n = len(conv)
    recs = [(str(conv[0]), int(idx[0]), str(actor[0]), True, n == 1)]
    if n > 1:
        recs.append((str(conv[-1]), int(idx[-1]), str(actor[-1]), False, True))
    # block until the collector acknowledges: materialize() only waits for
    # map tasks, so a fire-and-forget add could land after the driver reads
    # the collector (dropping boundary edges nondeterministically).
    ray.get(collector.add.remote(recs))
    same = conv[1:] == conv[:-1]
    src = actor[:-1][same]
    dst = actor[1:][same]
    keep = src != dst
    pairs = pa.table(
        {"src": pa.array(src[keep], pa.string()), "dst": pa.array(dst[keep], pa.string())}
    )
    return _partial_count(pairs)


def derive_edges(
    turns: rd.Dataset,
    num_partitions: int | None = None,
    strategy: str = "grouped",
) -> rd.Dataset:
    """Weighted directed edge table ``(src, dst, weight)`` over actor keys.

    ``weight`` = number of consecutive-turn interactions (parallel-edge
    aggregation = COUNT, reference Aggregation semantics).

    ``strategy="grouped"`` (default): conversation-hash partitioning —
    one int-key shuffle, per-group local sort + pairing, NO boundary
    side-channel and no collector actor (a conversation never spans
    groups). The only path that holds at cluster scale.
    ``strategy="sorted"``: global range sort + vectorized within-batch
    adjacency with an actor-held boundary side-channel — kept for parity
    testing; the collector actor serializes one tiny ray.get per batch.
    """
    import functools

    if strategy == "grouped":
        return derive_edges_agg(
            turns, aggregation="count",
            num_partitions=num_partitions or 64,
        )
    collector = _BoundaryCollector.remote()
    partials = turns.sort(["conv_id", "turn_idx"]).map_batches(
        functools.partial(_pair_batch, collector=collector),
        batch_format="pyarrow",
        batch_size=256 * 1024,
    )
    # execute the pass (fills the collector); partials are pre-aggregated
    # per batch, so this materializes at most ~edge-cardinality rows.
    partials = partials.materialize()

    rows = sorted(ray.get(collector.get.remote()))
    ray.kill(collector)
    b_src, b_dst = [], []
    for a, b in zip(rows, rows[1:]):
        # a = (conv, idx, actor, is_first, is_last)
        if a[0] == b[0] and a[4] and b[3] and a[2] != b[2]:
            b_src.append(a[2])
            b_dst.append(b[2])
    if b_src:
        boundary = rd.from_arrow(
            pa.table(
                {
                    "src": pa.array(b_src, pa.string()),
                    "dst": pa.array(b_dst, pa.string()),
                    "partial": pa.array(np.ones(len(b_src), dtype=np.int64)),
                }
            )
        )
        partials = partials.union(boundary)

    from graph_data_science_ray.pipelines.agg import hash_aggregate

    agg = hash_aggregate(partials, ["src", "dst"], "partial", op="sum", out_col="weight")
    return agg.map_batches(
        lambda t: pa.table(
            {
                "src": t["src"],
                "dst": t["dst"],
                "weight": pc.cast(t["weight"], pa.float64()),
            }
        ),
        batch_format="pyarrow",
    )


def derive_edges_agg(
    turns: rd.Dataset, aggregation: str = "count", num_partitions: int = 64
) -> rd.Dataset:
    """Directed edge table with the reference's parallel-edge Aggregation
    modes over the inter-turn GAP property.

    Reference: graph-projection-api/src/main/java/org/neo4j/gds/core/Aggregation.java:31-85
    — SINGLE, SUM, MIN, MAX, COUNT applied to parallel relationships at
    projection time. Here each consecutive-turn interaction is one
    parallel edge whose property is its gap (microseconds between the two
    turns); modes: ``count`` = interaction count (identical to
    ``derive_edges``), ``sum``/``min``/``max`` aggregate the gap,
    ``single`` = deterministic stand-in MIN (the reference's SINGLE
    assumes equal parallel properties; min keeps it storage-order-free).

    ``turns`` must carry ``ts`` (``derive_turns(..., keep_ts=True)``) for
    the gap modes. Conversation-hash partitioning (no global sort, no
    boundary side-channel) — the ``derive_edges_encoded_grouped`` shape.
    """
    agg = aggregation.lower()
    if agg not in ("count", "sum", "min", "max", "single"):
        raise ValueError(f"unknown aggregation {aggregation!r}")
    inner = {"count": "sum", "sum": "sum", "min": "min", "max": "max", "single": "min"}[agg]
    group_op = {"count": "count", "sum": "sum", "min": "min", "max": "max", "single": "min"}[agg]
    import pandas as pd

    def tag_conv(t: pa.Table) -> pa.Table:
        conv = t["conv_id"].to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(np.asarray(conv, dtype=object))
        cols = {
            "conv_id": t["conv_id"],
            "turn_idx": t["turn_idx"],
            "actor": t["actor"],
            "part": pa.array((h % np.uint64(num_partitions)).astype(np.int64)),
        }
        if agg != "count":
            cols["ts"] = t["ts"]
        return pa.table(cols)

    def pair_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        conv = g["conv_id"].to_numpy()
        actor = g["actor"].to_numpy()
        same = conv[1:] == conv[:-1]
        s = actor[:-1][same]
        d = actor[1:][same]
        keep = s != d
        df = pd.DataFrame({"src": s[keep], "dst": d[keep]})
        if agg == "count":
            out = df.groupby(["src", "dst"], sort=False).size().reset_index(name="partial")
            out["partial"] = out["partial"].astype(np.float64)
            return out
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        gap = (ts[1:] - ts[:-1])[same][keep].astype(np.float64)
        df["gap"] = gap
        return (
            df.groupby(["src", "dst"], sort=False)["gap"]
            .agg(group_op)
            .reset_index(name="partial")
        )

    from graph_data_science_ray.pipelines.agg import hash_aggregate

    partials = (
        turns.map_batches(tag_conv, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pair_group, batch_format="pandas")
    )
    out = hash_aggregate(partials, ["src", "dst"], "partial", op=inner, out_col="weight")
    return out.map_batches(
        lambda t: pa.table(
            {"src": t["src"], "dst": t["dst"], "weight": pc.cast(t["weight"], pa.float64())}
        ),
        batch_format="pyarrow",
    )


def derive_edges_join(turns: rd.Dataset, num_partitions: int | None = None) -> rd.Dataset:
    """Join-based variant of ``derive_edges`` (reference implementation).

    Pairs turn i with i+1 via a self hash-join on (conv_id, turn_idx) —
    simple and shuffle-native, but the hash join moves every row twice;
    the sort-based default is ~10x faster at bench scale.
    """
    if num_partitions is None:
        num_partitions = _auto_join_partitions()
    left = turns.map_batches(
        lambda t: pa.table(
            {"conv_id": t["conv_id"], "turn_idx": t["turn_idx"], "src": t["actor"]}
        ),
        batch_format="pyarrow",
    )
    # right side re-keyed to (conv_id, turn_idx - 1): joining left.turn_idx ==
    # right.turn_idx-1 pairs turn i with turn i+1.
    right = turns.map_batches(
        lambda t: pa.table(
            {
                "conv_id": t["conv_id"],
                "turn_idx": pc.cast(pc.subtract(t["turn_idx"], 1), pa.int32()),
                "dst": t["actor"],
            }
        ),
        batch_format="pyarrow",
    )
    joined = left.join(
        right,
        join_type="inner",
        num_partitions=num_partitions,
        on=("conv_id", "turn_idx"),
    )
    pairs = joined.map_batches(
        lambda t: _partial_count(
            t.filter(pc.not_equal(t["src"], t["dst"])).select(["src", "dst"])
        ),
        batch_format="pyarrow",
    )
    agg = pairs.groupby(["src", "dst"]).aggregate(Sum("partial", alias_name="weight"))
    return agg.map_batches(
        lambda t: pa.table(
            {
                "src": t["src"],
                "dst": t["dst"],
                "weight": pc.cast(t["weight"], pa.float64()),
            }
        ),
        batch_format="pyarrow",
    )


class IdMap:
    """Dense id mapping: sorted distinct actor keys ↔ ``[0, V)``.

    The key table is collected to the driver and broadcast via ``ray.put``
    — actor keys are roles/tools, orders of magnitude fewer than turns.
    (The fully distributed variant — sort + per-block offset assignment —
    is the documented scale path; the broadcast table itself stays
    valid because lookups only need the sorted key array.)
    """

    def __init__(self, keys: np.ndarray):
        self.keys = np.asarray(keys)  # sorted unicode array
        self._ref = None
        self._arrow_ref = None

    @classmethod
    def from_turns(cls, turns: rd.Dataset) -> "IdMap":
        """Distinct actors via a shuffle-free unique tree: per-batch
        ``np.unique`` partials (≤ V rows per block), a non-shuffle
        ``repartition`` coalesce + second unique pass, then one driver
        unique over ≤ 8·V keys. No sort/all-to-all at all — an order of
        magnitude faster than ``Dataset.unique`` on the raw turn stream
        and ~3x faster than the hash-partitioned distinct it replaces
        (the actor vocabulary V ≪ turns by the IdMap contract)."""

        def uniq(t: pa.Table) -> pa.Table:
            # Arrow hash-unique: ~9x the throughput of np.unique over a
            # python-object array (no U-dtype materialization per batch)
            return pa.table({"actor": pc.cast(pc.unique(t["actor"]), pa.string())})

        tables = ray.get(
            (
                turns.map_batches(uniq, batch_format="pyarrow")
                .repartition(8)
                .map_batches(uniq, batch_format="pyarrow")
            ).to_arrow_refs()
        )
        chunks = [
            t["actor"].combine_chunks()
            for t in tables
            if t.num_rows and "actor" in t.schema.names
        ]
        if not chunks:
            return cls(np.zeros(0, dtype="U1"))
        # final combine in Arrow: hash-unique + sort over the <=8V partial
        # rows, then ONE U-dtype conversion of the V-sized vocabulary —
        # np.unique over an 8V object array was the driver-side choke
        # (measured 13.5s -> ~3s for the whole build at V=1M)
        u = pc.unique(pa.concat_arrays(chunks))
        u = u.take(pc.sort_indices(u))
        return cls(np.asarray(u.to_numpy(zero_copy_only=False), dtype="U"))

    @classmethod
    def from_edges(cls, edges: rd.Dataset) -> "IdMap":
        s = set(edges.unique("src"))
        s.update(edges.unique("dst"))
        return cls(np.sort(np.asarray(list(s), dtype="U")))

    def __len__(self) -> int:
        return len(self.keys)

    @property
    def ref(self):
        if self._ref is None:
            self._ref = ray.put(self.keys)
        return self._ref

    @property
    def arrow_ref(self):
        """Broadcast key table as a ``pa.Array`` for ``pc.index_in``
        encoding — position in the sorted key array IS the dense id."""
        if self._arrow_ref is None:
            self._arrow_ref = ray.put(pa.array(self.keys.astype(object), pa.string()))
        return self._arrow_ref

    def to_ids(self, keys: np.ndarray) -> np.ndarray:
        ids = np.searchsorted(self.keys, keys)
        ids = np.minimum(ids, len(self.keys) - 1)
        if not (self.keys[ids] == keys).all():
            missing = np.asarray(keys)[self.keys[ids] != keys][:5]
            raise KeyError(f"dangling actor keys not in IdMap, e.g. {missing!r}")
        return ids.astype(np.int64)

    def to_keys(self, ids: np.ndarray) -> np.ndarray:
        return self.keys[np.asarray(ids, dtype=np.int64)]

    def save(self, path: str) -> None:
        import pyarrow.parquet as pq

        pq.write_table(
            pa.table({"key": pa.array(self.keys.astype(object), pa.string()),
                      "id": pa.array(np.arange(len(self.keys), dtype=np.int64))}),
            path,
        )

    @classmethod
    def load(cls, path: str) -> "IdMap":
        import pyarrow.parquet as pq

        t = pq.read_table(path)
        return cls(np.asarray(t["key"].to_numpy(zero_copy_only=False), dtype="U"))


class _EncodeEdges:
    """Actor-pool stage: broadcast key table fetched once per actor.

    Lookup is ``pc.index_in`` against the sorted key array (position ==
    dense id) — an Arrow hash probe, ~7x the throughput of the U-dtype
    searchsorted it replaces."""

    def __init__(self, keys_ref, skip_dangling: bool):
        self.keys = ray.get(keys_ref)  # pa.Array of sorted keys
        self.skip_dangling = skip_dangling

    def __call__(self, batch: pa.Table) -> pa.Table:
        sidx = pc.index_in(batch["src"], value_set=self.keys)
        didx = pc.index_in(batch["dst"], value_set=self.keys)
        if sidx.null_count or didx.null_count:
            smask = pc.is_valid(sidx).to_numpy(zero_copy_only=False)
            dmask = pc.is_valid(didx).to_numpy(zero_copy_only=False)
            ok = smask & dmask
            if not self.skip_dangling:
                src = batch["src"].to_numpy(zero_copy_only=False)
                dst = batch["dst"].to_numpy(zero_copy_only=False)
                bad = np.concatenate([src[~smask], dst[~dmask]])
                raise KeyError(f"dangling edge endpoints, e.g. {bad[:5]!r}")
            sel = np.flatnonzero(ok)
            batch = batch.take(pa.array(sel))
            sidx = pc.index_in(batch["src"], value_set=self.keys)
            didx = pc.index_in(batch["dst"], value_set=self.keys)
        return pa.table(
            {
                "src": sidx.cast(pa.int64()),
                "dst": didx.cast(pa.int64()),
                "weight": pc.cast(batch["weight"], pa.float64()),
            }
        )


def encode_edges(
    edges: rd.Dataset, idmap: IdMap, skip_dangling: bool = False, concurrency: int | None = None
) -> rd.Dataset:
    """Map ``(src, dst)`` actor keys to dense int64 ids via broadcast lookup."""
    import functools

    ref = idmap.arrow_ref
    return edges.map_batches(
        functools.partial(_encode_batch, keys_ref=ref, skip_dangling=skip_dangling),
        batch_format="pyarrow",
    )


def _encode_batch(batch: pa.Table, *, keys_ref, skip_dangling: bool) -> pa.Table:
    enc = _EncodeEdges(keys_ref, skip_dangling)
    return enc(batch)


@ray.remote
def _block_rows(t: pa.Table) -> int:
    return t.num_rows


@ray.remote
def _assign_block_ids(t: pa.Table, offset: int) -> pa.Table:
    return pa.table(
        {
            "actor": t["actor"],
            "id": pa.array(
                np.arange(offset, offset + t.num_rows, dtype=np.int64)
            ),
        }
    )


def idmap_table(turns: rd.Dataset) -> rd.Dataset:
    """Fully distributed IdMap: an ``(actor, id)`` Dataset with dense ids
    ``[0, V)`` in sorted-key order — the SAME numbering as
    ``IdMap.from_turns`` (both sort the distinct keys), but the key
    vocabulary never lands on the driver: per-batch ``np.unique``
    partials → hash-partitioned distinct → distributed range sort →
    per-block offsets from a prefix sum over P block COUNTS (the only
    thing the driver sees). This is the scale path when the actor
    vocabulary itself outgrows a worker heap; pair with
    ``encode_edges_distributed``. ``IdMap.from_turns`` + broadcast
    ``encode_edges`` stays the faster choice while V ≪ turns.
    """
    from graph_data_science_ray.pipelines.agg import hash_distinct

    def uniq(t: pa.Table) -> pa.Table:
        return pa.table(
            {"actor": pa.array(
                np.unique(
                    np.asarray(t["actor"].to_numpy(zero_copy_only=False))
                ).astype(object),
                pa.string(),
            )}
        )

    distinct = hash_distinct(
        turns.map_batches(uniq, batch_format="pyarrow"), ["actor"]
    )
    refs = distinct.sort("actor").materialize().to_arrow_refs()
    counts = ray.get([_block_rows.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(counts)])
    out = [
        _assign_block_ids.remote(r, int(offsets[i]))
        for i, r in enumerate(refs)
        if counts[i]
    ]
    if not out:
        return rd.from_arrow(
            pa.table({"actor": pa.array([], pa.string()),
                      "id": pa.array([], pa.int64())})
        )
    return rd.from_arrow_refs(out)


def encode_edges_distributed(
    edges: rd.Dataset, ids: rd.Dataset, num_parts: int | None = None
) -> rd.Dataset:
    """Map ``(src, dst)`` actor keys to dense ids via two hash-joins
    against an ``idmap_table`` Dataset — no key broadcast anywhere.

    The distributed counterpart of ``encode_edges``: identical output
    for the same vocabulary (ids are assigned in sorted-key order by
    both). Dangling endpoints (keys absent from ``ids``) drop silently
    (inner-join semantics = ``skip_dangling=True``); run with the full
    vocabulary when that must be an error. Edge keys shuffle twice
    (once per endpoint) — that is the price of never materializing the
    vocabulary; prefer broadcast ``encode_edges`` while the IdMap fits
    a worker heap.
    """
    from graph_data_science_ray.pipelines.agg import hash_join

    nparts = num_parts or _auto_join_partitions()
    edge_schema = pa.schema(
        [("src", pa.string()), ("dst", pa.string()), ("weight", pa.float64())]
    )
    edges = edges.map_batches(
        lambda t: pa.table(
            {"src": pc.cast(t["src"], pa.string()),
             "dst": pc.cast(t["dst"], pa.string()),
             "weight": pc.cast(t["weight"], pa.float64())}
        ),
        batch_format="pyarrow",
    )
    src_ids = ids.map_batches(
        lambda t: pa.table({"src": t["actor"], "src_id": t["id"]}),
        batch_format="pyarrow",
    )
    dst_ids = ids.map_batches(
        lambda t: pa.table({"dst": t["actor"], "dst_id": t["id"]}),
        batch_format="pyarrow",
    )
    joined = hash_join(
        edges, src_ids, on=["src"], num_parts=nparts,
        left_schema=edge_schema,
        right_schema=pa.schema([("src", pa.string()), ("src_id", pa.int64())]),
    )
    mid = pa.schema(
        [("src", pa.string()), ("dst", pa.string()),
         ("weight", pa.float64()), ("src_id", pa.int64())]
    )
    joined = hash_join(
        joined, dst_ids, on=["dst"], num_parts=nparts,
        left_schema=mid,
        right_schema=pa.schema([("dst", pa.string()), ("dst_id", pa.int64())]),
    )
    return joined.map_batches(
        lambda t: pa.table(
            {"src": t["src_id"], "dst": t["dst_id"],
             "weight": pc.cast(t["weight"], pa.float64())}
        ),
        batch_format="pyarrow",
    )


def edges_from_expressions(
    rows: rd.Dataset,
    src: str,
    dst: str,
    weight: str | None = None,
    where: str | None = None,
    aggregation: str = "sum",
    num_partitions: int = 64,
) -> rd.Dataset:
    """Cypher-style projection: an ``(src, dst, weight)`` edge table from
    ARBITRARY rows via vectorized expressions.

    Reference: the Cypher/arbitrary-rows projection surface
    (legacy ``gds.graph.project.cypher`` /
    ``core/.../GraphStoreFactory`` relationship queries) — the user
    supplies per-row expressions for the endpoints, the weight and an
    optional row filter instead of pre-shaped columns. Expressions use
    pandas ``eval``/``query`` syntax evaluated batch-at-a-time (python
    engine: arithmetic, comparisons, string concat, method-free column
    refs), so nothing leaves the vectorized path. Parallel rows mapping
    to the same (src, dst) combine with ``aggregation`` in
    {sum, min, max, count, single} (Aggregation.java:31-85; ``single`` =
    deterministic min). Compose with ``IdMap.from_edges`` +
    ``encode_edges`` + ``GraphStore.project`` for string endpoints, or
    project directly when the expressions yield dense ints.
    """
    agg = aggregation.lower()
    if agg not in ("sum", "min", "max", "count", "single"):
        raise ValueError(f"unknown aggregation {aggregation!r}")
    inner = {"sum": "sum", "min": "min", "max": "max",
             "count": "sum", "single": "min"}[agg]

    import pandas as pd

    def xform(df: pd.DataFrame) -> pd.DataFrame:
        if where is not None:
            df = df.query(where, engine="python")
        s = df.eval(src, engine="python") if src not in df.columns else df[src]
        d = df.eval(dst, engine="python") if dst not in df.columns else df[dst]
        if agg == "count" or weight is None:
            w = np.ones(len(df), dtype=np.float64)
        else:
            w = (df.eval(weight, engine="python")
                 if weight not in df.columns else df[weight])
        out = pd.DataFrame({"src": np.asarray(s), "dst": np.asarray(d),
                            "partial": np.asarray(w, dtype=np.float64)})
        # map-side combine before the shuffle
        return (
            out.groupby(["src", "dst"], sort=False)["partial"]
            .agg(inner).reset_index()
        )

    from graph_data_science_ray.pipelines.agg import hash_aggregate

    partials = rows.map_batches(xform, batch_format="pandas")
    out = hash_aggregate(
        partials, ["src", "dst"], "partial", op=inner, out_col="weight"
    )
    return out.map_batches(
        lambda t: pa.table(
            {"src": t["src"], "dst": t["dst"],
             "weight": pc.cast(t["weight"], pa.float64())}
        ),
        batch_format="pyarrow",
    ).repartition(num_partitions)


def symmetrize(
    edges: rd.Dataset, num_partitions: int = 32, aggregation: str = "sum"
) -> rd.Dataset:
    """Undirected view: union of both directions, weights aggregated per pair.

    ``(u,v)`` and ``(v,u)`` collapse into two symmetric rows with
    ``weight = agg(w_uv, w_vu)``; ``aggregation`` in {sum, min, max}
    (reference Aggregation.java modes at undirected projection; sum is
    the default the rest of the engine assumes). Works on encoded (int64)
    edge tables.
    """
    op = aggregation.lower()
    if op not in ("sum", "min", "max"):
        raise ValueError(f"unknown aggregation {aggregation!r}")
    fwd = edges.select_columns(["src", "dst", "weight"])
    rev = edges.map_batches(
        lambda t: pa.table({"src": t["dst"], "dst": t["src"], "weight": t["weight"]}),
        batch_format="pyarrow",
    )
    from graph_data_science_ray.pipelines.agg import hash_aggregate

    both = fwd.union(rev)
    pre = both.map_batches(
        lambda t: t.group_by(["src", "dst"]).aggregate([("weight", op)]).rename_columns(
            ["src", "dst", "partial"]
        ),
        batch_format="pyarrow",
    )
    agg = hash_aggregate(pre, ["src", "dst"], "partial", op=op, out_col="weight")
    out = agg.map_batches(
        lambda t: pa.table(
            {"src": t["src"], "dst": t["dst"], "weight": pc.cast(t["weight"], pa.float64())}
        ),
        batch_format="pyarrow",
    )
    # coalesce: the union + shuffle pipeline otherwise leaves hundreds of
    # tiny blocks, and every downstream map over this long-lived table
    # pays per-task overhead instead of compute (measured 8x on the
    # degree aggregate at bench scale)
    return out.repartition(num_partitions)


def derive_edges_encoded(
    turns: rd.Dataset, idmap: IdMap, num_partitions: int = 64
) -> rd.Dataset:
    """Fast path: encode actor ids BEFORE pairing so the weight
    aggregation shuffles packed int64 keys instead of string pairs.

    Same semantics and output as ``encode_edges(derive_edges(turns), idmap)``
    (src:int64, dst:int64, weight:float64); measured ~2x faster end-to-end
    at 50M+ turns (string-pair groupby was the bottleneck).
    """
    import functools

    from graph_data_science_ray._util import splitmix64

    V = len(idmap)
    _check_packable(V)
    keys_ref = idmap.arrow_ref

    def add_ids(t: pa.Table) -> pa.Table:
        ka = ray.get(keys_ref)
        idx = pc.index_in(t["actor"], value_set=ka)
        if idx.null_count:
            raise KeyError("dangling actor key during encoded derivation")
        return pa.table(
            {"conv_id": t["conv_id"], "turn_idx": t["turn_idx"],
             "aid": idx.cast(pa.int64())}
        )

    collector = _BoundaryCollector.remote()

    def pair(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"key": pa.array([], pa.int64()),
                             "partial": pa.array([], pa.int64())})
        conv = t["conv_id"].to_numpy(zero_copy_only=False)
        aid = t["aid"].to_numpy(zero_copy_only=False)
        idx = t["turn_idx"].to_numpy(zero_copy_only=False)
        n = len(conv)
        recs = [(str(conv[0]), int(idx[0]), int(aid[0]), True, n == 1)]
        if n > 1:
            recs.append((str(conv[-1]), int(idx[-1]), int(aid[-1]), False, True))
        # synchronous add: see _pair_batch — delivery must precede the
        # driver's collector read after materialize().
        ray.get(collector.add.remote(recs))
        same = conv[1:] == conv[:-1]
        s = aid[:-1][same]
        d = aid[1:][same]
        keep = s != d
        key = s[keep] * V + d[keep]
        uniq, counts = np.unique(key, return_counts=True)
        return pa.table({"key": pa.array(uniq), "partial": pa.array(counts.astype(np.int64))})

    partials = (
        turns.map_batches(add_ids, batch_format="pyarrow")
        .sort(["conv_id", "turn_idx"])
        .map_batches(pair, batch_format="pyarrow", batch_size=256 * 1024)
        .materialize()
    )
    rows = sorted(ray.get(collector.get.remote()))
    ray.kill(collector)
    b_keys = []
    for a, b in zip(rows, rows[1:]):
        if a[0] == b[0] and a[4] and b[3] and a[2] != b[2]:
            b_keys.append(a[2] * V + b[2])
    if b_keys:
        partials = partials.union(
            rd.from_arrow(
                pa.table(
                    {"key": pa.array(np.asarray(b_keys, dtype=np.int64)),
                     "partial": pa.array(np.ones(len(b_keys), dtype=np.int64))}
                )
            )
        )

    def tag(t: pa.Table) -> pa.Table:
        part = (splitmix64(t["key"].to_numpy(zero_copy_only=False).astype(np.uint64))
                % np.uint64(num_partitions)).astype(np.int64)
        return t.append_column("part", pa.array(part))

    def combine(g):
        k = g["key"].to_numpy(dtype=np.int64)
        w = g["partial"].to_numpy(dtype=np.int64)
        order = np.argsort(k, kind="stable")
        k, w = k[order], w[order]
        nr = np.empty(len(k), dtype=bool)
        nr[0] = True
        nr[1:] = k[1:] != k[:-1]
        st = np.flatnonzero(nr)
        ku = k[st]
        wu = np.add.reduceat(w, st)
        import pandas as pd

        return pd.DataFrame(
            {"src": ku // V, "dst": ku % V, "weight": wu.astype(np.float64)}
        )

    return (
        partials.map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(combine, batch_format="pandas")
    )




def derive_edges_encoded_grouped(
    turns: rd.Dataset, idmap: IdMap, num_partitions: int = 64,
    conv_key: str = "hash128",
) -> rd.Dataset:
    """Shuffle-by-conversation variant of ``derive_edges_encoded``.

    Instead of a global range sort, conversations hash-partition into
    ``num_partitions`` groups (one int-key shuffle); each group sorts
    locally and pairs — no cross-block boundary handling at all, because
    a conversation never spans groups. The winner at scale when the
    global sort dominates.

    ``conv_key="hash128"`` (default) replaces the conv_id STRING in the
    shuffle with two independent 64-bit siphashes: fewer payload bytes
    per turn row, and the per-group sort becomes a numeric ``lexsort``
    instead of an object-string mergesort. Pairing only uses within-conv
    adjacency, so the edge multiset — and the output digest — is
    identical as long as no two conversations collide in BOTH hashes
    (2^-128 per pair; with 10^10 conversations the corpus-level
    collision odds are ~10^-19). ``conv_key="string"`` keeps the exact
    string grouping (parity-tested against the default).
    """
    import pandas as pd

    from graph_data_science_ray._util import splitmix64

    V = len(idmap)
    _check_packable(V)
    keys_ref = idmap.arrow_ref
    use_hash = conv_key == "hash128"
    _H2_KEY = "8f4e9b2a1c6d3e7f"  # second independent siphash key

    def add_ids(t: pa.Table) -> pa.Table:
        # hash lookup into the sorted key array (position == dense id):
        # ~7x the per-batch throughput of U-dtype searchsorted
        ka = ray.get(keys_ref)
        idx = pc.index_in(t["actor"], value_set=ka)
        if idx.null_count:
            raise KeyError("dangling actor key during encoded derivation")
        conv = np.asarray(t["conv_id"].to_numpy(zero_copy_only=False), dtype=object)
        h = pd.util.hash_array(conv)
        part = (h % np.uint64(num_partitions)).astype(np.int32)
        # int32 aid/part when they fit: the conv-hash shuffle moves every
        # turn row, so narrower columns cut its payload ~20%
        aid_type = pa.int32() if V < 2**31 else pa.int64()
        cols = {}
        if use_hash:
            cols["c1"] = pa.array(h.view(np.int64))
            cols["c2"] = pa.array(pd.util.hash_array(conv, hash_key=_H2_KEY).view(np.int64))
        else:
            cols["conv_id"] = t["conv_id"]
        cols["turn_idx"] = t["turn_idx"]
        cols["aid"] = idx.cast(aid_type)
        cols["part"] = pa.array(part)
        return pa.table(cols)

    def pair_group_hash(g: pd.DataFrame) -> pd.DataFrame:
        c1 = g["c1"].to_numpy(dtype=np.int64)
        c2 = g["c2"].to_numpy(dtype=np.int64)
        ti = g["turn_idx"].to_numpy(dtype=np.int64)
        aid = g["aid"].to_numpy(dtype=np.int64)
        order = np.lexsort((ti, c2, c1))
        c1, c2, aid = c1[order], c2[order], aid[order]
        same = (c1[1:] == c1[:-1]) & (c2[1:] == c2[:-1])
        s = aid[:-1][same]
        d = aid[1:][same]
        keep = s != d
        key = s[keep] * V + d[keep]
        uniq, counts = np.unique(key, return_counts=True)
        return pd.DataFrame({"key": uniq, "partial": counts.astype(np.int32)})

    def pair_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        conv = g["conv_id"].to_numpy()
        aid = g["aid"].to_numpy(dtype=np.int64)
        same = conv[1:] == conv[:-1]
        s = aid[:-1][same]
        d = aid[1:][same]
        keep = s != d
        key = s[keep] * V + d[keep]
        uniq, counts = np.unique(key, return_counts=True)
        # partial counts are per-group multiplicities — int32 always fits
        return pd.DataFrame({"key": uniq, "partial": counts.astype(np.int32)})

    partials = (
        turns.map_batches(add_ids, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pair_group_hash if use_hash else pair_group,
                    batch_format="pandas")
    )

    def tag(t: pa.Table) -> pa.Table:
        part = (
            splitmix64(t["key"].to_numpy(zero_copy_only=False).astype(np.uint64))
            % np.uint64(num_partitions)
        ).astype(np.int32)
        return t.append_column("kpart", pa.array(part))

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        k = g["key"].to_numpy(dtype=np.int64)
        w = g["partial"].to_numpy(dtype=np.int64)
        order = np.argsort(k, kind="stable")
        k, w = k[order], w[order]
        nr = np.empty(len(k), dtype=bool)
        nr[0] = True
        nr[1:] = k[1:] != k[:-1]
        st = np.flatnonzero(nr)
        ku = k[st]
        wu = np.add.reduceat(w, st)
        return pd.DataFrame(
            {"src": ku // V, "dst": ku % V, "weight": wu.astype(np.float64)}
        )

    return (
        partials.map_batches(tag, batch_format="pyarrow")
        .groupby("kpart")
        .map_groups(combine, batch_format="pandas")
    )


_H2_HASH_KEY = "8f4e9b2a1c6d3e7f"


def _conv_runs(t: pa.Table) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Maximal same-conversation runs in row order, WITHOUT hashing every
    row: adjacent equality is one vectorized Arrow string compare, and
    only the |runs| run-start conversations are hashed (two independent
    64-bit siphashes, the ``hash128`` convention) — on contiguous inputs
    runs ≈ conversations, so this skips the per-turn hashing that
    dominates the grouped path. Returns ``(starts, h1, h2)`` with the
    hashes per RUN."""
    import pandas as pd

    conv = t["conv_id"].combine_chunks() if isinstance(
        t["conv_id"], pa.ChunkedArray
    ) else t["conv_id"]
    n = len(conv)
    if n == 0:
        return (np.zeros(0, dtype=np.int64),) * 3
    new = np.empty(n, dtype=bool)
    new[0] = True
    if n > 1:
        eq = pc.equal(conv.slice(1), conv.slice(0, n - 1))
        new[1:] = ~np.asarray(eq.to_numpy(zero_copy_only=False), dtype=bool)
    starts = np.flatnonzero(new)
    heads = np.asarray(
        conv.take(pa.array(starts)).to_numpy(zero_copy_only=False), dtype=object
    )
    h1 = pd.util.hash_array(heads).view(np.int64)
    h2 = pd.util.hash_array(heads, hash_key=_H2_HASH_KEY).view(np.int64)
    return starts, h1, h2


def derive_edges_encoded_contiguous(
    turns: rd.Dataset, idmap: IdMap, num_partitions: int = 64
) -> rd.Dataset:
    """Zero-turn-shuffle pairing for CONVERSATION-CONTIGUOUS inputs.

    Most real transcript dumps are written one conversation at a time, so
    each block already holds every conversation as one (or, at block
    boundaries, a few) turn-sorted contiguous run(s). This path pairs
    adjacent rows inside each run entirely map-side — the |turns|-row
    conversation-hash shuffle that dominates ``derive_edges_encoded_grouped``
    never happens — and emits one small PIECE row per run
    ``(conv, first/last turn_idx, first/last actor id)``. A
    |conversations|-cardinality groupby over the pieces then does two
    things at once: it EXACTLY verifies the contiguity assumption (every
    conversation's piece turn ranges must be pairwise disjoint and each
    run turn-sorted — violations raise, nothing is silently wrong) and it
    recovers the cross-block pairs (last row of one piece -> first row of
    the ti-next piece). The edge multiset is byte-identical to the
    grouped path's.

    Shuffle volume: |conversations| piece rows + edge-key partials vs the
    grouped path's |turns| rows. Raises ``ValueError`` when the input is
    not contiguous — use ``derive_edges_encoded_auto`` to probe first.
    """
    V = len(idmap)
    _check_packable(V)
    keys_ref = idmap.arrow_ref

    def pair_local(t: pa.Table) -> pa.Table:
        """Within-run adjacent pairs, pre-aggregated — STREAMS straight
        into the edge-key combine (no intermediate materialization)."""
        if len(t) == 0:
            return pa.table(
                {"key": pa.array([], pa.int64()),
                 "partial": pa.array([], pa.int32())}
            )
        ka = ray.get(keys_ref)
        idx = pc.index_in(t["actor"], value_set=ka)
        if idx.null_count:
            raise KeyError("dangling actor key during encoded derivation")
        aid = np.asarray(idx.cast(pa.int64()).to_numpy(zero_copy_only=False))
        ti = np.asarray(
            t["turn_idx"].to_numpy(zero_copy_only=False), dtype=np.int64
        )
        n = len(aid)
        conv = t["conv_id"].combine_chunks() if isinstance(
            t["conv_id"], pa.ChunkedArray
        ) else t["conv_id"]
        same = np.ones(max(n - 1, 0), dtype=bool)
        if n > 1:
            eq = pc.equal(conv.slice(1), conv.slice(0, n - 1))
            same = np.asarray(eq.to_numpy(zero_copy_only=False), dtype=bool)
            if np.any(same & (ti[1:] <= ti[:-1])):
                raise ValueError(
                    "turns are not turn_idx-sorted within a conversation "
                    "run; input is not conversation-contiguous — use "
                    "derive_edges_encoded_grouped"
                )
        s = aid[:-1][same]
        d = aid[1:][same]
        keep = s != d
        key = s[keep] * V + d[keep]
        uniq, counts = np.unique(key, return_counts=True)
        return pa.table(
            {"key": pa.array(uniq), "partial": pa.array(counts.astype(np.int32))}
        )

    def pieces_of(t: pa.Table) -> pa.Table:
        """One row per conversation run: the boundary pass (separate,
        cheap second scan of the plasma-resident turns — string equality
        plus |runs| hashes, no per-turn hashing, no turn-row shuffle)."""
        if len(t) == 0:
            return pa.table(
                {
                    "c1": pa.array([], pa.int64()),
                    "c2": pa.array([], pa.int64()),
                    "fti": pa.array([], pa.int64()),
                    "faid": pa.array([], pa.int64()),
                    "lti": pa.array([], pa.int64()),
                    "laid": pa.array([], pa.int64()),
                    "gpart": pa.array([], pa.int32()),
                }
            )
        ka = ray.get(keys_ref)
        ti = np.asarray(
            t["turn_idx"].to_numpy(zero_copy_only=False), dtype=np.int64
        )
        n = len(ti)
        starts, c1, c2 = _conv_runs(t)
        ends = np.append(starts[1:], n) - 1
        bnd = np.union1d(starts, ends)
        head_pos = np.searchsorted(bnd, starts)
        end_pos = np.searchsorted(bnd, ends)
        bidx = pc.index_in(
            pc.take(t["actor"], pa.array(bnd)), value_set=ka
        )
        if bidx.null_count:
            raise KeyError("dangling actor key during encoded derivation")
        baid = np.asarray(bidx.cast(pa.int64()).to_numpy(zero_copy_only=False))
        gpart = (c1.astype(np.uint64) % np.uint64(num_partitions)).astype(
            np.int32
        )
        return pa.table(
            {
                "c1": pa.array(c1),
                "c2": pa.array(c2),
                "fti": pa.array(ti[starts]),
                "faid": pa.array(baid[head_pos]),
                "lti": pa.array(ti[ends]),
                "laid": pa.array(baid[end_pos]),
                "gpart": pa.array(gpart),
            }
        )

    import pandas as pd

    def cross_pairs(g: pd.DataFrame) -> pd.DataFrame:
        c1 = g["c1"].to_numpy(dtype=np.int64)
        c2 = g["c2"].to_numpy(dtype=np.int64)
        fti = g["fti"].to_numpy(dtype=np.int64)
        faid = g["faid"].to_numpy(dtype=np.int64)
        lti = g["lti"].to_numpy(dtype=np.int64)
        laid = g["laid"].to_numpy(dtype=np.int64)
        order = np.lexsort((fti, c2, c1))
        c1, c2, fti, faid, lti, laid = (
            a[order] for a in (c1, c2, fti, faid, lti, laid)
        )
        same = (c1[1:] == c1[:-1]) & (c2[1:] == c2[:-1])
        if np.any(same & (fti[1:] <= lti[:-1])):
            raise ValueError(
                "overlapping conversation pieces across blocks; input is "
                "not conversation-contiguous — use derive_edges_encoded_grouped"
            )
        s = laid[:-1][same]
        d = faid[1:][same]
        keep = s != d
        key = s[keep] * V + d[keep]
        uniq, counts = np.unique(key, return_counts=True)
        return pd.DataFrame({"key": uniq, "partial": counts.astype(np.int32)})

    cross = (
        turns.map_batches(pieces_of, batch_format="pyarrow", batch_size=None)
        .groupby("gpart")
        .map_groups(cross_pairs, batch_format="pandas")
    )
    partials = turns.map_batches(
        pair_local, batch_format="pyarrow", batch_size=None
    ).union(cross)

    from graph_data_science_ray._util import splitmix64

    def tag(t: pa.Table) -> pa.Table:
        part = (
            splitmix64(t["key"].to_numpy(zero_copy_only=False).astype(np.uint64))
            % np.uint64(num_partitions)
        ).astype(np.int32)
        return t.append_column("kpart", pa.array(part))

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        k = g["key"].to_numpy(dtype=np.int64)
        w = g["partial"].to_numpy(dtype=np.int64)
        order = np.argsort(k, kind="stable")
        k, w = k[order], w[order]
        nr = np.empty(len(k), dtype=bool)
        nr[0] = True
        nr[1:] = k[1:] != k[:-1]
        st = np.flatnonzero(nr)
        ku = k[st]
        wu = np.add.reduceat(w, st)
        return pd.DataFrame(
            {"src": ku // V, "dst": ku % V, "weight": wu.astype(np.float64)}
        )

    return (
        partials.map_batches(tag, batch_format="pyarrow")
        .groupby("kpart")
        .map_groups(combine, batch_format="pandas")
    )


def probe_conv_contiguity(turns: rd.Dataset, num_partitions: int = 64) -> bool:
    """EXACT (not sampled) contiguity probe over (conv_id, turn_idx) only.

    True iff every conversation's rows form turn-sorted contiguous runs
    within blocks whose turn ranges are globally pairwise disjoint — the
    precondition of ``derive_edges_encoded_contiguous``. One column-pruned
    scan plus a |conversations|-cardinality groupby; no turn-row shuffle.
    """
    import pandas as pd

    def pieces(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    "c1": pa.array([], pa.int64()),
                    "c2": pa.array([], pa.int64()),
                    "fti": pa.array([], pa.int64()),
                    "lti": pa.array([], pa.int64()),
                    "ok": pa.array([], pa.int8()),
                    "gpart": pa.array([], pa.int32()),
                }
            )
        ti = np.asarray(
            t["turn_idx"].to_numpy(zero_copy_only=False), dtype=np.int64
        )
        n = len(ti)
        starts, c1, c2 = _conv_runs(t)
        ends = np.append(starts[1:], n) - 1
        ok = 1
        if n > 1:
            same = np.ones(n - 1, dtype=bool)
            same[starts[1:] - 1] = False
            if np.any(same & (ti[1:] <= ti[:-1])):
                ok = 0
        gpart = (c1.astype(np.uint64) % np.uint64(num_partitions)).astype(
            np.int32
        )
        return pa.table(
            {
                "c1": pa.array(c1),
                "c2": pa.array(c2),
                "fti": pa.array(ti[starts]),
                "lti": pa.array(ti[ends]),
                "ok": pa.array(np.full(len(starts), ok, dtype=np.int8)),
                "gpart": pa.array(gpart),
            }
        )

    def check(g: pd.DataFrame) -> pd.DataFrame:
        if not int(g["ok"].min()):
            return pd.DataFrame({"ok": np.array([0], dtype=np.int8)})
        c1 = g["c1"].to_numpy(dtype=np.int64)
        c2 = g["c2"].to_numpy(dtype=np.int64)
        fti = g["fti"].to_numpy(dtype=np.int64)
        lti = g["lti"].to_numpy(dtype=np.int64)
        order = np.lexsort((fti, c2, c1))
        c1, c2, fti, lti = (a[order] for a in (c1, c2, fti, lti))
        same = (c1[1:] == c1[:-1]) & (c2[1:] == c2[:-1])
        bad = np.any(same & (fti[1:] <= lti[:-1]))
        return pd.DataFrame({"ok": np.array([0 if bad else 1], dtype=np.int8)})

    flags = (
        turns.select_columns(["conv_id", "turn_idx"])
        .map_batches(pieces, batch_format="pyarrow", batch_size=None)
        .groupby("gpart")
        .map_groups(check, batch_format="pandas")
    ).to_pandas()
    return bool(len(flags) == 0 or int(flags["ok"].min()) == 1)


def derive_edges_encoded_auto(
    turns: rd.Dataset, idmap: IdMap, num_partitions: int = 64,
    prefer_contiguous: bool | None = None,
) -> rd.Dataset:
    """Probe-then-derive: the zero-turn-shuffle contiguous path when the
    input layout allows it, else the conversation-hash grouped path.
    Output identical either way (parity-tested, checksum-identical at
    156M edges).

    ``prefer_contiguous=None`` (default) picks contiguous only on a
    MULTI-NODE cluster — the same auto rule as the Pregel sliced scatter
    mode: on one node the grouped path's |turns| shuffle stays in plasma
    and measures FASTER (123s vs 154s at 182M turns, equal-calib legs),
    while on a real cluster that shuffle crosses the network and the
    contiguous path's |runs|-cardinality exchange is the winner. Pass
    True/False to force."""
    if prefer_contiguous is None:
        try:
            alive = sum(
                1 for n in ray.nodes() if n.get("Alive", n.get("alive", True))
            )
            prefer_contiguous = alive > 1
        except Exception:
            prefer_contiguous = False
    if prefer_contiguous and probe_conv_contiguity(
        turns, num_partitions=num_partitions
    ):
        return derive_edges_encoded_contiguous(
            turns, idmap, num_partitions=num_partitions
        )
    return derive_edges_encoded_grouped(
        turns, idmap, num_partitions=num_partitions
    )


def sorted_transcript_view(transcripts: rd.Dataset) -> rd.Dataset:
    """Stable-ordered transcript view: sort by (conv_id, turn_idx).

    ``(conv_id, turn_idx)`` is a primary key, so the sort is a total order;
    the per-row invariant (text byte-equality under stable ordering,
    BASELINE.json input_hint) is asserted against this view in tests.
    """
    return transcripts.sort(["conv_id", "turn_idx"])


def derive_edges_typed(
    turns: rd.Dataset, idmap: IdMap, num_partitions: int = 64,
) -> rd.Dataset:
    """Multi-relationship-type edge derivation: ``(rel_type, src, dst,
    weight)`` with one row per (type, src, dst).

    The reference's GraphStore keys relationships by RelationshipType
    (core/loading/CSRGraphStore.java:80-92 — ``Map<RelationshipType,
    SingleTypeRelationships>``); here the type of an interaction edge is
    the conversation's type. The events adapter maps each event_type
    stream to one conversation, so ``conv_id`` IS the relationship type
    there; transcript corpora with a separate type column can rename it
    into ``conv_id``'s role via a pre-projection.

    Same shuffle shape as ``derive_edges_encoded_grouped`` (conversations
    hash-partition; each group sorts locally and pairs adjacent turns),
    with the type string carried on the per-group partial counts and the
    final combine keyed by (type, packed src·V+dst).
    """
    import pandas as pd

    from graph_data_science_ray._util import splitmix64

    V = len(idmap)
    _check_packable(V)
    keys_ref = idmap.arrow_ref

    def add_ids(t: pa.Table) -> pa.Table:
        ka = ray.get(keys_ref)
        idx = pc.index_in(t["actor"], value_set=ka)
        if idx.null_count:
            raise KeyError("dangling actor key during typed derivation")
        conv = np.asarray(t["conv_id"].to_numpy(zero_copy_only=False), dtype=object)
        h = pd.util.hash_array(conv)
        part = (h % np.uint64(num_partitions)).astype(np.int32)
        aid_type = pa.int32() if V < 2**31 else pa.int64()
        return pa.table(
            {
                "conv_id": t["conv_id"],
                "turn_idx": t["turn_idx"],
                "aid": idx.cast(aid_type),
                "part": pa.array(part),
            }
        )

    def pair_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        conv = g["conv_id"].to_numpy()
        aid = g["aid"].to_numpy(dtype=np.int64)
        same = conv[1:] == conv[:-1]
        s = aid[:-1][same]
        d = aid[1:][same]
        rt = conv[:-1][same]
        keep = s != d
        key = s[keep] * V + d[keep]
        out = (
            pd.DataFrame({"rel_type": rt[keep], "key": key})
            .groupby(["rel_type", "key"], sort=False)
            .size()
            .reset_index(name="partial")
        )
        out["partial"] = out["partial"].astype(np.int32)
        return out

    partials = (
        turns.map_batches(add_ids, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pair_group, batch_format="pandas")
    )

    def tag(t: pa.Table) -> pa.Table:
        part = (
            splitmix64(t["key"].to_numpy(zero_copy_only=False).astype(np.uint64))
            % np.uint64(num_partitions)
        ).astype(np.int32)
        return t.append_column("kpart", pa.array(part))

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        agg = (
            g.groupby(["rel_type", "key"], sort=False)["partial"]
            .sum()
            .reset_index()
        )
        k = agg["key"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "rel_type": agg["rel_type"],
                "src": k // V,
                "dst": k % V,
                "weight": agg["partial"].astype(np.float64),
            }
        )

    return (
        partials.map_batches(tag, batch_format="pyarrow")
        .groupby("kpart")
        .map_groups(combine, batch_format="pandas")
    )

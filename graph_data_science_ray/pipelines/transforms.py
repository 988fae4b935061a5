"""Graph → graph transforms (the reference's graph-operation surface).

- ``reverse_edges``      — the inverse relationship index
  (algo/src/main/java/org/neo4j/gds/indexInverse/InverseRelationships.java:49);
  ``symmetrize`` in pipelines.edges is ``toUndirected``
  (algo/src/main/java/org/neo4j/gds/undirected/ToUndirected.java:48).
- ``subgraph_filter``    — node/edge predicate filtering with id
  re-densification (subgraph-filtering/src/main/java/org/neo4j/gds/beta/filter/GraphStoreFilter.java).
- ``collapse_path``      — contract 2-hop paths into a new relationship
  (algo/src/main/java/org/neo4j/gds/walking/CollapsePath.java:43).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from graph_data_science_ray.pipelines.agg import hash_aggregate
from graph_data_science_ray.pipelines.edges import IdMap


def reverse_edges(encoded_edges: rd.Dataset) -> rd.Dataset:
    """Reverse orientation: (src, dst, w) -> (dst, src, w)."""
    return encoded_edges.map_batches(
        lambda t: pa.table({"src": t["dst"], "dst": t["src"], "weight": t["weight"]}),
        batch_format="pyarrow",
    )


def subgraph_filter(
    encoded_edges: rd.Dataset,
    idmap: IdMap,
    node_predicate=None,
    min_weight: float | None = None,
    edge_expr: str | None = None,
    node_expr: str | None = None,
    edge_filter: str | None = None,
    node_filter: str | None = None,
    node_props: dict | None = None,
) -> tuple[rd.Dataset, IdMap]:
    """Filter an encoded edge table; returns (re-densified edges, new IdMap).

    Predicate surface (the reference's filter expression language,
    subgraph-filtering/.../expression/ExpressionParser.java):
    - ``edge_filter`` / ``node_filter``: the reference's EXPRESSION AST
      surface — ``"r.weight >= 2 AND NOT r.src = r.dst"``,
      ``"n:role OR n.key = 'tool:t7'"`` — parsed by
      ``pipelines.filter_expr`` and evaluated vectorized per batch.
      Node expressions see ``n.key`` (the actor key) plus any arrays in
      ``node_props``; ``n:Label`` checks the key prefix before ``:``.
    - ``edge_expr``: Ray Dataset filter expression over the edge columns
      (``src``, ``dst``, ``weight``), e.g. ``"weight >= 3"``;
    - ``node_expr``: pandas ``query`` expression over a ``key`` column of
      actor keys, e.g. ``key.str.startswith("tool:")``;
    - ``node_predicate``: vectorized fn over a numpy array of actor keys
      → bool keep-mask (the programmatic escape hatch);
    - ``min_weight``: shorthand for the common weight threshold.

    Surviving nodes re-densify to a fresh ``[0, V')`` id space (the
    reference rebuilds ids on filter,
    subgraph-filtering/.../NodesFilter.java); the broadcast old→new map is
    an int array lookup per batch.
    """
    import pandas as pd

    ds = encoded_edges
    if min_weight is not None:
        ds = ds.map_batches(
            lambda t: t.filter(pc.greater_equal(t["weight"], min_weight)),
            batch_format="pyarrow",
        )
    if edge_expr is not None:
        ds = ds.filter(expr=edge_expr)
    if edge_filter is not None:
        from graph_data_science_ray.pipelines.filter_expr import (
            evaluate_edge_filter,
        )

        def ast_filter(t: pa.Table, *, _ex=edge_filter) -> pa.Table:
            props = {
                c: t[c].to_numpy(zero_copy_only=False)
                for c in t.schema.names
            }
            mask = evaluate_edge_filter(_ex, props, n_rows=t.num_rows)
            return t.filter(pa.array(mask))

        ds = ds.map_batches(ast_filter, batch_format="pyarrow")
    if node_filter is not None:
        if node_predicate is not None or node_expr is not None:
            raise ValueError(
                "pass one of node_filter / node_expr / node_predicate"
            )
        from graph_data_science_ray.pipelines.filter_expr import (
            evaluate_node_filter,
            labels_in,
            parse_expression,
        )

        def node_predicate(keys: np.ndarray):  # noqa: F811 — intentional
            keys_s = np.asarray(keys).astype(str)
            props = {"key": keys_s}
            if node_props:
                props.update(node_props)
            labels = {
                lab: np.char.startswith(keys_s, lab + ":")
                for lab in labels_in(parse_expression(node_filter))
            }
            return evaluate_node_filter(
                node_filter, props, labels, n_rows=len(keys_s)
            )
    if node_expr is not None:
        if node_predicate is not None:
            raise ValueError("pass node_expr or node_predicate, not both")

        def node_predicate(keys: np.ndarray):  # noqa: F811 — intentional
            df = pd.DataFrame({"key": pd.Series(keys).astype(str)})
            kept = df.query(node_expr, engine="python")
            mask = np.zeros(len(df), dtype=bool)
            mask[kept.index.to_numpy()] = True
            return mask

    if node_predicate is None:
        return ds, idmap
    keep_mask = np.asarray(node_predicate(idmap.keys), dtype=bool)
    keep_keys = idmap.keys[keep_mask]
    old_to_new = np.full(len(idmap), -1, dtype=np.int64)
    old_to_new[np.flatnonzero(keep_mask)] = np.arange(keep_mask.sum(), dtype=np.int64)
    map_ref = ray.put(old_to_new)

    def filt(t: pa.Table) -> pa.Table:
        m = ray.get(map_ref)
        src = m[t["src"].to_numpy(zero_copy_only=False)]
        dst = m[t["dst"].to_numpy(zero_copy_only=False)]
        ok = (src >= 0) & (dst >= 0)
        return pa.table(
            {
                "src": src[ok],
                "dst": dst[ok],
                "weight": t["weight"].to_numpy(zero_copy_only=False)[ok],
            }
        )

    return ds.map_batches(filt, batch_format="pyarrow"), IdMap(keep_keys)


def collapse_path(
    first_leg: rd.Dataset, second_leg: rd.Dataset, num_partitions: int | None = None
) -> rd.Dataset:
    """Contract A-[r1]->B-[r2]->C into A-[new]->C (2-hop template).

    Weight of the collapsed edge = number of distinct 2-hop paths.
    Self-paths (A == C) are dropped, mirroring the traversal semantics.
    Implemented as a hash join on the mid node.
    """
    from graph_data_science_ray.pipelines.agg import _stable_row_hash

    if num_partitions is None:
        num_partitions = 32
    # manual hash-partitioned join on the mid node: both legs tagged by
    # hash(mid), matched pairwise inside each partition (robust against
    # empty-block schema loss that trips the built-in hash join)
    left = first_leg.map_batches(
        lambda df: pd.DataFrame(
            {"a": df["src"], "mid": df["dst"], "side": np.int8(0)}
        ),
        batch_format="pandas",
    )
    right = second_leg.map_batches(
        lambda df: pd.DataFrame(
            {"a": df["dst"], "mid": df["src"], "side": np.int8(1)}
        ),
        batch_format="pandas",
    )

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__part"] = (_stable_row_hash(df, ["mid"]) % num_partitions).astype(np.int64)
        return df

    def join_part(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["side"] == 0]
        rg = g[g["side"] == 1]
        m = lg.merge(rg, on="mid", suffixes=("_l", "_r"))
        m = m[m["a_l"] != m["a_r"]]
        if not len(m):
            return pd.DataFrame(
                {"src": pd.Series([], dtype=np.int64),
                 "dst": pd.Series([], dtype=np.int64),
                 "partial": pd.Series([], dtype=np.int64)}
            )
        out = (
            m.groupby(["a_l", "a_r"], sort=False).size().reset_index(name="partial")
        )
        return out.rename(columns={"a_l": "src", "a_r": "dst"})

    pairs = (
        left.union(right)
        .map_batches(tag, batch_format="pandas")
        .groupby("__part")
        .map_groups(join_part, batch_format="pandas")
    )
    agg = hash_aggregate(pairs, ["src", "dst"], "partial", op="sum", out_col="weight")
    return agg.map_batches(
        lambda t: pa.table(
            {"src": t["src"], "dst": t["dst"], "weight": pc.cast(t["weight"], pa.float64())}
        ),
        batch_format="pyarrow",
    )

"""Driver-contract parity: queries() vs oracle_sql() through DuckDB.

Runs the same comparison the driver performs (row count, column names,
order-insensitive values) at sf0.001 for speed; the driver repeats it at
sf0.01.
"""

import importlib
import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
entry = importlib.import_module("__ray_entry__")

SF_DIR = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = pd.DataFrame(df)
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


_ORACLE_CHECKED = [
    "edges",
    "degree",
    "pagerank",
    "wcc",
    "label_propagation",
    "triangles",
    "triangles_global",
    "lcc",
    "sssp",
    "bfs",
    "k_core",
    "node_similarity",
    "dedup_exact",
    "fingerprint",
    "token_count",
    "quality_stats",
    "knn_cosine_topk",
    "embedding_near_dup",
    "scale_minmax",
    "sessionize",
    "window_hourly",
    "yens_k3",
    "delta_stepping",
    "astar",
    "scale_l2",
    "lp_node_weighted",
    "node_similarity_cosine",
    "louvain_round1",
    "pagerank_personalized",
    "bpe_token_count",
    "dedup_exact_table",
    "lr_score",
    "split_relationships",
    "degree_in",
    "dijkstra_route",
    "cypher_project",
    "ngram_jaccard",
    "edges_distributed",
    "asof_join",
    "window_sliding",
    "knn_ivf",
    "range_join",
    "winnow_fingerprints",
    "louvain_valid",
    "max_k_cut",
    "sllpa",
    "minhash_near_dup",
    "feature_backfill",
    "knn_descent",
    "celf",
    "fastrp_valid",
    "simhash",
    "louvain_modularity",
    "knn_lsh_multiband",
    "all_shortest_paths",
    "apsp_weighted",
    "knn_euclidean",
    "knn_pearson",
    "decontaminate",
    "bloom_decontaminate",
    "source_mix",
    "conversation_stats",
    "turn_dedup",
    "trajectory_pagerank",
    "duplicate_spans",
    "dedup_clusters",
    "knn_quantized",
    "weighted_sample",
    "hll_registers",
    "cms_registers",
    "cms_heavy_hitters",
    "deterministic_shuffle",
    "training_mix",
    "degree_distribution",
    "component_size_distribution",
    "pagerank_distribution",
    "closeness_wf",
    "hop_distribution",
    "lang_id",
    "typed_edge_counts",
    "pagerank_typed",
    "normalize_text",
    "chunk_documents",
    "scale_embedding_minmax",
    "eigenvector_exact",
    "articulation_points",
    "bridges",
    # round-4 re-contracted exactly-checkable surfaces
    "louvain",
    "leiden",
    "k1_coloring",
    "fastrp",
    "random_walks",
    "linkpred_funcs",
    "vector_similarity",
    # round-4 session-8 batch
    "eccentricity",
    "graph_diameter",
    "token_entropy",
    "wcc_threshold",
    "hll_by_source",
    "edges_tooled",
    "tool_usage",
    # session-8 batch
    "funnel",
    "retention_cohorts",
    "actor_trigrams",
    "pmi_bigrams",
    "readability",
    "pca_power",
    "four_cliques",
    "zipf_fit",
    "degree_gini",
    "katz",
    "props_field_stats",
    "value_stats",
    "funnel_latency",
    "product_report",
    "ams_registers",
    "conversation_dedup",
    "tool_latency",
    "monologue_runs",
    # round-5 batch
    "triangle_stream",
    "kge_transe_topk",
    "kge_distmult_topk",
    "rf_score",
    "mlp_score",
    "astar_haversine",
]


@pytest.mark.parametrize("name", _ORACLE_CHECKED)
def test_query_matches_oracle(con, name):
    mine = entry.queries()[name](SF_DIR)
    if hasattr(mine, "to_pandas"):
        mine = mine.to_pandas()
    mine = _norm(mine)
    orc = _norm(con.sql(entry.oracle_sql()[name]).df())
    assert list(mine.columns) == list(orc.columns)
    assert len(mine) == len(orc)
    for c in mine.columns:
        a, b = mine[c].to_numpy(), orc[c].to_numpy()
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            assert (a.astype(float) == b.astype(float)).all(), f"col {c}"
        else:
            assert (a.astype(str) == b.astype(str)).all(), f"col {c}"


def test_every_query_has_an_oracle():
    """Round-4 contract: EVERY registered query is exactly checkable —
    the driver should record zero ``no_oracle`` rows."""
    qs, sqls = entry.queries(), entry.oracle_sql()
    assert set(qs) == set(sqls)


def test_every_oracle_key_has_a_query():
    qs, sqls = entry.queries(), entry.oracle_sql()
    assert set(sqls) <= set(qs)


def test_entry_smoke():
    out = entry.entry()
    assert len(out) > 0
    assert set(out.columns) == {"node", "score"}

"""graph_data_science_ray — a Ray-Data-native link-graph analytics engine.

A from-scratch engine with the query/data-processing capabilities of the
Neo4j Graph Data Science reference (see SURVEY.md), re-expressed
Ray-Data-first:

- transcript tables (``conv_id, turn_idx, role, text, tool, ts``) are
  derived into weighted actor-interaction edge tables with
  ``read_parquet → map_batches → join → groupby`` pipelines;
- the edge table is hash/range-partitioned into per-partition CSR blocks
  (``state.graph.GraphStore``), persisted as the checkpoint substrate;
- iterative algorithms (PageRank, WCC, label propagation) run on a BSP
  gather-scatter kernel (``state.pregel``) whose supersteps are
  partition-addressed pre-reduced message exchanges — the distributed
  equivalent of the reference's Pregel ``ReducingMessenger``;
- batch/data-prep operators (dedup, text analysis, similarity search,
  scaling, sessionization) are vectorized ``map_batches`` stages.

Nothing in here calls ``ray.init()``; callers own the Ray session.
"""

from graph_data_science_ray.sources.transcripts import (
    TRANSCRIPT_SCHEMA,
    read_transcripts,
    synthesize_transcripts,
    transcripts_from_edge_list,
    events_as_transcripts,
)
from graph_data_science_ray.pipelines.edges import (
    derive_turns,
    derive_edges,
    derive_edges_agg,
    edges_from_expressions,
    IdMap,
    idmap_table,
    encode_edges,
    encode_edges_distributed,
    symmetrize,
)
from graph_data_science_ray.state.graph import GraphStore
from graph_data_science_ray.state.catalog import GraphCatalog
from graph_data_science_ray.state.models import Model, ModelCatalog
from graph_data_science_ray.state.graph import export_csv, import_csv
from graph_data_science_ray.state.typed import TypedGraphStore
from graph_data_science_ray.state.pregel import Pregel, PregelComputation, TerminationFlag
from graph_data_science_ray.functions.pagerank import pagerank
from graph_data_science_ray.functions.wcc import wcc
from graph_data_science_ray.functions.labelprop import label_propagation
from graph_data_science_ray.functions.triangles import triangle_count
from graph_data_science_ray.functions.degree import degree_centrality
from graph_data_science_ray.functions.node2vec import node2vec
from graph_data_science_ray.functions.paths import (
    astar_route,
    delta_stepping,
    dfs_preorder,
    dijkstra_route,
    yens_k_shortest,
)
from graph_data_science_ray.functions.community2 import approx_max_k_cut, sllpa
from graph_data_science_ray.functions.influence import celf
from graph_data_science_ray.functions.hashgnn import hash_gnn
from graph_data_science_ray.functions.spanning import (
    k_spanning_tree,
    minimum_spanning_forest,
    steiner_tree,
)
from graph_data_science_ray.functions.linkpred import link_prediction_scores
from graph_data_science_ray.functions.simfunc import vector_similarity

__all__ = [
    "Pregel",
    "PregelComputation",
    "TerminationFlag",
    "link_prediction_scores",
    "vector_similarity",
    "node2vec",
    "astar_route",
    "delta_stepping",
    "dfs_preorder",
    "dijkstra_route",
    "yens_k_shortest",
    "approx_max_k_cut",
    "sllpa",
    "celf",
    "hash_gnn",
    "k_spanning_tree",
    "minimum_spanning_forest",
    "steiner_tree",
    "TRANSCRIPT_SCHEMA",
    "read_transcripts",
    "synthesize_transcripts",
    "transcripts_from_edge_list",
    "events_as_transcripts",
    "derive_turns",
    "derive_edges",
    "derive_edges_agg",
    "edges_from_expressions",
    "IdMap",
    "idmap_table",
    "encode_edges",
    "encode_edges_distributed",
    "symmetrize",
    "GraphStore",
    "GraphCatalog",
    "Model",
    "ModelCatalog",
    "TypedGraphStore",
    "export_csv",
    "import_csv",
    "pagerank",
    "wcc",
    "label_propagation",
    "triangle_count",
    "degree_centrality",
]

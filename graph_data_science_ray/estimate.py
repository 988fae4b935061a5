"""Memory estimation — the reference's ``.estimate`` mode.

Reference: memory-usage/src/main/java/org/neo4j/gds/core/utils/mem/MemoryEstimation.java
with per-algorithm definitions (e.g. WccMemoryEstimateDefinition.java:36-42,
PageRankMemoryEstimateDefinition.java:31-37). Static bytes-per-vertex /
bytes-per-edge formulas evaluated pre-flight; the engine uses them as a
planner guard (warn when an algorithm's working set exceeds the object
store) rather than a hard gate.
"""

from __future__ import annotations

from dataclasses import dataclass

_I64 = 8
_F64 = 8
_I32 = 4
_BOOL = 1


@dataclass
class MemoryEstimate:
    algorithm: str
    bytes_fixed: int
    bytes_per_node: float
    bytes_per_edge: float

    def total(self, node_count: int, edge_count: int) -> int:
        return int(
            self.bytes_fixed
            + self.bytes_per_node * node_count
            + self.bytes_per_edge * edge_count
        )


# CSR block residency: indices + weights + scatter index (perm, dst_sorted,
# src_idx, w_sorted) + uniq/run arrays (~bounded by E)
_CSR_PER_EDGE = _I64 + _F64 + _I64 + _I64 + _I32 + _F64 + 2 * _I64
_CSR_PER_NODE = _I64  # indptr

_ESTIMATES = {
    # rank + delta + message accumulator + received mask (reference: two
    # atomic f64 arrays + rank + vote bit ≈ 25 B/node)
    "pagerank": (3 * _F64 + _BOOL, 0.0),
    "wcc": (2 * _I64 + _BOOL, 0.0),  # component + changed (+acc)
    "label_propagation": (3 * _I64, 2.5 * _F64),  # labels + per-(dst,label) tallies
    "sssp": (3 * _F64, 0.0),
    "triangle_count": (_I64, 2 * _I64),  # corner counts + forward adjacency
    "closeness": (3 * _I64, 0.0),  # seen/frontier bitmasks + counters per wave
    "fastrp": (0.0, 0.0),  # dominated by dim * 2 * f64 per node (see below)
    "hits": (2 * _F64, 0.0),
    "louvain": (4 * _I64, _F64),
    "kmeans": (_I64, 0.0),
    "scc": (3 * _I64, _I64),  # colors + reached + assigned, live-edge copy
    "delta_stepping": (2 * _F64 + _BOOL, 0.0),  # dist + pending
    "astar": (3 * _F64, 0.0),  # dist + heuristic + changed
    "yens": (2 * _F64, 2 * _I64),  # per-spur SSSP + masked edge copy
    "sllpa": (0.0, 0.0),  # dominated by rounds * i64 per node (see below)
    "max_k_cut": (2 * _I64, 1.5 * _F64),  # assignment + (node,part,w) tallies
    "celf": (2 * _I64 + _BOOL, 0.0),  # per-sim reached mask + queue
    "hashgnn": (0.0, 0.0),  # dominated by dim * i64 per node (see below)
    "node2vec": (0.0, 0.0),  # dominated by 2 * dim * f64 per node (see below)
    "knn_descent": (0.0, 0.0),  # dominated by dim * f64 + k candidates
    "all_shortest_paths": (0.0, 0.0),  # dominated by wave width (see below)
    "betweenness": (4 * _F64, 0.0),  # sigma + delta + dist + partial scores
    # round-5 families (node_count = training rows for the ML entries)
    "maximal_matching": (2 * _I64, 3 * _I64),  # dead set + (node,peer,pri) explode
    "triangle_stream": (_I64, 5 * _I64),  # forward adjacency + (a,b,c) rows
    "kge_topk": (0.0, 0.0),  # dominated by dim + k per head (see below)
    "random_forest": (0.0, 0.0),  # dominated by dim * f64 per row (see below)
    "mlp": (0.0, 0.0),  # dominated by (dim + hidden) * f64 per row
}

# algorithms whose per-node state scales with a dimension-like parameter
_DIM_SCALED = {
    "fastrp": ("dim", 64, lambda d: 2 * d * _F64),
    "node2vec": ("dim", 32, lambda d: 2 * d * _F64),
    "hashgnn": ("dim", 16, lambda d: 2 * d * _I64),
    "sllpa": ("rounds", 20, lambda r: (r + 1) * _I64),
    "knn_descent": ("k", 10, lambda k: 64 * _F64 + 3 * k * _I64),
    # unweighted wave: uint64 seen/frontier + (wave<=64) int32 hop matrix;
    # weighted wave: (wave) f64 distance matrix
    "all_shortest_paths": ("wave", 64, lambda w: 2 * _I64 + w * _I32),
    # kge: per candidate row one f64 vector + Q*k partial rows amortized
    "kge_topk": ("dim", 64, lambda d: (d + 4) * _F64),
    # rf: canonical matrix (dim f64) + bootstrap index per tree task
    "random_forest": ("dim", 64, lambda d: (d + 2) * _F64),
    # mlp: shard-held X row + widest activation per row
    "mlp": ("dim", 64, lambda d: (d + 32) * _F64),
}


def estimate(algorithm: str, node_count: int, edge_count: int, **params) -> MemoryEstimate:
    """Pre-flight working-set estimate (graph residency + algorithm state)."""
    if algorithm not in _ESTIMATES:
        raise ValueError(f"no estimate for {algorithm!r}; known: {sorted(_ESTIMATES)}")
    per_node, per_edge = _ESTIMATES[algorithm]
    if algorithm in _DIM_SCALED:
        pname, default, fn = _DIM_SCALED[algorithm]
        per_node = fn(int(params.get(pname, default)))
    return MemoryEstimate(
        algorithm=algorithm,
        bytes_fixed=64 * 1024 * 1024,  # driver + manifests headroom
        bytes_per_node=_CSR_PER_NODE + per_node,
        bytes_per_edge=_CSR_PER_EDGE + per_edge,
    )


def check_fits(algorithm: str, node_count: int, edge_count: int,
               available_bytes: int | None = None, **params) -> tuple[bool, int]:
    """Return (fits, estimated_bytes) against the Ray object store size."""
    est = estimate(algorithm, node_count, edge_count, **params).total(
        node_count, edge_count
    )
    if available_bytes is None:
        try:
            import ray

            available_bytes = int(ray.cluster_resources().get("object_store_memory", 0))
        except Exception:
            available_bytes = 0
    return (est <= available_bytes if available_bytes else True), est

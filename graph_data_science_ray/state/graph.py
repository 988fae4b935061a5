"""Partitioned CSR graph store — the engine's ``GraphStore``/``Graph``.

The reference holds one in-memory ``CSRGraphStore`` per named graph
(core/src/main/java/org/neo4j/gds/core/loading/CSRGraphStore.java:80-92)
with a dense ``IdMap`` and per-type sorted adjacency
(core/src/main/java/org/neo4j/gds/api/AdjacencyList.java:33-40). Our
equivalent is:

- a **directory layout** ``{path}/manifest.json, idmap.parquet,
  csr/part-{p}.npz`` — the persisted projection *is* the checkpoint
  substrate (a re-run skips completed partitions; manifests commit by
  atomic rename);
- **degree-balanced contiguous node ranges** as partitions: boundaries are
  chosen on cumulative out-degree, the reference's degree-aware
  partitioning (core/src/main/java/org/neo4j/gds/core/utils/partition/PartitionUtils.java:203-255);
- per-partition CSR blocks (``indptr/indices/weights`` numpy arrays)
  loaded once into the Ray object store and shared zero-copy by every
  task on a node — plus a precomputed **scatter index**
  (destination-sorted permutation + run boundaries) so each BSP superstep
  is pure vectorized ``repeat → permute → reduceat`` work.

Partition count is FIXED at projection time and independent of cluster
size, so float reductions happen in identical order at any parallelism —
the determinism contract (SURVEY.md §4).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from graph_data_science_ray._util import atomic_write_json, read_json
from graph_data_science_ray.pipelines.edges import IdMap

_FORMAT_VERSION = 1


def _build_scatter_index(indices: np.ndarray, boundaries: np.ndarray) -> dict:
    """Precompute destination-grouped reduction structure for one partition.

    ``perm`` sorts the edge array by destination; ``run_starts`` delimits
    equal-destination runs; ``uniq_dst`` is the run's destination id;
    ``part_slices[q]:part_slices[q+1]`` selects the runs addressed to
    partition q. This is the map-side pre-reduction of the reference's
    ``ReducingMessenger`` (pregel/src/main/java/org/neo4j/gds/beta/pregel/ReducingMessenger.java:36-106)
    done once per topology instead of per superstep.
    """
    perm = np.argsort(indices, kind="stable")
    sorted_dst = indices[perm]
    uniq_dst, run_starts = np.unique(sorted_dst, return_index=True)
    part_slices = np.searchsorted(uniq_dst, boundaries).astype(np.int64)
    # int32 destination ids when they fit (V < 2^31): halves the dst-index
    # bytes in every superstep payload — the scatter/apply exchange is
    # DRAM/network-bound, so smaller ids are direct throughput
    n_total = int(boundaries[-1]) if len(boundaries) else 0
    dst_dtype = np.int32 if n_total < 2**31 else np.int64
    return {
        "perm": perm.astype(np.int64),
        "dst_sorted": sorted_dst.astype(np.int64),
        "run_starts": run_starts.astype(np.int64),
        "uniq_dst": uniq_dst.astype(dst_dtype),
        "part_slices": part_slices,
    }


@ray.remote
def _load_csr_block(path: str | None, start: int, end: int, boundaries: np.ndarray) -> dict:
    """Load one partition's CSR npz (or synthesize an empty block)."""
    n_local = int(end - start)
    if path is None or not os.path.exists(path):
        indptr = np.zeros(n_local + 1, dtype=np.int64)
        indices = np.zeros(0, dtype=np.int64)
        weights = np.zeros(0, dtype=np.float64)
    else:
        with np.load(path) as z:
            indptr, indices, weights = z["indptr"], z["indices"], z["weights"]
    block = {
        "start": int(start),
        "end": int(end),
        "indptr": indptr,
        "indices": indices,
        "weights": weights,
        "degrees": np.diff(indptr),
        "wdegrees": None,
    }
    # weighted out-degree per local node (reference DegreeCentrality as
    # PageRank's weighted divisor, PageRankAlgorithmFactory.java:140-156).
    # reduceat only over non-empty segments: clamping start offsets instead
    # would shorten the last non-empty node's segment whenever the partition
    # ends with zero-out-degree nodes.
    wdeg = np.zeros(n_local, dtype=np.float64)
    nz = np.diff(indptr) > 0
    if len(weights) and nz.any():
        wdeg[nz] = np.add.reduceat(weights, indptr[:-1][nz])
    block["wdegrees"] = wdeg
    block.update(_build_scatter_index(indices, boundaries))
    # destination-sorted gather index: per-superstep message construction is
    # one int32 gather (``send[src_idx]``) instead of repeat + permute —
    # the scatter kernel is memory-bandwidth-bound, this halves its traffic
    block["src_idx"] = np.repeat(
        np.arange(n_local, dtype=np.int32), block["degrees"]
    )[block["perm"]]
    block["w_sorted"] = (
        weights[block["perm"]] if len(weights) else np.zeros(0, dtype=np.float64)
    )
    return block


class _CsrPartitionWriter:
    """``map_groups`` callable: build + persist one partition's CSR block."""

    def __init__(self, out_dir: str, boundaries: np.ndarray):
        self.out_dir = out_dir
        self.boundaries = boundaries

    def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
        part = int(g["part"].iloc[0])
        start = int(self.boundaries[part])
        end = int(self.boundaries[part + 1])
        src = g["src"].to_numpy(dtype=np.int64) - start
        dst = g["dst"].to_numpy(dtype=np.int64)
        w = g["weight"].to_numpy(dtype=np.float64)
        order = np.lexsort((dst, src))
        src, dst, w = src[order], dst[order], w[order]
        indptr = np.zeros(end - start + 1, dtype=np.int64)
        np.cumsum(np.bincount(src, minlength=end - start), out=indptr[1:])
        final = os.path.join(self.out_dir, f"part-{part}.npz")
        tmp = final + ".tmp.npz"
        np.savez(tmp, indptr=indptr, indices=dst, weights=w)
        os.replace(tmp, final)
        return pd.DataFrame({"part": [part], "edges": [len(dst)]})


class GraphStore:
    """A projected, partitioned, persisted graph.

    Construction (``GraphStore.project``) is the engine's
    ``gds.graph.project``: encoded edge Dataset → degree-balanced range
    partitions → per-partition sorted CSR blocks on disk → manifest.
    ``load`` restores from the directory; CSR blocks enter the object
    store lazily (one remote load task per partition, refs held by the
    driver, read zero-copy by algorithm tasks).
    """

    def __init__(
        self,
        path: str,
        node_count: int,
        edge_count: int,
        boundaries: np.ndarray,
        directed: bool,
        idmap: IdMap | None,
    ):
        self.path = path
        self.node_count = int(node_count)
        self.edge_count = int(edge_count)
        self.boundaries = np.asarray(boundaries, dtype=np.int64)
        self.directed = directed
        self.idmap = idmap
        self._block_refs: list | None = None

    # -- construction -----------------------------------------------------

    @staticmethod
    def _choose_boundaries(outdeg: np.ndarray, num_partitions: int) -> np.ndarray:
        """Degree-balanced contiguous ranges over [0, V).

        Boundary p is placed where cumulative out-degree crosses
        ``p * E / P`` (reference degree partitioning,
        PartitionUtils.java:203-255). Duplicate boundaries (tiny graphs)
        are collapsed, so P adapts downward for small inputs.
        """
        v = len(outdeg)
        num_partitions = max(1, min(num_partitions, v))
        cum = np.cumsum(outdeg, dtype=np.float64)
        total = cum[-1] if v else 0.0
        if total <= 0:
            bounds = np.linspace(0, v, num_partitions + 1).astype(np.int64)
        else:
            targets = (np.arange(1, num_partitions) * total) / num_partitions
            inner = np.searchsorted(cum, targets, side="left") + 1
            bounds = np.concatenate(([0], inner, [v])).astype(np.int64)
        return np.unique(bounds)

    @classmethod
    def project(
        cls,
        encoded_edges: rd.Dataset,
        path: str,
        idmap: IdMap | None = None,
        node_count: int | None = None,
        num_partitions: int = 32,
        directed: bool = True,
        boundaries: np.ndarray | None = None,
        overwrite: bool = True,
    ) -> "GraphStore":
        import pyarrow.compute as pc

        # resumable projection: a committed manifest means every partition
        # file landed (manifest writes last, atomically) — skip the build
        if not overwrite and os.path.exists(os.path.join(path, "manifest.json")):
            return cls.load(path)

        # re-projection into an existing dir: clear stale partition files
        # FIRST — empty partitions write no npz, so a leftover block from a
        # previous projection with different boundaries would silently load
        if os.path.isdir(path):
            import glob as _glob

            for f in _glob.glob(os.path.join(path, "csr", "part-*.npz")):
                os.remove(f)
            mf = os.path.join(path, "manifest.json")
            if os.path.exists(mf):
                os.remove(mf)

        # The edge table is consumed twice (degree histogram, CSR build);
        # materialize the already-aggregated slim table once instead of
        # re-running the whole derivation pipeline per pass.
        encoded_edges = encoded_edges.materialize()

        if node_count is None:
            if idmap is not None:
                node_count = len(idmap)
            else:
                stats = encoded_edges.map_batches(
                    lambda t: pa.table(
                        {"m": [max(pc.max(t["src"]).as_py() or -1, pc.max(t["dst"]).as_py() or -1)]}
                    ),
                    batch_format="pyarrow",
                ).max("m")
                node_count = int(stats) + 1

        # out-degree histogram: SPARSE per-batch partials — each batch
        # emits only its touched (node, cnt) pairs (not a V-length table),
        # a distributed groupby-sum combines them, and the driver fills
        # one dense V-array to place partition boundaries.
        def partial_outdeg(t: pa.Table) -> pa.Table:
            u, c = np.unique(t["src"].to_numpy(zero_copy_only=False), return_counts=True)
            return pa.table({"node": u.astype(np.int64), "cnt": c.astype(np.int64)})

        partials = encoded_edges.map_batches(partial_outdeg, batch_format="pyarrow")
        if node_count <= 5_000_000:
            # shuffle-free combine tree (the IdMap.from_turns shape):
            # coalesce the ≤V-row batch partials and sum the ≤8·V sparse
            # rows on the driver — ~3x faster than the sort-shuffle
            # aggregate at bench scale, and V bounds the driver rows
            agg = (
                partials.repartition(8)
                .map_batches(
                    lambda t: pa.table(
                        {
                            "node": (g := t.group_by("node").aggregate([("cnt", "sum")]))["node"],
                            "cnt": g["cnt_sum"],
                        }
                    ),
                    batch_format="pyarrow",
                )
                .to_pandas()
            )
            if len(agg):
                agg = agg.groupby("node", sort=False)["cnt"].sum().reset_index()
        else:
            from graph_data_science_ray.pipelines.agg import hash_aggregate

            agg = hash_aggregate(partials, ["node"], "cnt", op="sum").to_pandas()
        outdeg = np.zeros(node_count, dtype=np.int64)
        if len(agg) and "node" in agg.columns:
            outdeg[agg["node"].to_numpy(dtype=np.int64)] = agg["cnt"].to_numpy(
                dtype=np.int64
            )
        edge_count = int(outdeg.sum())

        if boundaries is None:
            boundaries = cls._choose_boundaries(outdeg, num_partitions)
        else:
            # explicit boundaries: align a second projection (e.g. the
            # reverse/inverse-indexed graph) with an existing one so both
            # share the node-range partitioning
            boundaries = np.asarray(boundaries, dtype=np.int64)
        csr_dir = os.path.join(path, "csr")
        os.makedirs(csr_dir, exist_ok=True)

        bounds_ref = ray.put(boundaries)

        def tag_part(t: pa.Table, *, bref=bounds_ref) -> pa.Table:
            b = ray.get(bref)
            part = np.searchsorted(
                b[1:-1], t["src"].to_numpy(zero_copy_only=False), side="right"
            ).astype(np.int64)
            return t.append_column("part", pa.array(part))

        tagged = encoded_edges.map_batches(tag_part, batch_format="pyarrow")
        writer = _CsrPartitionWriter(csr_dir, boundaries)

        def write_csr_partition(g):
            return writer(g)

        manifest_rows = (
            tagged.groupby("part")
            .map_groups(write_csr_partition, batch_format="pandas")
            .to_pandas()
        )

        if idmap is not None:
            idmap.save(os.path.join(path, "idmap.parquet"))
        atomic_write_json(
            os.path.join(path, "manifest.json"),
            {
                "version": _FORMAT_VERSION,
                "node_count": int(node_count),
                "edge_count": edge_count,
                "directed": directed,
                "boundaries": [int(x) for x in boundaries],
                "partitions": sorted(
                    {int(r.part): int(r.edges) for r in manifest_rows.itertuples()}.items()
                ),
                "has_idmap": idmap is not None,
            },
        )
        return cls(path, node_count, edge_count, boundaries, directed, idmap)

    @classmethod
    def load(cls, path: str) -> "GraphStore":
        m = read_json(os.path.join(path, "manifest.json"))
        idmap = None
        if m.get("has_idmap"):
            idmap = IdMap.load(os.path.join(path, "idmap.parquet"))
        return cls(
            path,
            m["node_count"],
            m["edge_count"],
            np.asarray(m["boundaries"], dtype=np.int64),
            m["directed"],
            idmap,
        )

    # -- access -----------------------------------------------------------

    @property
    def num_partitions(self) -> int:
        return len(self.boundaries) - 1

    def block_refs(self) -> list:
        """Object refs of per-partition CSR blocks (loaded once, cached)."""
        if self._block_refs is None:
            bounds = self.boundaries
            self._block_refs = [
                _load_csr_block.remote(
                    os.path.join(self.path, "csr", f"part-{p}.npz"),
                    int(bounds[p]),
                    int(bounds[p + 1]),
                    bounds,
                )
                for p in range(self.num_partitions)
            ]
        return self._block_refs

    def out_degrees(self) -> np.ndarray:
        """Dense (unweighted) out-degree array, gathered from blocks."""
        blocks = ray.get(self.block_refs())
        deg = np.zeros(self.node_count, dtype=np.int64)
        for b in blocks:
            deg[b["start"] : b["end"]] = b["degrees"]
        return deg

    # -- mutate mode (property catalog) -----------------------------------
    #
    # The reference's ``.mutate`` writes algorithm results back as named
    # in-memory node properties (CSRGraphStore.addNodeProperty,
    # core/src/main/java/org/neo4j/gds/core/loading/CSRGraphStore.java:295)
    # and exposes drop/stream ops on them
    # (doc/modules/ROOT/pages/operations-reference/graph-operation-references.adoc:12-77).
    # Our properties are parquet files under ``{path}/props/`` tracked in a
    # ``props.json`` sidecar — part of the persisted projection, so a
    # reloaded GraphStore keeps its mutated properties.

    def _props_meta_path(self) -> str:
        return os.path.join(self.path, "props.json")

    def node_property_names(self) -> list[str]:
        import os as _os

        if not _os.path.exists(self._props_meta_path()):
            return []
        return sorted(read_json(self._props_meta_path()).get("node", []))

    def add_node_property(self, name: str, values: np.ndarray) -> None:
        """Register a dense node property (len == node_count)."""
        import pyarrow.parquet as pq

        values = np.asarray(values)
        if len(values) != self.node_count:
            raise ValueError(
                f"property {name!r}: {len(values)} values for {self.node_count} nodes"
            )
        pdir = os.path.join(self.path, "props")
        os.makedirs(pdir, exist_ok=True)
        pq.write_table(
            pa.table({"node": np.arange(self.node_count, dtype=np.int64),
                      name: values}),
            os.path.join(pdir, f"{name}.parquet"),
        )
        names = set(self.node_property_names())
        names.add(name)
        atomic_write_json(self._props_meta_path(), {"node": sorted(names)})

    def node_property(self, name: str) -> np.ndarray:
        """Dense node property values (ordered by node id)."""
        import pyarrow.parquet as pq

        if name not in self.node_property_names():
            raise KeyError(f"unknown node property {name!r}")
        t = pq.read_table(os.path.join(self.path, "props", f"{name}.parquet"))
        order = np.argsort(t["node"].to_numpy(), kind="stable")
        return t[name].to_numpy(zero_copy_only=False)[order]

    def drop_node_property(self, name: str) -> None:
        if name not in self.node_property_names():
            raise KeyError(f"unknown node property {name!r}")
        os.remove(os.path.join(self.path, "props", f"{name}.parquet"))
        names = set(self.node_property_names()) - {name}
        atomic_write_json(self._props_meta_path(), {"node": sorted(names)})

    def stream_node_property(self, name: str):
        """Property as (node, value) rows — the reference's ``.stream``."""
        import pandas as pd

        vals = self.node_property(name)
        node = (self.idmap.keys if self.idmap is not None
                else np.arange(self.node_count, dtype=np.int64))
        return pd.DataFrame({"node": node, name: vals})


@ray.remote
def _export_part_csv(block: dict, keys, out_path: str) -> int:
    """Write one partition's relationships as CSV rows with ORIGINAL keys."""
    import numpy as _np
    import pandas as _pd

    deg = block["degrees"]
    src = _np.repeat(
        _np.arange(block["start"], block["end"], dtype=_np.int64), deg
    )
    dst = block["indices"]
    w = block["weights"]
    ka = _np.asarray(keys)
    _pd.DataFrame(
        {"src": ka[src], "dst": ka[dst], "weight": w}
    ).to_csv(out_path, index=False)
    return len(src)


def export_csv(graph: "GraphStore", out_dir: str) -> dict:
    """CSV export of a projected graph — the reference's
    CsvGraphStoreExporter layout (io/csv/.../CsvGraphStoreExporter.java):
    ``nodes.csv`` (node key + any mutated node properties),
    ``relationships/part-*.csv`` (src, dst, weight with ORIGINAL keys,
    one file per partition, written by per-partition Ray tasks — rows
    never pass through the driver), and ``graph_info.json``. Round-trips
    through :func:`import_csv`.
    """
    import pandas as _pd

    os.makedirs(os.path.join(out_dir, "relationships"), exist_ok=True)
    keys_ref = graph.idmap.arrow_ref if graph.idmap is not None else ray.put(
        np.arange(graph.node_count, dtype=np.int64)
    )
    keys = (
        graph.idmap.keys if graph.idmap is not None
        else np.arange(graph.node_count, dtype=np.int64)
    )
    nodes = _pd.DataFrame({"node": keys})
    for pname in graph.node_property_names():
        nodes[pname] = graph.node_property(pname)
    nodes.to_csv(os.path.join(out_dir, "nodes.csv"), index=False)
    counts = ray.get(
        [
            _export_part_csv.remote(
                ref, keys_ref,
                os.path.join(out_dir, "relationships", f"part-{p}.csv"),
            )
            for p, ref in enumerate(graph.block_refs())
        ]
    )
    info = {
        "node_count": graph.node_count,
        "edge_count": int(sum(counts)),
        "directed": graph.directed,
        "num_partitions": graph.num_partitions,
    }
    atomic_write_json(os.path.join(out_dir, "graph_info.json"), info)
    return info


def import_csv(csv_dir: str, path: str, num_partitions: int | None = None) -> "GraphStore":
    """Rebuild a projected GraphStore from an :func:`export_csv` layout
    (the reference's CsvFileInput import side). The relationships CSVs
    stream through ``ray.data.read_csv`` → key encoding → projection; the
    node CSV provides the full key vocabulary (so isolated nodes and
    properties survive the round-trip)."""
    import pandas as _pd
    import ray.data as rd

    from graph_data_science_ray.pipelines.edges import IdMap, encode_edges

    info = read_json(os.path.join(csv_dir, "graph_info.json"))
    nodes = _pd.read_csv(os.path.join(csv_dir, "nodes.csv"))
    # IdMap.to_ids relies on np.searchsorted, so keys MUST be sorted;
    # an exported 0..n-1 integer vocabulary round-trips to string keys in
    # NUMERIC order ('10' < '2'), so sort here and reorder the property
    # columns by the same permutation to keep positional assignment aligned
    keyarr = np.asarray(nodes["node"].astype(str), dtype="U")
    order = np.argsort(keyarr, kind="stable")
    nodes = nodes.iloc[order].reset_index(drop=True)
    idmap = IdMap(keyarr[order])
    edges = rd.read_csv(os.path.join(csv_dir, "relationships"))

    def norm(t):
        import pyarrow as _pa
        import pyarrow.compute as _pc

        return _pa.table(
            {
                "src": _pc.cast(t["src"], _pa.string()),
                "dst": _pc.cast(t["dst"], _pa.string()),
                "weight": _pc.cast(t["weight"], _pa.float64()),
            }
        )

    enc = encode_edges(
        edges.map_batches(norm, batch_format="pyarrow"), idmap
    ).materialize()
    g = GraphStore.project(
        enc, path, idmap=idmap,
        num_partitions=num_partitions or info["num_partitions"],
        directed=info["directed"],
    )
    for col in nodes.columns:
        if col != "node":
            g.add_node_property(col, nodes[col].to_numpy())
    return g

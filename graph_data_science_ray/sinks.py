"""Result sinks — the reference's write-back/export surface.

Reference: core-write/src/main/java/org/neo4j/gds/core/write/NodePropertyExporter.java
(batched write-back) and the CSV exporter pair (SURVEY.md §2.3). Our sink
is partitioned Parquet: one directory per result, atomically committed
with a _SUCCESS marker so a rerun can skip finished outputs.
"""

from __future__ import annotations

import os


def write_results(result, path: str, partition_rows: int = 1_000_000) -> str:
    """Write an algorithm result (DataFrame / Dataset / Table) to a
    partitioned Parquet directory with a commit marker; returns the path.
    Skips the write when the marker already exists (resumable output)."""
    done = os.path.join(path, "_SUCCESS")
    if os.path.exists(done):
        return path
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    if isinstance(result, pd.DataFrame):
        ds = rd.from_pandas(result)
    elif isinstance(result, pa.Table):
        ds = rd.from_arrow(result)
    else:
        ds = result
    ds.write_parquet(path, min_rows_per_file=partition_rows)
    with open(done, "w") as f:
        f.write("ok")
    return path


def write_sharded(
    ds,
    path: str,
    key_cols: list[str],
    num_shards: int = 64,
) -> dict:
    """Shard-granular resumable Parquet sink.

    Hash-partitions ``ds`` on ``key_cols`` into ``num_shards`` key-range
    directories ``shard=<k>/`` under ``path``, each committed with its
    own ``_SUCCESS`` marker. A rerun after a mid-job failure SKIPS the
    committed shards entirely — rows for finished shards are filtered
    out before the shuffle, so only the missing key ranges recompute
    and rewrite (the brief's "one directory per input shard / key
    range" resumability contract, finer than the whole-output marker of
    :func:`write_results`).

    Each shard is written by the task that owns its group (one file per
    shard, deterministic membership via the repo's stable row hash), so
    reruns produce byte-identical shard contents. Returns a manifest
    ``{shard: rows}`` covering the shards written THIS call.
    """
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from graph_data_science_ray.pipelines.agg import _stable_row_hash

    os.makedirs(path, exist_ok=True)
    missing = [
        k for k in range(num_shards)
        if not os.path.exists(
            os.path.join(path, f"shard={k:05d}", "_SUCCESS"))
    ]
    if not missing:
        return {}
    missing_set = frozenset(missing)

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df.assign(__shard=pd.Series([], dtype=np.int64))
        df = df.copy()
        df["__shard"] = (
            _stable_row_hash(df, key_cols) % num_shards
        ).astype(np.int64)
        return df[df["__shard"].isin(missing_set)]

    def write_group(g: pd.DataFrame) -> pd.DataFrame:
        shard = int(g["__shard"].iloc[0])
        d = os.path.join(path, f"shard={shard:05d}")
        os.makedirs(d, exist_ok=True)
        out = g.drop(columns="__shard").sort_values(
            key_cols, kind="mergesort"
        ).reset_index(drop=True)
        pq.write_table(
            pa.Table.from_pandas(out, preserve_index=False),
            os.path.join(d, "part-0.parquet"),
        )
        return pd.DataFrame(
            {"shard": np.array([shard], dtype=np.int64),
             "rows": np.array([len(out)], dtype=np.int64)}
        )

    manifest = (
        ds.map_batches(tag, batch_format="pandas")
        .groupby("__shard")
        .map_groups(write_group, batch_format="pandas")
        .to_pandas()
    )
    written = dict(zip(manifest["shard"].astype(int),
                       manifest["rows"].astype(int)))
    # commit only shards whose write task completed; a shard with no
    # rows this run (hash gap) still commits empty so reruns skip it
    for k in missing:
        d = os.path.join(path, f"shard={k:05d}")
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "_SUCCESS"), "w") as f:
            f.write("ok")
    return written


def read_sharded(path: str):
    """Read back a :func:`write_sharded` directory as one Dataset
    (committed shards only)."""
    import glob

    import ray.data as rd

    files = sorted(
        f
        for d in glob.glob(os.path.join(path, "shard=*"))
        if os.path.exists(os.path.join(d, "_SUCCESS"))
        for f in glob.glob(os.path.join(d, "*.parquet"))
    )
    return rd.read_parquet(files)

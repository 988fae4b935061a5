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

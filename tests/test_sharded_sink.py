"""Shard-granular resumable Parquet sink: skip-finished-shards contract."""

import glob
import os

import numpy as np
import pandas as pd
import ray.data as rd


def _docs(n=200):
    return rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "val": np.arange(n, dtype=np.int64) * 7,
    })).repartition(5)


def test_write_sharded_resume_skips_committed(tmp_path):
    from graph_data_science_ray.sinks import read_sharded, write_sharded

    path = str(tmp_path / "out")
    first = write_sharded(_docs(), path, ["doc_id"], num_shards=8)
    assert sum(first.values()) == 200 and set(first) == set(range(8))
    back = read_sharded(path).to_pandas().sort_values("doc_id")
    assert back["doc_id"].tolist() == list(range(200))

    # record committed-shard mtimes, then simulate a mid-job failure:
    # two shards lose their marker + file
    kept_mtime = {}
    for k in range(8):
        d = os.path.join(path, f"shard={k:05d}")
        if k in (2, 5):
            os.remove(os.path.join(d, "_SUCCESS"))
            for f in glob.glob(os.path.join(d, "*.parquet")):
                os.remove(f)
        else:
            kept_mtime[k] = os.path.getmtime(
                os.path.join(d, "part-0.parquet"))

    second = write_sharded(_docs(), path, ["doc_id"], num_shards=8)
    # only the two missing shards recomputed
    assert set(second) == {2, 5}
    # committed shards were not rewritten
    for k, m in kept_mtime.items():
        d = os.path.join(path, f"shard={k:05d}")
        assert os.path.getmtime(os.path.join(d, "part-0.parquet")) == m
    # and the recovered output is byte-identical to the first run
    back2 = read_sharded(path).to_pandas().sort_values("doc_id")
    assert back2.reset_index(drop=True).equals(
        back.reset_index(drop=True))

    # fully committed -> pure no-op
    assert write_sharded(_docs(), path, ["doc_id"], num_shards=8) == {}

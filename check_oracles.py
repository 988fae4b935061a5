"""Local driver simulation: run EVERY queries() entry that has an
oracle_sql() and compare against DuckDB the way the driver does
(row count, sorted column names, order-insensitive exact values).

Usage:
    python check_oracles.py [--sf /root/testdata/sf0.01] [--only name1,name2]

Prints one line per query and a JSON summary; exit code 1 on any
mismatch/error. Queries without an oracle are run rows-only (len > 0).
"""

from __future__ import annotations

import argparse
import importlib
import json
import os
import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = pd.DataFrame(df)
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _compare(mine: pd.DataFrame, orc: pd.DataFrame) -> str | None:
    if list(mine.columns) != list(orc.columns):
        return f"schema {list(mine.columns)} != {list(orc.columns)}"
    if len(mine) != len(orc):
        return f"rows {len(mine)} != {len(orc)}"
    for c in mine.columns:
        a, b = mine[c].to_numpy(), orc[c].to_numpy()
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            if not (a.astype(float) == b.astype(float)).all():
                bad = int((~(a.astype(float) == b.astype(float))).sum())
                return f"col {c}: {bad} float mismatches"
        else:
            if not (a.astype(str) == b.astype(str)).all():
                bad = int((~(a.astype(str) == b.astype(str))).sum())
                return f"col {c}: {bad} value mismatches"
    return None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default="")
    ap.add_argument("--skip-rows-only", action="store_true")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    entry = importlib.import_module("__ray_entry__")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    qs = entry.queries()
    sqls = entry.oracle_sql()
    only = {s for s in args.only.split(",") if s}
    results: dict[str, dict] = {}
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            mine = fn(args.sf)
            if hasattr(mine, "to_pandas"):
                mine = mine.to_pandas()
            mine = pd.DataFrame(mine)
            if name in sqls:
                orc = con.sql(sqls[name]).df()
                err = _compare(_norm(mine), _norm(orc))
                status = "pass" if err is None else f"FAIL: {err}"
            else:
                if args.skip_rows_only:
                    continue
                status = "rows_only" if len(mine) > 0 else "FAIL: 0 rows"
        except Exception as e:  # noqa: BLE001
            traceback.print_exc()
            status = f"FAIL: exception {type(e).__name__}: {e}"
        dt = time.time() - t0
        results[name] = {"status": status, "sec": round(dt, 2)}
        if status == "pass":
            n_pass += 1
        elif status == "rows_only":
            n_rows_only += 1
        else:
            n_fail += 1
        print(f"{name:32s} {status:12s} {dt:6.2f}s", flush=True)

    print(
        json.dumps(
            {
                "sf": args.sf,
                "pass": n_pass,
                "rows_only": n_rows_only,
                "fail": n_fail,
                "failures": {
                    k: v["status"] for k, v in results.items() if v["status"].startswith("FAIL")
                },
            }
        )
    )
    ray.shutdown()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())

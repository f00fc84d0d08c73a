"""Driver-mimic: run every __spark_entry__ query against its DuckDB oracle.

Usage: python tools/check_entry.py [sf_dir] [query ...]

Mirrors the per-round correctness gate: for each query with an oracle,
compare row count, sorted column names, and order-insensitive values
(exact string match after canonicalization).  Oracle-less queries get a
rows-only check.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if col.dtype == object:
            df[c] = col.map(lambda v: repr(v))
        elif str(col.dtype).startswith(("float", "Float")):
            df[c] = col.round(6).map(lambda v: repr(v))
        else:
            df[c] = col.map(lambda v: repr(v))
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # DEFAULT-config session, deliberately NOT get_spark(): the driver's gate
    # runs entry queries in a vanilla Spark 4 session (TIMESTAMP_NTZ parquet
    # inference on, host time zone) — regression-guard that every query is
    # robust to it.
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    spark = (
        SparkSession.builder.appName("check-entry")
        .master(f"local[{cpus}]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as exc:
            print(f"FAIL  {name}: query raised {type(exc).__name__}: {exc}")
            failures += 1
            continue
        secs = time.monotonic() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(got)} rows ({secs:.1f}s, rows-only check)")
            if len(got) == 0:
                print(f"WARN  {name}: zero rows")
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as exc:
            print(f"FAIL  {name}: oracle raised {type(exc).__name__}: {exc}")
            failures += 1
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL  {name}: columns {list(g.columns)} != {list(e.columns)}")
            failures += 1
            continue
        if len(g) != len(e):
            print(f"FAIL  {name}: rows {len(g)} != {len(e)}")
            failures += 1
            continue
        neq = (g != e).any(axis=1)
        if neq.any():
            i = neq.idxmax()
            print(f"FAIL  {name}: {int(neq.sum())}/{len(g)} rows differ; first diff:")
            print("  spark:", g.loc[i].to_dict())
            print("  duck :", e.loc[i].to_dict())
            failures += 1
            continue
        print(f"OK    {name}: {len(g)} rows match ({secs:.1f}s)")
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

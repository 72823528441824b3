#!/usr/bin/env python
"""Local replica of the driver's t2 correctness gate.

Runs every registered query's Spark plan AND its DuckDB oracle over the same
parquet tables, then compares row count, column names, and order-insensitive
values. Usage:

    python tools/check_queries.py [--sf /root/testdata/sf0.01] [name ...]
"""

from __future__ import annotations

import argparse
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def normalize(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(normalize(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, normalize(x)) for k, x in v.items()))
    return v


def rowset(columns, rows):
    """(sorted column names, multiset of value-tuples in that column order)."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    names = [columns[i] for i in order]
    vals = sorted(
        (tuple(normalize(r[i]) for i in order) for r in rows),
        key=repr,
    )
    return names, vals


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--skip-spark-stop", action="store_true")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args.names or list(queries)

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("check_queries")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    failures = []
    for name in names:
        if name not in queries:
            print(f"[{name}] UNKNOWN query name")
            failures.append(name)
            continue
        t0 = time.time()
        try:
            df = queries[name](spark, args.sf)
            spark_cols = df.columns
            spark_rows = [tuple(r) for r in df.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"[{name}] SPARK FAIL: {type(e).__name__}: {str(e)[:400]}")
            failures.append(name)
            continue
        t_spark = time.time() - t0
        sql = oracles.get(name)
        if sql is None:
            print(f"[{name}] rows-only: {len(spark_rows)} rows "
                  f"(spark {t_spark:.1f}s)")
            continue
        t1 = time.time()
        try:
            res = con.execute(sql)
            oracle_cols = [d[0] for d in res.description]
            oracle_rows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"[{name}] ORACLE FAIL: {type(e).__name__}: {str(e)[:400]}")
            failures.append(name)
            continue
        t_oracle = time.time() - t1

        s_names, s_vals = rowset(spark_cols, spark_rows)
        o_names, o_vals = rowset(oracle_cols, oracle_rows)
        problems = []
        if len(spark_rows) != len(oracle_rows):
            problems.append(f"rowcount spark={len(spark_rows)} oracle={len(oracle_rows)}")
        if s_names != o_names:
            problems.append(f"columns spark={s_names} oracle={o_names}")
        if not problems and s_vals != o_vals:
            diffs = [
                (a, b) for a, b in zip(s_vals, o_vals) if a != b
            ][:3]
            problems.append(f"values differ; first diffs={diffs}")
        if problems:
            print(f"[{name}] MISMATCH: {'; '.join(problems)}")
            failures.append(name)
        else:
            print(f"[{name}] OK: {len(spark_rows)} rows "
                  f"(spark {t_spark:.1f}s, oracle {t_oracle:.1f}s)")

    if not args.skip_spark_stop:
        spark.stop()
    if failures:
        print(f"\n{len(failures)} FAILED: {failures}")
        return 1
    print(f"\nall {len(names)} queries match")
    return 0


if __name__ == "__main__":
    sys.exit(main())

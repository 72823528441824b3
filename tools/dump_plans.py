#!/usr/bin/env python
"""Dump .explain('formatted') for every bench-flagged query to
plans/r15/<name>_<suffix>.txt  (suffix from argv[1], default 'before').

Optional argv[2:] restricts to the named queries.
"""
from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = (Path(__file__).resolve().parent.parent / "plans"
               / os.environ.get("SPARK_GRAFT_PLANS_DIR", "r16"))
    out_dir.mkdir(parents=True, exist_ok=True)

    from pyspark.sql import SparkSession

    import __spark_entry__  # noqa: F401
    from flink_connector_http_spark.plans import REGISTRY

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("dump-plans")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "6g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    for spec in REGISTRY.values():
        if not spec.bench or (only and spec.name not in only):
            continue
        path = out_dir / f"{spec.name}_{suffix}.txt"
        try:
            df = spec.fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as err:  # noqa: BLE001
            plan = f"ERROR building plan: {err}"
        path.write_text(plan)
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()

"""Scan-level pushdown proofs: limit, filter, column pruning, and
partition pruning — the properties that decide whether a 100 TB scan reads
100 TB or a few gigabytes.

Reference parity: limit pushdown is a declared-but-no-op interface in the
reference (``HttpLookupTableSource.java:199`` — empty ``applyLimit``
body), so the host engine's behavior IS the contract; these tests pin
Spark's side of it. Partition pruning has no reference analogue (the
connector is not a file source) but is the single most important scan
property for the parquet lake this engine fronts.
"""

import shutil

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _formatted(df):
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def _executed(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_limit_pushdown_local_before_exchange(spark):
    """A terminal limit(n) plans as CollectLimit (driver pulls partitions
    incrementally, stopping at n); a limit feeding further computation
    plans LocalLimit-below-exchange so each scan task stops at n rows.
    Either way no task materializes the full table."""
    df = spark.read.parquet(f"{SF}/lineitem.parquet").limit(7)
    assert "CollectLimit" in _executed(df)
    assert len(df.collect()) == 7

    downstream = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .limit(100)
        .groupBy("l_returnflag")
        .count()
    )
    plan = _executed(downstream)
    assert "LocalLimit" in plan and "GlobalLimit" in plan
    # stringified plan is top-down: global → exchange → local → scan
    assert plan.index("LocalLimit") > plan.index("GlobalLimit")
    assert downstream.count() > 0


def test_orderby_limit_becomes_takeordered(spark):
    """top-k is TakeOrderedAndProject (per-partition heap + merge), never a
    full sort: the difference between O(n log k) and a terabyte shuffle."""
    df = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .orderBy(F.desc("o_totalprice"))
        .limit(5)
    )
    assert "TakeOrderedAndProject" in _executed(df)
    rows = df.collect()
    assert len(rows) == 5
    assert rows[0].o_totalprice >= rows[-1].o_totalprice


def test_filter_and_projection_reach_scan(spark):
    """Predicate + column pruning land in PushedFilters / ReadSchema."""
    df = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .filter(F.col("l_quantity") > 45.0)
        .select("l_orderkey", "l_quantity")
    )
    plan = _formatted(df)
    assert "GreaterThan(l_quantity,45.0)" in plan
    # scan reads exactly the two projected columns
    assert "struct<l_orderkey:bigint,l_quantity:double>" in plan


@pytest.fixture()
def partitioned_orders(spark, tmp_path):
    """orders re-written partitioned by order year — the layout a 100 TB
    lake would use (date-partitioned facts)."""
    path = str(tmp_path / "orders_by_year")
    (
        spark.read.parquet(f"{SF}/orders.parquet")
        .withColumn("o_year", F.year("o_orderdate"))
        .write.partitionBy("o_year")
        .mode("overwrite")
        .parquet(path)
    )
    yield path
    shutil.rmtree(path, ignore_errors=True)


def test_partition_pruning(spark, partitioned_orders):
    df = spark.read.parquet(partitioned_orders).filter(F.col("o_year") == 1997)
    plan = _formatted(df)
    # the year predicate becomes a PartitionFilters entry, not a row filter
    assert "PartitionFilters: [isnotnull(o_year" in plan
    assert "(o_year" in plan.split("PartitionFilters")[1].split("]")[0]
    # and the pruned scan reads only the matching partition directories
    n_1997 = df.count()
    truth = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .filter(F.year("o_orderdate") == 1997)
        .count()
    )
    assert n_1997 == truth > 0


def test_dynamic_partition_pruning_from_dim_filter(spark, partitioned_orders):
    """A dim-side filter prunes fact partitions at runtime (DPP): the
    broadcast result feeds a dynamicpruning subquery on the partition
    column — the mechanism that keeps star-schema scans bounded when the
    partition predicate is only implied by the join."""
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    fact = spark.read.parquet(partitioned_orders)
    # DPP requires a SELECTIVE predicate on the dim side — an unfiltered
    # dim would prune nothing, so Spark (correctly) skips the subquery
    years = spark.createDataFrame(
        [(1995, "old"), (1996, "new"), (1997, "new")], ["y", "tag"]
    ).filter(F.col("tag") == "new")
    joined = fact.join(F.broadcast(years), fact["o_year"] == years["y"])
    plan = _formatted(joined)
    assert "dynamicpruning" in plan.lower()
    truth = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .filter(F.year("o_orderdate").isin(1996, 1997))
        .count()
    )
    assert joined.count() == truth > 0

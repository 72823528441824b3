"""Bucketed co-located joins: the zero-shuffle join strategy for repeated
big-table joins at 100 TB.

Both sides are written with ``bucketBy(N, key)`` + ``sortBy(key)`` into the
session warehouse; a join on the bucket key then requires NO Exchange on
either side — Spark trusts the on-disk hash layout (output partitioning is
reported by the bucketed scan). This is the design stance the engine
documents for fact-fact joins where broadcast is impossible: pre-bucket
both tables on the join key at ingest, and every subsequent join or
aggregation on that key is shuffle-free.
"""

import pytest


@pytest.fixture()
def bucketed_tables(spark):
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    sf = "/root/testdata/sf0.001"
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    (orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
     .mode("overwrite").saveAsTable("b_orders"))
    (li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
     .mode("overwrite").saveAsTable("b_lineitem"))
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def _executed_plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    b_orders, b_lineitem = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        li, orders = spark.table(b_lineitem), spark.table(b_orders)
        joined = li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        plan = _executed_plan(joined)
        # co-located: SortMergeJoin with NO Exchange on either side
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        # correctness: same row count as the shuffled join over raw parquet
        sf = "/root/testdata/sf0.001"
        raw_li = spark.read.parquet(f"{sf}/lineitem.parquet")
        raw_orders = spark.read.parquet(f"{sf}/orders.parquet")
        raw = raw_li.join(
            raw_orders, raw_li["l_orderkey"] == raw_orders["o_orderkey"]
        ).count()
        assert joined.count() == raw
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")


def test_bucketed_groupby_has_no_shuffle(spark, bucketed_tables):
    _, b_lineitem = bucketed_tables
    agg = spark.table(b_lineitem).groupBy("l_orderkey").count()
    plan = _executed_plan(agg)
    # aggregation on the bucket key reuses the on-disk partitioning
    assert "Exchange hashpartitioning" not in plan

"""Skew handling at scale: AQE skew-join splitting and manual salting.

The synthetic test tables are uniform, so these tests manufacture a hot
key and prove the two documented mitigations:

1. AQE ``OptimizeSkewedJoin`` — with thresholds lowered to test scale, a
   sort-merge join against a hot key reports skew-optimized partitions
   (``isSkew=true`` in the plan), while results stay identical.
2. Manual salting — spread a hot aggregation key over N salt buckets,
   partially aggregate, then merge; byte-identical result to the direct
   aggregation with the per-key shuffle volume cut by the salt factor.
"""

import pyspark.sql.functions as F


def test_aqe_splits_skewed_join_partitions(spark):
    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
        # 50k rows of key=0 vs 100 distinct other keys → one hot partition
        left = spark.range(0, 51_000).select(
            F.when(F.col("id") < 50_000, 0).otherwise(F.col("id") % 100)
            .alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
        right = spark.range(0, 100).select(F.col("id").alias("k"),
                                           F.col("id").alias("v"))
        joined = left.join(right, "k")
        # collect() (not count(), which plans a different query) so THIS
        # query's adaptive plan is finalized, then read it back
        assert len(joined.collect()) == 51_000  # every k lands in 0..99
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan  # SortMergeJoin(skew=true)
        assert "skewed" in plan  # AQEShuffleRead coalesced and skewed
    finally:
        for k, v in saved.items():
            conf.set(k, v)


def test_salted_aggregation_matches_direct(spark):
    n_salt = 16
    # hot key: 90% of rows share user 0
    df = spark.range(0, 20_000).select(
        F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 50).alias("user"),
        (F.col("id") % 7).cast("double").alias("v"),
    )
    direct = {
        (r["user"]): (r["n"], r["s"])
        for r in df.groupBy("user")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    salted = (
        df.withColumn("salt", F.pmod(F.hash("v"), F.lit(n_salt)))
        .groupBy("user", "salt")
        .agg(F.count(F.lit(1)).alias("pn"), F.sum("v").alias("ps"))
        .groupBy("user")
        .agg(F.sum("pn").alias("n"), F.sum("ps").alias("s"))
    )
    got = {(r["user"]): (r["n"], r["s"]) for r in salted.collect()}
    assert set(got) == set(direct)
    for k in direct:
        assert got[k][0] == direct[k][0]
        assert abs(got[k][1] - direct[k][1]) < 1e-6

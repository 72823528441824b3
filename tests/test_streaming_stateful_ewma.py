"""Multi-batch semantics of the streaming EWMA: state (the cents ring)
carries across micro-batches and the smoothed value matches the exact
dyadic-weight fold over the concatenated history."""

import pyspark.sql.types as T

from flink_connector_http_spark.streaming.stateful import ewma_stream

SCHEMA = T.StructType([
    T.StructField("user", T.StringType()),
    T.StructField("seq", T.LongType()),
    T.StructField("cents", T.LongType()),
])


def exact_ewma(cents_newest_first, depth=10):
    recent = cents_newest_first[:depth]
    s = sum(c << (depth - 1 - k) for k, c in enumerate(recent))
    d = sum(1 << (depth - 1 - k) for k in range(len(recent)))
    return s / (d * 100)


def test_ewma_state_carries_across_batches(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()

    def drop(rows):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(str(in_dir))

    drop([("a", 1, 100), ("a", 2, 300), ("b", 1, 1000)])
    query = (
        ewma_stream(
            spark.readStream.schema(SCHEMA).parquet(str(in_dir)),
            ["user"], "cents", ["seq"],
        )
        .writeStream.format("memory")
        .queryName("ewma_t")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        query.processAllAvailable()
        got = {(r.user): r.ewma for r in spark.table("ewma_t").collect()}
        assert got["a"] == exact_ewma([300, 100])
        assert got["b"] == exact_ewma([1000])

        # batch 2: history extends; newest-first ring spans both batches
        drop([("a", 3, 500)])
        query.processAllAvailable()
        rows = [(r.user, r.ewma) for r in spark.table("ewma_t").collect()]
        assert (("a", exact_ewma([500, 300, 100]))) in rows
    finally:
        query.stop()


def test_ewma_ring_truncates_at_depth(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    rows = [("u", i, 100 * (i + 1)) for i in range(14)]  # 14 > depth 10
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(in_dir))
    query = (
        ewma_stream(
            spark.readStream.schema(SCHEMA).parquet(str(in_dir)),
            ["user"], "cents", ["seq"],
        )
        .writeStream.format("memory")
        .queryName("ewma_tr")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)
    got = spark.table("ewma_tr").collect()
    newest_first = [100 * (i + 1) for i in range(13, 3, -1)]
    assert got[0].ewma == exact_ewma(newest_first)

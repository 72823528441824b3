"""Multi-batch semantics of the streaming CUSUM alarm: the two-bigint
state (prefix sum, running min) carries across micro-batches, resets
drain the statistic, and alarms fire exactly when the Page statistic
max(0, S + x - k) exceeds h over the concatenated history."""

import pyspark.sql.types as T

from flink_connector_http_spark.streaming.stateful import cusum_stream

SCHEMA = T.StructType([
    T.StructField("key", T.StringType()),
    T.StructField("event_id", T.LongType()),
    T.StructField("cents", T.LongType()),
])

K, H = 100, 250  # small test constants


def page_cusum(xs, k=K):
    s, out = 0, []
    for x in xs:
        s = max(0, s + x - k)
        out.append(s)
    return out


def _start(spark, in_dir, ckpt, name):
    return (
        cusum_stream(
            spark.readStream.schema(SCHEMA).parquet(str(in_dir)),
            ["key"], "cents", ["event_id"],
            k_cents=K, h_cents=H,
        )
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .start()
    )


def test_cusum_state_carries_and_resets_across_batches(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()

    def drop(rows):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(str(in_dir))

    # batch 1: S walks 200, 400 -> one alarm at event 2 (400 > 250)
    drop([("a", 1, 300), ("a", 2, 300)])
    query = _start(spark, in_dir, tmp_path / "ckpt", "cusum_t")
    try:
        query.processAllAvailable()
        got = sorted(
            (r.key, r.event_id, r.s_scaled)
            for r in spark.table("cusum_t").collect()
        )
        assert got == [("a", 2, 400)]
        assert page_cusum([300, 300]) == [200, 400]

        # batch 2: a zero drains S to 300 (still alarming), then a quiet
        # run resets below threshold, then a burst re-alarms — state
        # carried the batch-1 statistic exactly
        drop([("a", 3, 0), ("a", 4, 0), ("a", 5, 0), ("a", 6, 460)])
        query.processAllAvailable()
        expect_s = page_cusum([300, 300, 0, 0, 0, 460])
        assert expect_s == [200, 400, 300, 200, 100, 460]
        got2 = sorted(
            (r.key, r.event_id, r.s_scaled)
            for r in spark.table("cusum_t").collect()
        )
        assert got2 == [("a", 2, 400), ("a", 3, 300), ("a", 6, 460)]
    finally:
        query.stop()


def test_cusum_keys_are_independent(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    rows = [("a", 1, 300), ("a", 2, 300), ("b", 1, 50), ("b", 2, 50)]
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(in_dir))
    query = _start(spark, in_dir, tmp_path / "ckpt", "cusum_k")
    query.awaitTermination(120)
    try:
        query.processAllAvailable()
        got = {(r.key, r.event_id) for r in spark.table("cusum_k").collect()}
        assert got == {("a", 2)}  # b never accumulates (50 < k)
    finally:
        query.stop()

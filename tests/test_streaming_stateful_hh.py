"""Multi-batch semantics of the heavy-hitters stateful operator
(transformWithStateInPandas): counts accumulate across micro-batches, a key
emits only in batches where it received rows while at/over the threshold."""

import pyspark.sql.types as T

from flink_connector_http_spark.streaming.stateful import heavy_hitters_stream

SCHEMA = T.StructType([T.StructField("k", T.StringType())])


def test_heavy_hitters_accumulate_across_batches(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()

    def drop(keys):
        spark.createDataFrame([(k,) for k in keys], SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(str(in_dir))

    # batch 1: a=2 (emits, ≥2), b=1 (silent)
    drop(["a", "a", "b"])
    query = (
        heavy_hitters_stream(
            spark.readStream.schema(SCHEMA).parquet(str(in_dir)), ["k"], 2
        )
        .writeStream.format("memory")
        .queryName("hh")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        query.processAllAvailable()
        got = sorted((r.k, r.n_events) for r in spark.table("hh").collect())
        assert got == [("a", 2)]

        # batch 2: b crosses (1+1=2 → emits), a grows (2+1=3 → emits again),
        # c starts at 1 (silent)
        drop(["b", "a", "c"])
        query.processAllAvailable()
        got = sorted((r.k, r.n_events) for r in spark.table("hh").collect())
        assert got == [("a", 2), ("a", 3), ("b", 2)]

        # batch 3: only c — a and b receive no rows, so NO emission for
        # them despite being over threshold; c still below (2 < ... wait 2≥2)
        drop(["c"])
        query.processAllAvailable()
        got = sorted((r.k, r.n_events) for r in spark.table("hh").collect())
        assert got == [("a", 2), ("a", 3), ("b", 2), ("c", 2)]
    finally:
        query.stop()

"""Multi-batch semantics of the running-max stateful operator: a new max
emits, a lower value is silent, state carries across micro-batches."""

import pyspark.sql.types as T

from flink_connector_http_spark.streaming.stateful import running_max_stream

SCHEMA = T.StructType([
    T.StructField("user", T.StringType()),
    T.StructField("value", T.DoubleType()),
])


def test_running_max_emits_only_on_new_high(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()

    def drop(rows):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(str(in_dir))

    drop([("a", 5.0), ("a", 2.0), ("b", 1.0)])
    query = (
        running_max_stream(
            spark.readStream.schema(SCHEMA).parquet(str(in_dir)),
            ["user"],
            "value",
        )
        .writeStream.format("memory")
        .queryName("runmax")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        query.processAllAvailable()
        emitted = [(r.user, r.max_value) for r in spark.table("runmax").collect()]
        assert sorted(emitted) == [("a", 5.0), ("b", 1.0)]

        # batch 2: lower value for a (silent), new high for b (emits)
        drop([("a", 3.0), ("b", 7.0)])
        query.processAllAvailable()
        emitted = sorted(
            (r.user, r.max_value) for r in spark.table("runmax").collect()
        )
        assert emitted == [("a", 5.0), ("b", 1.0), ("b", 7.0)]

        # batch 3: new high for a
        drop([("a", 9.5)])
        query.processAllAvailable()
        emitted = sorted(
            (r.user, r.max_value) for r in spark.table("runmax").collect()
        )
        assert emitted == [("a", 5.0), ("a", 9.5), ("b", 1.0), ("b", 7.0)]
    finally:
        query.stop()

"""Multi-batch semantics of the streaming drift monitor: the first
micro-batch's histogram freezes as the baseline, later batches report a
nonzero TVD against it, and state never grows past the bucket count."""

import pyspark.sql.types as T

from flink_connector_http_spark.streaming.stateful import (
    DRIFT_EDGES,
    value_drift_stream,
)

SCHEMA = T.StructType([
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
])


def hist(values):
    counts = [0] * (len(DRIFT_EDGES) + 1)
    for v in values:
        for i, edge in enumerate(DRIFT_EDGES):
            if v < edge:
                counts[i] += 1
                break
        else:
            counts[-1] += 1
    return counts


def tvd(counts, baseline):
    nc, nb = sum(counts), sum(baseline)
    return round(
        0.5 * sum(abs(c / nc - b / nb) for c, b in zip(counts, baseline)), 6
    )


def test_drift_baseline_freezes_and_tvd_moves(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()

    def drop(rows):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(str(in_dir))

    batch1 = [10.0, 20.0, 60.0, 200.0]        # hist [2, 1, 1, 0]
    drop([("click", v) for v in batch1])
    query = (
        value_drift_stream(
            spark.readStream.schema(SCHEMA).parquet(str(in_dir)),
            ["event_type"], "value",
        )
        .writeStream.format("memory")
        .queryName("drift_t")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        query.processAllAvailable()
        rows = {
            (r.event_type, r.batch_seq): r
            for r in spark.table("drift_t").collect()
        }
        first = rows[("click", 1)]
        assert [first.b0, first.b1, first.b2, first.b3] == hist(batch1)
        assert first.n_events == len(batch1)
        assert first.tvd_vs_baseline == 0.0   # the baseline IS batch 1

        # batch 2 shifts mass to the top bucket; TVD vs the FROZEN batch-1
        # baseline, not vs a running mixture
        batch2 = [400.0, 500.0, 30.0]          # hist [1, 0, 0, 2]
        drop([("click", v) for v in batch2])
        query.processAllAvailable()
        rows = {
            (r.event_type, r.batch_seq): r
            for r in spark.table("drift_t").collect()
        }
        second = rows[("click", 2)]
        assert [second.b0, second.b1, second.b2, second.b3] == hist(batch2)
        assert second.tvd_vs_baseline == tvd(hist(batch2), hist(batch1))
        assert second.tvd_vs_baseline > 0.0

        # an identical third batch re-reports the same drift (baseline
        # still frozen at batch 1)
        drop([("click", v) for v in batch2])
        query.processAllAvailable()
        rows = {
            (r.event_type, r.batch_seq): r
            for r in spark.table("drift_t").collect()
        }
        third = rows[("click", 3)]
        assert third.tvd_vs_baseline == second.tvd_vs_baseline
    finally:
        query.stop()


def test_drift_keys_are_independent(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    spark.createDataFrame(
        [("a", 10.0), ("a", 60.0), ("b", 400.0)], SCHEMA
    ).coalesce(1).write.mode("append").parquet(str(in_dir))
    query = (
        value_drift_stream(
            spark.readStream.schema(SCHEMA).parquet(str(in_dir)),
            ["event_type"], "value",
        )
        .writeStream.format("memory")
        .queryName("drift_k")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        query.processAllAvailable()
        rows = {r.event_type: r for r in spark.table("drift_k").collect()}
        assert [rows["a"].b0, rows["a"].b1] == [1, 1]
        assert rows["b"].b3 == 1 and rows["b"].n_events == 1
        assert all(r.tvd_vs_baseline == 0.0 for r in rows.values())
    finally:
        query.stop()

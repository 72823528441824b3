"""Stateful recovery: a watermarked window aggregation stopped mid-stream
and restarted from its checkpoint must (a) restore open-window state, (b)
merge post-restart rows into it, and (c) never re-emit a window that
closed before the stop.
"""

import datetime as dt

import pyspark.sql.types as T

from flink_connector_http_spark.streaming.windows import windowed_counts

EVENT_SCHEMA = T.StructType([
    T.StructField("ts", T.TimestampType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
])

t = dt.datetime.fromisoformat


def _write(spark, path, rows):
    spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(path))


def _copy_in(in_dir, src_dir, name):
    import os

    src = next(src_dir.glob("*.parquet"))
    os.link(src, in_dir / name)


def _run_until_idle(spark, in_dir, ckpt, out_dir):
    # the memory sink cannot recover from a checkpoint; the parquet file
    # sink can (exactly-once via the checkpoint + file-sink metadata log)
    query = (
        windowed_counts(
            spark.readStream.schema(EVENT_SCHEMA).parquet(str(in_dir))
        )
        .writeStream.format("parquet")
        .option("path", str(out_dir))
        .outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)
    return [
        ((r["window_start"].isoformat(), r["event_type"]), (r["n_events"], r["sum_value"]))
        for r in spark.read.parquet(str(out_dir)).collect()
    ]


def test_window_state_survives_restart(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    # run 1: Jan-1 rows + a Jan-3 row; nothing closes yet (watermark from a
    # single batch only takes effect in the NEXT batch)
    _write(spark, tmp_path / "f1", [
        (t("2024-01-01 10:00:00"), "click", 1.0),
        (t("2024-01-03 12:00:00"), "view", 5.0),
    ])
    _copy_in(in_dir, tmp_path / "f1", "f1.parquet")
    out = tmp_path / "out"
    first = _run_until_idle(spark, in_dir, tmp_path / "ckpt", out)
    # availableNow runs a final no-data batch, so Jan-1 closed in run 1
    assert dict(first).get(("2024-01-01T00:00:00", "click")) == (1, 1.0)

    # run 2, SAME checkpoint + sink: one more Jan-3 row plus a Jan-5 row
    # that pushes the watermark past Jan 4. Restored state must still hold
    # the open Jan-3 window, and the closed Jan-1 window must not re-emit.
    _write(spark, tmp_path / "f2", [
        (t("2024-01-03 13:00:00"), "view", 7.0),
        (t("2024-01-05 12:00:00"), "click", 9.0),
    ])
    _copy_in(in_dir, tmp_path / "f2", "f2.parquet")
    combined = _run_until_idle(spark, in_dir, tmp_path / "ckpt", out)
    keys = [k for k, _ in combined]
    # exactly-once: the Jan-1 window appears exactly once across both runs
    assert keys.count(("2024-01-01T00:00:00", "click")) == 1
    # Jan-3 closed with BOTH rows — the pre-restart row came from
    # recovered window state, not from re-reading f1
    assert dict(combined)[("2024-01-03T00:00:00", "view")] == (2, 12.0)

"""Watermark semantics for the event-time window operator
(`streaming/windows.py`): a window emits once when the watermark passes
its end, and rows arriving later than the watermark are DROPPED — the
closed window is never revised (append mode).

The closed-window emission path is oracle-checked end-to-end by the
``stream_window_events`` query; what only a multi-batch test can show is
the late-drop behavior, so this test forces two micro-batches with
``maxFilesPerTrigger=1``.
"""

import os
import time

import pyspark.sql.types as T

from flink_connector_http_spark.streaming.windows import windowed_counts

EVENT_SCHEMA = T.StructType([
    T.StructField("ts", T.TimestampType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
])


def _write_events(spark, path, rows):
    spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)


def test_late_rows_beyond_watermark_are_dropped(spark, tmp_path):
    import datetime as dt

    t = lambda s: dt.datetime.fromisoformat(s)  # noqa: E731
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    # batch 1: two rows in the Jan-1 window; one row on Jan 3 pushes the
    # watermark (1h behind max event time) to Jan-3 11:00
    _write_events(spark, str(tmp_path / "f1"), [
        (t("2024-01-01 10:00:00"), "click", 1.0),
        (t("2024-01-01 10:30:00"), "click", 2.0),
        (t("2024-01-03 12:00:00"), "view", 5.0),
    ])
    # batch 2: on-time row; the Jan-3 11:00 watermark is now in effect and
    # closes + emits the Jan-1 window with exactly the batch-1 rows
    _write_events(spark, str(tmp_path / "f2"), [
        (t("2024-01-03 12:30:00"), "view", 6.0),
    ])
    # batch 3: a LATE Jan-1 row, arriving after its window was emitted —
    # must be dropped, never merged or re-emitted (append-mode guarantee)
    _write_events(spark, str(tmp_path / "f3"), [
        (t("2024-01-01 11:00:00"), "click", 100.0),
        (t("2024-01-03 13:00:00"), "view", 7.0),
    ])
    # file source orders batches by modification time
    now = time.time()
    for i, name in enumerate(["f1", "f2", "f3"]):
        src = next((tmp_path / name).glob("*.parquet"))
        os.link(src, in_dir / f"{name}.parquet")
        os.utime(in_dir / f"{name}.parquet", (now - 60 + 30 * i,) * 2)

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir))
    )
    query = (
        windowed_counts(stream)
        .writeStream.format("memory")
        .queryName("wm_late_drop")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)
    out = spark.table("wm_late_drop").collect()
    # no duplicate emission of the Jan-1 window
    assert len(out) == 1
    rows = {
        (r["window_start"].isoformat(), r["event_type"]): (r["n_events"], r["sum_value"])
        for r in out
    }
    # Jan-1 window emitted with the batch-1 rows only: 2 events, sum 3.0 —
    # the late 100.0 row was dropped; the Jan-3 window never closed
    # (watermark stops at 12:00 < Jan-4 00:00), so it is absent
    assert rows == {("2024-01-01T00:00:00", "click"): (2, 3.0)}


def test_dedup_within_watermark_evicts_and_reemits(spark, tmp_path):
    """dropDuplicatesWithinWatermark semantics across micro-batches: a
    duplicate inside the watermark horizon is suppressed, but once the
    watermark passes first-arrival-ts + delay the key's state is evicted
    and a later recurrence is EMITTED AGAIN (at-least-once dedup — the
    bounded-state trade-off)."""
    import datetime as dt

    from flink_connector_http_spark.streaming.windows import (
        dedup_within_watermark,
    )

    t = lambda s: dt.datetime.fromisoformat(s)  # noqa: E731
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    # watermark delay is 1h (module default). Batch 1: key A at 00:00
    # (dedup state expires at 01:00), key B at 05:00 (expires 06:00);
    # watermark after the batch = 05:00 - 1h = 04:00.
    _write_events(spark, str(tmp_path / "f1"), [
        (t("2024-01-01 00:00:00"), "A", 1.0),
        (t("2024-01-01 05:00:00"), "B", 1.0),
    ])
    # Batch 2: BOTH recurrences are suppressed — state eviction runs at
    # batch COMMIT, so A's expired record (01:00 < the 04:00 watermark) is
    # still present while batch 2 processes, then swept at its end. The
    # duplicate does NOT refresh A's expiry (the horizon is fixed at first
    # arrival, SPARK-42931).
    _write_events(spark, str(tmp_path / "f2"), [
        (t("2024-01-01 05:30:00"), "A", 2.0),
        (t("2024-01-01 05:40:00"), "B", 2.0),
    ])
    # Batch 3: A was evicted at the end of batch 2 -> re-emitted; B's
    # state (expires 06:00) is still ahead of the watermark -> suppressed.
    _write_events(spark, str(tmp_path / "f3"), [
        (t("2024-01-01 05:50:00"), "A", 3.0),
        (t("2024-01-01 05:45:00"), "B", 3.0),
    ])
    now = time.time()
    for i, name in enumerate(["f1", "f2", "f3"]):
        src = next((tmp_path / name).glob("*.parquet"))
        os.link(src, in_dir / f"{name}.parquet")
        os.utime(in_dir / f"{name}.parquet", (now - 60 + 30 * i,) * 2)

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir))
    )
    query = (
        dedup_within_watermark(stream, ["event_type"])
        .writeStream.format("memory")
        .queryName("ddw_evict")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_ddw"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)
    out = [(r.event_type, r.value) for r in spark.table("ddw_evict").collect()]
    assert sorted(out) == [("A", 1.0), ("A", 3.0), ("B", 1.0)]

"""Multi-batch semantics of the streaming mSPRT sufficient statistics:
the six-bigint per-key state (per-arm cumulative count/Σcents/Σcents²)
carries across micro-batches, each (key, day) row holds the cumulative
statistics THROUGH that day, and an arm silent on a day leaves its
columns NULL (the batch query's day-sparse `wide` semantics)."""

import datetime as dt

import pyspark.sql.types as T

from flink_connector_http_spark.streaming.stateful import msprt_stats_stream

SCHEMA = T.StructType([
    T.StructField("event_type", T.StringType()),
    T.StructField("day", T.DateType()),
    T.StructField("arm", T.LongType()),
    T.StructField("cents", T.LongType()),
])

D1, D2, D3 = (dt.date(2026, 1, d) for d in (1, 2, 3))


def _start(spark, in_dir, ckpt, name):
    return (
        msprt_stats_stream(
            spark.readStream.schema(SCHEMA).parquet(str(in_dir)),
            "event_type", "day", "arm", "cents",
        )
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .start()
    )


def _rows(spark, name):
    return sorted(
        (r.event_type, r.day, r.n0, r.s0, r.ss0, r.n1, r.s1, r.ss1)
        for r in spark.table(name).collect()
    )


def test_msprt_state_carries_across_batches(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()

    def drop(rows):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(str(in_dir))

    # batch 1: day 1, both arms active
    drop([
        ("a", D1, 0, 100), ("a", D1, 0, 200), ("a", D1, 1, 150),
    ])
    query = _start(spark, in_dir, tmp_path / "ckpt", "msprt_t")
    try:
        query.processAllAvailable()
        assert _rows(spark, "msprt_t") == [
            ("a", D1, 2, 300, 50000, 1, 150, 22500),
        ]

        # batch 2: day 2 arm0 only, day 3 arm1 only — cumulative carries
        # from batch 1, and the silent arm's columns are NULL per day
        drop([
            ("a", D2, 0, 50),
            ("a", D3, 1, 10), ("a", D3, 1, 20),
        ])
        query.processAllAvailable()
        assert _rows(spark, "msprt_t") == [
            ("a", D1, 2, 300, 50000, 1, 150, 22500),
            ("a", D2, 3, 350, 52500, None, None, None),
            ("a", D3, None, None, None, 3, 180, 23000),
        ]
    finally:
        query.stop()


def test_msprt_keys_are_independent(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    rows = [
        ("a", D1, 0, 100), ("b", D1, 0, 7),
        ("a", D2, 0, 100), ("b", D2, 1, 9),
    ]
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(in_dir))
    query = _start(spark, in_dir, tmp_path / "ckpt", "msprt_k")
    try:
        query.processAllAvailable()
        assert _rows(spark, "msprt_k") == [
            ("a", D1, 1, 100, 10000, None, None, None),
            ("a", D2, 2, 200, 20000, None, None, None),
            ("b", D1, 1, 7, 49, None, None, None),
            ("b", D2, None, None, None, 1, 9, 81),
        ]
    finally:
        query.stop()


def test_day_aligned_splits_match_single_batch(spark, tmp_path):
    """Feeding the same day-aligned history in one batch or in three
    produces identical emitted rows — the carry is exactly the batch
    aggregation's prefix sum."""
    rows = [
        ("a", D1, 0, 10), ("a", D1, 1, 20),
        ("a", D2, 0, 30), ("a", D2, 1, 40),
        ("a", D3, 0, 50), ("a", D3, 1, 60),
    ]
    got = {}
    for label, chunks in (
        ("single", [rows]),
        ("split", [rows[:2], rows[2:4], rows[4:]]),
    ):
        in_dir = tmp_path / f"in_{label}"
        in_dir.mkdir()
        query = _start(
            spark, in_dir, tmp_path / f"ckpt_{label}", f"msprt_{label}"
        )
        try:
            for chunk in chunks:
                spark.createDataFrame(chunk, SCHEMA).coalesce(1).write.mode(
                    "append"
                ).parquet(str(in_dir))
                query.processAllAvailable()
            got[label] = _rows(spark, f"msprt_{label}")
        finally:
            query.stop()
    assert got["single"] == got["split"]
    assert len(got["single"]) == 3

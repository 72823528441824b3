"""Multi-batch semantics of the sliding-window burst detector: the
per-key day→count map carries across micro-batches, old days are
EVICTED as the key's max day advances, and emission tracks the
trailing-window count — not the lifetime total."""

import pyspark.sql.types as T

from flink_connector_http_spark.streaming.stateful import (
    burst_heavy_hitters_stream,
)

SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("d", T.LongType()),
])

THRESH, WINDOW = 5, 7


def _start(spark, in_dir, ckpt, name):
    return (
        burst_heavy_hitters_stream(
            spark.readStream.schema(SCHEMA).parquet(str(in_dir)),
            "user_id", "d", threshold=THRESH, window_days=WINDOW,
        )
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .start()
    )


def _rows(spark, name):
    return sorted(
        (r.user_id, r.window_end_day, r.n_window)
        for r in spark.table(name).collect()
    )


def test_burst_window_advances_and_evicts(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()

    def drop(rows):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(str(in_dir))

    # batch 1: 6 events on days 1-2 -> burst fires (6 >= 5), window end 2
    drop([(1, 1)] * 3 + [(1, 2)] * 3)
    query = _start(spark, in_dir, tmp_path / "ckpt", "burst_t")
    try:
        query.processAllAvailable()
        assert _rows(spark, "burst_t") == [(1, 2, 6)]

        # batch 2: 2 more events on day 3 -> window [−3..3] still holds
        # all 8 events -> fires with the carried count
        drop([(1, 3)] * 2)
        query.processAllAvailable()
        assert _rows(spark, "burst_t") == [(1, 2, 6), (1, 3, 8)]

        # batch 3: ONE event on day 20 -> days 1-3 evicted (20-7=13),
        # trailing count collapses to 1 -> below threshold, NO emission:
        # a lifetime-total heavy hitter would still fire here
        drop([(1, 20)])
        query.processAllAvailable()
        assert _rows(spark, "burst_t") == [(1, 2, 6), (1, 3, 8)]

        # batch 4: 4 more on day 21 -> trailing window {20, 21} holds 5
        # -> fires again, proving eviction kept only the recent days
        drop([(1, 21)] * 4)
        query.processAllAvailable()
        assert _rows(spark, "burst_t") == [(1, 2, 6), (1, 3, 8), (1, 21, 5)]
    finally:
        query.stop()


def test_burst_keys_independent_and_subthreshold_silent(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    rows = [(1, 1)] * 5 + [(2, 1)] * 4  # user 2 stays below threshold
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(in_dir))
    query = _start(spark, in_dir, tmp_path / "ckpt", "burst_k")
    try:
        query.processAllAvailable()
        assert _rows(spark, "burst_k") == [(1, 1, 5)]
    finally:
        query.stop()

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


def test_anomaly_zscore_state_across_batches(spark, tmp_path):
    """Sufficient-stat state carries across batches: a spike in batch 2 is
    judged against batch 1's history."""
    from flink_connector_http_spark.streaming.stateful import (
        anomaly_zscore_stream,
    )

    schema = T.StructType([
        T.StructField("user", T.StringType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("cents", T.LongType()),
    ])
    in_dir = tmp_path / "in"
    in_dir.mkdir()

    def drop(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(in_dir))

    # batch 1: 12 quiet observations around 100 (no flags: first 10 are
    # warmup, remaining two are in-distribution)
    drop([("u", i, 100 + (i % 3)) for i in range(12)])
    query = (
        anomaly_zscore_stream(
            spark.readStream.schema(schema).parquet(str(in_dir)),
            ["user"], "cents", ["event_id"],
        )
        .writeStream.format("memory")
        .queryName("anom_t")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        query.processAllAvailable()
        assert spark.table("anom_t").count() == 0

        # batch 2: a 100x spike must flag against the carried history
        drop([("u", 100, 10000)])
        query.processAllAvailable()
        flagged = spark.table("anom_t").collect()
        assert [(r.user, r.event_id) for r in flagged] == [("u", 100)]
        assert flagged[0].z > 3
    finally:
        query.stop()


def test_kmv_stream_merges_across_batches(spark, tmp_path):
    """Bottom-k state merges with new batches: the estimate after two
    batches equals the batch KMV over the union of elements."""
    from flink_connector_http_spark.streaming.stateful import (
        _KMV_SPACE,
        kmv_distinct_stream,
    )

    schema = T.StructType([
        T.StructField("grp", T.StringType()),
        T.StructField("hv", T.LongType()),
    ])
    in_dir = tmp_path / "in"
    in_dir.mkdir()

    def drop(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(in_dir))

    import hashlib

    def h(x):
        return int(hashlib.md5(f"u:{x}".encode()).hexdigest()[:15], 16)

    k = 8
    drop([("g", h(i)) for i in range(20)])
    query = (
        kmv_distinct_stream(
            spark.readStream.schema(schema).parquet(str(in_dir)),
            ["grp"], "hv", k=k,
        )
        .writeStream.format("memory")
        .queryName("kmv_t")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        query.processAllAvailable()
        drop([("g", h(i)) for i in range(15, 40)])  # overlap + new elements
        query.processAllAvailable()
        rows = spark.table("kmv_t").collect()
        # second emission must equal the batch bottom-k over ALL 40
        mins = sorted(h(i) for i in range(40))[:k]
        want = (k - 1) * _KMV_SPACE / mins[-1]
        assert rows[-1].sketch_size == k
        assert rows[-1].est_distinct == want
    finally:
        query.stop()


def test_first_seen_emits_once_per_key(spark, tmp_path):
    from flink_connector_http_spark.streaming.stateful import first_seen_stream

    schema = T.StructType([
        T.StructField("user", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("kind", T.StringType()),
    ])
    in_dir = tmp_path / "in"
    in_dir.mkdir()

    def drop(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(in_dir))

    drop([("a", 2, "late"), ("a", 1, "first"), ("b", 5, "solo")])
    query = (
        first_seen_stream(
            spark.readStream.schema(schema).parquet(str(in_dir)),
            ["user"], ["seq"], ["seq", "kind"],
        )
        .writeStream.format("memory")
        .queryName("first_t")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        query.processAllAvailable()
        got = sorted((r.user, r.seq, r.kind) for r in spark.table("first_t").collect())
        assert got == [("a", 1, "first"), ("b", 5, "solo")]

        # batch 2: seen keys stay silent, a new key emits its first row
        drop([("a", 0, "earlier-but-too-late"), ("c", 9, "new")])
        query.processAllAvailable()
        got = sorted((r.user, r.seq, r.kind) for r in spark.table("first_t").collect())
        assert got == [("a", 1, "first"), ("b", 5, "solo"), ("c", 9, "new")]
    finally:
        query.stop()

"""Multi-batch semantics of the streaming CEP funnel: the NFA registers
(latest view/click, error watermarks) carry across micro-batches, so a
pattern whose steps arrive in different batches still matches — the
property that distinguishes stateful CEP from per-batch windowing. The
single-batch output parity with q_cep_funnel_episodes is pinned by the
shared oracle in the replica gate; these tests pin the cross-batch NFA.
"""

import pyspark.sql.types as T

from flink_connector_http_spark.plans.relational import CEP_WITHIN_US
from flink_connector_http_spark.streaming.stateful import cep_funnel_stream

SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("event_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("u", T.LongType()),
])

H = 3_600_000_000  # one hour in micros


def _run(spark, tmp_path, batches, name):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    query = None
    out = []
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(str(in_dir))
        if query is None:
            query = (
                cep_funnel_stream(
                    spark.readStream.schema(SCHEMA).parquet(str(in_dir)),
                    "user_id", ["u", "event_id"], CEP_WITHIN_US,
                )
                .writeStream.format("memory")
                .queryName(name)
                .outputMode("append")
                .option("checkpointLocation", str(tmp_path / "ckpt"))
                .start()
            )
        query.processAllAvailable()
        out = [
            (r.user_id, r.gap_us, r.blocked)
            for r in spark.table(name).collect()
        ]
    query.stop()
    return out


def test_pattern_spans_micro_batches(spark, tmp_path):
    # view+click arrive in batch 1, purchase in batch 2: the NFA state
    # must carry the candidate across the batch boundary
    got = _run(
        spark, tmp_path,
        [
            [(1, 1, "view", 0), (1, 2, "click", H)],
            [(1, 3, "purchase", 2 * H)],
        ],
        "cep_t1",
    )
    assert got == [(1, 2 * H, 0)]


def test_error_between_blocks_across_batches(spark, tmp_path):
    # the error lands in batch 2 BETWEEN click and purchase: the running
    # error count must persist and mark the episode blocked
    got = _run(
        spark, tmp_path,
        [
            [(2, 1, "view", 0), (2, 2, "click", H)],
            [(2, 3, "error", 2 * H), (2, 4, "purchase", 3 * H)],
        ],
        "cep_t2",
    )
    assert got == [(2, 3 * H, 1)]


def test_within_window_enforced(spark, tmp_path):
    # purchase later than 7d after the click: no match; a fresh in-window
    # chain afterwards still matches (registers keep updating)
    late = CEP_WITHIN_US + H
    base = 10 * CEP_WITHIN_US
    got = _run(
        spark, tmp_path,
        [
            [(3, 1, "view", 0), (3, 2, "click", H),
             (3, 3, "purchase", H + late)],
            [(3, 4, "view", base), (3, 5, "click", base + H),
             (3, 6, "purchase", base + 2 * H)],
        ],
        "cep_t3",
    )
    assert got == [(3, 2 * H, 0)]


def test_error_before_view_does_not_block(spark, tmp_path):
    # errors BEFORE the matched view are outside the pattern's negative
    # condition: err-at-view watermark subtracts them out
    got = _run(
        spark, tmp_path,
        [
            [(4, 1, "error", 0), (4, 2, "view", H), (4, 3, "click", 2 * H),
             (4, 4, "purchase", 3 * H)],
        ],
        "cep_t4",
    )
    assert got == [(4, 2 * H, 0)]

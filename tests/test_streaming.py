"""E2E Structured Streaming: file-source probe stream -> HTTP lookup join ->
HTTP sink, with checkpoint recovery.

Mirrors the reference's MiniCluster streaming ITs
(``HttpLookupTableSourceITCaseTest.java:162-205`` probe-stream lookup join;
``sink/HttpSinkConnectionTest.java:125-330`` sink delivery) re-expressed as
Structured Streaming: ``readStream`` -> ``mapInPandas`` enrichment ->
``foreachBatch`` sink with ``availableNow`` bounded triggers.
"""

import json

import pyspark.sql.types as T
import pytest

from flink_connector_http_spark.lookup import HttpLookupTable
from flink_connector_http_spark.options import HttpLookupOptions, HttpSinkOptions
from flink_connector_http_spark.streaming import (
    http_enrich_stream,
    start_http_sink_stream,
)

PROBE_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("amount", T.LongType()),
])

CUSTOMER_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("name", T.StringType()),
])


def _write_probe_file(directory, name, rows):
    path = directory / name
    path.write_text("\n".join(json.dumps(r) for r in rows) + "\n")


def _stub_customers(stub_server):
    def responder(req):
        from flink_connector_http_spark.testing import json_response

        cid = req.query.get("id", [None])[0]
        return json_response({"id": int(cid), "name": f"customer-{cid}"})

    stub_server.stub("/customers", responder)


@pytest.fixture()
def probe_dir(tmp_path):
    d = tmp_path / "probe"
    d.mkdir()
    return d


def _start_pipeline(spark, probe_dir, stub_server, checkpoint):
    stream = (
        spark.readStream.schema(PROBE_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(str(probe_dir))
    )
    table = HttpLookupTable(
        url=stub_server.url("/customers"),
        schema=CUSTOMER_SCHEMA,
        options=HttpLookupOptions(),
    )
    enriched = http_enrich_stream(
        stream, table, on=["id"], select=["name"], lookup_prefix="c_",
    )
    return start_http_sink_stream(
        enriched,
        stub_server.url("/sink"),
        checkpoint_dir=str(checkpoint),
        options=HttpSinkOptions(request_mode="single"),
        trigger_available_now=True,
    )


def _sink_payloads(stub_server):
    out = []
    for req in stub_server.recorded("/sink"):
        out.append(json.loads(req.body.decode("utf-8")))
    return out


def test_stream_enrich_then_sink(spark, probe_dir, stub_server, tmp_path):
    _stub_customers(stub_server)
    stub_server.stub_json("/sink", {"ok": True})
    _write_probe_file(probe_dir, "a.json", [
        {"id": 1, "amount": 10},
        {"id": 2, "amount": 20},
    ])

    query = _start_pipeline(spark, probe_dir, stub_server, tmp_path / "ckpt")
    assert query.awaitTermination(120)

    payloads = sorted(_sink_payloads(stub_server), key=lambda p: p["id"])
    assert payloads == [
        {"id": 1, "amount": 10, "c_name": "customer-1"},
        {"id": 2, "amount": 20, "c_name": "customer-2"},
    ]
    # the enrichment probed the endpoint (processing-time temporal join)
    assert len(stub_server.recorded("/customers")) >= 1


def test_stream_checkpoint_no_reprocess(spark, probe_dir, stub_server, tmp_path):
    """Restarting from the checkpoint must not re-send committed batches
    (at-least-once via micro-batch replay: only *uncommitted* work repeats)."""
    _stub_customers(stub_server)
    stub_server.stub_json("/sink", {"ok": True})
    ckpt = tmp_path / "ckpt"

    _write_probe_file(probe_dir, "a.json", [{"id": 1, "amount": 10}])
    q1 = _start_pipeline(spark, probe_dir, stub_server, ckpt)
    assert q1.awaitTermination(120)
    first_run = len(_sink_payloads(stub_server))
    assert first_run == 1

    # new input lands; restart from the same checkpoint
    _write_probe_file(probe_dir, "b.json", [{"id": 2, "amount": 20}])
    q2 = _start_pipeline(spark, probe_dir, stub_server, ckpt)
    assert q2.awaitTermination(120)

    payloads = _sink_payloads(stub_server)
    ids = sorted(p["id"] for p in payloads)
    assert ids == [1, 2]  # id=1 delivered exactly once across the restart


class TestEventTimeWatermarks:
    """T5: withWatermark + session_window / tumbling windows. Deterministic
    via a file source: batch 2's late timestamps advance the watermark past
    batch 1's sessions, so append mode emits exactly the finalized ones."""

    def _start(self, spark, tmp_path, transform, name):
        import datetime

        from pyspark.sql import types as T

        schema = T.StructType([
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ])
        in_dir = str(tmp_path / "in")
        t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)

        def drop(rows):
            spark.createDataFrame(rows, schema).coalesce(1).write.mode(
                "append"
            ).parquet(in_dir)

        drop([(1, t0), (1, t0 + datetime.timedelta(minutes=10)), (2, t0)])
        stream = spark.readStream.schema(schema).parquet(in_dir)
        query = (
            transform(stream).writeStream.format("memory")
            .queryName(name).outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        return query, drop, t0

    def test_session_window_emits_after_watermark_passes(self, spark, tmp_path):
        import datetime

        from flink_connector_http_spark.streaming import sessionize_stream

        query, drop, t0 = self._start(
            spark, tmp_path,
            lambda s: sessionize_stream(
                s, gap="1 hour", watermark_delay="10 seconds"),
            "sessions_t5",
        )
        try:
            query.processAllAvailable()
            # sessions still open: watermark has not passed close(= last+gap)
            assert spark.sql("SELECT * FROM sessions_t5").count() == 0
            drop([(3, t0 + datetime.timedelta(hours=6))])  # advances watermark
            query.processAllAvailable()
            rows = {
                (r.user_id, r.n_events)
                for r in spark.sql("SELECT * FROM sessions_t5").collect()
            }
            assert rows == {(1, 2), (2, 1)}  # user 3's session still open
            sess = {
                r.user_id: (r.session_start, r.session_end)
                for r in spark.sql("SELECT * FROM sessions_t5").collect()
            }
            assert sess[1] == (t0, t0 + datetime.timedelta(hours=1, minutes=10))
            assert sess[2] == (t0, t0 + datetime.timedelta(hours=1))
        finally:
            query.stop()

    def test_tumbling_window_counts_with_late_data(self, spark, tmp_path):
        import datetime

        from flink_connector_http_spark.streaming import windowed_counts_stream

        query, drop, t0 = self._start(
            spark, tmp_path,
            lambda s: windowed_counts_stream(
                s, key_col="user_id", window="30 minutes",
                watermark_delay="10 seconds"),
            "windows_t5",
        )
        try:
            query.processAllAvailable()
            drop([(9, t0 + datetime.timedelta(hours=6))])
            query.processAllAvailable()
            rows = {
                (r.user_id, r.window_start, r.n_events)
                for r in spark.sql("SELECT * FROM windows_t5").collect()
            }
            # [12:00, 12:30): user 1 has events at 12:00 and 12:10, user 2
            # one at 12:00; user 9's 18:00 window is still open
            assert rows == {(1, t0, 2), (2, t0, 1)}
        finally:
            query.stop()


class TestStatefulDedupStream:
    """applyInPandasWithState exact dedup: one emission per key across
    micro-batches; TTL expiry re-opens a key (state stays bounded)."""

    def _start(self, spark, tmp_path, **dedup_kwargs):
        from pyspark.sql import types as T

        from flink_connector_http_spark.streaming.stateful import dedup_stream

        schema = T.StructType([
            T.StructField("content_hash", T.StringType()),
            T.StructField("doc_id", T.LongType()),
        ])
        in_dir = str(tmp_path / "in")
        name = f"dedup_{tmp_path.name}"

        def drop(rows):
            spark.createDataFrame(rows, schema).coalesce(1).write.mode(
                "append"
            ).parquet(in_dir)

        drop([("A", 2), ("A", 9), ("B", 5)])
        stream = spark.readStream.schema(schema).parquet(in_dir)
        query = (
            dedup_stream(stream, ["content_hash"], order_col="doc_id",
                         **dedup_kwargs)
            .writeStream.format("memory").queryName(name)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        return query, drop, name

    def test_cross_batch_duplicates_suppressed(self, spark, tmp_path):
        query, drop, name = self._start(spark, tmp_path)
        try:
            query.processAllAvailable()
            first = {(r.content_hash, r.doc_id)
                     for r in spark.table(name).collect()}
            assert first == {("A", 2), ("B", 5)}  # min doc_id per key
            # batch 2: A again (even with a smaller doc_id) + new key C
            drop([("A", 1), ("C", 7)])
            query.processAllAvailable()
            final = {(r.content_hash, r.doc_id)
                     for r in spark.table(name).collect()}
            assert final == {("A", 2), ("B", 5), ("C", 7)}
        finally:
            query.stop()

    def test_ttl_expiry_reopens_key(self, spark, tmp_path):
        import time as _time

        # NOTE: poll instead of processAllAvailable() — pending
        # processing-time timers keep scheduling batches, so
        # processAllAvailable never settles with a TTL configured
        def wait_for(pred, timeout=90):
            deadline = _time.time() + timeout
            while _time.time() < deadline:
                if pred():
                    return True
                _time.sleep(0.5)
            return False

        query, drop, name = self._start(spark, tmp_path, state_ttl_ms=500)
        try:
            rows = lambda: {(r.content_hash, r.doc_id)  # noqa: E731
                            for r in spark.table(name).collect()}
            assert wait_for(lambda: rows() == {("A", 2), ("B", 5)})
            _time.sleep(1.5)          # let A/B state expire
            drop([("D", 1)])          # batch with other data fires timeouts
            assert wait_for(lambda: ("D", 1) in rows())
            drop([("A", 42)])         # state was removed -> A emits again
            assert wait_for(lambda: ("A", 42) in rows())
        finally:
            query.stop()

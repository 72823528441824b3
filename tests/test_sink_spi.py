"""Sink custom-serialization SPI + two-stage batching knobs.

Reference parity: a user ``ElementConverter``
(``SchemaLifecycleAwareElementConverter.java``,
``table/SerializationSchemaElementConverter.java:30-62``), custom payload
formats discovered by name (``table/http.md:449-478``), and the distinct
``sink.batch.max-size`` (flush trigger, ``HttpSinkBuilder.java:70``) vs
``http.sink.request.batch.size`` (per-request framing,
``BatchRequestSubmitter.java:61-64``).
"""

import json
import struct
import time

from flink_connector_http_spark import (
    HttpSinkOptions,
    HttpSinkRequestEntry,
    HttpSinkWriter,
    write_http,
)
from flink_connector_http_spark.formats import register_format
from flink_connector_http_spark.options import sink_options_from_map


def entries(n, method="POST"):
    return [
        HttpSinkRequestEntry(method=method, payload=json.dumps({"i": i}).encode())
        for i in range(n)
    ]


# --- two-stage batching ------------------------------------------------------

class TestTwoStageBatching:
    def test_flush_trigger_and_request_framing_independent(self, stub_server):
        """flush at 6 buffered entries, but frame 2 entries per request:
        one flush → three requests."""
        stub_server.stub_json("/sink", {"ok": True})
        writer = HttpSinkWriter(
            stub_server.url("/sink"),
            HttpSinkOptions(flush_batch_size=6, batch_size=2),
            age_ticker=False,
        )
        for e in entries(6):
            writer.write(e)
        # the flush fired on the 6th write, before close (requests travel
        # through the async pool — poll briefly for wire arrival)
        deadline = time.monotonic() + 5
        while (len(stub_server.recorded("/sink")) < 3
               and time.monotonic() < deadline):
            time.sleep(0.02)
        sizes = sorted(len(r.json()) for r in stub_server.recorded("/sink"))
        assert sizes == [2, 2, 2]
        writer.close()
        assert len(stub_server.recorded("/sink")) == 3

    def test_small_flush_trigger_large_request_size(self, stub_server):
        """flush every 2 entries while requests could carry 500: each
        flush is one 2-entry request; close drains the remainder."""
        stub_server.stub_json("/sink", {"ok": True})
        writer = HttpSinkWriter(
            stub_server.url("/sink"),
            HttpSinkOptions(flush_batch_size=2, batch_size=500),
            age_ticker=False,
        )
        for e in entries(5):
            writer.write(e)
        writer.close()
        sizes = sorted(len(r.json()) for r in stub_server.recorded("/sink"))
        assert sizes == [1, 2, 2]

    def test_option_map_keys_honored_independently(self):
        opts = sink_options_from_map({
            "sink.batch.max-size": "1000",
            "http.sink.request.batch.size": "50",
        })
        assert opts.flush_batch_size == 1000
        assert opts.batch_size == 50


# --- element converter -------------------------------------------------------

class TestElementConverter:
    def test_write_http_custom_binary_payloads(self, spark, stub_server):
        # nested def → cloudpickled by value (test modules aren't
        # importable on executors); production converters should be
        # importable top-level functions
        def binary_converter(row) -> HttpSinkRequestEntry:
            return HttpSinkRequestEntry(
                method="PUT" if row.id % 2 else "POST",
                payload=struct.pack("<ii", row.id, row.value),
            )

        stub_server.stub_json("/ingest", {"ok": True})
        df = spark.createDataFrame(
            [(i, i * 10) for i in range(4)], "id INT, value INT"
        ).coalesce(1)
        write_http(
            df, stub_server.url("/ingest"),
            HttpSinkOptions(request_mode="single"),
            element_converter=binary_converter,
        )
        recorded = stub_server.recorded("/ingest")
        got = sorted(struct.unpack("<ii", r.body) for r in recorded)
        assert got == [(0, 0), (1, 10), (2, 20), (3, 30)]
        methods = {struct.unpack("<ii", r.body)[0]: r.method for r in recorded}
        assert methods == {0: "POST", 1: "PUT", 2: "POST", 3: "PUT"}
        assert write_http.last_metrics["numRecordsSend"] == 4
        assert write_http.last_metrics["numRecordsSendErrors"] == 0


# --- registered encoder format ----------------------------------------------

class TestRegisteredEncoderFormat:
    def test_custom_format_with_concat_framing(self, spark, stub_server):
        def encode_fixed8(rec: dict) -> bytes:
            # fixed-width binary record: <ii of (id, value)
            return struct.pack("<ii", rec["id"], rec["value"])

        register_format("fixed8", encoder=encode_fixed8, framing="concat")
        stub_server.stub_json("/ingest", {"ok": True})
        df = spark.createDataFrame(
            [(i, i + 100) for i in range(6)], "id INT, value INT"
        ).coalesce(1)
        write_http(
            df, stub_server.url("/ingest"),
            HttpSinkOptions(payload_format="fixed8", batch_size=3,
                            flush_batch_size=3),
        )
        recorded = stub_server.recorded("/ingest")
        # concat framing: each request body is a whole number of 8-byte
        # records, 3 per request (batch_size)
        assert sorted(len(r.body) for r in recorded) == [24, 24]
        assert all(
            r.headers["Content-Type"] == "application/octet-stream"
            for r in recorded
        )
        seen = set()
        for r in recorded:
            for off in range(0, len(r.body), 8):
                seen.add(struct.unpack("<ii", r.body[off:off + 8]))
        assert seen == {(i, i + 100) for i in range(6)}

"""Sustained streaming e2e keep-up pins (round 11, r10 verdict #1).

Every other streaming test/gate row is a single ``availableNow`` pass; these
drive N CONSECUTIVE micro-batches from a live rate source and pin the
operational claims — p95 micro-batch duration under the trigger interval at
the chosen rate (keep-up), end-to-end row conservation through lookup +
sink, and a FLAT state-store row count (bounded state on a live run).

Rates here are deliberately gentle (the test JVM is local[4] shared by
~1450 tests); the honest throughput numbers live in ``bench.py``'s
``streaming_e2e`` block (local[32]).

Keep-up is a TIMING property: external load on the test machine (another
Spark JVM saturating the cores — e.g. the replica gate running next to the
suite) can push batch durations past any fixed trigger. Each test therefore
escalates the trigger interval once before failing: the PROPERTY pinned is
"there exists a modest trigger at which this rate keeps up", which load
cannot legitimately falsify, while a real regression (a per-batch cost
blowup) still fails both attempts.
"""

import json

import pytest

from flink_connector_http_spark.streaming.e2e import (
    run_enrich_sink_e2e,
    run_stateful_e2e,
)
from flink_connector_http_spark.testing import StubResponse


@pytest.fixture()
def stub_server():
    from flink_connector_http_spark.testing import StubHttpServer

    server = StubHttpServer().start()
    yield server
    server.stop()


def _attempts(fn, n_batches, triggers):
    """Run `fn(trigger_sec)` over escalating trigger intervals; return the
    first summary that completed all batches AND kept up, else the last."""
    summary = None
    for trigger_sec in triggers:
        summary = fn(trigger_sec)
        if summary["batches"] == n_batches and summary["kept_up"]:
            break
    return summary


def test_enrich_sink_sustained_keep_up(spark, stub_server):
    n_keys = 100

    def people(req):
        pid = int(req.query["id"][0])
        return StubResponse(
            status=200,
            body=json.dumps({"id": pid, "name": f"user{pid}"}).encode(),
        )

    stub_server.stub("/people", people)
    stub_server.stub("/sink", lambda req: StubResponse(200, b'{"ok":true}'))

    sink_baseline = [0]

    def attempt(trigger_sec):
        sink_baseline[0] = len(stub_server.recorded("/sink"))
        return run_enrich_sink_e2e(
            spark,
            stub_server.url("/people"),
            stub_server.url("/sink"),
            rows_per_second=500,
            n_batches=6,
            trigger_sec=trigger_sec,
            n_keys=n_keys,
            source_partitions=4,
            timeout_sec=150,
        )

    summary = _attempts(attempt, 6, (2.0, 5.0))
    assert summary["batches"] == 6, summary
    # keep-up: p95 steady-state batch duration under the trigger interval
    assert summary["kept_up"], summary
    # sustained throughput is at least the requested input rate (a falling-
    # behind query reads below it; backlog draining can read slightly above)
    assert summary["rows_per_sec_sustained"] >= 0.8 * 500, summary

    # end-to-end row conservation: every input row of THIS attempt reached
    # the sink as one JSON record (batch framing: each POST body is a JSON
    # array); earlier attempts' requests are excluded via the baseline.
    # >= not ==: the summary truncates to the first n_batches progresses,
    # but an extra in-flight micro-batch completing between the progress
    # poll and query.stop() still posts its rows to the sink.
    delivered = sum(
        len(json.loads(req.body))
        for req in stub_server.recorded("/sink")[sink_baseline[0]:]
    )
    assert delivered >= summary["rows_total"], (
        delivered, summary["rows_total"]
    )
    # request volume on the lookup side is distinct-key-bounded:
    # <= n_keys per micro-batch, never one per probe row
    lookups = len(stub_server.recorded("/people"))
    assert lookups <= n_keys * 2 * summary["batches"], lookups


def test_stateful_sustained_bounded_state(spark):
    n_keys = 300

    def attempt(trigger_sec):
        return run_stateful_e2e(
            spark,
            rows_per_second=3_000,
            n_batches=6,
            trigger_sec=trigger_sec,
            n_keys=n_keys,
            source_partitions=4,
            timeout_sec=150,
        )

    summary = _attempts(attempt, 6, (3.0, 8.0))
    assert summary["batches"] == 6, summary
    assert summary["kept_up"], summary
    # bounded state, live: the store saturates at the key domain and goes
    # FLAT — monotone growth would mean window eviction is broken
    assert summary["state_rows_flat"], summary["state_rows_per_batch"]
    assert max(summary["state_rows_per_batch"]) == n_keys


def test_recovery_under_load_replays_at_most_one_batch(spark, stub_server):
    """Round-12 kill/restart leg: crash the enrich→sink query after sink
    delivery but before checkpoint commit (the at-least-once window),
    restart from the checkpoint at the same rate, and pin the operational
    contract — a NON-ZERO duplicate count bounded by exactly one
    micro-batch's rows (Structured Streaming replays the failed batch
    with identical offsets; reference analogue: buffer replay
    HttpSinkWriterStateSerializer.java:33-52), bounded recovery lag, and
    post-restart keep-up."""
    from flink_connector_http_spark.streaming.e2e import (
        run_enrich_sink_recovery_e2e,
    )

    n_keys = 100
    people = {}
    for pid in range(1, n_keys + 1):
        people[pid] = StubResponse(
            status=200,
            body=json.dumps({"id": pid, "name": f"user{pid}"}).encode(),
        )

    def people_responder(req):
        pid = int(req.query["id"][0])
        return people[pid]

    stub_server.stub("/people", people_responder)
    stub_server.stub("/sink", lambda req: StubResponse(200, b'{"ok":true}'))

    sink_baseline = [0]

    def delivered_stats():
        vals = []
        for req in stub_server.recorded("/sink")[sink_baseline[0]:]:
            vals.extend(row["value"] for row in json.loads(req.body))
        return {"total": len(vals), "distinct": len(set(vals))}

    def attempt(trigger_sec):
        sink_baseline[0] = len(stub_server.recorded("/sink"))
        return run_enrich_sink_recovery_e2e(
            spark,
            stub_server.url("/people"),
            stub_server.url("/sink"),
            rows_per_second=500,
            pre_batches=4,
            post_batches=5,
            trigger_sec=trigger_sec,
            n_keys=n_keys,
            source_partitions=4,
            timeout_sec=180,
            delivered_stats=delivered_stats,
        )

    summary = _attempts(attempt, 5, (2.0, 5.0))
    assert summary["pre_failure_batches"] >= 4, summary
    assert summary["batches"] == 5, summary
    # post-restart keep-up (catch-up batches excluded as warmup)
    assert summary["kept_up"], summary
    # the at-least-once number: non-zero (the failed batch HAD delivered)
    # and bounded by the one replayed micro-batch
    d = summary["delivered"]
    assert d["duplicate_rows"] > 0, d
    assert d["duplicates_bounded_by_replayed_batch"], d
    assert d["duplicate_rows"] <= summary["replayed_batch_rows"], (
        d, summary["replayed_batch_rows"])
    # recovery is prompt (restart call -> first committed batch)
    assert summary["recovery_lag_sec"] < 60, summary


def test_stateful_recovery_restores_state_not_rebuilds(spark):
    """Round-12 stateful kill/restart: after the injected post-output
    pre-commit crash, the restarted query's FIRST batch already holds the
    saturated key domain in the state store (restored from snapshot +
    delta replay, not rebuilt from zero), the flat-state property holds
    across the crash boundary, and keep-up resumes."""
    from flink_connector_http_spark.streaming.e2e import (
        run_stateful_recovery_e2e,
    )

    n_keys = 300

    def attempt(trigger_sec):
        return run_stateful_recovery_e2e(
            spark,
            rows_per_second=3_000,
            pre_batches=4,
            post_batches=4,
            trigger_sec=trigger_sec,
            n_keys=n_keys,
            source_partitions=4,
            timeout_sec=240,
        )

    summary = _attempts(attempt, 4, (4.0, 8.0))
    assert summary["batches"] == 4, summary
    assert summary["kept_up"], summary
    assert summary["state_rows_at_kill"] == n_keys, summary
    assert summary["state_restored"], summary
    assert summary["state_rows_first_post_restart"] == n_keys, summary
    assert summary["state_rows_flat"], summary["state_rows_per_batch"]
    assert summary["recovery_lag_sec"] < 60, summary

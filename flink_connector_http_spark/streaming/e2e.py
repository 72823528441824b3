"""Sustained streaming end-to-end measurement (the engine's north-star
evidence): N consecutive micro-batches at a fixed input rate, with
per-batch duration percentiles, sustained rows/sec, and state-store row
counts read from Structured Streaming's progress events.

The reference's e2e tests run CONTINUOUS streams — a datagen source
probed against the lookup endpoint
(``HttpLookupTableSourceITCaseTest.java:162-205``) and a long-running
sink connection test (``sink/HttpSinkConnectionTest.java:125-330``) —
but a single ``availableNow`` pass (how the registry's ``stream_*``
queries run under the oracle gate) only proves correctness over a
handful of micro-batches. This module proves the OPERATIONAL claims:

- **keep-up**: p95 micro-batch duration < the trigger interval at the
  chosen input rate (otherwise the query falls behind and the rate
  source backlog grows without bound);
- **bounded state**: the state store's ``numRowsTotal`` goes flat once
  the key domain is saturated (eviction works; an unbounded-state bug
  shows as monotone growth across batches).

Three pipelines, matching the reference's continuous e2e shapes:

1. ``run_enrich_sink_e2e`` — rate source → ``http_lookup_join`` →
   HTTP sink via ``foreachBatch`` (the lookup-join + async-sink loop);
2. ``run_stateful_e2e`` — rate source → ``burst_heavy_hitters_stream``
   (bounded evicting per-key window state) → noop sink;
3. ``run_enrich_sink_recovery_e2e`` — the kill/restart-under-load leg:
   crash after sink delivery but before checkpoint commit, restart from
   the checkpoint, measure recovery lag, the at-least-once duplicate
   count at the sink, and post-restart keep-up;
4. ``run_stateful_recovery_e2e`` — the same crash/restart for the
   stateful pipeline: state restored from the store (not rebuilt),
   still bounded, keep-up resumed;
5. ``run_enrich_sink_chaos_e2e`` — the endpoint-flap leg: the lookup
   endpoint becomes a sustained 503 storm mid-run, exercising circuit
   breaker trip → fail-fast → half-open re-close, Retry-After under
   load, and continue-on-error delivery, with post-storm keep-up.

All return a plain-dict summary for ``bench.py``'s ``streaming_e2e``
block and the pytest keep-up pins (``tests/test_streaming_e2e.py``).
"""

from __future__ import annotations

import json
import tempfile
import time
from datetime import datetime
from typing import List, Optional

from pyspark.sql import functions as F

__all__ = [
    "ChaosGate",
    "run_enrich_sink_chaos_e2e",
    "run_enrich_sink_e2e",
    "run_enrich_sink_recovery_e2e",
    "run_stateful_e2e",
    "run_stateful_recovery_e2e",
]

#: batches excluded from the keep-up percentiles: the first micro-batches
#: pay one-time Python-worker fork + Arrow init + codegen, a
#: per-executor-lifetime cost at cluster scale, not a per-batch cost.
#: Raw durations of ALL batches are still reported.
WARMUP_BATCHES = 3


def _as_dict(progress) -> dict:
    """recentProgress entries are StreamingQueryProgress objects (with a
    .json payload) on some PySpark versions and plain dicts on others."""
    if isinstance(progress, dict):
        return progress
    return json.loads(progress.json)


def _parse_ts(iso: str) -> float:
    return datetime.fromisoformat(iso.replace("Z", "+00:00")).timestamp()


def _percentile(sorted_vals: List[float], q: float) -> float:
    if not sorted_vals:
        return float("nan")
    idx = max(0, min(len(sorted_vals) - 1,
                     int(round(q * (len(sorted_vals) - 1)))))
    return sorted_vals[idx]


def _await_batches(query, n_batches: int, timeout_sec: float) -> List[dict]:
    """Let the query run until >= n_batches non-empty micro-batches have
    completed (or the timeout lapses), then stop it and return their
    progress dicts in batch order."""
    deadline = time.time() + timeout_sec
    done: List[dict] = []
    while time.time() < deadline:
        progs = [_as_dict(p) for p in query.recentProgress]
        done = [p for p in progs if p.get("numInputRows", 0) > 0]
        if len(done) >= n_batches:
            break
        time.sleep(0.25)
    query.stop()
    query.awaitTermination(60)
    return sorted(done, key=lambda p: p["batchId"])[:n_batches]


def _summarize(progs: List[dict], trigger_sec: float) -> dict:
    durations = [float(p["durationMs"]["triggerExecution"]) for p in progs]
    steady = durations[WARMUP_BATCHES:] or durations
    s = sorted(steady)
    rows_total = int(sum(p["numInputRows"] for p in progs))
    # wall clock spans first batch start → last batch end; sustained
    # throughput is input rows over that whole span (includes trigger
    # idle time — the number an operator sizing a cluster needs)
    wall = (
        _parse_ts(progs[-1]["timestamp"]) - _parse_ts(progs[0]["timestamp"])
        + durations[-1] / 1000.0
    )
    state_rows = [
        int(p["stateOperators"][0]["numRowsTotal"])
        for p in progs
        if p.get("stateOperators")
    ]
    out = {
        "batches": len(progs),
        "rows_total": rows_total,
        "wall_sec": round(wall, 3),
        "rows_per_sec_sustained": round(rows_total / max(wall, 1e-9), 1),
        "trigger_interval_ms": int(trigger_sec * 1000),
        "warmup_batches_excluded": min(WARMUP_BATCHES, len(durations) - 1),
        "batch_duration_ms": {
            "p50": round(_percentile(s, 0.50), 1),
            "p95": round(_percentile(s, 0.95), 1),
            "max": round(max(s), 1),
        },
        "batch_duration_ms_raw": [round(d, 1) for d in durations],
        "kept_up": _percentile(s, 0.95) < trigger_sec * 1000,
        # set unconditionally (None = "store reported no data"), so test
        # asserts read as a diagnosable value mismatch instead of a
        # KeyError when a provider reports 0 bytes or progress raced empty
        "state_rows_flat": None,
        "state_bytes_flat": None,
    }
    if state_rows:
        out["state_rows_per_batch"] = state_rows
        # flat tail = bounded state proven empirically (the key domain
        # saturates, then eviction holds the row count constant)
        tail = state_rows[min(WARMUP_BATCHES, len(state_rows) - 1):]
        out["state_rows_flat"] = len(set(tail)) == 1
    # bounded BYTES, not just rows: a per-key blob that grows every batch
    # (e.g. an unbounded map value) keeps numRowsTotal flat while the
    # store balloons — memoryUsedBytes catches it. The HDFS-backed store
    # caches ~2 versions, so bytes ramp over the first batches and then
    # plateau (measured: exactly constant once the version cache fills);
    # 10% headroom absorbs serialization jitter while a genuinely growing
    # blob blows through it within a few batches (round-12 verdict #3).
    state_bytes = [
        int(p["stateOperators"][0].get("memoryUsedBytes", 0))
        for p in progs
        if p.get("stateOperators")
    ]
    if any(state_bytes):
        out["state_bytes_per_batch"] = state_bytes
        btail = state_bytes[min(WARMUP_BATCHES, len(state_bytes) - 1):]
        out["state_bytes_flat"] = max(btail) <= max(1, min(btail)) * 1.10
    return out


def run_enrich_sink_e2e(
    spark,
    lookup_url: str,
    sink_url: str,
    *,
    rows_per_second: int = 20_000,
    n_batches: int = 25,
    trigger_sec: float = 1.5,
    n_keys: int = 2_000,
    lookup_batch_size: Optional[int] = None,
    source_partitions: int = 8,
    timeout_sec: float = 300.0,
) -> dict:
    """Rate source → ``http_lookup_join`` → HTTP sink via ``foreachBatch``
    for ``n_batches`` consecutive micro-batches at ``rows_per_second``.

    The lookup key domain is ``1..n_keys`` (``value % n_keys + 1``), so
    per-batch HTTP volume is distinct-key-bounded exactly as in the batch
    operator; the sink posts every enriched row in JSON-array-framed
    batch requests. If a batch overruns the trigger interval the rate
    source backlogs and the NEXT batch is bigger — so sustained keep-up
    (p95 < trigger) is self-demonstrating, not assumed.
    """
    from pyspark.sql import types as T

    from ..lookup import HttpLookupTable, http_lookup_join
    from ..options import HttpLookupOptions, HttpSinkOptions
    from ..sink import write_http

    table = HttpLookupTable(
        url=lookup_url,
        schema=T.StructType([
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
        ]),
        options=HttpLookupOptions(
            method="POST" if lookup_batch_size else "GET",
            lookup_batch_size=lookup_batch_size,
        ),
    )
    sink_opts = HttpSinkOptions(insert_method="POST")

    def process(batch_df, _batch_id) -> None:
        enriched = http_lookup_join(
            batch_df, table, on={"id": "id"}, select=["name"]
        )
        write_http(enriched, sink_url, sink_opts)

    query = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .option("numPartitions", source_partitions)
        .load()
        .select((F.col("value") % n_keys + 1).alias("id"),
                F.col("value"))
        .writeStream.foreachBatch(process)
        .option("checkpointLocation",
                tempfile.mkdtemp(prefix="stream_e2e_enrich_ckpt_"))
        .trigger(processingTime=f"{trigger_sec} seconds")
        .start()
    )
    progs = _await_batches(query, n_batches, timeout_sec)
    out = _summarize(progs, trigger_sec)
    out["pipeline"] = "rate->http_lookup_join->http_sink(foreachBatch)"
    out["rows_per_second_requested"] = rows_per_second
    out["n_distinct_keys"] = n_keys
    return out


def run_stateful_e2e(
    spark,
    *,
    rows_per_second: int = 15_000,
    n_batches: int = 20,
    trigger_sec: float = 8.0,
    n_keys: int = 5_000,
    source_partitions: int = 8,
    timeout_sec: float = 300.0,
) -> dict:
    """Rate source → ``burst_heavy_hitters_stream`` (evicting per-key
    window state) → noop sink for ``n_batches`` consecutive micro-batches.

    ``user_id = value % n_keys`` saturates the key domain within the
    first batches; ``d`` derives from the rate-source event time, so the
    whole run lands in one day bucket and the state store must go FLAT at
    ``n_keys`` rows — monotone growth here would mean eviction is broken
    (the bounded-state claim, previously pinned only by unit tests).

    Default 15 k rows/s at an 8 s trigger, from the measured duration
    model on this VM: batch duration ≈ 0.5 s of state machinery (shuffle
    + 32 state-store commits + 5 000-group pandas dispatch — a floor no
    trigger escapes, so a 1 s trigger cannot keep up at ANY rate) plus
    ~25-30 µs/row; raising the trigger also raises rows/batch
    (rate × trigger), so keep-up margin grows sublinearly with the
    trigger. Two further real costs the margin must absorb: the state
    store's async snapshot maintenance steals CPU ~60 s into every run
    (reproducible 2.5-3.6 s batch spikes — clustered every ~10
    state-store versions, so the p95 must clear them, which is why the
    default trigger carries a ~4-5× p50 margin rather than the ~2×
    a 5 s trigger would leave), and virtio-balloon stalls inject up to
    ~2× duration noise between sessions. 15 k/s at 8 s keeps p95 under
    the trigger with margin through both.
    """
    from .stateful import burst_heavy_hitters_stream

    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .option("numPartitions", source_partitions)
        .load()
        .select(
            (F.col("value") % n_keys).alias("user_id"),
            F.expr("CAST(unix_date(CAST(timestamp AS DATE)) AS BIGINT)")
            .alias("d"),
        )
    )
    query = (
        burst_heavy_hitters_stream(stream, "user_id", "d")
        .writeStream.format("noop")
        .outputMode("append")
        .option("checkpointLocation",
                tempfile.mkdtemp(prefix="stream_e2e_state_ckpt_"))
        .trigger(processingTime=f"{trigger_sec} seconds")
        .start()
    )
    progs = _await_batches(query, n_batches, timeout_sec)
    out = _summarize(progs, trigger_sec)
    out["pipeline"] = "rate->burst_heavy_hitters(applyInPandasWithState)->noop"
    out["rows_per_second_requested"] = rows_per_second
    out["n_distinct_keys"] = n_keys
    return out


def run_enrich_sink_recovery_e2e(
    spark,
    lookup_url: str,
    sink_url: str,
    *,
    rows_per_second: int = 20_000,
    pre_batches: int = 10,
    post_batches: int = 10,
    trigger_sec: float = 1.5,
    n_keys: int = 2_000,
    lookup_batch_size: Optional[int] = None,
    source_partitions: int = 8,
    timeout_sec: float = 300.0,
    delivered_stats=None,
) -> dict:
    """Kill/restart-under-load leg of the enrich→sink pipeline (round-12
    verdict #4): run ``pre_batches`` committed micro-batches at rate, then
    crash the query at the WORST possible instant — after the sink
    delivery of the next batch, before its checkpoint commit (a
    ``RuntimeError`` injected at the end of ``foreachBatch``, the exact
    at-least-once window) — restart from the same checkpoint at the same
    rate, and measure what an operator needs to know:

    - **recovery_lag_sec**: restart call → first post-restart batch commit;
    - **duplicates**: rows delivered more than once at the sink (the
      at-least-once number — Structured Streaming replays the failed
      batch with identical offsets, so this is bounded by ONE micro-batch,
      mirroring the reference's buffer-replay guarantee,
      ``HttpSinkWriterStateSerializer.java:33-52`` / error runs
      ``HttpSinkConnectionTest.java:125-330``);
    - **post-restart keep-up**: p95 batch duration vs the trigger after
      the catch-up batches drain the downtime backlog.

    ``delivered_stats``, when given, is a zero-arg callable returning
    ``{"total": <rows delivered>, "distinct": <distinct source rows>}``
    read from the counting sink (the harness owns the sink stub; this
    function stays transport-agnostic).
    """
    from pyspark.sql import types as T

    from ..lookup import HttpLookupTable, http_lookup_join
    from ..options import HttpLookupOptions, HttpSinkOptions
    from ..sink import write_http

    table = HttpLookupTable(
        url=lookup_url,
        schema=T.StructType([
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
        ]),
        options=HttpLookupOptions(
            method="POST" if lookup_batch_size else "GET",
            lookup_batch_size=lookup_batch_size,
        ),
    )
    sink_opts = HttpSinkOptions(insert_method="POST")
    ckpt = tempfile.mkdtemp(prefix="stream_e2e_recovery_ckpt_")
    # one-shot failure injection after pre_batches NON-EMPTY batches (the
    # rate source's batch 0 is typically empty); foreachBatch runs
    # driver-side, so this closure state survives into the restarted
    # query, where remaining=None disarms both the crash and the
    # isEmpty probe (zero overhead on the keep-up measurement)
    armed = {"remaining": pre_batches}

    def process(batch_df, _batch_id) -> None:
        enriched = http_lookup_join(
            batch_df, table, on={"id": "id"}, select=["name"]
        )
        write_http(enriched, sink_url, sink_opts)
        if armed["remaining"] is not None and not batch_df.isEmpty():
            if armed["remaining"] == 0:
                armed["remaining"] = None
                raise RuntimeError(
                    "injected crash: sink delivery completed, checkpoint "
                    "commit not reached (the at-least-once window)"
                )
            armed["remaining"] -= 1

    def start_query():
        return (
            spark.readStream.format("rate")
            .option("rowsPerSecond", rows_per_second)
            .option("numPartitions", source_partitions)
            .load()
            .select((F.col("value") % n_keys + 1).alias("id"),
                    F.col("value"))
            .writeStream.foreachBatch(process)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime=f"{trigger_sec} seconds")
            .start()
        )

    # --- run 1: commit pre_batches, then crash mid-at-least-once-window
    q1 = start_query()
    deadline = time.time() + timeout_sec
    while time.time() < deadline and q1.isActive:
        time.sleep(0.2)
    # read progress POST-MORTEM: recentProgress stays readable after the
    # query dies, and polling while alive races the final batch's commit
    progs1: List[dict] = [
        p for p in (_as_dict(x) for x in q1.recentProgress)
        if p.get("numInputRows", 0) > 0
    ]
    if q1.isActive:  # injection never fired — fail loudly, don't hang
        q1.stop()
        raise TimeoutError(
            "recovery e2e: query did not crash within the timeout"
        )
    crash = q1.exception()
    if crash is None or "injected crash" not in str(crash):
        raise RuntimeError(f"query died for the wrong reason: {crash}")
    t_kill = time.time()
    at_kill = dict(delivered_stats()) if delivered_stats else None

    # --- run 2: restart from the same checkpoint at the same rate
    t_restart = time.time()
    q2 = start_query()
    first_commit_ts = None
    deadline = time.time() + timeout_sec
    while time.time() < deadline:
        progs = [
            p for p in (_as_dict(x) for x in q2.recentProgress)
            if p.get("numInputRows", 0) > 0
        ]
        if progs:
            first_commit_ts = time.time()
            break
        time.sleep(0.1)
    if first_commit_ts is None:
        q2.stop()
        raise TimeoutError("recovery e2e: no batch committed after restart")
    progs2 = _await_batches(q2, post_batches, timeout_sec)
    out = _summarize(progs2, trigger_sec)
    out["pipeline"] = (
        "rate->http_lookup_join->http_sink(foreachBatch) kill/restart"
    )
    out["rows_per_second_requested"] = rows_per_second
    out["n_distinct_keys"] = n_keys
    out["pre_failure_batches"] = len(progs1)
    out["recovery_lag_sec"] = round(first_commit_ts - t_restart, 3)
    out["downtime_sec"] = round(first_commit_ts - t_kill, 3)
    # the replayed batch is the first post-restart commit (identical
    # offsets to the failed one) — the duplicate-delivery upper bound
    out["replayed_batch_rows"] = int(progs2[0]["numInputRows"])
    if delivered_stats is not None:
        end = dict(delivered_stats())
        duplicates = int(end["total"]) - int(end["distinct"])
        out["delivered"] = {
            "total_rows": int(end["total"]),
            "distinct_rows": int(end["distinct"]),
            "duplicate_rows": duplicates,
            "delivered_before_kill": int(at_kill["total"]),
            "duplicates_bounded_by_replayed_batch":
                0 <= duplicates <= int(progs2[0]["numInputRows"]),
        }
    return out


def run_stateful_recovery_e2e(
    spark,
    *,
    rows_per_second: int = 15_000,
    pre_batches: int = 8,
    post_batches: int = 8,
    trigger_sec: float = 8.0,
    n_keys: int = 5_000,
    source_partitions: int = 8,
    timeout_sec: float = 600.0,
) -> dict:
    """Kill/restart leg for the STATEFUL pipeline: crash the
    ``burst_heavy_hitters_stream`` query after ``pre_batches`` non-empty
    batches (post-output, pre-commit — same injection point as the
    enrich→sink leg), restart from the checkpoint, and pin the state
    contract an operator cares about:

    - **state restored, not rebuilt**: the FIRST post-restart batch's
      ``numRowsTotal`` is already the saturated key-domain size (the
      state store loaded its last snapshot + delta replay), not a
      from-zero rebuild;
    - **still bounded**: the flat-state property holds across the
      crash/restart boundary (eviction state survived serialization);
    - **post-restart keep-up** at the same rate.

    Reference analogue: the lookup/sink connector recovers through
    Flink checkpoints (``HttpSinkWriterStateSerializer.java:33-52``);
    Spark's state store is the engine-side equivalent for the T5
    stateful operators.
    """
    from .stateful import burst_heavy_hitters_stream

    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .option("numPartitions", source_partitions)
        .load()
        .select(
            (F.col("value") % n_keys).alias("user_id"),
            F.expr("CAST(unix_date(CAST(timestamp AS DATE)) AS BIGINT)")
            .alias("d"),
        )
    )
    ckpt = tempfile.mkdtemp(prefix="stream_e2e_state_rec_ckpt_")
    armed = {"remaining": pre_batches}

    def process(batch_df, _batch_id) -> None:
        # materialize the stateful output (what the noop sink does in the
        # steady-state leg), then crash in the at-least-once window
        batch_df.write.format("noop").mode("overwrite").save()
        if armed["remaining"] is not None:
            if armed["remaining"] == 0:
                armed["remaining"] = None
                raise RuntimeError(
                    "injected crash: stateful output materialized, "
                    "checkpoint commit not reached"
                )
            armed["remaining"] -= 1

    def start_query():
        return (
            burst_heavy_hitters_stream(stream, "user_id", "d")
            .writeStream.foreachBatch(process)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime=f"{trigger_sec} seconds")
            .start()
        )

    q1 = start_query()
    deadline = time.time() + timeout_sec
    while time.time() < deadline and q1.isActive:
        time.sleep(0.25)
    progs1: List[dict] = [
        p for p in (_as_dict(x) for x in q1.recentProgress)
        if p.get("numInputRows", 0) > 0
    ]
    if q1.isActive:
        q1.stop()
        raise TimeoutError(
            "stateful recovery e2e: query did not crash within the timeout"
        )
    crash = q1.exception()
    if crash is None or "injected crash" not in str(crash):
        raise RuntimeError(f"query died for the wrong reason: {crash}")
    state_at_kill = (
        int(progs1[-1]["stateOperators"][0]["numRowsTotal"])
        if progs1 and progs1[-1].get("stateOperators") else 0
    )
    t_kill = time.time()

    t_restart = time.time()
    q2 = start_query()
    first_commit_ts = None
    deadline = time.time() + timeout_sec
    while time.time() < deadline:
        progs = [
            p for p in (_as_dict(x) for x in q2.recentProgress)
            if p.get("numInputRows", 0) > 0
        ]
        if progs:
            first_commit_ts = time.time()
            break
        time.sleep(0.1)
    if first_commit_ts is None:
        q2.stop()
        raise TimeoutError(
            "stateful recovery e2e: no batch committed after restart"
        )
    progs2 = _await_batches(q2, post_batches, timeout_sec)
    out = _summarize(progs2, trigger_sec)
    out["pipeline"] = (
        "rate->burst_heavy_hitters(applyInPandasWithState) kill/restart"
    )
    out["rows_per_second_requested"] = rows_per_second
    out["n_distinct_keys"] = n_keys
    out["pre_failure_batches"] = len(progs1)
    out["recovery_lag_sec"] = round(first_commit_ts - t_restart, 3)
    out["downtime_sec"] = round(first_commit_ts - t_kill, 3)
    out["state_rows_at_kill"] = state_at_kill
    first_state = (
        int(progs2[0]["stateOperators"][0]["numRowsTotal"])
        if progs2 and progs2[0].get("stateOperators") else 0
    )
    out["state_rows_first_post_restart"] = first_state
    # restored-not-rebuilt: the first post-restart batch already sees the
    # saturated domain (>= what the last committed pre-crash batch held)
    out["state_restored"] = first_state >= state_at_kill > 0
    return out


# --- endpoint-flap chaos (round-12 verdict item #1) --------------------------

class ChaosGate:
    """Cross-process storm switch + wire counters for a ``FastHttpStub``
    route (the bench stub forks SO_REUSEPORT workers, so plain closure
    state would fork-diverge; ``multiprocessing`` shared values allocated
    BEFORE ``stub.start()`` are inherited and stay coherent).

    ``wrap(inner)`` returns a responder that serves ``inner`` normally
    and, while the storm flag is up, answers every request with
    ``503 Service Unavailable`` + ``Retry-After: <n>`` — the same
    shape as the reference's WireMock retry scenarios
    (``HttpLookupTableSourceITCaseTest.java:240``,
    ``retry/HttpClientWithRetry.java:44-92``) run as a sustained flap
    instead of a scripted sequence."""

    def __init__(self, retry_after_sec: int = 1) -> None:
        import multiprocessing

        ctx = multiprocessing.get_context("fork")
        # parent-only writer; children read without a lock (a torn read
        # of a C int is impossible, and boundary fuzz is accepted anyway)
        self._storm = ctx.Value("i", 0, lock=False)
        self._wire = ctx.Value("q", 0)
        body = b'{"error":"injected storm: service unavailable"}'
        self._storm_resp = (
            f"HTTP/1.1 503 S\r\n"
            f"Content-Type: application/json\r\n"
            f"Retry-After: {int(retry_after_sec)}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode("ascii") + body

    def wrap(self, inner):
        storm, wire, storm_resp = self._storm, self._wire, self._storm_resp

        def responder(query: str, body: bytes) -> bytes:
            with wire.get_lock():
                wire.value += 1
            if storm.value:
                return storm_resp
            return inner(query, body)

        return responder

    def storm_on(self) -> None:
        self._storm.value = 1

    def storm_off(self) -> None:
        self._storm.value = 0

    def wire_count(self) -> int:
        with self._wire.get_lock():
            return int(self._wire.value)


def run_enrich_sink_chaos_e2e(
    spark,
    lookup_url: str,
    sink_url: str,
    *,
    storm_on,
    storm_off,
    wire_count,
    rows_per_second: int = 20_000,
    trigger_sec: float = 1.5,
    n_keys: int = 2_000,
    pre_batches: int = 5,
    storm_batches: int = 5,
    post_batches: int = 8,
    breaker_threshold: int = 3,
    breaker_reset_sec: float = 3.0,
    max_retries: int = 1,
    retry_fixed_delay: float = 0.05,
    source_partitions: int = 8,
    timeout_sec: float = 600.0,
    rate_limit_rps: float | None = None,
    rate_limit_burst: float | None = None,
) -> dict:
    """Endpoint-flap chaos: the enrich→sink pipeline runs at rate while
    the lookup endpoint turns into a sustained 500/503 storm mid-run,
    then recovers — the full resilience stack (retry + Retry-After +
    circuit breaker + continue-on-error) exercised UNDER LOAD instead of
    in unit tests (round-12 verdict item #1).

    The caller owns the endpoint flap (``storm_on`` / ``storm_off``
    callables) and exposes ``wire_count`` (requests actually served by
    the lookup endpoint so far) so breaker fail-fast is measured at the
    wire, not inferred.

    What the summary proves:

    - **breaker trips → fail-fast**: wire requests during the storm stay
      FAR below the no-breaker expectation (every batch re-fetching every
      distinct key × (1+retries)); after ``breaker_threshold`` failed
      exchanges each executor worker stops touching the wire, and only
      half-open trial probes (one per ``breaker_reset_sec`` per worker)
      leak through.
    - **Retry-After honored under load**: the storm 503s carry
      ``Retry-After: 1``; the FIRST storm batch absorbs the honored
      hint sleeps (~threshold × 1 s per worker, measured in
      ``first_storm_batch_ms``) before the breaker trips; later storm
      batches fail fast (``storm_steady_batch_ms``).
    - **rows ride continue_on_error**: every storm-phase row is still
      DELIVERED to the sink, left-join-degraded (NULL enrichment) —
      per-batch ``rows`` vs ``enriched`` counts quantify degraded vs
      blocked (blocked = 0 by design).
    - **half-open re-close + post-storm keep-up**: after the flap ends,
      the next exchange past ``breaker_reset_sec`` is the half-open
      trial; its success re-closes the breaker, enrichment returns to
      100%, and p95 batch duration drops back under the trigger.

    With ``rate_limit_rps`` set (the round-13 verdict #4 composition),
    every lookup task additionally runs the ``ratelimit.TokenBucket``
    cap — the production posture during an outage is rate-cap + breaker
    + Retry-After TOGETHER (reference analogue: the async-pool bounding
    knobs, ``AsyncHttpTableLookupFunction.java:40-42``, which bound
    concurrency but not rate). The summary's ``rate_limit`` block then
    reports achieved vs configured wire rate before/during/after the
    storm. Size the cap BELOW the per-batch demand to see it bind:
    batches stretch past the trigger and rows keep flowing (graceful
    backpressure), which is the point — ``kept_up`` is expected false in
    that regime, so this mode pins throttling + conservation, not
    keep-up.
    """
    from pyspark.sql import types as T

    from ..lookup import HttpLookupTable, http_lookup_join
    from ..options import HttpLookupOptions, HttpSinkOptions
    from ..retry import RetryConfig
    from ..sink import write_http

    table = HttpLookupTable(
        url=lookup_url,
        schema=T.StructType([
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
        ]),
        options=HttpLookupOptions(
            method="GET",
            continue_on_error=True,
            circuit_breaker_failures=breaker_threshold,
            circuit_breaker_reset=breaker_reset_sec,
            rate_limit=rate_limit_rps,
            rate_limit_burst=rate_limit_burst,
            retry=RetryConfig(
                max_retries=max_retries, fixed_delay=retry_fixed_delay
            ),
        ),
    )
    sink_opts = HttpSinkOptions(insert_method="POST")
    batch_log: List[dict] = []
    # wire-counter snapshot taken at the START of the first non-empty
    # batch: the stub's counter also sees pre-stream traffic (table
    # registration probes) and stream-startup requests that land before
    # batch_log[0]['t0'], so dividing the RAW counter by a window that
    # starts at the first logged batch inflated achieved_rps_pre past
    # the 1.15 cap-held slack on slow-startup VMs — numerator and
    # denominator must cover the same [first-batch, storm-on) interval
    first_batch_wire: List[int] = []

    def process(batch_df, _batch_id) -> None:
        t0 = time.monotonic()
        # wire counter at batch START, before this batch's own lookups
        # fire; the snapshot taken at the FIRST non-empty batch anchors
        # the pre-phase rate window (see first_batch_wire below)
        w0 = wire_count()
        # localCheckpoint: the batch is consumed TWICE (metric counts +
        # sink write); without the lineage cut the lookup join would
        # re-fire every HTTP request per consumer (the multiply-consumed
        # boundary rule, PERF_NOTES.md)
        enriched = http_lookup_join(
            batch_df, table, on={"id": "id"}, select=["name"], how="left"
        ).localCheckpoint(eager=True)
        counts = enriched.agg(
            F.count("*").alias("n"), F.count("name").alias("ok")
        ).collect()[0]
        write_http(enriched, sink_url, sink_opts)
        if counts["n"]:
            if not batch_log:
                first_batch_wire.append(w0)
            batch_log.append({
                "t0": t0,
                "dur_ms": round((time.monotonic() - t0) * 1000.0, 1),
                "rows": int(counts["n"]),
                "enriched": int(counts["ok"]),
            })

    query = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .option("numPartitions", source_partitions)
        .load()
        .select((F.col("value") % n_keys + 1).alias("id"), F.col("value"))
        .writeStream.foreachBatch(process)
        .option("checkpointLocation",
                tempfile.mkdtemp(prefix="stream_e2e_chaos_ckpt_"))
        .trigger(processingTime=f"{trigger_sec} seconds")
        .start()
    )

    def _wait_nonempty(n: int) -> None:
        deadline = time.time() + timeout_sec
        while time.time() < deadline:
            if len(batch_log) >= n:
                return
            if not query.isActive:
                raise RuntimeError(
                    f"chaos e2e query died: {query.exception()}"
                )
            time.sleep(0.1)
        query.stop()
        raise TimeoutError(
            f"chaos e2e: {n} non-empty batches not reached in {timeout_sec}s"
        )

    try:
        _wait_nonempty(pre_batches)
        wire_pre = wire_count()
        t_storm_on = time.monotonic()
        storm_on()
        _wait_nonempty(pre_batches + storm_batches)
        storm_off()
        t_storm_off = time.monotonic()
        wire_storm = wire_count() - wire_pre
        _wait_nonempty(pre_batches + storm_batches + post_batches)
        t_end = time.monotonic()
        wire_end = wire_count()
    finally:
        try:
            query.stop()
        except Exception:
            pass
    # post-mortem progress read (polling while alive races the final
    # commit — established recovery-leg discipline)
    progs = [
        p for p in (_as_dict(x) for x in query.recentProgress)
        if p.get("numInputRows", 0) > 0
    ]

    pre = [b for b in batch_log if b["t0"] < t_storm_on]
    storm = [b for b in batch_log if t_storm_on <= b["t0"] < t_storm_off]
    post = [b for b in batch_log if b["t0"] >= t_storm_off]
    degraded_storm = sum(b["rows"] - b["enriched"] for b in storm)
    rows_storm = sum(b["rows"] for b in storm)
    degraded_outside = sum(
        b["rows"] - b["enriched"] for b in pre + post
    )
    # recovery: index of the first post-flap batch back at 100% enrichment
    recovered_after = next(
        (i for i, b in enumerate(post) if b["rows"] == b["enriched"]), None
    )
    # no-breaker expectation: every storm batch re-fetches every distinct
    # key (the per-batch dedup means n_keys exchanges), each exchange
    # costing 1 + max_retries wire requests
    expected_no_breaker = max(1, len(storm)) * n_keys * (1 + max_retries)
    post_durs = sorted(b["dur_ms"] for b in post[1:]) or [float("inf")]
    storm_steady = sorted(b["dur_ms"] for b in storm[1:])
    out = {
        "pipeline": (
            "rate->http_lookup_join(breaker+retry+continue_on_error)"
            "->http_sink(foreachBatch) with mid-run 503 storm"
        ),
        "rows_per_second_requested": rows_per_second,
        "trigger_interval_ms": int(trigger_sec * 1000),
        "n_distinct_keys": n_keys,
        "breaker_threshold": breaker_threshold,
        "breaker_reset_sec": breaker_reset_sec,
        "batches": {"pre": len(pre), "storm": len(storm), "post": len(post)},
        "storm_wire_requests": wire_storm,
        "expected_wire_no_breaker": expected_no_breaker,
        "breaker_fail_fast": wire_storm < 0.5 * expected_no_breaker,
        "rows_storm_total": rows_storm,
        "rows_storm_degraded": degraded_storm,
        # continue_on_error contract: storm rows are DEGRADED (delivered
        # with NULL enrichment), never blocked — conservation is checked
        # run-wide below (rows_blocked = source input minus sink-delivered)
        "rows_degraded_outside_storm": degraded_outside,
        "first_storm_batch_ms": storm[0]["dur_ms"] if storm else None,
        "storm_steady_batch_ms_median": (
            _percentile(storm_steady, 0.5) if storm_steady else None
        ),
        "recovered_after_post_batches": recovered_after,
        "post_storm_recovered": bool(post) and (
            post[-1]["rows"] == post[-1]["enriched"]
        ),
        "post_storm_batch_ms_p95": _percentile(post_durs, 0.95),
        "kept_up_post_storm": _percentile(post_durs, 0.95)
        < trigger_sec * 1000,
        "batch_log": batch_log,
        # set unconditionally (None = "recentProgress yielded no non-empty
        # batches"), so downstream asserts diagnose a racy empty progress
        # list as a value mismatch instead of a KeyError
        "progress_batches_nonempty": 0,
        "rows_input_total": None,
        "rows_delivered_total": None,
        "rows_blocked": None,
        "rate_limit": None,
    }
    if rate_limit_rps is not None and batch_log:
        # numerator and denominator cover the SAME interval: requests
        # between the first non-empty batch and storm-on (see the
        # first_batch_wire snapshot above), over that same wall window
        t_first = batch_log[0]["t0"]
        wire_first = first_batch_wire[0] if first_batch_wire else 0
        pre_win = max(t_storm_on - t_first, 1e-9)
        storm_win = max(t_storm_off - t_storm_on, 1e-9)
        post_win = max(t_end - t_storm_off, 1e-9)
        agg_cap = rate_limit_rps * source_partitions
        achieved_pre = (wire_pre - wire_first) / pre_win
        achieved_post = (wire_end - wire_pre - wire_storm) / post_win
        out["rate_limit"] = {
            "configured_per_task_rps": rate_limit_rps,
            "burst": rate_limit_burst,
            # one TokenBucket per lookup task = per source partition
            "lookup_tasks": source_partitions,
            "configured_aggregate_rps": agg_cap,
            "achieved_rps_pre": round(achieved_pre, 1),
            "achieved_rps_storm": round(wire_storm / storm_win, 1),
            "achieved_rps_post": round(achieved_post, 1),
            # the cap HELD: achieved wire rate never exceeded the
            # aggregate budget (15% slack for window-boundary fuzz:
            # requests land on phase edges, and bucket bursts carry over)
            "cap_held_pre": achieved_pre <= agg_cap * 1.15,
            "cap_held_post": achieved_post <= agg_cap * 1.15,
        }
    if progs:
        out["progress_batches_nonempty"] = len(progs)
        input_total = int(sum(p["numInputRows"] for p in progs))
        delivered_total = int(sum(b["rows"] for b in batch_log))
        out["rows_input_total"] = input_total
        out["rows_delivered_total"] = delivered_total
        out["rows_blocked"] = max(0, input_total - delivered_total)
    return out

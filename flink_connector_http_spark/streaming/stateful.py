"""Custom stateful streaming operators (``applyInPandasWithState``).

The reference connector is proctime-only and carries no stateful operator
of its own — this module covers the training-data-pipeline side of the
engine: **streaming exact dedup**, the continuous analogue of the batch
``dedup_exact`` operator (``operators/dedup.py``). Each key (content hash)
is emitted exactly once across micro-batches; replays and duplicates are
suppressed via per-key state, with an optional processing-time TTL so
state stays bounded on endless streams.

Scale design: state is hash-partitioned by the dedup key (one shuffle —
the same key layout as batch exact dedup), checkpointed by Structured
Streaming, and evicted by TTL. The per-key payload is one boolean, so
state size is O(distinct keys within TTL), independent of stream length.
"""

from __future__ import annotations

from typing import Iterator, Optional, Sequence, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from . import await_drained
from ..plans.registry import register

__all__ = ["dedup_stream", "running_max_stream", "heavy_hitters_stream"]

_STATE_SCHEMA = T.StructType([T.StructField("emitted", T.BooleanType())])


def dedup_stream(
    df: DataFrame,
    key_cols: Sequence[str],
    *,
    order_col: Optional[str] = None,
    state_ttl_ms: Optional[int] = None,
) -> DataFrame:
    """Streaming exact dedup: emit ONE representative row per key across
    all micro-batches; later occurrences are dropped.

    ``order_col`` makes the representative deterministic (the minimum of
    that column within the key's first batch — e.g. ``doc_id``, mirroring
    batch ``dedup_exact``'s ``MIN(doc_id)``); without it the first row
    wins. ``state_ttl_ms`` expires a key's "seen" state after that much
    processing time, after which the key may be emitted again — the knob
    that bounds state on unbounded streams.
    """
    out_schema = df.schema
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_ms
        else GroupStateTimeout.NoTimeout
    )

    def fn(
        key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        best: Optional[pd.DataFrame] = None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            cand = (
                pdf.sort_values(order_col).head(1) if order_col else pdf.head(1)
            )
            if best is None or (
                order_col is not None
                and cand.iloc[0][order_col] < best.iloc[0][order_col]
            ):
                best = cand
        already_emitted = state.exists
        if not already_emitted:
            state.update((True,))
        if state_ttl_ms:
            state.setTimeoutDuration(state_ttl_ms)
        if best is not None and not already_emitted:
            yield best

    return df.groupBy(*key_cols).applyInPandasWithState(
        fn, out_schema, _STATE_SCHEMA, "append", timeout
    )


@register(
    "stream_dedup_documents",
    # the stream runs availableNow over the single documents parquet file
    # (one micro-batch), so the deterministic representative (min doc_id)
    # equals the relational first-occurrence — a full hash-checked oracle
    # for a custom stateful streaming operator
    oracle="""
    SELECT md5(lower(text)) AS content_hash, MIN(doc_id) AS keep_doc_id
    FROM documents GROUP BY content_hash
    """,
    doc="Streaming exact dedup via applyInPandasWithState: per-key state "
        "emits each content hash once (min doc_id representative); run to "
        "completion with availableNow and returned as a batch DataFrame.",
)
def stream_dedup_documents(spark, sf_dir: str) -> DataFrame:
    import tempfile
    import uuid

    name = f"stream_dedup_{uuid.uuid4().hex[:8]}"
    docs_schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    # the file streaming source requires a directory: expose the single
    # documents file through a temp dir symlink (testdata is read-only)
    in_dir = tempfile.mkdtemp(prefix="stream_dedup_in_")
    import os

    os.symlink(
        os.path.abspath(f"{sf_dir}/documents.parquet"),
        os.path.join(in_dir, "documents.parquet"),
    )
    stream = (
        spark.readStream.schema(docs_schema)
        .parquet(in_dir)
        .select(
            F.expr("md5(lower(text))").alias("content_hash"),
            F.col("doc_id"),
        )
    )
    query = (
        dedup_stream(stream, ["content_hash"], order_col="doc_id")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="stream_dedup_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    await_drained(query)
    return spark.table(name).select(
        "content_hash", F.col("doc_id").alias("keep_doc_id")
    )


# ---------------------------------------------------------------------------
# streaming per-key running max (emit-on-change leaderboard)
# ---------------------------------------------------------------------------

_MAX_STATE_SCHEMA = T.StructType([T.StructField("mx", T.DoubleType())])


def running_max_stream(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: str,
) -> DataFrame:
    """Continuous per-key maximum: emit ``(key, new_max)`` whenever a
    micro-batch raises a key's maximum; quiet batches emit nothing.

    The leaderboard/high-water-mark pattern: per-key state is ONE double,
    so state size is O(keys) regardless of stream length; the emission
    stream is the changelog of the running aggregate (at-most one row per
    key per batch).
    """
    out_schema = T.StructType(
        [df.schema[c] for c in key_cols]
        + [T.StructField("max_value", T.DoubleType())]
    )

    def fn(
        key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        batch_max: Optional[float] = None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            m = float(pdf[value_col].max())
            batch_max = m if batch_max is None else max(batch_max, m)
        if batch_max is None:
            return
        prev = state.get[0] if state.exists else None
        if prev is None or batch_max > prev:
            state.update((batch_max,))
            yield pd.DataFrame(
                [tuple(key) + (batch_max,)],
                columns=list(key_cols) + ["max_value"],
            )

    return df.groupBy(*key_cols).applyInPandasWithState(
        fn, out_schema, _MAX_STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
    )


@register(
    "stream_running_max_value",
    # availableNow over one parquet file = one micro-batch, so the single
    # emission per user equals the relational global max — a full hash
    # gate for the stateful operator; multi-batch emit-on-change behavior
    # is pinned by tests/test_streaming_stateful_max.py
    oracle="""
    SELECT user_id,
           CAST(MAX(CAST(value AS DECIMAL(10,2))) AS DOUBLE) AS max_value
    FROM events GROUP BY user_id
    """,
    doc="Custom stateful streaming aggregate (applyInPandasWithState): "
        "per-user running maximum emitting only on change — the "
        "high-water-mark changelog pattern with O(keys) state.",
)
def stream_running_max_value(spark, sf_dir: str) -> DataFrame:
    import os
    import tempfile
    import uuid

    name = f"stream_max_{uuid.uuid4().hex[:8]}"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    in_dir = tempfile.mkdtemp(prefix="stream_max_in_")
    os.symlink(
        os.path.abspath(f"{sf_dir}/events.parquet"),
        os.path.join(in_dir, "events.parquet"),
    )
    stream = (
        spark.readStream.schema(raw_schema)
        .parquet(in_dir)
        .select(
            "user_id",
            F.expr("CAST(CAST(value AS DECIMAL(10,2)) AS DOUBLE)").alias("value"),
        )
    )
    query = (
        running_max_stream(stream, ["user_id"], "value")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="stream_max_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    await_drained(query)
    return spark.table(name)


# ---------------------------------------------------------------------------
# streaming heavy hitters (per-key cumulative counts, threshold changelog)
# ---------------------------------------------------------------------------

_HH_STATE_SCHEMA = T.StructType([T.StructField("cnt", T.LongType())])


def heavy_hitters_stream(
    df: DataFrame,
    key_cols: Sequence[str],
    threshold: int,
    *,
    state_ttl_ms: Optional[int] = None,
) -> DataFrame:
    """Continuous frequent-key detection: per-key cumulative counts, and a
    ``(key, n_events)`` row emitted in every micro-batch where the key both
    received rows and its cumulative count is >= ``threshold`` — the
    changelog of the heavy-hitter set.

    Per-key state is ONE bigint, so state size is O(keys) — and with
    ``state_ttl_ms``, O(keys active within the TTL window). (Spark 4's
    ``transformWithStateInPandas`` with typed ValueState+TTL is the
    successor API for this operator; it requires the ``protobuf`` package,
    absent from this environment, so the implementation stays on
    ``applyInPandasWithState`` — same semantics, same state layout.)
    """
    out_schema = T.StructType(
        [df.schema[c] for c in key_cols]
        + [T.StructField("n_events", T.LongType())]
    )
    names = list(key_cols)
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_ms
        else GroupStateTimeout.NoTimeout
    )

    def fn(
        key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        new = sum(len(pdf) for pdf in pdfs)
        if new == 0:
            return
        total = (state.get[0] if state.exists else 0) + new
        state.update((total,))
        if state_ttl_ms:
            state.setTimeoutDuration(state_ttl_ms)
        if total >= threshold:
            yield pd.DataFrame(
                [tuple(key) + (total,)], columns=names + ["n_events"]
            )

    return df.groupBy(*names).applyInPandasWithState(
        fn, out_schema, _HH_STATE_SCHEMA, "append", timeout
    )


@register(
    "stream_heavy_hitters",
    # availableNow over one parquet file = one micro-batch → each
    # qualifying key emits exactly once with its full count, equal to the
    # relational GROUP BY ... HAVING. Multi-batch accumulation/emission is
    # pinned by tests/test_streaming_stateful_hh.py.
    oracle="""
    SELECT user_id, COUNT(*) AS n_events
    FROM events GROUP BY user_id HAVING COUNT(*) >= 70
    """,
    doc="Streaming heavy-hitter detection: per-user cumulative event "
        "counts in O(keys) state, changelog emission once a key crosses "
        "the threshold.",
)
def stream_heavy_hitters(spark, sf_dir: str) -> DataFrame:
    import os
    import tempfile
    import uuid

    name = f"stream_hh_{uuid.uuid4().hex[:8]}"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    in_dir = tempfile.mkdtemp(prefix="stream_hh_in_")
    os.symlink(
        os.path.abspath(f"{sf_dir}/events.parquet"),
        os.path.join(in_dir, "events.parquet"),
    )
    stream = (
        spark.readStream.schema(raw_schema).parquet(in_dir).select("user_id")
    )
    query = (
        heavy_hitters_stream(stream, ["user_id"], 70)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="stream_hh_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    await_drained(query)
    return spark.table(name)


# ---------------------------------------------------------------------------
# streaming EWMA (dyadic weights — the stateful sibling of q_ewma_user_value)
# ---------------------------------------------------------------------------

EWMA_STREAM_DEPTH = 10

_EWMA_STATE_SCHEMA = T.StructType(
    [T.StructField("recent", T.ArrayType(T.LongType()))]
)


def ewma_stream(
    df: DataFrame,
    key_cols: Sequence[str],
    cents_col: str,
    order_cols: Sequence[str],
    depth: int = EWMA_STREAM_DEPTH,
) -> DataFrame:
    """Continuous per-key EWMA (alpha = 1/2, truncated at ``depth`` lags)
    over an integer ``cents`` column: each micro-batch emits the key's
    smoothed value after consuming the batch.

    State per key is the last ``depth`` cents values (≤ depth bigints, so
    O(keys·depth) total — a bounded ring, not the stream). The weights
    are dyadic (2^-k), so the smoothing arithmetic is scaled-integer and
    bit-identical to the batch ``q_ewma_user_value`` — the batch/stream
    parity every lambda-architecture consumer wants but float pow()
    weighting cannot deliver. Rows within a batch are ordered by
    ``order_cols`` before folding, keeping replay deterministic.
    """
    out_schema = T.StructType(
        [df.schema[c] for c in key_cols]
        + [T.StructField("ewma", T.DoubleType())]
    )
    names = list(key_cols)
    ocols = list(order_cols)

    def fn(
        key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        parts = [pdf for pdf in pdfs if len(pdf)]
        if not parts:
            return
        batch = pd.concat(parts).sort_values(ocols)
        recent = list(state.get[0]) if state.exists else []
        for cents in batch[cents_col]:
            recent.insert(0, int(cents))
        recent = recent[:depth]
        state.update((recent,))
        s = sum(c << (depth - 1 - k) for k, c in enumerate(recent))
        d = sum(1 << (depth - 1 - k) for k in range(len(recent)))
        yield pd.DataFrame(
            [tuple(key) + (s / (d * 100),)], columns=names + ["ewma"]
        )

    return df.groupBy(*names).applyInPandasWithState(
        fn, out_schema, _EWMA_STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
    )


@register(
    "stream_ewma_user_value",
    # availableNow over one parquet file = one micro-batch, so each user's
    # single emission equals the batch EWMA at their LAST event — full
    # hash-gate parity with q_ewma_user_value's final row per user.
    # Unrounded doubles on both sides: numerator/denominator are exact
    # integers < 2^53, so the one IEEE division is bit-identical.
    oracle="""
    WITH c AS (
      SELECT event_id, user_id, ts,
             CAST(CAST(value AS DECIMAL(10,2)) * 100 AS BIGINT) AS cents
      FROM events
    ),
    s AS (
      SELECT user_id,
             COALESCE(lag(cents, 0) OVER w, 0) * 512 + COALESCE(lag(cents, 1) OVER w, 0) * 256
             + COALESCE(lag(cents, 2) OVER w, 0) * 128 + COALESCE(lag(cents, 3) OVER w, 0) * 64
             + COALESCE(lag(cents, 4) OVER w, 0) * 32 + COALESCE(lag(cents, 5) OVER w, 0) * 16
             + COALESCE(lag(cents, 6) OVER w, 0) * 8 + COALESCE(lag(cents, 7) OVER w, 0) * 4
             + COALESCE(lag(cents, 8) OVER w, 0) * 2 + COALESCE(lag(cents, 9) OVER w, 0) * 1
               AS s_scaled,
             (CASE WHEN lag(cents, 0) OVER w IS NOT NULL THEN 512 ELSE 0 END)
             + (CASE WHEN lag(cents, 1) OVER w IS NOT NULL THEN 256 ELSE 0 END)
             + (CASE WHEN lag(cents, 2) OVER w IS NOT NULL THEN 128 ELSE 0 END)
             + (CASE WHEN lag(cents, 3) OVER w IS NOT NULL THEN 64 ELSE 0 END)
             + (CASE WHEN lag(cents, 4) OVER w IS NOT NULL THEN 32 ELSE 0 END)
             + (CASE WHEN lag(cents, 5) OVER w IS NOT NULL THEN 16 ELSE 0 END)
             + (CASE WHEN lag(cents, 6) OVER w IS NOT NULL THEN 8 ELSE 0 END)
             + (CASE WHEN lag(cents, 7) OVER w IS NOT NULL THEN 4 ELSE 0 END)
             + (CASE WHEN lag(cents, 8) OVER w IS NOT NULL THEN 2 ELSE 0 END)
             + (CASE WHEN lag(cents, 9) OVER w IS NOT NULL THEN 1 ELSE 0 END)
               AS d_scaled,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM c
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           CAST(s_scaled AS DOUBLE) / (CAST(d_scaled AS DOUBLE) * 100) AS ewma
    FROM s WHERE rn = 1
    """,
    doc="Streaming EWMA (applyInPandasWithState): the stateful sibling of "
        "q_ewma_user_value — per-user dyadic-weight smoothing carrying a "
        "bounded ring of the last 10 cents values as state, emitting the "
        "current smoothed value each batch. Bit-identical batch/stream "
        "parity: the oracle is the BATCH EWMA at each user's last event, "
        "and the hash gate proves the stream converges to exactly it.",
)
def stream_ewma_user_value(spark, sf_dir: str) -> DataFrame:
    import os
    import tempfile
    import uuid

    name = f"stream_ewma_{uuid.uuid4().hex[:8]}"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    in_dir = tempfile.mkdtemp(prefix="stream_ewma_in_")
    os.symlink(
        os.path.abspath(f"{sf_dir}/events.parquet"),
        os.path.join(in_dir, "events.parquet"),
    )
    stream = (
        spark.readStream.schema(raw_schema)
        .parquet(in_dir)
        .select(
            "user_id", "ts", "event_id",
            F.expr("CAST(CAST(value AS DECIMAL(10,2)) * 100 AS BIGINT)")
            .alias("cents"),
        )
    )
    query = (
        ewma_stream(stream, ["user_id"], "cents", ["ts", "event_id"])
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="stream_ewma_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    await_drained(query)
    return spark.table(name)


# ---------------------------------------------------------------------------
# streaming anomaly detection: running z-score from exact sufficient stats
# ---------------------------------------------------------------------------

ANOM_MIN_PREFIX = 10   # need this many prior observations before flagging
ANOM_Z = 3.0

_ANOM_STATE_SCHEMA = T.StructType([
    T.StructField("n", T.LongType()),
    T.StructField("s", T.LongType()),
    T.StructField("ss", T.LongType()),
])


def anomaly_zscore_stream(
    df: DataFrame,
    key_cols: Sequence[str],
    cents_col: str,
    order_cols: Sequence[str],
    *,
    min_prefix: int = ANOM_MIN_PREFIX,
    z_threshold: float = ANOM_Z,
) -> DataFrame:
    """Continuous anomaly detection: each observation is scored against
    the EXACT running mean/std of all strictly-preceding observations of
    its key (population variance from integer sufficient statistics
    n/sum/sum-of-squares carried as state — three bigints per key), and
    emitted when |x - mean| > z * std. Integer state means the stream
    is bit-reproducible and agrees exactly with the batch prefix-window
    replay — no Welford float accumulation to drift across replays.
    Rows are folded in ``order_cols`` order within each batch.
    """
    out_fields = [df.schema[c] for c in key_cols] + [
        T.StructField("event_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("z", T.DoubleType()),
    ]
    out_schema = T.StructType(out_fields)
    names = list(key_cols)
    ocols = list(order_cols)

    def fn(
        key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        parts = [pdf for pdf in pdfs if len(pdf)]
        if not parts:
            return
        batch = pd.concat(parts).sort_values(ocols)
        n, s, ss = state.get if state.exists else (0, 0, 0)
        rows = []
        for event_id, cents in zip(batch["event_id"], batch[cents_col]):
            cents = int(cents)
            if n >= min_prefix:
                mean = s / n
                var = (ss - s * s / n) / n
                std = var ** 0.5 if var > 0 else 0.0
                if abs(cents - mean) > z_threshold * std:
                    z = (cents - mean) / std if std > 0 else float("inf")
                    rows.append(
                        tuple(key) + (int(event_id), cents / 100, round(z, 6))
                    )
            n, s, ss = n + 1, s + cents, ss + cents * cents
        state.update((n, s, ss))
        if rows:
            yield pd.DataFrame(rows, columns=names + ["event_id", "value", "z"])

    return df.groupBy(*names).applyInPandasWithState(
        fn, out_schema, _ANOM_STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
    )


@register(
    "stream_anomaly_zscore",
    # single availableNow batch ⇒ each row is scored against its exact
    # strictly-preceding prefix — identical to the batch prefix-window
    # replay below (integer sufficient stats, same IEEE ops, both sides)
    oracle=f"""
    WITH c AS (
      SELECT user_id, event_id, ts,
             CAST(CAST(value AS DECIMAL(10,2)) * 100 AS BIGINT) AS cents
      FROM events
    ),
    p AS (
      SELECT user_id, event_id, cents,
             COUNT(*) OVER w AS n_prev,
             SUM(cents) OVER w AS s_prev,
             SUM(cents * cents) OVER w AS ss_prev
      FROM c
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id, event_id,
           CAST(cents AS DOUBLE) / 100 AS value,
           round((cents - CAST(s_prev AS DOUBLE) / n_prev)
                 / sqrt((ss_prev - CAST(s_prev AS DOUBLE) * s_prev / n_prev)
                        / n_prev), 6) AS z
    FROM p
    WHERE n_prev >= {ANOM_MIN_PREFIX}
      AND abs(cents - CAST(s_prev AS DOUBLE) / n_prev)
          > {ANOM_Z} * sqrt((ss_prev
                             - CAST(s_prev AS DOUBLE) * s_prev / n_prev)
                            / n_prev)
    """,
    doc="Streaming per-user anomaly detection (applyInPandasWithState): "
        "every observation scored against the exact running mean/std of "
        "its strictly-preceding history, carried as three INTEGER "
        "sufficient statistics per key. The oracle replays the identical "
        "math as a batch prefix window (ROWS ... 1 PRECEDING), and the "
        "hash gate proves stream and batch agree bit-for-bit — the "
        "monitoring-pipeline property that float Welford accumulators "
        "lose across checkpoint replays.",
)
def stream_anomaly_zscore(spark, sf_dir: str) -> DataFrame:
    import os
    import tempfile
    import uuid

    name = f"stream_anom_{uuid.uuid4().hex[:8]}"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    in_dir = tempfile.mkdtemp(prefix="stream_anom_in_")
    os.symlink(
        os.path.abspath(f"{sf_dir}/events.parquet"),
        os.path.join(in_dir, "events.parquet"),
    )
    stream = (
        spark.readStream.schema(raw_schema)
        .parquet(in_dir)
        .select(
            "user_id", "ts", "event_id",
            F.expr("CAST(CAST(value AS DECIMAL(10,2)) * 100 AS BIGINT)")
            .alias("cents"),
        )
    )
    query = (
        anomaly_zscore_stream(stream, ["user_id"], "cents", ["ts", "event_id"])
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="stream_anom_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    await_drained(query)
    return spark.table(name)


# ---------------------------------------------------------------------------
# streaming KMV distinct-count sketch (bottom-k state per key)
# ---------------------------------------------------------------------------

KMV_STREAM_K = 64
_KMV_SPACE = float(1 << 60)

_KMV_STATE_SCHEMA = T.StructType(
    [T.StructField("mins", T.ArrayType(T.LongType()))]
)


def kmv_distinct_stream(
    df: DataFrame,
    key_cols: Sequence[str],
    hash_col: str,
    k: int = KMV_STREAM_K,
) -> DataFrame:
    """Continuous distinct-count estimation: per-key bottom-``k`` set of
    60-bit element hashes carried as state (≤ k bigints — O(keys·k)
    total, stream-length independent), emitting the current estimate
    each micro-batch. The same lattice-merge property the batch
    ``sketch_kmv_user_rollup`` exploits makes the streaming update
    trivially correct: bottom-k(state ∪ batch) is the exact bottom-k of
    everything seen. Deterministic md5-derived hashes → replays emit
    identical estimates."""
    out_schema = T.StructType(
        [df.schema[c] for c in key_cols] + [
            T.StructField("sketch_size", T.LongType()),
            T.StructField("est_distinct", T.DoubleType()),
        ]
    )
    names = list(key_cols)

    def fn(
        key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        new_hashes = set()
        for pdf in pdfs:
            if len(pdf):
                new_hashes.update(int(h) for h in pdf[hash_col])
        if not new_hashes:
            return
        mins = set(state.get[0]) if state.exists else set()
        mins |= new_hashes
        mins = sorted(mins)[:k]
        state.update((mins,))
        size = len(mins)
        est = float(size) if size < k else (k - 1) * _KMV_SPACE / mins[-1]
        yield pd.DataFrame(
            [tuple(key) + (size, est)],
            columns=names + ["sketch_size", "est_distinct"],
        )

    return df.groupBy(*names).applyInPandasWithState(
        fn, out_schema, _KMV_STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
    )


@register(
    "stream_kmv_distinct_users",
    # single availableNow batch ⇒ one emission per event_type holding the
    # bottom-k estimate over all its users — identical to the batch KMV
    # (unrounded doubles: both sides run (k-1)*space/kth on exact ints)
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT event_type,
             ('0x' || substr(md5(concat('u:', user_id)), 1, 15))::BIGINT AS hv
      FROM events
    ),
    ranked AS (
      SELECT event_type, hv,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hv) AS rk,
             COUNT(*) OVER (PARTITION BY event_type) AS n_tot
      FROM h
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS sketch_size,
           CASE WHEN COUNT(*) < {KMV_STREAM_K}
                THEN CAST(COUNT(*) AS DOUBLE)
                ELSE ({KMV_STREAM_K} - 1) * CAST({_KMV_SPACE!r} AS DOUBLE)
                     / MAX(hv)
           END AS est_distinct
    FROM ranked WHERE rk <= {KMV_STREAM_K}
    GROUP BY event_type
    """,
    doc="Streaming distinct-user estimation per event_type "
        "(applyInPandasWithState): bottom-64 md5-hash state per key, "
        "current KMV estimate emitted each batch. The hash gate pins "
        "stream/batch parity — the single-batch emission must equal the "
        "batch KMV sketch bit-for-bit, the property that lets a serving "
        "layer mix precomputed batch sketches with live streaming "
        "updates on one estimator.",
)
def stream_kmv_distinct_users(spark, sf_dir: str) -> DataFrame:
    import os
    import tempfile
    import uuid

    name = f"stream_kmv_{uuid.uuid4().hex[:8]}"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    in_dir = tempfile.mkdtemp(prefix="stream_kmv_in_")
    os.symlink(
        os.path.abspath(f"{sf_dir}/events.parquet"),
        os.path.join(in_dir, "events.parquet"),
    )
    stream = (
        spark.readStream.schema(raw_schema)
        .parquet(in_dir)
        .select(
            "event_type",
            F.expr(
                "CAST(conv(substr(md5(concat('u:', user_id)), 1, 15), 16, 10) "
                "AS BIGINT)"
            ).alias("hv"),
        )
    )
    query = (
        kmv_distinct_stream(stream, ["event_type"], "hv")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="stream_kmv_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    await_drained(query)
    return spark.table(name)


# ---------------------------------------------------------------------------
# streaming first-seen detector (keyed-firsts changelog)
# ---------------------------------------------------------------------------

_SEEN_STATE_SCHEMA = T.StructType([T.StructField("seen", T.BooleanType())])


def first_seen_stream(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    carry_cols: Sequence[str],
) -> DataFrame:
    """Emit exactly one row per key — the key's FIRST record in
    ``order_cols`` order — across the whole stream. One boolean of state
    per key; subsequent batches for a seen key emit nothing. The keyed
    analogue of dropDuplicates for 'who/what arrived, and when' feeds
    (new-user detectors, first-contact attribution) where only the
    earliest record matters."""
    out_schema = T.StructType(
        [df.schema[c] for c in key_cols] + [df.schema[c] for c in carry_cols]
    )
    names = list(key_cols)
    ocols = list(order_cols)
    carry = list(carry_cols)

    def fn(
        key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            return
        parts = [pdf for pdf in pdfs if len(pdf)]
        if not parts:
            return
        first = pd.concat(parts).sort_values(ocols).iloc[0]
        state.update((True,))
        yield pd.DataFrame(
            [tuple(key) + tuple(first[c] for c in carry)],
            columns=names + carry,
        )

    return df.groupBy(*names).applyInPandasWithState(
        fn, out_schema, _SEEN_STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
    )


@register(
    "stream_first_seen_users",
    # single availableNow batch ⇒ one row per user holding the earliest
    # (ts, event_id) record — the relational argmin
    oracle="""
    SELECT user_id, event_id, event_type
    FROM (
      SELECT user_id, event_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rk
      FROM events
    ) t WHERE rk = 1
    """,
    doc="Streaming first-seen detector (applyInPandasWithState): one "
        "boolean of state per key, one emission per key ever — each "
        "user's earliest event with its type. The keyed-firsts "
        "changelog that powers new-user counters and first-touch "
        "attribution without replaying history; the oracle pins it to "
        "the relational per-key argmin.",
)
def stream_first_seen_users(spark, sf_dir: str) -> DataFrame:
    import os
    import tempfile
    import uuid

    name = f"stream_first_{uuid.uuid4().hex[:8]}"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    in_dir = tempfile.mkdtemp(prefix="stream_first_in_")
    os.symlink(
        os.path.abspath(f"{sf_dir}/events.parquet"),
        os.path.join(in_dir, "events.parquet"),
    )
    stream = (
        spark.readStream.schema(raw_schema)
        .parquet(in_dir)
        .select("user_id", "ts", "event_id", "event_type")
    )
    query = (
        first_seen_stream(
            stream, ["user_id"], ["ts", "event_id"], ["event_id", "event_type"]
        )
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation",
                tempfile.mkdtemp(prefix="stream_first_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    await_drained(query)
    return spark.table(name)


# ---------------------------------------------------------------------------
# streaming CUSUM level-shift alarm (exact batch-stream parity)
# ---------------------------------------------------------------------------

CUSUM_K_CENTS = 6000    # reference level k (cents): drift below k resets
CUSUM_H_CENTS = 50000   # alarm threshold h (cents of sustained excess)

_CUSUM_STATE_SCHEMA = T.StructType([
    T.StructField("pfx", T.LongType()),
    T.StructField("mn", T.LongType()),
])


def cusum_stream(
    df: DataFrame,
    key_cols: Sequence[str],
    cents_col: str,
    order_cols: Sequence[str],
    *,
    k_cents: int = CUSUM_K_CENTS,
    h_cents: int = CUSUM_H_CENTS,
) -> DataFrame:
    """One-sided CUSUM alarm per key: the classic Page statistic
    ``S_t = max(0, S_{t-1} + x_t - k)`` carried via the algebraic identity
    ``S_t = P_t - min(0, min_{j<=t} P_j)`` where ``P`` is the running
    prefix sum of ``x - k`` — so the whole state is TWO bigints per key
    (prefix, running min), both exact integers, and the stream replays
    bit-identically against the batch window form of the same identity.
    A row is emitted whenever ``S_t > h`` (a sustained level shift above
    the reference ``k``). Rows fold in ``order_cols`` order within each
    batch."""
    out_fields = [df.schema[c] for c in key_cols] + [
        T.StructField("event_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("s_scaled", T.LongType()),
    ]
    out_schema = T.StructType(out_fields)
    names = list(key_cols)
    ocols = list(order_cols)

    def fn(
        key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        parts = [pdf for pdf in pdfs if len(pdf)]
        if not parts:
            return
        batch = pd.concat(parts).sort_values(ocols)
        pfx, mn = state.get if state.exists else (0, 0)
        rows = []
        for event_id, cents in zip(batch["event_id"], batch[cents_col]):
            pfx += int(cents) - k_cents
            mn = min(mn, pfx)
            s = pfx - mn
            if s > h_cents:
                rows.append(tuple(key) + (int(event_id), int(cents) / 100, s))
        state.update((pfx, mn))
        if rows:
            yield pd.DataFrame(rows, columns=names + ["event_id", "value", "s_scaled"])

    return df.groupBy(*names).applyInPandasWithState(
        fn, out_schema, _CUSUM_STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
    )


@register(
    "stream_cusum_alerts",
    # batch replay of the same identity: S_t = pfx_t - min(0, min pfx)
    # over the (ts, event_id) order — all integer cents, so the stream's
    # two-bigint state reproduces the window computation exactly
    oracle=f"""
    WITH c AS (
      SELECT event_id, event_type, ts,
             CAST(CAST(value AS DECIMAL(10,2)) * 100 AS BIGINT) AS cents
      FROM events
    ),
    p AS (
      SELECT event_id, event_type, ts, cents,
             SUM(cents - {CUSUM_K_CENTS}) OVER w AS pfx
      FROM c WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
    ),
    m AS (
      SELECT *, LEAST(MIN(pfx) OVER w2, 0) AS mn
      FROM p WINDOW w2 AS (PARTITION BY event_type ORDER BY ts, event_id)
    )
    SELECT event_type, event_id,
           CAST(cents AS DOUBLE) / 100 AS value,
           CAST(pfx - mn AS BIGINT) AS s_scaled
    FROM m WHERE pfx - mn > {CUSUM_H_CENTS}
    """,
    doc=f"Streaming CUSUM level-shift alarm (applyInPandasWithState): "
        f"per event type, Page's one-sided CUSUM against reference level "
        f"k={CUSUM_K_CENTS} cents with alarm threshold h={CUSUM_H_CENTS} "
        "— the drift detector a feature pipeline runs on incoming metric "
        "streams. State per key is two exact bigints (prefix sum and its "
        "running minimum: S_t = pfx - min(0, min pfx), the algebraic "
        "form of max(0, S+x-k)) so state is O(keys), independent of "
        "stream length, and the hash gate proves exact batch-stream "
        "parity against the window-form oracle.",
)
def stream_cusum_alerts(spark, sf_dir: str) -> DataFrame:
    import os
    import tempfile
    import uuid

    name = f"stream_cusum_{uuid.uuid4().hex[:8]}"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    in_dir = tempfile.mkdtemp(prefix="stream_cusum_in_")
    os.symlink(
        os.path.abspath(f"{sf_dir}/events.parquet"),
        os.path.join(in_dir, "events.parquet"),
    )
    stream = (
        spark.readStream.schema(raw_schema)
        .parquet(in_dir)
        .select(
            "event_type", "ts", "event_id",
            F.expr("CAST(CAST(value AS DECIMAL(10,2)) * 100 AS BIGINT)")
            .alias("cents"),
        )
    )
    query = (
        cusum_stream(stream, ["event_type"], "cents", ["ts", "event_id"])
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="stream_cusum_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    await_drained(query)
    return spark.table(name)


# ---------------------------------------------------------------------------
# custom stateful sessionization (EventTimeTimeout: watermark-driven close)
# ---------------------------------------------------------------------------

SESSION_GAP_US = 3_600_000_000  # 1h inactivity gap, matches session_window

_SESSION_STATE_SCHEMA = T.StructType([
    T.StructField("start_us", T.LongType()),
    T.StructField("last_us", T.LongType()),
    T.StructField("n", T.LongType()),
])


def sessionize_stream(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    order_cols: Sequence[str],
    *,
    gap_us: int = SESSION_GAP_US,
) -> DataFrame:
    """Gap-based sessionization as a CUSTOM stateful operator — the
    hand-rolled twin of ``session_window`` built on
    ``applyInPandasWithState`` with **EventTimeTimeout**: a session closes
    either when a later event of the same key arrives past the gap
    (successor close, emitted immediately) or when the WATERMARK passes
    its would-be end (timeout close — how the final session of a key
    leaves state without another event ever arriving). State per key is
    three bigints; the timeout timestamp is re-armed to ``last + gap`` on
    every update, so state lifetime is bounded by the gap plus the
    watermark delay. The input stream must carry a watermark on
    ``ts_col`` (EventTimeTimeout requires one)."""
    out_schema = T.StructType([
        df.schema[key_col],
        T.StructField("session_start_us", T.LongType()),
        T.StructField("session_end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ])
    ocols = list(order_cols)

    def fn(
        key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                [key + (start_us, last_us + gap_us, n)],
                columns=[key_col, "session_start_us", "session_end_us",
                         "n_events"],
            )
            return
        parts = [pdf for pdf in pdfs if len(pdf)]
        if not parts:
            return
        batch = pd.concat(parts).sort_values(ocols)
        # pandas datetime64 is NANOSECONDS; session math runs in micros
        ts_us = (batch[ts_col].astype("int64") // 1000).tolist()
        start_us, last_us, n = state.get if state.exists else (None, None, 0)
        closed = []
        for t in ts_us:
            if start_us is None:
                start_us, last_us, n = t, t, 1
            elif t - last_us >= gap_us:
                closed.append((start_us, last_us + gap_us, n))
                start_us, last_us, n = t, t, 1
            else:
                last_us, n = max(last_us, t), n + 1
        state.update((start_us, last_us, n))
        # re-arm: the open session times out when the watermark passes its
        # prospective end
        state.setTimeoutTimestamp((last_us + gap_us) // 1000)
        if closed:
            yield pd.DataFrame(
                [key + c for c in closed],
                columns=[key_col, "session_start_us", "session_end_us",
                         "n_events"],
            )

    return df.groupBy(key_col).applyInPandasWithState(
        fn, out_schema, _SESSION_STATE_SCHEMA, "append",
        GroupStateTimeout.EventTimeTimeout,
    )


@register(
    "stream_session_stateful",
    # emitted sessions = those closed by a SUCCESSOR event (every
    # non-final session of a user — all data arrives in one availableNow
    # batch) plus final sessions whose prospective end the final
    # watermark (max ts - 1h) passed via EventTimeTimeout
    oracle=f"""
    WITH marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(LAG(ts) OVER w)
                          >= {SESSION_GAP_US}
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked
    ),
    agg AS (
      SELECT user_id, sid,
             MIN(ts) AS session_start,
             MAX(ts) + INTERVAL 1 HOUR AS session_end,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             MAX(sid) OVER (PARTITION BY user_id) AS max_sid
      FROM sess GROUP BY user_id, sid
    ),
    wm AS (SELECT max(ts) - INTERVAL 1 HOUR AS w FROM events)
    SELECT user_id, session_start, session_end, n_events
    FROM agg
    WHERE sid < max_sid OR session_end <= (SELECT w FROM wm)
    """,
    doc="Custom stateful sessionization (applyInPandasWithState + "
        "EventTimeTimeout): the hand-rolled session operator for "
        "semantics session_window cannot express (per-session custom "
        "folds, emit-on-close side effects). Sessions close by successor "
        "event immediately or by the watermark passing their prospective "
        "end (timeout) — so unlike session_window, successor-closed "
        "sessions emit without waiting for the watermark; the oracle "
        "encodes exactly that hybrid rule. Three bigints of state per "
        "key, timeout re-armed per update — state is bounded by gap + "
        "watermark delay, independent of stream length.",
)
def stream_session_stateful(spark, sf_dir: str) -> DataFrame:
    import os
    import tempfile
    import uuid

    from ..plans.registry import normalize_events_ts

    name = f"stream_sess_st_{uuid.uuid4().hex[:8]}"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    in_dir = tempfile.mkdtemp(prefix="stream_sess_st_in_")
    os.symlink(
        os.path.abspath(f"{sf_dir}/events.parquet"),
        os.path.join(in_dir, "events.parquet"),
    )
    stream = (
        normalize_events_ts(
            spark.readStream.schema(raw_schema).parquet(in_dir),
            target="timestamp",
        )
        .withWatermark("ts", "1 hour")
        .select("user_id", "ts", "event_id")
    )
    query = (
        sessionize_stream(stream, "user_id", "ts", ["ts", "event_id"])
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option(
            "checkpointLocation", tempfile.mkdtemp(prefix="stream_sess_st_ckpt_")
        )
        .trigger(availableNow=True)
        .start()
    )
    await_drained(query)
    out = spark.table(name)
    return out.select(
        "user_id",
        F.expr("CAST(timestamp_micros(session_start_us) AS TIMESTAMP_NTZ)")
        .alias("session_start"),
        F.expr("CAST(timestamp_micros(session_end_us) AS TIMESTAMP_NTZ)")
        .alias("session_end"),
        "n_events",
    )


# ---------------------------------------------------------------------------
# streaming log-binned quantile sketch (mergeable bin-map state per key)
# ---------------------------------------------------------------------------

_QSK_STATE_SCHEMA = T.StructType([
    T.StructField("bins", T.ArrayType(T.IntegerType())),
    T.StructField("counts", T.ArrayType(T.LongType())),
])


def logbin_quantile_stream(
    df: DataFrame,
    key_cols: Sequence[str],
    bin_col: str,
) -> DataFrame:
    """Continuous per-key quantile monitoring: the state is the same
    (bin → count) map the batch ``sketch_logbin_quantiles`` builds, so
    the streaming update is plain count addition (the sketch's merge
    law) and state size is bounded by the bin RANGE — never by stream
    length. Each micro-batch emits the keys it touched with the current
    p50/p90/p99 bin ids read off the cumulative histogram."""
    import math

    out_schema = T.StructType(
        [df.schema[c] for c in key_cols] + [
            T.StructField("n_docs", T.LongType()),
            T.StructField("p50_bin", T.IntegerType()),
            T.StructField("p90_bin", T.IntegerType()),
            T.StructField("p99_bin", T.IntegerType()),
            T.StructField("sketch_bins", T.LongType()),
        ]
    )
    names = list(key_cols)

    def fn(
        key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        fresh: dict = {}
        for pdf in pdfs:
            for b in pdf[bin_col]:
                b = int(b)
                fresh[b] = fresh.get(b, 0) + 1
        if not fresh:
            return
        if state.exists:
            bins, counts = state.get
            merged = dict(zip((int(b) for b in bins),
                              (int(c) for c in counts)))
        else:
            merged = {}
        for b, c in fresh.items():
            merged[b] = merged.get(b, 0) + c
        items = sorted(merged.items())
        state.update(([b for b, _ in items], [c for _, c in items]))
        tot = sum(c for _, c in items)
        qbins = []
        for q in (0.50, 0.90, 0.99):
            need = math.ceil(q * tot)
            cum = 0
            pick = items[-1][0]
            for b, c in items:
                cum += c
                if cum >= need:
                    pick = b
                    break
            qbins.append(pick)
        yield pd.DataFrame(
            [tuple(key) + (tot, qbins[0], qbins[1], qbins[2], len(items))],
            columns=names + ["n_docs", "p50_bin", "p90_bin", "p99_bin",
                             "sketch_bins"],
        )

    return df.groupBy(*names).applyInPandasWithState(
        fn, out_schema, _QSK_STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
    )


@register(
    "stream_logbin_quantiles",
    # single availableNow batch ⇒ one emission per source equal to the
    # batch sketch (integer bin ids; ceil(q*tot) evaluated identically)
    oracle="""
    WITH b AS (
      SELECT source,
             CAST(FLOOR(log2(CAST(n_chars AS DOUBLE)) * 4) AS INT) AS bin,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM documents GROUP BY source, bin
    ),
    w AS (
      SELECT source, bin, c,
             SUM(c) OVER (PARTITION BY source ORDER BY bin
                          ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(c) OVER (PARTITION BY source) AS tot
      FROM b
    )
    SELECT source,
           CAST(MAX(tot) AS BIGINT) AS n_docs,
           CAST(MIN(CASE WHEN cum >= CEIL(0.50 * tot) THEN bin END) AS INT)
             AS p50_bin,
           CAST(MIN(CASE WHEN cum >= CEIL(0.90 * tot) THEN bin END) AS INT)
             AS p90_bin,
           CAST(MIN(CASE WHEN cum >= CEIL(0.99 * tot) THEN bin END) AS INT)
             AS p99_bin,
           CAST(COUNT(*) AS BIGINT) AS sketch_bins
    FROM w GROUP BY source
    """,
    doc="Streaming per-source length-quantile monitoring "
        "(applyInPandasWithState): the state is the mergeable (bin → "
        "count) map of sketch_logbin_quantiles, updated by count "
        "addition each micro-batch and bounded by the bin range — "
        "stream-length-independent state for continuous p50/p90/p99 "
        "drift watch over an ingest feed. The hash gate pins "
        "stream/batch parity: the single-batch emission must equal the "
        "batch sketch exactly, so live monitors and precomputed batch "
        "sketches read as one estimator.",
)
def stream_logbin_quantiles(spark, sf_dir: str) -> DataFrame:
    import os
    import tempfile
    import uuid

    name = f"stream_qsk_{uuid.uuid4().hex[:8]}"
    docs_schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    in_dir = tempfile.mkdtemp(prefix="stream_qsk_in_")
    os.symlink(
        os.path.abspath(f"{sf_dir}/documents.parquet"),
        os.path.join(in_dir, "documents.parquet"),
    )
    stream = (
        spark.readStream.schema(docs_schema)
        .parquet(in_dir)
        .select(
            "source",
            F.expr(
                "CAST(FLOOR(log2(CAST(n_chars AS DOUBLE)) * 4) AS INT)"
            ).alias("bin"),
        )
    )
    query = (
        logbin_quantile_stream(stream, ["source"], "bin")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option(
            "checkpointLocation", tempfile.mkdtemp(prefix="stream_qsk_ckpt_")
        )
        .trigger(availableNow=True)
        .start()
    )
    await_drained(query)
    return spark.table(name)


# ---------------------------------------------------------------------------
# streaming distribution-drift monitor (first batch = baseline histogram)
# ---------------------------------------------------------------------------

#: fixed value-bucket edges: <50, <150, <300, rest — the bucket count (not
#: the stream) bounds the state, and fixed edges keep every micro-batch's
#: histogram comparable to the baseline
DRIFT_EDGES = (50.0, 150.0, 300.0)

_DRIFT_STATE_SCHEMA = T.StructType([
    T.StructField("baseline", T.ArrayType(T.LongType())),
    T.StructField("batch_seq", T.LongType()),
])


def value_drift_stream(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: str,
) -> DataFrame:
    """Per-key streaming drift monitor: the FIRST micro-batch's value
    histogram becomes the key's baseline; every batch (including the
    first) emits its own histogram plus the total-variation distance to
    the baseline — the ingest tripwire (``pipeline_distribution_drift``)
    as a continuously-running stateful operator.

    State per key is the frozen baseline histogram and a batch counter:
    O(keys · buckets) bigints, bounded by the bucket count, never by
    stream length. TVD is computed fresh per emission from exact integer
    counts (one float expression per row), so emissions are deterministic
    given batch boundaries.
    """
    nb = len(DRIFT_EDGES) + 1
    out_schema = T.StructType(
        [df.schema[c] for c in key_cols]
        + [T.StructField("batch_seq", T.LongType()),
           T.StructField("n_events", T.LongType())]
        + [T.StructField(f"b{i}", T.LongType()) for i in range(nb)]
        + [T.StructField("tvd_vs_baseline", T.DoubleType())]
    )
    names = list(key_cols)

    def bucket_of(v: float) -> int:
        for i, edge in enumerate(DRIFT_EDGES):
            if v < edge:
                return i
        return nb - 1

    def fn(
        key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        parts = [pdf for pdf in pdfs if len(pdf)]
        if not parts:
            return
        counts = [0] * nb
        for pdf in parts:
            for v in pdf[value_col]:
                counts[bucket_of(float(v))] += 1
        if state.exists:
            baseline, seq = state.get
            baseline = [int(b) for b in baseline]
            seq = int(seq) + 1
        else:
            baseline = list(counts)
            seq = 1
        state.update((baseline, seq))
        n_base = sum(baseline)
        n_cur = sum(counts)
        tvd = 0.5 * sum(
            abs(c / n_cur - b / n_base)
            for c, b in zip(counts, baseline)
        )
        yield pd.DataFrame(
            [tuple(key) + (seq, n_cur, *counts, round(tvd, 6))],
            columns=names + ["batch_seq", "n_events"]
            + [f"b{i}" for i in range(nb)] + ["tvd_vs_baseline"],
        )

    return df.groupBy(*names).applyInPandasWithState(
        fn, out_schema, _DRIFT_STATE_SCHEMA, "append",
        GroupStateTimeout.NoTimeout,
    )


@register(
    "stream_value_drift",
    # availableNow over one parquet file = one micro-batch → every event
    # type's first batch IS its baseline, so tvd = 0.0 and the histogram
    # equals the relational GROUP BY. Multi-batch baseline freezing and
    # nonzero drift are pinned by tests/test_streaming_stateful_drift.py.
    oracle=f"""
    SELECT event_type,
           CAST(1 AS BIGINT) AS batch_seq,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN CAST(value AS DOUBLE) < {DRIFT_EDGES[0]}
                         THEN 1 ELSE 0 END) AS BIGINT) AS b0,
           CAST(SUM(CASE WHEN CAST(value AS DOUBLE) >= {DRIFT_EDGES[0]}
                          AND CAST(value AS DOUBLE) < {DRIFT_EDGES[1]}
                         THEN 1 ELSE 0 END) AS BIGINT) AS b1,
           CAST(SUM(CASE WHEN CAST(value AS DOUBLE) >= {DRIFT_EDGES[1]}
                          AND CAST(value AS DOUBLE) < {DRIFT_EDGES[2]}
                         THEN 1 ELSE 0 END) AS BIGINT) AS b2,
           CAST(SUM(CASE WHEN CAST(value AS DOUBLE) >= {DRIFT_EDGES[2]}
                         THEN 1 ELSE 0 END) AS BIGINT) AS b3,
           CAST(0.0 AS DOUBLE) AS tvd_vs_baseline
    FROM events GROUP BY event_type
    """,
    doc="Streaming distribution-drift monitor: per event type, the first "
        "micro-batch's value histogram freezes as the baseline and every "
        "batch emits its histogram + total-variation distance against "
        "it — pipeline_distribution_drift's tripwire running "
        "continuously instead of per snapshot. State is O(types x 4 "
        "buckets), bounded by the fixed bucket edges.",
)
def stream_value_drift(spark, sf_dir: str) -> DataFrame:
    import os
    import tempfile
    import uuid

    name = f"stream_drift_{uuid.uuid4().hex[:8]}"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    in_dir = tempfile.mkdtemp(prefix="stream_drift_in_")
    os.symlink(
        os.path.abspath(f"{sf_dir}/events.parquet"),
        os.path.join(in_dir, "events.parquet"),
    )
    stream = (
        spark.readStream.schema(raw_schema)
        .parquet(in_dir)
        .select("event_type", "value")
    )
    query = (
        value_drift_stream(stream, ["event_type"], "value")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option(
            "checkpointLocation", tempfile.mkdtemp(prefix="stream_drift_ckpt_")
        )
        .trigger(availableNow=True)
        .start()
    )
    await_drained(query)
    return spark.table(name)


# ---------------------------------------------------------------------------
# streaming CEP: view -> click -> purchase pattern matching (NFA per key)
# ---------------------------------------------------------------------------

_CEP_STATE_SCHEMA = T.StructType([
    T.StructField("last_view_u", T.LongType()),
    T.StructField("err_at_last_view", T.LongType()),
    T.StructField("cand_click_u", T.LongType()),
    T.StructField("cand_view_u", T.LongType()),
    T.StructField("err_at_cand_view", T.LongType()),
    T.StructField("err_cnt", T.LongType()),
])

_CEP_OUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("gap_us", T.LongType()),
    T.StructField("blocked", T.IntegerType()),
])


def cep_funnel_stream(
    df: DataFrame,
    key_col: str,
    order_cols: Sequence[str],
    within_us: int,
) -> DataFrame:
    """Streaming CEP pattern match `view -> click -> purchase WITHIN
    within_us, no error between view and purchase` — the Flink-CEP /
    MATCH_RECOGNIZE shape as a per-key NFA over
    ``applyInPandasWithState``.

    The per-key state is the NFA register set (six longs): the latest
    view and its error-count watermark, the candidate click (latest
    click, carrying the view that preceded IT), and the running error
    count. Each micro-batch replays its rows in ``order_cols`` order
    through the transition function; a purchase in pattern emits
    ``(user_id, gap_us, blocked)`` where ``blocked`` marks an error
    strictly between the matched view and the purchase. Within-batch
    ordering is deterministic (sorted here); cross-batch order follows
    micro-batch arrival — out-of-order delivery across batches belongs
    to the watermark layer upstream, exactly like Flink CEP's own
    event-time contract. State is O(1) per key (six longs), independent
    of stream length.

    Round 15 (optimization, guide §4.2): the transition function is
    vectorized register algebra over the sorted batch instead of a
    per-row Python loop — the loop was the only row-at-a-time Python
    in the repo and the dominant per-task cost at volume. The NFA's
    sequential reads decompose exactly: the error count each row sees
    is the carry-in plus an EXCLUSIVE cumsum of error rows; the view
    register any row reads is a forward-fill of (u, err-count) over
    view rows (a click row is never a view row, so inclusive last-view
    indexing equals the loop's read-before-write order); the click
    register set forward-fills (u, view-regs-at-that-click) over click
    rows the same way; a purchase row then tests its filled registers
    against the window bound. Carry-in registers seed the fills where
    no in-batch view/click precedes. Equivalence is pinned by the
    cross-batch tests in tests/test_streaming_stateful_cep.py, the
    vectorized-vs-loop property test added with this change, and the
    shared q_cep_funnel_episodes oracle in the replica gate."""
    sentinel = -1

    import numpy as np

    def fn(
        key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            lv, eav, cc, cv, eacv, ec = state.get
        else:
            lv = eav = cc = cv = eacv = sentinel
            ec = 0
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            state.update((lv, eav, cc, cv, eacv, ec))
            return
        batch = pd.concat(chunks).sort_values(list(order_cols), kind="stable")
        uid = key[0]
        ev = batch["event_type"].to_numpy()
        u = batch["u"].to_numpy(dtype=np.int64)
        idx = np.arange(len(ev))
        is_err = ev == "error"
        # errors strictly BEFORE each row (the loop incremented ec only
        # as an error row was processed, so every register read sees
        # the exclusive count), plus the cross-batch carry
        ec_excl = ec + np.cumsum(is_err) - is_err
        # view registers: last view row at-or-before each row — equal to
        # the loop's (lv, eav) at any non-view row; carry-in where no
        # view precedes in this batch. np.where evaluates both branches,
        # so the -1 "no view yet" positions index the last element
        # harmlessly before being masked out.
        last_v = np.maximum.accumulate(np.where(ev == "view", idx, -1))
        lv_at = np.where(last_v >= 0, u[last_v], lv)
        eav_at = np.where(last_v >= 0, ec_excl[last_v], eav)
        # click registers: the candidate click plus the view registers it
        # snapshotted when it was processed
        last_c = np.maximum.accumulate(np.where(ev == "click", idx, -1))
        cc_at = np.where(last_c >= 0, u[last_c], cc)
        cv_at = np.where(last_c >= 0, lv_at[last_c], cv)
        eacv_at = np.where(last_c >= 0, eav_at[last_c], eacv)
        hit = (
            (ev == "purchase")
            & (cc_at != sentinel)
            & (u - cc_at <= within_us)
            & (cv_at != sentinel)
            & (cc_at - cv_at <= within_us)
        )
        # the final registers are the fills at the last row
        lv, eav = int(lv_at[-1]), int(eav_at[-1])
        cc, cv, eacv = int(cc_at[-1]), int(cv_at[-1]), int(eacv_at[-1])
        ec = int(ec + is_err.sum())
        state.update((lv, eav, cc, cv, eacv, ec))
        if hit.any():
            yield pd.DataFrame(
                {
                    "user_id": np.full(int(hit.sum()), uid, dtype=np.int64),
                    "gap_us": (u - cv_at)[hit],
                    "blocked": (ec_excl - eacv_at > 0)[hit].astype(np.int32),
                }
            )

    return df.groupBy(key_col).applyInPandasWithState(
        fn,
        _CEP_OUT_SCHEMA,
        _CEP_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def _cep_register():
    from ..plans.relational import CEP_FUNNEL_ORACLE, CEP_WITHIN_US

    @register(
        "stream_cep_funnel",
        oracle=CEP_FUNNEL_ORACLE,
        bench=True,  # r9 verdict: NFA state needs an empirical 10x point
        doc="Streaming CEP funnel (view -> click -> purchase within 7d, "
            "no error between) via a per-user NFA in "
            "applyInPandasWithState — the continuous analogue of "
            "q_cep_funnel_episodes, sharing its oracle verbatim: run to "
            "completion with availableNow, the emitted episodes "
            "aggregate to byte-identical per-user readouts (batch/"
            "stream parity under the full hash gate). Six longs of "
            "state per user; episodes emit the moment the purchase "
            "arrives, no window close to wait for.",
    )
    def stream_cep_funnel(spark, sf_dir: str) -> DataFrame:
        import os
        import tempfile
        import uuid

        from ..plans.registry import normalize_events_ts

        name = f"stream_cep_{uuid.uuid4().hex[:8]}"
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
        in_dir = tempfile.mkdtemp(prefix="stream_cep_in_")
        os.symlink(
            os.path.abspath(f"{sf_dir}/events.parquet"),
            os.path.join(in_dir, "events.parquet"),
        )
        stream = (
            normalize_events_ts(
                spark.readStream.schema(raw_schema).parquet(in_dir),
                target="timestamp",
            )
            # only the four NFA-relevant event types cross the Python
            # boundary (guide §4.1): every other type is a no-op
            # transition, and the filter is JVM-side, before the state
            # shuffle and the Arrow hop (~20% of the events table is
            # 'signup' rows the NFA would carry and ignore)
            .filter(
                F.col("event_type").isin(
                    "view", "click", "error", "purchase"
                )
            )
            .select(
                "user_id",
                "event_id",
                "event_type",
                F.expr("unix_micros(CAST(ts AS TIMESTAMP))").alias("u"),
            )
        )
        query = (
            cep_funnel_stream(
                stream, "user_id", ["u", "event_id"], CEP_WITHIN_US
            )
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option(
                "checkpointLocation",
                tempfile.mkdtemp(prefix="stream_cep_ckpt_"),
            )
            .trigger(availableNow=True)
            .start()
        )
        await_drained(query)
        return spark.table(name).groupBy("user_id").agg(
            F.expr("CAST(SUM(1 - blocked) AS BIGINT)").alias("n_episodes"),
            F.expr("CAST(SUM(blocked) AS BIGINT)").alias("n_blocked"),
            F.expr(
                "CASE WHEN SUM(1 - blocked) > 0 THEN "
                "round(CAST(SUM(CASE WHEN blocked = 0 THEN gap_us END)"
                " AS DOUBLE)"
                " / CAST(SUM(1 - blocked) AS DOUBLE)"
                " / CAST(60000000 AS DOUBLE), 4) END"
            ).alias("avg_min_view_to_purchase"),
        )


_cep_register()


# ---------------------------------------------------------------------------
# streaming mSPRT sufficient statistics (twin of q_ab_msprt_always_valid)
# ---------------------------------------------------------------------------

_MSPRT_STATE_SCHEMA = T.StructType([
    T.StructField("n0", T.LongType()),
    T.StructField("s0", T.LongType()),
    T.StructField("ss0", T.LongType()),
    T.StructField("n1", T.LongType()),
    T.StructField("s1", T.LongType()),
    T.StructField("ss1", T.LongType()),
])


def msprt_stats_stream(
    df: DataFrame,
    key_col: str,
    day_col: str,
    arm_col: str,
    cents_col: str,
) -> DataFrame:
    """Streaming cumulative A/B sufficient statistics: per key (event
    type), carry six exact bigints — per-arm cumulative (count, Σcents,
    Σcents²) — across micro-batches and emit one row per (key, day)
    holding the cumulative statistics THROUGH that day, with an arm's
    columns NULL on days that arm recorded no event (the same
    day-sparse semantics as the batch query's `wide` CTE). The mixture
    likelihood ratio and always-valid p-value are deliberately NOT
    computed here: scoring is a stateless closed-form projection
    (`plans.relational._MSPRT_TAIL`) applied identically to the batch
    aggregation, the DuckDB oracle, and this stream's output — so
    batch/stream parity is checked by the full hash gate rather than a
    reimplemented formula, and state stays integer-exact (the
    round-8 discipline for every stateful operator here).

    Micro-batch contract: batches must arrive in event-time order and
    must not split one (key, day) across batches — otherwise the later
    batch re-emits that day with fuller cumulative statistics (append
    mode cannot retract). A real deployment closes days with a
    watermark; the registered query runs availableNow (one batch).
    """
    out_schema = T.StructType([
        df.schema[key_col],
        T.StructField("day", T.DateType()),
        T.StructField("n0", T.LongType()),
        T.StructField("s0", T.LongType()),
        T.StructField("ss0", T.LongType()),
        T.StructField("n1", T.LongType()),
        T.StructField("s1", T.LongType()),
        T.StructField("ss1", T.LongType()),
    ])

    def fn(
        key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        parts = [pdf for pdf in pdfs if len(pdf)]
        if not parts:
            return
        batch = pd.concat(parts)
        cum = list(state.get) if state.exists else [0, 0, 0, 0, 0, 0]
        rows = []
        for day, grp in sorted(batch.groupby(day_col), key=lambda kv: kv[0]):
            out: list = [None] * 6
            for arm in (0, 1):
                sel = grp[grp[arm_col] == arm][cents_col]
                if len(sel) == 0:
                    continue
                base = 3 * arm
                cum[base] += int(len(sel))
                cum[base + 1] += int(sel.sum())
                cum[base + 2] += int((sel * sel).sum())
                out[base : base + 3] = cum[base : base + 3]
            rows.append(key + (day,) + tuple(out))
        state.update(tuple(cum))
        yield pd.DataFrame(
            rows,
            columns=[key_col, "day", "n0", "s0", "ss0", "n1", "s1", "ss1"],
        )

    return df.groupBy(key_col).applyInPandasWithState(
        fn, out_schema, _MSPRT_STATE_SCHEMA, "append",
        GroupStateTimeout.NoTimeout,
    )


def _register_stream_ab_msprt() -> None:
    from ..plans.relational import (
        _MSPRT_TAIL,
        _SRM_ARM_DUCK,
        _SRM_ARM_SPARK,
        _msprt_sql,
    )

    @register(
        "stream_ab_msprt",
        # SHARES the batch query's oracle verbatim: availableNow over the
        # one parquet file = one chronological micro-batch, and the
        # stream's integer output scored through the same _MSPRT_TAIL
        # text equals the batch aggregation bit-for-bit
        oracle=_msprt_sql(_SRM_ARM_DUCK),
        doc="Streaming twin of q_ab_msprt_always_valid: per-event-type "
            "state is six exact bigints (per-arm cumulative count / "
            "Σcents / Σcents²) carried across micro-batches by "
            "applyInPandasWithState; each (type, day) emits once with "
            "the cumulative statistics through that day, and the "
            "mixture-SPRT always-valid p-value is a stateless "
            "closed-form projection (the exact SQL text the batch "
            "query and the DuckDB oracle use) over the streamed "
            "output — the experiment dashboard that updates per "
            "micro-batch while staying valid under continuous "
            "peeking. State is O(event types), independent of stream "
            "length; cross-batch carry pinned by "
            "tests/test_streaming_stateful_msprt.py.",
    )
    def stream_ab_msprt(spark, sf_dir: str) -> DataFrame:
        import os
        import tempfile
        import uuid

        from ..plans.registry import normalize_events_ts

        name = f"stream_msprt_{uuid.uuid4().hex[:8]}"
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
        in_dir = tempfile.mkdtemp(prefix="stream_msprt_in_")
        os.symlink(
            os.path.abspath(f"{sf_dir}/events.parquet"),
            os.path.join(in_dir, "events.parquet"),
        )
        stream = normalize_events_ts(
            spark.readStream.schema(raw_schema).parquet(in_dir)
        ).select(
            "event_type",
            F.expr("CAST(ts AS DATE)").alias("day"),
            F.expr(_SRM_ARM_SPARK).alias("arm"),
            F.expr("CAST(CAST(value AS DECIMAL(10,2)) * 100 AS BIGINT)")
            .alias("cents"),
        )
        query = (
            msprt_stats_stream(stream, "event_type", "day", "arm", "cents")
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option(
                "checkpointLocation",
                tempfile.mkdtemp(prefix="stream_msprt_ckpt_"),
            )
            .trigger(availableNow=True)
            .start()
        )
        await_drained(query)
        spark.table(name).createOrReplaceTempView(f"{name}_wide")
        return spark.sql(
            f"WITH wide AS (SELECT event_type, day, n0, s0, ss0,"
            f" n1, s1, ss1 FROM {name}_wide),"
            f"{_MSPRT_TAIL}"
        )


_register_stream_ab_msprt()


# ---------------------------------------------------------------------------
# sliding-window burst detection (bounded per-key day-map state + eviction)
# ---------------------------------------------------------------------------

BURST_WINDOW_DAYS = 7
BURST_THRESHOLD = 18

_BURST_STATE_SCHEMA = T.StructType([
    T.StructField("days", T.ArrayType(T.LongType())),
    T.StructField("counts", T.ArrayType(T.LongType())),
])


def burst_heavy_hitters_stream(
    df: DataFrame,
    key_col: str,
    day_col: str,
    *,
    threshold: int = BURST_THRESHOLD,
    window_days: int = BURST_WINDOW_DAYS,
) -> DataFrame:
    """Sliding-window heavy hitters: a key emits in every micro-batch
    where its event count over ITS OWN trailing ``window_days`` (ending
    at the key's latest seen day) reaches ``threshold`` — the
    recent-burst detector (total-count heavy hitters never forget; a
    burst detector must). State per key is a (day → count) map bounded
    to ``window_days`` entries: older days are EVICTED as the key's
    max day advances, so state is O(keys × window), independent of
    stream length — the windowed-state-with-eviction pattern
    ``transformWithState``'s TTL-per-entry would express natively.
    All state is exact integers; emission day is the key's own
    window end."""
    out_schema = T.StructType([
        df.schema[key_col],
        T.StructField("window_end_day", T.LongType()),
        T.StructField("n_window", T.LongType()),
    ])

    def fn(
        key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        parts = [pdf for pdf in pdfs if len(pdf)]
        if not parts:
            return
        batch = pd.concat(parts)
        acc: dict = {}
        if state.exists:
            days, counts = state.get
            acc = dict(zip(days, counts))
        for day, grp in batch.groupby(day_col):
            acc[int(day)] = acc.get(int(day), 0) + int(len(grp))
        mx = max(acc)
        acc = {d: c for d, c in acc.items() if d > mx - window_days}
        days_sorted = sorted(acc)
        state.update((days_sorted, [acc[d] for d in days_sorted]))
        n = sum(acc.values())
        if n >= threshold:
            yield pd.DataFrame(
                [key + (mx, n)],
                columns=[key_col, "window_end_day", "n_window"],
            )

    return df.groupBy(key_col).applyInPandasWithState(
        fn, out_schema, _BURST_STATE_SCHEMA, "append",
        GroupStateTimeout.NoTimeout,
    )


@register(
    "stream_burst_heavy_hitters",
    bench=True,  # r9 verdict: evicting window state needs a 10x point
    # availableNow over one parquet file = one micro-batch → each
    # qualifying key emits exactly once with its full trailing-window
    # count, equal to the relational trailing-window GROUP BY. Eviction
    # and cross-batch window advance are pinned by
    # tests/test_streaming_stateful_burst.py.
    oracle=f"""
    WITH e AS (
      SELECT user_id,
             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d
      FROM events
    ),
    mx AS (SELECT user_id, MAX(d) AS mxd FROM e GROUP BY user_id),
    c AS (
      SELECT e.user_id, mx.mxd, CAST(COUNT(*) AS BIGINT) AS n
      FROM e JOIN mx ON mx.user_id = e.user_id
      WHERE e.d > mx.mxd - {BURST_WINDOW_DAYS}
      GROUP BY e.user_id, mx.mxd
    )
    SELECT user_id, CAST(mxd AS BIGINT) AS window_end_day,
           n AS n_window
    FROM c WHERE n >= {BURST_THRESHOLD}
    """,
    doc=f"Sliding-window burst detection via applyInPandasWithState: a "
        f"user emits whenever their trailing-{BURST_WINDOW_DAYS}-day "
        f"event count (ending at their own latest day) reaches "
        f"{BURST_THRESHOLD} — the recent-burst complement to "
        "stream_heavy_hitters' never-forgetting cumulative counts "
        "(abuse/scraper detection needs the window, not the lifetime "
        "total). Per-key state is a day→count map BOUNDED to the "
        "window width with eviction as the key's max day advances — "
        "O(keys × window) state on endless streams, all exact "
        "integers.",
)
def stream_burst_heavy_hitters(spark, sf_dir: str) -> DataFrame:
    import os
    import tempfile
    import uuid

    from ..plans.registry import normalize_events_ts

    name = f"stream_burst_{uuid.uuid4().hex[:8]}"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    in_dir = tempfile.mkdtemp(prefix="stream_burst_in_")
    os.symlink(
        os.path.abspath(f"{sf_dir}/events.parquet"),
        os.path.join(in_dir, "events.parquet"),
    )
    stream = normalize_events_ts(
        spark.readStream.schema(raw_schema).parquet(in_dir)
    ).select(
        "user_id",
        F.expr("CAST(unix_date(CAST(ts AS DATE)) AS BIGINT)").alias("d"),
    )
    query = (
        burst_heavy_hitters_stream(stream, "user_id", "d")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option(
            "checkpointLocation",
            tempfile.mkdtemp(prefix="stream_burst_ckpt_"),
        )
        .trigger(availableNow=True)
        .start()
    )
    await_drained(query)
    return spark.table(name)

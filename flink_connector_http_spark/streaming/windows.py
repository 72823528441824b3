"""Event-time windowed aggregation with watermarks (SURVEY §2 T5).

The reference connector is processing-time only (`SURVEY.md` §2.6; the
Flink side never registers an event-time attribute — cf.
``HttpLookupTableSource`` building a proctime-only schema). Event-time
semantics therefore come from the host engine; here that is Structured
Streaming's ``withWatermark`` + ``window`` — late rows beyond the
watermark are dropped and a window emits exactly once, when the watermark
passes its end.

Scale design: tumbling-window aggregation is a single shuffle on
(window, key); state per window×key is one partial aggregate, evicted as
soon as the watermark closes the window, so state size is bounded by
(windows in flight × keys), independent of stream length.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import await_drained
from ..plans.registry import normalize_events_ts, register

__all__ = [
    "windowed_counts",
    "stream_window_events",
    "session_counts",
    "stream_session_events",
    "sliding_counts",
    "stream_sliding_events",
    "attribution_join",
    "stream_attribution_join",
    "dedup_within_watermark",
    "stream_dedup_events_watermark",
]

WATERMARK = "1 hour"
WINDOW = "1 day"


def windowed_counts(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    watermark: str = WATERMARK,
    window: str = WINDOW,
) -> DataFrame:
    """Tumbling event-time window counts + exact value sums per key.

    Works on a streaming OR batch DataFrame (batch ignores the watermark —
    same result as a relational GROUP BY on the window start).
    """
    wm = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        wm.groupBy(F.window(ts_col, window).alias("w"), key_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr(
                "CAST(SUM(CAST(value AS DECIMAL(10,2))) AS DOUBLE)"
            ).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), key_col, "n_events", "sum_value")
    )


@register(
    "stream_window_events",
    # Append-mode semantics: a window emits only once the watermark
    # (max event time - 1 hour, advanced by the final no-data micro-batch)
    # passes its end — so the oracle keeps exactly the closed windows.
    oracle="""
    WITH wm AS (
      SELECT max(ts) - INTERVAL 1 HOUR AS w FROM events
    )
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start, event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(10,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY window_start, event_type
    HAVING window_start + INTERVAL 1 DAY <= (SELECT w FROM wm)
    """,
    doc="Watermarked tumbling-window streaming aggregation (T5): 1-day "
        "event-time windows, 1-hour watermark, append output — the final "
        "day stays open (watermark never passes it) and the oracle "
        "reproduces exactly the closed-window set.",
)
def stream_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    name = f"stream_window_{uuid.uuid4().hex[:8]}"
    # normalize_events_ts adapts whichever parquet ts encoding the data
    # generator used (nanos-as-long or plain micros) before the watermark
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    in_dir = tempfile.mkdtemp(prefix="stream_window_in_")
    os.symlink(
        os.path.abspath(f"{sf_dir}/events.parquet"),
        os.path.join(in_dir, "events.parquet"),
    )
    stream = (
        normalize_events_ts(
            spark.readStream.schema(raw_schema).parquet(in_dir),
            # withWatermark requires TIMESTAMP (not NTZ); session TZ is
            # pinned UTC above so wall-clock values equal the oracle's NTZ
            target="timestamp",
        )
    )
    from . import stream_state_partitions

    with stream_state_partitions(spark, f"{sf_dir}/events.parquet"):
        query = (
            windowed_counts(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option(
                "checkpointLocation",
                tempfile.mkdtemp(prefix="stream_window_ckpt_"),
            )
            .trigger(availableNow=True)
            .start()
        )
        await_drained(query)
    return spark.table(name).select(
        F.col("window_start").cast("timestamp_ntz").alias("window_start"),
        "event_type",
        "n_events",
        "sum_value",
    )


# ---------------------------------------------------------------------------
# session windows (gap-based) with watermark
# ---------------------------------------------------------------------------

SESSION_GAP = "1 hour"
_GAP_US = 3600 * 1_000_000


def session_counts(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = SESSION_GAP,
    watermark: str = WATERMARK,
) -> DataFrame:
    """Per-key gap-based session aggregation (``session_window``).

    A session closes (and in streaming append mode, emits exactly once)
    when the watermark passes last-event-time + gap. Sessions merge across
    micro-batches until then; state per open session is one partial
    aggregate.
    """
    wm = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        wm.groupBy(F.session_window(ts_col, gap).alias("w"), key_col)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


@register(
    "stream_session_events",
    # Spark's session boundary: an event exactly gap after the previous one
    # starts a NEW session (window end is exclusive), hence `>=` in the
    # gaps-and-islands rewrite; session_end = last event + gap; only
    # sessions closed by the final watermark (max ts - 1h) are emitted.
    oracle=f"""
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) >= {_GAP_US}
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sess AS (
      SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked
    ),
    agg AS (
      SELECT user_id,
             MIN(ts) AS session_start,
             MAX(ts) + INTERVAL 1 HOUR AS session_end,
             COUNT(*) AS n_events
      FROM sess GROUP BY user_id, sid
    ),
    wm AS (SELECT max(ts) - INTERVAL 1 HOUR AS w FROM events)
    SELECT user_id, session_start, session_end, n_events
    FROM agg WHERE session_end <= (SELECT w FROM wm)
    """,
    doc="Streaming gap-based sessionization via session_window (1h gap, 1h "
        "watermark, append mode): the streaming twin of the batch "
        "q_sessionize_events, oracle-checked against a gaps-and-islands "
        "rewrite restricted to watermark-closed sessions.",
)
def stream_session_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    name = f"stream_session_{uuid.uuid4().hex[:8]}"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    in_dir = tempfile.mkdtemp(prefix="stream_session_in_")
    os.symlink(
        os.path.abspath(f"{sf_dir}/events.parquet"),
        os.path.join(in_dir, "events.parquet"),
    )
    stream = (
        normalize_events_ts(
            spark.readStream.schema(raw_schema).parquet(in_dir),
            target="timestamp",
        )
    )
    from . import stream_state_partitions

    with stream_state_partitions(spark, f"{sf_dir}/events.parquet"):
        query = (
            session_counts(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option(
                "checkpointLocation",
                tempfile.mkdtemp(prefix="stream_session_ckpt_"),
            )
            .trigger(availableNow=True)
            .start()
        )
        await_drained(query)
    return spark.table(name).select(
        "user_id",
        F.col("session_start").cast("timestamp_ntz").alias("session_start"),
        F.col("session_end").cast("timestamp_ntz").alias("session_end"),
        "n_events",
    )


# ---------------------------------------------------------------------------
# stream-stream interval join (purchase → follow-up click attribution)
# ---------------------------------------------------------------------------

ATTRIBUTION_WINDOW_S = 3600


def attribution_join(
    purchases: DataFrame,
    clicks: DataFrame,
    *,
    window_s: int = ATTRIBUTION_WINDOW_S,
    watermark: str = WATERMARK,
) -> DataFrame:
    """Stream-stream inner interval join: every click by the same user
    within ``window_s`` seconds after a purchase.

    Inner joins emit a match as soon as both sides have arrived; the
    watermarks + the interval condition bound how long each side's rows
    are retained in state (purchase rows can be dropped once the watermark
    passes purchase_ts + window, click rows once it passes click_ts) —
    without them, stream-stream state grows forever.
    """
    if purchases.isStreaming:
        purchases = purchases.withWatermark("p_ts", watermark)
    if clicks.isStreaming:
        clicks = clicks.withWatermark("c_ts", watermark)
    return purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") > F.col("p_ts"))
        & (F.col("c_ts") <= F.col("p_ts") + F.expr(f"INTERVAL {window_s} SECONDS")),
        "inner",
    ).select(
        F.col("p_event").alias("purchase_id"),
        F.col("c_event").alias("click_id"),
        F.col("p_user").alias("user_id"),
        F.expr("CAST(unix_micros(c_ts) - unix_micros(p_ts) AS BIGINT)").alias("gap_us"),
    )


@register(
    "stream_attribution_join",
    # inner stream-stream joins emit on arrival (watermarks only bound
    # state), so with availableNow the output equals the full batch join
    oracle=f"""
    SELECT p.event_id AS purchase_id,
           c.event_id AS click_id,
           p.user_id AS user_id,
           epoch_us(c.ts) - epoch_us(p.ts) AS gap_us
    FROM events p JOIN events c
      ON p.user_id = c.user_id
     AND c.ts > p.ts
     AND c.ts <= p.ts + INTERVAL {ATTRIBUTION_WINDOW_S} SECONDS
    WHERE p.event_type = 'purchase' AND c.event_type = 'click'
    """,
    doc="Stream-stream interval join (purchase→click attribution within "
        "1h): both sides watermarked so join state is evicted once rows "
        "can no longer match — the canonical bounded-state two-stream "
        "pattern. Inner-join emission is watermark-independent, so the "
        "DuckDB batch interval join is an exact oracle.",
)
def stream_attribution_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    name = f"stream_attr_{uuid.uuid4().hex[:8]}"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    in_dir = tempfile.mkdtemp(prefix="stream_attr_in_")
    os.symlink(
        os.path.abspath(f"{sf_dir}/events.parquet"),
        os.path.join(in_dir, "events.parquet"),
    )

    def side(event_type: str, prefix: str) -> DataFrame:
        return (
            normalize_events_ts(
                spark.readStream.schema(raw_schema).parquet(in_dir),
                target="timestamp",
            )
            .filter(F.col("event_type") == event_type)
            .select(
                F.col("event_id").alias(f"{prefix}_event"),
                F.col("user_id").alias(f"{prefix}_user"),
                F.col("ts").alias(f"{prefix}_ts"),
            )
        )

    from . import stream_state_partitions

    with stream_state_partitions(spark, f"{sf_dir}/events.parquet"):
        query = (
            attribution_join(side("purchase", "p"), side("click", "c"))
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option(
                "checkpointLocation",
                tempfile.mkdtemp(prefix="stream_attr_ckpt_"),
            )
            .trigger(availableNow=True)
            .start()
        )
        await_drained(query)
    return spark.table(name)


# ---------------------------------------------------------------------------
# left-outer stream-stream interval join (unattributed purchases)
# ---------------------------------------------------------------------------

@register(
    "stream_attribution_left",
    # Outer semantics: a purchase with no click emits its null-extended row
    # only once the watermark proves no future click can match — i.e. the
    # end of its match interval (p_ts + 1h) is behind the final watermark
    # (max ts - 1h). Matched pairs emit on arrival like the inner join.
    oracle=f"""
    WITH wm AS (
      -- each side carries its own watermark over its filtered stream and
      -- the GLOBAL watermark is their minimum (multipleWatermarkPolicy =
      -- min, the default); Spark tracks watermarks at MILLISECOND
      -- precision, so micros are truncated before the 1h lag
      SELECT least(
               date_trunc('milliseconds',
                 (SELECT max(ts) FROM events WHERE event_type = 'purchase')),
               date_trunc('milliseconds',
                 (SELECT max(ts) FROM events WHERE event_type = 'click'))
             ) - INTERVAL 1 HOUR AS w
    ),
    p AS (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'purchase'),
    c AS (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'click'),
    matched AS (
      SELECT p.event_id AS purchase_id, c.event_id AS click_id,
             p.user_id AS user_id,
             epoch_us(c.ts) - epoch_us(p.ts) AS gap_us
      FROM p JOIN c
        ON p.user_id = c.user_id
       AND c.ts > p.ts
       AND c.ts <= p.ts + INTERVAL {ATTRIBUTION_WINDOW_S} SECONDS
    )
    SELECT * FROM matched
    UNION ALL
    SELECT p.event_id, CAST(NULL AS BIGINT), p.user_id, CAST(NULL AS BIGINT)
    FROM p
    WHERE NOT EXISTS (SELECT 1 FROM matched m WHERE m.purchase_id = p.event_id)
      AND p.ts + INTERVAL {ATTRIBUTION_WINDOW_S} SECONDS < (SELECT w FROM wm)
    """,
    doc="LEFT OUTER stream-stream interval join: matched purchase→click "
        "pairs emit on arrival; unmatched purchases emit null-extended "
        "exactly when the watermark passes the end of their match window "
        "(purchases near the stream tail stay pending — the oracle "
        "reproduces that cut).",
)
def stream_attribution_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    name = f"stream_attr_left_{uuid.uuid4().hex[:8]}"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    in_dir = tempfile.mkdtemp(prefix="stream_attr_left_in_")
    os.symlink(
        os.path.abspath(f"{sf_dir}/events.parquet"),
        os.path.join(in_dir, "events.parquet"),
    )

    def side(event_type: str, prefix: str) -> DataFrame:
        return (
            normalize_events_ts(
                spark.readStream.schema(raw_schema).parquet(in_dir),
                target="timestamp",
            )
            .filter(F.col("event_type") == event_type)
            .select(
                F.col("event_id").alias(f"{prefix}_event"),
                F.col("user_id").alias(f"{prefix}_user"),
                F.col("ts").alias(f"{prefix}_ts"),
            )
        )

    purchases = side("purchase", "p").withWatermark("p_ts", WATERMARK)
    clicks = side("click", "c").withWatermark("c_ts", WATERMARK)
    joined = purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") > F.col("p_ts"))
        & (F.col("c_ts") <= F.col("p_ts")
           + F.expr(f"INTERVAL {ATTRIBUTION_WINDOW_S} SECONDS")),
        "leftOuter",
    ).select(
        F.col("p_event").alias("purchase_id"),
        F.col("c_event").alias("click_id"),
        F.col("p_user").alias("user_id"),
        F.expr("CAST(unix_micros(c_ts) - unix_micros(p_ts) AS BIGINT)").alias("gap_us"),
    )
    from . import stream_state_partitions

    with stream_state_partitions(spark, f"{sf_dir}/events.parquet"):
        query = (
            joined.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation",
                    tempfile.mkdtemp(prefix="stream_attr_left_ckpt_"))
            .trigger(availableNow=True)
            .start()
        )
        await_drained(query)
    return spark.table(name)


@register(
    "stream_attribution_full",
    # FULL OUTER: matched pairs emit on arrival; an unmatched purchase
    # null-emits when the watermark passes the END of its match interval
    # (p_ts + 1h — same cut as the left join); an unmatched click
    # null-emits when the watermark passes its OWN timestamp (purchases
    # that could still match it have p_ts < c_ts, impossible once the
    # watermark is past c_ts)
    oracle=f"""
    WITH wm AS (
      SELECT least(
               date_trunc('milliseconds',
                 (SELECT max(ts) FROM events WHERE event_type = 'purchase')),
               date_trunc('milliseconds',
                 (SELECT max(ts) FROM events WHERE event_type = 'click'))
             ) - INTERVAL 1 HOUR AS w
    ),
    p AS (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'purchase'),
    c AS (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'click'),
    matched AS (
      SELECT p.event_id AS purchase_id, c.event_id AS click_id,
             p.user_id AS user_id,
             epoch_us(c.ts) - epoch_us(p.ts) AS gap_us
      FROM p JOIN c
        ON p.user_id = c.user_id
       AND c.ts > p.ts
       AND c.ts <= p.ts + INTERVAL {ATTRIBUTION_WINDOW_S} SECONDS
    )
    SELECT * FROM matched
    UNION ALL
    SELECT p.event_id, CAST(NULL AS BIGINT), p.user_id, CAST(NULL AS BIGINT)
    FROM p
    WHERE NOT EXISTS (SELECT 1 FROM matched m WHERE m.purchase_id = p.event_id)
      AND p.ts + INTERVAL {ATTRIBUTION_WINDOW_S} SECONDS < (SELECT w FROM wm)
    UNION ALL
    SELECT CAST(NULL AS BIGINT), c.event_id, c.user_id, CAST(NULL AS BIGINT)
    FROM c
    WHERE NOT EXISTS (SELECT 1 FROM matched m WHERE m.click_id = c.event_id)
      AND c.ts < (SELECT w FROM wm)
    """,
    doc="FULL OUTER stream-stream interval join — completes the streaming "
        "join matrix (inner / left / full): matched purchase→click pairs "
        "emit on arrival, unmatched rows null-emit exactly when the "
        "watermark proves no partner can arrive (purchase: end of its "
        "match window; click: its own timestamp, the lower bound on any "
        "matching purchase). Both sides' state stays watermark-bounded; "
        "the oracle reproduces both null cuts, so the emitted set is "
        "hash-compared.",
)
def stream_attribution_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    name = f"stream_attr_full_{uuid.uuid4().hex[:8]}"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    in_dir = tempfile.mkdtemp(prefix="stream_attr_full_in_")
    os.symlink(
        os.path.abspath(f"{sf_dir}/events.parquet"),
        os.path.join(in_dir, "events.parquet"),
    )

    def side(event_type: str, prefix: str) -> DataFrame:
        return (
            normalize_events_ts(
                spark.readStream.schema(raw_schema).parquet(in_dir),
                target="timestamp",
            )
            .filter(F.col("event_type") == event_type)
            .select(
                F.col("event_id").alias(f"{prefix}_event"),
                F.col("user_id").alias(f"{prefix}_user"),
                F.col("ts").alias(f"{prefix}_ts"),
            )
        )

    purchases = side("purchase", "p").withWatermark("p_ts", WATERMARK)
    clicks = side("click", "c").withWatermark("c_ts", WATERMARK)
    joined = purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") > F.col("p_ts"))
        & (F.col("c_ts") <= F.col("p_ts")
           + F.expr(f"INTERVAL {ATTRIBUTION_WINDOW_S} SECONDS")),
        "fullOuter",
    ).select(
        F.col("p_event").alias("purchase_id"),
        F.col("c_event").alias("click_id"),
        F.coalesce(F.col("p_user"), F.col("c_user")).alias("user_id"),
        F.expr("CAST(unix_micros(c_ts) - unix_micros(p_ts) AS BIGINT)").alias("gap_us"),
    )
    from . import stream_state_partitions

    with stream_state_partitions(spark, f"{sf_dir}/events.parquet"):
        query = (
            joined.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation",
                    tempfile.mkdtemp(prefix="stream_attr_full_ckpt_"))
            .trigger(availableNow=True)
            .start()
        )
        await_drained(query)
    return spark.table(name)


# ---------------------------------------------------------------------------
# streaming deduplication bounded by watermark (dropDuplicatesWithinWatermark)
# ---------------------------------------------------------------------------

def dedup_within_watermark(
    events: DataFrame,
    keys: "list[str]",
    *,
    ts_col: str = "ts",
    watermark: str = WATERMARK,
) -> DataFrame:
    """First-arrival dedup whose state is BOUNDED by the watermark: a key's
    dedup record is dropped once the watermark passes its event time plus
    the delay, so state is O(keys seen per watermark horizon), not O(all
    keys ever) — the property plain streaming ``dropDuplicates`` lacks and
    the reason it cannot run forever. A key recurring later than the
    horizon is emitted again (at-least-once dedup, matching the
    at-least-once guarantee of the reference's sink, ``SURVEY.md`` S11).
    """
    wm = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    if not events.isStreaming:
        return wm.dropDuplicates(keys)
    return wm.dropDuplicatesWithinWatermark(keys)


@register(
    "stream_dedup_events_watermark",
    # one availableNow micro-batch over one file: the watermark never
    # advances mid-batch, no state is evicted, so every duplicate key
    # collapses — output = the distinct key set. Only key columns are
    # returned (WHICH duplicate survives is arrival-order-dependent; the
    # key set itself is deterministic).
    oracle="SELECT DISTINCT user_id, event_type FROM events",
    doc="Streaming dedup with watermark-bounded state "
        "(dropDuplicatesWithinWatermark): first arrival per "
        "(user_id, event_type) emits, duplicates within the watermark "
        "horizon are suppressed, and state is evicted as the watermark "
        "advances — the only dedup shape that survives an unbounded "
        "stream.",
)
def stream_dedup_events_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    name = f"stream_ddw_{uuid.uuid4().hex[:8]}"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    in_dir = tempfile.mkdtemp(prefix="stream_ddw_in_")
    os.symlink(
        os.path.abspath(f"{sf_dir}/events.parquet"),
        os.path.join(in_dir, "events.parquet"),
    )
    stream = normalize_events_ts(
        spark.readStream.schema(raw_schema).parquet(in_dir),
        target="timestamp",
    ).select("ts", "user_id", "event_type")
    from . import stream_state_partitions

    with stream_state_partitions(spark, f"{sf_dir}/events.parquet"):
        query = (
            dedup_within_watermark(stream, ["user_id", "event_type"])
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option(
                "checkpointLocation",
                tempfile.mkdtemp(prefix="stream_ddw_ckpt_"),
            )
            .trigger(availableNow=True)
            .start()
        )
        await_drained(query)
    return spark.table(name).select("user_id", "event_type")


# ---------------------------------------------------------------------------
# streaming window top-k (stream aggregation + serving-side rank)
# ---------------------------------------------------------------------------

TOPK_PER_WINDOW = 2


@register(
    "stream_window_topk",
    # rank over CLOSED windows only (same append-mode cut as
    # stream_window_events); the serving-side rank is deterministic with
    # the (n_events, event_type) tie-break
    oracle=f"""
    WITH wm AS (
      SELECT max(ts) - INTERVAL 1 HOUR AS w FROM events
    ),
    closed AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
             event_type, COUNT(*) AS n_events
      FROM events
      GROUP BY window_start, event_type
      HAVING window_start + INTERVAL 1 DAY <= (SELECT w FROM wm)
    )
    SELECT window_start, event_type, n_events, rk FROM (
      SELECT window_start, event_type, n_events,
             ROW_NUMBER() OVER (PARTITION BY window_start
                                ORDER BY n_events DESC, event_type) AS rk
      FROM closed
    ) t WHERE rk <= {TOPK_PER_WINDOW}
    """,
    doc="Streaming window top-k — the lambda-serving composition: the "
        "stream side maintains watermarked tumbling-window counts "
        "(bounded state, append-only emission), and the rank runs on the "
        "emitted CLOSED windows, where it is a cheap batch window over "
        "one row per (window, key). Ranking inside the stream would need "
        "retractions; ranking after emission needs none — the standard "
        "split between streaming aggregation and serving-side ordering.",
    bench=True,
)
def stream_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    closed = stream_window_events(spark, sf_dir)
    w = W.partitionBy("window_start").orderBy(
        F.desc("n_events"), F.asc("event_type")
    )
    return (
        closed.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOPK_PER_WINDOW)
        .select("window_start", "event_type", "n_events", "rk")
    )


# ---------------------------------------------------------------------------
# sliding (overlapping) windows with watermark
# ---------------------------------------------------------------------------

SLIDE_WINDOW = "1 day"
SLIDE_STEP = "12 hours"
_SLIDE_US = 12 * 3600 * 1_000_000
_SLIDES_PER_WINDOW = 2  # window / slide


def sliding_counts(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    watermark: str = WATERMARK,
    window: str = SLIDE_WINDOW,
    slide: str = SLIDE_STEP,
) -> DataFrame:
    """Sliding event-time window counts: every event lands in
    window/slide overlapping windows (2 here). Same bounded-state story
    as tumbling — state per (window, key) partial, evicted when the
    watermark closes the window — but with window/slide times the window
    count in flight."""
    wm = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        wm.groupBy(F.window(ts_col, window, slide).alias("w"), key_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr(
                "CAST(SUM(CAST(value AS DECIMAL(10,2))) AS DOUBLE)"
            ).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), key_col, "n_events", "sum_value")
    )


@register(
    "stream_sliding_events",
    # each event contributes to BOTH 12h-grid-aligned windows covering it:
    # w_start ∈ {bucket(ts), bucket(ts) - 12h} (epoch-aligned integer
    # bucket arithmetic — identical to Spark's epoch-origin window grid);
    # append mode keeps only windows whose end the watermark passed
    oracle=f"""
    WITH wm AS (
      SELECT max(ts) - INTERVAL 1 HOUR AS w FROM events
    ),
    slid AS (
      SELECT make_timestamp(
               (epoch_us(ts) // {_SLIDE_US}) * {_SLIDE_US}
               - k * {_SLIDE_US}) AS window_start,
             event_type, value
      FROM events CROSS JOIN (
        SELECT unnest(range({_SLIDES_PER_WINDOW})) AS k
      ) ks
    )
    SELECT window_start, event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(10,2))) AS DOUBLE) AS sum_value
    FROM slid
    GROUP BY window_start, event_type
    HAVING window_start + INTERVAL 1 DAY <= (SELECT w FROM wm)
    """,
    doc="Watermarked SLIDING-window streaming aggregation: 1-day windows "
        "every 12 hours, so each event feeds two overlapping windows — "
        "the moving-average/trailing-window shape tumbling windows can't "
        "express. Append output emits each window exactly once at "
        "watermark close; state in flight is (window/slide)x the "
        "tumbling case but still bounded and independent of stream "
        "length. The oracle replays Spark's epoch-aligned window grid "
        "with integer bucket arithmetic.",
)
def stream_sliding_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    name = f"stream_sliding_{uuid.uuid4().hex[:8]}"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    in_dir = tempfile.mkdtemp(prefix="stream_sliding_in_")
    os.symlink(
        os.path.abspath(f"{sf_dir}/events.parquet"),
        os.path.join(in_dir, "events.parquet"),
    )
    stream = normalize_events_ts(
        spark.readStream.schema(raw_schema).parquet(in_dir),
        target="timestamp",
    )
    from . import stream_state_partitions

    with stream_state_partitions(spark, f"{sf_dir}/events.parquet"):
        query = (
            sliding_counts(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option(
                "checkpointLocation",
                tempfile.mkdtemp(prefix="stream_sliding_ckpt_"),
            )
            .trigger(availableNow=True)
            .start()
        )
        await_drained(query)
    return spark.table(name).select(
        F.col("window_start").cast("timestamp_ntz").alias("window_start"),
        "event_type",
        "n_events",
        "sum_value",
    )

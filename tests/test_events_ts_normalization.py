"""Pin normalize_events_ts against BOTH events.ts parquet encodings the
data generator has shipped across rounds: parquet TIMESTAMP(NANOS)
(surfaced as epoch-nanos bigint under nanosAsLong) and plain parquet
TIMESTAMP micros (read as TIMESTAMP_NTZ). A drift here silently skews
every windowed/sessionized events query."""

import datetime

from pyspark.sql import functions as F

from flink_connector_http_spark.plans.registry import normalize_events_ts

TS = datetime.datetime(2024, 3, 1, 12, 30, 45, 123456)
EPOCH_NANOS = int(TS.replace(tzinfo=datetime.timezone.utc).timestamp() * 1e6) * 1000


def test_nanos_as_long_encoding(spark):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.createDataFrame([(EPOCH_NANOS,)], "ts bigint")
    out = normalize_events_ts(df, target="timestamp_ntz")
    assert dict(out.dtypes)["ts"] == "timestamp_ntz"
    assert out.collect()[0].ts == TS  # integer nanos->micros, no float loss


def test_plain_timestamp_encoding(spark):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.createDataFrame([(TS,)], "ts timestamp").select(
        F.col("ts").cast("timestamp_ntz").alias("ts")
    )
    out = normalize_events_ts(df, target="timestamp_ntz")
    assert dict(out.dtypes)["ts"] == "timestamp_ntz"
    assert out.collect()[0].ts == TS


def test_ltz_target_for_watermarks(spark):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.createDataFrame([(EPOCH_NANOS,)], "ts bigint")
    out = normalize_events_ts(df, target="timestamp")
    assert dict(out.dtypes)["ts"] == "timestamp"
    # UTC session TZ pins wall-clock equality with the NTZ reading
    assert out.collect()[0].ts.replace(tzinfo=None) == TS

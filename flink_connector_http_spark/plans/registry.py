"""Query registry: every implemented operator registers a (Spark builder,
oracle SQL) pair here; ``__spark_entry__.py`` exposes them to the driver.

The oracle SQL must be ANSI SQL runnable by DuckDB over the same parquet
tables (pre-registered views: region nation customer supplier part orders
lineitem events documents embeddings). Column names are aliased identically
on both sides — the driver sorts columns by name before value-hashing.

Float determinism strategy: the synthetic tables carry 2-decimal doubles
(prices, discounts, taxes); every aggregate first casts to DECIMAL so the
arithmetic is exact and engine-order-independent, then casts the final
result back to DOUBLE so Spark and DuckDB emit bit-identical values.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: Optional[str]  # None → driver records a weaker rows-only check
    doc: str = ""
    bench: bool = False  # include in bench.py headline set


REGISTRY: Dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: Optional[str],
    doc: str = "",
    bench: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc, bench=bench)
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, *names: str) -> Dict[str, DataFrame]:
    """Read the named parquet tables from a scale-factor dir.

    ``events`` is special-cased: its ``ts`` column is normalized to
    TIMESTAMP_NTZ whichever parquet encoding the data generator used
    (see :func:`normalize_events_ts`).
    """
    out: Dict[str, DataFrame] = {}
    for n in names:
        if n == "events":
            df = load_events(spark, sf_dir)
        else:
            df = spark.read.parquet(f"{sf_dir}/{n}.parquet")
        if n in _PARALLELIZE:
            df = _ensure_parallelism(spark, df)
        out[n] = df
    return out


#: only the tables consumed by interpreted higher-order-function expressions
#: (minhash/simhash folds, cosine aggregates) benefit from forced splitting;
#: relational queries on lineitem/orders run whole-stage-codegen'd scans that
#: are faster than the extra shuffle a repartition would add
_PARALLELIZE = {"documents", "embeddings"}


def _ensure_parallelism(spark: SparkSession, df: DataFrame) -> DataFrame:
    """The test tables arrive as single small parquet files → one scan task,
    which serializes the (interpreted, non-codegen) higher-order-function
    expressions onto one core. Repartition to cluster parallelism when the
    scan is under-split. At real scale the input has thousands of splits and
    this is a no-op; Catalyst still pushes filters/pruning below the
    repartition. The probe counts input FILES (metadata-only) rather than
    planned partitions — ``df.rdd.getNumPartitions()`` would force a
    deserialized-RDD plan conversion per load."""
    target = spark.sparkContext.defaultParallelism
    if len(df.inputFiles()) < max(2, target // 2):
        return df.repartition(target)
    return df


def normalize_events_ts(df: DataFrame, *, target: str = "timestamp_ntz") -> DataFrame:
    """Adapt ``events.ts`` to ``target`` regardless of how the parquet file
    encodes it. The driver has shipped two encodings across rounds:

    - parquet TIMESTAMP(NANOS) — Spark's vectorized reader rejects it, so we
      read epoch-nanos (``nanosAsLong``) and rebuild via integer division to
      micros (a double division would lose precision at 1e18);
    - plain parquet TIMESTAMP (micros, isAdjustedToUTC=false) — Spark reads
      it as TIMESTAMP_NTZ directly.

    The session time zone is pinned UTC at every call site, so the
    NTZ <-> LTZ cast (streaming watermarks need LTZ) is value-preserving.
    """
    from pyspark.sql import functions as F

    dt = dict(df.dtypes)["ts"]
    if dt == "bigint":  # TIMESTAMP(NANOS) surfaced as epoch-nanos
        return df.withColumn(
            "ts", F.expr("timestamp_micros(ts DIV 1000)").cast(target)
        )
    if dt != target:
        return df.withColumn("ts", F.col("ts").cast(target))
    return df


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return normalize_events_ts(ev, target="timestamp_ntz")

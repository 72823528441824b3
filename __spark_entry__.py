"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship HTTP lookup join (the reference's core
capability, SURVEY §3.1) at sf0.001 against an in-process stub endpoint.
``queries()`` / ``oracle_sql()`` expose every registered operator from
SURVEY.md §2 plus the large-scale pipeline operators (dedup, similarity,
text analysis, multimodal) with DuckDB oracles for the correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# importing these modules populates the registry
from flink_connector_http_spark.plans import REGISTRY
from flink_connector_http_spark.plans import relational  # noqa: F401

try:  # optional modules appear as the build progresses
    from flink_connector_http_spark.plans import http_queries  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from flink_connector_http_spark.operators import text  # noqa: F401
    from flink_connector_http_spark.operators import dedup  # noqa: F401
    from flink_connector_http_spark.operators import similarity  # noqa: F401
    from flink_connector_http_spark.operators import multimodal  # noqa: F401
    from flink_connector_http_spark.operators import pipeline  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from flink_connector_http_spark.streaming import stateful  # noqa: F401
    from flink_connector_http_spark.streaming import windows  # noqa: F401
except ImportError:  # pragma: no cover
    pass


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: HTTP lookup join — orders enriched with customers fetched
    row-by-key from a REST endpoint (stub server in-process), sf0.001."""
    try:
        from flink_connector_http_spark.plans.http_queries import http_lookup_customers_get

        return http_lookup_customers_get(spark, "/root/testdata/sf0.001")
    except ImportError:
        return REGISTRY["q01_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ pipeline ops)."""
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query; keys without an oracle
    (genuinely non-SQL-expressible ops) are omitted → rows-only check."""
    return {
        name: spec.oracle
        for name, spec in REGISTRY.items()
        if spec.oracle is not None
    }

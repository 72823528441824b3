"""SQL-callable HTTP functions: the pure-SQL surface of the engine.

The reference is driven entirely from SQL DDL (``'connector'='http'``
tables queried with lookup joins). This module gives the Spark engine an
equivalent ad-hoc SQL entry point without any table registration:

.. code-block:: sql

    SELECT s.s_suppkey, t.record
    FROM supplier s,
         LATERAL http_get_json(concat('http://api/nation?key=', s.s_nationkey)) t

``http_get_json(url)`` is a Python UDTF (PySpark 4): one GET per call,
each decoded JSON record emitted as a row carrying the record as a JSON
string — compose with ``from_json(record, schema)`` for typing. A JSON
object yields one row, an array yields one row per element (the
reference's ``single-value`` / ``array`` result modes,
``JavaNetHttpPollingClient.java:340-376``).

**Scale honesty**: a UDTF runs row-at-a-time Python and fires one request
per probe row — exactly the reference's per-row behavior, and the slow
path here. It is therefore an AD-HOC convenience only (endpoint
spelunking, one-off SQL) and is deliberately NOT part of the registered
pipeline surface: the registered SQL spellings are
``http_sql_lookup_join`` (SQL-derived distinct keys → Arrow-vectorized
:func:`~flink_connector_http_spark.lookup.http_lookup_join` → SQL join
back) and ``http_sql_ddl_scan`` (``CREATE TEMPORARY VIEW ... USING
http``, paged parallel scan). The transport here is still
keep-alive-pooled per executor thread, so the per-call cost is one round
trip, not one connection.
"""

from __future__ import annotations

import json

from pyspark.sql.functions import udtf

__all__ = ["register_http_sql_functions"]


@udtf(returnType="record STRING")
class HttpGetJson:
    """``http_get_json(url)`` — GET the url, emit each decoded JSON
    record as a JSON-string row."""

    def __init__(self) -> None:
        self._transport = None

    def eval(self, url: str):  # noqa: D102 — UDTF contract
        if url is None:
            return
        if self._transport is None:
            from .client import HttpTransport

            self._transport = HttpTransport(timeout=30.0)
        from .request import HttpRequestSpec

        resp = self._transport.send(
            HttpRequestSpec(method="GET", url=url, headers={}, body=None)
        )
        if resp.status != 200:
            raise IOError(f"http_get_json: {url} returned {resp.status}")
        decoded = json.loads(resp.body.decode("utf-8"))
        if isinstance(decoded, dict):
            decoded = [decoded]
        for rec in decoded:
            # sort_keys so the emitted string is deterministic regardless
            # of server-side key order
            yield (json.dumps(rec, sort_keys=True),)


def register_http_sql_functions(spark) -> None:
    """Register the HTTP SQL functions on this session
    (``http_get_json``)."""
    spark.udtf.register("http_get_json", HttpGetJson)

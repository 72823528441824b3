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

**Scale honesty**: ``http_get_json`` runs row-at-a-time Python and fires
one request per probe row — exactly the reference's per-row behavior,
and the slow path here. It is an AD-HOC convenience only (endpoint
spelunking, one-off SQL). The REGISTERED SQL lookup surface is
``http_lookup(TABLE(probe), url => ..., on => ..., schema => ...)``
below — a Spark 4 Python UDTF that buffers probe rows and flushes them
in batches through the SAME vectorized machinery as
:func:`~flink_connector_http_spark.lookup.http_lookup_join`
(``lookup._enrich_pdf``: distinct-key dedup, per-executor client/cache
singletons, pooled or multi-key-batch fetch), completing reference
parity: the reference's lookup function IS a UDTF
(``HttpTableLookupFunction.java:48``). The other registered SQL
spellings are ``http_sql_lookup_join`` (SQL-derived distinct keys →
``http_lookup_join`` → SQL join back) and ``http_sql_ddl_scan``
(``CREATE TEMPORARY VIEW ... USING http``, paged parallel scan). The
transport everywhere is keep-alive-pooled per executor thread, so a
per-call cost is one round trip, not one connection.
"""

from __future__ import annotations

import json

from pyspark.sql.functions import udtf

__all__ = ["register_http_sql_functions", "HttpLookupUdtf"]


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
    """Register the HTTP SQL functions on this session:
    ``http_get_json`` (ad-hoc, row-at-a-time) and ``http_lookup``
    (the vectorized SQL UDTF lookup surface)."""
    spark.udtf.register("http_get_json", HttpGetJson)
    spark.udtf.register("http_lookup", udtf(HttpLookupUdtf))


# ---------------------------------------------------------------------------
# http_lookup — the registered SQL UDTF lookup surface (reference parity:
# the lookup function IS a Flink UDTF, HttpTableLookupFunction.java:48)
# ---------------------------------------------------------------------------

_FLUSH_ROWS = 1024

_DDL_SCALARS = {
    "boolean": "BooleanType",
    "tinyint": "ByteType",
    "byte": "ByteType",
    "smallint": "ShortType",
    "short": "ShortType",
    "int": "IntegerType",
    "integer": "IntegerType",
    "bigint": "LongType",
    "long": "LongType",
    "float": "FloatType",
    "real": "FloatType",
    "double": "DoubleType",
    "string": "StringType",
    "varchar": "StringType",
    "date": "DateType",
    "timestamp": "TimestampType",
    "binary": "BinaryType",
}


def _parse_ddl_struct(ddl: str):
    """Parse a FLAT ``name TYPE, name TYPE`` DDL string without a JVM —
    UDTF ``analyze`` runs in a Python worker where ``StructType.fromDDL``
    is unavailable. Scalar types + DECIMAL(p,s) only; nested lookup
    schemas belong on the DataFrame surface
    (:func:`~flink_connector_http_spark.lookup.http_lookup_join`)."""
    import re

    from pyspark.sql import types as T

    fields = []
    for part in re.split(r",(?![^()]*\))", ddl):
        part = part.strip()
        if not part:
            continue
        m = re.match(r"^(\w+)\s+(\w+)(?:\s*\(\s*(\d+)\s*,\s*(\d+)\s*\))?$",
                     part, re.IGNORECASE)
        if not m:
            raise ValueError(
                f"http_lookup: cannot parse schema field {part!r} — flat "
                "'name TYPE' fields only (use http_lookup_join for nested "
                "schemas)"
            )
        name, typ, p, s = m.groups()
        typ = typ.lower()
        if typ == "decimal":
            dt = T.DecimalType(int(p or 10), int(s or 0))
        elif typ in _DDL_SCALARS:
            dt = getattr(T, _DDL_SCALARS[typ])()
        else:
            raise ValueError(
                f"http_lookup: unsupported type {typ!r} in schema DDL"
            )
        fields.append(T.StructField(name, dt, True))
    if not fields:
        raise ValueError("http_lookup: schema DDL parsed to zero fields")
    return T.StructType(fields)


def _parse_on(on: str):
    """``'probe=lookup, probe2=lookup2'`` (or bare ``'col'`` for same-name
    keys) → ordered (probe_col, lookup_col) pairs."""
    pairs = []
    for part in on.split(","):
        part = part.strip()
        if not part:
            continue
        if "=" in part:
            probe_col, lookup_col = (x.strip() for x in part.split("=", 1))
        else:
            probe_col = lookup_col = part
        pairs.append((probe_col, lookup_col))
    if not pairs:
        raise ValueError("http_lookup: 'on' parsed to zero key pairs")
    return pairs


def _udtf_plan(probe_struct, schema: str, on: str, select, how: str,
               prefix: str, metadata):
    """The shared analyze/eval planning step: resolve the lookup schema,
    key pairs, pruned output fields and the full output column list —
    IDENTICAL logic to the head of ``lookup.http_lookup_join`` so the
    UDTF emits the same shape the DataFrame operator would."""
    from pyspark.sql import types as T

    from .types import METADATA_COLUMN_NAMES, metadata_schema

    lookup_schema = _parse_ddl_struct(schema)
    pairs = _parse_on(on)
    known = {f.name for f in lookup_schema.fields}
    for _pc, lk in pairs:
        if lk not in known:
            raise ValueError(
                f"http_lookup: lookup key {lk!r} not in schema DDL"
            )
    if select is not None:
        names = [s.strip() for s in str(select).split(",") if s.strip()]
        unknown = [n for n in names if n not in known]
        if unknown:
            raise ValueError(
                f"http_lookup: select columns {unknown} not in schema DDL"
            )
        output_lookup_fields = [
            f for f in lookup_schema.fields if f.name in set(names)
        ]
    else:
        output_lookup_fields = list(lookup_schema.fields)
    meta_names = []
    if metadata:
        meta_names = [s.strip() for s in str(metadata).split(",") if s.strip()]
        unknown = set(meta_names) - set(METADATA_COLUMN_NAMES)
        if unknown:
            raise ValueError(
                f"http_lookup: unknown metadata columns {sorted(unknown)}"
            )
    if how not in ("inner", "left"):
        raise ValueError(f"http_lookup: how must be inner|left, got {how!r}")
    probe_names = [f.name for f in probe_struct.fields]
    out_fields = list(probe_struct.fields)
    for f in output_lookup_fields:
        name = f"{prefix}{f.name}"
        if name in probe_names:
            raise ValueError(
                f"http_lookup: lookup column {name!r} collides with a probe "
                "column; pass prefix => '...' to rename"
            )
        out_fields.append(T.StructField(name, f.dataType, True))
    meta_fields = (
        list(metadata_schema(meta_names).fields) if meta_names else []
    )
    for f in meta_fields:
        out_fields.append(T.StructField(f"{prefix}{f.name}", f.dataType, True))
    return {
        "lookup_schema": lookup_schema,
        "pairs": pairs,
        "output_lookup_fields": output_lookup_fields,
        "meta_names": meta_names,
        "out_struct": T.StructType(out_fields),
        "probe_names": probe_names,
    }


class HttpLookupUdtf:
    """``http_lookup(TABLE(probe), url => ..., on => ..., schema => ...)``
    — the SQL UDTF spelling of the lookup join (reference parity: the
    lookup function IS a Flink UDTF, ``HttpTableLookupFunction.java:48``).

    NOT row-at-a-time: probe rows buffer per task and flush in
    1024-row batches through :func:`lookup._enrich_pdf` — the exact
    vectorized machinery behind ``http_lookup_join`` (distinct-key dedup,
    per-executor client + cache singletons, thread-pooled / multi-key
    batch fetch, emptiness rule, key backfill, array multiply, metadata
    columns), so request volume is bounded by distinct keys per batch.

    Named arguments: ``url`` (required), ``on`` (required,
    ``'probe=lookup,...'``), ``schema`` (required, flat DDL of the
    response), ``select`` (lookup columns to emit), ``how``
    (inner|left), ``method`` (GET|POST|PUT), ``batch_size`` (multi-key
    requests via lookup.batch-size), ``prefix`` (lookup column rename),
    ``metadata`` (comma list of virtual columns), ``cache_ttl`` +
    ``cache_size`` (per-executor LRU+TTL cache).
    """

    @staticmethod
    def analyze(*args, **kwargs):
        from pyspark.sql.udtf import AnalyzeResult

        if not args or not args[0].isTable:
            raise ValueError(
                "http_lookup: first argument must be TABLE(...)"
            )

        def const(name, default=None, required=False):
            arg = kwargs.get(name)
            if arg is None:
                if required:
                    raise ValueError(
                        f"http_lookup: named argument {name!r} is required"
                    )
                return default
            if not arg.isConstantExpression:
                raise ValueError(
                    f"http_lookup: {name!r} must be a constant expression"
                )
            return arg.value

        const("url", required=True)
        plan = _udtf_plan(
            probe_struct=args[0].dataType,
            schema=const("schema", required=True),
            on=const("on", required=True),
            select=const("select"),
            how=const("how", "inner"),
            prefix=const("prefix", ""),
            metadata=const("metadata"),
        )
        return AnalyzeResult(schema=plan["out_struct"])

    def __init__(self) -> None:
        self._cfg = None
        self._client = None
        self._cache = None
        self._rows = []
        self._probe_names = None

    def _configure(self, row, kwargs) -> None:
        from .cache import LookupCacheConfig, shared_cache
        from .lookup import (
            HttpLookupTable,
            _client_for,
            _EnrichConfig,
            _normalize_on,
        )
        from .options import HttpLookupOptions

        self._probe_names = list(row.__fields__)
        from pyspark.sql import types as T

        probe_struct = T.StructType(
            [T.StructField(n, T.StringType(), True) for n in self._probe_names]
        )  # field TYPES are irrelevant to planning — names drive it
        plan = _udtf_plan(
            probe_struct=probe_struct,
            schema=kwargs["schema"],
            on=kwargs["on"],
            select=kwargs.get("select"),
            how=kwargs.get("how") or "inner",
            prefix=kwargs.get("prefix") or "",
            metadata=kwargs.get("metadata"),
        )
        how = kwargs.get("how") or "inner"
        prefix = kwargs.get("prefix") or ""
        cache_cfg = None
        if kwargs.get("cache_ttl") is not None:
            cache_cfg = LookupCacheConfig(
                max_size=int(kwargs.get("cache_size") or 10_000),
                ttl=float(kwargs["cache_ttl"]),
            )
        table = HttpLookupTable(
            url=kwargs["url"],
            schema=plan["lookup_schema"],
            options=HttpLookupOptions(
                method=(kwargs.get("method") or "GET").upper(),
                lookup_batch_size=int(kwargs.get("batch_size") or 0) or None,
                cache=cache_cfg,
            ),
        )
        pairs = _normalize_on(dict(plan["pairs"]))
        out_col_names = (
            list(self._probe_names)
            + [f"{prefix}{f.name}" for f in plan["output_lookup_fields"]]
            + [f"{prefix}{m}" for m in plan["meta_names"]]
        )
        self._cfg = _EnrichConfig(
            table=table,
            pairs=tuple(pairs),
            probe_col_names=tuple(self._probe_names),
            output_lookup_fields=tuple(plan["output_lookup_fields"]),
            out_col_names=tuple(out_col_names),
            lookup_prefix=prefix,
            key_lookup_names=tuple(lk for _, lk in pairs),
            meta_names=tuple(plan["meta_names"]),
            emit_on_empty=(how == "left" or bool(plan["meta_names"])),
        )
        self._client = _client_for(table)
        if cache_cfg is not None:
            self._cache = shared_cache(table.fingerprint(), cache_cfg)

    def _flush(self):
        if not self._rows:
            return
        import pandas as pd

        from .lookup import _enrich_pdf

        pdf = pd.DataFrame(
            {
                name: pd.Series(
                    [r[i] for r in self._rows], dtype="object"
                )
                for i, name in enumerate(self._probe_names)
            }
        )
        self._rows = []
        out = _enrich_pdf(self._cfg, self._client, self._cache, pdf)
        if out is None or len(out) == 0:
            return
        for tup in out.itertuples(index=False, name=None):
            yield tup

    def eval(self, row, **kwargs):  # noqa: D102 — UDTF contract
        if self._cfg is None:
            self._configure(row, kwargs)
        self._rows.append(tuple(row))
        if len(self._rows) >= _FLUSH_ROWS:
            yield from self._flush()

    def terminate(self):  # noqa: D102 — UDTF contract
        yield from self._flush()

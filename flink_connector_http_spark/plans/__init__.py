"""Query plans: the relational substrate (Spark built-ins, Catalyst-planned)
and the HTTP-connector query surface, each paired with a DuckDB oracle."""

from .registry import QuerySpec, REGISTRY, register  # noqa: F401

"""Back-compat shim: the stub server now ships in the package so non-test
code (plans/http_queries.py, bench.py) can use it."""

from flink_connector_http_spark.testing import (  # noqa: F401
    RecordedRequest,
    Responder,
    StubHttpServer,
    StubResponse,
    json_response,
)

"""Level-gated HTTP content logging + request/response callback hook.

Parity targets:
- content-logger levels MIN / REQ_RESP / MAX — method+URI always, bodies at
  REQ_RESP and above, headers only at MAX, obfuscated otherwise: reference
  ``HttpLogger.java:56-151``; level table ``docs/.../table/http.md:832-839``
- request/response callback SPI with default slf4j loggers: reference
  ``HttpPostRequestCallback.java``,
  ``table/lookup/Slf4JHttpLookupPostRequestCallback.java`` (SURVEY §2.7 R12)
"""

from __future__ import annotations

import logging
from enum import Enum
from typing import Callable, Mapping, Optional

__all__ = [
    "HttpContentLogLevel",
    "HttpContentLogger",
    "REQUEST_CALLBACKS",
    "logging_callback",
    "register_request_callback",
    "resolve_request_callback",
]

logger = logging.getLogger("flink_connector_http_spark.http")

_OBFUSCATED = "<obfuscated>"


class HttpContentLogLevel(str, Enum):
    MIN = "MIN"            # method + URI only
    REQ_RESP = "REQ_RESP"  # + bodies
    MAX = "MAX"            # + headers


class HttpContentLogger:
    """Formats one request/response exchange according to the level."""

    def __init__(self, level: HttpContentLogLevel = HttpContentLogLevel.MIN,
                 log: logging.Logger = logger,
                 log_at: int = logging.INFO) -> None:
        self.level = HttpContentLogLevel(level)
        self._log = log
        self._log_at = log_at

    def _body(self, body: Optional[bytes]) -> str:
        if self.level == HttpContentLogLevel.MIN:
            return _OBFUSCATED
        if body is None:
            return ""
        return body.decode("utf-8", errors="replace")

    def _headers(self, headers: Optional[Mapping[str, object]]) -> str:
        if self.level != HttpContentLogLevel.MAX:
            return _OBFUSCATED
        return str(dict(headers or {}))

    def log_exchange(self, *, method: str, url: str,
                     request_body: Optional[bytes] = None,
                     request_headers: Optional[Mapping[str, object]] = None,
                     status: Optional[int] = None,
                     response_body: Optional[bytes] = None,
                     response_headers: Optional[Mapping[str, object]] = None) -> None:
        self._log.log(
            self._log_at,
            "HTTP %s %s -> %s | req body=%s headers=%s | resp body=%s headers=%s",
            method, url, status,
            self._body(request_body), self._headers(request_headers),
            self._body(response_body), self._headers(response_headers),
        )


def logging_callback(level: HttpContentLogLevel = HttpContentLogLevel.MIN,
                     log_at: int = logging.INFO,
                     ) -> Callable[[object, object], None]:
    """Default ``on_response`` callback: logs each exchange (the reference's
    slf4j callbacks)."""
    content_logger = HttpContentLogger(level, log_at=log_at)

    def on_response(request, response) -> None:
        content_logger.log_exchange(
            method=getattr(request, "method", "?"),
            url=getattr(request, "url", "?"),
            request_body=getattr(request, "body", None),
            request_headers=getattr(request, "headers", None),
            status=getattr(response, "status", None),
            response_body=getattr(response, "body", None),
            response_headers=dict(getattr(response, "headers", []) or []) or None,
        )

    return on_response


# --- named callback registry (R12 string-identifier surface) ------------------
#
# The reference discovers HttpPostRequestCallback factories by string
# identifier in DDL option maps (`http.source.lookup.request-callback`,
# `http.sink.request-callback` — HttpLookupConnectorOptions.java:102-105,
# HttpPostRequestCallbackFactory.java:36-37), with the slf4j loggers as the
# built-ins (Slf4jHttpLookupPostRequestCallbackFactory.java:32,
# Slf4jHttpPostRequestCallbackFactory.java:32). This registry mirrors
# query_creators.QUERY_CREATORS so the SQL/options-map surface (UDTF
# `options =>`, DDL views) can name a callback instead of passing a Python
# callable.
REQUEST_CALLBACKS: "dict[str, Callable[[], Callable[[object, object], None]]]" = {
    "http-slf4j-lookup-logger": lambda: logging_callback(log_at=logging.INFO),
    "http-slf4j-logger": lambda: logging_callback(log_at=logging.INFO),
}


def register_request_callback(
    identifier: str,
    factory: Callable[[], Callable[[object, object], None]],
) -> None:
    """Register a named request/response callback factory (plug-point
    parity with the reference's HttpPostRequestCallbackFactory SPI). The
    factory is called once per options-map resolution and must return a
    cloudpickle-able ``(request_spec, response) -> None``."""
    REQUEST_CALLBACKS[identifier] = factory


def resolve_request_callback(
    identifier: str,
) -> Callable[[object, object], None]:
    factory = REQUEST_CALLBACKS.get(identifier)
    if factory is None and ":" in identifier:
        # dotted-path form `package.module:factory` — the Python analogue
        # of the reference's classpath factory discovery (a named factory
        # must be LOADABLE where it is resolved; option maps are parsed in
        # Python workers, which share the driver's importable modules but
        # not its in-memory registry mutations)
        import importlib

        module_name, _, attr = identifier.partition(":")
        try:
            factory = getattr(importlib.import_module(module_name), attr)
        except (ImportError, AttributeError) as exc:
            raise ValueError(
                f"Request callback {identifier!r} failed to load: {exc}"
            ) from None
    if factory is None:
        raise ValueError(
            f"Unknown request callback {identifier!r}; "
            f"registered: {sorted(REQUEST_CALLBACKS)} "
            "(or use the dotted-path form 'package.module:factory')"
        )
    return factory()

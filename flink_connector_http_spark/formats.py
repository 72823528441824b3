"""Pluggable response-format codecs for the lookup source.

Parity target: the reference makes the lookup response/request format a
discoverable SPI with ``json`` as the default
(``HttpLookupConnectorOptions.java:93-94`` ``lookup-request.format``;
custom-format walkthrough ``docs/content/docs/connectors/table/http.md:
449-478``). Here the plug points are:

- **response decode** (this module): ``HttpLookupOptions.response_format``
  names a registered decoder (``json`` default, ``csv`` built in), or
  ``HttpLookupOptions.decoder`` supplies a callable directly. A decoder is
  ``bytes -> dict | list[dict]``; the client applies the ``result_type``
  single-value/array rule on top, identically for every format.
- **request encode**: request bodies are built by the query-creator
  registry (``query_creators.py``, reference Q1-Q5) — that registry is the
  request-side SPI, mirroring how the reference routes
  ``lookup-request.format`` through its query creators.
- **sink payload encode**: ``HttpSinkOptions.payload_format`` selects the
  JVM-side serializer in ``write_http`` (``to_json`` / ``to_csv`` — both
  stay inside whole-stage codegen; no Python in the row path).

Custom decoders registered with :func:`register_format` must be
importable top-level functions so Spark can pickle them to executors.
"""

from __future__ import annotations

import csv
import io
import json
from typing import Any, Callable, Dict, List, Mapping

__all__ = [
    "FormatDecoder",
    "register_format",
    "resolve_decoder",
    "registered_formats",
]

# bytes -> dict (one row) | list[dict] (many rows)
FormatDecoder = Callable[[bytes], Any]


def decode_json(body: bytes) -> Any:
    """Default decoder (reference format ``json``)."""
    return json.loads(body.decode("utf-8"))


def decode_csv(body: bytes) -> List[Mapping[str, Any]]:
    """CSV with a header row → list of string-valued dicts; the declared
    lookup schema coerces values to their column types downstream
    (same coercion path the JSON decoder uses)."""
    text = body.decode("utf-8-sig")
    return [dict(row) for row in csv.DictReader(io.StringIO(text))]


_DECODERS: Dict[str, FormatDecoder] = {
    "json": decode_json,
    "csv": decode_csv,
}


def register_format(name: str, decoder: FormatDecoder) -> None:
    """Register a custom response decoder under ``name`` (the SPI hook —
    reference custom-format registration, ``http.md:449-478``)."""
    if not callable(decoder):
        raise TypeError("decoder must be callable: bytes -> dict | list[dict]")
    _DECODERS[name] = decoder


def resolve_decoder(name: str) -> FormatDecoder:
    try:
        return _DECODERS[name]
    except KeyError:
        raise ValueError(
            f"unknown response format {name!r}; registered: "
            f"{sorted(_DECODERS)} (register_format() adds more)"
        ) from None


def registered_formats() -> List[str]:
    return sorted(_DECODERS)

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
- **sink payload encode** (this module too): ``HttpSinkOptions.
  payload_format`` selects the serializer in ``write_http``. The built-in
  ``json`` / ``csv`` serialize JVM-side (``to_json`` / ``to_csv`` inside
  whole-stage codegen; no Python in the row path). A CUSTOM format
  registered with ``register_format(name, encoder=..., framing=...)``
  supplies a Python ``row-dict -> bytes`` encoder (the Spark rendering of
  the reference's ``SerializationSchemaElementConverter.java:30-62`` +
  custom-format factory SPI) plus a batch framing rule: ``json-array``
  (``[e1,e2,...]``), ``newline``, or ``concat`` (raw byte concatenation,
  for length-prefixed binary protocols).

Custom codecs registered with :func:`register_format` must be importable
top-level functions so Spark can pickle them to executors.
"""

from __future__ import annotations

import csv
import io
import json
from typing import Any, Callable, Dict, List, Mapping, Optional

__all__ = [
    "FormatDecoder",
    "FormatEncoder",
    "register_format",
    "resolve_decoder",
    "resolve_encoder",
    "encoder_framing",
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


def decode_jsonl(body: bytes) -> List[Any]:
    """JSON Lines (ndjson): one JSON object per line, blank lines
    skipped — the common bulk/export media type."""
    return [
        json.loads(line)
        for line in body.decode("utf-8").splitlines()
        if line.strip()
    ]


#: row dict -> payload bytes (one request-entry payload)
FormatEncoder = Callable[[Mapping[str, Any]], bytes]

_FRAMINGS = ("json-array", "newline", "concat")

_DECODERS: Dict[str, FormatDecoder] = {
    "json": decode_json,
    "csv": decode_csv,
    "jsonl": decode_jsonl,
}

#: name -> (encoder | None, framing). ``None`` encoder = serialized
#: JVM-side in ``write_http`` (the fast path for the built-ins).
_ENCODERS: Dict[str, tuple] = {
    "json": (None, "json-array"),
    "csv": (None, "newline"),
    "jsonl": (None, "newline"),  # to_json rows, newline-framed = ndjson
}


def register_format(
    name: str,
    decoder: Optional[FormatDecoder] = None,
    *,
    encoder: Optional[FormatEncoder] = None,
    framing: str = "newline",
) -> None:
    """Register a custom format under ``name`` (the SPI hook — reference
    custom-format registration, ``http.md:449-478``): a response
    ``decoder`` (lookup/source side), a sink payload ``encoder`` with its
    batch ``framing``, or both under one name."""
    if decoder is None and encoder is None:
        raise TypeError("register_format needs a decoder and/or an encoder")
    if decoder is not None:
        if not callable(decoder):
            raise TypeError("decoder must be callable: bytes -> dict | list[dict]")
        _DECODERS[name] = decoder
    if encoder is not None:
        if not callable(encoder):
            raise TypeError("encoder must be callable: row dict -> bytes")
        if framing not in _FRAMINGS:
            raise ValueError(f"framing must be one of {_FRAMINGS}, got {framing!r}")
        _ENCODERS[name] = (encoder, framing)


def resolve_decoder(name: str) -> FormatDecoder:
    try:
        return _DECODERS[name]
    except KeyError:
        raise ValueError(
            f"unknown response format {name!r}; registered: "
            f"{sorted(_DECODERS)} (register_format() adds more)"
        ) from None


def resolve_encoder(name: str) -> Optional[FormatEncoder]:
    """The sink encoder for ``name`` (``None`` = built-in JVM-side path)."""
    try:
        return _ENCODERS[name][0]
    except KeyError:
        raise ValueError(
            f"unknown sink payload format {name!r}; registered: "
            f"{sorted(_ENCODERS)} (register_format(encoder=...) adds more)"
        ) from None


def encoder_framing(name: str) -> str:
    """Batch framing rule for ``name``: json-array | newline | concat."""
    try:
        return _ENCODERS[name][1]
    except KeyError:
        raise ValueError(f"unknown sink payload format {name!r}") from None


def registered_formats() -> List[str]:
    return sorted(set(_DECODERS) | set(_ENCODERS))

"""Request assembly: lookup keys → (method, url, headers, body).

Re-expresses the reference's request factories (SURVEY §2.6 Q6):

- base assembly, path-param resolution, whole-URL placeholder skipping
  URL-encoding: ``table/lookup/RequestFactoryBase.java:103-157``
- GET URI = url + resolved path params + query string:
  ``table/lookup/GetRequestFactory.java:74-87``
- body-based (POST/PUT) URI + body:
  ``table/lookup/BodyBasedRequestFactory.java:63-109``
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Mapping, Optional, Tuple
from urllib.parse import quote, urlencode

from .query_creators import LookupQueryInfo

__all__ = ["HttpRequestSpec", "build_lookup_request"]

_PLACEHOLDER_RE = re.compile(r"\{\{([^{}]+)\}\}")


@dataclass(frozen=True)
class HttpRequestSpec:
    """A fully assembled HTTP request, ready for the client."""

    method: str
    url: str
    headers: Mapping[str, str] = field(default_factory=dict)
    body: Optional[bytes] = None


def _resolve_url_template(url: str, path_params: Mapping[str, str]) -> str:
    """Substitute ``{{name}}`` placeholders into the URL template.

    Values are URL-encoded, except when the placeholder spans the whole URL
    (reference ``RequestFactoryBase.java:144-153`` skips encoding then, so a
    key can carry a complete URL).
    """

    def substitute(match: "re.Match[str]") -> str:
        name = match.group(1).strip()
        if name not in path_params:
            raise KeyError(
                f"URL template placeholder {{{{{name}}}}} has no value; "
                f"provided params: {sorted(path_params)}"
            )
        value = path_params[name]
        if match.span() == (0, len(url)):
            return value  # whole-URL placeholder: no encoding
        return quote(str(value), safe="")

    return _PLACEHOLDER_RE.sub(substitute, url)


def _append_query(url: str, query: str) -> str:
    if not query:
        return url
    separator = "&" if "?" in url else "?"
    return f"{url}{separator}{query}"


def build_lookup_request(
    *,
    method: str,
    url: str,
    query_info: LookupQueryInfo,
    headers: Optional[Mapping[str, str]] = None,
) -> HttpRequestSpec:
    """Assemble one lookup request from a query creator's output.

    GET: ``lookup_query`` (already URL-encoded by the creator) plus any
    ``query_params`` land in the query string; body is empty.
    POST/PUT: ``lookup_query`` is the body; ``query_params`` still append
    to the URL (reference ``BodyBasedRequestFactory.java:63-109``).
    """
    method = method.upper()
    resolved = _resolve_url_template(url, dict(query_info.path_params))

    extra_query = (
        urlencode([(k, str(v)) for k, v in query_info.query_params.items()])
        if query_info.query_params
        else ""
    )
    if method == "GET":
        full_query = "&".join(q for q in (query_info.lookup_query, extra_query) if q)
        return HttpRequestSpec(
            method=method,
            url=_append_query(resolved, full_query),
            headers=dict(headers or {}),
            body=None,
        )

    body = query_info.lookup_query.encode("utf-8") if query_info.lookup_query else b""
    request_headers = dict(headers or {})
    request_headers.setdefault("Content-Type", "application/json")
    return HttpRequestSpec(
        method=method,
        url=_append_query(resolved, extra_query),
        headers=request_headers,
        body=body,
    )


def flatten_key_row(row: Mapping[str, object], prefix: str = "") -> "dict[str, object]":
    """Flatten nested struct join keys into dotted leaf columns.

    Mirrors the reference's recursive descent over ROW-typed keys
    (``table/lookup/RowTypeLookupSchemaEntry.java:73-87``): a key column
    ``details.nestedDetails.balance`` contributes a single scalar arg named
    by its leaf path.
    """
    flat: "dict[str, object]" = {}
    for name, value in row.items():
        key = f"{prefix}{name}"
        if isinstance(value, Mapping):
            flat.update(flatten_key_row(value, prefix=f"{key}."))
        else:
            flat[key] = value
    return flat

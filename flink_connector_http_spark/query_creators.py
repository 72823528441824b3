"""Query creators: map lookup-key values to an HTTP request shape.

This is the reference's small "expression language" for turning join keys
into a URL / query-string / body (SURVEY §2.6). Behavioral parity targets:

- ``http-generic-get-query`` (default for GET) — keys → URL-encoded query
  string: reference
  ``table/lookup/querycreators/GenericGetQueryCreator.java:45-57``
- ``http-generic-json-query`` (default for POST/PUT) — keys → JSON body:
  reference ``GenericJsonQueryCreator.java:49-55``
- ``http-generic-json-url`` — ``{{placeholder}}`` templating of URL path
  segments / query params (``url-map``) and body (``body-template``);
  textual JSON values are quoted, numerics/booleans are not; GET with a
  body template is rejected: reference
  ``GenericJsonAndUrlQueryCreator.java:110-183``,
  ``GenericJsonAndUrlQueryCreatorFactory.java:59-157``
- ``http-elasticsearch-lite`` — keys → Lucene query string
  ``q=k1:"v1" AND k2:"v2"``: reference
  ``ElasticSearchLiteQueryCreator.java:48-68``
- pluggable custom creators via a registry: reference META-INF factory SPI,
  discovery ``HttpLookupTableSource.java:122-136``

Key values arrive as an ordered ``dict[str, Any]`` of *flattened* key
columns (nested struct keys are flattened by the lookup operator — reference
``RowTypeLookupSchemaEntry.java:73-87``).
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Mapping, Optional
from urllib.parse import urlencode

__all__ = [
    "LookupQueryInfo",
    "QueryCreator",
    "generic_get_query_creator",
    "generic_json_query_creator",
    "elasticsearch_lite_query_creator",
    "GenericJsonUrlQueryCreator",
    "QUERY_CREATORS",
    "resolve_query_creator",
    "register_query_creator",
]

PLACEHOLDER_RE = re.compile(r"\{\{([^{}]+)\}\}")


@dataclass(frozen=True)
class LookupQueryInfo:
    """What a query creator produced for one key row.

    ``lookup_query`` is the request body for body-based methods (POST/PUT)
    or the pre-encoded query string for GET. ``path_params`` are
    ``{{name}}`` substitutions into the URL template; ``query_params`` are
    extra key/value pairs appended to the query string.
    """

    lookup_query: str = ""
    query_params: Mapping[str, str] = field(default_factory=dict)
    path_params: Mapping[str, str] = field(default_factory=dict)


#: (key_values) -> LookupQueryInfo
QueryCreator = Callable[[Mapping[str, Any]], LookupQueryInfo]


def _stringify(value: Any) -> str:
    """Scalar key → request string (reference
    ``RowDataSingleValueLookupSchemaEntry.java:58-71``: ``value.toString()``)."""
    if isinstance(value, bool):
        return "true" if value else "false"
    return "" if value is None else str(value)


def generic_get_query_creator(key_values: Mapping[str, Any]) -> LookupQueryInfo:
    """``k1=v1&k2=v2`` URL-encoded query string."""
    query = urlencode([(k, _stringify(v)) for k, v in key_values.items()])
    return LookupQueryInfo(lookup_query=query)


def generic_json_query_creator(key_values: Mapping[str, Any]) -> LookupQueryInfo:
    """Key row serialized as a JSON object body."""
    return LookupQueryInfo(lookup_query=json.dumps(dict(key_values)))


def elasticsearch_lite_query_creator(key_values: Mapping[str, Any]) -> LookupQueryInfo:
    """Lucene query-string search: ``q=k1:"v1" AND k2:"v2"`` (URL-encoded)."""
    lucene = " AND ".join(
        f'{k}:"{_stringify(v)}"' for k, v in key_values.items()
    )
    query = urlencode([("q", lucene)]) if key_values else ""
    return LookupQueryInfo(lookup_query=query)


class GenericJsonUrlQueryCreator:
    """The recommended creator: URL placeholders + JSON body template.

    * ``url_map``: ``{placeholder_name: key_column}`` — each ``{{name}}`` in
      the URL is replaced with the (URL-encoded) value of the mapped column.
    * ``body_template``: a JSON-ish template where ``{{col}}`` is replaced
      with the JSON encoding of the column value — strings quoted,
      numerics/booleans literal (reference quoting rule
      ``GenericJsonAndUrlQueryCreator.java:174-177``). May mix literal
      fragments and placeholders, arbitrarily nested.
    * GET with a body template is a configuration error (reference factory
      validation ``GenericJsonAndUrlQueryCreatorFactory.java:140-157``).
    """

    def __init__(
        self,
        http_method: str = "GET",
        url_map: Optional[Mapping[str, str]] = None,
        body_template: Optional[str] = None,
    ) -> None:
        method = http_method.upper()
        if method == "GET" and body_template and body_template.strip():
            raise ValueError(
                "A body template cannot be used with the GET method; "
                "use URL placeholders (url_map) instead"
            )
        self.http_method = method
        self.url_map = dict(url_map or {})
        self.body_template = body_template

    @staticmethod
    def _json_fragment(value: Any) -> str:
        # json.dumps gives exactly the reference's quoting: strings quoted,
        # numbers/booleans/null literal.
        return json.dumps(value)

    def __call__(self, key_values: Mapping[str, Any]) -> LookupQueryInfo:
        body = ""
        if self.http_method != "GET" and self.body_template and self.body_template.strip():
            def substitute(match: "re.Match[str]") -> str:
                name = match.group(1)
                if name not in key_values:
                    raise KeyError(
                        f"Template placeholder {{{{{name}}}}} references a field "
                        "that does not exist in the lookup row"
                    )
                return self._json_fragment(key_values[name])

            body = PLACEHOLDER_RE.sub(substitute, self.body_template)

        path_params: Dict[str, str] = {}
        for placeholder, column in self.url_map.items():
            if column not in key_values:
                raise KeyError(
                    f"url_map entry {placeholder!r} -> {column!r} references a "
                    "field that does not exist in the lookup row"
                )
            path_params[placeholder] = _stringify(key_values[column])
        return LookupQueryInfo(lookup_query=body, path_params=path_params)


#: Registry, keyed by the reference's factory identifiers.
QUERY_CREATORS: Dict[str, Callable[..., Any]] = {
    "http-generic-get-query": lambda **_: generic_get_query_creator,
    "http-generic-json-query": lambda **_: generic_json_query_creator,
    "http-elasticsearch-lite": lambda **_: elasticsearch_lite_query_creator,
    "http-generic-json-url": lambda **kwargs: GenericJsonUrlQueryCreator(**kwargs),
}


def register_query_creator(identifier: str,
                           factory: Callable[..., QueryCreator]) -> None:
    """Plug-point parity with the reference's factory SPI."""
    QUERY_CREATORS[identifier] = factory


def resolve_query_creator(
    identifier: Optional[str],
    http_method: str,
    **kwargs: Any,
) -> QueryCreator:
    """Pick a creator; default depends on the method like the reference
    (GET → generic-get, POST/PUT → generic-json:
    ``HttpLookupTableSource.java:122-136``)."""
    if identifier is None:
        identifier = (
            "http-generic-get-query"
            if http_method.upper() == "GET"
            else "http-generic-json-query"
        )
    try:
        factory = QUERY_CREATORS[identifier]
    except KeyError:
        raise ValueError(
            f"Unknown query creator {identifier!r}; "
            f"registered: {sorted(QUERY_CREATORS)}"
        ) from None
    if identifier == "http-generic-json-url":
        kwargs.setdefault("http_method", http_method)
    return factory(**kwargs)

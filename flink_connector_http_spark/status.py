"""HTTP status-code policy: expression parser + response classifiers.

Behavioral parity targets (re-implemented from observed semantics, not
translated):

- code-expression grammar ``"2XX,404,!203"``: reference
  ``status/HttpCodesParser.java:42-84`` — comma-separated tokens; a token is
  a single code in [100, 599] or a group ``[1-5]XX``; ``!code`` excludes a
  single code (groups cannot be excluded); exclusions are applied after all
  inclusions.
- lookup response checker with disjoint success/temporal-error sets:
  reference ``status/HttpResponseChecker.java:28-80``.
- sink error classifier where an include-list overrides the error list and
  the default error set is 4XX+5XX: reference
  ``status/ComposeHttpStatusCodeChecker.java:41-88``.
"""

from __future__ import annotations

import re
from typing import FrozenSet, Iterable

__all__ = [
    "HttpStatusConfigError",
    "parse_http_codes",
    "HttpResponseChecker",
    "SinkErrorCodeChecker",
    "DEFAULT_SUCCESS_CODES",
    "DEFAULT_RETRY_CODES",
]


class HttpStatusConfigError(ValueError):
    """Invalid status-code configuration (reference: ConfigurationException)."""


_GROUP_RE = re.compile(r"^[1-5][xX]{2}$")
_CODE_MIN, _CODE_MAX = 100, 599


def _parse_single_code(token: str) -> int:
    try:
        code = int(token)
    except ValueError:
        raise HttpStatusConfigError(f"Can not parse code {token!r}")
    if not (_CODE_MIN <= code <= _CODE_MAX):
        raise HttpStatusConfigError(f"Http code out of the range [{code}]")
    return code


def parse_http_codes(expression: str) -> FrozenSet[int]:
    """Parse a code expression like ``"2XX, 404, !203"`` into a code set.

    Grammar parity with ``HttpCodesParser.java:42-84``:
      * tokens split on ``,``; blanks skipped
      * ``NNN`` → that code (must be within 100..599)
      * ``dXX`` (d in 1..5, case-insensitive) → the whole hundred-group
      * ``!NNN`` → exclude one code (a group after ``!`` is an error)
      * exclusions subtract from the union of all inclusions
    """
    include: set[int] = set()
    exclude: set[int] = set()
    for raw in expression.split(","):
        token = raw.strip()
        if not token:
            continue
        if token.startswith("!"):
            exclude.add(_parse_single_code(token[1:]))
        elif _GROUP_RE.match(token):
            base = int(token[0]) * 100
            include.update(range(base, base + 100))
        else:
            include.add(_parse_single_code(token))
    return frozenset(include - exclude)


#: Lookup defaults (reference ``HttpLookupConnectorOptions.java:195-209``).
DEFAULT_SUCCESS_CODES = "2XX"
DEFAULT_RETRY_CODES = "500,503,504"


class HttpResponseChecker:
    """Classifies lookup responses into success / temporal-error (retriable).

    Parity: ``status/HttpResponseChecker.java:28-80`` — success set must be
    non-empty and disjoint from the temporal-error set.
    """

    def __init__(
        self,
        success_codes: str | Iterable[int] = DEFAULT_SUCCESS_CODES,
        temporal_error_codes: str | Iterable[int] = DEFAULT_RETRY_CODES,
    ) -> None:
        self.success_codes = (
            parse_http_codes(success_codes)
            if isinstance(success_codes, str)
            else frozenset(success_codes)
        )
        self.temporal_error_codes = (
            parse_http_codes(temporal_error_codes)
            if isinstance(temporal_error_codes, str)
            else frozenset(temporal_error_codes)
        )
        if not self.success_codes:
            raise HttpStatusConfigError("Success code list cannot be empty")
        overlap = self.success_codes & self.temporal_error_codes
        if overlap:
            raise HttpStatusConfigError(
                f"Http codes {sorted(overlap)} cannot be used as both "
                "success and retry codes"
            )

    def is_successful(self, status_code: int) -> bool:
        return status_code in self.success_codes

    def is_temporal_error(self, status_code: int) -> bool:
        return status_code in self.temporal_error_codes


class SinkErrorCodeChecker:
    """Sink-side error classification with an include (allow) list override.

    Parity: ``status/ComposeHttpStatusCodeChecker.java:41-88`` —
      * ``error_codes``: comma-separated single codes or ``dXX`` whole-group
        masks; empty → default ``4XX,5XX``
      * ``exclude_codes`` (the "include list" in reference naming): single
        codes that are never errors, even if matched by ``error_codes``
    """

    def __init__(self, error_codes: str = "", exclude_codes: str = "") -> None:
        groups: set[int] = set()   # hundred-group bases, e.g. {400, 500}
        singles: set[int] = set()
        tokens = [t.strip() for t in error_codes.split(",") if t.strip()]
        if not tokens:
            groups.update((400, 500))
        for token in tokens:
            if len(token) != 3:
                raise HttpStatusConfigError(
                    f"Status code should contain three characters. Provided [{token}]"
                )
            if _GROUP_RE.match(token):
                groups.add(int(token[0]) * 100)
            else:
                singles.add(_parse_single_code(token))
        self._group_bases = frozenset(groups)
        self._singles = frozenset(singles)
        self._excluded = frozenset(
            _parse_single_code(t.strip())
            for t in exclude_codes.split(",")
            if t.strip()
        )

    def is_error(self, status_code: int) -> bool:
        if status_code < _CODE_MIN:
            raise ValueError(
                f"Provided invalid Http status code {status_code}; "
                f"status code should be equal or bigger than {_CODE_MIN}."
            )
        if status_code in self._excluded:
            return False
        return (
            status_code in self._singles
            or (status_code // 100) * 100 in self._group_bases
        )

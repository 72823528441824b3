"""Authentication helpers: header preprocessors and OIDC token management.

Parity targets:
- Basic-auth preprocessor — base64-encode an ``Authorization`` header value
  unless it already starts with ``Basic `` or raw mode is on: reference
  ``preprocessor/BasicAuthHeaderValuePreprocessor.java:64-73``,
  raw option ``table/lookup/HttpLookupConnectorOptions.java:96-100``
- OIDC bearer-token manager — POST form-urlencoded request to a token
  endpoint, cache ``access_token`` until ``expires_in`` minus an expiry
  reduction (default 1s), refresh lazily: reference
  ``auth/OidcAccessTokenManager.java:93-155``,
  ``preprocessor/OIDCAuthHeaderValuePreprocessor.java:54-65``
"""

from __future__ import annotations

import base64
import json
import threading
import time
import urllib.request
from typing import Callable, Dict, Mapping, Optional

__all__ = [
    "basic_auth_value",
    "bearer_value",
    "HeaderPreprocessor",
    "OidcAccessTokenManager",
    "preprocess_headers",
]

AUTHORIZATION = "Authorization"


def basic_auth_value(value: str, *, raw: bool = False) -> str:
    """Normalize an Authorization header value for Basic auth.

    ``"user:password"`` → ``"Basic dXNlcjpwYXNzd29yZA=="``; values already
    carrying the ``Basic `` prefix, bearer tokens, or raw mode pass through
    unchanged (reference ``BasicAuthHeaderValuePreprocessor.java:64-73``).
    """
    if raw or value.startswith("Basic ") or value.startswith("Bearer "):
        return value
    encoded = base64.b64encode(value.encode("utf-8")).decode("ascii")
    return f"Basic {encoded}"


def bearer_value(token: str) -> str:
    return token if token.startswith("Bearer ") else f"Bearer {token}"


#: A header preprocessor maps (header value) -> final header value.
HeaderPreprocessor = Callable[[str], str]


def preprocess_headers(
    headers: Mapping[str, str],
    preprocessors: Mapping[str, HeaderPreprocessor],
) -> Dict[str, str]:
    """Apply per-header-name preprocessors (reference
    ``preprocessor/ComposeHeaderPreprocessor.java:58``)."""
    return {
        name: preprocessors[name](value) if name in preprocessors else value
        for name, value in headers.items()
    }


class OidcAccessTokenManager:
    """Lazily fetches and caches an OIDC access token per process.

    One instance per executor (module-level singleton keyed by config in the
    lookup client). Thread-safe: concurrent lookup threads share one token.

    Token endpoint contract (reference ``OidcAccessTokenManager.java:93-155``
    and fixture ``auth/AuthResult.json``): POST with
    ``Content-Type: application/x-www-form-urlencoded`` body (the
    ``token_request`` option verbatim), response JSON carries
    ``access_token`` and ``expires_in`` (seconds). The cached token expires
    ``expiry_reduction`` seconds early (default 1s).
    """

    def __init__(
        self,
        token_endpoint_url: str,
        token_request: str,
        *,
        expiry_reduction: float = 1.0,
        clock: Callable[[], float] = time.monotonic,
        http_post: Optional[Callable[[str, bytes, Dict[str, str]], bytes]] = None,
    ) -> None:
        self.token_endpoint_url = token_endpoint_url
        self.token_request = token_request
        self.expiry_reduction = expiry_reduction
        self._clock = clock
        self._http_post = http_post or self._default_post
        self._lock = threading.Lock()
        self._token: Optional[str] = None
        self._expires_at: float = 0.0

    @staticmethod
    def _default_post(url: str, body: bytes, headers: Dict[str, str]) -> bytes:
        req = urllib.request.Request(url, data=body, headers=headers, method="POST")
        with urllib.request.urlopen(req, timeout=30) as resp:
            return resp.read()

    def token(self) -> str:
        with self._lock:
            now = self._clock()
            if self._token is None or now >= self._expires_at:
                body = self._http_post(
                    self.token_endpoint_url,
                    self.token_request.encode("utf-8"),
                    {"Content-Type": "application/x-www-form-urlencoded"},
                )
                payload = json.loads(body)
                self._token = payload["access_token"]
                expires_in = float(payload.get("expires_in", 0))
                self._expires_at = now + max(expires_in - self.expiry_reduction, 0.0)
            return self._token

    def authorization_preprocessor(self) -> HeaderPreprocessor:
        """Preprocessor that replaces the Authorization value with a fresh
        bearer token at request time (never at plan time — reference note
        ``RequestFactoryBase.java:71-74``)."""
        return lambda _value: bearer_value(self.token())

"""TLS / mTLS / self-signed security context for HTTP connections.

Re-expresses the reference's security wiring with Python's ``ssl`` stdlib:

- trust store from CA cert(s), client cert + private key, optional
  self-signed acceptance: ``utils/JavaNetHttpClientFactory.java:132-208``,
  ``security/SecurityContext.java:53-191``,
  ``security/SelfSignedTrustManager.java``
"""

from __future__ import annotations

import ssl
from typing import Optional

__all__ = ["build_ssl_context"]


def build_ssl_context(
    *,
    server_ca: Optional[str] = None,
    client_cert: Optional[str] = None,
    client_key: Optional[str] = None,
    allow_self_signed: bool = False,
) -> Optional[ssl.SSLContext]:
    """Build an :class:`ssl.SSLContext` for the lookup/sink HTTP client.

    Returns ``None`` when no TLS option is set (plain default handling).

    * ``server_ca`` — path to a PEM/DER CA certificate added to the trust
      store (reference ``http.security.cert.server``).
    * ``client_cert`` + ``client_key`` — mTLS client certificate and PKCS8
      private key (reference ``http.security.cert.client`` /
      ``http.security.key.client``).
    * ``allow_self_signed`` — disable verification entirely, mirroring the
      reference's wrapper trust manager that accepts self-signed chains
      (``SelfSignedTrustManager.java``; docs warn: not for production).
    """
    if not (server_ca or client_cert or client_key or allow_self_signed):
        return None

    context = ssl.create_default_context()
    if server_ca:
        context.load_verify_locations(cafile=server_ca)
    if client_cert:
        context.load_cert_chain(certfile=client_cert, keyfile=client_key)
    if allow_self_signed:
        context.check_hostname = False
        context.verify_mode = ssl.CERT_NONE
    return context

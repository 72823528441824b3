"""Authenticated-proxy transport coverage (R9: ``ProxyConfig.java``,
``JavaNetHttpClientFactory.java:74-94``).

The stub server doubles as a recording HTTP proxy: proxied requests
arrive with an absolute-URI request target and (for authenticated
proxies) a preemptive ``Proxy-Authorization`` header, both of which the
stub records.
"""

import base64

from flink_connector_http_spark import HttpLookupOptions, lookup_options_from_map
from flink_connector_http_spark.client import HttpTransport
from flink_connector_http_spark.request import HttpRequestSpec


def _spec(url):
    return HttpRequestSpec(method="GET", url=url, headers={}, body=None)


class TestProxyTransport:
    def test_requests_route_through_proxy(self, stub_server):
        stub_server.stub_json("/lookup", {"ok": True})
        transport = HttpTransport(
            timeout=10,
            proxy_host="127.0.0.1",
            proxy_port=stub_server.port,
        )
        # target host does not exist; only the proxy can serve this
        response = transport.send(_spec("http://upstream.invalid/lookup?k=1"))
        assert response.status == 200
        recorded = stub_server.recorded("/lookup")
        assert len(recorded) == 1
        assert recorded[0].query == {"k": ["1"]}
        assert "Proxy-Authorization" not in recorded[0].headers

    def test_proxy_credentials_sent_preemptively(self, stub_server):
        stub_server.stub_json("/lookup", {"ok": True})
        transport = HttpTransport(
            timeout=10,
            proxy_host="127.0.0.1",
            proxy_port=stub_server.port,
            proxy_user="alice",
            proxy_password="s3cret",
        )
        response = transport.send(_spec("http://upstream.invalid/lookup"))
        assert response.status == 200
        (req,) = stub_server.recorded("/lookup")
        expected = base64.b64encode(b"alice:s3cret").decode()
        auth = req.headers.get("Proxy-authorization") or req.headers.get(
            "Proxy-Authorization"
        )
        assert auth == f"Basic {expected}"

    def test_options_build_authenticated_proxy_transport(self, stub_server):
        stub_server.stub_json("/lookup", {"ok": True})
        opts = lookup_options_from_map({
            "http.source.lookup.proxy.host": "127.0.0.1",
            "http.source.lookup.proxy.port": str(stub_server.port),
            "http.source.lookup.proxy.username": "bob",
            "http.source.lookup.proxy.password": "pw",
        })
        assert isinstance(opts, HttpLookupOptions)
        from flink_connector_http_spark.client import HttpPollingClient

        client = HttpPollingClient(
            url="http://upstream.invalid/lookup", options=opts
        )
        result = client.pull({"k": 1})
        assert list(result.rows) == [{"ok": True}]
        (req,) = stub_server.recorded("/lookup")
        assert req.headers.get("Proxy-authorization") or req.headers.get(
            "Proxy-Authorization"
        )


def test_datasource_read_through_proxy(stub_server, spark):
    """Proxy options flow through the DataSource scan transport: the
    stub acts as the proxy, the target host does not exist."""
    import json as _json

    from flink_connector_http_spark.datasource import register_http_datasource
    from flink_connector_http_spark.testing import StubResponse

    register_http_datasource(spark)

    def respond(req):
        page = req.query.get("page", ["0"])[0]
        body = [{"id": 7, "name": "via-proxy"}] if page == "0" else []
        return StubResponse(200, _json.dumps(body).encode(),
                            {"Content-Type": "application/json"})

    stub_server.stub("/items", respond)
    df = (
        spark.read.format("http")
        .schema("id BIGINT, name STRING")
        .option("url", "http://upstream.invalid/items")
        .option("pages", 1)
        .option("proxy_host", "127.0.0.1")
        .option("proxy_port", stub_server.port)
        .load()
    )
    assert [(r.id, r.name) for r in df.collect()] == [(7, "via-proxy")]

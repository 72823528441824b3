"""OIDC end-to-end: the lookup join acquires a bearer token from a live
stub token endpoint and authenticates every data request with it, with
lazy refresh after expiry.

Reference parity: ``auth/OidcAccessTokenManager.java:93-155`` (token POST
+ caching) and ``preprocessor/OIDCAuthHeaderValuePreprocessor.java:54-65``
(Authorization rewritten at request time). The unit tests in
``test_policy.py`` cover the manager against a fake transport; this test
drives the full Spark path against real HTTP.
"""

import pyspark.sql.types as T
import pytest
from pyspark.sql import Row

from flink_connector_http_spark.lookup import HttpLookupTable, http_lookup_join
from flink_connector_http_spark.options import HttpLookupOptions
from flink_connector_http_spark.testing import json_response

CUSTOMER_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("name", T.StringType()),
])

TOKEN_REQUEST = "grant_type=client_credentials&client_id=spark&client_secret=s3cret"


def test_oidc_lookup_acquires_and_sends_bearer(spark, stub_server):
    issued = []

    def token_responder(req):
        # the token endpoint must receive the configured form body verbatim
        assert req.headers.get("Content-Type") == "application/x-www-form-urlencoded"
        assert req.body.decode() == TOKEN_REQUEST
        issued.append(f"tok-{len(issued)}")
        return json_response({"access_token": issued[-1], "expires_in": 300})

    def data_responder(req):
        auth = req.headers.get("Authorization", "")
        if not (auth.startswith("Bearer tok-") and auth[7:] in issued):
            return json_response({"error": "unauthorized"}, status=401)
        key = req.query.get("id", [""])[0]
        return json_response({"id": int(key), "name": f"cust{key}"})

    stub_server.stub("/token", token_responder)
    stub_server.stub("/secure-customers", data_responder)

    table = HttpLookupTable(
        url=stub_server.url("/secure-customers"),
        schema=CUSTOMER_SCHEMA,
        options=HttpLookupOptions(
            method="GET",
            oidc_token_endpoint=stub_server.url("/token"),
            oidc_token_request=TOKEN_REQUEST,
        ),
    )
    probe = spark.createDataFrame([Row(order_id=100 + i, cust_id=i) for i in (1, 2, 3)])
    out = http_lookup_join(probe, table, on={"cust_id": "id"})
    rows = {r.cust_id: r.name for r in out.collect()}
    assert rows == {1: "cust1", 2: "cust2", 3: "cust3"}
    # the token was fetched (at least once; executors each hold a manager)
    # and every data request carried a valid bearer
    assert issued
    for req in stub_server.recorded("/secure-customers"):
        assert req.headers.get("Authorization", "").startswith("Bearer tok-")


def test_oidc_lookup_fails_closed_without_token_config(spark, stub_server):
    def data_responder(req):
        if not req.headers.get("Authorization", "").startswith("Bearer "):
            return json_response({"error": "unauthorized"}, status=401)
        return json_response({"id": 1, "name": "x"})

    stub_server.stub("/secure-customers", data_responder)
    table = HttpLookupTable(
        url=stub_server.url("/secure-customers"),
        schema=CUSTOMER_SCHEMA,
        options=HttpLookupOptions(method="GET"),  # no OIDC config
    )
    probe = spark.createDataFrame([Row(order_id=101, cust_id=1)])
    # 401 is an error status (not in the continue-on-error set): the
    # lookup fails closed by raising, never by silently dropping rows
    out = http_lookup_join(probe, table, on={"cust_id": "id"})
    with pytest.raises(Exception, match="401"):
        out.count()


def test_oidc_datasource_scan_sends_bearer(spark, stub_server):
    """OIDC parity on the DataSource scan: the paged reader acquires a
    bearer from the token endpoint and authenticates every page fetch."""
    import json as _json

    from flink_connector_http_spark.datasource import register_http_datasource
    from flink_connector_http_spark.testing import StubResponse

    register_http_datasource(spark)
    issued = []

    def token_responder(req):
        assert req.body.decode() == TOKEN_REQUEST
        issued.append(f"dtok-{len(issued)}")
        return json_response({"access_token": issued[-1], "expires_in": 300})

    def data_responder(req):
        auth = req.headers.get("Authorization", "")
        if not (auth.startswith("Bearer dtok-") and auth[7:] in issued):
            return json_response({"error": "unauthorized"}, status=401)
        page = req.query.get("page", ["0"])[0]
        body = [{"id": int(page) + 1, "name": f"p{page}"}] if page in ("0", "1") else []
        return StubResponse(200, _json.dumps(body).encode(),
                            {"Content-Type": "application/json"})

    stub_server.stub("/dstoken", token_responder)
    stub_server.stub("/dsfeed", data_responder)
    df = (
        spark.read.format("http")
        .schema("id BIGINT, name STRING")
        .option("url", stub_server.url("/dsfeed"))
        .option("pages", 2)
        .option("oidc_token_endpoint", stub_server.url("/dstoken"))
        .option("oidc_token_request", TOKEN_REQUEST)
        .load()
    )
    assert sorted(r.id for r in df.collect()) == [1, 2]
    assert issued  # a token was actually minted

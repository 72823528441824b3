"""FastHttpStub multi-process mode (round-5): SO_REUSEPORT fork workers
must serve identical precomputed data on one shared port, and stop() must
reap the children — the mode exists so the *bench harness* can sustain the
per-key lookup fan-out without the single GIL-bound event loop becoming
the measured bottleneck (round-4 scale curve: 19.6x at 10x data was stub
saturation, not operator behavior).
"""

import http.client
import time

from flink_connector_http_spark.testing import FastHttpStub, response_bytes


def _get(port: int, path: str) -> bytes:
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=5)
    try:
        conn.request("GET", path)
        resp = conn.getresponse()
        assert resp.status == 200
        return resp.read()
    finally:
        conn.close()


def test_multiproc_stub_serves_identically_and_reaps_children():
    stub = FastHttpStub()
    table = {
        str(i): response_bytes(f'{{"k": {i}}}'.encode()) for i in range(50)
    }
    stub.route_static("/data", table, "k")
    stub.start(workers=3)
    try:
        assert len(stub._children) == 2
        assert all(p.is_alive() for p in stub._children)
        # fresh connection per request: the kernel spreads the accepts
        # across the reuseport group, so over 100 requests every worker
        # serves some — identical answers prove shared route state
        for i in range(100):
            body = _get(stub.port, f"/data?k={i % 50}")
            assert body == f'{{"k": {i % 50}}}'.encode()
    finally:
        children = list(stub._children)
        stub.stop()
    deadline = time.time() + 5
    while time.time() < deadline and any(p.is_alive() for p in children):
        time.sleep(0.05)
    assert not any(p.is_alive() for p in children)


def test_single_worker_default_forks_nothing():
    stub = FastHttpStub()
    stub.route_static("/one", {"1": response_bytes(b"{}")}, "k")
    stub.start()
    try:
        assert stub._children == []
        assert _get(stub.port, "/one?k=1") == b"{}"
    finally:
        stub.stop()

"""Serving daemon: health, labels, classify, error handling, concurrency."""

import json
import threading
import urllib.request

import jax
import numpy as np
import pytest

from roomnet_tpu.infer.classify import RoomNetClassifier
from roomnet_tpu.infer.server import ClassifierServer
from roomnet_tpu.models.roomnet import init_variables
from tests.tiny import TINY

cv2 = pytest.importorskip("cv2")

LABELS4 = ["A", "B", "C", "D"]


@pytest.fixture(scope="module")
def server():
    clf = RoomNetClassifier(
        init_variables(jax.random.PRNGKey(0), TINY), TINY,
        batch_size=4, class_labels=LABELS4,
    )
    # max_inflight=64: the burst test below pins the socket-backlog
    # regression, which needs all 64 admitted (backpressure shedding has
    # its own dedicated tests with a small cap).
    srv = ClassifierServer(clf, port=0, max_inflight=64).start()
    yield srv
    srv.stop()


def _url(server, path):
    return f"http://127.0.0.1:{server.port}{path}"


def _post(server, path, body: bytes):
    req = urllib.request.Request(_url(server, path), data=body, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=30) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _img_bytes(seed=0):
    rng = np.random.RandomState(seed)
    im = rng.randint(0, 255, (60, 80, 3), np.uint8)
    ok, buf = cv2.imencode(".png", im)
    assert ok
    return buf.tobytes()


def test_health_and_labels(server):
    with urllib.request.urlopen(_url(server, "/healthz"), timeout=10) as r:
        assert r.status == 200
    with urllib.request.urlopen(_url(server, "/labels"), timeout=10) as r:
        assert json.loads(r.read()) == LABELS4


def test_readyz_follows_worker_state():
    """/readyz is the traffic gate: 200 while the device worker is alive,
    503 once the server starts draining (k8s readiness semantics; the
    liveness /healthz keeps answering 200 either way)."""
    clf = RoomNetClassifier(
        init_variables(jax.random.PRNGKey(0), TINY), TINY,
        batch_size=4, class_labels=LABELS4,
    )
    srv = ClassifierServer(clf, port=0, warmup=False).start()
    try:
        with urllib.request.urlopen(_url(srv, "/readyz"), timeout=10) as r:
            assert r.status == 200 and json.loads(r.read())["status"] == "ready"
        srv._stop.set()  # draining: worker exits, HTTP still up
        import time

        deadline = time.monotonic() + 5
        while time.monotonic() < deadline:
            try:
                urllib.request.urlopen(_url(srv, "/readyz"), timeout=10)
            except urllib.error.HTTPError as e:
                assert e.code == 503
                assert json.loads(e.read())["stopping"] is True
                break
            time.sleep(0.05)
        else:
            raise AssertionError("/readyz never flipped to 503")
    finally:
        srv.stop()


def test_classify_roundtrip(server):
    status, out = _post(server, "/classify", _img_bytes())
    assert status == 200
    assert out["label"] in LABELS4
    assert 0 < out["confidence"] <= 1
    assert len(out["probs"]) == 4 and abs(sum(out["probs"]) - 1) < 1e-4
    # deterministic: same image -> same answer
    status2, out2 = _post(server, "/classify", _img_bytes())
    assert out2 == out


def test_classify_bad_payload(server):
    status, out = _post(server, "/classify", b"this is not an image")
    assert status == 400 and "error" in out


def test_oversized_body_rejected_413_before_read():
    """The Content-Length gate runs before any body read: a post past
    max_body_bytes must come back 413 on both endpoints, not be buffered."""
    clf = RoomNetClassifier(
        init_variables(jax.random.PRNGKey(0), TINY), TINY,
        batch_size=4, class_labels=LABELS4,
    )
    srv = ClassifierServer(clf, port=0, warmup=False, max_body_bytes=1024).start()
    try:
        big = _img_bytes()  # a real PNG, just larger than the 1 KiB cap
        assert len(big) > 1024
        status, out = _post(srv, "/classify", big)
        assert status == 413 and "too large" in out["error"]
        payload = json.dumps(
            {"images": [__import__("base64").b64encode(big).decode()]}
        ).encode()
        status, out = _post(srv, "/classify_batch", payload)
        assert status == 413 and "too large" in out["error"]
        # a within-cap request still works afterwards
        import numpy as _np

        small = cv2.imencode(
            ".jpg", _np.zeros((16, 16, 3), _np.uint8),
            [cv2.IMWRITE_JPEG_QUALITY, 50],
        )[1].tobytes()
        assert len(small) <= 1024
        status, out = _post(srv, "/classify", small)
        assert status == 200 and out["label"] in LABELS4
    finally:
        srv.stop()


def test_keepalive_connection_reuse(server):
    """HTTP/1.1 keep-alive: many requests over ONE TCP connection — the
    socket must survive a GET, a classify POST, and a drained-body POST
    to an unknown route, with correct framing throughout."""
    import http.client

    conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=30)
    try:
        conn.request("GET", "/healthz")
        r = conn.getresponse()
        assert r.status == 200 and json.loads(r.read())["status"] == "ok"
        assert r.version == 11
        img = _img_bytes()
        for _ in range(2):
            conn.request("POST", "/classify", body=img)
            r = conn.getresponse()
            assert r.status == 200
            assert json.loads(r.read())["label"] in LABELS4
        # unknown POST route with a small body: drained, connection lives
        conn.request("POST", "/nope", body=b"x" * 100)
        r = conn.getresponse()
        assert r.status == 404
        r.read()
        conn.request("GET", "/labels")
        r = conn.getresponse()
        assert r.status == 200 and json.loads(r.read()) == LABELS4
    finally:
        conn.close()


def test_keepalive_socket_options(server):
    """The handler must run TCP_NODELAY with a buffered wfile: the stdlib
    defaults (Nagle + unbuffered two-write responses) add a ~40 ms
    delayed-ACK stall to every response on a reused connection (measured
    on-chip: keep-alive p50 96 ms vs 48 ms per-connection).

    Server-side enforcement is pinned SOLELY by the class attributes:
    `disable_nagle_algorithm` is honored by the stdlib
    StreamRequestHandler.setup() (it sets TCP_NODELAY on every accepted
    socket) and `wbufsize` by its makefile() call. A client socket cannot
    observe the server side's option, so there is nothing more a live
    connection could verify (round-4 advisor finding)."""
    handler = server._httpd.RequestHandlerClass
    assert handler.disable_nagle_algorithm is True
    assert handler.wbufsize > 0


def test_idle_keepalive_connection_reaped(tmp_path):
    """A keep-alive connection quiet past idle_connection_s is closed by
    the server (it would otherwise pin a ThreadingHTTPServer thread
    forever); an ACTIVE connection is not affected."""
    import socket
    import time

    clf = RoomNetClassifier(
        init_variables(jax.random.PRNGKey(0), TINY), TINY,
        batch_size=4, class_labels=LABELS4,
    )
    srv = ClassifierServer(clf, port=0, warmup=False,
                           idle_connection_s=1.0).start()
    try:
        s = socket.create_connection(("127.0.0.1", srv.port), timeout=10)
        s.sendall(b"GET /healthz HTTP/1.1\r\nHost: x\r\n\r\n")
        # drain response #1 COMPLETELY (headers + body) — leftover bytes
        # would masquerade as a reply to the post-idle request below
        first = b""
        s.settimeout(2)
        while b'{"status": "ok"}' not in first:
            first += s.recv(4096)
        assert b"200" in first
        time.sleep(2.0)  # > idle_connection_s with no traffic
        # server closed its side: the next read yields EOF (or a reset)
        s.settimeout(5)
        try:
            s.sendall(b"GET /healthz HTTP/1.1\r\nHost: x\r\n\r\n")
            data = s.recv(4096)
        except (ConnectionResetError, BrokenPipeError):
            data = b""
        assert data == b"", f"expected reaped connection, got {data[:60]!r}"
        s.close()
    finally:
        srv.stop()


def test_oversized_and_chunked_close_the_connection():
    """Paths that can't consume the body must not poison keep-alive: 413
    and 411 answer with Connection: close; the unread bytes die with the
    socket instead of being misparsed as the next request."""
    import http.client

    clf = RoomNetClassifier(
        init_variables(jax.random.PRNGKey(0), TINY), TINY,
        batch_size=4, class_labels=LABELS4,
    )
    srv = ClassifierServer(clf, port=0, warmup=False, max_body_bytes=1024).start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=30)
        conn.request("POST", "/classify", body=b"z" * 4096)
        r = conn.getresponse()
        assert r.status == 413
        assert r.headers.get("Connection", "").lower() == "close"
        r.read()
        conn.close()
        conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=30)
        conn.putrequest("POST", "/classify")
        conn.putheader("Transfer-Encoding", "chunked")
        conn.endheaders()
        # don't bother sending chunks; the 411 is answered from headers
        r = conn.getresponse()
        assert r.status == 411
        assert r.headers.get("Connection", "").lower() == "close"
        conn.close()
    finally:
        srv.stop()


def test_unknown_route(server):
    status, _ = _post(server, "/nope", b"")
    assert status == 404


def test_concurrent_requests_microbatch(server):
    results = {}

    def hit(i):
        results[i] = _post(server, "/classify", _img_bytes(seed=i))

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(results) == 8
    assert all(status == 200 for status, _ in results.values())


def test_metrics_endpoint(server):
    _post(server, "/classify", _img_bytes())  # ensure at least one span
    with urllib.request.urlopen(_url(server, "/metrics"), timeout=10) as r:
        metrics = json.loads(r.read())
    assert "serve/request" in metrics
    assert "serve/device_call" in metrics
    assert metrics["serve/device_call"]["count"] >= 1
    assert metrics["serve/request"]["mean_ms"] > 0


def test_metrics_report_measured_shipped_bytes(server):
    """Every device call records the ACTUAL bytes it shipped (bucket
    padding included) under serve/device_call_bytes — the bench computes
    its transfer-bound % from this measurement instead of assuming
    worst-case full buckets (round-4 review weak #3). A lone request
    rides the smallest bucket, so the per-call delta must be exactly
    min_bucket * side^2 * 3 bytes."""
    def stats():
        with urllib.request.urlopen(_url(server, "/metrics"), timeout=10) as r:
            m = json.loads(r.read())
        return (m.get("serve/device_call", {}).get("count", 0),
                m.get("serve/device_call_bytes", {}).get("total", 0))

    calls0, bytes0 = stats()
    status, _ = _post(server, "/classify", _img_bytes())
    assert status == 200
    calls1, bytes1 = stats()
    n_calls = calls1 - calls0
    assert n_calls >= 1
    side = server.classifier.cfg.im_side
    min_bucket = server._bucket_sizes[0]
    assert bytes1 - bytes0 == n_calls * min_bucket * side * side * 3


def test_max_batch_larger_than_device_batch_is_clamped():
    """Regression: max_batch > classifier.batch_size used to overflow the
    device batch buffer, IndexError the worker thread, and time out every
    later request."""
    clf = RoomNetClassifier(
        init_variables(jax.random.PRNGKey(1), TINY), TINY,
        batch_size=2, class_labels=LABELS4,
    )
    srv = ClassifierServer(clf, port=0, max_batch=16).start()
    try:
        assert srv.max_batch == 2
        results = {}

        def hit(i):
            results[i] = _post(srv, "/classify", _img_bytes(seed=i))

        # Load test: more concurrent posts than the device batch holds.
        threads = [threading.Thread(target=hit, args=(i,)) for i in range(7)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert len(results) == 7
        assert all(status == 200 for status, _ in results.values())
    finally:
        srv.stop()


def test_burst_of_64_concurrent_requests_all_succeed(server):
    """Regression: the stock ThreadingHTTPServer listen backlog (5) refused
    connections under burst load before any handler ran."""
    results = {}

    def hit(i):
        try:
            results[i] = _post(server, "/classify", _img_bytes(seed=i % 4))
        except Exception as e:  # connection refused/reset
            results[i] = ("EXC", repr(e))

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(64)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    failures = {i: r for i, r in results.items() if r[0] != 200}
    assert not failures, f"{len(failures)} failed: {list(failures.values())[:3]}"


def test_device_failure_returns_503_and_recovers():
    """A failing device call must surface as a 5xx (retryable server error,
    not 400 caller error) and must not kill the worker."""
    clf = RoomNetClassifier(
        init_variables(jax.random.PRNGKey(3), TINY), TINY,
        batch_size=2, class_labels=LABELS4,
    )
    real = clf._predict
    calls = {"n": 0}

    def flaky(variables, batch):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("simulated device session failure")
        return real(variables, batch)

    clf._predict = flaky
    srv = ClassifierServer(clf, port=0).start()
    try:
        status, out = _post(srv, "/classify", _img_bytes())
        assert status == 503 and "error" in out
        status2, out2 = _post(srv, "/classify", _img_bytes())
        assert status2 == 200 and out2["label"] in LABELS4  # recovered
    finally:
        srv.stop()


def test_classify_batch_one_device_call(server):
    """POST /classify_batch: N images ride one request and (N <= max_batch)
    ONE device call; undecodable rows get per-row errors, not request
    failure."""
    import base64
    import urllib.request

    with urllib.request.urlopen(_url(server, "/metrics"), timeout=10) as r:
        before = json.loads(r.read()).get("serve/device_call", {}).get("count", 0)
    payload = json.dumps({
        "images": [
            base64.b64encode(_img_bytes(seed=1)).decode(),
            base64.b64encode(b"junk not an image").decode(),
            base64.b64encode(_img_bytes(seed=2)).decode(),
        ]
    }).encode()
    status, out = _post(server, "/classify_batch", payload)
    assert status == 200
    rs = out["results"]
    assert len(rs) == 3
    assert rs[0]["label"] in LABELS4 and rs[2]["label"] in LABELS4
    assert rs[1] == {"error": "undecodable image"}
    with urllib.request.urlopen(_url(server, "/metrics"), timeout=10) as r:
        after = json.loads(r.read())["serve/device_call"]["count"]
    assert after == before + 1  # 3 images <= max_batch 4: exactly one call


def test_classify_batch_bad_payload(server):
    status, out = _post(server, "/classify_batch", b"{not json")
    assert status == 400 and "error" in out
    status, out = _post(
        server, "/classify_batch", json.dumps({"images": []}).encode()
    )
    assert status == 200 and out["results"] == []
    too_many = json.dumps(
        {"images": [base64_of_img()] * (server.max_inflight + 1)}
    ).encode()
    status, out = _post(server, "/classify_batch", too_many)
    assert status == 413


def base64_of_img():
    import base64

    return base64.b64encode(_img_bytes()).decode()


def test_sustained_overload_sheds_fast_with_429():
    """2x capacity sustained: the server must shed with FAST 429s
    (Retry-After) and keep accepted-request latency bounded — no 30 s
    timeout pile-up (round-2 review item #5)."""
    import time

    clf = RoomNetClassifier(
        init_variables(jax.random.PRNGKey(5), TINY), TINY,
        batch_size=2, class_labels=LABELS4,
    )
    real = clf._predict
    real(clf.variables, np.zeros((2, TINY.im_side, TINY.im_side, 3), np.uint8))

    def slow(variables, batch):  # ~20 img/s device capacity
        time.sleep(0.1)
        return real(variables, batch)

    clf._predict = slow
    srv = ClassifierServer(clf, port=0, max_inflight=4,
                           request_timeout_s=10.0).start()
    statuses, latencies, errors = [], [], []
    lock = threading.Lock()
    stop_at = time.monotonic() + 8.0
    body = _img_bytes()

    def client():
        while time.monotonic() < stop_at:
            t0 = time.monotonic()
            try:
                status, _ = _post(srv, "/classify", body)
            except Exception as e:
                with lock:
                    errors.append(repr(e))
                continue
            with lock:
                statuses.append(status)
                latencies.append(time.monotonic() - t0)

    try:
        # 4 closed-loop clients against ~20 img/s with max_inflight 4 ->
        # sustained 2x+ offered load once 429s return instantly.
        threads = [threading.Thread(target=client) for _ in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    finally:
        srv.stop()
    assert not errors, errors[:3]
    counts = {s: statuses.count(s) for s in set(statuses)}
    assert set(counts) <= {200, 429}, counts  # designed shedding, no 5xx/504
    assert counts.get(200, 0) > 0 and counts.get(429, 0) > 0, counts
    # bounded latency: nothing waited anywhere near the timeout
    assert max(latencies) < 5.0, max(latencies)


def test_device_calls_use_bucketed_batch_shapes():
    """A lone request must NOT ship a full-batch pad through the
    host->device link: device-call batch = next power of 2 >= coalesced
    rows (150 KB instead of 1.2 MB at batch 8 for a single image)."""
    clf = RoomNetClassifier(
        init_variables(jax.random.PRNGKey(7), TINY), TINY,
        batch_size=8, class_labels=LABELS4,
    )
    real = clf._predict
    shapes = []

    def spy(variables, batch):
        shapes.append(batch.shape[0])
        return real(variables, batch)

    clf._predict = spy
    srv = ClassifierServer(clf, port=0).start()
    try:
        status, _ = _post(srv, "/classify", _img_bytes())
        assert status == 200
        assert shapes[-1] == 1, shapes
        import base64

        payload = json.dumps({
            "images": [base64.b64encode(_img_bytes(seed=s)).decode()
                       for s in range(3)]
        }).encode()
        status, _ = _post(srv, "/classify_batch", payload)
        assert status == 200
        assert shapes[-1] == 4, shapes  # 3 rows -> bucket 4, not pad-to-8
    finally:
        srv.stop()


def test_abandoned_jobs_never_reach_the_device():
    """A request that already timed out (client got 504) must not consume
    a device call when the worker finally drains the queue — zombie work
    would starve freshly admitted requests (round-3 review)."""
    import time

    clf = RoomNetClassifier(
        init_variables(jax.random.PRNGKey(9), TINY), TINY,
        batch_size=1, class_labels=LABELS4,
    )
    real = clf._predict
    real(clf.variables, np.zeros((1, TINY.im_side, TINY.im_side, 3), np.uint8))
    calls = []

    def slow(variables, batch):
        calls.append(batch.shape[0])
        time.sleep(1.2)
        return real(variables, batch)

    clf._predict = slow
    # batch_size=1: jobs queue behind the in-flight call one at a time
    srv = ClassifierServer(clf, port=0, request_timeout_s=0.3).start()
    try:
        statuses = []
        lock = threading.Lock()

        def hit():
            s, _ = _post(srv, "/classify", _img_bytes())
            with lock:
                statuses.append(s)

        threads = [threading.Thread(target=hit) for _ in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert statuses == [504, 504, 504, 504], statuses
        time.sleep(3.0)  # let the worker drain whatever it will
        # Only jobs already in flight when their clients timed out may have
        # reached the device; the queued ones must have been dropped.
        assert len(calls) <= 2, calls
    finally:
        srv.stop()


def _post_with_headers(server, path, body: bytes, headers: dict):
    req = urllib.request.Request(
        _url(server, path), data=body, method="POST", headers=headers
    )
    try:
        with urllib.request.urlopen(req, timeout=30) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_budget_expires_mid_queue(server=None):
    """Per-request timeout budget (X-Timeout-Seconds): the deadline is
    stamped at admission, so a job stuck BEHIND a slow device call 504s
    within ~its budget of arrival — not budget-seconds after it finally
    reached the queue front — and the worker never spends a device call
    on it (round-3 review item #9)."""
    import time

    clf = RoomNetClassifier(
        init_variables(jax.random.PRNGKey(13), TINY), TINY,
        batch_size=1, class_labels=LABELS4,
    )
    real = clf._predict
    real(clf.variables, np.zeros((1, TINY.im_side, TINY.im_side, 3), np.uint8))
    calls = []

    def slow(variables, batch):
        calls.append(batch.shape[0])
        time.sleep(1.0)
        return real(variables, batch)

    clf._predict = slow
    # Server cap is generous (10 s): the FLAT-timeout bug would hold the
    # queued request ~10 s; budget propagation answers it at ~0.4 s.
    srv = ClassifierServer(clf, port=0, request_timeout_s=10.0).start()
    try:
        out = {}

        def first():
            out["first"] = _post(srv, "/classify", _img_bytes())

        t1 = threading.Thread(target=first)
        t1.start()
        time.sleep(0.3)  # first request is now on the device (1.0 s call)
        t0 = time.monotonic()
        status, body = _post_with_headers(
            srv, "/classify", _img_bytes(seed=1), {"X-Timeout-Seconds": "0.4"}
        )
        waited = time.monotonic() - t0
        t1.join()
        assert status == 504, (status, body)
        assert waited < 2.0, waited  # ~0.4 s budget, NOT the 10 s flat cap
        assert out["first"][0] == 200
        time.sleep(1.5)  # drain window
        # the expired job must never have reached the device
        assert len(calls) == 1, calls
    finally:
        srv.stop()


def test_budget_header_clamped_to_server_cap():
    """A client may ask for LESS time than request_timeout_s, never more:
    X-Timeout-Seconds above the cap behaves like the cap (the request
    still completes normally when the device is fast)."""
    clf = RoomNetClassifier(
        init_variables(jax.random.PRNGKey(15), TINY), TINY,
        batch_size=2, class_labels=LABELS4,
    )
    srv = ClassifierServer(clf, port=0, request_timeout_s=10.0).start()
    try:
        status, out = _post_with_headers(
            srv, "/classify", _img_bytes(), {"X-Timeout-Seconds": "9999"}
        )
        assert status == 200 and out["label"] in LABELS4
        # garbage header: ignored, server default applies
        status, out = _post_with_headers(
            srv, "/classify", _img_bytes(), {"X-Timeout-Seconds": "nonsense"}
        )
        assert status == 200 and out["label"] in LABELS4
    finally:
        srv.stop()


def test_classify_batch_stream_ndjson(server):
    """POST /classify_batch?stream=1: one NDJSON line per image, in input
    order, matching the non-streaming endpoint's results; undecodable
    rows get per-line errors."""
    import base64

    payload = json.dumps({
        "images": [
            base64.b64encode(_img_bytes(seed=1)).decode(),
            base64.b64encode(b"junk not an image").decode(),
            base64.b64encode(_img_bytes(seed=2)).decode(),
        ]
    }).encode()
    req = urllib.request.Request(
        _url(server, "/classify_batch?stream=1"), data=payload, method="POST"
    )
    with urllib.request.urlopen(req, timeout=30) as r:
        assert r.status == 200
        assert r.headers["Content-Type"] == "application/x-ndjson"
        lines = [json.loads(l) for l in r.read().splitlines()]
    assert [l["index"] for l in lines] == [0, 1, 2]
    assert lines[0]["label"] in LABELS4 and lines[2]["label"] in LABELS4
    assert lines[1]["error"] == "undecodable image"
    # parity with the blocking endpoint
    status, out = _post(server, "/classify_batch", payload)
    assert status == 200
    assert out["results"][0]["label"] == lines[0]["label"]
    assert out["results"][2]["probs"] == lines[2]["probs"]


def test_classify_batch_stream_first_results_early():
    """The streaming claim: with a slow device, the FIRST chunk's lines
    arrive after one device call while later chunks are still queued —
    not after the whole batch."""
    import base64
    import http.client
    import time

    clf = RoomNetClassifier(
        init_variables(jax.random.PRNGKey(17), TINY), TINY,
        batch_size=2, class_labels=LABELS4,
    )
    real = clf._predict
    real(clf.variables, np.zeros((2, TINY.im_side, TINY.im_side, 3), np.uint8))

    # Async-faithful slow device: dispatch returns immediately (like jax),
    # the 0.5 s cost lands at RESULT FETCH (np.asarray) — matching how a
    # remote device behaves under the pipelined worker.
    class SlowFetch:
        def __init__(self, val):
            self.val = np.asarray(val)

        def __array__(self, dtype=None, copy=None):
            time.sleep(0.5)
            return self.val if dtype is None else self.val.astype(dtype)

    def slow(variables, batch):
        ids, probs = real(variables, batch)
        return SlowFetch(ids), probs

    clf._predict = slow
    srv = ClassifierServer(clf, port=0, max_inflight=64).start()
    try:
        payload = json.dumps({
            "images": [base64.b64encode(_img_bytes(seed=s)).decode()
                       for s in range(6)]  # 3 chunks of 2
        }).encode()
        conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=30)
        t0 = time.monotonic()
        conn.request("POST", "/classify_batch?stream=1", body=payload)
        resp = conn.getresponse()
        first_line = resp.fp.readline()
        t_first = time.monotonic() - t0
        rest = resp.read()
        t_all = time.monotonic() - t0
        conn.close()
        assert json.loads(first_line)["index"] == 0
        assert len(rest.splitlines()) == 5
        # 3 sequential 0.5 s device calls: full stream takes >= ~1.5 s,
        # the first line must NOT wait for them all.
        assert t_all >= 1.2, t_all
        assert t_first <= t_all - 0.7, (t_first, t_all)
    finally:
        srv.stop()


def test_classify_batch_stream_device_error_mid_stream():
    """A device failure on a later chunk must surface as per-line errors
    for THAT chunk only — earlier chunks' results already streamed."""
    import base64
    import time

    clf = RoomNetClassifier(
        init_variables(jax.random.PRNGKey(21), TINY), TINY,
        batch_size=2, class_labels=LABELS4,
    )
    real = clf._predict
    real(clf.variables, np.zeros((2, TINY.im_side, TINY.im_side, 3), np.uint8))
    calls = {"n": 0}

    def flaky(variables, batch):
        calls["n"] += 1
        if calls["n"] == 2:  # second chunk's device call fails
            raise RuntimeError("simulated device failure")
        return real(variables, batch)

    clf._predict = flaky
    srv = ClassifierServer(clf, port=0, max_inflight=64).start()
    try:
        payload = json.dumps({
            "images": [base64.b64encode(_img_bytes(seed=s)).decode()
                       for s in range(4)]  # 2 chunks of 2
        }).encode()
        req = urllib.request.Request(
            _url(srv, "/classify_batch?stream=1"), data=payload, method="POST"
        )
        with urllib.request.urlopen(req, timeout=30) as r:
            lines = [json.loads(l) for l in r.read().splitlines()]
        assert len(lines) == 4
        assert lines[0]["label"] in LABELS4 and lines[1]["label"] in LABELS4
        assert "error" in lines[2] and "error" in lines[3]
        assert "device_error" in lines[2]["error"]
        # the worker survived: a fresh request succeeds
        status, out = _post(srv, "/classify", _img_bytes())
        assert status == 200 and out["label"] in LABELS4
    finally:
        srv.stop()


def test_reference_client_against_live_server(tmp_path):
    """tools/classify_client.py is the documented way to consume the API:
    batch + streaming paths against a live daemon must agree, survive an
    undecodable file per-row, and reuse one keep-alive connection."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from tools.classify_client import Client, classify_paths

    clf = RoomNetClassifier(
        init_variables(jax.random.PRNGKey(0), TINY), TINY,
        batch_size=4, class_labels=LABELS4,
    )
    srv = ClassifierServer(clf, port=0, warmup=False).start()
    try:
        d = tmp_path / "imgs"
        d.mkdir()
        paths = []
        for i in range(5):
            p = str(d / f"im_{i}.png")
            with open(p, "wb") as f:
                f.write(_img_bytes(seed=i))
            paths.append(p)
        bad = str(d / "corrupt.jpg")
        with open(bad, "w") as f:
            f.write("not an image")
        paths.append(bad)
        url = f"http://127.0.0.1:{srv.port}"
        plain = classify_paths(url, paths, batch=4)
        streamed = classify_paths(url, paths, stream=True, batch=4)
        assert set(plain) == set(streamed) == set(paths)
        for p in paths[:-1]:
            assert plain[p]["label"] in LABELS4
            assert streamed[p]["label"] == plain[p]["label"]
        assert "error" in plain[bad] and "error" in streamed[bad]
        # single-image API + keep-alive reuse across calls
        cl = Client(url)
        try:
            r1 = cl.classify_bytes(open(paths[0], "rb").read())
            r2 = cl.classify_bytes(open(paths[1], "rb").read())
            assert r1["label"] == plain[paths[0]]["label"]
            assert r2["label"] == plain[paths[1]]["label"]
        finally:
            cl.close()
    finally:
        srv.stop()


def test_reference_client_budget_propagates_as_504(tmp_path):
    """Client(budget_s=...) sends X-Timeout-Seconds: against a device too
    slow for the budget the server answers a clean 504 within ~budget_s of
    admission, which the client surfaces as RuntimeError — not a socket
    timeout mid-response."""
    import os
    import sys
    import time

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from tools.classify_client import Client

    clf = RoomNetClassifier(
        init_variables(jax.random.PRNGKey(0), TINY), TINY,
        batch_size=2, class_labels=LABELS4,
    )
    real = clf._predict
    real(clf.variables, np.zeros((2, TINY.im_side, TINY.im_side, 3), np.uint8))

    def slow(variables, batch):
        time.sleep(1.5)
        return real(variables, batch)

    clf._predict = slow
    srv = ClassifierServer(clf, port=0, request_timeout_s=30.0).start()
    cl = Client(f"http://127.0.0.1:{srv.port}", budget_s=0.3)
    try:
        t0 = time.monotonic()
        with pytest.raises(RuntimeError, match="504"):
            cl.classify_bytes(_img_bytes())
        assert time.monotonic() - t0 < 5.0  # budget, not the 30 s server cap
    finally:
        cl.close()
        srv.stop()


def test_access_log_records_every_answered_request(tmp_path):
    """--access-log: one JSON line per answered request with method, path
    (query stripped), status, and a sane latency — across 200/400/404."""
    clf = RoomNetClassifier(
        init_variables(jax.random.PRNGKey(0), TINY), TINY,
        batch_size=4, class_labels=LABELS4,
    )
    log_path = str(tmp_path / "access.jsonl")
    srv = ClassifierServer(clf, port=0, warmup=False,
                           access_log=log_path).start()
    try:
        assert _post(srv, "/classify", _img_bytes())[0] == 200
        assert _post(srv, "/classify", b"junk")[0] == 400
        assert _post(srv, "/nope", b"")[0] == 404
        with urllib.request.urlopen(_url(srv, "/healthz"), timeout=10) as r:
            assert r.status == 200
    finally:
        srv.stop()
    with open(log_path) as f:
        recs = [json.loads(l) for l in f]
    by_path = {(r["method"], r["path"], r["status"]) for r in recs}
    assert ("POST", "/classify", 200) in by_path
    assert ("POST", "/classify", 400) in by_path
    assert ("POST", "/nope", 404) in by_path
    assert ("GET", "/healthz", 200) in by_path
    assert all(r["kind"] == "request" for r in recs)
    assert all(r["ms"] is None or 0 <= r["ms"] < 60_000 for r in recs)


def test_access_log_failure_never_breaks_serving(tmp_path):
    """log_request runs before the status line is written — an unwritable
    access-log path must disable logging with a warning, not turn every
    request into a connection reset."""
    clf = RoomNetClassifier(
        init_variables(jax.random.PRNGKey(0), TINY), TINY,
        batch_size=4, class_labels=LABELS4,
    )
    srv = ClassifierServer(
        clf, port=0, warmup=False,
        access_log=str(tmp_path / "no_such_dir" / "access.jsonl"),
    ).start()
    try:
        st, out = _post(srv, "/classify", _img_bytes())
        assert st == 200 and out["label"] in LABELS4
        assert srv._access_log.path is None  # disabled after first failure
        st, _ = _post(srv, "/classify", _img_bytes())
        assert st == 200
    finally:
        srv.stop()


def test_malformed_content_length_answers_400(server):
    import http.client

    conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=30)
    try:
        conn.putrequest("POST", "/classify")
        conn.putheader("Content-Length", "not-a-number")
        conn.endheaders()
        r = conn.getresponse()
        assert r.status == 400
        assert r.headers.get("Connection", "").lower() == "close"
    finally:
        conn.close()


def test_serve_forever_sigterm_clean_shutdown():
    """SIGTERM (systemd/k8s stop) must unwind serve_forever through the
    same clean stop() as Ctrl-C — process-level kill mid-handler would
    reset client connections instead of failing queued work fast."""
    import os
    import signal
    import threading
    import time

    clf = RoomNetClassifier(
        init_variables(jax.random.PRNGKey(0), TINY), TINY,
        batch_size=2, class_labels=LABELS4,
    )
    srv = ClassifierServer(clf, port=0, warmup=False)
    prev = signal.getsignal(signal.SIGTERM)
    threading.Timer(0.5, lambda: os.kill(os.getpid(), signal.SIGTERM)).start()
    t0 = time.monotonic()
    srv.serve_forever()  # blocks the main thread until the signal
    assert time.monotonic() - t0 < 10
    assert srv._stop.is_set()
    # the previous SIGTERM disposition is restored on the way out
    assert signal.getsignal(signal.SIGTERM) == prev


def test_stop_fails_queued_jobs_fast():
    """Graceful shutdown: jobs still queued when stop() runs must get a
    fast 503, not sit out their full request budget."""
    import time

    clf = RoomNetClassifier(
        init_variables(jax.random.PRNGKey(19), TINY), TINY,
        batch_size=1, class_labels=LABELS4,
    )
    real = clf._predict
    real(clf.variables, np.zeros((1, TINY.im_side, TINY.im_side, 3), np.uint8))

    def slow(variables, batch):
        time.sleep(1.0)
        return real(variables, batch)

    clf._predict = slow
    srv = ClassifierServer(clf, port=0, request_timeout_s=30.0).start()
    statuses = []
    lock = threading.Lock()

    def hit():
        t0 = time.monotonic()
        try:
            s, _ = _post(srv, "/classify", _img_bytes())
        except Exception:
            s = "EXC"
        with lock:
            statuses.append((s, time.monotonic() - t0))

    threads = [threading.Thread(target=hit) for _ in range(3)]
    for t in threads:
        t.start()
    time.sleep(0.4)  # one on device, the rest queued
    srv.stop()
    for t in threads:
        t.join(timeout=10)
    assert len(statuses) == 3, statuses
    # nobody waited anywhere near the 30 s budget
    assert all(dt < 5.0 for _, dt in statuses), statuses


def test_mesh_backed_server_buckets_stay_shardable():
    """A DP-mesh classifier shards the batch dim (P('data')): device-call
    buckets must be multiples of the data axis or every lone request
    would 503 on the sharding divisibility check (round-3 review)."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from roomnet_tpu.parallel.mesh import make_mesh

    clf = RoomNetClassifier(
        init_variables(jax.random.PRNGKey(11), TINY), TINY,
        batch_size=16, class_labels=LABELS4, mesh=make_mesh(8, 1),
    )
    srv = ClassifierServer(clf, port=0)
    assert srv._bucket_sizes == [8, 16]
    srv.start()
    try:
        status, out = _post(srv, "/classify", _img_bytes())
        assert status == 200 and out["label"] in LABELS4
    finally:
        srv.stop()


def test_hot_reload_swaps_weights_without_restart(tmp_path):
    """POST /reload: the daemon re-scans its model_dir (resume-latest) and
    atomically swaps the serving weights — predictions change, /version
    bumps, no restart/recompile. 403 without a model_dir; 404 on an empty
    dir; a shape-incompatible checkpoint is rejected with 409 and the old
    weights keep serving."""
    import dataclasses

    from roomnet_tpu.params.checkpoint import CheckpointStore

    clf = RoomNetClassifier(
        init_variables(jax.random.PRNGKey(23), TINY), TINY,
        batch_size=2, class_labels=LABELS4,
    )
    mdir = str(tmp_path / "models")
    store = CheckpointStore(mdir)
    srv = ClassifierServer(clf, port=0, model_dir=mdir).start()
    try:
        body = _img_bytes(seed=9)
        # empty dir: 404, still serving the initial weights
        st, out = _post(srv, "/reload", b"")
        assert st == 404, out
        st, before = _post(srv, "/classify", body)
        assert st == 200

        # drop a new checkpoint in, reload, predictions change
        new_vars = init_variables(jax.random.PRNGKey(99), TINY)
        store.save(new_vars, 7, suffix="0.9")
        st, out = _post(srv, "/reload", b"")
        assert st == 200 and out["step"] == 7, out
        with urllib.request.urlopen(_url(srv, "/version"), timeout=10) as r:
            assert json.loads(r.read())["step"] == 7
        st, after = _post(srv, "/classify", body)
        assert st == 200
        assert before["probs"] != after["probs"]

        # incompatible checkpoint (different num_classes): rejected, old
        # weights keep serving
        bad_cfg = dataclasses.replace(TINY, num_classes=3)
        store.save(init_variables(jax.random.PRNGKey(1), bad_cfg), 9,
                   suffix="bad")
        st, out = _post(srv, "/reload", b"")
        assert st == 409, out
        st, still = _post(srv, "/classify", body)
        assert st == 200 and still["probs"] == after["probs"]
    finally:
        srv.stop()


def test_auto_reload_picks_up_new_checkpoints(tmp_path):
    """auto_reload_s: a newer max-step checkpoint landing in model_dir
    starts serving WITHOUT a /reload call; a rejected (shape-mismatched)
    newer checkpoint keeps the old weights; same-step polls are no-ops."""
    import dataclasses
    import time

    from roomnet_tpu.params.checkpoint import CheckpointStore

    clf = RoomNetClassifier(
        init_variables(jax.random.PRNGKey(23), TINY), TINY,
        batch_size=2, class_labels=LABELS4,
    )
    mdir = str(tmp_path / "models")
    store = CheckpointStore(mdir)
    with pytest.raises(ValueError):
        ClassifierServer(clf, port=0, auto_reload_s=0.05)  # needs model_dir
    srv = ClassifierServer(clf, port=0, model_dir=mdir,
                           auto_reload_s=0.05).start()
    try:
        def version_step():
            with urllib.request.urlopen(_url(srv, "/version"), timeout=10) as r:
                return json.loads(r.read())["step"]

        def wait_for(step, timeout=10.0):
            t_end = time.monotonic() + timeout
            while time.monotonic() < t_end:
                if version_step() == step:
                    return True
                time.sleep(0.05)
            return False

        body = _img_bytes(seed=9)
        st, before = _post(srv, "/classify", body)
        assert st == 200 and version_step() is None

        store.save(init_variables(jax.random.PRNGKey(99), TINY), 7,
                   suffix="0.9")
        assert wait_for(7), "auto-reload never picked up step 7"
        st, after = _post(srv, "/classify", body)
        assert st == 200 and before["probs"] != after["probs"]

        # a NEWER but incompatible checkpoint: rejected, still serving 7
        bad_cfg = dataclasses.replace(TINY, num_classes=3)
        store.save(init_variables(jax.random.PRNGKey(1), bad_cfg), 9,
                   suffix="bad")
        time.sleep(0.5)
        assert version_step() == 7
        st, still = _post(srv, "/classify", body)
        assert st == 200 and still["probs"] == after["probs"]
    finally:
        srv.stop()


def test_graceful_drain_finishes_inflight_and_sheds_new():
    """begin_drain: /readyz flips to 503 (LB stops routing) and new
    classify work is shed with 503, but a request already admitted still
    gets its 200 — wait_drained returns True once it has (the serve_forever
    SIGTERM path with drain_s > 0)."""
    import time

    clf = RoomNetClassifier(
        init_variables(jax.random.PRNGKey(6), TINY), TINY,
        batch_size=2, class_labels=LABELS4,
    )
    real = clf._predict
    real(clf.variables, np.zeros((2, TINY.im_side, TINY.im_side, 3), np.uint8))
    release = threading.Event()

    def gated(variables, batch):
        release.wait(timeout=30)
        return real(variables, batch)

    clf._predict = gated
    srv = ClassifierServer(clf, port=0, request_timeout_s=30.0).start()
    try:
        inflight_out = {}

        def inflight_client():
            inflight_out["resp"] = _post(srv, "/classify", _img_bytes())

        t = threading.Thread(target=inflight_client)
        t.start()
        deadline = time.monotonic() + 10
        while srv._inflight == 0 and time.monotonic() < deadline:
            time.sleep(0.01)
        assert srv._inflight == 1  # the request is admitted and in flight

        srv.begin_drain()
        st, out = _post(srv, "/classify", _img_bytes())
        assert st == 503 and "draining" in out["error"]
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(_url(srv, "/readyz"), timeout=10)
        assert e.value.code == 503
        payload = json.loads(e.value.read())
        assert payload["status"] == "draining"
        assert payload["inflight"] == 1  # the gated request still holds its slot
        with urllib.request.urlopen(_url(srv, "/healthz"), timeout=10) as r:
            assert r.status == 200  # liveness stays up during drain

        assert not srv.wait_drained(0.3)  # still holding the gated request
        release.set()
        assert srv.wait_drained(10.0), "in-flight request never finished"
        t.join(timeout=10)
        st, out = inflight_out["resp"]
        assert st == 200 and out["label"] in LABELS4
    finally:
        release.set()
        srv.stop()


def test_drain_lets_admitted_stream_finish():
    """begin_drain while a streaming batch is mid-flight: the stream was
    ADMITTED, so all its remaining chunks must still be answered (drain
    only sheds NEW work); wait_drained completes once the stream does."""
    import time

    clf = RoomNetClassifier(
        init_variables(jax.random.PRNGKey(8), TINY), TINY,
        batch_size=2, class_labels=LABELS4,
    )
    real = clf._predict
    real(clf.variables, np.zeros((2, TINY.im_side, TINY.im_side, 3), np.uint8))

    def slow(variables, batch):
        # Slow but non-blocking-dispatch: the depth-2 worker finalizes
        # chunk N only after chunk N+1 DISPATCHES, so a stub that blocks
        # inside dispatch would stall the whole stream (production device
        # calls are async — dispatch returns immediately).
        time.sleep(0.5)
        return real(variables, batch)

    clf._predict = slow
    srv = ClassifierServer(clf, port=0, request_timeout_s=30.0).start()
    try:
        import base64 as b64
        import http.client

        bodies = [_img_bytes(seed=i) for i in range(8)]  # 4 chunks of 2
        payload = json.dumps(
            {"images": [b64.b64encode(b).decode() for b in bodies]}).encode()
        conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=60)
        conn.request("POST", "/classify_batch?stream=1", body=payload)
        r = conn.getresponse()
        assert r.status == 200
        first = r.readline()  # first chunk answered -> stream is mid-flight
        assert json.loads(first)["index"] == 0
        srv.begin_drain()  # ~1 s in; chunks 3-4 are still queued/in flight
        lines = [first] + [ln for ln in r.read().splitlines() if ln.strip()]
        assert len(lines) == 8, lines
        for ln in lines:
            rec = json.loads(ln)
            assert rec.get("label") in LABELS4, rec
        conn.close()
        assert srv.wait_drained(10.0)
    finally:
        srv.stop()


def test_drain_waits_for_request_still_reading_its_body():
    """A classify request whose body is still arriving has taken no
    admission slots yet — wait_drained must count it anyway (handler-level
    accounting from do_POST entry), or stop() kills it mid-read despite
    the grace window."""
    import socket
    import time

    clf = RoomNetClassifier(
        init_variables(jax.random.PRNGKey(9), TINY), TINY,
        batch_size=2, class_labels=LABELS4,
    )
    srv = ClassifierServer(clf, port=0).start()
    try:
        body = _img_bytes()
        sock = socket.create_connection(("127.0.0.1", srv.port), timeout=30)
        sock.sendall(
            b"POST /classify HTTP/1.1\r\nHost: x\r\n"
            b"Content-Length: %d\r\n\r\n" % len(body))
        sock.sendall(body[:10])  # dribble: the handler is mid rfile.read
        deadline = time.monotonic() + 10
        while srv._active_requests == 0 and time.monotonic() < deadline:
            time.sleep(0.01)
        assert srv._active_requests == 1
        srv.begin_drain()
        assert not srv.wait_drained(0.3), \
            "drained while a request body was still arriving"
        sock.sendall(body[10:])  # finish the body
        assert srv.wait_drained(10.0)
        resp = sock.recv(65536).decode()
        assert resp.startswith("HTTP/1.1 200"), resp[:100]
        sock.close()
    finally:
        srv.stop()


def test_data_parallel_cli_rejects_indivisible_batch():
    """--data-parallel with a batch size the device count can't divide must
    fail at the CLI with a clear message, not as per-request 503s or an
    opaque jit sharding error (P('data') requires divisibility)."""
    import argparse

    from roomnet_tpu.cli import _maybe_mesh

    ns = argparse.Namespace(data_parallel=True, batch_size=6)  # 8 devices
    with pytest.raises(SystemExit, match="not divisible"):
        _maybe_mesh(ns)
    ns.batch_size = 16
    assert _maybe_mesh(ns) is not None


def test_export_saved_model_default_out_is_not_tflite(monkeypatch):
    """export --format saved-model with no --out must not write a
    SavedModel DIRECTORY to the tflite default path (roomnet.tflite/)."""
    import argparse

    from roomnet_tpu import cli
    from roomnet_tpu.params import export as export_mod

    captured = {}
    monkeypatch.setattr(
        export_mod, "export_saved_model",
        lambda variables, out, cfg=None: captured.update(out=out) or out)
    ns = argparse.Namespace(format="saved-model", quantize=None,
                            params="artifacts/roomnet_params.npz",
                            model_dir=None, img_side=224, out=None)
    cli.cmd_export(ns)
    assert captured["out"] == "artifacts/roomnet_saved_model"


def test_auto_reload_survives_poll_failure(tmp_path):
    """A transient exception during a poll (permissions blip, dir race)
    must not kill the auto-reload thread: later polls still pick up new
    checkpoints. A dead poller would silently serve stale weights forever."""
    import time

    from roomnet_tpu.params.checkpoint import CheckpointStore

    clf = RoomNetClassifier(
        init_variables(jax.random.PRNGKey(23), TINY), TINY,
        batch_size=2, class_labels=LABELS4,
    )
    mdir = str(tmp_path / "models")
    store = CheckpointStore(mdir)
    srv = ClassifierServer(clf, port=0, model_dir=mdir, auto_reload_s=0.05)
    real_open, fails = srv._open_store, {"n": 0}

    def flaky_open():
        if fails["n"] < 3:
            fails["n"] += 1
            raise OSError("transient poll failure")
        return real_open()

    srv._open_store = flaky_open
    import logging

    records = []

    class _Collect(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    collector = _Collect()
    logging.getLogger("roomnet_tpu.server").addHandler(collector)
    srv.start()
    try:
        store.save(init_variables(jax.random.PRNGKey(99), TINY), 7,
                   suffix="0.9")
        t_end = time.monotonic() + 10.0
        while time.monotonic() < t_end:
            with urllib.request.urlopen(_url(srv, "/version"), timeout=10) as r:
                if json.loads(r.read())["step"] == 7:
                    break
            time.sleep(0.05)
        else:
            raise AssertionError(
                "auto-reload thread died on a transient poll failure "
                f"(saw {fails['n']} injected failures)")
        assert fails["n"] == 3  # the injected failures actually fired
        # Identical repeated failures warn ONCE (a persistent failure at a
        # sub-second poll interval must not flood the log).
        polls = [m for m in records if "poll failed" in m]
        assert len(polls) == 1, polls
    finally:
        logging.getLogger("roomnet_tpu.server").removeHandler(collector)
        srv.stop()


def test_hot_reload_from_orbax_backend_dir(tmp_path):
    """/reload auto-detects the dir's store format: a trainer configured
    with ckpt_backend=orbax produces directories, not npz files — the
    daemon must pick those up too (same detection as eval-ckpts)."""
    from roomnet_tpu.params.orbax_io import OrbaxCheckpointStore

    clf = RoomNetClassifier(
        init_variables(jax.random.PRNGKey(23), TINY), TINY,
        batch_size=2, class_labels=LABELS4,
    )
    mdir = str(tmp_path / "models_orbax")
    srv = ClassifierServer(clf, port=0, model_dir=mdir).start()
    try:
        body = _img_bytes(seed=9)
        st, before = _post(srv, "/classify", body)
        assert st == 200
        OrbaxCheckpointStore(mdir, async_save=False).save(
            init_variables(jax.random.PRNGKey(99), TINY), 12, suffix="0.8")
        st, out = _post(srv, "/reload", b"")
        assert st == 200 and out["step"] == 12, out
        st, after = _post(srv, "/classify", body)
        assert st == 200 and before["probs"] != after["probs"]
    finally:
        srv.stop()


def test_hot_reload_during_live_traffic(tmp_path):
    """/reload racing a request burst: every request answers 200 (served
    by either the old or new weights — the swap is atomic per device
    call, never torn) and the daemon ends on the new version."""
    import time

    from roomnet_tpu.params.checkpoint import CheckpointStore

    clf = RoomNetClassifier(
        init_variables(jax.random.PRNGKey(29), TINY), TINY,
        batch_size=4, class_labels=LABELS4,
    )
    mdir = str(tmp_path / "models")
    CheckpointStore(mdir).save(init_variables(jax.random.PRNGKey(31), TINY), 5)
    srv = ClassifierServer(clf, port=0, max_inflight=64, model_dir=mdir).start()
    try:
        statuses = []
        lock = threading.Lock()

        def hit(i):
            s, _ = _post(srv, "/classify", _img_bytes(seed=i % 4))
            with lock:
                statuses.append(s)

        threads = [threading.Thread(target=hit, args=(i,)) for i in range(24)]
        for t in threads:
            t.start()
        time.sleep(0.02)  # burst in flight
        st, out = _post(srv, "/reload", b"")
        assert st == 200 and out["step"] == 5
        for t in threads:
            t.join()
        assert statuses and all(s == 200 for s in statuses), statuses
    finally:
        srv.stop()


def test_reload_disabled_without_model_dir(server):
    st, out = _post(server, "/reload", b"")
    assert st == 403 and "disabled" in out["error"]


def test_warmup_compiles_before_serving():
    clf = RoomNetClassifier(
        init_variables(jax.random.PRNGKey(2), TINY), TINY,
        batch_size=2, class_labels=LABELS4,
    )
    srv = ClassifierServer(clf, port=0, warmup=True).start()
    try:
        status, out = _post(srv, "/classify", _img_bytes())
        assert status == 200 and out["label"] in LABELS4
    finally:
        srv.stop()


def test_reload_corrupt_checkpoint_file_rejected(tmp_path):
    """A garbage file matching the checkpoint pattern at the max step must
    answer 409 with the old weights kept — not crash the handler thread
    with no HTTP status (the load itself sits inside the reject guard)."""
    from roomnet_tpu.params.checkpoint import CheckpointStore

    clf = RoomNetClassifier(
        init_variables(jax.random.PRNGKey(41), TINY), TINY,
        batch_size=2, class_labels=LABELS4,
    )
    mdir = tmp_path / "models"
    CheckpointStore(str(mdir)).save(
        init_variables(jax.random.PRNGKey(42), TINY), 5
    )
    srv = ClassifierServer(clf, port=0, model_dir=str(mdir)).start()
    try:
        st, out = _post(srv, "/reload", b"")
        assert st == 200 and out["step"] == 5
        # a truncated copy landing in the dir at a LATER step
        (mdir / "roomnet--0.9--9.npz").write_bytes(b"not a zipfile")
        st, out = _post(srv, "/reload", b"")
        assert st == 409 and "rejected" in out["error"], out
        with urllib.request.urlopen(_url(srv, "/version"), timeout=10) as r:
            assert json.loads(r.read())["step"] == 5  # old weights kept
        st, out = _post(srv, "/classify", _img_bytes())
        assert st == 200
    finally:
        srv.stop()


def test_reload_probe_rejects_nonfinite_weights(tmp_path):
    """The documented probe device call: a checkpoint whose shapes pass
    the structural gate but whose weights produce NaN probabilities is
    rejected with 409 and the old weights keep serving."""
    from roomnet_tpu.params import schema
    from roomnet_tpu.params.checkpoint import CheckpointStore

    clf = RoomNetClassifier(
        init_variables(jax.random.PRNGKey(43), TINY), TINY,
        batch_size=2, class_labels=LABELS4,
    )
    mdir = str(tmp_path / "models")
    store = CheckpointStore(mdir)
    flat = schema.flatten_variables(init_variables(jax.random.PRNGKey(44), TINY))
    flat["dense/0/kernel"] = np.full_like(
        np.asarray(flat["dense/0/kernel"]), np.nan
    )
    store.save(schema.unflatten_variables(flat, TINY), 7, suffix="nan")
    srv = ClassifierServer(clf, port=0, model_dir=mdir).start()
    try:
        body = _img_bytes(seed=3)
        st, before = _post(srv, "/classify", body)
        assert st == 200
        st, out = _post(srv, "/reload", b"")
        assert st == 409 and "non-finite" in out["error"], out
        st, still = _post(srv, "/classify", body)
        assert st == 200 and still["probs"] == before["probs"]
    finally:
        srv.stop()


def test_worker_survives_result_assembly_error():
    """An exception while assembling per-row results (here: an empty
    class_labels list) must fail that round as device_error (503), NOT
    kill the device-worker thread — the next request must still be
    served."""
    clf = RoomNetClassifier(
        init_variables(jax.random.PRNGKey(45), TINY), TINY,
        batch_size=2, class_labels=LABELS4,
    )
    srv = ClassifierServer(clf, port=0).start()
    try:
        good = list(LABELS4)
        clf.class_labels = []  # IndexError on any predicted class id
        st, out = _post(srv, "/classify", _img_bytes(seed=5))
        assert st == 503 and "inference backend" in out["error"], out
        clf.class_labels = good
        st, out = _post(srv, "/classify", _img_bytes(seed=5))
        assert st == 200 and out["label"] in LABELS4, out
    finally:
        srv.stop()


def test_reload_on_mesh_backed_classifier(tmp_path):
    """/reload with a mesh-sharded classifier: the new tree is re-placed in
    the jit's replicated param sharding once at reload time, the probe runs
    a data-axis-sized bucket through the sharded jit, and post-swap answers
    match a fresh single-device classifier on the same weights."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from roomnet_tpu.params.checkpoint import CheckpointStore
    from roomnet_tpu.parallel.mesh import make_mesh

    clf = RoomNetClassifier(
        init_variables(jax.random.PRNGKey(48), TINY), TINY,
        batch_size=8, class_labels=LABELS4, mesh=make_mesh(8, 1),
    )
    new_vars = init_variables(jax.random.PRNGKey(49), TINY)
    mdir = str(tmp_path / "models")
    CheckpointStore(mdir).save(new_vars, 12)
    srv = ClassifierServer(clf, port=0, model_dir=mdir).start()
    try:
        body = _img_bytes(seed=21)
        st, out = _post(srv, "/reload", b"")
        assert st == 200 and out["step"] == 12, out
        # swapped tree lives on every mesh device (placed once, not
        # re-transferred per call)
        leaf = jax.tree_util.tree_leaves(clf.variables)[0]
        assert len(leaf.sharding.device_set) == 8
        st, served = _post(srv, "/classify", body)
        assert st == 200
        ref = RoomNetClassifier(
            new_vars, TINY, batch_size=1, class_labels=LABELS4
        )
        im = cv2.imdecode(np.frombuffer(body, np.uint8), cv2.IMREAD_COLOR)
        ids, probs = ref._predict(ref.variables, ref.prep_decoded(im)[None])
        assert served["class_id"] == int(np.asarray(ids)[0])
        assert abs(
            served["confidence"] - float(np.asarray(probs)[0, served["class_id"]])
        ) < 1e-5
    finally:
        srv.stop()


def test_concurrent_reloads_serialize(tmp_path):
    """Racing /reload requests serialize on the reload lock: whatever
    interleaving the handler threads get, the final served weights and
    /version agree and come from the max-step checkpoint."""
    from concurrent.futures import ThreadPoolExecutor

    from roomnet_tpu.params import schema
    from roomnet_tpu.params.checkpoint import CheckpointStore

    clf = RoomNetClassifier(
        init_variables(jax.random.PRNGKey(50), TINY), TINY,
        batch_size=2, class_labels=LABELS4,
    )
    mdir = str(tmp_path / "models")
    store = CheckpointStore(mdir)
    store.save(init_variables(jax.random.PRNGKey(51), TINY), 10)
    newest = init_variables(jax.random.PRNGKey(52), TINY)
    store.save(newest, 20)
    srv = ClassifierServer(clf, port=0, model_dir=mdir).start()
    try:
        with ThreadPoolExecutor(max_workers=4) as pool:
            outs = list(pool.map(
                lambda _: _post(srv, "/reload", b""), range(4)
            ))
        assert all(st == 200 and out["step"] == 20 for st, out in outs), outs
        with urllib.request.urlopen(_url(srv, "/version"), timeout=10) as r:
            assert json.loads(r.read())["step"] == 20
        want = schema.flatten_jax(newest)
        got = schema.flatten_jax(clf.variables)
        for k in want:
            np.testing.assert_array_equal(
                np.asarray(want[k]), np.asarray(got[k]), err_msg=k
            )
    finally:
        srv.stop()


def test_server_matches_predict_paths_on_same_bytes(tmp_path):
    """HTTP /classify and the file path (predict_paths) share ONE host
    preprocess (classify.prep_decoded), so the same image bytes must
    yield the identical class id and confidence through both surfaces."""
    clf = RoomNetClassifier(
        init_variables(jax.random.PRNGKey(47), TINY), TINY,
        batch_size=2, class_labels=LABELS4,
    )
    body = _img_bytes(seed=11)
    p = tmp_path / "img.png"
    p.write_bytes(body)
    ids, confs, ok = clf.predict_paths([str(p)])
    assert ok[0]
    srv = ClassifierServer(clf, port=0).start()
    try:
        st, out = _post(srv, "/classify", body)
        assert st == 200
        assert out["class_id"] == int(ids[0])
        assert abs(out["confidence"] - float(confs[0][int(ids[0])])) < 1e-6
    finally:
        srv.stop()

"""Reference client for the roomnet_tpu serving daemon.

Production-shaped consumption of the HTTP API (docs/operations.md):
one keep-alive connection, 429 backoff honoring Retry-After, and the
streaming NDJSON batch endpoint so large batches yield results after the
first device call. Usable as a CLI or imported (`classify_paths`).

    PYTHONPATH=. python tools/classify_client.py \
        --server http://127.0.0.1:8000 --images-dir ./photos [--stream]
"""

from __future__ import annotations

import argparse
import base64
import glob
import http.client
import json
import os
import sys
import time
from urllib.parse import urlparse


class Client:
    """Keep-alive HTTP client with 429 backoff.

    Retries only overload shedding (429 + Retry-After, the daemon's
    backpressure contract) — 4xx caller errors and 5xx backend errors
    surface to the caller.
    """

    def __init__(self, server: str, *, timeout_s: float = 60.0,
                 max_retries: int = 8, budget_s: float | None = None):
        """budget_s: per-request timeout budget, propagated to the daemon
        via X-Timeout-Seconds (the server clamps it to its own cap and
        answers 200-or-504 within ~budget_s of ADMISSION — decode and
        queue time spend it). Lets a latency-sensitive caller get its
        timeout from the server as a clean 504 instead of a socket
        timeout mid-response."""
        u = urlparse(server)
        self.host = u.hostname or "127.0.0.1"
        self.port = u.port or 80
        self.timeout_s = timeout_s
        self.max_retries = max_retries
        self.budget_s = budget_s
        self._conn: http.client.HTTPConnection | None = None

    def _connection(self) -> http.client.HTTPConnection:
        if self._conn is None:
            self._conn = http.client.HTTPConnection(
                self.host, self.port, timeout=self.timeout_s)
        return self._conn

    def close(self):
        if self._conn is not None:
            self._conn.close()
            self._conn = None

    def _headers(self) -> dict:
        if self.budget_s is None:
            return {}
        return {"X-Timeout-Seconds": str(self.budget_s)}

    def _request(self, method: str, path: str, body: bytes | None = None):
        """One request with keep-alive reuse, reconnect-on-stale, and 429
        backoff. Returns (status, headers, body_bytes)."""
        retries = 0
        while True:
            try:
                conn = self._connection()
                conn.request(method, path, body=body,
                             headers=self._headers())
                r = conn.getresponse()
                data = r.read()
            except (ConnectionError, http.client.HTTPException, OSError):
                # A dropped keep-alive connection (server idle-reaped it,
                # or Connection: close on the previous response) is not an
                # application error: reconnect once per request.
                self.close()
                conn = self._connection()
                conn.request(method, path, body=body,
                             headers=self._headers())
                r = conn.getresponse()
                data = r.read()
            if r.status == 429 and retries < self.max_retries:
                retries += 1
                delay = float(r.headers.get("Retry-After", 1))
                time.sleep(min(delay * retries, 10.0))
                continue
            return r.status, r.headers, data

    def classify_bytes(self, image_bytes: bytes) -> dict:
        st, _, data = self._request("POST", "/classify", image_bytes)
        out = json.loads(data)
        if st != 200:
            raise RuntimeError(f"/classify -> {st}: {out.get('error')}")
        return out

    def classify_batch(self, blobs: list[bytes]) -> list[dict]:
        payload = json.dumps({
            "images": [base64.b64encode(b).decode() for b in blobs]
        }).encode()
        st, _, data = self._request("POST", "/classify_batch", payload)
        out = json.loads(data)
        if st != 200:
            raise RuntimeError(f"/classify_batch -> {st}: {out.get('error')}")
        return out["results"]

    def classify_batch_stream(self, blobs: list[bytes]):
        """Yield (index, result) as the daemon emits NDJSON lines — first
        results after ONE device call, not after the whole batch. The
        stream is close-terminated, so this path intentionally gives up
        the keep-alive connection."""
        payload = json.dumps({
            "images": [base64.b64encode(b).decode() for b in blobs]
        }).encode()
        retries = 0
        while True:
            self.close()  # stream endpoint closes; use a fresh connection
            conn = self._connection()
            conn.request("POST", "/classify_batch?stream=1", body=payload,
                         headers=self._headers())
            r = conn.getresponse()
            if r.status == 429 and retries < self.max_retries:
                r.read()
                retries += 1
                time.sleep(min(float(r.headers.get("Retry-After", 1))
                               * retries, 10.0))
                continue
            if r.status != 200:
                raise RuntimeError(
                    f"stream -> {r.status}: "
                    f"{json.loads(r.read()).get('error')}")
            buf = b""
            while True:
                chunk = r.read1(65536)
                if not chunk:
                    break
                buf += chunk
                while b"\n" in buf:
                    line, buf = buf.split(b"\n", 1)
                    if line.strip():
                        rec = json.loads(line)
                        yield rec.pop("index"), rec
            self.close()
            return


def classify_paths(server: str, paths: list[str], *, stream: bool = False,
                   batch: int = 64,
                   budget_s: float | None = None) -> dict[str, dict]:
    """Classify image files through a running daemon; {path: result}."""
    out: dict[str, dict] = {}
    cl = Client(server, budget_s=budget_s)
    try:
        for at in range(0, len(paths), batch):
            chunk = paths[at: at + batch]
            blobs = [open(p, "rb").read() for p in chunk]
            if stream:
                for i, rec in cl.classify_batch_stream(blobs):
                    out[chunk[i]] = rec
            else:
                for p, rec in zip(chunk, cl.classify_batch(blobs)):
                    out[p] = rec
    finally:
        cl.close()
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--server", default="http://127.0.0.1:8000")
    ap.add_argument("--images-dir", required=True)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--stream", action="store_true",
                    help="consume the NDJSON streaming endpoint")
    ap.add_argument("--budget", type=float, default=None, metavar="S",
                    help="per-request timeout budget propagated via "
                         "X-Timeout-Seconds (server answers 200-or-504 "
                         "within ~S of admission)")
    args = ap.parse_args(argv)
    paths = sorted(
        p for p in glob.glob(os.path.join(args.images_dir, "*"))
        if os.path.isfile(p)
    )
    if not paths:
        print(f"no files in {args.images_dir}", file=sys.stderr)
        return 1
    results = classify_paths(args.server, paths, stream=args.stream,
                             batch=args.batch, budget_s=args.budget)
    for p in paths:
        r = results.get(p, {"error": "no result"})
        if "label" in r:
            print(f"{p}\t{r['label']}\t{r['confidence']:.4f}")
        else:
            print(f"{p}\tERROR\t{r.get('error')}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Minimal HTTP serving daemon for the classifier.

The reference has no serving story beyond a CLI over a directory
(infer.py:103-110); this daemon is the production-deployment face of the
same optimized-inference pipeline: a persistent process with the jitted
forward warm, micro-batching concurrent requests onto the device.

Endpoints:
  GET  /healthz            -> 200 "ok"
  GET  /labels             -> JSON list of class labels
  GET  /metrics            -> JSON span registry (utils/profiling.SPANS):
                              per-span total_s/count/mean_ms, incl.
                              serve/device_call and serve/request
  POST /classify           -> body = raw image bytes (jpeg/png);
                              response JSON {label, class_id, confidence,
                              probs}

Stdlib http.server only — no web framework dependency. Concurrency model:
a ThreadingHTTPServer front end feeds a single device worker through a
bounded queue; the worker coalesces up to `max_batch` pending requests per
device call (static-shape padding, same as predict_paths).
"""

from __future__ import annotations

import json
import queue
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


class _Job:
    __slots__ = ("image", "event", "result", "error")

    def __init__(self, image):
        self.image = image
        self.event = threading.Event()
        self.result = None
        self.error = None  # "device_error" when the batch's device call failed


class ClassifierServer:
    def __init__(self, classifier, host: str = "127.0.0.1", port: int = 8000,
                 max_batch: int | None = None, warmup: bool = False):
        self.classifier = classifier
        self.host = host
        self.port = port
        # The jitted _predict is compiled for exactly classifier.batch_size
        # rows; coalescing more jobs than that would overflow the device
        # batch, so clamp (a larger max_batch would otherwise IndexError in
        # the worker and wedge every later request into its timeout).
        self.max_batch = min(max_batch or classifier.batch_size,
                             classifier.batch_size)
        self.warmup = warmup
        self._jobs: queue.Queue[_Job] = queue.Queue()
        self._stop = threading.Event()
        self._httpd: ThreadingHTTPServer | None = None
        self._threads: list[threading.Thread] = []

    # -- device worker: micro-batches pending requests ----------------------
    def _warmup(self):
        """Compile + run the device path once so the first request doesn't
        pay the (remote, tens-of-seconds) jit compile."""
        clf = self.classifier
        side = clf.cfg.im_side
        batch = np.zeros((clf.batch_size, side, side, 3), np.uint8)
        clf._predict(clf.variables, batch)

    def _worker(self):
        from roomnet_tpu.utils.profiling import trace

        clf = self.classifier
        side = clf.cfg.im_side
        while not self._stop.is_set():
            try:
                first = self._jobs.get(timeout=0.2)
            except queue.Empty:
                continue
            batch_jobs = [first]
            while len(batch_jobs) < self.max_batch:
                try:
                    batch_jobs.append(self._jobs.get_nowait())
                except queue.Empty:
                    break
            # Everything from assembly through the device call is inside one
            # recover-and-continue handler: any failure fails THESE requests
            # but never kills the worker thread.
            try:
                batch = np.zeros((clf.batch_size, side, side, 3), np.uint8)
                ok = []
                for i, job in enumerate(batch_jobs):
                    if job.image is not None:
                        batch[i] = job.image
                        ok.append(True)
                    else:
                        ok.append(False)
                with trace("serve/device_call"):
                    ids, probs = clf._predict(clf.variables, batch)
                    ids = np.asarray(ids)
                    probs = np.asarray(probs)
            except Exception:  # device error: fail THESE requests, keep serving
                for job in batch_jobs:
                    job.error = "device_error"
                    job.event.set()
                continue
            for i, job in enumerate(batch_jobs):
                if ok[i]:
                    cid = int(ids[i])
                    job.result = {
                        "label": clf.class_labels[cid],
                        "class_id": cid,
                        "confidence": float(probs[i, cid]),
                        "probs": [float(p) for p in probs[i]],
                    }
                job.event.set()

    def _preprocess(self, body: bytes):
        import cv2

        from roomnet_tpu.data.loader import center_crop

        im = cv2.imdecode(np.frombuffer(body, np.uint8), cv2.IMREAD_COLOR)
        if im is None:
            return None
        im = center_crop(im)
        side = self.classifier.cfg.im_side
        if im.shape[0] != side or im.shape[1] != side:
            im = cv2.resize(im, (side, side))
        return np.ascontiguousarray(im)

    # -- http ---------------------------------------------------------------
    def _make_handler(server_self):
        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _send(self, code: int, payload):
                body = (
                    payload if isinstance(payload, bytes) else json.dumps(payload).encode()
                )
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/healthz":
                    self._send(200, {"status": "ok"})
                elif self.path == "/labels":
                    self._send(200, server_self.classifier.class_labels)
                elif self.path == "/metrics":
                    from roomnet_tpu.utils.profiling import SPANS

                    self._send(200, SPANS.summary())
                else:
                    self._send(404, {"error": "not found"})

            def do_POST(self):
                if self.path != "/classify":
                    self._send(404, {"error": "not found"})
                    return
                from roomnet_tpu.utils.profiling import trace

                with trace("serve/request"):
                    length = int(self.headers.get("Content-Length", 0))
                    body = self.rfile.read(length)
                    image = server_self._preprocess(body)
                    job = _Job(image)
                    server_self._jobs.put(job)
                    done = job.event.wait(timeout=30)
                if job.result is not None:
                    self._send(200, job.result)
                elif image is None:
                    self._send(400, {"error": "undecodable image"})
                elif job.error == "device_error":
                    # Server-side failure on a valid request: 5xx so HTTP
                    # clients retry instead of treating it as caller error.
                    self._send(503, {"error": "inference backend failure"})
                elif not done:
                    self._send(504, {"error": "inference timeout"})
                else:
                    self._send(503, {"error": "inference unavailable"})

        return Handler

    def start(self):
        if self.warmup:
            self._warmup()

        # Default listen backlog is 5: a burst of concurrent clients beyond
        # that gets connection-refused at the socket before any handler
        # runs (measured: 11/64 failures in a 64-way burst). Size it for
        # the micro-batching design, which WANTS deep request queues.
        class _Server(ThreadingHTTPServer):
            request_queue_size = 128
            daemon_threads = True

        self._httpd = _Server((self.host, self.port), self._make_handler())
        self.port = self._httpd.server_address[1]  # resolve port 0
        self._threads = [
            threading.Thread(target=self._worker, daemon=True),
            threading.Thread(target=self._httpd.serve_forever, daemon=True),
        ]
        for t in self._threads:
            t.start()
        return self

    def stop(self):
        self._stop.set()
        if self._httpd:
            self._httpd.shutdown()
            self._httpd.server_close()

    def serve_forever(self):
        self.start()
        try:
            self._threads[1].join()
        except KeyboardInterrupt:
            self.stop()

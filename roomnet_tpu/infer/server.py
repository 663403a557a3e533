"""Minimal HTTP serving daemon for the classifier.

The reference has no serving story beyond a CLI over a directory
(infer.py:103-110); this daemon is the production-deployment face of the
same optimized-inference pipeline: a persistent process with the jitted
forward warm, micro-batching concurrent requests onto the device.

Endpoints:
  GET  /healthz            -> 200 "ok"
  GET  /labels             -> JSON list of class labels
  GET  /version            -> {"step": ..., "path": ...} of the serving
                              weights (updated by /reload)
  POST /reload             -> hot-swap to the max-step checkpoint in the
                              model_dir fixed at startup (403 without
                              one; 409 keeps the old weights if the new
                              checkpoint fails a probe device call)
  GET  /metrics            -> JSON span registry (utils/profiling.SPANS):
                              per-span total_s/count/mean_ms, incl.
                              serve/device_call and serve/request
  POST /classify           -> body = raw image bytes (jpeg/png);
                              response JSON {label, class_id, confidence,
                              probs}
  POST /classify_batch     -> body = JSON {"images": [<base64>, ...]};
                              response JSON {"results": [per-image result
                              or {"error": ...}]} — N images ride ONE
                              device call when N <= max_batch
  POST /classify_batch?stream=1
                           -> same body; NDJSON response — one
                              {"index": i, ...result-or-error} line per
                              image, emitted as each max_batch chunk's
                              device call completes (first results after
                              ONE device call, not the whole batch);
                              stream ends by connection close

Stdlib http.server only — no web framework dependency. Concurrency model:
a ThreadingHTTPServer front end feeds a single device worker through a
bounded queue; the worker coalesces up to `max_batch` pending images per
device call (static-shape padding, same as predict_paths).

Backpressure (round-2 review item #5): admission control caps in-flight
requests at `max_inflight`; beyond it the server sheds load FAST with
429 + Retry-After instead of letting work pile into 30 s timeouts, and
request decode (cv2) runs on a bounded pool instead of per-request handler
threads, so a burst can't fork unbounded CPU work on a small host.

Timeout budgets (round-3 review item #9): every request carries a
deadline stamped at admission — `request_timeout_s`, or a smaller
client-supplied `X-Timeout-Seconds` header. Decode and queue time spend
the budget (the handler's wait is the REMAINING budget, not a fresh flat
timeout), and the device worker drops queued jobs whose deadline already
passed, so an overloaded queue answers 504 on time and never burns device
work on answers nobody will read.
"""

from __future__ import annotations

import base64
import json
import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


class _Job:
    """One unit of device work: a list of decoded images (None = undecodable
    row). Single requests carry 1 image; /classify_batch carries N. The
    worker fills `results` (per-image dict or None) and sets `event`."""

    __slots__ = ("images", "event", "results", "error", "abandoned", "deadline")

    def __init__(self, images, deadline: float = float("inf")):
        self.images = images
        self.event = threading.Event()
        self.results = [None] * len(images)
        self.error = None  # "device_error" when the batch's device call failed
        # Set by the handler when its client has already received a 504:
        # the worker skips abandoned jobs so zombie work can't consume
        # device time behind freshly admitted requests.
        self.abandoned = False
        # Absolute monotonic deadline, stamped at ADMISSION: decode and
        # queue time spend the request's budget, and the worker drops jobs
        # already past it (their client is getting a 504 regardless).
        self.deadline = deadline


class ClassifierServer:
    def __init__(self, classifier, host: str = "127.0.0.1", port: int = 8000,
                 max_batch: int | None = None, warmup: bool = False,
                 max_inflight: int | None = None,
                 decode_workers: int | None = None,
                 request_timeout_s: float = 30.0,
                 model_dir: str | None = None,
                 max_body_bytes: int = 256 << 20,
                 auto_reload_s: float | None = None,
                 access_log: str | None = None,
                 idle_connection_s: float = 65.0,
                 drain_s: float = 0.0):
        """model_dir: enables POST /reload — re-scan this checkpoint dir
        (resume-latest semantics, the trainer's output) and atomically
        swap the serving weights without a restart or recompile (the
        jitted forward takes variables as an argument; in-flight device
        calls keep the old pytree). The dir is FIXED at startup: the
        reload endpoint never accepts a path from the network.

        auto_reload_s: poll model_dir every N seconds and hot-swap when a
        NEWER max-step checkpoint lands — a live trainer's output starts
        serving without anyone calling /reload. The poll is filename-only
        (no load) until the step actually advances; a rejected checkpoint
        (corrupt/NaN/shape-mismatch) keeps the old weights and is retried
        on the next poll, by the same guarded path /reload uses."""
        self.classifier = classifier
        self.host = host
        self.port = port
        self.model_dir = model_dir
        self.model_version: dict = {"step": None, "path": "initial"}
        if auto_reload_s is not None and model_dir is None:
            raise ValueError("auto_reload_s needs model_dir")
        self.auto_reload_s = auto_reload_s
        from roomnet_tpu.utils.logging import EventLog

        # JSON-lines per answered request: {ts, kind:"request", method,
        # path, status, ms}. For the streaming endpoint ms is
        # time-to-first-byte (the 200 head precedes the NDJSON body).
        self._access_log = EventLog(access_log)
        # Idle keep-alive reap (handler socket timeout); also bounds a
        # stalled mid-body client, hence > request_timeout_s by default.
        self.idle_connection_s = idle_connection_s
        # The jitted _predict is compiled for exactly classifier.batch_size
        # rows; coalescing more jobs than that would overflow the device
        # batch, so clamp (a larger max_batch would otherwise IndexError in
        # the worker and wedge every later request into its timeout).
        self.max_batch = min(max_batch or classifier.batch_size,
                             classifier.batch_size)
        self.warmup = warmup
        self.request_timeout_s = request_timeout_s
        # Rejected from the Content-Length header, before any read: 256 MB
        # comfortably fits a max_inflight batch of base64 photos while
        # keeping a hostile multi-GB post from being buffered.
        self.max_body_bytes = max_body_bytes
        # Admission cap: how many requests may be in flight (decoding,
        # queued, or on device) before new ones are shed with 429. Sized so
        # the backlog clears within a few device calls.
        self.max_inflight = max_inflight or 4 * self.max_batch
        self._admit = threading.Semaphore(self.max_inflight)
        # Graceful drain (serve_forever): on SIGTERM/Ctrl-C flip /readyz to
        # 503 and shed NEW classify work with 503+Connection:close, but let
        # in-flight requests finish (up to drain_s) before stop() fails
        # whatever remains — a k8s rollout answers everything it admitted.
        self.drain_s = drain_s
        self._draining = False
        self._inflight = 0  # admitted image-slots currently held
        # Classify handlers currently executing, counted from do_POST entry
        # to the response being fully written. Slot accounting alone is not
        # drain-safe: slots release when _run_job returns, BEFORE the
        # response is written (a slow client could hold the write for
        # seconds), and a request still reading its body or decoding has
        # not taken slots yet — wait_drained must see both.
        self._active_requests = 0
        self._inflight_lock = threading.Lock()
        # Bounded decode pool: cv2 decode is the CPU-heavy part of a
        # request; per-request handler threads would run all of them
        # concurrently under a burst.
        self._decode_pool = ThreadPoolExecutor(
            max_workers=decode_workers or min(4, (os.cpu_count() or 1) * 2)
        )
        # Unbounded on purpose: admission (the image-weighted semaphore
        # above) is the SINGLE source of truth for in-flight accounting. A
        # bounded queue double-counted: a 504'd job kept its queue slot
        # while its semaphore slots were released, so fresh requests could
        # hit queue.Full and 429 with capacity free (round-3 advisor).
        self._jobs: queue.Queue[_Job] = queue.Queue()
        # Serializes /reload: concurrent reloads could interleave
        # load/probe/swap and leave older weights (or a model_version that
        # disagrees with the served tree) as the final state.
        self._reload_lock = threading.Lock()
        self._bucket_sizes = self._compute_buckets()
        self._stop = threading.Event()
        self._httpd: ThreadingHTTPServer | None = None
        self._threads: list[threading.Thread] = []

    # -- device worker: micro-batches pending requests ----------------------
    def _compute_buckets(self):
        """Device-call batch shapes: power-of-2 multiples of the smallest
        legal batch, up to the classifier's batch size. Padding every call
        to the FULL batch ships batch_size x 150 KB through the
        host->device link per lone request (1.2 MB at batch 8 — ~35 ms at
        this relay's 34 MB/s); bucketing pads at most 2x while keeping the
        jit-signature count log2(max_batch).

        Mesh-backed classifiers shard the batch dim over 'data'
        (in_shardings=P('data')), which requires divisibility — so the
        smallest bucket is the data-axis size, not 1."""
        base = 1
        mesh = getattr(self.classifier, "mesh", None)
        if mesh is not None:
            base = int(mesh.shape.get("data", 1))
        b, out = base, []
        while b < self.classifier.batch_size:
            out.append(b)
            b *= 2
        out.append(self.classifier.batch_size)
        return out

    @staticmethod
    def _bucket_for(n: int, buckets) -> int:
        for b in buckets:
            if n <= b:
                return b
        return buckets[-1]

    def _warmup(self):
        """Compile + run the device path for every bucket shape so no
        request ever pays the (remote, tens-of-seconds) jit compile.

        Must FETCH a result per shape: under a remote relay the dispatch
        returns while the compile is still in flight (measured: warmup
        "finished" in 1.6 s with 222 s of queued compiles, and the first
        request then blew its 30 s budget)."""
        clf = self.classifier
        # host_side: with device_resize_side the daemon ships the
        # intermediate-side uint8 and the device does the final resample.
        side = getattr(clf, "host_side", clf.cfg.im_side)
        for b in self._bucket_sizes:
            ids, _ = clf._predict(
                clf.variables, np.zeros((b, side, side, 3), np.uint8)
            )
            int(np.asarray(ids)[0])  # scalar fetch = real completion barrier

    def _worker(self):
        import time

        from roomnet_tpu.utils.profiling import SPANS, trace

        clf = self.classifier
        # host_side: with device_resize_side the daemon ships the
        # intermediate-side uint8 and the device does the final resample.
        side = getattr(clf, "host_side", clf.cfg.im_side)

        def dead(j: _Job) -> bool:
            # Abandoned (client got its 504) or past its deadline (client
            # IS getting a 504): either way device time spent on it would
            # only starve freshly admitted requests.
            return j.abandoned or time.monotonic() > j.deadline

        def dispatch_round(batch_jobs):
            """Assemble this round's chunks and DISPATCH their device
            calls (async — jax returns before the result lands). Returns
            (batch_jobs, dispatched_chunks, dispatch_failed). Chunk size
            honors max_batch (which __init__ clamps to <= the compiled
            batch); any failure is recorded, never raised — the worker
            thread must survive everything."""
            rows = [
                (job, k)
                for job in batch_jobs
                for k in range(len(job.images))
                if job.images[k] is not None
            ]
            chunks = []
            try:
                for at in range(0, len(rows), self.max_batch):
                    chunk = rows[at: at + self.max_batch]
                    bsz = self._bucket_for(len(chunk), self._bucket_sizes)
                    batch = np.zeros((bsz, side, side, 3), np.uint8)
                    for i, (job, k) in enumerate(chunk):
                        batch[i] = job.images[k]
                    # Measured shipped bytes (incl. bucket padding): the
                    # bench computes transfer-bound % from THIS, not from
                    # a worst-case full-bucket assumption (round-4 review
                    # weak #3 — power-of-2 padding can overstate ~2x).
                    SPANS.count("serve/device_call_bytes", batch.nbytes)
                    with trace("serve/device_call"):
                        ids_dev, probs_dev = clf._predict(clf.variables, batch)
                        # Start the device->host copies now (non-blocking,
                        # queued behind this chunk's compute): by the time
                        # finalize() runs — a full pipelined round later —
                        # the bytes are already on the host, so its fetch
                        # is a collection, not a round trip per array.
                        # getattr: _predict is an instance attribute tests
                        # and callers may stub with plain-ndarray outputs.
                        for a in (ids_dev, probs_dev):
                            getattr(a, "copy_to_host_async", lambda: None)()
                    chunks.append((chunk, ids_dev, probs_dev))
            except Exception:
                return batch_jobs, chunks, True
            return batch_jobs, chunks, False

        def finalize(round_):
            """Fetch this round's results and complete its jobs. A failed
            chunk (fetch error, or dispatch_failed cut the round short)
            fails only jobs whose results are incomplete — a job fully
            served by an earlier successful chunk completes normally."""
            batch_jobs, chunks, failed = round_
            for chunk, ids_dev, probs_dev in chunks:
                # Result assembly stays INSIDE the recover-and-continue
                # handler: an exception here (fetch error, or e.g. a
                # class_labels list shorter than the model's head) must
                # fail the round as device_error, not kill the worker
                # thread and 504 every later request.
                try:
                    with trace("serve/fetch"):
                        ids = np.asarray(ids_dev)
                        probs = np.asarray(probs_dev)
                    for i, (job, k) in enumerate(chunk):
                        cid = int(ids[i])
                        job.results[k] = {
                            "label": clf.class_labels[cid],
                            "class_id": cid,
                            "confidence": float(probs[i, cid]),
                            "probs": [float(p) for p in probs[i]],
                        }
                except Exception:
                    failed = True
                    continue
            for job in batch_jobs:
                if failed and not all(
                    job.results[k] is not None
                    for k in range(len(job.images))
                    if job.images[k] is not None
                ):
                    job.error = "device_error"
                job.event.set()

        # Depth-2 pipelining: round i+1's device calls DISPATCH before
        # round i's results are fetched, so the fetch round trip (the
        # dominant per-call cost on a remote link) overlaps the next
        # round's compute. `pending` is the dispatched-but-unfetched
        # round; when the queue goes quiet it finalizes within ~2 ms.
        pending = None
        while not self._stop.is_set():
            try:
                first = self._jobs.get(timeout=0.002 if pending else 0.2)
            except queue.Empty:
                if pending is not None:
                    finalize(pending)
                    pending = None
                continue
            # Coalesce whole jobs until the device batch is full. A job is
            # never split across coalescing rounds, but a large /classify_
            # batch job is chunked over several device calls.
            batch_jobs = [] if dead(first) else [first]
            total = len(first.images) if batch_jobs else 0
            while total < self.max_batch:
                try:
                    j = self._jobs.get_nowait()
                except queue.Empty:
                    break
                if dead(j):
                    continue
                batch_jobs.append(j)
                total += len(j.images)
            if not batch_jobs:
                continue
            new_round = dispatch_round(batch_jobs)
            if pending is not None:
                finalize(pending)
            pending = new_round
        if pending is not None:
            finalize(pending)

    def _preprocess(self, body: bytes):
        import cv2

        im = cv2.imdecode(np.frombuffer(body, np.uint8), cv2.IMREAD_COLOR)
        if im is None:
            return None
        # Shared crop/resize with the file path (classify.prep_decoded):
        # HTTP and predict_paths must stay pixel-identical on the same
        # decoded image.
        return self.classifier.prep_decoded(im)

    # -- request plumbing (admission -> decode -> device -> result) ---------
    def _admit_with_budget(self, n_images: int, budget_s: float | None):
        """Stamp the request deadline and take image-weighted admission
        slots. One source of truth for _run_job AND _run_stream (the
        round-3 admission double-count bug class lived in exactly this
        kind of drift). Returns (deadline, acquired); the CALLER must
        release `acquired` slots, and has been shed if
        acquired < n_images."""
        import time

        budget = self.request_timeout_s
        if budget_s is not None and budget_s > 0:
            budget = min(budget_s, self.request_timeout_s)
        deadline = time.monotonic() + budget
        acquired = 0
        for _ in range(n_images):
            if not self._admit.acquire(blocking=False):
                break
            acquired += 1
        with self._inflight_lock:
            self._inflight += acquired
        return deadline, acquired

    def _release_slots(self, n: int):
        with self._inflight_lock:
            self._inflight -= n
        for _ in range(n):
            self._admit.release()

    def _run_job(self, bodies: list[bytes], budget_s: float | None = None):
        """Decode on the bounded pool, enqueue one job, wait for results.

        Returns (job, images) or the string "overloaded" when admission
        sheds the request. Admission is weighted by image count: a
        /classify_batch of N images takes N in-flight slots, so the
        latency bound max_inflight implies holds regardless of batching.

        budget_s: the request's timeout budget (client-supplied via
        X-Timeout-Seconds, clamped to request_timeout_s). The deadline is
        stamped HERE, at admission — decode and queue time spend the
        budget, so a request answers (200 or 504) within ~budget_s of
        arrival instead of budget_s after it finally reached the front of
        the queue (round-3 review item #9)."""
        import time

        deadline, acquired = self._admit_with_budget(len(bodies), budget_s)
        try:
            if acquired < len(bodies):
                return "overloaded"
            images = list(self._decode_pool.map(self._preprocess, bodies))
            job = _Job(images, deadline=deadline)
            if self._stop.is_set():
                # The worker is gone (or going): enqueueing now would leave
                # this handler in event.wait for its whole budget with
                # nobody to answer — fail it like stop()'s drain does.
                job.error = "shutting_down"
                job.event.set()
            elif any(im is not None for im in images):
                self._jobs.put(job)
                remaining = deadline - time.monotonic()
                if remaining <= 0 or not job.event.wait(timeout=remaining):
                    # Client gets 504; mark the job so the worker drops it
                    # instead of burning device time on an answer nobody
                    # will read (the admission slots released below must
                    # not re-admit load on top of zombie work).
                    job.abandoned = True
            else:
                job.event.set()  # nothing decodable: no device work
            return job, images
        finally:
            self._release_slots(acquired)

    def _run_stream(self, bodies: list[bytes], budget_s: float | None,
                    emit) -> str | None:
        """Streaming twin of _run_job for large batches: one admission over
        all images, one job PER max_batch chunk, and `emit(index, result)`
        called as each chunk's device call completes — first results arrive
        after one device call instead of after the whole batch.

        Returns "overloaded" when admission sheds, else None. emit raising
        (client disconnected) abandons the remaining chunks so zombie work
        never reaches the device."""
        import time

        deadline, acquired = self._admit_with_budget(len(bodies), budget_s)
        jobs: list[_Job] = []
        try:
            if acquired < len(bodies):
                return "overloaded"
            images = list(self._decode_pool.map(self._preprocess, bodies))
            for at in range(0, len(images), self.max_batch):
                job = _Job(images[at: at + self.max_batch], deadline=deadline)
                jobs.append(job)
                if self._stop.is_set():
                    job.error = "shutting_down"  # see _run_job
                    job.event.set()
                elif any(im is not None for im in job.images):
                    self._jobs.put(job)
                else:
                    job.event.set()
            idx = 0
            for job in jobs:
                remaining = deadline - time.monotonic()
                done = remaining > 0 and job.event.wait(timeout=remaining)
                for k in range(len(job.images)):
                    if job.images[k] is None:
                        emit(idx, {"error": "undecodable image"})
                    elif job.results[k] is not None:
                        emit(idx, job.results[k])
                    elif not done:
                        emit(idx, {"error": "inference timeout"})
                    else:
                        emit(idx, {"error": f"inference backend: "
                                            f"{job.error or 'unavailable'}"})
                    idx += 1
            return None
        except ConnectionError:
            return None  # client went away; finally abandons the rest
        finally:
            for job in jobs:
                if not job.event.is_set():
                    job.abandoned = True
            self._release_slots(acquired)

    def _reload_latest(self):
        """Load the max-step checkpoint from model_dir and swap it in.

        Returns (status_code, payload). The swap is a single attribute
        assignment AFTER the full load (atomic under the GIL); the jitted
        forward receives variables per call, so no recompile and no torn
        reads. Shape mismatches (e.g. a different num_classes checkpoint
        landing in the dir) fail the reload and keep the old weights."""
        if self.model_dir is None:
            return 403, {"error": "server started without --model-dir; "
                                  "reload disabled"}
        with self._reload_lock:
            return self._reload_latest_locked()

    def _open_store(self):
        """The model_dir's checkpoint store: npz files win if present,
        else the orbax directory layout — same auto-detection as
        eval-ckpts, so /reload works on whichever backend the trainer
        was configured with."""
        import glob as _glob

        from roomnet_tpu.params.checkpoint import CheckpointStore

        if _glob.glob(os.path.join(self.model_dir, "roomnet--*--*.npz")):
            return CheckpointStore(self.model_dir)
        from roomnet_tpu.params.orbax_io import OrbaxCheckpointStore

        return OrbaxCheckpointStore(self.model_dir, async_save=False)

    def _reload_latest_locked(self):
        from roomnet_tpu.params import schema

        try:
            # Inside the 409 guard: a truncated/corrupt file matching the
            # checkpoint pattern must answer "rejected, old weights kept",
            # not crash the handler with no HTTP status.
            loaded = self._open_store().load(cfg=self.classifier.cfg)
        except Exception as exc:  # noqa: BLE001
            return 409, {"error": f"checkpoint rejected: {type(exc).__name__}: "
                                  f"{exc}"}
        if loaded is None:
            return 404, {"error": f"no checkpoint found in {self.model_dir}"}
        var_flat, step = loaded
        try:
            variables = schema.unflatten_variables(
                {k: np.asarray(v) for k, v in var_flat.items()},
                self.classifier.cfg,
            )
            # Structural gate BEFORE the swap: the new tree must match the
            # serving tree path-for-path and shape-for-shape. A device
            # probe can't catch this — jit happily recompiles for new
            # shapes and would serve silently wrong outputs (e.g. a
            # different-num_classes head against this server's labels).
            old_flat = schema.flatten_jax(self.classifier.variables)
            new_flat = schema.flatten_jax(variables)
            if set(old_flat) != set(new_flat):
                raise ValueError(
                    f"variable set differs: only-old="
                    f"{sorted(set(old_flat) - set(new_flat))[:3]} only-new="
                    f"{sorted(set(new_flat) - set(old_flat))[:3]}"
                )
            for k in old_flat:
                if tuple(np.shape(new_flat[k])) != tuple(np.shape(old_flat[k])):
                    raise ValueError(
                        f"{k}: shape {tuple(np.shape(new_flat[k]))} != "
                        f"serving {tuple(np.shape(old_flat[k]))}"
                    )
            # Mesh-backed classifiers: place the tree in the jit's param
            # sharding ONCE here — unflatten's single-device arrays would
            # otherwise be re-sharded on every later device call.
            mesh = getattr(self.classifier, "mesh", None)
            if mesh is not None:
                import jax
                from jax.sharding import NamedSharding, PartitionSpec as P

                variables = jax.device_put(variables, NamedSharding(mesh, P()))
            # Probe device call (the endpoint contract): one
            # smallest-bucket forward on the NEW weights must complete and
            # return finite probabilities before the swap — catches what
            # the structural gate can't (NaN/Inf weight sets with correct
            # shapes). Also warms the transfer, so the first real request
            # after the swap pays nothing.
            side = getattr(self.classifier, "host_side",
                           self.classifier.cfg.im_side)
            _, probs = self.classifier._predict(
                variables,
                np.zeros((self._bucket_sizes[0], side, side, 3), np.uint8),
            )
            if not np.all(np.isfinite(np.asarray(probs))):
                raise ValueError("probe device call produced non-finite "
                                 "probabilities")
        except Exception as exc:  # noqa: BLE001
            return 409, {"error": f"checkpoint rejected: {type(exc).__name__}: "
                                  f"{exc}"}
        self.classifier.variables = variables
        self.model_version = {"step": int(step), "path": self.model_dir}
        return 200, {"status": "reloaded", "step": int(step)}

    # -- http ---------------------------------------------------------------
    def _make_handler(server_self):
        class Handler(BaseHTTPRequestHandler):
            # HTTP/1.1 keep-alive: every response carries Content-Length
            # (_send) so the connection can be reused — a client issuing
            # many requests pays ONE TCP setup, not one per request. Paths
            # that do NOT consume the request body (413, POST to an
            # unknown route, /reload with a body) send Connection: close,
            # because unread bytes would be misparsed as the next request.
            protocol_version = "HTTP/1.1"
            # TCP_NODELAY + a buffered wfile: the stdlib default (Nagle on,
            # unbuffered writes) sends every response as two small segments
            # (headers, then body); on a reused connection the body segment
            # sits in Nagle's one-unacked-small-segment hold until the
            # client's DELAYED ack (~40 ms on Linux — fresh connections
            # dodge it only because quickack mode covers their first
            # packets). Measured on the chip: keep-alive p50 96.1 ms vs
            # 48.2 ms per-connection at the same relay; with these two
            # lines the keep-alive path is the faster one, as it should be.
            # The buffer makes headers+body ONE segment; handle_one_request
            # flushes after every request, and the NDJSON stream path
            # flushes per line, so nothing sits in the buffer.
            disable_nagle_algorithm = True
            wbufsize = 64 * 1024
            # Idle keep-alive connections pin a ThreadingHTTPServer thread
            # each; drop them after idle_connection_s of quiet (stdlib
            # closes the connection on the socket read timing out between
            # requests — pinned by test_idle_keepalive_connection_reaped).
            timeout = server_self.idle_connection_s

            def log_message(self, *a):  # quiet
                pass

            def log_request(self, code="-", size="-"):
                # Called by send_response on every answered request —
                # the one choke point that sees every status code. Runs
                # BEFORE the status line is written, so a logging failure
                # (unwritable path, disk full) must never propagate: it
                # would turn every request into a connection reset.
                if server_self._access_log.path is not None:
                    import time as _time

                    t0 = getattr(self, "_t0", None)
                    try:
                        server_self._access_log.emit(
                            "request",
                            method=self.command,
                            path=self.path.partition("?")[0],
                            status=(int(code) if str(code).isdigit()
                                    else str(code)),
                            ms=(round((_time.monotonic() - t0) * 1e3, 3)
                                if t0 is not None else None),
                        )
                    except OSError as exc:
                        from roomnet_tpu.utils.logging import get_logger

                        # drop the log line, keep serving; warn once
                        server_self._access_log.path = None
                        get_logger("server").warning(
                            "access log disabled: %s", exc)

            def _send(self, code: int, payload, headers=()):
                body = (
                    payload if isinstance(payload, bytes) else json.dumps(payload).encode()
                )
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                for k, v in headers:
                    self.send_header(k, v)
                self.end_headers()
                self.wfile.write(body)

            def _send_overloaded(self):
                self._send(429, {"error": "server overloaded, retry later"},
                           headers=(("Retry-After", "1"),))

            def do_GET(self):
                import time as _time

                self._t0 = _time.monotonic()
                if self.path == "/healthz":
                    # Liveness: the HTTP plane answers.
                    self._send(200, {"status": "ok"})
                elif self.path == "/readyz":
                    # Readiness: traffic-worthy — the device worker thread
                    # is alive and the server isn't draining. A k8s-style
                    # gate so a rollout stops routing BEFORE requests start
                    # dying in the queue.
                    worker = (server_self._threads[0]
                              if server_self._threads else None)
                    with server_self._inflight_lock:
                        inflight = server_self._inflight
                    if server_self._draining:
                        self._send(503, {"status": "draining",
                                         "inflight": inflight})
                    elif (not server_self._stop.is_set()
                            and worker is not None and worker.is_alive()):
                        self._send(200, {"status": "ready",
                                         "inflight": inflight})
                    else:
                        self._send(503, {
                            "status": "not ready",
                            "stopping": server_self._stop.is_set(),
                        })
                elif self.path == "/labels":
                    self._send(200, server_self.classifier.class_labels)
                elif self.path == "/version":
                    self._send(200, server_self.model_version)
                elif self.path == "/metrics":
                    from roomnet_tpu.utils.profiling import SPANS

                    self._send(200, SPANS.summary())
                else:
                    self._send(404, {"error": "not found"})

            def do_POST(self):
                import time as _time

                self._t0 = _time.monotonic()
                path, _, query = self.path.partition("?")
                if path in ("/classify", "/classify_batch"):
                    # Counted from HERE through the response write: a
                    # request still reading its body, decoding, or writing
                    # a large response to a slow client must hold the
                    # drain open (slot accounting alone releases too
                    # early — at _run_job return, before the write).
                    with server_self._inflight_lock:
                        server_self._active_requests += 1
                    try:
                        if server_self._draining:
                            # Shed BEFORE reading the body (it may be huge
                            # and this request is doomed); the unread
                            # bytes force a close.
                            self._send(503, {"error": "server draining"},
                                       headers=(("Connection", "close"),
                                                ("Retry-After", "1")))
                        elif path == "/classify":
                            self._classify_single()
                        else:
                            self._classify_batch(
                                stream="stream=1" in query.split("&"))
                    finally:
                        with server_self._inflight_lock:
                            server_self._active_requests -= 1
                elif path == "/reload":
                    self._drain_small_body()
                    code, payload = server_self._reload_latest()
                    self._send(code, payload)
                else:
                    self._drain_small_body()
                    self._send(404, {"error": "not found"})

            def _drain_small_body(self):
                """Consume an incidental request body so keep-alive framing
                stays intact on endpoints that ignore bodies; anything big,
                chunked, or malformed forces a close instead."""
                if "chunked" in self.headers.get("Transfer-Encoding",
                                                 "").lower():
                    self.close_connection = True
                    return
                try:
                    length = int(self.headers.get("Content-Length", 0))
                except ValueError:
                    self.close_connection = True
                    return
                if 0 < length <= (1 << 16):
                    self.rfile.read(length)
                elif length:
                    self.close_connection = True

            def _budget_s(self) -> float | None:
                """Per-request timeout budget: X-Timeout-Seconds header,
                clamped by _run_job to the server's request_timeout_s cap
                (a client may ask for LESS time, never more)."""
                raw = self.headers.get("X-Timeout-Seconds")
                if raw is None:
                    return None
                try:
                    return float(raw)
                except ValueError:
                    return None

            def _read_body(self):
                """Read the request body, or None after answering 413.

                The Content-Length check runs BEFORE any read: buffering a
                multi-GB body just to reject it would let a handful of
                oversized posts OOM the host before admission control ever
                runs."""
                if "chunked" in self.headers.get("Transfer-Encoding", "").lower():
                    # We size admission off Content-Length; a chunked body
                    # has none and its framing would poison the keep-alive
                    # stream, so require a length (RFC 9110 411).
                    self._send(411, {"error": "chunked bodies unsupported; "
                                              "send Content-Length"},
                               headers=(("Connection", "close"),))
                    return None
                try:
                    length = int(self.headers.get("Content-Length", 0))
                except ValueError:
                    self._send(400, {"error": "malformed Content-Length"},
                               headers=(("Connection", "close"),))
                    return None
                if length > server_self.max_body_bytes:
                    # Connection: close — the oversized body is never read,
                    # so this connection cannot be reused.
                    self._send(413, {
                        "error": f"body too large ({length} bytes; max "
                                 f"{server_self.max_body_bytes})"},
                        headers=(("Connection", "close"),))
                    return None
                return self.rfile.read(length)

            def _classify_single(self):
                from roomnet_tpu.utils.profiling import trace

                with trace("serve/request"):
                    body = self._read_body()
                    if body is None:
                        return
                    out = server_self._run_job([body], budget_s=self._budget_s())
                if out == "overloaded":
                    self._send_overloaded()
                    return
                job, images = out
                if job.results[0] is not None:
                    self._send(200, job.results[0])
                elif images[0] is None:
                    self._send(400, {"error": "undecodable image"})
                elif job.error:
                    # Server-side failure on a valid request ("device_error",
                    # "shutting_down"): 5xx so HTTP clients retry instead of
                    # treating it as caller error.
                    self._send(503, {"error": f"inference backend: {job.error}"})
                elif not job.event.is_set():
                    self._send(504, {"error": "inference timeout"})
                else:
                    self._send(503, {"error": "inference unavailable"})

            def _classify_batch(self, stream: bool = False):
                from roomnet_tpu.utils.profiling import trace

                with trace("serve/request_batch"):
                    raw = self._read_body()
                    if raw is None:
                        return
                    try:
                        payload = json.loads(raw)
                        images = payload["images"]
                        assert isinstance(images, list)
                    except Exception:
                        self._send(400, {"error": "body must be JSON "
                                                  '{"images": [base64, ...]}'})
                        return
                    if not images:
                        if stream:
                            self._start_stream()
                        else:
                            self._send(200, {"results": []})
                        return
                    # Size cap BEFORE any base64 work: rejection must be
                    # cheap — decoding 10k blobs just to answer 413 defeats
                    # the shed-load-fast design.
                    if len(images) > server_self.max_inflight:
                        self._send(413, {
                            "error": f"too many images "
                                     f"(max {server_self.max_inflight})"})
                        return
                    try:
                        bodies = [base64.b64decode(s) for s in images]
                    except Exception:
                        self._send(400, {"error": "invalid base64 image"})
                        return
                    if stream:
                        self._classify_batch_stream(bodies)
                        return
                    out = server_self._run_job(bodies, budget_s=self._budget_s())
                if out == "overloaded":
                    self._send_overloaded()
                    return
                job, images = out
                if job.error:
                    self._send(503, {"error": f"inference backend: {job.error}"})
                    return
                if not job.event.is_set():
                    self._send(504, {"error": "inference timeout"})
                    return
                results = [
                    r if r is not None else {"error": "undecodable image"}
                    for r in job.results
                ]
                self._send(200, {"results": results})

            def _start_stream(self):
                """NDJSON response head: length unknown up front, so the
                stream ends by connection close (HTTP/1.0 semantics)."""
                self.protocol_version = "HTTP/1.0"
                self.send_response(200)
                self.send_header("Content-Type", "application/x-ndjson")
                self.send_header("Connection", "close")
                self.end_headers()

            def _classify_batch_stream(self, bodies):
                """POST /classify_batch?stream=1 — one NDJSON line per image
                ({"index": i, ...result-or-error}), emitted as each
                max_batch chunk's device call completes: first results
                after ONE device call, not after the whole batch."""
                # Admission check happens inside _run_stream, before any
                # bytes of the 200 head are written — overload still sheds
                # with a clean 429.
                sent_head = []

                def emit(i, result):
                    if not sent_head:
                        self._start_stream()
                        sent_head.append(True)
                    line = dict(result)
                    line["index"] = i
                    self.wfile.write((json.dumps(line) + "\n").encode())
                    self.wfile.flush()

                out = server_self._run_stream(
                    bodies, self._budget_s(), emit
                )
                if out == "overloaded":
                    self._send_overloaded()
                elif not sent_head:
                    self._start_stream()  # all-undecodable: still a stream

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
        if self.auto_reload_s is not None:
            self._threads.append(
                threading.Thread(target=self._auto_reload_loop, daemon=True)
            )
        for t in self._threads:
            t.start()
        return self

    def _auto_reload_loop(self):
        from roomnet_tpu.utils.logging import get_logger

        log = get_logger("server")
        last_rejected = None  # warn once per failing step, not per poll
        last_poll_error = None  # warn once per distinct failure, not per poll
        while not self._stop.wait(self.auto_reload_s):
            try:
                # Store re-opened per poll: the FORMAT can change under us
                # (an empty dir is 'orbax' until the first npz lands).
                ckpts = self._open_store().list_checkpoints()
            except Exception as exc:  # noqa: BLE001
                # A transient poll failure (permissions blip, dir swapped
                # out from under us) must not kill the thread: a dead
                # poller silently serves stale weights forever. Warned once
                # per distinct error — a PERSISTENT failure at a sub-second
                # poll interval would otherwise flood the log.
                err = f"{type(exc).__name__}: {exc}"
                if err != last_poll_error:
                    last_poll_error = err
                    log.warning("auto-reload: poll failed (%s); retrying "
                                "(logged once until it changes)", err)
                continue
            last_poll_error = None
            if not ckpts:
                continue
            step = ckpts[-1][0]
            current = self.model_version.get("step")
            if current is not None and step <= current:
                continue
            code, payload = self._reload_latest()
            if code == 200:
                last_rejected = None
                log.info("auto-reload: now serving step %s", payload["step"])
            elif step != last_rejected:
                last_rejected = step
                log.warning("auto-reload: step %s rejected (%s); keeping "
                            "step %s", step, payload.get("error"), current)

    def begin_drain(self):
        """Start refusing NEW classify work (503 + Connection: close;
        /readyz goes 503 so an LB stops routing) while the worker keeps
        answering everything already admitted. Health/metrics endpoints
        stay up throughout."""
        self._draining = True

    def wait_drained(self, timeout_s: float) -> bool:
        """Block until every in-flight classify request has been fully
        ANSWERED — no active handlers (counted from do_POST entry through
        the response write), no held admission slots, empty job queue — or
        timeout_s. Returns True when fully drained."""
        import time as _time

        t_end = _time.monotonic() + timeout_s
        while _time.monotonic() < t_end:
            with self._inflight_lock:
                n = self._inflight + self._active_requests
            if n == 0 and self._jobs.empty():
                return True
            _time.sleep(0.02)
        return False

    def stop(self):
        self._stop.set()
        if self._httpd:
            self._httpd.shutdown()
            self._httpd.server_close()
        self._decode_pool.shutdown(wait=False, cancel_futures=True)
        # Fail queued jobs FAST: handlers blocked in event.wait would
        # otherwise sit out their full budgets on a server that will never
        # answer them. Drained a few times: a handler that raced past the
        # _stop check in _run_job may put its job just after the first
        # sweep.
        import time as _time

        for sweep in range(3):
            while True:
                try:
                    job = self._jobs.get_nowait()
                except queue.Empty:
                    break
                job.error = job.error or "shutting_down"
                job.event.set()
            if sweep < 2:
                _time.sleep(0.05)

    def serve_forever(self):
        """Run until interrupted. SIGTERM (systemd/k8s stop) gets the same
        clean shutdown as Ctrl-C: with drain_s > 0 the server first drains —
        /readyz flips to 503 so the LB stops routing, new classify work is
        shed with 503, and every admitted request gets its answer (up to
        drain_s) — then stop() fails whatever remains fast instead of the
        process dying mid-handler with client-visible resets — mirroring
        the trainer's preemption handling (train/loop.py)."""
        import signal
        import threading as _threading

        def _sigterm(*_):
            raise KeyboardInterrupt

        # Install BEFORE start(): a stop signal racing server startup must
        # hit the clean path, not the default process kill.
        if _threading.current_thread() is _threading.main_thread():
            prev = signal.signal(signal.SIGTERM, _sigterm)
        else:
            prev = None  # signal.signal only works from the main thread
        try:
            self.start()
            self._threads[1].join()
        except KeyboardInterrupt:
            pass
        finally:
            try:
                if self.drain_s > 0:
                    self.begin_drain()
                    self.wait_drained(self.drain_s)
            except KeyboardInterrupt:
                pass  # second signal during the drain: skip straight to stop
            finally:
                self.stop()
                if prev is not None:
                    signal.signal(signal.SIGTERM, prev)

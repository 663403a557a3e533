"""Benchmark: batched 224x224 inference throughput on one chip (bf16 serving
path), plus p50 latency and training throughput extras.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Baseline note: the reference publishes NO throughput/latency numbers
(BASELINE.md). The only throughput derivable from its artifacts is the
end-to-end training rate: 157,700 steps x 45 imgs / ~48 h ≈ 41 img/s on a
GTX 1070 (README.md:38,53,54). `vs_baseline` compares our training-step
throughput (same batch 45) against that 41 img/s — the one apples-to-apples
number that exists. The primary metric is batched inference images/sec/chip
(the BASELINE.json north star), reported for the bf16 serving config, which
preserves exact argmax parity with the reference graph on the golden batch
(tests/golden; |dlogit| <= 0.08, argmax identical).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REF_TRAIN_IPS = 157_700 * 45 / (48 * 3600)  # ≈ 41.05 img/s (GTX 1070)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _wait_for_backend(deadline_s: float):
    """Retry backend init until it answers or the deadline passes.

    The axon tunnel has a measured failure mode where a wedged prior
    session makes init BLOCK ~40 min and then raise UNAVAILABLE — after
    which the stale session has expired and the NEXT attempt succeeds.
    jax caches a failed backend for the life of the process, so each
    retry must clear_backends() first. Without this, a bench launched
    into that window produces no artifact at all."""
    import jax

    t_end = time.monotonic() + deadline_s
    attempt = 0
    while True:
        attempt += 1
        try:
            devs = jax.devices()
            log(f"backend ready: {len(devs)}x {devs[0].platform}")
            return
        except RuntimeError as e:
            if time.monotonic() >= t_end:
                raise
            log(f"backend init attempt {attempt} failed ({e}); retrying...")
            try:
                # jax caches the failed platform for the process lifetime;
                # this is the supported reset (jax.clear_backends is gone
                # in this jax version).
                import jax.extend.backend

                jax.extend.backend.clear_backends()
            except Exception:
                pass
            time.sleep(min(30.0, max(1.0, t_end - time.monotonic())))


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    # One wedged-session recovery window (~40 min) + slack, env-overridable.
    deadline_s = float(os.environ.get("BENCH_BACKEND_DEADLINE_S", 4500))
    try:
        _wait_for_backend(deadline_s)
    except RuntimeError as e:
        # The TPU tunnel can be down for hours at a stretch (measured:
        # 2026-08-17 21:40 UTC onward, >13 h of consecutive UNAVAILABLE
        # inits). Dying with a stack trace leaves the driver no artifact
        # at all; emit an explicit outage record instead — null values,
        # never substituted numbers. The last driver-captured TPU numbers
        # live in BENCH_r03.json; mid-round TPU measurements are in
        # PERF.md's round-4 sections.
        log(f"backend unavailable for the full {deadline_s:.0f}s window: {e}")
        print(json.dumps({
            "metric": "batched inference images/sec/chip @224x224 "
                      "(bf16, batch 256)",
            "value": None,
            "unit": "images/sec",
            "vs_baseline": None,
            "extras": {
                "error": "TPU backend unavailable for the full "
                         f"{deadline_s:.0f}s retry window (axon tunnel "
                         "outage; every init attempt raised UNAVAILABLE)",
                "last_good_artifact": "BENCH_r03.json",
                "mid_round_tpu_measurements": "PERF.md round-4 sections",
            },
        }))
        return

    from roomnet_tpu.models.roomnet import (
        FAST_CONFIG,
        forward,
        init_variables,
        normalize_bgr_uint8,
    )
    from roomnet_tpu.params import schema
    from roomnet_tpu.train.step import TrainHParams, init_train_state, make_train_step

    here = os.path.dirname(os.path.abspath(__file__))
    ckpt = os.path.join(here, "artifacts", "roomnet_params.npz")
    if os.path.exists(ckpt):
        variables = schema.unflatten_variables(dict(np.load(ckpt)))
    else:
        variables = init_variables(jax.random.PRNGKey(0))

    rng = np.random.RandomState(0)
    cfg = FAST_CONFIG

    # ---- batched inference throughput (primary) ---------------------------
    BATCH = 256
    x = rng.randint(0, 256, size=(BATCH, 224, 224, 3), dtype=np.uint8)

    @jax.jit
    def predict(variables, x_uint8):
        logits = forward(variables, normalize_bgr_uint8(x_uint8), cfg)
        return jnp.argmax(logits, axis=-1)

    # Timing methodology: on remote/async backends block_until_ready() can
    # return before real completion, and full-array fetches pay a tunnel
    # round trip per call. Submit a pipeline of batches and fetch ONE scalar
    # from the last result — device executions are stream-ordered, so the
    # fetch bounds all of them; the single round trip amortizes over N.
    xd = jax.device_put(x)
    log("compiling batched inference (bf16)...")
    int(predict(variables, xd)[0])  # compile + full sync
    iters = 30
    t0 = time.perf_counter()
    results = [predict(variables, xd) for _ in range(iters)]
    _ = int(results[-1][0])
    infer_ips = BATCH * iters / (time.perf_counter() - t0)
    log(f"inference: {infer_ips:.0f} img/s")

    # Machine-readable utilization (round-3 review weak #3): the measured
    # per-call wall next to the analytic roofline — FLOPs are exact from
    # the geometry, bounds are v5e bf16 peak (197 TFLOP/s) and HBM
    # (819 GB/s), same constants as PERF.md. pct_of_ideal compares against
    # the per-fusion-group max(compute, traffic) lower bound, which is the
    # honest whole-forward utilization number (conv-only MXU% is higher;
    # the pool/BN groups are HBM-bound by design — see PERF.md roofline).
    from roomnet_tpu.utils.roofline import summarize as roofline_summarize

    device_forward_ms = 1e3 * BATCH / infer_ips  # incl. fused argmax
    roofline = roofline_summarize(cfg, BATCH, measured_s=BATCH / infer_ips)
    log(f"device forward (batch {BATCH}): {device_forward_ms:.1f} ms = "
        f"{roofline['achieved_tflops']:.1f} TFLOP/s "
        f"({roofline['pct_bf16_roofline']:.1f}% of bf16 peak, "
        f"{roofline['pct_of_ideal']:.1f}% of the analytic roofline; "
        f"HBM-bound fraction {roofline['hbm_bound_time_fraction']:.2f})")

    # ---- p50 single-image latency (includes one host round trip) ----------
    x1 = jax.device_put(x[:1])
    int(predict(variables, x1)[0])
    lats = []
    for _ in range(50):
        t0 = time.perf_counter()
        _ = int(predict(variables, x1)[0])
        lats.append(time.perf_counter() - t0)
    p50_ms = float(np.percentile(lats, 50) * 1e3)
    log(f"p50 single-image latency: {p50_ms:.2f} ms")

    # ---- training throughput (vs the reference's 41 img/s) ----------------
    TRAIN_BATCH = 45  # reference TRAIN_BATCH_SIZE (train.py:33)
    hp = TrainHParams()  # final-phase reference config: frozen BN, no dropout
    state = init_train_state(variables, hp)
    step = jax.jit(make_train_step(hp, cfg), donate_argnums=(0,))
    xt = jax.device_put(
        rng.randint(0, 256, size=(TRAIN_BATCH, 224, 224, 3), dtype=np.uint8)
    )
    yt = jax.device_put(rng.randint(0, 6, size=(TRAIN_BATCH,), dtype=np.int32))
    key = jax.random.PRNGKey(0)
    log("compiling train step (bf16 compute, f32 params)...")
    state, metrics = step(state, xt, yt, key)
    _ = float(metrics["loss"])  # compile + full sync
    iters = 20
    # Median of 3 chains — ONE timing rule for every bench segment (the
    # e2e segment below is also median-of-3; round-4 review weak #5: the
    # old best-of-2 here was a methodological fork that biased the one
    # number vs_baseline is computed from). A single chain occasionally
    # reads ~10% low when a relay hiccup lands inside it; the median
    # absorbs that without cherry-picking the fastest.
    chain_ips = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, metrics = step(state, xt, yt, key)  # serialized via state dep
        _ = float(metrics["loss"])  # one scalar fetch bounds the chain
        chain_ips.append(TRAIN_BATCH * iters / (time.perf_counter() - t0))
    train_ips = float(np.median(chain_ips))
    log(f"training: {train_ips:.0f} img/s (chains {[round(c) for c in chain_ips]}; "
        f"reference: {REF_TRAIN_IPS:.1f})")

    # Device training CAPACITY at batch 128: batch 45 is bound by the
    # device's small-batch latency floor (kernel occupancy), not FLOPs —
    # measured batch 45 and 128 cost the SAME ~50 ms wall per step, and a
    # lax.scan multi-step ruled out host dispatch as the cause (PERF.md
    # round 3). The apples-to-apples batch-45 number therefore
    # understates the chip ~2.7x; this reports what batch >=128 sustains.
    CAP_BATCH = 128
    state_c = init_train_state(variables, hp)
    xc = jax.device_put(
        rng.randint(0, 256, size=(CAP_BATCH, 224, 224, 3), dtype=np.uint8)
    )
    yc = jax.device_put(rng.randint(0, 6, size=(CAP_BATCH,), dtype=np.int32))
    state_c, metrics = step(state_c, xc, yc, key)
    _ = float(metrics["loss"])  # compile (new batch shape) + sync
    cap_chains = []
    for _ in range(3):  # same median-of-3 rule as every other segment
        t0 = time.perf_counter()
        for _ in range(iters):
            state_c, metrics = step(state_c, xc, yc, key)
        _ = float(metrics["loss"])
        cap_chains.append(CAP_BATCH * iters / (time.perf_counter() - t0))
    train_cap_ips = float(np.median(cap_chains))
    del state_c, xc, yc
    log(f"training capacity (batch {CAP_BATCH}): {train_cap_ips:.0f} img/s")

    # ---- end-to-end directory inference (decode -> device -> argmax) ------
    # THE canonical e2e harness (PERF.md and README quote this number):
    # 1839 images — the reference val-set size (README.md:3) — as 640x480
    # q88 JPEGs with photo-like structured content (64 unique images
    # replicated; decode cost is per-file and content-realistic, unlike the
    # pure-noise JPEGs an earlier bench used, whose entropy decoding is
    # pathologically slow).
    e2e_ips = None
    tmp = None
    try:
        import shutil
        import tempfile

        import cv2

        from roomnet_tpu.infer.classify import RoomNetClassifier
        from tools.make_synth_dataset import make_image

        tmp = tempfile.mkdtemp(prefix="bench_e2e_")
        gen = np.random.RandomState(0)
        uniq = []
        for i in range(64):
            im = make_image(i % 6, gen, 480, 640)[:, :, ::-1]  # BGR for imwrite
            p = os.path.join(tmp, f"u_{i:02d}.jpg")
            cv2.imwrite(p, im, [cv2.IMWRITE_JPEG_QUALITY, 88])
            uniq.append(p)
        paths = []
        for i in range(1839):
            p = os.path.join(tmp, f"img_{i:04d}.jpg")
            shutil.copy(uniq[i % 64], p)
            paths.append(p)
        clf = RoomNetClassifier(variables, cfg, batch_size=BATCH)
        clf.predict_paths(paths[:4])  # warm compile
        # The e2e number is bounded by the host->device link: a 256-image
        # uint8 batch is 38.5 MB, and on this tunneled relay the transfer
        # bandwidth wanders 2-3x across minutes (measured 18-55 MB/s).
        # Record the link speed NEXT TO the e2e number so every BENCH json
        # self-documents its relay conditions.
        put_s = []
        for _ in range(3):
            t0 = time.perf_counter()
            xd_probe = jax.device_put(x)
            # Scalar element fetch, NOT block_until_ready: the latter is
            # effectively async under the axon relay (see the timing
            # methodology note above) and would time the dispatch, not the
            # 38.5 MB transfer. The fetch adds one ~30 ms round trip on a
            # 1-2 s transfer — noise.
            int(xd_probe[0, 0, 0, 0])
            put_s.append(time.perf_counter() - t0)
            del xd_probe
        relay_mbps = x.nbytes / 1e6 / float(np.median(put_s))
        log(f"relay host->device bandwidth: {relay_mbps:.0f} MB/s "
            f"(ceiling {relay_mbps * 1e6 / (224 * 224 * 3):.0f} img/s)")
        # Median of 3: the relay's host->device bandwidth wanders
        # run to run; a single sample is too noisy to be the headline.
        from roomnet_tpu.utils.profiling import SPANS

        SPANS.reset()  # warmup spans out; the 3 timed runs only
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            _, _, ok = clf.predict_paths(paths)
            runs.append(int(ok.sum()) / (time.perf_counter() - t0))
        e2e_ips = float(np.median(runs))
        # Per-stage breakdown (round-3 review item #1): predict_paths
        # traces each pipeline stage into SPANS; what dominates here IS
        # the bottleneck (stages overlap — the slowest sets the rate).
        e2e_stages = {
            k.split("/", 1)[1]: round(v["total_s"] / 3, 3)
            for k, v in SPANS.summary().items()
            if k.startswith("e2e/")
        }
        log(f"e2e stage breakdown (s/run, stages overlap): {e2e_stages}")
        decode_s = e2e_stages.get("decode", 0.0)
        e2e_decode_ips = 1839 / decode_s if decode_s else None
        # Relay-normalized pipeline quality: e2e as a fraction of that
        # run's transfer ceiling (images/s the measured link bandwidth
        # admits). Comparable ACROSS rounds even though the link itself
        # wanders 2-3x; 1.0 = perfectly transfer-bound pipelining. The
        # PIPELINE ceiling also accounts for this host's decode rate
        # (measured in-run): a perfectly-overlapped pipeline runs at
        # min(decode, transfer) — pct_of_pipeline_ceiling is the design-
        # quality number, pct_of_relay_ceiling the transfer-only one.
        ceiling = relay_mbps * 1e6 / (224 * 224 * 3)
        e2e_vs_ceiling = e2e_ips / ceiling
        pipe_ceiling = (
            min(ceiling, e2e_decode_ips) if e2e_decode_ips else ceiling
        )
        e2e_vs_pipe = e2e_ips / pipe_ceiling
        log(f"end-to-end directory inference (1839 imgs, median of 3): "
            f"{e2e_ips:.0f} img/s  (runs: {[round(r) for r in runs]}; "
            f"{100 * e2e_vs_ceiling:.0f}% of this run's relay ceiling, "
            f"{100 * e2e_vs_pipe:.0f}% of the pipeline ceiling "
            f"min(decode {e2e_decode_ips or 0:.0f}, relay {ceiling:.0f}))")
    except Exception as e:  # e2e is an extra; never fail the bench on it
        log(f"e2e segment skipped: {type(e).__name__}: {e}")
    finally:
        # ~1900 JPEGs (~100 MB) per run: repeated rounds on a long-lived
        # box would pile gigabytes into /tmp.
        if tmp is not None:
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)

    # ---- steady-state serving latency (persistent daemon, warm device) ----
    # Every serving-segment local the JSON assembly references is
    # initialized HERE: the segment's try can die between any two
    # assignments (relay hiccups are the bench's documented failure mode),
    # and an unbound local at assembly time would crash the whole run
    # after the expensive TPU work, producing NO artifact.
    serve_p50_ms = serve_p99_ms = serve_p50_keepalive_ms = None
    serve_relay_mbps = serve_relay_after_mbps = None
    serve_loops_interleaved = None
    serve_rps = serve_burst_transfer_pct = None
    burst_calls = burst_mb = None
    try:
        import tempfile
        import urllib.request

        import cv2

        from roomnet_tpu.infer.classify import RoomNetClassifier
        from roomnet_tpu.infer.server import ClassifierServer
        from tools.make_synth_dataset import make_image

        # Serving uses a SMALL device batch: the daemon pads every device
        # call to the classifier's batch size, and a 256-batch pad ships
        # 38 MB through the host->device link per lone request (measured
        # 425 ms p50). Batch 8 is the sensible single-stream serving shape.
        # max_inflight=64: the concurrent segment below drives a 64-way
        # burst to measure micro-batching throughput; the default admission
        # cap (4x batch) would shed half of it with 429s by design.
        # warmup=True: the bucketed worker uses one jit signature per
        # power-of-2 batch (1/2/4/8); without precompiling them the timed
        # burst would pay fresh compiles (minutes, cold cache) and 504.
        srv = ClassifierServer(
            RoomNetClassifier(variables, cfg, batch_size=8), port=0,
            max_inflight=64, warmup=True,
        ).start()
        # Self-contained request image (independent of the e2e segment);
        # encoded in memory, nothing left behind in /tmp.
        okj, buf = cv2.imencode(
            ".jpg", make_image(2, np.random.RandomState(1), 480, 640)[:, :, ::-1],
            [cv2.IMWRITE_JPEG_QUALITY, 88],
        )
        assert okj
        body = buf.tobytes()

        def post():
            req = urllib.request.Request(
                f"http://127.0.0.1:{srv.port}/classify", data=body, method="POST"
            )
            with urllib.request.urlopen(req, timeout=60) as r:
                r.read()

        post()  # warm the daemon's device path
        # Relay conditions AT SERVING TIME (round-3 review weak #2: the
        # serving numbers regressed r02->r03 with no way to attribute the
        # delta to environment vs code — the relay wanders 2-3x across
        # minutes, so the e2e-segment probe from minutes ago is stale).
        t0 = time.perf_counter()
        xp = jax.device_put(x)
        int(xp[0, 0, 0, 0])
        serve_relay_mbps = x.nbytes / 1e6 / (time.perf_counter() - t0)
        del xp
        log(f"relay at serving time: {serve_relay_mbps:.0f} MB/s")
        # Per-connection and keep-alive latency measured INTERLEAVED in one
        # window (round-4 review weak #1: the two loops used to run minutes
        # apart, so the relay's 2-3x drift could manufacture — or mask — a
        # keep-alive delta with no probe to attribute it; BENCH_r04's
        # 44.5-vs-38.6 ms "regression" was exactly that failure mode).
        # Each iteration issues one fresh-connection request (the p50
        # definition is unchanged: new TCP per request) and one request on
        # a single persistent HTTP/1.1 connection; both samples therefore
        # span the SAME relay conditions, and relay probes bracket the
        # window so any residual drift is in-artifact.
        import http.client

        img_kb = 224 * 224 * 3 / 1e3
        conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=60)
        lat, lat_ka = [], []
        keepalive_err = None
        try:
            conn.request("POST", "/classify", body=body)  # warm the conn
            conn.getresponse().read()
            for _ in range(40):
                t0 = time.perf_counter()
                post()
                lat.append(time.perf_counter() - t0)
                t0 = time.perf_counter()
                conn.request("POST", "/classify", body=body)
                conn.getresponse().read()
                lat_ka.append(time.perf_counter() - t0)
        except Exception as exc:  # noqa: BLE001
            keepalive_err = exc
        finally:
            conn.close()
        if keepalive_err is not None:
            # The window aborted (either call can be the one that raised).
            # The interleave guarantee is void, so DISCARD the partial
            # keep-alive samples rather than report a p50 whose twin spans
            # a different window, and top the per-connection samples up to
            # the full count so the headline p50 is never undersampled (a
            # mid-loop abort used to silently report a p50 of as few as 1
            # sample). If post() itself is broken, the top-up raises into
            # the segment's except and the whole segment is skipped.
            log(f"interleaved window aborted after {len(lat)} per-conn / "
                f"{len(lat_ka)} keep-alive samples "
                f"({type(keepalive_err).__name__}: {keepalive_err}); "
                "discarding keep-alive, topping up per-connection")
            lat_ka = []
            while len(lat) < 40:
                t0 = time.perf_counter()
                post()
                lat.append(time.perf_counter() - t0)
        serve_loops_interleaved = keepalive_err is None
        serve_p50_ms = float(np.percentile(lat, 50) * 1e3)
        serve_p99_ms = float(np.percentile(lat, 99) * 1e3)
        # Relay AFTER the window: with the before-probe this bounds the
        # drift any latency delta could hide in.
        t0 = time.perf_counter()
        xp = jax.device_put(x)
        int(xp[0, 0, 0, 0])
        serve_relay_after_mbps = x.nbytes / 1e6 / (time.perf_counter() - t0)
        del xp
        serve_transfer_ms = img_kb / serve_relay_mbps  # KB / (MB/s) = ms
        log(f"steady-state serving p50 (HTTP+decode+device): "
            f"{serve_p50_ms:.2f} ms  (p99 {serve_p99_ms:.1f} ms; "
            f"bucket transfer alone {serve_transfer_ms:.1f} ms at this relay; "
            f"relay after the window {serve_relay_after_mbps:.0f} MB/s)")
        if lat_ka and len(lat_ka) == 40:
            serve_p50_keepalive_ms = float(np.percentile(lat_ka, 50) * 1e3)
            log(f"steady-state serving p50 over one keep-alive connection "
                f"(same window): {serve_p50_keepalive_ms:.2f} ms")
        else:
            serve_p50_keepalive_ms = None
            if keepalive_err is not None:
                log(f"keep-alive p50 segment skipped: "
                    f"{type(keepalive_err).__name__}: {keepalive_err}")
        # Concurrent throughput: the worker coalesces queued requests into
        # one padded device call, so aggregate req/s should far exceed
        # 1/p50 under load (the micro-batching design claim, measured).
        import threading
        import urllib.request as _ur

        def device_call_stats():
            with _ur.urlopen(
                f"http://127.0.0.1:{srv.port}/metrics", timeout=30
            ) as r:
                import json as _json

                m = _json.loads(r.read())
            return (
                m.get("serve/device_call", {}).get("count", 0),
                # Shipped bytes MEASURED by the worker per device call
                # (incl. bucket padding) — round-4 review weak #3: the
                # old full-bucket assumption could overstate ~2x.
                m.get("serve/device_call_bytes", {}).get("total", 0),
            )

        calls_before, bytes_before = device_call_stats()
        n_req = 64
        errs = []

        def hit():
            try:
                post()
            except Exception as exc:  # noqa: BLE001
                errs.append(exc)

        t0 = time.perf_counter()
        threads = [threading.Thread(target=hit) for _ in range(n_req)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        burst_s = time.perf_counter() - t0
        calls_after, bytes_after = device_call_stats()
        burst_calls = calls_after - calls_before
        srv.stop()
        if not errs:
            serve_rps = n_req / burst_s
            # Transfer-bound share of the burst: the bytes the worker
            # MEASURED shipping (actual bucket sizes, padding included)
            # over the measured relay. High % = the relay explains the
            # throughput; low % = code overhead.
            burst_mb = (bytes_after - bytes_before) / 1e6
            burst_transfer_s = burst_mb / serve_relay_mbps
            serve_burst_transfer_pct = 100 * burst_transfer_s / burst_s
            log(f"concurrent serving throughput ({n_req} in-flight): "
                f"{serve_rps:.1f} req/s  ({burst_calls} device calls, "
                f"{burst_mb:.1f} MB shipped (measured) = "
                f"{serve_burst_transfer_pct:.0f}% "
                f"of the burst transfer-bound at {serve_relay_mbps:.0f} MB/s)")
        else:
            serve_rps = None
            serve_burst_transfer_pct = None
            burst_calls = None
            burst_mb = None
            log(f"concurrent segment errors: {len(errs)}")
    except Exception as e:
        serve_rps = None
        log(f"serving-latency segment skipped: {type(e).__name__}: {e}")

    result = {
        "metric": "batched inference images/sec/chip @224x224 (bf16, batch 256)",
        "value": round(infer_ips, 1),
        "unit": "images/sec",
        "vs_baseline": round(train_ips / REF_TRAIN_IPS, 2),
        "extras": {
            "device_forward_ms_batch256": round(device_forward_ms, 2),
            "pct_bf16_roofline": round(roofline["pct_bf16_roofline"], 1),
            "pct_of_analytic_roofline": round(roofline["pct_of_ideal"], 1),
            "hbm_bound_time_fraction": round(
                roofline["hbm_bound_time_fraction"], 3
            ),
            "model_forward_gflops_batch256": round(
                roofline["total_gflops"], 1
            ),
            "end_to_end_dir_inference_images_per_sec": (
                round(e2e_ips, 1) if e2e_ips else None
            ),
            "e2e_harness": "1839 x 640x480 q88 JPEGs, photo-like content",
            "relay_host_to_device_MBps": (
                round(relay_mbps, 1) if e2e_ips else None
            ),
            "e2e_pct_of_relay_ceiling": (
                round(100 * e2e_vs_ceiling, 1) if e2e_ips else None
            ),
            "e2e_pct_of_pipeline_ceiling": (
                round(100 * e2e_vs_pipe, 1) if e2e_ips else None
            ),
            "e2e_decode_images_per_sec_in_run": (
                round(e2e_decode_ips, 1) if e2e_ips and e2e_decode_ips else None
            ),
            "e2e_stage_seconds_per_run": e2e_stages if e2e_ips else None,
            "train_images_per_sec_batch45": round(train_ips, 1),
            "train_capacity_images_per_sec_batch128": round(train_cap_ips, 1),
            "reference_train_images_per_sec_gtx1070": round(REF_TRAIN_IPS, 1),
            "p50_single_image_latency_ms": round(p50_ms, 3),
            "steady_state_serving_p50_ms": (
                round(serve_p50_ms, 3) if serve_p50_ms else None
            ),
            "steady_state_serving_p99_ms": (
                round(serve_p99_ms, 3) if serve_p50_ms else None
            ),
            "steady_state_serving_p50_keepalive_ms": (
                round(serve_p50_keepalive_ms, 3)
                if serve_p50_keepalive_ms else None
            ),
            "serving_relay_MBps": (
                round(serve_relay_mbps, 1) if serve_p50_ms else None
            ),
            "serving_relay_after_window_MBps": (
                round(serve_relay_after_mbps, 1)
                if serve_relay_after_mbps else None
            ),
            "serving_latency_loops_interleaved": (
                serve_loops_interleaved if serve_p50_ms else None
            ),
            "concurrent_serving_req_per_sec": (
                round(serve_rps, 1) if serve_rps else None
            ),
            "serving_burst_device_calls": (
                burst_calls if serve_rps else None
            ),
            "serving_burst_shipped_MB_measured": (
                round(burst_mb, 2) if serve_rps else None
            ),
            "serving_burst_transfer_bound_pct": (
                round(serve_burst_transfer_pct, 1) if serve_rps else None
            ),
            "device": str(jax.devices()[0]),
            "vs_baseline_note": "our train img/s / reference train img/s "
            "(only throughput derivable from published artifacts)",
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()

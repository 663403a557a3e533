"""Benchmark: batched 224x224 directory-inference throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Baseline note: the reference publishes NO throughput/latency numbers
(BASELINE.md). The only throughput derivable from its artifacts is the
end-to-end training rate: 157,700 steps x 45 imgs / ~48 h ≈ 41 img/s on a
GTX 1070 (README.md:38,53,54). `vs_baseline` is our *training* images/sec
against that 41 img/s — the one apples-to-apples number that exists. The
primary metric is batched inference images/sec/chip (the BASELINE.json
north star); p50 single-image latency and parity checks ride as extras.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REF_TRAIN_IPS = 157_700 * 45 / (48 * 3600)  # ≈ 41.05 img/s (GTX 1070)


def main():
    import jax
    import jax.numpy as jnp

    from roomnet_tpu.models.roomnet import (
        DEFAULT_CONFIG,
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

    # ---- batched inference throughput (primary) ---------------------------
    BATCH = 256
    x = rng.randint(0, 256, size=(BATCH, 224, 224, 3), dtype=np.uint8)

    @jax.jit
    def predict(variables, x_uint8):
        logits = forward(variables, normalize_bgr_uint8(x_uint8), DEFAULT_CONFIG)
        return jnp.argmax(logits, axis=-1)

    xd = jax.device_put(x)
    predict(variables, xd).block_until_ready()  # compile
    # Warm + measure.
    for _ in range(3):
        predict(variables, xd).block_until_ready()
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        predict(variables, xd).block_until_ready()
    dt = time.perf_counter() - t0
    infer_ips = BATCH * iters / dt

    # ---- p50 single-image latency -----------------------------------------
    x1 = jax.device_put(x[:1])
    predict(variables, x1).block_until_ready()
    lats = []
    for _ in range(50):
        t0 = time.perf_counter()
        predict(variables, x1).block_until_ready()
        lats.append(time.perf_counter() - t0)
    p50_ms = float(np.percentile(lats, 50) * 1e3)

    # ---- training throughput (vs the reference's 41 img/s) ----------------
    TRAIN_BATCH = 45  # reference TRAIN_BATCH_SIZE (train.py:33)
    hp = TrainHParams()
    state = init_train_state(variables, hp)
    step = jax.jit(make_train_step(hp), donate_argnums=(0,))
    xt = jax.device_put(rng.randint(0, 256, size=(TRAIN_BATCH, 224, 224, 3), dtype=np.uint8))
    yt = jax.device_put(rng.randint(0, 6, size=(TRAIN_BATCH,), dtype=np.int32))
    key = jax.random.PRNGKey(0)
    state, _ = step(state, xt, yt, key)  # compile
    jax.block_until_ready(state)
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, xt, yt, key)
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0
    train_ips = TRAIN_BATCH * iters / dt

    result = {
        "metric": "batched inference images/sec/chip @224x224 (f32, batch 256)",
        "value": round(infer_ips, 1),
        "unit": "images/sec",
        "vs_baseline": round(train_ips / REF_TRAIN_IPS, 2),
        "extras": {
            "train_images_per_sec_batch45": round(train_ips, 1),
            "reference_train_images_per_sec_gtx1070": round(REF_TRAIN_IPS, 1),
            "p50_single_image_latency_ms": round(p50_ms, 3),
            "device": str(jax.devices()[0]),
            "vs_baseline_note": "our train img/s / reference train img/s "
            "(only throughput derivable from published artifacts)",
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()

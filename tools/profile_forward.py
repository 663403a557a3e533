"""Per-block forward profile via cumulative prefixes (PERF.md methodology).

Times `forward` truncated after 0..5 blocks on the real chip with the
pipelined submit-N-fetch-scalar pattern; successive differences give the
per-block cost.

Caveat (measured): prefix deltas are approximate because XLA optimizes
each truncated graph independently — e.g. the 3-block prefix can run
SLOWER than the 4-block one (ending at block 2's output forces a layout
that the continued graph avoids). Trust the totals; treat per-block deltas
as indicative. Usage:  python tools/profile_forward.py [batch]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main(batch: int = 256):
    import jax
    import jax.numpy as jnp

    from roomnet_tpu.models.roomnet import (
        FAST_CONFIG as cfg,
        init_variables,
        normalize_bgr_uint8,
    )
    from roomnet_tpu.ops import blocks as B
    from roomnet_tpu.ops.resize import resize_bilinear_tf1
    from roomnet_tpu.params import schema

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    except Exception:
        pass

    ckpt = "artifacts/roomnet_params.npz"
    if os.path.exists(ckpt):
        v = schema.unflatten_variables(dict(np.load(ckpt)))
    else:
        v = init_variables(jax.random.PRNGKey(0), cfg)
    xd = jax.device_put(
        np.random.RandomState(0).randint(0, 256, (batch, 224, 224, 3), np.uint8)
    )

    def run_prefix(v, x, nblocks):
        x = normalize_bgr_uint8(x).astype(cfg.compute_dtype)
        for bi in range(nblocks):
            blk = v["blocks"][bi]
            pool = cfg.block_pools[bi]
            res_in = None
            for d in range(len(blk["conv"])):
                x = B.relu6(B.conv2d_valid(x, blk["conv"][d]))
                if pool is not None:
                    x = B.avg_pool_valid(x, pool[0], pool[1])
                x = B.batch_norm(x, blk["bn"][d])
                if d == 0:
                    res_in = x
            if len(blk["conv"]) > 1:
                x = x + resize_bilinear_tf1(res_in, (x.shape[1], x.shape[2]))
                x = B.batch_norm(x, blk["res_bn"])
        return jnp.sum(x.astype(jnp.float32))

    prev = None
    for nb in range(0, 6):
        fn = jax.jit(lambda v, x, nb=nb: run_prefix(v, x, nb))
        float(fn(v, xd))  # compile + sync
        t0 = time.perf_counter()
        rs = [fn(v, xd) for _ in range(20)]
        float(rs[-1])
        ms = (time.perf_counter() - t0) / 20 * 1e3
        delta = "" if prev is None else f"   block {nb - 1}: {ms - prev:6.2f} ms"
        print(f"prefix {nb}: {ms:7.2f} ms/batch{batch}{delta}", flush=True)
        prev = ms


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)

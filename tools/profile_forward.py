"""Forward profile via cumulative prefixes (PERF.md methodology).

Times `forward` truncated after each block (default) or after each
conv+pool+bn UNIT (`--groups`) on the real chip with the pipelined
submit-N-fetch-scalar pattern; successive differences give the
per-block / per-group cost IN CONTEXT — unlike isolated per-group jits
(tools/profile_groups.py), prefix deltas don't pay the ~2.5 ms
per-dispatch floor of the axon relay, so they are the honest
attribution for "where do the 33 ms go" (PERF.md round-5 table).
`--groups` also prints each unit's analytic bound (utils/roofline.py)
so the measured-vs-bound ratio comes straight off the chip.

Caveat (measured): prefix deltas are approximate because XLA optimizes
each truncated graph independently — e.g. the 3-block prefix can run
SLOWER than the 4-block one (ending at block 2's output forces a layout
that the continued graph avoids). Trust the totals; treat per-unit deltas
as indicative. Usage:  python tools/profile_forward.py [batch] [--groups]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def timeit(jfn, *args, iters=20):
    t0 = time.perf_counter()
    r = None
    for _ in range(iters):
        r = jfn(*args)
    float(r)
    return (time.perf_counter() - t0) / iters * 1e3


def main(batch: int = 256, groups: bool = False):
    import jax
    import jax.numpy as jnp

    from roomnet_tpu.models.roomnet import (
        FAST_CONFIG as cfg,
        init_variables,
        normalize_bgr_uint8,
        resolve_pool_impl,
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

    def block_body(x, res_in, bi, d):
        """One conv+relu6[+pool]+bn unit, exactly as forward() lowers it
        (models/roomnet.py forward; pool impl resolved from cfg.pool_impl)."""
        blk = v["blocks"][bi]
        pool = cfg.block_pools[bi]
        x = B.relu6(B.conv2d_valid(x, blk["conv"][d]))
        if pool is not None:
            impl = resolve_pool_impl(cfg.pool_impl, x.shape[1], pool[1])
            x = B.avg_pool_valid(x, pool[0], pool[1], impl=impl)
        x = B.batch_norm(x, blk["bn"][d])
        return x, (x if d == 0 else res_in)

    def residual_body(x, res_in, bi):
        x = x + resize_bilinear_tf1(res_in, (x.shape[1], x.shape[2]))
        return B.batch_norm(x, v["blocks"][bi]["res_bn"]), None

    def dense_body(x, _res):
        x = x.reshape(x.shape[0], -1)
        for layer in v["dense"]:
            x = B.relu6(B.dense(x, layer["kernel"], layer["bias"]))
            if layer["bn"] is not None:
                x = B.batch_norm(x, layer["bn"])
        return x, None

    # Ordered unit list: (name, body(x, res_in) -> (x, res_in))
    units = []
    for bi, depth in enumerate(cfg.block_depths):
        for d in range(depth):
            units.append((f"b{bi + 1}.unit{d}", lambda x, r, bi=bi, d=d:
                          block_body(x, r, bi, d)))
        if depth > 1:
            units.append((f"b{bi + 1}.residual", lambda x, r, bi=bi:
                          residual_body(x, r, bi)))
    units.append(("dense head", dense_body))

    def run_prefix_units(x, n):
        x = normalize_bgr_uint8(x).astype(cfg.compute_dtype)
        res_in = None
        for _, body in units[:n]:
            x, res_in = body(x, res_in)
        return jnp.sum(x.astype(jnp.float32))

    def run_prefix_blocks(x, nblocks):
        x = normalize_bgr_uint8(x).astype(cfg.compute_dtype)
        res_in = None
        n = 0
        for bi, depth in enumerate(cfg.block_depths[:nblocks]):
            n += depth + (1 if depth > 1 else 0)
        for _, body in units[:n]:
            x, res_in = body(x, res_in)
        return jnp.sum(x.astype(jnp.float32))

    if not groups:
        prev = None
        for nb in range(0, 6):
            fn = jax.jit(lambda x, nb=nb: run_prefix_blocks(x, nb))
            float(fn(xd))  # compile + sync
            ms = timeit(fn, xd)
            delta = "" if prev is None else f"   block {nb - 1}: {ms - prev:6.2f} ms"
            print(f"prefix {nb}: {ms:7.2f} ms/batch{batch}{delta}", flush=True)
            prev = ms
        return

    # --groups: one prefix per unit, annotated with the analytic bound
    from roomnet_tpu.utils.roofline import (
        V5E_BF16_PEAK_FLOPS,
        V5E_HBM_BYTES_PER_S,
        forward_groups,
    )

    bounds = {g.name: g.ideal_s(V5E_BF16_PEAK_FLOPS, V5E_HBM_BYTES_PER_S) * 1e3
              for g in forward_groups(cfg, batch)}

    def unit_bound(name):
        if name == "dense head":
            return sum(v for k, v in bounds.items() if k.startswith("dense"))
        if name.endswith(".residual"):
            return bounds[name]  # roofline groups use the same name
        b, u = name.split(".unit")
        n = f"{b}.conv{u}"
        total = bounds[n]
        p = f"{b}.pool{u}"
        return total + bounds.get(p, 0.0)

    print(f"== in-context per-unit prefix deltas, batch {batch}, "
          f"pool_impl={cfg.pool_impl} ==", flush=True)
    fn0 = jax.jit(lambda x: run_prefix_units(x, 0))
    float(fn0(xd))
    prev = timeit(fn0, xd)
    print(f"{'unit':14s} {'prefix ms':>9s} {'delta ms':>9s} {'bound ms':>9s} "
          f"{'meas/bound':>10s}")
    print(f"{'normalize':14s} {prev:9.3f} {prev:9.3f} {'-':>9s} {'-':>10s}",
          flush=True)
    sum_bound = 0.0
    for n in range(1, len(units) + 1):
        name = units[n - 1][0]
        fn = jax.jit(lambda x, n=n: run_prefix_units(x, n))
        float(fn(xd))
        ms = timeit(fn, xd)
        delta = ms - prev
        b = unit_bound(name)
        sum_bound += b
        ratio = f"{delta / b:10.2f}" if (b > 1e-4 and delta > 0) else f"{'-':>10s}"
        print(f"{name:14s} {ms:9.3f} {delta:9.3f} {b:9.3f} {ratio}", flush=True)
        prev = ms
    print(f"total {prev:.3f} ms; sum of unit bounds {sum_bound:.3f} ms "
          f"({100 * sum_bound / prev:.1f}% of analytic roofline)", flush=True)


if __name__ == "__main__":
    b = 256
    g = False
    for a in sys.argv[1:]:
        if a == "--groups":
            g = True
        else:
            b = int(a)
    main(b, g)

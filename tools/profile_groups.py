"""Per-fusion-group forward profile: measured ms vs analytic bound, one
row per OpGroup of utils/roofline.py (round-4 review next item #1: prove
each residual gap to the analytic roofline emitter-irreducible, or find
the reducible ones — starting with B3).

Each group is timed ISOLATED (own jit, device-resident inputs at the real
shapes/dtypes of the bf16 serving forward, submit-N-fetch-one-scalar).
Isolated timing excludes cross-group layout effects, so the table is read
two ways: per-group `measured/bound` is the emitter-quality number, and
`sum(isolated) - in-context total` is the fusion/layout interaction term.

Usage:  python tools/profile_groups.py [batch] [--pool-impl auto|reduce_window|depthwise]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

# ONE timing helper for the kernel tools (keep-only-newest-ref HBM rule
# and the submit-N-fetch-one-scalar pattern live there).
from tools.bench_kernels import timeit  # noqa: E402


def main(batch: int = 256, pool_impl: str = "auto"):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from roomnet_tpu.models.roomnet import FAST_CONFIG
    from roomnet_tpu.models.roomnet import (
        forward,
        init_variables,
        normalize_bgr_uint8,
        resolve_pool_impl,
    )
    from roomnet_tpu.ops import blocks as B
    from roomnet_tpu.ops.resize import resize_bilinear_tf1
    from roomnet_tpu.params import schema
    from roomnet_tpu.utils.roofline import (
        V5E_BF16_PEAK_FLOPS,
        V5E_HBM_BYTES_PER_S,
        forward_groups,
    )

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    except Exception:
        pass

    # ONE lowering for both halves of the comparison: the in-context
    # forward runs with the SAME pool_impl the isolated rows time (a
    # FAST_CONFIG='auto' in-context total against reduce_window isolated
    # rows would bake a ~2.5 ms lowering delta into the printed
    # "fusion/layout interaction" term). "auto" (the shipped default) is
    # resolved per pool site below, exactly as forward() resolves it.
    cfg = dataclasses.replace(FAST_CONFIG, pool_impl=pool_impl)

    ckpt = "artifacts/roomnet_params.npz"
    if os.path.exists(ckpt):
        v = schema.unflatten_variables(dict(np.load(ckpt)))
    else:
        v = init_variables(jax.random.PRNGKey(0), cfg)

    dt = cfg.compute_dtype
    key = jax.random.PRNGKey(0)

    def dev_rand(shape):
        nonlocal key
        key, sub = jax.random.split(key)
        return jax.jit(lambda k: jax.random.normal(k, shape, dt))(sub)

    groups = forward_groups(cfg, batch)
    bounds = {g.name: g for g in groups}

    rows = []
    s = cfg.im_side
    in_ch = 3
    k = cfg.kernel_size
    for bi, (filters, depth) in enumerate(
        zip(cfg.block_filters, cfg.block_depths)
    ):
        blk = v["blocks"][bi]
        pool = cfg.block_pools[bi]
        res_side = None
        for d in range(depth):
            cin = in_ch if d == 0 else filters
            x_in = dev_rand((batch, s, s, cin))
            kern = blk["conv"][d]
            conv_fn = jax.jit(lambda x, kern=kern: B.relu6(B.conv2d_valid(x, kern)))
            rows.append((f"b{bi + 1}.conv{d}", timeit(conv_fn, x_in)))
            del x_in
            s_conv = s - (k - 1)
            s = s_conv
            if pool is not None:
                pk, pst = pool
                x_p = dev_rand((batch, s, s, filters))
                bn = blk["bn"][d]
                site_impl = resolve_pool_impl(pool_impl, s, pst)
                pool_fn = jax.jit(
                    lambda x, bn=bn, pk=pk, pst=pst, si=site_impl: B.batch_norm(
                        B.avg_pool_valid(x, pk, pst, impl=si), bn
                    )
                )
                rows.append((f"b{bi + 1}.pool{d}", timeit(pool_fn, x_p)))
                del x_p
                s = (s - pk) // pst + 1
            if d == 0:
                res_side = s
        if depth > 1:
            x_res = dev_rand((batch, res_side, res_side, filters))
            x_cur = dev_rand((batch, s, s, filters))
            rbn = blk["res_bn"]
            res_fn = jax.jit(
                lambda xc, xr, rbn=rbn, s=s: B.batch_norm(
                    xc + resize_bilinear_tf1(xr, (s, s)), rbn
                )
            )
            rows.append((f"b{bi + 1}.residual", timeit(res_fn, x_cur, x_res)))
            del x_res, x_cur
        in_ch = filters

    # dense groups: tiny; time the whole head as one row, split pro rata
    flat = s * s * cfg.block_filters[-1]
    x_d = dev_rand((batch, flat))

    def head(x):
        for di, layer in enumerate(v["dense"]):
            x = B.relu6(B.dense(x, layer["kernel"], layer["bias"]))
            if layer["bn"] is not None:
                x = B.batch_norm(x, layer["bn"])
        return x

    head_ms = timeit(jax.jit(head), x_d)
    del x_d

    # in-context total for the interaction term
    xd = jax.device_put(
        np.random.RandomState(0).randint(0, 256, (batch, 224, 224, 3), np.uint8)
    )
    fwd = jax.jit(
        lambda v, x: jnp.argmax(forward(v, normalize_bgr_uint8(x), cfg), -1)
    )
    int(fwd(v, xd)[0])
    t0 = time.perf_counter()
    rs = [fwd(v, xd) for _ in range(20)]
    int(rs[-1][0])
    total_ms = (time.perf_counter() - t0) / 20 * 1e3

    print(f"\n== per-fusion-group: measured (isolated) vs analytic bound, "
          f"batch {batch}, bf16, pool_impl={pool_impl} ==")
    print(f"{'group':16s} {'meas ms':>8s} {'bound ms':>9s} {'meas/bound':>10s} "
          f"{'bound kind':>10s}")
    sum_meas = 0.0
    sum_bound = 0.0
    for name, ms in rows:
        g = bounds[name]
        bound_ms = g.ideal_s(V5E_BF16_PEAK_FLOPS, V5E_HBM_BYTES_PER_S) * 1e3
        kind = "HBM" if g.hbm_bound(V5E_BF16_PEAK_FLOPS, V5E_HBM_BYTES_PER_S) else "MXU"
        sum_meas += ms
        sum_bound += bound_ms
        print(f"{name:16s} {ms:8.3f} {bound_ms:9.3f} {ms / bound_ms:10.2f} "
              f"{kind:>10s}")
    dense_bound = sum(
        bounds[f"dense{di}"].ideal_s(V5E_BF16_PEAK_FLOPS, V5E_HBM_BYTES_PER_S)
        for di in range(len(cfg.dense_units) + 1)
    ) * 1e3
    sum_meas += head_ms
    sum_bound += dense_bound
    print(f"{'dense head':16s} {head_ms:8.3f} {dense_bound:9.3f} "
          f"{head_ms / dense_bound:10.2f} {'HBM':>10s}")
    print(f"{'SUM isolated':16s} {sum_meas:8.3f} {sum_bound:9.3f} "
          f"{sum_meas / sum_bound:10.2f}")
    print(f"in-context forward total: {total_ms:.3f} ms "
          f"({100 * sum_bound / total_ms:.1f}% of analytic roofline; "
          f"fusion/layout interaction = in-context - sum(isolated) = "
          f"{total_ms - sum_meas:+.3f} ms)")


if __name__ == "__main__":
    b = 256
    impl = "auto"
    args = sys.argv[1:]
    while args:
        a = args.pop(0)
        if a == "--pool-impl":
            impl = args.pop(0)
        else:
            b = int(a)
    main(b, impl)

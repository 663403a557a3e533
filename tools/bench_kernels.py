"""A/B harness: Pallas kernels vs plain-XLA equivalents (SURVEY.md §7 step 7:
kernels must justify themselves against the roofline — keep the winner).

Run on the real chip:  python tools/bench_kernels.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402


def timeit(jfn, *args, iters=20):
    import jax.numpy as jnp

    r = jfn(*args)
    float(jnp.sum(r.astype(jnp.float32)))
    del r
    t0 = time.perf_counter()
    r = None
    for _ in range(iters):
        # Keep only the newest ref: at forward-activation sizes (~750 MB)
        # retaining all N results exhausts HBM. Executions stay
        # stream-ordered, so the final scalar fetch still bounds them all.
        r = jfn(*args)
    float(jnp.sum(r.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters * 1e3


def bench_pool_kernels(batch=256):
    """Streaming relu6+pool+BN kernel vs XLA's reduce_window fusion, at the
    real forward shapes (B1/B2/B3; PERF.md 'where the time goes')."""
    import jax
    import jax.numpy as jnp

    from roomnet_tpu.ops import blocks as B
    from roomnet_tpu.ops.pallas.pool import bn_affine_params, fused_relu6_pool_bn

    rng = np.random.RandomState(0)
    results = {}
    print(f"== relu6+avgpool+BN: pallas streaming vs xla (batch {batch}, bf16) ==")
    for tag, (H, C, k, s) in {
        "B1 pool3/s1 222^2x8": (222, 8, 3, 1),
        "B2 pool4/s1 218^2x32": (218, 32, 4, 1),
        "B2 pool4/s1 213^2x32": (213, 32, 4, 1),
        "B2 pool4/s1 208^2x32": (208, 32, 4, 1),
        # stride-2 pools (B3/B5) are outside the kernel surface: strided
        # compaction needs gathers/lane-merges Mosaic rejects, and the
        # stride-1 verdict above already settles the economics.
    }.items():
        bn = {
            "scale": jnp.asarray(rng.rand(C).astype(np.float32) + 0.5),
            "bias": jnp.asarray(rng.randn(C).astype(np.float32)),
            "mean": jnp.asarray(rng.randn(C).astype(np.float32)),
            "var": jnp.asarray(rng.rand(C).astype(np.float32) + 0.5),
        }
        w, b = bn_affine_params(bn, B.BN_EPS)
        key = jax.random.PRNGKey(0)
        x = jax.jit(lambda k: jax.random.normal(k, (batch, H, H, C), jnp.bfloat16))(key)

        xla = jax.jit(lambda x: B.batch_norm(B.avg_pool_valid(B.relu6(x), k, s), bn))
        plk = lambda x: fused_relu6_pool_bn(x, w, b, ksize=k, stride=s)

        # third contender: avg-pool as a depthwise conv — the SHIPPED
        # lowering (ops/blocks.py impl="depthwise", incl. its precision
        # flag), so the A/B measures the exact op production can select.
        dwj = jax.jit(
            lambda x: B.batch_norm(
                B.avg_pool_valid(B.relu6(x), k, s, impl="depthwise"), bn
            )
        )
        # correctness gate first (bf16 tolerance)
        d = float(jnp.abs(plk(x).astype(jnp.float32) - xla(x).astype(jnp.float32)).max())
        assert d < 0.25, (tag, d)
        t_p = timeit(plk, x)
        t_x = timeit(xla, x)
        t_d = timeit(dwj, x)
        best = min((t_x, "XLA-rw"), (t_p, "PALLAS"), (t_d, "XLA-dwconv"))[1]
        results[tag] = (t_p, t_x, t_d)
        print(f"{tag:26s}: pallas {t_p:7.3f} ms | xla-rw {t_x:7.3f} ms | "
              f"xla-dwconv {t_d:7.3f} ms -> keep {best} (|d|={d:.3f})")
    return results


def bench_pool_s2(batch=256):
    """Stride-2 pool lowerings at B3/B5's real shapes (round-4 review next
    item #1: the depthwise-conv pooling formulation was only ever measured
    at B1/B2's STRIDE-1 shapes; pool4/s2 as an XLA strided depthwise conv
    was the unmeasured natural lowering). Contenders per shape:

      * XLA reduce_window (production path),
      * XLA strided depthwise conv (feature_group_count=C, window strides),
      * banded-matmul pooling on the MXU (the resize trick: H then W
        contractions with (in, out) averaging matrices).

    Pallas is absent by design: strided window compaction lowers to
    gathers/lane-merging reshapes Mosaic rejects (ops/pallas/pool.py).
    """
    import jax
    import jax.numpy as jnp

    from roomnet_tpu.ops import blocks as B

    rng = np.random.RandomState(0)
    results = {}
    print(f"== relu6+avgpool4/s2+BN lowerings (batch {batch}, bf16) ==")
    for tag, (H, C, k, s) in {
        "B3 pool4/s2 203^2x64": (203, 64, 4, 2),
        "B3 pool4/s2  98^2x64": (98, 64, 4, 2),
        "B5 pool4/s2  44^2x16": (44, 16, 4, 2),
    }.items():
        bn = {
            "scale": jnp.asarray(rng.rand(C).astype(np.float32) + 0.5),
            "bias": jnp.asarray(rng.randn(C).astype(np.float32)),
            "mean": jnp.asarray(rng.randn(C).astype(np.float32)),
            "var": jnp.asarray(rng.rand(C).astype(np.float32) + 0.5),
        }
        key = jax.random.PRNGKey(0)
        x = jax.jit(
            lambda k: jax.random.normal(k, (batch, H, H, C), jnp.bfloat16)
        )(key)

        rw = jax.jit(
            lambda x: B.batch_norm(B.avg_pool_valid(B.relu6(x), k, s), bn)
        )

        # The SHIPPED depthwise lowering (ops/blocks.py, incl. its
        # precision flag), not an inline re-implementation — the A/B that
        # justifies pool_impl="auto" must measure the exact op production
        # runs.
        dwj = jax.jit(
            lambda x: B.batch_norm(
                B.avg_pool_valid(B.relu6(x), k, s, impl="depthwise"), bn
            )
        )

        # banded matmul: out = Ph^T x Pw with (H, Ho) averaging matrices —
        # the same compile-time-constant contraction pattern as the TF1
        # residual resize (ops/resize.py), riding the MXU.
        Ho = (H - k) // s + 1
        P = np.zeros((H, Ho), np.float32)
        for o in range(Ho):
            P[o * s: o * s + k, o] = 1.0 / k
        Pj = jnp.asarray(P, jnp.bfloat16)

        def bm(x):
            h = B.relu6(x)
            # contract H: (B,H,W,C) x (H,Ho) -> (B,W,C,Ho) -> transpose
            h = jnp.einsum("bhwc,ho->bowc", h, Pj)
            h = jnp.einsum("bowc,wp->bopc", h, Pj)
            return B.batch_norm(h, bn)

        bmj = jax.jit(bm)

        ref = rw(x).astype(jnp.float32)
        d_dw = float(jnp.abs(dwj(x).astype(jnp.float32) - ref).max())
        d_bm = float(jnp.abs(bmj(x).astype(jnp.float32) - ref).max())
        assert d_dw < 0.25 and d_bm < 0.25, (tag, d_dw, d_bm)
        t_rw = timeit(rw, x)
        t_dw = timeit(dwj, x)
        t_bm = timeit(bmj, x)
        best = min((t_rw, "XLA-rw"), (t_dw, "XLA-dwconv"), (t_bm, "banded-mm"))[1]
        results[tag] = (t_rw, t_dw, t_bm)
        print(f"{tag:24s}: xla-rw {t_rw:7.3f} ms | xla-dwconv {t_dw:7.3f} ms"
              f" | banded-mm {t_bm:7.3f} ms -> keep {best} "
              f"(|d| dw {d_dw:.3f} bm {d_bm:.3f})")
    return results


def bench_b3_chain(
    batch=256,
    pool_impls=(
        ("reduce_window", "reduce_window"),
        ("depthwise", "depthwise"),
        ("reduce_window", "depthwise"),
    ),
):
    """Full B3 block A/B IN CONTEXT (conv 32->64 s1 + pool4/s2, conv 64->64
    + pool4/s2, TF1 residual resize 100->48 + BN): pure-XLA reduce_window
    pools vs the alternate stride-2 lowerings, including every layout cost
    between groups. B3 = 10.4 ms = ~31% of the round-1 forward profile and
    never got the B2 treatment (round-4 review next item #1)."""
    import jax
    import jax.numpy as jnp

    from roomnet_tpu.ops import blocks as B
    from roomnet_tpu.ops.resize import resize_bilinear_tf1

    rng = np.random.RandomState(3)
    kerns = [jnp.asarray(rng.randn(3, 3, cin, 64).astype(np.float32) * 0.05)
             for cin in (32, 64)]
    bns = []
    for _ in range(3):  # 2 per-depth + 1 residual
        bns.append({
            "scale": jnp.asarray(rng.rand(64).astype(np.float32) + 0.5),
            "bias": jnp.asarray(rng.randn(64).astype(np.float32)),
            "mean": jnp.asarray(rng.randn(64).astype(np.float32)),
            "var": jnp.asarray(rng.rand(64).astype(np.float32) + 0.5),
        })

    def make_b3(impl_per_depth):
        def b3(x):
            res = None
            for d in range(2):
                x = B.conv2d_valid(x, kerns[d])
                x = B.relu6(x)
                x = B.avg_pool_valid(x, 4, 2, impl=impl_per_depth[d])
                x = B.batch_norm(x, bns[d])
                if d == 0:
                    res = x
            x = x + resize_bilinear_tf1(res, (x.shape[1], x.shape[2]))
            return B.batch_norm(x, bns[2])
        return jax.jit(b3)

    key = jax.random.PRNGKey(4)
    x = jax.jit(
        lambda k: jax.random.normal(k, (batch, 205, 205, 32), jnp.bfloat16)
    )(key)
    print(f"== full B3 chain (conv->pool4/s2 x2 + residual), batch {batch}, bf16 ==")
    fns = {"+".join(i[:2] for i in impl): make_b3(impl) for impl in pool_impls}
    ref = fns["+".join(i[:2] for i in pool_impls[0])](x).astype(jnp.float32)
    out = {}
    for impl, fn in fns.items():
        d = float(jnp.abs(fn(x).astype(jnp.float32) - ref).max())
        assert d < 0.25, (impl, d)
        out[impl] = timeit(fn, x, iters=10)
    best = min(out, key=out.get)
    print("  ".join(f"{impl} {t:7.3f} ms" for impl, t in out.items())
          + f" -> keep {best}")
    return out


def _resize_taps(in_size: int, out_size: int):
    """Per-output-position (lo, hi, frac) tap arrays, TF1 convention —
    same float32 coefficient arithmetic as ops/resize.py."""
    scale = np.float32(in_size) / np.float32(out_size)
    dst = np.arange(out_size, dtype=np.float32)
    src = dst * scale
    lo = np.clip(np.floor(src).astype(np.int64), 0, in_size - 1)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = (src - lo.astype(np.float32)).astype(np.float32)
    return lo, hi, frac


def bench_b2_residual(batch=256):
    """B2 residual group A/B (round-5 review item #1): BN(x + resize_tf1(res))
    at the real shapes (res 215^2x32 -> 205^2, x 205^2x32, batch 256, bf16).
    In-context table shows this group 2.09x over its HBM bound — the only
    group never measured against an alternative lowering. Variants:

    - einsum_hw: current ops/resize.py (H-contraction then W, MXU matmuls)
    - einsum_wh: same contractions, W first (layout order probe)
    - gather:    two take+lerp passes (2-tap arithmetic instead of dense
                 215-wide contractions; XLA gathers fuse as producers)

    Measured both ISOLATED and IN CONTEXT (appended to B2 unit2's
    conv+relu6+pool+BN so input layouts match the real forward; the
    reported in-context number is chain_with_residual - chain_without)."""
    import jax
    import jax.numpy as jnp

    from roomnet_tpu.ops import blocks as B
    from roomnet_tpu.ops.resize import resize_bilinear_tf1, interp_matrix_tf1

    rng = np.random.RandomState(7)
    bn2, bnr = ({
        "scale": jnp.asarray(rng.rand(32).astype(np.float32) + 0.5),
        "bias": jnp.asarray(rng.randn(32).astype(np.float32)),
        "mean": jnp.asarray(rng.randn(32).astype(np.float32)),
        "var": jnp.asarray(rng.rand(32).astype(np.float32) + 0.5),
    } for _ in range(2))
    kern = jnp.asarray(rng.randn(3, 3, 32, 32).astype(np.float32) * 0.05)

    def rs_einsum_hw(res, out_hw):
        return resize_bilinear_tf1(res, out_hw)

    def rs_einsum_wh(res, out_hw):
        hi = jax.lax.Precision.HIGHEST
        wh = jnp.asarray(interp_matrix_tf1(res.shape[1], out_hw[0]), res.dtype)
        ww = jnp.asarray(interp_matrix_tf1(res.shape[2], out_hw[1]), res.dtype)
        y = jnp.einsum("bhwc,wj->bhjc", res, ww, precision=hi)
        return jnp.einsum("bhjc,hi->bijc", y, wh, precision=hi)

    def rs_gather(res, out_hw):
        lo, hii, f = _resize_taps(res.shape[1], out_hw[0])
        f = jnp.asarray(f, res.dtype)[None, :, None, None]
        res = res[:, lo] * (1 - f) + res[:, hii] * f
        lo, hii, f = _resize_taps(res.shape[2], out_hw[1])
        f = jnp.asarray(f, res.dtype)[None, None, :, None]
        return res[:, :, lo] * (1 - f) + res[:, :, hii] * f

    variants = {"einsum_hw": rs_einsum_hw, "einsum_wh": rs_einsum_wh,
                "gather": rs_gather}

    # Fused Pallas candidate (ops/pallas/residual.py): whole group in one
    # kernel, measured INCLUDING its NHWC<->NCHW boundary transposes. It is
    # a full-group function (resize+add+BN), so it slots in at the
    # group level below rather than as an `rs` resize-only variant.
    from roomnet_tpu.ops.pallas.residual import residual_bn_pallas

    key = jax.random.PRNGKey(5)
    mk = jax.jit(lambda k, s: jax.random.normal(k, (batch, s, s, 32),
                                                jnp.bfloat16), static_argnums=1)
    x205 = mk(key, 205)
    res = mk(jax.random.PRNGKey(6), 215)
    y210 = mk(jax.random.PRNGKey(8), 210)

    print(f"== B2 residual lowerings (res 215^2->205^2 +add+BN, batch {batch}, "
          "bf16) ==", flush=True)
    out = {}
    # -- isolated: BN(x + resize(res))
    iso = {}
    ref = None
    for name, rs in variants.items():
        fn = jax.jit(lambda x, r, rs=rs: B.batch_norm(
            x + rs(r, (205, 205)), bnr))
        y = fn(x205, res).astype(jnp.float32)
        if ref is None:
            ref = y
        d = float(jnp.abs(y - ref).max())
        del y
        iso[name] = timeit(fn, x205, res)
        print(f"  isolated {name:10s} {iso[name]:7.3f} ms (|d|={d:.4f})",
              flush=True)
    fn_p = jax.jit(lambda x, r: residual_bn_pallas(x, r, bnr))
    d = float(jnp.abs(fn_p(x205, res).astype(jnp.float32) - ref).max())
    iso["pallas_cm"] = timeit(fn_p, x205, res)
    print(f"  isolated {'pallas_cm':10s} {iso['pallas_cm']:7.3f} ms "
          f"(|d|={d:.4f})", flush=True)
    # -- in context: unit2 conv+relu6+pool4/s1+BN then the residual group;
    #    report chain - chain_without_residual.
    def chain(y2, r, rs):
        x = B.conv2d_valid(y2, kern)
        x = B.relu6(x)
        x = B.avg_pool_valid(x, 4, 1)
        x = B.batch_norm(x, bn2)
        if rs is None:
            return x
        if rs == "pallas_cm":
            return residual_bn_pallas(x, r, bnr)
        x = x + rs(r, (x.shape[1], x.shape[2]))
        return B.batch_norm(x, bnr)

    base_fn = jax.jit(lambda y2, r: chain(y2, r, None))
    base = timeit(base_fn, y210, res)
    print(f"  context base (conv unit only)      {base:7.3f} ms", flush=True)
    for name, rs in {**variants, "pallas_cm": "pallas_cm"}.items():
        fn = jax.jit(lambda y2, r, rs=rs: chain(y2, r, rs))
        t = timeit(fn, y210, res)
        out[name] = t - base
        print(f"  context  {name:10s} {t:7.3f} ms -> residual {t - base:7.3f} ms",
              flush=True)
    best = min(out, key=out.get)
    print(f"  -> in-context winner: {best}", flush=True)
    return out


def bench_conv_attempt(batch=256):
    """The measured Pallas-conv attempt at B2's hot shape (see
    ops/pallas/conv_b2.py docstring for why this settles the fused-B2 claim)."""
    import jax
    import jax.numpy as jnp

    from roomnet_tpu.ops import blocks as B
    from roomnet_tpu.ops.pallas.conv_b2 import conv3x3_pallas

    print(f"== conv3x3 32->32 @218^2 (B2 hot shape), batch {batch}, bf16 ==")
    key = jax.random.PRNGKey(1)
    x = jax.jit(lambda k: jax.random.normal(k, (batch, 218, 218, 32), jnp.bfloat16))(key)
    kern = jnp.asarray(np.random.RandomState(2).randn(3, 3, 32, 32).astype(np.float32) * 0.1)
    xla = jax.jit(lambda x: B.conv2d_valid(x, kern))
    plk = jax.jit(lambda x: conv3x3_pallas(x, kern, row_tile=8))
    d = float(jnp.abs(plk(x).astype(jnp.float32) - xla(x).astype(jnp.float32)).max())
    gflop = 2 * batch * 216 * 216 * 9 * 32 * 32 / 1e9
    t_p = timeit(plk, x, iters=10)
    t_x = timeit(xla, x, iters=10)
    print(f"pallas {t_p:7.3f} ms ({gflop / t_p:6.1f} GFLOP/ms = "
          f"{gflop / t_p / 197:.1%} of bf16 peak) | "
          f"xla {t_x:7.3f} ms ({gflop / t_x / 197:.1%} of peak) (|d|={d:.3f})")
    return t_p, t_x


def bench_b2_chain(batch=256):
    """Full B2 block A/B: pure XLA vs XLA convs + pallas streaming pools.
    Includes all layout/reshape costs at the kernel boundaries."""
    import jax
    import jax.numpy as jnp

    from roomnet_tpu.models.roomnet import DEFAULT_CONFIG
    from roomnet_tpu.ops import blocks as B
    from roomnet_tpu.ops.pallas.pool import bn_affine_params, fused_relu6_pool_bn
    from roomnet_tpu.ops.resize import resize_bilinear_tf1

    rng = np.random.RandomState(3)
    kerns = [jnp.asarray(rng.randn(3, 3, cin, 32).astype(np.float32) * 0.05)
             for cin in (8, 32, 32)]
    bns = []
    for _ in range(4):  # 3 per-depth + 1 residual
        bns.append({
            "scale": jnp.asarray(rng.rand(32).astype(np.float32) + 0.5),
            "bias": jnp.asarray(rng.randn(32).astype(np.float32)),
            "mean": jnp.asarray(rng.randn(32).astype(np.float32)),
            "var": jnp.asarray(rng.rand(32).astype(np.float32) + 0.5),
        })

    def b2_xla(x):
        res = None
        for d in range(3):
            x = B.conv2d_valid(x, kerns[d])
            x = B.relu6(x)
            x = B.avg_pool_valid(x, 4, 1)
            x = B.batch_norm(x, bns[d])
            if d == 0:
                res = x
        x = x + resize_bilinear_tf1(res, (x.shape[1], x.shape[2]))
        return B.batch_norm(x, bns[3])

    def b2_pallas(x):
        res = None
        for d in range(3):
            x = B.conv2d_valid(x, kerns[d])
            w, b = bn_affine_params(bns[d], B.BN_EPS)
            x = fused_relu6_pool_bn(x, w, b, ksize=4, stride=1)
            if d == 0:
                res = x
        x = x + resize_bilinear_tf1(res, (x.shape[1], x.shape[2]))
        return B.batch_norm(x, bns[3])

    key = jax.random.PRNGKey(4)
    x = jax.jit(lambda k: jax.random.normal(k, (batch, 220, 220, 8), jnp.bfloat16))(key)
    fx = jax.jit(b2_xla)
    fp = jax.jit(b2_pallas)
    d = float(jnp.abs(fp(x).astype(jnp.float32) - fx(x).astype(jnp.float32)).max())
    print(f"== full B2 chain (conv->pool x3 + residual), batch {batch}, bf16 ==")
    t_x = timeit(fx, x, iters=10)
    t_p = timeit(fp, x, iters=10)
    keep = "PALLAS-POOLS" if t_p < t_x else "XLA"
    print(f"xla {t_x:7.3f} ms | xla-convs+pallas-pools {t_p:7.3f} ms -> {keep} (|d|={d:.3f})")
    return t_p, t_x


def main():
    import jax
    import jax.numpy as jnp

    from roomnet_tpu.ops import blocks as B
    from roomnet_tpu.ops.pallas.dense_head import dense_head_pallas
    from roomnet_tpu.params import schema

    bench_pool_kernels()
    bench_pool_s2()
    bench_b3_chain()
    bench_conv_attempt()
    bench_b2_chain()
    bench_b2_residual()

    v = schema.unflatten_variables(dict(np.load("artifacts/roomnet_params.npz")))

    def xla_head(dense, x):
        h = x
        for li in range(3):
            h = B.relu6(B.dense(h, dense[li]["kernel"]))
            h = B.batch_norm(h, dense[li]["bn"])
        logits = B.relu6(B.dense(h, dense[3]["kernel"], dense[3]["bias"]))
        return jax.nn.softmax(logits, -1)

    xla_jit = jax.jit(xla_head)
    print("== dense head: pallas vs xla ==")
    for bsz in (8, 64, 256, 2048):
        x = jnp.asarray(np.random.RandomState(0).randn(bsz, 64).astype(np.float32))
        t_p = timeit(lambda x: dense_head_pallas(v["dense"], x), x)
        t_x = timeit(lambda x: xla_jit(v["dense"], x), x)
        keep = "PALLAS" if t_p < t_x else "XLA"
        print(f"batch {bsz:5d}: pallas {t_p:7.3f} ms | xla {t_x:7.3f} ms -> keep {keep}")


if __name__ == "__main__":
    main()

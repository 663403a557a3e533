"""Fused relu6 -> avg-pool(k, stride) -> BN-affine as one streaming Pallas
kernel (the conv-block epilogue; reference network.py:184-193 order:
activation inside the conv, pool, then BN).

Why this kernel exists (PERF.md roofline): in the XLA path each conv ->
pool boundary materializes the pre-pool activation to HBM and the
reduce_window fusion re-reads it with k^2-tap windows; at B2's shapes
(~215^2 x 32ch x batch) the pool+BN stages cost ~3 ms each while their
speed-of-light is ~1.8 ms (read once + write once at 819 GB/s). This
kernel streams each image once: relu6 and the separable k-tap rolling
sums run on the VPU with every intermediate in VMEM, and the BN affine is
the epilogue of the same pass. The convs stay in XLA — a Pallas conv at
Cout=32 caps at 18.75% MXU utilization vs XLA's measured 33% (the 288x32
weight pads to 384x128 in any matmul framing; see ops/pallas/conv_b2.py),
so fusing the conv in would lose more than the traffic saves.

Layout: the NHWC input is viewed as (B, H, W*C) so the lane axis carries
W*C (C=8..64 alone would waste 128-lane tiles 2-16x). A horizontal
k-window then becomes lane rolls by multiples of C; the vertical window is
sublane rolls. Stride 2 compacts lanes with a reshape to a
stride*C-grouped layout (static slice, no gather).

Grid: one program per batch image (whole-image in/out blocks, which Mosaic
double-buffers across grid steps); inside the kernel an UNROLLED strip
loop computes <=48 output rows at a time, bounding the f32 working set so
blocks + temporaries fit the 16 MB VMEM at 218^2 x 32 x b256. (An
outer-grid row-chunk axis is not expressible here: output blocks must have
row counts divisible by 8 or equal to the full dim, and the real H_out
values — 215, 220, 205 — have no such divisors.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _strips(h_out: int, cap: int = 48) -> list[tuple[int, int]]:
    """Static (row0, nrows) strips covering [0, h_out) with nrows <= cap."""
    out = []
    r = 0
    while r < h_out:
        n = min(cap, h_out - r)
        out.append((r, n))
        r += n
    return out


def _pool_kernel(x_ref, w_ref, b_ref, o_ref, *, k, stride, C, W, H_out, relu6):
    """One image per program; unrolled strip loop bounds the f32 working set
    so the whole-image in/out blocks + temps fit VMEM at B2 scale."""
    W_out = (W - k) // stride + 1
    for r0, nrows in _strips(H_out):
        in_rows = (nrows - 1) * stride + k
        x = x_ref[0, r0 * stride : r0 * stride + in_rows]
        h = x.astype(jnp.float32)
        if relu6:
            h = jnp.clip(h, 0.0, 6.0)
        # Horizontal k-tap rolling sum: lanes shift by C per tap (roll by
        # L - d == roll by -d; pltpu.roll requires non-negative shifts).
        # Circular wrap only pollutes the last k-1 window starts, which the
        # crop drops.
        hs = h
        for t in range(1, k):
            hs = hs + pltpu.roll(h, W * C - t * C, 1)
        # Vertical k-tap rolling sum over sublanes.
        vs = hs
        for t in range(1, k):
            vs = vs + pltpu.roll(hs, in_rows - t, 0)
        y = vs[:nrows, : W_out * C] * (1.0 / (k * k))
        y = y * w_ref[0] + b_ref[0]
        o_ref[0, r0 : r0 + nrows] = y.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("ksize", "stride", "relu6", "interpret")
)
def fused_relu6_pool_bn(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    *,
    ksize: int,
    stride: int,
    relu6: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """y = relu6_then_avgpool(x) * w + b, one HBM read + one write.

    STRIDE 1 ONLY (B1/B2 — the hot 60% of forward time). A stride-2
    variant needs strided window compaction, which lowers to gathers or
    lane-merging reshapes Mosaic rejects at the real shapes; since the
    measured stride-1 kernel already loses to XLA's fusion 2x on layout
    relayouts alone (PERF.md round 2), the s2 attempt is not worth its
    compile surface.

    Args:
      x: (B, H, W, C) activations (conv output), f32 or bf16.
      w, b: (C,) folded BN affine (see ops/blocks.py:batch_norm).
    Returns (B, H_out, W_out, C) in x.dtype.
    """
    if stride != 1:
        raise NotImplementedError("fused pool kernel is stride-1 only (see docstring)")
    B, H, W, C = x.shape
    k, s = ksize, stride
    H_out = (H - k) // s + 1
    W_out = (W - k) // s + 1
    xf = x.reshape(B, H, W * C)
    wf = jnp.tile(w.astype(jnp.float32), W_out).reshape(1, W_out * C)
    bf = jnp.tile(b.astype(jnp.float32), W_out).reshape(1, W_out * C)

    out = pl.pallas_call(
        functools.partial(
            _pool_kernel, k=k, stride=s, C=C, W=W, H_out=H_out, relu6=relu6
        ),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W * C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W_out * C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W_out * C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H_out, W_out * C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H_out, W_out * C), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=B * H * W * C * (2 * (k - 1) + 3),
            bytes_accessed=(B * H * W * C + B * H_out * W_out * C)
            * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xf, wf, bf)
    return out.reshape(B, H_out, W_out, C)


def bn_affine_params(bn: dict, eps: float) -> tuple[np.ndarray, np.ndarray]:
    """Fold BN moving stats into (w, b) for the kernel epilogue — the
    canonical fold from ops/blocks.py."""
    from roomnet_tpu.ops.blocks import bn_fold

    return bn_fold(bn, eps)

"""Pallas fused residual group BN(x + resize_tf1(res)) — the measured attempt
at removing b2.residual's intermediate HBM round trip (PERF.md round 5).

The XLA lowering (ops/resize.py + add + folded BN) runs the TF1 resize as
two MXU contractions with a (B,205,215,32) intermediate materialized to
HBM (~720 MB written+read at batch 256 bf16) — measured 5.67 ms in-context
against a 2.61 ms read-res+read-x+write-out floor. A fused kernel holds
that intermediate in VMEM: per (batch, channel) grid step it computes
``Wh^T @ res[b,c] @ Ww`` as two clean 2D MXU matmuls, adds x, applies the
folded BN affine, and writes out once.

Why channel-major (B,C,H,W) blocks and not the forward's native NHWC: the
Pallas custom-call boundary stores a C=32-minor bf16 array (16,128)-tiled,
i.e. lanes padded 32->128 — ~4.2x HBM amplification on every operand
(measured in the round-2 conv_b2 lowering logs; that alone is ~11 ms of
traffic, dead on arrival). Channel-major blocks are (215,215)/(205,205)
2D tiles (~1.2x pad), but the forward's tensors must then be transposed
at the boundary — three full HBM relayouts (res in, x in, out back) that
the layout arithmetic prices at ~5 ms. The wrapper includes them, so the
A/B (tools/bench_kernels.py `bench_b2_residual`) measures the lowering a
user could actually ship. Parity target: reference network.py:199
(residual shortcut resize) + network.py:193 (BN), fast/bf16 mode only —
parity mode pins the einsum path (f32, Precision.HIGHEST).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..blocks import BN_EPS, bn_fold
from ..resize import interp_matrix_tf1


def _residual_kernel(res_ref, x_ref, wht_ref, ww_ref, s_ref, t_ref, o_ref):
    """One (batch, channel) step: out = s*(x + Wh^T @ res @ Ww) + t."""
    r = res_ref[0, 0]  # (Hin, Win)
    # HIGHEST on f32 like ops/resize.py, the A/B twin: the default would
    # bf16-decompose f32 inputs (the repo-wide parity invariant). On bf16
    # operands Mosaic rejects an fp32 contract precision ("Bad lhs type"),
    # and the single bf16 MXU pass is what DEFAULT means there anyway.
    prec = (jax.lax.Precision.HIGHEST if r.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    y = jax.lax.dot_general(
        wht_ref[...],
        r,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    )  # (Hout, Win)
    # Round the intermediate to the io dtype like the einsum path does
    # (its first bf16 einsum emits bf16), so the A/B compares numerics.
    y = jax.lax.dot_general(
        y.astype(r.dtype),
        ww_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    )  # (Hout, Wout)
    c = pl.program_id(1)
    s = s_ref[c, 0]
    t = t_ref[c, 0]
    o_ref[0, 0] = (s * (x_ref[0, 0].astype(jnp.float32) + y) + t).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_channel_major(res_t, x_t, wht, ww, s, t, *, interpret=False):
    B, C, Hin, Win = res_t.shape
    _, _, Hout, Wout = x_t.shape
    return pl.pallas_call(
        _residual_kernel,
        # c fastest: the weight blocks' index maps are constant, so they
        # stay VMEM-resident across the inner sweep.
        grid=(B, C),
        in_specs=[
            pl.BlockSpec((1, 1, Hin, Win), lambda b, c: (b, c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Hout, Wout), lambda b, c: (b, c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Hout, Hin), lambda b, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Win, Wout), lambda b, c: (0, 0),
                         memory_space=pltpu.VMEM),
            # SMEM blocks must span the whole array; index by program_id(1).
            pl.BlockSpec((C, 1), lambda b, c: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((C, 1), lambda b, c: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, Hout, Wout), lambda b, c: (b, c, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, Hout, Wout), x_t.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * C * (Hout * Hin * Win + Hout * Win * Wout),
            bytes_accessed=(res_t.size + x_t.size * 2) * x_t.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(res_t, x_t, wht, ww, s, t)


def residual_bn_pallas(x, res, bn, *, eps: float = BN_EPS, interpret: bool = False):
    """Fused BN(x + resize_tf1(res, x.shape[1:3])), NHWC in/out.

    Includes the three boundary transposes NHWC<->NCHW the kernel's block
    layout requires — they are part of what is being measured.
    """
    out_hw = (x.shape[1], x.shape[2])
    wht = jnp.asarray(
        interp_matrix_tf1(res.shape[1], out_hw[0]).T, x.dtype)  # (Hout, Hin)
    ww = jnp.asarray(
        interp_matrix_tf1(res.shape[2], out_hw[1]), x.dtype)  # (Win, Wout)
    w, b = bn_fold(bn, eps)
    s = w.astype(jnp.float32).reshape(-1, 1)
    t = b.astype(jnp.float32).reshape(-1, 1)
    res_t = jnp.transpose(res, (0, 3, 1, 2))
    x_t = jnp.transpose(x, (0, 3, 1, 2))
    out = _fused_channel_major(res_t, x_t, wht, ww, s, t, interpret=interpret)
    return jnp.transpose(out, (0, 2, 3, 1))

"""Pallas 3x3 VALID conv at RoomNet block-2 geometry — the measured attempt
at the "streaming fused B2 kernel" (PERF.md round-2 write-up).

Any fully-fused B2 kernel (3x [conv3 -> relu6 -> pool4/s1 -> BN] + residual
resize, everything VMEM-resident) stands or falls on the conv: it is ~100%
of B2's FLOPs. This kernel is the best matmul framing available to Pallas
for that conv — batch-major M, 8-output-row tiles, im2col patches in a
VMEM scratch, one (TR*W_out x 9*Cin) @ (9*Cin x Cout) MXU contraction per
tile. The halo rows come from the NEXT row-tile of the same array, passed
as a second BlockSpec view (index maps may revisit blocks, so adjacent
tiles alias without manual DMA).

The ceiling, and why it stands (PERF.md roofline): the weight matrix is
(9*Cin=288) x (Cout=32); the MXU consumes 128x128 tiles, so every framing
pads K 288->384 and N 32->128 — 9216 useful MACs of 49152 fed = 18.75%
utilization BEST CASE, before patch-assembly relayouts and before the 4x
HBM read amplification pallas's layout forces on C=32 activations (the
custom-call boundary stores NHWC C=32 as (…,224,128)-tiled — measured in
the round-2 lowering logs). XLA's native conv emitter measures 33% of
bf16 peak at this shape (3.3 ms for 214 GFLOP @ batch 256) on the packed
layout. Pallas cannot express either the emitter or the layout, so a
fused B2 kernel pays >= 1.76x on compute AND ~4x on input traffic to save
~8 ms of pool/BN HBM round trips — a measured net loss from both ends.
tools/bench_kernels.py runs this kernel vs XLA's conv to keep the claim
measured, not asserted; the winning strategy for the production forward
remains pure XLA (convs at 33% + reduce_window fusions at ~2.6x roofline).

Mosaic lowering attempts at the real shape, for the record: (1) 9-way lane
concatenate at 32-lane offsets — rejected; (2) manual DMA of a row-sliced
halo window from the tiled 4D HBM memref — rejected; (3) this version:
per-tap sub-tile scratch stores + adjacent-block halo views.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv_kernel(x_ref, xn_ref, w_ref, o_ref, patches, *, TR, W, Cin, Cout):
    """One (batch, row-tile) step: TR output rows from TR+2 input rows."""
    W_out = W - 2
    x = jnp.concatenate([x_ref[0], xn_ref[0][:2]], axis=0)  # (TR+2, W, Cin)
    # im2col: K = (dy, dx, ci), assembled tap-by-tap into a VMEM scratch
    # (a direct 9-way lane concatenate at 32-lane offsets fails Mosaic
    # lowering). Slices shift sublane-major dims only; the lane axis (Cin)
    # is untouched, so no lane<->sublane relayout.
    for dy in range(3):
        for dx in range(3):
            t = dy * 3 + dx
            patches[:, :, t * Cin : (t + 1) * Cin] = x[dy : dy + TR, dx : dx + W_out, :]
    out = jax.lax.dot_general(
        patches[...],
        w_ref[...],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        # HIGHEST like conv2d_valid (ops/blocks.py), the A/B twin: the
        # default would bf16-decompose f32 inputs, making an f32 A/B run
        # compare different numerics AND different MXU pass counts.
        precision=jax.lax.Precision.HIGHEST,
    )  # (TR, W_out, Cout)
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("row_tile", "interpret"))
def conv3x3_pallas(x: jnp.ndarray, kernel: jnp.ndarray, *, row_tile: int = 8,
                   interpret: bool = False):
    """VALID 3x3 conv, NHWC x HWIO -> NHWC (stride 1, no bias).

    Measurement harness twin of ops/blocks.py:conv2d_valid. H-2 must be
    divisible by row_tile (pad/crop outside if not — fine for A/B timing).
    """
    B, H, W, Cin = x.shape
    Cout = kernel.shape[-1]
    H_out, W_out = H - 2, W - 2
    TR = row_tile
    assert H_out % TR == 0, (H_out, TR)
    n_tiles = H_out // TR
    n_blocks = -(-H // TR)  # input row-blocks available (ragged tail padded)
    w9 = kernel.astype(x.dtype).reshape(9 * Cin, Cout)

    return pl.pallas_call(
        functools.partial(_conv_kernel, TR=TR, W=W, Cin=Cin, Cout=Cout),
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, TR, W, Cin), lambda b, rt: (b, rt, 0, 0),
                         memory_space=pltpu.VMEM),
            # The same array again, one row-tile ahead: its first 2 rows are
            # the halo. Always in range: ceil(H/TR) > H_out/TR.
            pl.BlockSpec((1, TR, W, Cin),
                         lambda b, rt: (b, jnp.minimum(rt + 1, n_blocks - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * Cin, Cout), lambda b, rt: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TR, W_out, Cout), lambda b, rt: (b, rt, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H_out, W_out, Cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((TR, W_out, 9 * Cin), x.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H_out * W_out * 9 * Cin * Cout,
            bytes_accessed=(B * H * W * Cin + B * H_out * W_out * Cout)
            * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, x, w9)

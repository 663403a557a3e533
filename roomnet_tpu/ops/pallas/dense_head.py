"""Pallas TPU kernel: the entire RoomNet dense head in one fused kernel.

Covers reference network.py:234-237 + the softmax head (:44-45): four
matmuls with ReLU6 after each (including the logits layer!), inference-BN
after the first three, bias on the last, then softmax — one kernel instead
of ~10 XLA ops. All weights (64·32 + 32·16 + 16·8 + 8·6 ≈ 3.2k params) live
in VMEM for the whole grid; the batch streams through in tiles.

Per SURVEY.md §7 step 7 kernels must beat plain XLA to be used:
`tools/bench_kernels.py` A/Bs this against the unfused path; wire-up is via
``RoomNetConfig``-level choice in the serving path (the win is launch
overhead, i.e. small-batch latency).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from roomnet_tpu.ops.blocks import BN_EPS, bn_fold


def _fold_bn(bn: dict, dtype, eps):
    w, b = bn_fold(bn, eps)
    return w.astype(dtype), b.astype(dtype)


def _head_kernel(x_ref, k0, w0, b0, k1, w1, b1, k2, w2, b2, k3, bias3, probs_ref):
    hi = jax.lax.Precision.HIGHEST
    x = x_ref[...]

    def dense_relu6(h, k):
        y = jnp.dot(h, k[...], precision=hi, preferred_element_type=jnp.float32)
        return jnp.clip(y, 0.0, 6.0)

    h = dense_relu6(x.astype(jnp.float32), k0) * w0[...] + b0[...]
    h = dense_relu6(h, k1) * w1[...] + b1[...]
    h = dense_relu6(h, k2) * w2[...] + b2[...]
    logits = jnp.clip(
        jnp.dot(h, k3[...], precision=hi, preferred_element_type=jnp.float32)
        + bias3[...],
        0.0,
        6.0,
    )
    probs_ref[...] = jax.nn.softmax(logits, axis=-1).astype(probs_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_batch", "bn_eps"))
def dense_head_pallas(dense_layers, x_flat: jnp.ndarray, block_batch: int = 256,
                      bn_eps: float = BN_EPS):
    """dense_layers = variables['dense'] (4 layers); x_flat (B, flat_len).

    Returns softmax probs (B, num_classes) float32. bn_eps must be the
    model config's value (RoomNetConfig.bn_eps) — a variant with a
    non-default epsilon would otherwise fold silently-wrong BN scales
    while the unfused path stays correct.
    """
    b, f = x_flat.shape
    n_cls = dense_layers[3]["kernel"].shape[1]
    dt = jnp.float32
    args = []
    for li in range(3):
        layer = dense_layers[li]
        w, bb = _fold_bn(layer["bn"], dt, bn_eps)
        args += [layer["kernel"].astype(dt), w.reshape(1, -1), bb.reshape(1, -1)]
    args += [
        dense_layers[3]["kernel"].astype(dt),
        dense_layers[3]["bias"].astype(dt).reshape(1, -1),
    ]
    bb_ = min(block_batch, b)
    grid = (pl.cdiv(b, bb_),)
    weight_specs = [
        pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM) for a in args
    ]
    return pl.pallas_call(
        _head_kernel,
        out_shape=jax.ShapeDtypeStruct((b, n_cls), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bb_, f), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *weight_specs,
        ],
        out_specs=pl.BlockSpec((bb_, n_cls), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=jax.default_backend() == "cpu",  # tests run on CPU
    )(x_flat, *args)

"""Functional building blocks with reference-exact op semantics.

Parity-critical details (verified against the reference TF1 graph):
  * Conv2D: 3x3, stride 1, VALID padding, **no bias**, ReLU6 applied as the
    conv activation (so it precedes pooling) — reference network.py:184-186.
  * AvgPool: VALID padding, window fully inside — reference network.py:189.
  * BatchNorm: applied **after** activation+pool (unconventional order),
    eps=1e-3 (tf.layers default) — reference network.py:193.
  * Dense: no bias except final layer; ReLU6 applied unconditionally, even on
    the logits layer — reference network.py:212-214 (logits are ReLU6-clipped).
  * Dropout: inverted dropout with runtime rate after every conv/dense block
    when enabled — reference network.py:204-206, 219-221.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = [
    "BNStats",
    "conv2d_valid",
    "relu6",
    "avg_pool_valid",
    "bn_fold",
    "batch_norm",
    "batch_norm_train",
    "dense",
    "dropout",
]

BN_EPS = 1e-3  # tf.layers.batch_normalization default (reference network.py:193)
BN_MOMENTUM = 0.99  # moving-average momentum, tf.layers default

# Contraction precision note: Precision.HIGHEST everywhere. For f32 inputs
# this means full f32 MXU passes (parity mode; JAX's default decomposes f32
# matmuls into bf16 passes, which quantizes visibly). For bf16 compute
# dtype (the fast serving/training path) HIGHEST is free — bf16 inputs are
# a single MXU pass either way, with f32 accumulation.


class BNStats(NamedTuple):
    """Batch statistics produced by a training-mode BN application."""

    mean: jnp.ndarray
    var: jnp.ndarray  # biased (used for normalization)
    var_unbiased: jnp.ndarray  # Bessel-corrected (used for moving update)


def relu6(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(x, 0.0, 6.0)


def conv2d_valid(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    *,
    stride: int = 1,
    accum_dtype=None,
) -> jnp.ndarray:
    """NHWC x HWIO -> NHWC conv, VALID padding, no bias.

    Precision.HIGHEST so f32 inputs use full f32 MXU passes (JAX's default
    precision may decompose f32 matmuls into bf16 passes — parity-breaking).
    bf16 inputs are unaffected (already single-pass).
    """
    if accum_dtype is None:
        # bf16 mode: leave output dtype = input dtype (the MXU accumulates in
        # f32 internally either way); an explicit f32 preferred_element_type
        # breaks the conv transpose rule with mixed-dtype operands.
        accum_dtype = (
            None if x.dtype == jnp.bfloat16 else jnp.promote_types(x.dtype, jnp.float32)
        )
    return jax.lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=(stride, stride),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=accum_dtype,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(x.dtype)


def avg_pool_valid(
    x: jnp.ndarray, ksize: int, stride: int, impl: str = "reduce_window"
) -> jnp.ndarray:
    """Average pool, VALID padding (window always fully inside the input).

    impl selects the XLA lowering (per-shape winners measured in
    tools/bench_kernels.py; PERF.md round-2/round-5 tables):
      * "reduce_window" — sum-monoid reduce_window + scale; the parity
        path (sum-then-divide matches TF's AvgPool rounding) and the
        measured winner at the stride-1 shapes.
      * "depthwise" — strided depthwise conv (feature_group_count=C) with
        a constant 1/k² kernel; rides XLA's conv emitter. Numerics: each
        tap is scaled BEFORE accumulation, so f32 results can differ from
        reduce_window in the last ulp — bf16 results are tolerance-
        identical (gated in the A/B harness).
    """
    if impl == "depthwise":
        c = x.shape[-1]
        kern = jnp.full((ksize, ksize, 1, c), 1.0 / (ksize * ksize), x.dtype)
        return jax.lax.conv_general_dilated(
            x,
            kern,
            window_strides=(stride, stride),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
            # HIGHEST so f32 inputs stay f32 (the default bf16-decomposes
            # f32 convs on TPU: measured 4e-3 grad drift vs reduce_window
            # on-chip). Free for bf16 inputs — the MXU natively multiplies
            # bf16 and accumulates f32, which is what HIGHEST asks for.
            precision=jax.lax.Precision.HIGHEST,
        )
    if impl != "reduce_window":
        # "auto" must be resolved per-site BEFORE this op (models.roomnet
        # resolve_pool_impl); a typo'd impl silently benchmarking/serving
        # the wrong lowering is exactly the A/B-integrity hole to close.
        raise ValueError(f"unknown avg_pool impl {impl!r}; "
                         "expected 'reduce_window' or 'depthwise'")
    # NOTE: init must be a concrete python scalar — a traced 0-array defeats
    # the reduce-window-sum monoid pattern-match and kills reverse-mode
    # autodiff on the TPU backend.
    summed = jax.lax.reduce_window(
        x,
        0.0 if jnp.issubdtype(x.dtype, jnp.floating) else 0,
        jax.lax.add,
        window_dimensions=(1, ksize, ksize, 1),
        window_strides=(1, stride, stride, 1),
        padding="VALID",
    )
    return summed / jnp.asarray(ksize * ksize, x.dtype)


def bn_fold(bn: dict, eps: float = BN_EPS) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fold moving-stats BN into one f32 affine: y = x*w + b.

    THE canonical fold — pool/dense-head kernels and the TFLite exporter
    all consume this, so a parity fix here propagates everywhere.
    """
    inv = jax.lax.rsqrt(bn["var"].astype(jnp.float32) + eps)
    w = bn["scale"].astype(jnp.float32) * inv
    b = (
        bn["bias"].astype(jnp.float32)
        - bn["mean"].astype(jnp.float32) * bn["scale"].astype(jnp.float32) * inv
    )
    return w, b


def batch_norm(x: jnp.ndarray, bn: dict, eps: float = BN_EPS) -> jnp.ndarray:
    """Inference-mode BN using stored moving statistics.

    Folded to a single multiply-add so XLA fuses it into the producer op.
    """
    w, b = bn_fold(bn, eps)
    return x * w.astype(x.dtype) + b.astype(x.dtype)


def batch_norm_train(
    x: jnp.ndarray, bn: dict, eps: float = BN_EPS, row_weights: jnp.ndarray | None = None
) -> tuple[jnp.ndarray, BNStats]:
    """Training-mode BN: normalize with biased batch stats over all non-channel axes.

    Matches `tf.layers.batch_normalization(training=True)` (reference
    network.py:193 with compute_bn_mean_var=True). Returns batch stats so the
    caller can fold the moving-average update (momentum 0.99).

    row_weights: optional float (B,) of 1.0 (real row) / 0.0 (padding).
    When given, the batch moments are weighted so padded rows contribute
    nothing — the statistics equal what a shrunk batch (real rows only)
    computes (pinned by tests/test_train_step.py::test_masked_bn_*). A
    zero-weight batch degrades to mean=0/var=0 (denominator clamped), which
    the masked train step discards via its no-op gate.
    """
    axes = tuple(range(x.ndim - 1))
    x32 = x.astype(jnp.float32)
    if row_weights is None:
        mean = jnp.mean(x32, axis=axes)
        # Two-pass variance (mean of squared deviations), like TF's fused
        # BN — the one-pass E[x²]−E[x]² form loses ~1e-3 of the activations
        # to f32 cancellation (post-ReLU6 means are O(1)) and visibly
        # shifts training-mode logits vs the TF oracle
        # (tests/test_grad_golden.py).
        var = jnp.mean(jnp.square(x32 - mean), axis=axes)
        n = 1
        for a in axes:
            n *= x.shape[a]
        bessel = n / max(n - 1, 1)
    else:
        w = row_weights.astype(jnp.float32).reshape(
            (-1,) + (1,) * (x.ndim - 1)
        )
        per_row = 1
        for a in axes[1:]:
            per_row *= x.shape[a]
        n = jnp.maximum(jnp.sum(row_weights.astype(jnp.float32)), 1.0) * per_row
        mean = jnp.sum(x32 * w, axis=axes) / n
        var = jnp.sum(jnp.square(x32 - mean) * w, axis=axes) / n
        bessel = n / jnp.maximum(n - 1.0, 1.0)
    inv = jax.lax.rsqrt(var + eps)
    w = (bn["scale"].astype(jnp.float32) * inv).astype(x.dtype)
    b = (
        bn["bias"].astype(jnp.float32)
        - mean * bn["scale"].astype(jnp.float32) * inv
    ).astype(x.dtype)
    return x * w + b, BNStats(mean=mean, var=var, var_unbiased=var * bessel)


def dense(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray | None = None) -> jnp.ndarray:
    pet = None if x.dtype == jnp.bfloat16 else jnp.promote_types(x.dtype, jnp.float32)
    y = jnp.dot(
        x,
        kernel.astype(x.dtype),
        preferred_element_type=pet,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(x.dtype)
    if bias is not None:
        y = y + bias.astype(x.dtype)
    return y


def dropout(x: jnp.ndarray, rate: jnp.ndarray | float, rng: jax.Array) -> jnp.ndarray:
    """Inverted dropout matching `tf.nn.dropout(rate=...)` (network.py:205).

    `rate` may be a traced scalar (the reference feeds it at runtime,
    network.py:54); rate == 0 is the identity by construction.
    """
    rate = jnp.asarray(rate, jnp.float32)
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    scale = jnp.where(keep > 0, 1.0 / jnp.maximum(keep, 1e-8), 0.0).astype(x.dtype)
    return jnp.where(mask, x * scale, jnp.zeros((), x.dtype))

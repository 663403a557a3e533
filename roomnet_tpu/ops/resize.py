"""Bilinear resize as MXU-friendly matmuls, with exact TF1/cv2 conventions.

Two sampling conventions matter for parity with the reference:

1. **TF1 legacy** (`tf.image.resize_bilinear` with ``align_corners=False,
   half_pixel_centers=False``): ``src = dst * in/out``. Used by the in-graph
   residual shortcuts (reference network.py:199) at three call sites
   (215->205, 100->48, 21->2 at 224x224 input). `jax.image.resize` uses
   half-pixel centers and is NOT parity-correct, so we build the
   interpolation weights ourselves.

2. **Half-pixel centers** (cv2.resize INTER_LINEAR / TF2 default):
   ``src = (dst + 0.5) * in/out - 0.5`` clamped to [0, in-1]. Used by the
   host-side preprocess (reference generator.py:85, network.py:152); the
   on-device fused preprocess must match cv2 bit-for-bit-ish.

Separable bilinear resize is expressed as two small dense matmuls
(rows then cols) so XLA schedules it on the MXU instead of gathers —
the interpolation matrices are compile-time constants for static shapes.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

__all__ = [
    "resize_bilinear_tf1",
    "resize_bilinear_half_pixel",
    "interp_matrix_tf1",
    "interp_matrix_half_pixel",
]


@functools.lru_cache(maxsize=None)
def _interp_matrix_tf1_np(in_size: int, out_size: int) -> np.ndarray:
    """(in_size, out_size) interpolation matrix, TF1 legacy convention."""
    if in_size == out_size:
        return np.eye(in_size, dtype=np.float32)
    # Coefficients in float32 arithmetic, matching the TF CPU kernel
    # (scale and src positions are computed as float, not double — using
    # f64 here shifts fracs by ~1e-5 and output by ~1e-4 at 215->205).
    scale = np.float32(in_size) / np.float32(out_size)
    dst = np.arange(out_size, dtype=np.float32)
    src = dst * scale
    lo = np.floor(src).astype(np.int64)
    lo = np.clip(lo, 0, in_size - 1)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = (src - lo.astype(np.float32)).astype(np.float32)
    w = np.zeros((in_size, out_size), dtype=np.float32)
    cols = np.arange(out_size)
    np.add.at(w, (lo, cols), np.float32(1.0) - frac)
    np.add.at(w, (hi, cols), frac)
    return w


@functools.lru_cache(maxsize=None)
def _interp_matrix_half_pixel_np(in_size: int, out_size: int) -> np.ndarray:
    """(in_size, out_size) interpolation matrix, half-pixel-centers convention."""
    if in_size == out_size:
        return np.eye(in_size, dtype=np.float32)
    # Float32 coefficient arithmetic (see tf1 variant above).
    scale = np.float32(in_size) / np.float32(out_size)
    dst = np.arange(out_size, dtype=np.float32)
    src = (dst + np.float32(0.5)) * scale - np.float32(0.5)
    src = np.clip(src, np.float32(0.0), np.float32(in_size - 1))
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = (src - lo.astype(np.float32)).astype(np.float32)
    w = np.zeros((in_size, out_size), dtype=np.float32)
    cols = np.arange(out_size)
    np.add.at(w, (lo, cols), np.float32(1.0) - frac)
    np.add.at(w, (hi, cols), frac)
    return w


def interp_matrix_tf1(in_size: int, out_size: int) -> np.ndarray:
    return _interp_matrix_tf1_np(in_size, out_size)


def interp_matrix_half_pixel(in_size: int, out_size: int) -> np.ndarray:
    return _interp_matrix_half_pixel_np(in_size, out_size)


def _apply_separable(x: jnp.ndarray, wh: np.ndarray, ww: np.ndarray) -> jnp.ndarray:
    """Apply row/col interpolation matrices to NHWC x via two contractions.

    Precision.HIGHEST: JAX's default matmul precision may run f32
    contractions as bf16 passes, which visibly quantizes the interpolation
    (parity-breaking); force full f32 MXU passes here.
    """
    import jax

    hi = jax.lax.Precision.HIGHEST
    if x.dtype == jnp.bfloat16:
        # Fast path: single-pass bf16 MXU (internal f32 accumulation); the
        # interpolation weights round to bf16 (serving-mode tolerance). No
        # explicit preferred_element_type — mixed-dtype transposes break
        # under grad, and the residual resize IS on the training path.
        y = jnp.einsum("bhwc,hi->biwc", x, jnp.asarray(wh, jnp.bfloat16), precision=hi)
        y = jnp.einsum("biwc,wj->bijc", y, jnp.asarray(ww, jnp.bfloat16), precision=hi)
        return y
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    # (B,H,W,C) x (H,H2) -> (B,W,C,H2) -> ... keep everything as dot_generals.
    y = jnp.einsum("bhwc,hi->biwc", x32, jnp.asarray(wh), precision=hi)
    y = jnp.einsum("biwc,wj->bijc", y, jnp.asarray(ww), precision=hi)
    return y.astype(orig_dtype)


def resize_bilinear_tf1(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """TF1-legacy bilinear resize of NHWC (align_corners=False, half_pixel=False).

    Parity target: `tf.image.resize_bilinear(x, out_hw)` as used by the
    residual shortcut in reference network.py:199.
    """
    _, h, w, _ = x.shape
    return _apply_separable(
        x, _interp_matrix_tf1_np(h, out_hw[0]), _interp_matrix_tf1_np(w, out_hw[1])
    )


def resize_bilinear_half_pixel(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Half-pixel-centers bilinear resize of NHWC (cv2 INTER_LINEAR convention).

    Parity target: `cv2.resize(im, (S, S))` in reference generator.py:85 and
    network.py:152 (exact for upscales; cv2 downscales match because
    INTER_LINEAR samples pure bilinear taps in both directions).
    """
    _, h, w, _ = x.shape
    return _apply_separable(
        x,
        _interp_matrix_half_pixel_np(h, out_hw[0]),
        _interp_matrix_half_pixel_np(w, out_hw[1]),
    )

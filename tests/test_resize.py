"""Op-level parity: bilinear resize conventions vs TF/cv2 golden outputs.

The TF1-legacy convention drives the three in-graph residual shortcuts
(reference network.py:199); the half-pixel convention drives preprocessing
(generator.py:85). Getting either convention wrong shifts every residual add
or flips predictions near decision boundaries (SURVEY.md §7 hard part #1/#2).
"""

import jax
import numpy as np
import pytest

from roomnet_tpu.ops.resize import (
    resize_bilinear_half_pixel,
    resize_bilinear_tf1,
)

CASES = [(215, 205), (100, 48), (21, 2), (7, 13)]


@pytest.mark.parametrize("src,dst", CASES)
def test_tf1_legacy_resize_matches_tf(resize_golden, src, dst):
    x = resize_golden[f"x_{src}_{dst}"]
    want = resize_golden[f"legacy_{src}_{dst}"]
    got = np.asarray(jax.jit(lambda a: resize_bilinear_tf1(a, (dst, dst)))(x))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("src,dst", CASES)
def test_half_pixel_resize_matches_tf(resize_golden, src, dst):
    x = resize_golden[f"x_{src}_{dst}"]
    want = resize_golden[f"half_{src}_{dst}"]
    got = np.asarray(jax.jit(lambda a: resize_bilinear_half_pixel(a, (dst, dst)))(x))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("src_h,src_w,dst", [(300, 300, 224), (517, 517, 224), (150, 150, 224)])
def test_half_pixel_resize_matches_cv2_uint8(cv2_resize_golden, src_h, src_w, dst):
    """cv2.resize INTER_LINEAR on uint8 rounds to nearest; allow off-by-one
    from cv2's fixed-point (11-bit) interpolation arithmetic."""
    x = cv2_resize_golden[f"x_{src_h}_{src_w}_{dst}"].astype(np.float32)[None]
    want = cv2_resize_golden[f"y_{src_h}_{src_w}_{dst}"].astype(np.float32)
    got = np.asarray(resize_bilinear_half_pixel(x, (dst, dst)))[0]
    # Compare rounded result within 1 gray level of cv2's fixed-point output.
    diff = np.abs(np.round(got) - want)
    assert np.mean(diff <= 1.0) > 0.999, f"mismatch frac {np.mean(diff > 1.0)}"
    assert diff.max() <= 2.0


def test_identity_resize_is_noop():
    x = np.random.RandomState(0).randn(1, 16, 16, 3).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(resize_bilinear_tf1(x, (16, 16))), x)
    np.testing.assert_array_equal(np.asarray(resize_bilinear_half_pixel(x, (16, 16))), x)


def _naive_resize(x, out_hw, convention):
    """Independent per-pixel reference (pure loops over numpy): gathers +
    lerps in float32, no matmuls — guards the interpolation-matrix
    construction at shapes no committed fixture pins."""
    b, h, w, c = x.shape
    oh, ow = out_hw

    def coords(in_size, out_size):
        out = []
        scale = np.float32(in_size) / np.float32(out_size)
        for d in range(out_size):
            if convention == "tf1":
                s = np.float32(d) * scale
            else:  # half-pixel
                s = (np.float32(d) + np.float32(0.5)) * scale - np.float32(0.5)
                s = max(np.float32(0.0), s)
            lo = min(int(np.floor(s)), in_size - 1)
            hi = min(lo + 1, in_size - 1)
            out.append((lo, hi, np.float32(s) - np.float32(lo)))
        return out

    ys, xs = coords(h, oh), coords(w, ow)
    res = np.empty((b, oh, ow, c), np.float32)
    for i, (ylo, yhi, fy) in enumerate(ys):
        row = x[:, ylo] * (1 - fy) + x[:, yhi] * fy  # (b, w, c)
        for j, (xlo, xhi, fx) in enumerate(xs):
            res[:, i, j] = row[:, xlo] * (1 - fx) + row[:, xhi] * fx
    return res


@pytest.mark.parametrize("convention,fn", [
    ("tf1", resize_bilinear_tf1),
    ("half", resize_bilinear_half_pixel),
])
def test_resize_matches_naive_reference_at_arbitrary_shapes(convention, fn):
    """Shape sweep vs the independent per-pixel implementation: up/down/
    non-square/extreme ratios — geometries no TF fixture covers."""
    rng = np.random.RandomState(13)
    cases = [((7, 5), (13, 3)), ((31, 31), (17, 29)), ((4, 9), (9, 4)),
             ((50, 20), (3, 44)), ((2, 2), (5, 5)), ((25, 25), (24, 24))]
    for (h, w), (oh, ow) in cases:
        x = rng.uniform(-2, 2, size=(2, h, w, 3)).astype(np.float32)
        want = _naive_resize(x, (oh, ow), convention)
        got = np.asarray(fn(x, (oh, ow)))
        np.testing.assert_allclose(
            got, want, rtol=1e-5, atol=1e-5,
            err_msg=f"{convention} {h}x{w}->{oh}x{ow}",
        )

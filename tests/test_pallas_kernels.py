"""Pallas kernel correctness (interpret mode on CPU; compiled on TPU)."""

import jax
import numpy as np
import pytest

from roomnet_tpu.ops import blocks as B
from roomnet_tpu.ops.pallas.dense_head import dense_head_pallas
from roomnet_tpu.params import schema
from tests.conftest import ARTIFACTS


@pytest.fixture(scope="module")
def dense_layers():
    path = ARTIFACTS / "roomnet_params.npz"
    if not path.exists():
        pytest.skip("converted params missing")
    return schema.unflatten_variables(dict(np.load(path)))["dense"]


def _xla_head(dense, x):
    h = x
    for li in range(3):
        h = B.relu6(B.dense(h, dense[li]["kernel"]))
        h = B.batch_norm(h, dense[li]["bn"])
    logits = B.relu6(B.dense(h, dense[3]["kernel"], dense[3]["bias"]))
    return jax.nn.softmax(logits, -1)


@pytest.mark.parametrize("bsz", [1, 16, 300])
def test_dense_head_kernel_matches_xla(dense_layers, bsz):
    x = np.random.RandomState(0).randn(bsz, 64).astype(np.float32)
    got = np.asarray(dense_head_pallas(dense_layers, x))
    want = np.asarray(_xla_head(dense_layers, x))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got.sum(-1), 1.0, atol=1e-5)


def test_dense_head_kernel_honors_bn_eps(dense_layers):
    """The kernel folds BN with the CALLER's epsilon — a non-default
    cfg.bn_eps variant must match the unfused path at that eps (the
    kernel used to hardcode the module default)."""
    eps = 1e-2
    x = np.random.RandomState(1).randn(8, 64).astype(np.float32)
    got = np.asarray(dense_head_pallas(dense_layers, x, bn_eps=eps))
    h = x
    for li in range(3):
        h = B.relu6(B.dense(h, dense_layers[li]["kernel"]))
        h = B.batch_norm(h, dense_layers[li]["bn"], eps=eps)
    logits = B.relu6(B.dense(h, dense_layers[3]["kernel"],
                             dense_layers[3]["bias"]))
    want = np.asarray(jax.nn.softmax(logits, -1))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    # and it genuinely differs from the default-eps fold
    default = np.asarray(dense_head_pallas(dense_layers, x))
    assert np.abs(default - got).max() > 1e-6


@pytest.mark.parametrize(
    "shape",
    [  # (H, W, C, ksize, stride) — the stride-1 pool geometries (B1/B2);
        # stride 2 is out of the kernel's surface (see pool.py docstring)
        (12, 12, 8, 3, 1),
        (13, 15, 32, 4, 1),
        (107, 53, 8, 3, 1),  # multi-strip path (>48 output rows)
    ],
)
def test_fused_pool_kernel_matches_xla(shape):
    from roomnet_tpu.ops.pallas.pool import bn_affine_params, fused_relu6_pool_bn

    H, W, C, k, s = shape
    rng = np.random.RandomState(0)
    x = jax.numpy.asarray(rng.randn(2, H, W, C).astype(np.float32) * 3)
    bn = {
        "scale": jax.numpy.asarray(rng.rand(C).astype(np.float32) + 0.5),
        "bias": jax.numpy.asarray(rng.randn(C).astype(np.float32)),
        "mean": jax.numpy.asarray(rng.randn(C).astype(np.float32)),
        "var": jax.numpy.asarray(rng.rand(C).astype(np.float32) + 0.5),
    }
    w, b = bn_affine_params(bn, B.BN_EPS)
    want = np.asarray(B.batch_norm(B.avg_pool_valid(B.relu6(x), k, s), bn))
    got = np.asarray(
        fused_relu6_pool_bn(x, w, b, ksize=k, stride=s, interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_conv3x3_pallas_matches_xla():
    """The measured fused-B2 attempt (ops/pallas/conv_b2.py): numerically a
    real conv — the A/B harness measures why it still loses to XLA."""
    from roomnet_tpu.ops.pallas.conv_b2 import conv3x3_pallas

    rng = np.random.RandomState(1)
    x = jax.numpy.asarray(rng.randn(2, 18, 20, 8).astype(np.float32))
    kern = jax.numpy.asarray(rng.randn(3, 3, 8, 16).astype(np.float32) * 0.1)
    got = conv3x3_pallas(x, kern, row_tile=8, interpret=True)
    want = B.conv2d_valid(x, kern)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)

def test_residual_bn_pallas_matches_xla():
    """The measured fused b2.residual attempt (ops/pallas/residual.py):
    numerically BN(x + resize_tf1(res)) — the A/B harness
    (tools/bench_kernels.py bench_b2_residual) measures why it loses to
    the einsum lowering on-chip (boundary transposes + small-grid steps)."""
    from roomnet_tpu.ops.pallas.residual import residual_bn_pallas
    from roomnet_tpu.ops.resize import resize_bilinear_tf1

    rng = np.random.RandomState(3)
    bn = {
        "scale": jax.numpy.asarray(rng.rand(8).astype(np.float32) + 0.5),
        "bias": jax.numpy.asarray(rng.randn(8).astype(np.float32)),
        "mean": jax.numpy.asarray(rng.randn(8).astype(np.float32)),
        "var": jax.numpy.asarray(rng.rand(8).astype(np.float32) + 0.5),
    }
    x = jax.numpy.asarray(rng.randn(2, 21, 19, 8).astype(np.float32))
    res = jax.numpy.asarray(rng.randn(2, 25, 23, 8).astype(np.float32))
    want = B.batch_norm(x + resize_bilinear_tf1(res, (21, 19)), bn)
    got = residual_bn_pallas(x, res, bn, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

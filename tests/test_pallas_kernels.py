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

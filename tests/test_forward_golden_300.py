"""roomnet-300 geometry parity vs a TF1 oracle (round-3 review item #4).

The frozen reference graph is 224-only; the reference's own 300/600
experiments rebuilt the graph at the new size and restored conv weights
while excluding the dense head (network.py:78, :242). The fixture
(tools/make_golden.py:make_forward_golden_300) mirrors that: TF1's own
conv/pool/BN/legacy-resize kernels at 300² with the converted conv weights
and a seeded dense head stored in the fixture. This pins the 300-geometry
residual resize chains (291→281, 138→67, 30→4) no 224-derived test covers.
"""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from roomnet_tpu.models import registry
from roomnet_tpu.models.roomnet import forward, normalize_bgr_uint8
from tests.conftest import GOLDEN_DIR


@pytest.fixture(scope="module")
def golden300():
    path = GOLDEN_DIR / "forward_golden_300.npz"
    if not path.exists():
        pytest.skip("forward_golden_300.npz missing — run tools/make_golden.py")
    return dict(np.load(path))


@pytest.fixture(scope="module")
def variables300(converted_variables, golden300):
    """Converted conv/BN weights + the fixture's seeded 300-geometry head."""
    v = copy.deepcopy(jax.device_get(converted_variables))
    for di in range(4):
        v["dense"][di]["kernel"] = jnp.asarray(golden300[f"dense/{di}/kernel"])
    v["dense"][3]["bias"] = jnp.asarray(golden300["dense/3/bias"])
    return v


def test_forward_300_matches_tf_oracle(golden300, variables300):
    cfg = registry.get("roomnet-300")
    x = normalize_bgr_uint8(jnp.asarray(golden300["x_uint8_bgr"]))
    logits = np.asarray(jax.jit(
        lambda v, x: forward(v, x, cfg)
    )(variables300, x))
    # Same gate as the 224 golden (≤1e-4); measured 3.6e-6.
    np.testing.assert_allclose(
        logits, golden300["logits"], atol=1e-4, rtol=0,
        err_msg="300-geometry logits diverge from the TF oracle",
    )


def test_layer_taps_300_match_tf_oracle(golden300, variables300):
    """Block-by-block taps at the 300 geometry — localizes a resize/pool
    shape bug to its block (same tap protocol as test_layer_golden)."""
    from roomnet_tpu.ops import blocks as B
    from roomnet_tpu.ops.resize import resize_bilinear_tf1

    cfg = registry.get("roomnet-300")
    x = normalize_bgr_uint8(jnp.asarray(golden300["x_uint8_bgr"]))
    tols = {"b0_out": 1e-5, "b1_out": 5e-3, "b2_out": 5e-3,
            "b3_out": 5e-3, "b4_out": 1e-2}
    for bi, blk in enumerate(variables300["blocks"]):
        depth = len(blk["conv"])
        pool = cfg.block_pools[bi]
        res_in = None
        for d in range(depth):
            x = B.conv2d_valid(x, blk["conv"][d])
            x = B.relu6(x)
            if pool is not None:
                x = B.avg_pool_valid(x, pool[0], pool[1])
            x = B.batch_norm(x, blk["bn"][d], cfg.bn_eps)
            if d == 0:
                res_in = x
        if depth > 1:
            x = x + resize_bilinear_tf1(res_in, (x.shape[1], x.shape[2]))
            x = B.batch_norm(x, blk["res_bn"], cfg.bn_eps)
        want = golden300[f"b{bi}_out"]
        got = np.asarray(x)[:, : want.shape[1], : want.shape[2], :]
        np.testing.assert_allclose(
            got, want, atol=tols[f"b{bi}_out"], err_msg=f"b{bi}_out"
        )

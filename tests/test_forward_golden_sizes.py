"""Non-224 geometry parity vs TF1 oracles (round-3 review item #4).

The frozen reference graph is 224-only; the reference's own 300/600
experiments rebuilt the graph at the new size and restored conv weights
while excluding the dense head (network.py:78, :242). The fixtures
(tools/make_golden.py:make_forward_golden_size) mirror that: TF1's own
conv/pool/BN/legacy-resize kernels at 300²/600² with the converted conv
weights and a seeded dense head stored in the fixture. This pins the
residual resize chains (300: 291→281, 138→67, 30→4; 600: 591→581,
288→142, 68→14) no 224-derived test covers.
"""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from roomnet_tpu.models import registry
from roomnet_tpu.models.roomnet import forward, normalize_bgr_uint8
from tests.conftest import GOLDEN_DIR


@pytest.fixture(scope="module", params=[300, 600])
def golden_size(request):
    path = GOLDEN_DIR / f"forward_golden_{request.param}.npz"
    if not path.exists():
        pytest.skip(f"{path.name} missing — run tools/make_golden.py")
    return request.param, dict(np.load(path))


@pytest.fixture(scope="module")
def variables_size(converted_variables, golden_size):
    """Converted conv/BN weights + the fixture's seeded geometry head."""
    _, g = golden_size
    v = copy.deepcopy(jax.device_get(converted_variables))
    for di in range(4):
        v["dense"][di]["kernel"] = jnp.asarray(g[f"dense/{di}/kernel"])
    v["dense"][3]["bias"] = jnp.asarray(g["dense/3/bias"])
    return v


def test_forward_size_matches_tf_oracle(golden_size, variables_size):
    side, g = golden_size
    cfg = registry.get(f"roomnet-{side}")
    x = normalize_bgr_uint8(jnp.asarray(g["x_uint8_bgr"]))
    logits = np.asarray(jax.jit(
        lambda v, x: forward(v, x, cfg)
    )(variables_size, x))
    # Same gate as the 224 golden (≤1e-4); measured 3.6e-6 at 300.
    np.testing.assert_allclose(
        logits, g["logits"], atol=1e-4, rtol=0,
        err_msg=f"{side}-geometry logits diverge from the TF oracle",
    )


def test_layer_taps_size_match_tf_oracle(golden_size, variables_size):
    """Block-by-block taps at the non-224 geometry — localizes a
    resize/pool shape bug to its block (same tap protocol as
    test_layer_golden)."""
    from roomnet_tpu.ops import blocks as B
    from roomnet_tpu.ops.resize import resize_bilinear_tf1

    side, g = golden_size
    cfg = registry.get(f"roomnet-{side}")
    x = normalize_bgr_uint8(jnp.asarray(g["x_uint8_bgr"]))
    tols = {"b0_out": 1e-5, "b1_out": 5e-3, "b2_out": 5e-3,
            "b3_out": 5e-3, "b4_out": 1e-2}
    for bi, blk in enumerate(variables_size["blocks"]):
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
        want = g[f"b{bi}_out"]
        got = np.asarray(x)[:, : want.shape[1], : want.shape[2], :]
        np.testing.assert_allclose(
            got, want, atol=tols[f"b{bi}_out"], err_msg=f"b{bi}_out"
        )

"""Per-layer golden parity: each conv block's closing BN output vs the
reference graph (sliced fixtures). Localizes regressions that full-forward
logits would only show in aggregate — the guard rail for future kernel or
fusion changes on the compute path.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from roomnet_tpu.models.roomnet import DEFAULT_CONFIG, normalize_bgr_uint8
from roomnet_tpu.ops import blocks as B
from roomnet_tpu.ops.resize import resize_bilinear_tf1
from tests.conftest import GOLDEN_DIR


@pytest.fixture(scope="module")
def layer_golden():
    path = GOLDEN_DIR / "layers_golden.npz"
    if not path.exists():
        pytest.skip("layers_golden.npz missing — run tools/make_golden.py")
    return dict(np.load(path))


def _taps(variables, x):
    """Re-run the forward collecting each block's closing BN output."""
    cfg = DEFAULT_CONFIG
    taps = {}
    for bi, blk in enumerate(variables["blocks"]):
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
        taps[f"b{bi}_out"] = x
    x = x.reshape(x.shape[0], -1)
    for di, layer in enumerate(variables["dense"]):
        x = B.dense(x, layer["kernel"], layer["bias"])
        x = B.relu6(x)
        if layer["bn"] is not None:
            x = B.batch_norm(x, layer["bn"], cfg.bn_eps)
        if di == 2:
            taps["d2_out"] = x
    return taps


# Per-tap tolerance: f32 rounding noise amplified by depth (measured:
# ≤1.5e-8 at b0, ~5e-3 at the deepest taps — see tools/debug_parity.py).
TOLS = {
    "b0_out": 1e-5,
    "b1_out": 5e-3,
    "b2_out": 5e-3,
    "b3_out": 5e-3,
    "b4_out": 1e-2,
    "d2_out": 2e-2,
}


def test_layer_taps_match_reference(layer_golden, converted_variables, forward_golden):
    x = normalize_bgr_uint8(jnp.asarray(forward_golden["x_uint8_bgr"][:2]))
    taps = _taps(converted_variables, x)
    for name, want in layer_golden.items():
        got = np.asarray(taps[name])
        if got.ndim == 4:
            got = got[:, : want.shape[1], : want.shape[2], :]
        else:
            got = got[:, : want.shape[1]]
        np.testing.assert_allclose(got, want, atol=TOLS[name], err_msg=name)

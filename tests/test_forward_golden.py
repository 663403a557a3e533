"""Full-forward golden parity: JAX model + converted checkpoint vs TF graph.

The oracle is the frozen reference graph itself (SURVEY.md §4): fixtures in
tests/golden/forward_golden.npz hold its logits/softmax/argmax on a fixed
batch, plus float64 logits from our semantics run in f64.

Tolerance note (measured, tools/debug_parity.py): with Precision.HIGHEST on
all contractions the JAX logits match the TF graph to 2.1e-6; without it,
JAX's default matmul precision decomposes f32 convs into bf16 passes and the
BN chain amplifies that to ~5e-2. SURVEY.md §7's 1e-4 target holds.
"""

import jax
import jax.numpy as jnp
import numpy as np

from roomnet_tpu.models.roomnet import (
    DEFAULT_CONFIG,
    forward,
    normalize_bgr_uint8,
    param_count,
    predict,
)

LOGITS_ATOL = 1e-4  # measured 2.1e-6 on CPU; headroom for TPU rounding
SOFTMAX_ATOL = 1e-4


def test_param_count_matches_reference(converted_variables):
    assert param_count(converted_variables) == 178062  # SURVEY.md §2.5


def test_logits_match_tf_graph(forward_golden, converted_variables):
    x = normalize_bgr_uint8(jnp.asarray(forward_golden["x_uint8_bgr"]))
    logits = np.asarray(jax.jit(lambda v, x: forward(v, x))(converted_variables, x))
    np.testing.assert_allclose(logits, forward_golden["logits"], atol=LOGITS_ATOL)


def test_softmax_and_argmax_match(forward_golden, converted_variables):
    x = normalize_bgr_uint8(jnp.asarray(forward_golden["x_uint8_bgr"]))
    preds, probs = jax.jit(lambda v, x: predict(v, x))(converted_variables, x)
    np.testing.assert_array_equal(np.asarray(preds), forward_golden["argmax"])
    np.testing.assert_allclose(np.asarray(probs), forward_golden["softmax"], atol=SOFTMAX_ATOL)


def test_wide_golden_batch_parity(converted_variables):
    """Round-2 widening of the parity evidence: a 64-image batch (procedural
    photo-like structures, documentation crops, gradients, noise; 5 of 6
    classes represented) from the frozen TF graph. f32 logits <= 1e-4 and
    argmax exact; bf16 serving mode keeps exact argmax."""
    import os

    import pytest

    path = os.path.join(os.path.dirname(__file__), "golden", "forward_golden_wide.npz")
    if not os.path.exists(path):
        pytest.skip("wide golden fixture missing (tools/make_golden.py)")
    g = dict(np.load(path))
    from roomnet_tpu.models.roomnet import FAST_CONFIG

    x = normalize_bgr_uint8(jnp.asarray(g["x_uint8_bgr"]))
    logits = np.asarray(jax.jit(lambda v, x: forward(v, x))(converted_variables, x))
    np.testing.assert_allclose(logits, g["logits"], atol=LOGITS_ATOL)
    np.testing.assert_array_equal(logits.argmax(-1), g["argmax"])
    logits_bf16 = np.asarray(forward(converted_variables, x, FAST_CONFIG))
    np.testing.assert_array_equal(logits_bf16.argmax(-1), g["argmax"])


def test_logits_are_relu6_clipped(forward_golden, converted_variables):
    """Reference quirk: dense_block applies ReLU6 to the logits layer too
    (network.py:214) — outputs must lie in [0, 6]."""
    x = normalize_bgr_uint8(jnp.asarray(forward_golden["x_uint8_bgr"]))
    logits = np.asarray(forward(converted_variables, x))
    assert logits.min() >= 0.0 and logits.max() <= 6.0


def test_batch_invariance(converted_variables):
    """Per-image result must not depend on batch composition."""
    rng = np.random.RandomState(3)
    x = normalize_bgr_uint8(
        jnp.asarray(rng.randint(0, 256, size=(4, 224, 224, 3), dtype=np.uint8))
    )
    full = np.asarray(forward(converted_variables, x))
    single = np.concatenate(
        [np.asarray(forward(converted_variables, x[i : i + 1])) for i in range(4)]
    )
    np.testing.assert_allclose(full, single, rtol=2e-5, atol=2e-5)


def test_geometry_matches_survey():
    assert DEFAULT_CONFIG.spatial_sizes() == [
        [220],
        [215, 210, 205],
        [100, 48],
        [46],
        [21, 8, 2],
    ]
    assert DEFAULT_CONFIG.flat_len == 64


def test_bf16_serving_mode_argmax_parity(forward_golden, converted_variables):
    """FAST_CONFIG (bf16 single-pass MXU) must keep exact argmax parity with
    the reference graph on the golden batch (the serving-mode contract;
    measured |dlogit| <= 0.08)."""
    from roomnet_tpu.models.roomnet import FAST_CONFIG

    x = normalize_bgr_uint8(jnp.asarray(forward_golden["x_uint8_bgr"]))
    logits = np.asarray(forward(converted_variables, x, FAST_CONFIG))
    np.testing.assert_array_equal(logits.argmax(-1), forward_golden["argmax"])
    assert np.abs(logits - forward_golden["logits"]).max() < 0.15

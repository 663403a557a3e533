"""uint8-input algebraic preprocess fold == explicit normalize path."""

import jax
import numpy as np
import pytest

from roomnet_tpu.models.roomnet import forward, init_variables, normalize_bgr_uint8
from tests.tiny import TINY


def test_uint8_fold_matches_normalized_path():
    rng = np.random.RandomState(0)
    x8 = rng.randint(0, 256, size=(4, TINY.im_side, TINY.im_side, 3), dtype=np.uint8)
    variables = init_variables(jax.random.PRNGKey(0), TINY)
    via_norm = np.asarray(forward(variables, normalize_bgr_uint8(x8), TINY))
    via_fold = np.asarray(forward(variables, x8, TINY))
    np.testing.assert_allclose(via_fold, via_norm, rtol=2e-4, atol=2e-5)


def test_uint8_fold_golden_parity(forward_golden, converted_variables):
    """Full 224 model: uint8 direct input reproduces the TF graph argmax."""
    logits = np.asarray(forward(converted_variables, forward_golden["x_uint8_bgr"]))
    np.testing.assert_array_equal(logits.argmax(-1), forward_golden["argmax"])
    np.testing.assert_allclose(logits, forward_golden["logits"], atol=5e-4)

"""TFLite export: pure-builtins conversion + numerical parity with the JAX
forward (the _tf_forward twin in params/export.py must track any model
change). TF is an offline-only dependency — skipped when absent."""

import numpy as np
import pytest

import jax

from roomnet_tpu.models.roomnet import forward, init_variables
from tests.tiny import TINY

tf = pytest.importorskip("tensorflow")


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    from roomnet_tpu.params.export import export_tflite

    variables = init_variables(jax.random.PRNGKey(0), TINY)
    out = str(tmp_path_factory.mktemp("export") / "tiny.tflite")
    # Conversion with TFLITE_BUILTINS only: needing any Flex/SELECT op is a
    # conversion-time failure, so success here IS the no-Flex assertion.
    export_tflite(variables, out, TINY)
    return variables, out


def test_tflite_matches_jax_forward(exported):
    variables, model_path = exported
    interp = tf.lite.Interpreter(model_path=model_path)
    interp.allocate_tensors()
    inp = interp.get_input_details()[0]
    out = interp.get_output_details()[0]
    assert list(inp["shape"]) == [1, TINY.im_side, TINY.im_side, 3]

    rng = np.random.RandomState(0)
    worst = 0.0
    for i in range(4):
        x = rng.uniform(-1, 1, (1, TINY.im_side, TINY.im_side, 3)).astype(np.float32)
        interp.set_tensor(inp["index"], x)
        interp.invoke()
        probs = interp.get_tensor(out["index"])
        want = np.asarray(jax.nn.softmax(forward(exported[0], x, TINY), -1))
        worst = max(worst, float(np.abs(probs - want).max()))
        assert probs.argmax() == want.argmax()
    assert worst < 1e-4, worst


def test_tflite_ops_are_builtins_only(exported):
    """Inspect the flatbuffer opcodes: no FlexOps / custom ops."""
    _, model_path = exported
    blob = open(model_path, "rb").read()
    assert b"Flex" not in blob and b"XlaCallModule" not in blob


def test_quantized_variants_convert_and_track_float(exported, tmp_path):
    """Round-3 review item #4: dynamic-range and full-int8 variants must
    convert builtins-only, shrink the flatbuffer, and keep float I/O so
    the float demo patch works unchanged. (Flip rates at val scale are
    measured offline: tools/check_tflite.py --variants + PERF.md.)"""
    import os

    from roomnet_tpu.params.export import export_tflite

    variables, float_path = exported
    rng = np.random.RandomState(1)
    x = rng.uniform(-1, 1, (1, TINY.im_side, TINY.im_side, 3)).astype(np.float32)
    want = np.asarray(jax.nn.softmax(forward(variables, x, TINY), -1))
    for quant in ("dynamic", "int8"):
        p = str(tmp_path / f"tiny_{quant}.tflite")
        export_tflite(variables, p, TINY, quantize=quant)
        blob = open(p, "rb").read()
        assert b"Flex" not in blob and b"XlaCallModule" not in blob
        assert os.path.getsize(p) < os.path.getsize(float_path)
        interp = tf.lite.Interpreter(model_path=p)
        interp.allocate_tensors()
        inp = interp.get_input_details()[0]
        out = interp.get_output_details()[0]
        assert inp["dtype"] == np.float32 and out["dtype"] == np.float32
        interp.set_tensor(inp["index"], x)
        interp.invoke()
        probs = interp.get_tensor(out["index"])
        # quantized: coarse agreement only (flip rates pinned offline)
        assert np.abs(probs - want).max() < 0.35, (quant, probs, want)

def test_saved_model_polymorphic_batch(tmp_path):
    """export_saved_model's default batch_size=None exports a polymorphic
    batch dim (jax2tf shape polymorphism) — the documented default used to
    crash at trace time. The SavedModel must serve several batch sizes and
    match the JAX forward."""
    from roomnet_tpu.params.export import export_saved_model

    variables = init_variables(jax.random.PRNGKey(7), TINY)
    d = str(tmp_path / "sm")
    export_saved_model(variables, d, TINY)
    m = tf.saved_model.load(d)
    rng = np.random.RandomState(0)
    for b in (1, 3):
        x = rng.uniform(-1, 1, (b, TINY.im_side, TINY.im_side, 3)).astype(
            np.float32
        )
        out = m.f(x)
        assert out["class_id"].shape == (b,)
        assert out["probs"].shape == (b, TINY.num_classes)
        want = np.asarray(jax.nn.softmax(forward(variables, x, TINY), -1))
        np.testing.assert_allclose(out["probs"].numpy(), want, atol=1e-5)

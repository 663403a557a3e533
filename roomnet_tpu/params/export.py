"""Model export: jax2tf -> TFLite (the mobile deployment story).

The reference ships a stock TFLite Android camera demo whose .tflite models
are git-LFS-missing (SURVEY.md §2.3); this module produces a real
RoomNet .tflite from our params so that demo app (or any TFLite runtime)
can actually serve the classifier. TF is an optional, offline-only
dependency here — the runtime framework never imports it.
"""

from __future__ import annotations

import os


def _tf_forward(variables, x, cfg):
    """Inference forward in plain TF ops (export-only twin of
    models/roomnet.py:forward, moving-stats BN, no dropout).

    Every op maps to a TFLite BUILTIN: CONV_2D, RELU6, AVERAGE_POOL_2D,
    MUL/ADD (inference BN folded to one affine), RESIZE_BILINEAR (the TF1
    legacy op itself — align_corners=False, half_pixel_centers=False, the
    exact semantics of the reference residual resize, network.py:199),
    RESHAPE, FULLY_CONNECTED, SOFTMAX. jax2tf native serialization can't
    do this (it emits one XlaCallModule = Flex op), which is why the
    export path has its own graph builder.
    """
    import numpy as np
    import tensorflow as tf

    def bn_affine(h, bn):
        from roomnet_tpu.ops.blocks import bn_fold

        a, b = bn_fold(bn, cfg.bn_eps)  # the canonical fold (ops/blocks.py)
        return h * tf.constant(np.asarray(a)) + tf.constant(np.asarray(b))

    for bi, blk in enumerate(variables["blocks"]):
        depth = len(blk["conv"])
        pool = cfg.block_pools[bi]
        res_in = None
        for d in range(depth):
            k = tf.constant(np.asarray(blk["conv"][d], np.float32))
            x = tf.nn.conv2d(x, k, strides=1, padding="VALID")
            x = tf.nn.relu6(x)
            if pool is not None:
                x = tf.nn.avg_pool2d(x, pool[0], pool[1], "VALID")
            x = bn_affine(x, blk["bn"][d])
            if d == 0:
                res_in = x
        if depth > 1:
            x = x + tf.compat.v1.image.resize_bilinear(
                res_in, (x.shape[1], x.shape[2]),
                align_corners=False, half_pixel_centers=False,
            )
            x = bn_affine(x, blk["res_bn"])
    x = tf.reshape(x, (x.shape[0], -1))
    for layer in variables["dense"]:
        x = tf.linalg.matmul(x, tf.constant(np.asarray(layer["kernel"], np.float32)))
        if layer["bias"] is not None:
            x = x + tf.constant(np.asarray(layer["bias"], np.float32))
        x = tf.nn.relu6(x)  # unconditional, incl. logits (network.py:214)
        if layer["bn"] is not None:
            x = bn_affine(x, layer["bn"])
    return tf.nn.softmax(x, axis=-1)


def _representative_dataset(cfg, n: int = 96):
    """Calibration batches for full-int8 quantization: the same procedural
    photo-like content family the synthetic training/benchmark harnesses
    use (tools/make_synth_dataset.make_image), normalized like the model
    input (RGB [-1,1])."""
    import sys

    import numpy as np

    tools = os.path.join(os.path.dirname(__file__), "..", "..", "tools")
    if tools not in sys.path:
        sys.path.insert(0, tools)
    from make_synth_dataset import make_image

    rng = np.random.RandomState(20260819)

    def gen():
        for i in range(n):
            im = make_image(i % 6, rng, cfg.im_side, cfg.im_side)  # RGB uint8
            x = (im.astype(np.float32) / 255.0) * 2.0 - 1.0
            yield [x[None]]

    return gen


def export_tflite(variables, out_path: str, cfg=None, *, allow_flex: bool = False,
                  quantize: str | None = None) -> str:
    """Export forward+softmax to a .tflite flatbuffer — pure
    TFLITE_BUILTINS (loads in the stock interpreter, no Flex delegate;
    reference Classifier.java:189 uses the stock interpreter).

    Input signature: (1, im_side, im_side, 3) float32 RGB in [-1,1]
    (the normalized tensor the reference graph consumes, network.py:28).

    quantize (round-3 review item #4 — the stock demo's second classifier
    is a quantized model, ClassifierQuantizedMobileNet.java:46-77):
      * None       — float32 (the committed mobile/roomnet.tflite);
      * "dynamic"  — dynamic-range: int8 weights, float activations;
      * "int8"     — full integer quantization with a representative
        dataset; float32 I/O tensors (quantize/dequantize at the edges)
        so the float demo patch works unchanged.
    Measured argmax flip rates per variant: tools/check_tflite.py.
    """
    import jax
    import tensorflow as tf

    from roomnet_tpu.models.roomnet import DEFAULT_CONFIG

    cfg = cfg or DEFAULT_CONFIG
    variables = jax.device_get(variables)

    tf_fn = tf.function(
        lambda x: _tf_forward(variables, x, cfg),
        input_signature=[
            tf.TensorSpec((1, cfg.im_side, cfg.im_side, 3), tf.float32)
        ],
        autograph=False,
    )
    converter = tf.lite.TFLiteConverter.from_concrete_functions(
        [tf_fn.get_concrete_function()]
    )
    converter.target_spec.supported_ops = [tf.lite.OpsSet.TFLITE_BUILTINS]
    if quantize == "dynamic":
        converter.optimizations = [tf.lite.Optimize.DEFAULT]
    elif quantize == "int8":
        converter.optimizations = [tf.lite.Optimize.DEFAULT]
        converter.representative_dataset = _representative_dataset(cfg)
        converter.target_spec.supported_ops = [tf.lite.OpsSet.TFLITE_BUILTINS_INT8]
    elif quantize is not None:
        raise ValueError(f"quantize must be None|'dynamic'|'int8', got {quantize!r}")
    if allow_flex:  # escape hatch for future non-builtin graphs
        converter.target_spec.supported_ops.append(tf.lite.OpsSet.SELECT_TF_OPS)
    blob = converter.convert()
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with open(out_path, "wb") as f:
        f.write(blob)
    return out_path


def export_saved_model(variables, out_dir: str, cfg=None, batch_size: int | None = None) -> str:
    """Export forward+softmax+argmax as a TF SavedModel (serving container).

    batch_size=None (default) exports a polymorphic batch dimension via
    jax2tf shape polymorphism — the spatial dims stay static, which is
    all the model's resize/pool geometry needs. A concrete batch_size
    pins the signature instead."""
    import tensorflow as tf
    from jax.experimental import jax2tf

    from roomnet_tpu.models.roomnet import DEFAULT_CONFIG, forward

    cfg = cfg or DEFAULT_CONFIG

    def infer_fn(x):
        import jax

        logits = forward(variables, x, cfg)
        probs = jax.nn.softmax(logits, axis=-1)
        return {"class_id": jax.numpy.argmax(probs, -1), "probs": probs}

    # Without polymorphic_shapes, jax2tf cannot trace a (None, ...) spec:
    # the default used to crash in tf.saved_model.save.
    poly = ["(b, _, _, _)"] if batch_size is None else None
    module = tf.Module()
    module.f = tf.function(
        jax2tf.convert(infer_fn, with_gradient=False,
                       polymorphic_shapes=poly),
        input_signature=[
            tf.TensorSpec((batch_size, cfg.im_side, cfg.im_side, 3), tf.float32)
        ],
        autograph=False,
    )
    tf.saved_model.save(module, out_dir)
    return out_dir

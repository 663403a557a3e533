"""Model export: jax2tf -> TFLite (the mobile deployment story).

The reference ships a stock TFLite Android camera demo whose .tflite models
are git-LFS-missing (SURVEY.md §2.3); this module produces a real
RoomNet .tflite from our params so that demo app (or any TFLite runtime)
can actually serve the classifier. TF is an optional, offline-only
dependency here — the runtime framework never imports it.
"""

from __future__ import annotations

import os


def export_tflite(variables, out_path: str, cfg=None) -> str:
    """Export forward+softmax to a float32 .tflite flatbuffer.

    Input signature: (1, im_side, im_side, 3) float32 RGB in [-1,1]
    (the normalized tensor the reference graph consumes, network.py:28).
    """
    import tensorflow as tf
    from jax.experimental import jax2tf

    from roomnet_tpu.models.roomnet import DEFAULT_CONFIG, forward

    cfg = cfg or DEFAULT_CONFIG

    def infer_fn(x):
        import jax

        logits = forward(variables, x, cfg)
        return jax.nn.softmax(logits, axis=-1)

    tf_fn = tf.function(
        jax2tf.convert(infer_fn, with_gradient=False),
        input_signature=[
            tf.TensorSpec((1, cfg.im_side, cfg.im_side, 3), tf.float32)
        ],
        autograph=False,
    )
    converter = tf.lite.TFLiteConverter.from_concrete_functions(
        [tf_fn.get_concrete_function()]
    )
    converter.target_spec.supported_ops = [
        tf.lite.OpsSet.TFLITE_BUILTINS,
        tf.lite.OpsSet.SELECT_TF_OPS,
    ]
    blob = converter.convert()
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with open(out_path, "wb") as f:
        f.write(blob)
    return out_path


def export_saved_model(variables, out_dir: str, cfg=None, batch_size: int | None = None) -> str:
    """Export forward+softmax+argmax as a TF SavedModel (serving container)."""
    import tensorflow as tf
    from jax.experimental import jax2tf

    from roomnet_tpu.models.roomnet import DEFAULT_CONFIG, forward

    cfg = cfg or DEFAULT_CONFIG

    def infer_fn(x):
        import jax

        logits = forward(variables, x, cfg)
        probs = jax.nn.softmax(logits, axis=-1)
        return {"class_id": jax.numpy.argmax(probs, -1), "probs": probs}

    module = tf.Module()
    module.f = tf.function(
        jax2tf.convert(infer_fn, with_gradient=False),
        input_signature=[
            tf.TensorSpec((batch_size, cfg.im_side, cfg.im_side, 3), tf.float32)
        ],
        autograph=False,
    )
    tf.saved_model.save(module, out_dir)
    return out_dir

"""Full-circle verification of the reverse converter (params/export_tf.py):

    our flat npz -> TF1 checkpoint -> restored into the REFERENCE's own
    meta graph -> golden-batch logits == the committed fixture.

This is the proof that a model trained here deploys on unmodified
reference infrastructure (network.py:46-47 optimized-inference restore).
Needs TF + /root/reference; offline tool, ~1 min on CPU.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/verify_tf_export.py
"""

from __future__ import annotations

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_META = "/root/reference/final_model/roomnet.meta"


def main():
    import tensorflow.compat.v1 as tf

    tf.disable_eager_execution()
    from roomnet_tpu.params.export_tf import export_tf_checkpoint

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    flat = dict(np.load(os.path.join(here, "artifacts", "roomnet_params.npz")))
    golden = dict(np.load(os.path.join(here, "tests", "golden",
                                       "forward_golden.npz")))

    out_prefix = os.path.join(tempfile.mkdtemp(prefix="tf_export_"), "roomnet")
    path = export_tf_checkpoint(flat, out_prefix)
    print("exported:", path)

    x_norm = ((golden["x_uint8_bgr"][:, :, :, ::-1].astype(np.float64)
               / 255.0) * 2.0 - 1.0).astype(np.float32)
    graph = tf.Graph()
    with graph.as_default():
        saver = tf.train.import_meta_graph(REF_META)
        x_ph = graph.get_tensor_by_name("input_x_tensor:0")
        softmax_ts = [op.outputs[0] for op in graph.get_operations()
                      if op.type == "Softmax"]
        logits_ts = softmax_ts[0].op.inputs[0]
        with tf.Session(graph=graph) as sess:
            # THE claim under test: the reference's own Saver restores OUR
            # checkpoint by name, no remapping.
            saver.restore(sess, out_prefix)
            logits = sess.run(logits_ts, feed_dict={x_ph: x_norm})
    delta = np.abs(logits - golden["logits"]).max()
    print(f"reference graph on exported ckpt: max |dlogit| vs fixture = "
          f"{delta:.2e}")
    assert delta <= 1e-5, delta
    assert (logits.argmax(-1) == golden["argmax"]).all()
    print("VERIFY_TF_EXPORT_OK: the reference graph restores and reproduces "
          "the golden logits from our exported checkpoint")


if __name__ == "__main__":
    main()

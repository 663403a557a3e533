"""Offline reverse converter: native flat variables -> reference TF1 checkpoint.

Completes bidirectional interop (convert_tf.py is the other direction):
a model trained HERE exports to a TensorBundle checkpoint the reference's
own graph loads by name — pair the written `.data/.index` with the
reference's `roomnet.meta` and its `Saver.restore` (network.py:46-47,
:122) accepts it, so existing TF1 deployments keep working.

The frozen reference final_model checkpoint holds exactly the 79 model
tensors (verified via `tf.train.load_checkpoint` — no step/optimizer
slots), so that is what this writes. TensorFlow is used ONLY here
(offline tooling); the runtime framework never imports it.

Usage:
    python -m roomnet_tpu.params.export_tf \
        --params artifacts/roomnet_params.npz --out /tmp/export/roomnet

Verification (needs /root/reference): tools/verify_tf_export.py runs the
full circle — export, restore into the reference's OWN meta graph, run
the golden batch, compare logits to the committed fixture.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from roomnet_tpu.models.roomnet import DEFAULT_CONFIG, RoomNetConfig
from roomnet_tpu.params import schema


def export_tf_checkpoint(
    flat: dict[str, np.ndarray],
    out_prefix: str,
    cfg: RoomNetConfig = DEFAULT_CONFIG,
) -> str:
    """Write our flat variable dict as a TF1 TensorBundle checkpoint whose
    variable names follow the reference graph (schema.tf_name_map)."""
    import tensorflow.compat.v1 as tf  # local import: offline tool only

    tf.disable_eager_execution()
    name_map = schema.tf_name_map(cfg)
    missing = sorted(set(name_map) - set(flat))
    if missing:
        raise KeyError(f"flat variables missing for export: {missing}")
    graph = tf.Graph()
    with graph.as_default():
        tf_vars = []
        for our_path, tf_name in sorted(name_map.items()):
            val = np.asarray(flat[our_path], np.float32)
            tf_vars.append(
                tf.get_variable(
                    tf_name, initializer=tf.constant(val), dtype=tf.float32
                )
            )
        saver = tf.train.Saver(var_list=tf_vars)
        os.makedirs(os.path.dirname(os.path.abspath(out_prefix)), exist_ok=True)
        with tf.Session(graph=graph) as sess:
            sess.run(tf.global_variables_initializer())
            # write_meta_graph=False: the user pairs this with the
            # reference's own roomnet.meta (the graph is theirs; only the
            # weights are ours).
            path = saver.save(sess, out_prefix, write_meta_graph=False)
    return path


def export_params_file(params_path: str, out_prefix: str) -> tuple[str, int]:
    """Load a saved flat-params npz, drop the non-model namespaces
    (optimizer slots, metadata), and write the TF checkpoint. The ONE
    body behind both entry points (`python -m roomnet_tpu convert-to-tf`
    and this module's __main__) so the reserved-prefix filter can't
    drift between them. Returns (checkpoint_path, n_tensors)."""
    flat = dict(np.load(params_path))
    flat = {k: v for k, v in flat.items()
            if not k.startswith(("opt/", "meta/"))}
    return export_tf_checkpoint(flat, out_prefix), len(flat)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--params", default="artifacts/roomnet_params.npz")
    p.add_argument("--out", default="exported_tf/roomnet",
                   help="TF checkpoint prefix to write")
    args = p.parse_args()
    path, n = export_params_file(args.params, args.out)
    print(f"exported {n} tensors -> {path} "
          f"(pair with the reference roomnet.meta)")


if __name__ == "__main__":
    main()

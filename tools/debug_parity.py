"""Layer-by-layer parity debug: TF reference graph vs JAX forward taps."""

import os

os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

REF_CKPT = "/root/reference/final_model/roomnet"


def tf_taps(x_norm):
    import tensorflow.compat.v1 as tf

    tf.disable_eager_execution()
    graph = tf.Graph()
    with graph.as_default():
        saver = tf.train.import_meta_graph(REF_CKPT + ".meta")
        x_ph = graph.get_tensor_by_name("input_x_tensor:0")
        taps = []
        for op in graph.get_operations():
            if op.type in ("FusedBatchNorm", "FusedBatchNormV2", "FusedBatchNormV3"):
                taps.append((op.name, op.outputs[0]))
            elif op.type in ("AvgPool", "Relu6", "ResizeBilinear", "AddV2", "Add", "MatMul", "Conv2D"):
                taps.append((op.name, op.outputs[0]))
        with tf.Session(graph=graph) as sess:
            saver.restore(sess, REF_CKPT)
            vals = sess.run([t for _, t in taps], feed_dict={x_ph: x_norm})
    return {n: v for (n, _), v in zip(taps, vals)}


def jax_taps(x_norm):
    import jax.numpy as jnp

    from roomnet_tpu.models.roomnet import DEFAULT_CONFIG
    from roomnet_tpu.ops import blocks as B
    from roomnet_tpu.ops.resize import resize_bilinear_tf1
    from roomnet_tpu.params import schema

    flat = dict(np.load("artifacts/roomnet_params.npz"))
    variables = schema.unflatten_variables(flat)
    cfg = DEFAULT_CONFIG
    taps = {}
    x = jnp.asarray(x_norm)
    for bi, blk in enumerate(variables["blocks"]):
        depth = len(blk["conv"])
        pool = cfg.block_pools[bi]
        res_in = None
        for d in range(depth):
            x = B.conv2d_valid(x, blk["conv"][d])
            taps[f"b{bi}c{d}_conv"] = x
            x = B.relu6(x)
            taps[f"b{bi}c{d}_relu"] = x
            if pool is not None:
                x = B.avg_pool_valid(x, pool[0], pool[1])
                taps[f"b{bi}c{d}_pool"] = x
            x = B.batch_norm(x, blk["bn"][d], cfg.bn_eps)
            taps[f"b{bi}c{d}_bn"] = x
            if d == 0:
                res_in = x
        if depth > 1:
            x = x + resize_bilinear_tf1(res_in, (x.shape[1], x.shape[2]))
            taps[f"b{bi}_resadd"] = x
            x = B.batch_norm(x, blk["res_bn"], cfg.bn_eps)
            taps[f"b{bi}_resbn"] = x
    x = x.reshape(x.shape[0], -1)
    for di, layer in enumerate(variables["dense"]):
        x = B.dense(x, layer["kernel"], layer["bias"])
        taps[f"d{di}_mm"] = x
        x = B.relu6(x)
        if layer["bn"] is not None:
            x = B.batch_norm(x, layer["bn"], cfg.bn_eps)
            taps[f"d{di}_bn"] = x
    taps["logits"] = x
    return {k: np.asarray(v) for k, v in taps.items()}


if __name__ == "__main__":
    g = dict(np.load("tests/golden/forward_golden.npz"))
    x_uint8 = g["x_uint8_bgr"][:2]
    x_norm = ((x_uint8[:, :, :, ::-1].astype(np.float64) / 255.0) * 2.0 - 1.0).astype(np.float32)

    tf_out = tf_taps(x_norm)
    jx_out = jax_taps(x_norm)

    print("--- TF tensors (name: shape) in graph order ---")
    tf_by_shape = {}
    for n, v in tf_out.items():
        tf_by_shape.setdefault(v.shape, []).append(n)

    # Match JAX taps to TF taps by shape; print max-abs-diff for best match.
    for k, v in jx_out.items():
        cands = tf_by_shape.get(v.shape, [])
        if not cands:
            print(f"{k}: shape {v.shape} no TF candidate")
            continue
        diffs = [(np.abs(tf_out[c] - v).max(), c) for c in cands]
        diffs.sort()
        print(f"{k} {v.shape}: best match {diffs[0][1]}  maxdiff {diffs[0][0]:.3e}")

"""Generate golden parity fixtures from the reference TF1 graph (offline tool).

Produces tests/golden/*.npz consumed by the parity test suite:
  * forward_golden.npz — seeded uint8 BGR batch -> TF logits/softmax/argmax
    from the frozen reference graph (/root/reference/final_model/roomnet.meta).
  * resize_golden.npz — TF1-legacy `resize_bilinear` outputs at the three
    residual call-site shapes (+ an upscale case), and half-pixel (cv2/TF2)
    outputs for the preprocess path.

TF runs CPU-only here; fixtures are committed so tests never need TF.
"""

from __future__ import annotations

import os

import numpy as np

os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")
REF_CKPT = "/root/reference/final_model/roomnet"


def make_forward_golden():
    import tensorflow.compat.v1 as tf

    tf.disable_eager_execution()
    import cv2
    from glob import glob

    rng = np.random.RandomState(20260816)
    # Mix of pure noise and real image content (reference documentation PNGs)
    # so the golden logits are not all ReLU6-saturated/degenerate.
    ims = [rng.randint(0, 256, size=(224, 224, 3), dtype=np.uint8) for _ in range(2)]
    for p in sorted(glob("/root/reference/documentation/*.png"))[:6]:
        im = cv2.imread(p)  # BGR
        if im is None:
            continue
        h, w = im.shape[:2]
        side = min(h, w)
        im = im[(h - side) // 2 : (h + side) // 2, (w - side) // 2 : (w + side) // 2]
        ims.append(cv2.resize(im, (224, 224)))
    x_uint8 = np.stack(ims[:8], axis=0)  # BGR
    x_norm = ((x_uint8[:, :, :, ::-1].astype(np.float64) / 255.0) * 2.0 - 1.0).astype(
        np.float32
    )

    graph = tf.Graph()
    with graph.as_default():
        saver = tf.train.import_meta_graph(REF_CKPT + ".meta")
        x_ph = graph.get_tensor_by_name("input_x_tensor:0")
        softmax_ts = [op.outputs[0] for op in graph.get_operations() if op.type == "Softmax"]
        argmax_ts = [op.outputs[0] for op in graph.get_operations() if op.type == "ArgMax"]
        assert len(softmax_ts) == 1 and len(argmax_ts) == 1, (softmax_ts, argmax_ts)
        logits_ts = softmax_ts[0].op.inputs[0]
        with tf.Session(graph=graph) as sess:
            saver.restore(sess, REF_CKPT)
            logits, probs, preds = sess.run(
                [logits_ts, softmax_ts[0], argmax_ts[0]], feed_dict={x_ph: x_norm}
            )
    np.savez_compressed(
        os.path.join(GOLDEN_DIR, "forward_golden.npz"),
        x_uint8_bgr=x_uint8,
        logits=logits,
        softmax=probs,
        argmax=preds,
    )
    print("forward golden:", logits.shape, "preds", preds)


def make_forward_golden_wide():
    """A 64-image golden batch (round-2 widening of the 8-image pin):
    procedural photo-like structures at varied scales/colors + documentation
    PNG crops + gradients + noise, so the parity gate samples a far larger
    slice of the decision surface than the original fixture."""
    import tensorflow.compat.v1 as tf

    tf.disable_eager_execution()
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    import cv2
    from glob import glob

    from make_synth_dataset import make_image

    rng = np.random.RandomState(20260817)
    ims = []
    for i in range(40):  # structured procedural content, 6 class families
        im = make_image(i % 6, rng, 224, 224)[:, :, ::-1]  # BGR
        ims.append(np.ascontiguousarray(im))
    for p in sorted(glob("/root/reference/documentation/*.png")) * 2:
        if len(ims) >= 56:
            break
        im = cv2.imread(p)
        if im is None:
            continue
        h, w = im.shape[:2]
        side = min(h, w)
        y0 = rng.randint(h - side + 1)
        x0 = rng.randint(w - side + 1)
        ims.append(cv2.resize(im[y0 : y0 + side, x0 : x0 + side], (224, 224)))
    while len(ims) < 62:  # smooth gradients (exercise near-tie logits)
        g = np.linspace(0, 255, 224, dtype=np.float32)
        im = np.stack(
            [np.outer(g, np.ones(224)) * rng.rand(),
             np.outer(np.ones(224), g) * rng.rand(),
             np.full((224, 224), rng.randint(256), np.float32)], -1)
        ims.append(im.astype(np.uint8))
    while len(ims) < 64:
        ims.append(rng.randint(0, 256, size=(224, 224, 3), dtype=np.uint8))
    x_uint8 = np.stack(ims, axis=0)
    x_norm = ((x_uint8[:, :, :, ::-1].astype(np.float64) / 255.0) * 2.0 - 1.0).astype(
        np.float32
    )
    graph = tf.Graph()
    with graph.as_default():
        saver = tf.train.import_meta_graph(REF_CKPT + ".meta")
        x_ph = graph.get_tensor_by_name("input_x_tensor:0")
        softmax_ts = [op.outputs[0] for op in graph.get_operations() if op.type == "Softmax"]
        logits_ts = softmax_ts[0].op.inputs[0]
        with tf.Session(graph=graph) as sess:
            saver.restore(sess, REF_CKPT)
            logits, probs = sess.run([logits_ts, softmax_ts[0]], feed_dict={x_ph: x_norm})
    np.savez_compressed(
        os.path.join(GOLDEN_DIR, "forward_golden_wide.npz"),
        x_uint8_bgr=x_uint8,
        logits=logits,
        softmax=probs,
        argmax=probs.argmax(-1),
    )
    print("wide forward golden:", logits.shape,
          "class histogram", np.bincount(probs.argmax(-1), minlength=6))


def make_valset_golden():
    """Val-scale parity oracle (round-3 review item #1): 1839 deterministic
    JPEGs (tools/valset.py) -> the classifier's OWN preprocess (both the
    cv2 and native-C++ decode backends) -> frozen TF graph argmax per
    image + a 64-row logits subsample. The fixture is compact (~25 KB);
    the JPEGs regenerate deterministically at test time."""
    import tempfile

    import tensorflow.compat.v1 as tf

    tf.disable_eager_execution()
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    import valset

    tmp = tempfile.mkdtemp(prefix="valset_golden_")
    paths = valset.build_valset_jpegs(tmp)
    sha = valset.first_image_sha256(paths)
    # Image 11 is the first documentation-crop (kind 11): its sha pins the
    # EXTERNAL content dependency (reference doc PNGs), which image 0's
    # purely-procedural sha cannot (round-3 review finding).
    doc_sha = valset.file_sha256(paths[11])
    used_docs = valset.doc_dir_available()
    pixel_sets = {"cv2": valset.decode_cv2(paths)}
    native_px = valset.decode_native(paths)
    if native_px is not None:
        pixel_sets["native"] = native_px
        delta = np.abs(pixel_sets["cv2"].astype(np.int16) - native_px.astype(np.int16))
        print(f"native vs cv2 decode: max |dpx| {delta.max()}, "
              f"mean {delta.mean():.4f}")

    graph = tf.Graph()
    out = {
        "first_jpeg_sha256": np.frombuffer(bytes.fromhex(sha), np.uint8),
        "doc_jpeg_sha256": np.frombuffer(bytes.fromhex(doc_sha), np.uint8),
        "used_doc_pngs": np.asarray(int(used_docs), np.int8),
    }
    with graph.as_default():
        saver = tf.train.import_meta_graph(REF_CKPT + ".meta")
        x_ph = graph.get_tensor_by_name("input_x_tensor:0")
        softmax_ts = [op.outputs[0] for op in graph.get_operations()
                      if op.type == "Softmax"]
        logits_ts = softmax_ts[0].op.inputs[0]
        with tf.Session(graph=graph) as sess:
            saver.restore(sess, REF_CKPT)
            for name, px in pixel_sets.items():
                ids = np.empty(len(px), np.int8)
                logits_all = np.empty((len(px), 6), np.float32)
                for s in range(0, len(px), 64):
                    chunk = px[s:s + 64]
                    x_norm = ((chunk[:, :, :, ::-1].astype(np.float64) / 255.0)
                              * 2.0 - 1.0).astype(np.float32)
                    lg = sess.run(logits_ts, feed_dict={x_ph: x_norm})
                    logits_all[s:s + 64] = lg
                    ids[s:s + 64] = lg.argmax(-1)
                out[f"argmax_{name}"] = ids
                hist = np.bincount(ids.astype(np.int64), minlength=6)
                print(f"valset argmax histogram ({name}): {hist}")
                # top-2 margin: how fragile the exactness pin is
                srt = np.sort(logits_all, axis=-1)
                margin = srt[:, -1] - srt[:, -2]
                print(f"  top-2 logit margin: min {margin.min():.4f}, "
                      f"p1 {np.percentile(margin, 1):.4f}")
                if name == "cv2":
                    sample_idx = np.arange(0, len(px), 29)[:64]
                    out["logits_sample_idx"] = sample_idx.astype(np.int32)
                    out["logits_sample"] = logits_all[sample_idx]
    np.savez_compressed(os.path.join(GOLDEN_DIR, "valset_golden.npz"), **out)
    agree = None
    if "argmax_native" in out:
        agree = int((out["argmax_native"] == out["argmax_cv2"]).sum())
        print(f"native/cv2 argmax agreement: {agree}/{len(paths)}")
    print("valset golden written:", {k: np.asarray(v).shape for k, v in out.items()})


def make_resize_golden():
    import tensorflow.compat.v1 as tf

    tf.disable_eager_execution()
    rng = np.random.RandomState(7)
    cases = [(215, 205), (100, 48), (21, 2), (7, 13)]
    out = {}
    with tf.Session(graph=tf.Graph()) as sess:
        for src, dst in cases:
            x = rng.uniform(-3, 3, size=(2, src, src, 5)).astype(np.float32)
            y_legacy = sess.run(
                tf.image.resize_bilinear(
                    tf.constant(x), (dst, dst), align_corners=False,
                    half_pixel_centers=False,
                )
            )
            y_half = sess.run(
                tf.image.resize_bilinear(
                    tf.constant(x), (dst, dst), align_corners=False,
                    half_pixel_centers=True,
                )
            )
            out[f"x_{src}_{dst}"] = x
            out[f"legacy_{src}_{dst}"] = y_legacy
            out[f"half_{src}_{dst}"] = y_half
    np.savez_compressed(os.path.join(GOLDEN_DIR, "resize_golden.npz"), **out)
    print("resize golden:", len(out), "arrays")


def make_cv2_resize_golden():
    import cv2

    rng = np.random.RandomState(11)
    out = {}
    # 3-channel uint8 like real images, and float32 — both conventions used
    # by the host preprocess (generator.py:85, network.py:152).
    for src_h, src_w, dst in [(300, 300, 224), (517, 517, 224), (150, 150, 224)]:
        im = rng.randint(0, 256, size=(src_h, src_w, 3), dtype=np.uint8)
        res = cv2.resize(im, (dst, dst))  # INTER_LINEAR default
        out[f"x_{src_h}_{src_w}_{dst}"] = im
        out[f"y_{src_h}_{src_w}_{dst}"] = res
    np.savez_compressed(os.path.join(GOLDEN_DIR, "cv2_resize_golden.npz"), **out)
    print("cv2 resize golden:", len(out), "arrays")


def make_layer_golden():
    """Per-layer taps from the reference graph (sliced small) — regression
    fixtures so future kernel/fusion changes can be localized layer-by-layer
    without TF. Taps: the BN output closing each conv block."""
    import tensorflow.compat.v1 as tf

    tf.disable_eager_execution()
    g = dict(np.load(os.path.join(GOLDEN_DIR, "forward_golden.npz")))
    x_norm = (
        (g["x_uint8_bgr"][:2, :, :, ::-1].astype(np.float64) / 255.0) * 2.0 - 1.0
    ).astype(np.float32)
    taps = {
        "b0_out": "batch_normalization/FusedBatchNorm:0",
        "b1_out": "batch_normalization_4/FusedBatchNorm:0",
        "b2_out": "batch_normalization_7/FusedBatchNorm:0",
        "b3_out": "batch_normalization_8/FusedBatchNorm:0",
        "b4_out": "batch_normalization_12/FusedBatchNorm:0",
        "d2_out": "batch_normalization_15/batchnorm/add_1:0",
    }
    graph = tf.Graph()
    with graph.as_default():
        saver = tf.train.import_meta_graph(REF_CKPT + ".meta")
        x_ph = graph.get_tensor_by_name("input_x_tensor:0")
        tensors = {k: graph.get_tensor_by_name(v) for k, v in taps.items()}
        with tf.Session(graph=graph) as sess:
            saver.restore(sess, REF_CKPT)
            vals = sess.run(tensors, feed_dict={x_ph: x_norm})
    out = {}
    for k, v in vals.items():
        # slice to keep fixtures small but representative
        out[k] = v[:, : min(8, v.shape[1] if v.ndim > 2 else v.shape[1])] if v.ndim == 2 else v[:, :8, :8, :]
    np.savez_compressed(os.path.join(GOLDEN_DIR, "layers_golden.npz"), **out)
    print("layer golden:", {k: v.shape for k, v in out.items()})


def make_forward_golden_size(im_side: int = 300):
    """Golden oracle for a non-224 geometry (round-3 review item #4).

    The frozen reference graph has a 224-only placeholder, so a 300² run
    cannot feed it. The reference's own 300/600 experiments (README.md:32)
    rebuilt the SAME graph at the new input size and restored the conv
    weights while excluding the dense head (network.py:78, :242 —
    `flat_len` changes). This oracle does exactly that, in TF1's own
    kernels: conv/pool/BN/legacy-resize ops at im_side=300 with the
    converted reference conv weights + a seeded random dense head (stored
    in the fixture). Pins the 300-geometry residual resize shapes
    (296→281 is replaced by the 300 chain: resize 291→281, 138→67, 30→4)
    that no 224-derived test covers.
    """
    import sys

    import tensorflow.compat.v1 as tf

    tf.disable_eager_execution()
    sys.path.insert(0, os.path.dirname(__file__))
    from make_synth_dataset import make_image

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from roomnet_tpu.models import registry

    cfg = registry.get(f"roomnet-{im_side}")
    params = dict(np.load(os.path.join(os.path.dirname(__file__), "..",
                                       "artifacts", "roomnet_params.npz")))
    rng = np.random.RandomState(20260817 + im_side)
    ims = [make_image(i % 6, rng, im_side, im_side)[:, :, ::-1] for i in range(1)]
    ims.append(rng.randint(0, 256, size=(im_side, im_side, 3), dtype=np.uint8))
    x_uint8 = np.stack([np.ascontiguousarray(im) for im in ims])  # BGR
    x_norm = ((x_uint8[:, :, :, ::-1].astype(np.float64) / 255.0) * 2.0
              - 1.0).astype(np.float32)

    # Seeded dense head at the 300-geometry flat_len (glorot-uniform like
    # tf.layers defaults) — stored in the fixture for the JAX side.
    d_in = cfg.flat_len
    dense_params = {}
    for di, units in enumerate(tuple(cfg.dense_units) + (cfg.num_classes,)):
        # 0.4x glorot: full-scale random heads saturate most logits at the
        # ReLU6 clip, where the oracle can't see deltas — scaled-down
        # weights keep logits in the interior.
        limit = 0.4 * np.sqrt(6.0 / (d_in + units))
        dense_params[f"dense/{di}/kernel"] = rng.uniform(
            -limit, limit, size=(d_in, units)
        ).astype(np.float32)
        d_in = units
    dense_params["dense/3/bias"] = np.zeros((cfg.num_classes,), np.float32)

    eps = float(cfg.bn_eps)
    taps = {}
    graph = tf.Graph()
    with graph.as_default():
        x = tf.constant(x_norm)

        def bn(h, path):
            out, _, _ = tf.nn.fused_batch_norm(
                h,
                scale=tf.constant(params[f"{path}/scale"]),
                offset=tf.constant(params[f"{path}/bias"]),
                mean=tf.constant(params[f"{path}/mean"]),
                variance=tf.constant(params[f"{path}/var"]),
                epsilon=eps,
                is_training=False,
            )
            return out

        for bi in range(len(cfg.block_filters)):
            depth = cfg.block_depths[bi]
            pool = cfg.block_pools[bi]
            res_in = None
            for d in range(depth):
                x = tf.nn.conv2d(
                    x, tf.constant(params[f"blocks/{bi}/conv/{d}"]),
                    strides=[1, 1, 1, 1], padding="VALID",
                )
                x = tf.nn.relu6(x)
                if pool is not None:
                    k, st = pool
                    x = tf.nn.avg_pool2d(
                        x, ksize=[1, k, k, 1], strides=[1, st, st, 1],
                        padding="VALID",
                    )
                x = bn(x, f"blocks/{bi}/bn/{d}")
                if d == 0:
                    res_in = x
            if depth > 1:
                resized = tf.image.resize_bilinear(
                    res_in, tf.shape(x)[1:3], align_corners=False,
                    half_pixel_centers=False,
                )
                x = bn(x + resized, f"blocks/{bi}/res_bn")
            taps[f"b{bi}_out"] = x
        x = tf.reshape(x, (x.shape[0], -1))

        def bn_dense(h, path):
            # 2D input: the non-fused tf.layers form (the fused kernel is
            # NHWC-only) — x*(g*rsqrt(v+eps)) + (b - m*g*rsqrt(v+eps)).
            g = tf.constant(params[f"{path}/scale"])
            b = tf.constant(params[f"{path}/bias"])
            m = tf.constant(params[f"{path}/mean"])
            v = tf.constant(params[f"{path}/var"])
            inv = g * tf.math.rsqrt(v + eps)
            return h * inv + (b - m * inv)

        for di in range(len(cfg.dense_units) + 1):
            x = tf.matmul(x, tf.constant(dense_params[f"dense/{di}/kernel"]))
            if f"dense/{di}/bias" in dense_params:
                x = x + tf.constant(dense_params[f"dense/{di}/bias"])
            x = tf.nn.relu6(x)
            if di < len(cfg.dense_units):
                x = bn_dense(x, f"dense/{di}/bn")
        logits = x
        with tf.Session(graph=graph) as sess:
            tap_vals, logit_vals = sess.run([taps, logits])
    out = {"x_uint8_bgr": x_uint8, "logits": logit_vals}
    out.update(dense_params)
    for k, v in tap_vals.items():
        out[k] = v[:, :8, :8, :]
        print(f"  tap {k}: full shape {v.shape}")
    np.savez_compressed(
        os.path.join(GOLDEN_DIR, f"forward_golden_{im_side}.npz"), **out
    )
    print(f"{im_side} forward golden:", logit_vals, "argmax",
          logit_vals.argmax(-1))


if __name__ == "__main__":
    # Must sit BELOW every generator def: this module executes top-to-bottom,
    # so a mid-file __main__ block would NameError on later definitions.
    import sys as _sys

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    if "--valset-only" in _sys.argv:
        make_valset_golden()
    elif "--golden-300-only" in _sys.argv:
        make_forward_golden_size(300)
    elif "--golden-600-only" in _sys.argv:
        make_forward_golden_size(600)
    else:
        make_forward_golden()
        make_resize_golden()
        make_cv2_resize_golden()
        make_layer_golden()
        make_forward_golden_wide()
        make_valset_golden()
        make_forward_golden_size(300)
        make_forward_golden_size(600)

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


def _tf_build_loss(tf, cfg, c, x, labels, l2_coeff, training, trainable_paths):
    """Reference training-loss graph (network.py:56-59) from tf.nn
    primitives, built inside the CURRENT default graph: mean sparse-softmax
    CE on the ReLU6-clipped logits + ``l2_coeff * tf.nn.l2_loss(v)`` over
    every trainable tensor (incl. BN gamma/beta, never the moving stats).

    ``c`` maps flat param paths to tensors (constants OR variables — the
    trajectory generator passes variables so tf.train can update them),
    ``x`` is the normalized input tensor. ``training`` selects BN mode
    (compute_bn_mean_var, network.py:193): batch statistics (fused 4D
    kernel / tf.nn.moments on 2D) vs the stored moving stats.
    Returns (ce, loss, logits) tensors.
    """
    eps = float(cfg.bn_eps)

    def bn4(h, path):
        # 4D: the fused kernel tf.layers uses on NHWC inputs.
        if training:
            h, _, _ = tf.nn.fused_batch_norm(
                h, c[f"{path}/scale"], c[f"{path}/bias"],
                epsilon=eps, is_training=True,
            )
        else:
            h, _, _ = tf.nn.fused_batch_norm(
                h, c[f"{path}/scale"], c[f"{path}/bias"],
                mean=c[f"{path}/mean"], variance=c[f"{path}/var"],
                epsilon=eps, is_training=False,
            )
        return h

    for bi in range(len(cfg.block_filters)):
        depth = cfg.block_depths[bi]
        pool = cfg.block_pools[bi]
        res_in = None
        for d in range(depth):
            x = tf.nn.conv2d(
                x, c[f"blocks/{bi}/conv/{d}"],
                strides=[1, 1, 1, 1], padding="VALID",
            )
            x = tf.nn.relu6(x)
            if pool is not None:
                k, st = pool
                x = tf.nn.avg_pool2d(
                    x, ksize=[1, k, k, 1], strides=[1, st, st, 1],
                    padding="VALID",
                )
            x = bn4(x, f"blocks/{bi}/bn/{d}")
            if d == 0:
                res_in = x
        if depth > 1:
            resized = tf.image.resize_bilinear(
                res_in, tf.shape(x)[1:3], align_corners=False,
                half_pixel_centers=False,
            )
            x = bn4(x + resized, f"blocks/{bi}/res_bn")
    x = tf.reshape(x, (x.shape[0], -1))

    def bn2(h, path):
        # 2D input: tf.layers falls back to the non-fused form; in
        # training mode it normalizes with biased batch moments.
        if training:
            m, v = tf.nn.moments(h, axes=[0])
        else:
            m, v = c[f"{path}/mean"], c[f"{path}/var"]
        inv = c[f"{path}/scale"] * tf.math.rsqrt(v + eps)
        return h * inv + (c[f"{path}/bias"] - m * inv)

    for di in range(len(cfg.dense_units) + 1):
        x = tf.matmul(x, c[f"dense/{di}/kernel"])
        if f"dense/{di}/bias" in c:
            x = x + c[f"dense/{di}/bias"]
        x = tf.nn.relu6(x)
        if di < len(cfg.dense_units):
            x = bn2(x, f"dense/{di}/bn")
    logits = x
    ce = tf.reduce_mean(
        tf.nn.sparse_softmax_cross_entropy_with_logits(
            labels=tf.constant(labels), logits=logits
        )
    )
    l2 = tf.add_n([l2_coeff * tf.nn.l2_loss(c[p]) for p in trainable_paths])
    return ce, ce + l2, logits


def _tf_training_loss(cfg, params, x_norm, labels, l2_coeff, training):
    """One-shot oracle: run the loss graph on constants and return
    (ce, loss, logits, {path: dCE/d0}) as numpy (tests/test_grad_golden)."""
    import tensorflow.compat.v1 as tf

    from roomnet_tpu.params import schema

    trainable_paths = [p for p in sorted(params) if schema.is_trainable_path(p)]
    graph = tf.Graph()
    with graph.as_default():
        c = {p: tf.constant(v) for p, v in params.items()}
        ce, loss, logits = _tf_build_loss(
            tf, cfg, c, tf.constant(x_norm), labels, l2_coeff, training,
            trainable_paths,
        )
        grads = tf.gradients(ce, [c[p] for p in trainable_paths])
        grads = [
            gr if gr is not None else tf.zeros_like(c[p])
            for gr, p in zip(grads, trainable_paths)
        ]
        with tf.Session(graph=graph) as sess:
            ce_v, loss_v, logit_v, grad_vs = sess.run([ce, loss, logits, grads])
    return ce_v, loss_v, logit_v, dict(zip(trainable_paths, grad_vs))


def _seeded_tiny_flat(rng):
    """Seeded tests/tiny.py params as a flat {path: f32 ndarray} dict.

    Glorot leaves BN at identity (scale 1, bias 0, mean 0, var 1) — fold
    in seeded perturbations so every BN param carries signal in both modes.
    Consumes draws from ``rng`` (call order is part of the fixture seed).
    """
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    import jax

    from roomnet_tpu.models.roomnet import init_variables
    from roomnet_tpu.params import schema
    from tiny import TINY

    tiny_flat = schema.flatten_variables(
        init_variables(jax.random.PRNGKey(20260818), TINY)
    )
    for p in list(tiny_flat):
        a = tiny_flat[p]
        if p.endswith("/scale"):
            tiny_flat[p] = (a * rng.uniform(0.7, 1.3, a.shape)).astype(np.float32)
        elif p.endswith("/bias") and "/bn" in p or p.endswith("res_bn/bias"):
            tiny_flat[p] = rng.uniform(-0.3, 0.3, a.shape).astype(np.float32)
        elif p.endswith("/mean"):
            tiny_flat[p] = rng.normal(0.0, 0.3, a.shape).astype(np.float32)
        elif p.endswith("/var"):
            tiny_flat[p] = rng.uniform(0.5, 1.5, a.shape).astype(np.float32)
    return {p: np.asarray(v, np.float32) for p, v in tiny_flat.items()}


def make_grad_golden():
    """Training-path gradient oracle: dL/dθ from TF1's own kernels.

    The frozen reference checkpoint is inference-only (no loss graph), so —
    like make_forward_golden_size — this rebuilds the reference training
    loss from tf.nn primitives (helper above) and records tf.gradients of
    the CE term w.r.t. every trainable tensor in BOTH BN modes, for two
    cases consumed by tests/test_grad_golden.py:

      * the 224 geometry with the converted reference weights on the
        forward-golden batch — end-to-end realism. Training-mode BN parity
        here is limited to ~1e-4/site by f32 reduction-order noise (batch
        stats over 387k elements, amplified ~30x by rsqrt(var+eps)), so
        its gates are calibrated, not tight.
      * the tests/tiny.py geometry with seeded weights on a small batch —
        reductions are tiny, noise vanishes, so ANY semantic divergence in
        the backward ops (conv/pool/legacy-resize/BN/relu6/softmax-CE)
        shows up against a tight (1e-5-class) gate.

    Only CE-path gradients are stored: the L2 term's gradient is
    analytically ``l2_coeff * v`` with identical constants on both sides.
    The full-loss scalar pins the combined objective.
    """
    import sys

    import tensorflow.compat.v1 as tf

    tf.disable_eager_execution()
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    import jax

    from roomnet_tpu.models import registry
    from roomnet_tpu.models.roomnet import init_variables
    from roomnet_tpu.params import schema
    from tiny import TINY

    l2_coeff = 6e-2  # reference train.py L2_WEIGHT_DECAY / TrainHParams default
    out = {}

    # --- 224 geometry, converted reference weights, forward-golden batch ---
    cfg = registry.get("roomnet-224")
    params = dict(np.load(os.path.join(os.path.dirname(__file__), "..",
                                       "artifacts", "roomnet_params.npz")))
    g = dict(np.load(os.path.join(GOLDEN_DIR, "forward_golden.npz")))
    x_uint8 = g["x_uint8_bgr"]
    x_norm = ((x_uint8[:, :, :, ::-1].astype(np.float64) / 255.0) * 2.0
              - 1.0).astype(np.float32)
    rng = np.random.RandomState(20260818)
    labels = rng.randint(0, cfg.num_classes, size=x_uint8.shape[0]).astype(np.int32)
    out["x_norm"] = x_norm
    out["labels"] = labels
    for mode in ("infbn", "trainbn"):
        ce_v, loss_v, logit_v, grads = _tf_training_loss(
            cfg, params, x_norm, labels, l2_coeff, training=(mode == "trainbn")
        )
        out[f"ce_{mode}"] = np.float32(ce_v)
        out[f"loss_{mode}"] = np.float32(loss_v)
        out[f"logits_{mode}"] = logit_v
        for p, gv in grads.items():
            out[f"grad_{mode}/{p}"] = gv
        gmax = max(float(np.abs(gv).max()) for gv in grads.values())
        print(f"grad golden [{mode}]: ce {ce_v:.6f} loss {loss_v:.6f} "
              f"max|dCE/dθ| {gmax:.4f}")

    # --- tiny geometry, seeded weights (noise-free semantic pin) ---
    tiny_flat = _seeded_tiny_flat(rng)
    tiny_x = rng.uniform(-1, 1, size=(4, TINY.im_side, TINY.im_side, 3)).astype(
        np.float32
    )
    tiny_y = rng.randint(0, TINY.num_classes, size=4).astype(np.int32)
    out["tiny_x"] = tiny_x
    out["tiny_labels"] = tiny_y
    for p, v in tiny_flat.items():
        out[f"tiny_param/{p}"] = np.asarray(v, np.float32)
    for mode in ("infbn", "trainbn"):
        ce_v, loss_v, logit_v, grads = _tf_training_loss(
            TINY, {p: np.asarray(v, np.float32) for p, v in tiny_flat.items()},
            tiny_x, tiny_y, l2_coeff, training=(mode == "trainbn"),
        )
        out[f"tiny_ce_{mode}"] = np.float32(ce_v)
        out[f"tiny_loss_{mode}"] = np.float32(loss_v)
        out[f"tiny_logits_{mode}"] = logit_v
        for p, gv in grads.items():
            out[f"tiny_grad_{mode}/{p}"] = gv
        gmax = max(float(np.abs(gv).max()) for gv in grads.values())
        print(f"tiny grad golden [{mode}]: ce {ce_v:.6f} loss {loss_v:.6f} "
              f"max|dCE/dθ| {gmax:.4f}")

    np.savez_compressed(os.path.join(GOLDEN_DIR, "grad_golden.npz"), **out)
    print("grad golden written:", len(out), "arrays")


def _tf_train_trajectory(cfg, params, x_uint8_bgr, labels, l2_coeff, training,
                         steps, lr0, sched_steps):
    """Run ``steps`` updates of tf.train.AdamOptimizer on the reference
    loss graph (trainables as tf.Variables, moving stats as constants) and
    return (per-step pre-update losses, final trainable values).

    Mirrors the reference's optimizer wiring (network.py:36-37, :61-69):
    continuously-decayed LR ``tf.train.exponential_decay(lr0, step,
    sched_steps, 0.068)`` driven by a global step the minimize op
    increments, and TF1 Adam (eps outside the bias correction). The loss
    fetched alongside train_op is computed from PRE-update variables —
    the same convention our train step's metrics["loss"] uses.
    """
    import tensorflow.compat.v1 as tf

    from roomnet_tpu.params import schema

    trainable_paths = [p for p in sorted(params) if schema.is_trainable_path(p)]
    tset = set(trainable_paths)
    graph = tf.Graph()
    with graph.as_default():
        c = {
            p: (tf.Variable(v, name=p.replace("/", "__")) if p in tset
                else tf.constant(v))
            for p, v in sorted(params.items())
        }
        # normalize_bgr_uint8 parity: BGR->RGB, f32, /255*2-1 (f32 math).
        x = (tf.cast(tf.constant(x_uint8_bgr[..., ::-1]), tf.float32)
             / 255.0) * 2.0 - 1.0
        ce, loss, logits = _tf_build_loss(
            tf, cfg, c, x, labels, l2_coeff, training, trainable_paths
        )
        gstep = tf.Variable(0, trainable=False, dtype=tf.int64)
        lr = tf.train.exponential_decay(lr0, gstep, sched_steps, 0.068,
                                        staircase=False)
        opt = tf.train.AdamOptimizer(lr, beta1=0.9, beta2=0.999, epsilon=1e-8)
        train_op = opt.minimize(
            loss, var_list=[c[p] for p in trainable_paths], global_step=gstep
        )
        with tf.Session(graph=graph) as sess:
            sess.run(tf.global_variables_initializer())
            losses = []
            for _ in range(steps):
                loss_v, _ = sess.run([loss, train_op])
                losses.append(loss_v)
            final = sess.run({p: c[p] for p in trainable_paths})
    return np.asarray(losses, np.float32), final


def make_traj_golden(steps: int = 6):
    """Training-TRAJECTORY oracle: K full optimizer steps from TF1's own
    kernels (tf.gradients + tf.train.AdamOptimizer + exponential_decay).

    The grad golden pins one backward pass; this pins the composed update
    loop — gradient -> Adam moments/bias-correction -> LR schedule clock ->
    parameter application — by recording the per-step pre-update losses
    and the final trainable values after ``steps`` updates on a fixed
    batch, in both BN modes, at the tests/tiny.py geometry (reductions
    small => f32 noise can't mask a semantic slip). sched_steps=50 makes
    the decay move visibly across the run (lr falls ~28%), so a schedule
    clock that is off by one step fails the gate.
    Consumed by tests/test_traj_golden.py.
    """
    import tensorflow.compat.v1 as tf

    tf.disable_eager_execution()
    rng = np.random.RandomState(20260819)
    tiny_flat = _seeded_tiny_flat(rng)
    from tiny import TINY  # path set up by _seeded_tiny_flat

    x_uint8 = rng.randint(0, 256, size=(4, TINY.im_side, TINY.im_side, 3)
                          ).astype(np.uint8)
    labels = rng.randint(0, TINY.num_classes, size=4).astype(np.int32)
    out = {
        "x_uint8_bgr": x_uint8,
        "labels": labels,
        "steps": np.int32(steps),
        "lr0": np.float32(2e-4),
        "sched_steps": np.int32(50),
        "l2_coeff": np.float32(6e-2),
    }
    for p, v in tiny_flat.items():
        out[f"traj_param/{p}"] = v
    for mode in ("infbn", "trainbn"):
        losses, final = _tf_train_trajectory(
            TINY, tiny_flat, x_uint8, labels, 6e-2,
            training=(mode == "trainbn"), steps=steps, lr0=2e-4,
            sched_steps=50,
        )
        out[f"losses_{mode}"] = losses
        for p, v in final.items():
            out[f"final_{mode}/{p}"] = v
        drift = max(
            float(np.abs(final[p] - tiny_flat[p]).max()) for p in final
        )
        print(f"traj golden [{mode}]: losses {np.round(losses, 5)} "
              f"max|Δθ| after {steps} steps: {drift:.2e}")
    np.savez_compressed(os.path.join(GOLDEN_DIR, "traj_golden.npz"), **out)
    print("traj golden written:", len(out), "arrays")


if __name__ == "__main__":
    # Must sit BELOW every generator def: this module executes top-to-bottom,
    # so a mid-file __main__ block would NameError on later definitions.
    import sys as _sys

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    if "--valset-only" in _sys.argv:
        make_valset_golden()
    elif "--grad-only" in _sys.argv:
        make_grad_golden()
    elif "--traj-only" in _sys.argv:
        make_traj_golden()
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
        make_grad_golden()
        make_traj_golden()

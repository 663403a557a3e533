"""A/B the fast_decode safety factor (round-3 review item #7).

fast_decode uses libjpeg's DCT-domain scaled decode (csrc/roomnet_io.cpp,
decode_jpeg): pick the largest 1/2^k reduction whose output short side
stays >= min_decode_side. With min_decode_side = im_side (safety=1, the
round-2 behavior) the decode may land barely >= 224 and the follow-up
bilinear resample deviates enough to flip ~11% of argmaxes on 640x480
content. safety=2 requires >=2*im_side of supersampling headroom.

Measures, per source size and safety factor:
  * argmax flip rate vs the exact (full-decode) path,
  * host decode+preprocess throughput (the component fast_decode speeds up).

Run on the TPU host: PYTHONPATH=/root/repo:/root/.axon_site \
    python tools/bench_fast_decode.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def decode_all(paths, im_side, min_decode_side):
    """Host-only: fused native decode/crop/resize for the whole set."""
    from roomnet_tpu.data import native
    from roomnet_tpu.data.loader import draw_crop_rect

    crops = []
    for p in paths:
        h, w = native.probe(p)
        crops.append(draw_crop_rect(h, w, random_crop=False, rng=None))
    crops = np.asarray(crops, np.int32)
    t0 = time.perf_counter()
    batch, ok = native.load_preprocess_batch(
        paths, crops, im_side, np.zeros((len(paths), 2), np.int32),
        min_decode_side=min_decode_side,
    )
    dt = time.perf_counter() - t0
    assert ok.all()
    return batch, len(paths) / dt


def main():
    import cv2
    import jax

    from roomnet_tpu.data import native
    from roomnet_tpu.models.roomnet import FAST_CONFIG, forward, normalize_bgr_uint8
    from roomnet_tpu.params import schema
    from tools.make_synth_dataset import make_image

    assert native.available(), "build csrc first: make -C csrc"
    cfg = FAST_CONFIG
    variables = schema.unflatten_variables(
        dict(np.load(os.path.join(os.path.dirname(__file__), "..",
                                  "artifacts", "roomnet_params.npz")))
    )

    @jax.jit
    def predict(x):
        return jax.numpy.argmax(
            forward(variables, normalize_bgr_uint8(x), cfg), axis=-1
        )

    def argmax_of(batch):
        out = []
        bs = 64
        pad = (-len(batch)) % bs
        full = np.concatenate([batch, batch[:pad]]) if pad else batch
        for s in range(0, len(full), bs):
            out.append(np.asarray(predict(full[s: s + bs])))
        return np.concatenate(out)[: len(batch)]

    gen = np.random.RandomState(0)
    for label, (h, w) in [("640x480 (canonical)", (480, 640)),
                          ("2560x1920 (large photo)", (1920, 2560))]:
        tmp = tempfile.mkdtemp(prefix="fastdec_")
        paths = []
        for i in range(128):
            im = make_image(i % 6, gen, h, w)[:, :, ::-1]
            p = os.path.join(tmp, f"img_{i:03d}.jpg")
            cv2.imwrite(p, im, [cv2.IMWRITE_JPEG_QUALITY, 88])
            paths.append(p)
        exact, ips_exact = decode_all(paths, cfg.im_side, 0)
        ref_ids = argmax_of(exact)
        print(f"\n== {label}: exact decode {ips_exact:.0f} img/s (host)")
        for safety in (1, 2):
            fast, ips_fast = decode_all(paths, cfg.im_side, safety * cfg.im_side)
            ids = argmax_of(fast)
            flips = int((ids != ref_ids).sum())
            px = float(np.abs(fast.astype(np.int16) - exact.astype(np.int16)).mean())
            print(f"   safety={safety}: {ips_fast:.0f} img/s host decode "
                  f"({ips_fast / ips_exact:.2f}x), argmax flips {flips}/128 "
                  f"({100 * flips / 128:.1f}%), mean |dpx| {px:.2f}")


if __name__ == "__main__":
    main()

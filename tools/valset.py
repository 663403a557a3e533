"""Deterministic 1839-image parity val set (round-3 review item #1).

The reference's north star is "identical class predictions on the
1839-image validation set" (/root/reference/README.md:3; the val images
themselves are not redistributable). This module builds a *synthetic*
val-scale set — 1839 JPEGs, photo-like procedural content + documentation
crops + gradients + noise, at varied aspect ratios/sizes so the
center-crop geometry varies — fully determined by seeds, so the golden
fixture (tests/golden/valset_golden.npz, argmax per image from the frozen
TF graph) can be regenerated and re-checked byte-for-byte on this
container without committing ~100 MB of JPEGs.

Determinism contract: cv2.imwrite(JPEG q88) with the same libjpeg build ->
identical bytes. The committed fixture carries a checksum over the first
image so a drifted encoder fails loudly instead of producing mystery
mismatches.
"""

from __future__ import annotations

import hashlib
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_IMAGES = 1839
JPEG_QUALITY = 88

# Varied source geometries: landscape/portrait/square, small to large —
# the center crop and resize paths see different offsets per shape.
SIZES = [(480, 640), (640, 480), (375, 500), (768, 1024), (500, 500),
         (300, 400), (450, 800), (1080, 810)]


def build_valset_jpegs(out_dir: str, indices=None) -> list[str]:
    """Write the deterministic JPEGs into out_dir; returns paths.

    Each image is a pure function of its index (per-image RNG), so a
    subset regenerates in O(len(indices)) — the default test fixture only
    builds the subsample it scores."""
    import cv2

    from make_synth_dataset import make_image

    os.makedirs(out_dir, exist_ok=True)
    doc_pngs = []
    doc_dir = "/root/reference/documentation"
    if os.path.isdir(doc_dir):
        for p in sorted(os.listdir(doc_dir)):
            if p.endswith(".png"):
                im = cv2.imread(os.path.join(doc_dir, p))
                if im is not None:
                    doc_pngs.append(im)
    paths = []
    for i in (range(N_IMAGES) if indices is None else indices):
        rng = np.random.RandomState((20260818 * 1_000_003 + int(i)) & 0x7FFFFFFF)
        h, w = SIZES[i % len(SIZES)]
        kind = i % 16
        if kind < 11:  # procedural photo-like structures, 6 families
            im = make_image(i % 6, rng, h, w)[:, :, ::-1]  # BGR
        elif kind < 13 and doc_pngs:  # documentation crops at varied zooms
            src = doc_pngs[i % len(doc_pngs)]
            sh, sw = src.shape[:2]
            ch = rng.randint(sh // 2, sh + 1)
            cw = rng.randint(sw // 2, sw + 1)
            y0 = rng.randint(sh - ch + 1)
            x0 = rng.randint(sw - cw + 1)
            im = cv2.resize(src[y0:y0 + ch, x0:x0 + cw], (w, h))
        elif kind < 15:  # smooth two-axis gradients (near-tie logits)
            gy = np.linspace(0, 255, h, dtype=np.float32)[:, None]
            gx = np.linspace(0, 255, w, dtype=np.float32)[None, :]
            im = np.stack([np.broadcast_to(gy, (h, w)) * rng.rand(),
                           np.broadcast_to(gx, (h, w)) * rng.rand(),
                           np.full((h, w), rng.randint(256), np.float32)],
                          axis=-1)
            im = np.clip(im, 0, 255).astype(np.uint8)
        else:  # noise
            im = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        im = np.ascontiguousarray(im, dtype=np.uint8)
        p = os.path.join(out_dir, f"val_{i:04d}.jpg")
        ok = cv2.imwrite(p, im, [cv2.IMWRITE_JPEG_QUALITY, JPEG_QUALITY])
        assert ok, p
        paths.append(p)
    return paths


def first_image_sha256(paths: list[str]) -> str:
    with open(paths[0], "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def file_sha256(path: str) -> str:
    with open(path, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def doc_dir_available() -> bool:
    """True when the reference documentation PNGs (kinds 11-12, ~230 of
    the 1839 images) can be sourced. A fixture built WITH them cannot be
    regenerated identically without them — callers must check instead of
    letting those indices silently fall through to the gradient branch."""
    d = "/root/reference/documentation"
    return os.path.isdir(d) and any(p.endswith(".png") for p in os.listdir(d))


def decode_cv2(paths: list[str], im_side: int = 224) -> np.ndarray:
    """The classifier's cv2 preprocess path: center-crop -> INTER_LINEAR
    resize -> BGR uint8. Uses the classifier's OWN crop function so the
    oracle can never desynchronize from the production preprocess."""
    import cv2

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo not in sys.path:
        sys.path.insert(0, repo)
    from roomnet_tpu.data.loader import center_crop

    out = np.empty((len(paths), im_side, im_side, 3), np.uint8)
    for i, p in enumerate(paths):
        im = center_crop(cv2.imread(p))
        if im.shape[0] != im_side or im.shape[1] != im_side:
            im = cv2.resize(im, (im_side, im_side))
        out[i] = im
    return out


def decode_native(paths: list[str], im_side: int = 224) -> np.ndarray | None:
    """The classifier's native preprocess path (csrc fused pipeline);
    None when the library isn't built."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo not in sys.path:
        sys.path.insert(0, repo)
    from roomnet_tpu.data import native
    from roomnet_tpu.data.loader import draw_crop_rect

    if not native.available():
        return None
    crops = []
    for p in paths:
        h, w = native.probe(p)
        crops.append(draw_crop_rect(h, w, random_crop=False, rng=None))
    batch, ok = native.load_preprocess_batch(
        paths, np.asarray(crops, np.int32), im_side,
        np.zeros((len(paths), 2), np.int32),
    )
    assert ok.all()
    return batch

"""Procedural 6-class synthetic dataset for training-dynamics validation.

The REI dataset the reference trained on (train.py:26, README.md:30) is not
redistributable, so convergence validation uses procedurally distinct
texture classes instead: each class is defined by a structural property
(stripe orientation, checker tiling, blobs, gradients, tilings) while
color, scale, phase, position and noise are randomized per image — the
model must learn the structure, not memorize pixels. Images are written as
moderately-sized JPEGs so the 1-core host feeder can keep up with the TPU.

    python tools/make_synth_dataset.py --out /tmp/synth_rooms --per-class 600
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

CLASSES = ["Backyard", "Bathroom", "Bedroom", "Frontyard", "Kitchen", "LivingRoom"]


def _canvas(rng, h, w):
    base = rng.randint(30, 226, size=3)
    img = np.ones((h, w, 3), np.float32) * base
    return img


def _noise(rng, img, amp=18):
    img += rng.randn(*img.shape).astype(np.float32) * rng.uniform(2, amp)
    return img


def make_image(cls_id: int, rng: np.random.RandomState, h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = _canvas(rng, h, w)
    c2 = rng.randint(0, 256, size=3).astype(np.float32)
    if cls_id == 0:  # horizontal stripes
        f = rng.uniform(0.03, 0.25)
        mask = (np.sin(yy * f + rng.uniform(0, 6.3)) > rng.uniform(-0.4, 0.4))
        img[mask] = c2
    elif cls_id == 1:  # vertical stripes
        f = rng.uniform(0.03, 0.25)
        mask = (np.sin(xx * f + rng.uniform(0, 6.3)) > rng.uniform(-0.4, 0.4))
        img[mask] = c2
    elif cls_id == 2:  # checkerboard
        s = rng.randint(8, 48)
        mask = ((yy // s).astype(int) + (xx // s).astype(int)) % 2 == 0
        img[mask] = c2
    elif cls_id == 3:  # random blobs
        for _ in range(rng.randint(6, 18)):
            cy, cx = rng.randint(0, h), rng.randint(0, w)
            r = rng.randint(8, max(9, min(h, w) // 5))
            col = rng.randint(0, 256, size=3).astype(np.float32)
            m = (yy - cy) ** 2 + (xx - cx) ** 2 < r * r
            img[m] = col
    elif cls_id == 4:  # diagonal gradient
        ang = rng.uniform(0.6, 1.0) * rng.choice([-1, 1])
        g = (xx * np.cos(ang) + yy * np.sin(ang))
        g = (g - g.min()) / (np.ptp(g) + 1e-6)
        img = img * (1 - g[..., None]) + c2 * g[..., None]
    else:  # axis-aligned rectangles mosaic
        for _ in range(rng.randint(5, 14)):
            y0, x0 = rng.randint(0, h - 10), rng.randint(0, w - 10)
            y1 = y0 + rng.randint(8, h // 2)
            x1 = x0 + rng.randint(8, w // 2)
            img[y0:y1, x0:x1] = rng.randint(0, 256, size=3).astype(np.float32)
    img = _noise(rng, img)
    return np.clip(img, 0, 255).astype(np.uint8)


def generate(out_dir: str, per_class: int, seed: int = 0,
             hw: tuple[int, int] = (250, 330)) -> None:
    import cv2

    rng = np.random.RandomState(seed)
    for cid, cls in enumerate(CLASSES):
        d = os.path.join(out_dir, cls)
        os.makedirs(d, exist_ok=True)
        for i in range(per_class):
            im = make_image(cid, rng, *hw)
            cv2.imwrite(os.path.join(d, f"{cls.lower()}_{i:05d}.jpg"),
                        im[:, :, ::-1],  # make_image returns RGB; store BGR
                        [cv2.IMWRITE_JPEG_QUALITY, 90])
        print(f"{cls}: {per_class} images")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/synth_rooms")
    ap.add_argument("--per-class", type=int, default=600)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    generate(args.out, args.per_class, args.seed)
    print("done:", args.out)

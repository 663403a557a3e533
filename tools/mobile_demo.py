"""Camera-less twin of the stock TFLite Android demo (reference
mobile/tf_image_classifier): the same flatbuffer, the same preprocessing
(ClassifierFloatMobileNet.java:46-77 — center-crop, 224^2 bilinear, RGB,
(px-127.5)/127.5), the same top-3 output (Classifier.java:263-285).

    python tools/mobile_demo.py photo.jpg [more.jpg ...] [--model m.tflite]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def load_labels(path: str) -> list[str]:
    with open(path) as f:
        return [l.strip() for l in f if l.strip()]


def preprocess(img_path: str, side: int) -> np.ndarray:
    import cv2

    im = cv2.imread(img_path)  # BGR
    if im is None:
        raise SystemExit(f"cannot decode {img_path}")
    h, w = im.shape[:2]
    off = abs((w - h) // 2)
    im = im[:, off : off + h] if h < w else im[off : off + w, :]
    im = cv2.resize(im, (side, side))
    rgb = im[:, :, ::-1].astype(np.float32)
    return ((rgb - 127.5) / 127.5)[None]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("images", nargs="+")
    ap.add_argument("--model", default="mobile/roomnet.tflite")
    ap.add_argument("--labels", default="mobile/labels.txt")
    args = ap.parse_args()

    import tensorflow as tf

    if not os.path.exists(args.model):
        raise SystemExit(
            f"{args.model} not found — export it first:\n"
            f"  python -m roomnet_tpu export --out {args.model}"
        )
    labels = load_labels(args.labels)
    interp = tf.lite.Interpreter(model_path=args.model)
    interp.allocate_tensors()
    inp = interp.get_input_details()[0]
    out = interp.get_output_details()[0]
    side = inp["shape"][1]

    for img_path in args.images:
        interp.set_tensor(inp["index"], preprocess(img_path, side))
        interp.invoke()
        probs = interp.get_tensor(out["index"])[0]
        top3 = np.argsort(probs)[::-1][:3]
        print(img_path)
        for i in top3:
            print(f"  {labels[i]:12s} {probs[i]:.3f}")


if __name__ == "__main__":
    main()

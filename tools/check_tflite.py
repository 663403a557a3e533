"""Verify an exported .tflite against the golden fixtures (offline; needs TF).

    python tools/check_tflite.py [model.tflite]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main(model_path: str = "artifacts/roomnet.tflite"):
    import tensorflow as tf

    if not os.path.exists(model_path):
        from roomnet_tpu.params import schema
        from roomnet_tpu.params.export import export_tflite

        variables = schema.unflatten_variables(
            dict(np.load("artifacts/roomnet_params.npz"))
        )
        export_tflite(variables, model_path)
        print("exported", model_path)

    g = dict(np.load(os.path.join("tests", "golden", "forward_golden.npz")))
    interp = tf.lite.Interpreter(model_path=model_path)
    interp.allocate_tensors()
    inp = interp.get_input_details()[0]
    out = interp.get_output_details()[0]
    worst = 0.0
    n_match = 0
    for i in range(len(g["x_uint8_bgr"])):
        x = ((g["x_uint8_bgr"][i : i + 1, :, :, ::-1].astype(np.float32) / 255.0) * 2.0) - 1.0
        interp.set_tensor(inp["index"], x)
        interp.invoke()
        probs = interp.get_tensor(out["index"])
        worst = max(worst, float(np.abs(probs - g["softmax"][i : i + 1]).max()))
        n_match += int(probs.argmax() == g["argmax"][i])
    n = len(g["x_uint8_bgr"])
    print(f"softmax max |diff| vs reference graph: {worst:.2e}")
    print(f"argmax matches: {n_match}/{n}")
    assert n_match == n and worst < 1e-4, "TFLite export diverged from reference"
    print("OK")


if __name__ == "__main__":
    main(*sys.argv[1:])

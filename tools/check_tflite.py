"""Verify exported .tflite variants against the golden fixtures (offline; needs TF).

    python tools/check_tflite.py [model.tflite]          # check one file
    python tools/check_tflite.py --variants              # float/dynamic/int8
                                                         # export + score all

--variants exports every quantization variant (round-3 review item #4),
scores each against the 64-image wide golden batch (argmax flip rate vs
the frozen reference graph + softmax deviation) and prints sizes, so the
winner shipped under mobile/ carries measured numbers.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def score(model_path: str, golden: dict) -> tuple[int, int, float]:
    """(argmax matches, n, worst softmax |diff|) on a golden fixture."""
    import tensorflow as tf

    interp = tf.lite.Interpreter(model_path=model_path)
    interp.allocate_tensors()
    inp = interp.get_input_details()[0]
    out = interp.get_output_details()[0]
    worst = 0.0
    n_match = 0
    n = len(golden["x_uint8_bgr"])
    for i in range(n):
        x = ((golden["x_uint8_bgr"][i:i + 1, :, :, ::-1].astype(np.float32)
              / 255.0) * 2.0) - 1.0
        interp.set_tensor(inp["index"], x)
        interp.invoke()
        probs = interp.get_tensor(out["index"])
        worst = max(worst, float(np.abs(probs - golden["softmax"][i:i + 1]).max()))
        n_match += int(probs.argmax() == golden["argmax"][i])
    return n_match, n, worst


def main(model_path: str = "artifacts/roomnet.tflite"):
    g = dict(np.load(os.path.join("tests", "golden", "forward_golden.npz")))
    if not os.path.exists(model_path):
        from roomnet_tpu.params import schema
        from roomnet_tpu.params.export import export_tflite

        variables = schema.unflatten_variables(
            dict(np.load("artifacts/roomnet_params.npz"))
        )
        export_tflite(variables, model_path)
        print("exported", model_path)
    n_match, n, worst = score(model_path, g)
    print(f"softmax max |diff| vs reference graph: {worst:.2e}")
    print(f"argmax matches: {n_match}/{n}")
    assert n_match == n and worst < 1e-4, "TFLite export diverged from reference"
    print("OK")


def variants(out_dir: str = "artifacts"):
    from roomnet_tpu.params import schema
    from roomnet_tpu.params.export import export_tflite

    variables = schema.unflatten_variables(
        dict(np.load("artifacts/roomnet_params.npz"))
    )
    wide_path = os.path.join("tests", "golden", "forward_golden_wide.npz")
    g = dict(np.load(wide_path))
    print(f"scoring on the {len(g['x_uint8_bgr'])}-image wide golden batch")
    for name, quant in [("float", None), ("dynamic", "dynamic"), ("int8", "int8")]:
        path = os.path.join(out_dir, f"roomnet_{name}.tflite")
        export_tflite(variables, path, quantize=quant)
        n_match, n, worst = score(path, g)
        size_kb = os.path.getsize(path) / 1024
        flips = n - n_match
        print(f"{name:8s}: {size_kb:7.1f} KB  argmax flips {flips}/{n} "
              f"({100 * flips / n:.1f}%)  softmax max|diff| {worst:.2e}")


if __name__ == "__main__":
    if "--variants" in sys.argv:
        variants()
    else:
        main(*[a for a in sys.argv[1:] if not a.startswith("--")])

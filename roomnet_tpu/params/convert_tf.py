"""Offline converter: reference TF1 checkpoint -> native flat .npz variables.

TensorFlow is used ONLY here (offline tooling); the runtime framework never
imports it. The name bijection is `schema.tf_name_map` (SURVEY.md §2.5,
verified against /root/reference/final_model/roomnet.index).

Usage:
    python -m roomnet_tpu.params.convert_tf \
        --tf_ckpt /root/reference/final_model/roomnet \
        --out artifacts/roomnet_params.npz
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from roomnet_tpu.models.roomnet import DEFAULT_CONFIG, RoomNetConfig
from roomnet_tpu.params import schema


def convert_tf_checkpoint(
    tf_ckpt_prefix: str, cfg: RoomNetConfig = DEFAULT_CONFIG
) -> dict[str, np.ndarray]:
    """Read a TF1 TensorBundle checkpoint and return our flat variable dict."""
    import tensorflow as tf  # local import: offline tool only

    reader = tf.train.load_checkpoint(tf_ckpt_prefix)
    shape_map = reader.get_variable_to_shape_map()
    name_map = schema.tf_name_map(cfg)
    flat: dict[str, np.ndarray] = {}
    missing = []
    for our_path, tf_name in name_map.items():
        if tf_name not in shape_map:
            missing.append(tf_name)
            continue
        flat[our_path] = np.asarray(reader.get_tensor(tf_name), dtype=np.float32)
    if missing:
        raise KeyError(f"TF checkpoint missing variables: {missing}")
    # Sanity: all mapped, shapes consistent with our schema.
    n_params = sum(int(np.prod(v.shape)) for v in flat.values())
    extra = [
        n
        for n in shape_map
        if n not in set(name_map.values()) and "train_step" not in n and "Adam" not in n
        and "power" not in n and "learn_rate" not in n
    ]
    if extra:
        raise KeyError(f"Unmapped TF variables present: {extra}")
    # Expected count derived from cfg (178,062 for the reference DEFAULT
    # geometry — SURVEY §2.5), so converting a retrained/resized
    # checkpoint with a matching non-default cfg isn't rejected on a
    # correct conversion.
    import jax

    from roomnet_tpu.models.roomnet import init_variables, param_count

    expected = param_count(init_variables(jax.random.PRNGKey(0), cfg))
    assert n_params == expected, (
        f"expected {expected} params for this config, got {n_params}"
    )
    return flat


def save_flat(flat: dict[str, np.ndarray], out_path: str, meta: dict | None = None):
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    np.savez(out_path, **flat)
    manifest = {
        "format": "roomnet_tpu_flat_npz_v1",
        "num_params": int(sum(int(np.prod(v.shape)) for v in flat.values())),
        "tensors": {k: list(v.shape) for k, v in sorted(flat.items())},
    }
    if meta:
        manifest.update(meta)
    with open(os.path.splitext(out_path)[0] + ".json", "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--tf_ckpt", default="/root/reference/final_model/roomnet")
    p.add_argument("--out", default="artifacts/roomnet_params.npz")
    args = p.parse_args()
    flat = convert_tf_checkpoint(args.tf_ckpt)
    save_flat(flat, args.out, meta={"source_tf_ckpt": args.tf_ckpt})
    print(f"converted {len(flat)} tensors -> {args.out}")


if __name__ == "__main__":
    main()

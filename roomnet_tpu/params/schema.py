"""Variable-pytree schema: flatten/unflatten, trainable partition, TF name map.

The canonical on-disk format is a flat ``{path: ndarray}`` mapping saved as
`.npz` — portable, dependency-free, and byte-stable for golden tests. Paths
use '/'-separated components mirroring the pytree:

    blocks/<bi>/conv/<d>            conv kernel, HWIO
    blocks/<bi>/bn/<d>/{scale,bias,mean,var}
    blocks/<bi>/res_bn/{scale,bias,mean,var}
    dense/<di>/kernel               (in, out)
    dense/<di>/bias
    dense/<di>/bn/{scale,bias,mean,var}

`tf_name_map` gives the bijection to the reference TF1 checkpoint variable
names (graph-construction order, verified in SURVEY.md §2.5 against
/root/reference/final_model/roomnet.index).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np

from roomnet_tpu.models.roomnet import DEFAULT_CONFIG, RoomNetConfig, Variables

_BN_FIELDS = {"scale": "gamma", "bias": "beta", "mean": "moving_mean", "var": "moving_variance"}


def flatten_variables(variables: Variables) -> dict[str, np.ndarray]:
    """flatten_jax with every leaf materialized as numpy (the on-disk form).

    Thin wrapper so there is ONE structure walker (flatten_jax) — the
    previous hand-written twin had to mirror every model-structure change.
    """
    return {k: np.asarray(v) for k, v in flatten_jax(variables).items()}


def unflatten_variables(
    flat: dict[str, np.ndarray], cfg: RoomNetConfig = DEFAULT_CONFIG
) -> Variables:
    """unflatten_jax with every leaf converted to a jnp array (device-ready).

    Thin wrapper over the one structure walker (unflatten_jax)."""
    import jax.numpy as jnp

    return jax.tree_util.tree_map(jnp.asarray, unflatten_jax(flat, cfg))


def tf_name_map(cfg: RoomNetConfig = DEFAULT_CONFIG) -> dict[str, str]:
    """Our flat path -> reference TF1 variable name (SURVEY.md §2.5)."""
    mapping: dict[str, str] = {}
    conv_i = 0
    bn_i = 0

    def tf_suffix(i):
        return "" if i == 0 else f"_{i}"

    for bi, depth in enumerate(cfg.block_depths):
        for d in range(depth):
            mapping[f"blocks/{bi}/conv/{d}"] = f"conv2d{tf_suffix(conv_i)}/kernel"
            conv_i += 1
            for ours, tf in _BN_FIELDS.items():
                mapping[f"blocks/{bi}/bn/{d}/{ours}"] = (
                    f"batch_normalization{tf_suffix(bn_i)}/{tf}"
                )
            bn_i += 1
        if depth > 1:
            for ours, tf in _BN_FIELDS.items():
                mapping[f"blocks/{bi}/res_bn/{ours}"] = (
                    f"batch_normalization{tf_suffix(bn_i)}/{tf}"
                )
            bn_i += 1
    n_dense = len(cfg.dense_units) + 1
    for di in range(n_dense):
        mapping[f"dense/{di}/kernel"] = f"dense{tf_suffix(di)}/kernel"
        if di < n_dense - 1:
            for ours, tf in _BN_FIELDS.items():
                mapping[f"dense/{di}/bn/{ours}"] = f"batch_normalization{tf_suffix(bn_i)}/{tf}"
            bn_i += 1
    mapping[f"dense/{n_dense - 1}/bias"] = f"dense{tf_suffix(n_dense - 1)}/bias"
    return mapping


def is_trainable_path(path: str) -> bool:
    """Trainable = kernels, biases, BN gamma/beta; frozen = BN moving stats.

    Mirrors `tf.trainable_variables()` in the reference: the L2 term
    (network.py:58) covers conv/dense kernels, the final bias, and BN
    gamma/beta, but never the moving mean/variance.
    """
    return not (path.endswith("/mean") or path.endswith("/var"))


def partition_flat(flat: dict[str, Any]) -> tuple[dict[str, Any], dict[str, Any]]:
    """Split a flat {path: array} dict into (trainable, frozen) dicts."""
    train = {k: v for k, v in flat.items() if is_trainable_path(k)}
    frozen = {k: v for k, v in flat.items() if not is_trainable_path(k)}
    return train, frozen


def flatten_jax(variables: Variables) -> dict[str, Any]:
    """Like flatten_variables but keeps jnp arrays/tracers (jit-safe)."""
    out: dict[str, Any] = {}
    for bi, blk in enumerate(variables["blocks"]):
        for d, k in enumerate(blk["conv"]):
            out[f"blocks/{bi}/conv/{d}"] = k
        for d, bn in enumerate(blk["bn"]):
            for f in _BN_FIELDS:
                out[f"blocks/{bi}/bn/{d}/{f}"] = bn[f]
        if blk["res_bn"] is not None:
            for f in _BN_FIELDS:
                out[f"blocks/{bi}/res_bn/{f}"] = blk["res_bn"][f]
    for di, layer in enumerate(variables["dense"]):
        out[f"dense/{di}/kernel"] = layer["kernel"]
        if layer["bias"] is not None:
            out[f"dense/{di}/bias"] = layer["bias"]
        if layer["bn"] is not None:
            for f in _BN_FIELDS:
                out[f"dense/{di}/bn/{f}"] = layer["bn"][f]
    return out


def unflatten_jax(flat: dict[str, Any], cfg: RoomNetConfig = DEFAULT_CONFIG) -> Variables:
    """Inverse of flatten_jax without forcing materialization (jit-safe)."""

    def bn_at(prefix):
        return {f: flat[f"{prefix}/{f}"] for f in _BN_FIELDS}

    blocks = []
    for bi, depth in enumerate(cfg.block_depths):
        blocks.append(
            {
                "conv": [flat[f"blocks/{bi}/conv/{d}"] for d in range(depth)],
                "bn": [bn_at(f"blocks/{bi}/bn/{d}") for d in range(depth)],
                "res_bn": bn_at(f"blocks/{bi}/res_bn") if depth > 1 else None,
            }
        )
    dense = []
    for di in range(len(cfg.dense_units) + 1):
        dense.append(
            {
                "kernel": flat[f"dense/{di}/kernel"],
                "bias": flat.get(f"dense/{di}/bias"),
                "bn": bn_at(f"dense/{di}/bn") if f"dense/{di}/bn/scale" in flat else None,
            }
        )
    return {"blocks": blocks, "dense": dense}

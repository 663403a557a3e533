"""Device mesh + sharding helpers (the reference has no distribution at all;
SURVEY.md §2.4 — this is new TPU-native capability).

Axes:
  * 'data'  — batch-dimension data parallelism (DP). Primary axis: the
    model is 178k params, so DP over batch is where all the scaling is.
  * 'model' — tensor parallelism (TP). Expressible for the dense head and
    wide conv channels; default size 1 (off) because at this model size TP
    is pure overhead — the API exists so larger model families can use it.

Collectives ride ICI: with pjit, XLA inserts the gradient psum over 'data'
and any gather/reduce-scatter implied by 'model' shardings.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "batch_sharding", "replicated", "variables_shardings", "P"]


def make_mesh(
    n_data: int | None = None, n_model: int = 1, *, devices=None
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (n_data, n_model, len(devices))
    arr = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over 'data'; replicate the rest."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def variables_shardings(flat_paths, mesh: Mesh, *, tensor_parallel: bool = False):
    """{path: NamedSharding} for a flat variable dict.

    With tensor_parallel=True, dense kernels split their output dim and the
    widest conv (128ch, block 4) splits its output-channel dim over 'model';
    everything else is replicated. XLA then inserts the activation
    collectives implied by these shardings.
    """
    out = {}
    for path in flat_paths:
        spec = P()
        if tensor_parallel:
            if path.startswith("dense/") and path.endswith("/kernel"):
                spec = P(None, "model")
            elif path == "blocks/3/conv/0":  # 128-channel conv, HWIO last dim
                spec = P(None, None, None, "model")
        out[path] = NamedSharding(mesh, spec)
    return out

"""roomnet_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of RoomNet.

A from-scratch, TPU-first framework with the capabilities of the reference
single-GPU TF1 implementation (ironhide23586/RoomNet): a 6-class room-scene
classifier (~178k params), training loop with async data feeding, batched
directory inference with xls/class-dir outputs, validation metrics + stats
JSON, plotters, a labeling tool, and checkpoint management — re-designed
around a functional param-pytree core, `jax.jit`/`pjit` execution, device
meshes for scale-out, and Pallas TPU kernels on the hot paths.

Reference behaviors are cited as /root/reference/<file>:<line> in docstrings.
"""

__version__ = "0.1.0"

from roomnet_tpu.models.roomnet import (  # noqa: F401
    RoomNetConfig,
    DEFAULT_CONFIG,
    forward,
    predict,
    init_variables,
)

CLASS_LABELS = ["Backyard", "Bathroom", "Bedroom", "Frontyard", "Kitchen", "LivingRoom"]

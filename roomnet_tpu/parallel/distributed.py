"""Multi-host/multi-slice initialization helpers (SURVEY.md §5 distributed
communication backend row: jax.distributed + XLA collectives; ICI intra-pod,
DCN across slices — the reference has no distribution at all, §2.4).

On a single host this is a no-op; on a TPU pod slice call
`initialize()` once per process before any jax usage. Collectives are then
expressed through `jax.sharding` (see parallel/mesh.py) and inserted by XLA
— never through hand-written NCCL/MPI-style calls.
"""

from __future__ import annotations

import os


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> bool:
    """Initialize jax.distributed if a multi-process env is detected.

    Returns True when distributed mode is active. Safe to call
    unconditionally: without coordinator info and without TPU pod env vars
    it does nothing.
    """
    import jax

    explicit = coordinator_address is not None
    auto = any(
        os.environ.get(k)
        for k in ("COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS")
    )
    if not (explicit or auto):
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def global_mesh(n_model: int = 1):
    """Mesh over ALL processes' devices (jax.devices() is global after
    jax.distributed.initialize); DP over 'data' rides ICI within a slice
    and DCN across slices automatically via XLA's collective lowering."""
    from roomnet_tpu.parallel.mesh import make_mesh

    return make_mesh(n_model=n_model)

"""Model registry: named RoomNet variants.

The reference experimented with 300x300 and 600x600 inputs before settling
on 224 (README.md:32); the architecture is the same conv/dense program, so
variants differ only in `im_side` (and hence `flat_len`, which is why the
reference's checkpoint loader excludes the dense head when the input size
changes — network.py:78, :242). `tiny` is the fast-compile test variant.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from roomnet_tpu.models.roomnet import DEFAULT_CONFIG, FAST_CONFIG, RoomNetConfig

_REGISTRY: dict[str, RoomNetConfig] = {}


def register(name: str, cfg: RoomNetConfig) -> RoomNetConfig:
    if name in _REGISTRY:
        raise KeyError(f"model '{name}' already registered")
    validate(cfg)
    _REGISTRY[name] = cfg
    return cfg


def get(name: str) -> RoomNetConfig:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(f"unknown model '{name}'; have {sorted(_REGISTRY)}") from None


def names() -> list[str]:
    return sorted(_REGISTRY)


def validate(cfg: RoomNetConfig) -> None:
    """Reject geometries where a conv/pool window exceeds its input."""
    s = cfg.im_side
    for bi in range(len(cfg.block_filters)):
        for _ in range(cfg.block_depths[bi]):
            if s < cfg.kernel_size:
                raise ValueError(f"im_side {cfg.im_side}: conv input {s} < kernel")
            s -= cfg.kernel_size - 1
            if cfg.block_pools[bi] is not None:
                k, st = cfg.block_pools[bi]
                if s < k:
                    raise ValueError(f"im_side {cfg.im_side}: pool input {s} < {k}")
                s = (s - k) // st + 1
    if s < 1:
        raise ValueError("network collapses below 1x1")


def resolve(img_side: int, *, bf16: bool) -> RoomNetConfig:
    """THE config resolver for (geometry, precision) — every CLI subcommand
    routes through this, so the registry owns every served config
    (round-4 review weak #6: `roomnet-600-bf16` existed without its 300
    sibling, and the CLI hand-built non-registry configs). Registered
    geometries return the canonical registry entry; any other validated
    geometry is derived from the right base.
    """
    name = f"roomnet-{img_side}" + ("-bf16" if bf16 else "")
    if name in _REGISTRY:
        return _REGISTRY[name]
    cfg = dataclasses.replace(
        FAST_CONFIG if bf16 else DEFAULT_CONFIG, im_side=img_side
    )
    validate(cfg)
    return cfg


# All three reference geometries (README.md:32: 224 final, 300/600 tried)
# x both precisions, so `resolve` always lands on a registered config.
register("roomnet-224", DEFAULT_CONFIG)
register("roomnet-224-bf16", FAST_CONFIG)
for _side in (300, 600):
    register(
        f"roomnet-{_side}", dataclasses.replace(DEFAULT_CONFIG, im_side=_side)
    )
    # Derived from FAST_CONFIG (not DEFAULT + dtype) so every bf16 entry
    # shares the fast lowerings — when FAST_CONFIG flipped to
    # pool_impl="auto", DEFAULT-derived bf16 entries had silently forked
    # from the 224 one (and from resolve()'s own fallback path).
    register(
        f"roomnet-{_side}-bf16", dataclasses.replace(FAST_CONFIG, im_side=_side)
    )
register(
    "roomnet-tiny",
    RoomNetConfig(
        num_classes=6,
        im_side=32,
        block_filters=(8, 16),
        block_depths=(1, 2),
        block_pools=((3, 1), (4, 2)),
        dense_units=(16, 8),
    ),
)

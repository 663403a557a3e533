"""RoomNet model: a functional JAX core with reference-exact semantics.

The architecture (reference network.py:225-244, geometry verified from the
frozen graph — SURVEY.md §2.6):

    input (B,224,224,3) in [-1,1], RGB
    B1: 8ch   depth1, pool3/s1
    B2: 32ch  depth3, pool4/s1, residual (TF1-legacy bilinear 215->205)
    B3: 64ch  depth2, pool4/s2, residual (100->48)
    B4: 128ch depth1, no pool
    B5: 16ch  depth3, pool4/s2, residual (21->2)
    flatten -> 64
    D1 64->32 | D2 32->16 | D3 16->8 (each: dense, ReLU6, BN)
    D4 8->num_classes + bias -> **ReLU6** (logits are ReLU6-clipped,
       reference network.py:214 applies relu6 unconditionally)

Everything is a pure function over an explicit variable pytree:

    variables = {
      "blocks": [ {"conv": [HWIO...], "bn": [BN...], "res_bn": BN|None} x5 ],
      "dense":  [ {"kernel": (i,o), "bias": (o,)|None, "bn": BN|None} x4 ],
    }
    BN = {"scale","bias","mean","var"}  each (C,)

so it jits/pjits/grads/shards without any framework object state.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from roomnet_tpu.ops import blocks as B
from roomnet_tpu.ops.resize import resize_bilinear_tf1

Variables = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class RoomNetConfig:
    """Static architecture config (reference network.py:225-237)."""

    num_classes: int = 6
    im_side: int = 224
    block_filters: tuple[int, ...] = (8, 32, 64, 128, 16)
    block_depths: tuple[int, ...] = (1, 3, 2, 1, 3)
    # (pool_ksize, pool_stride) or None for no pooling.
    block_pools: tuple[tuple[int, int] | None, ...] = (
        (3, 1),
        (4, 1),
        (4, 2),
        None,
        (4, 2),
    )
    kernel_size: int = 3
    dense_units: tuple[int, ...] = (32, 16, 8)
    bn_eps: float = B.BN_EPS
    bn_momentum: float = B.BN_MOMENTUM
    compute_dtype: Any = jnp.float32
    # Average-pool lowering: "reduce_window" | "depthwise" | "auto".
    # "auto" resolves PER POOL SITE from the measured per-shape winners
    # (tools/bench_kernels.py on-chip; PERF.md round-5 stride-2 table):
    # stride-1 pools and large-activation stride-2 pools (input side
    # > 128, e.g. B3's 203² site) stay reduce_window; small-activation
    # stride-2 pools (B3's 98² site: depthwise 2.97 ms vs rw 5.44 ms
    # isolated; B5's ≤44² sites: tie) take the strided depthwise conv
    # emitter — the in-context B3-chain winner is exactly this mix
    # (re+de 12.47 ms vs re+re 12.60 vs de+de 12.91). Parity mode (f32)
    # pins reduce_window — its sum-then-divide matches TF AvgPool's
    # rounding exactly.
    pool_impl: str = "reduce_window"

    def spatial_sizes(self) -> list[list[int]]:
        """Per-block list of activation side lengths after each depth."""
        s = self.im_side
        sizes = []
        for bi in range(len(self.block_filters)):
            cur = []
            for _ in range(self.block_depths[bi]):
                s = s - (self.kernel_size - 1)
                if self.block_pools[bi] is not None:
                    k, st = self.block_pools[bi]
                    s = (s - k) // st + 1
                cur.append(s)
            sizes.append(cur)
        return sizes

    @property
    def flat_len(self) -> int:
        side = self.spatial_sizes()[-1][-1]
        return side * side * self.block_filters[-1]


DEFAULT_CONFIG = RoomNetConfig()

# Fast serving/training config: bf16 compute (single-pass MXU, half the HBM
# traffic) + per-site pool lowerings. Params stay f32; logits return f32.
# pool_impl="auto" measured on-chip (round 5): full forward 33.53 ms vs
# 33.70 ms with reduce_window everywhere, logits BIT-IDENTICAL (max |d| 0.0,
# 0/256 argmax flips, /tmp A/B in PERF.md round 5). Parity mode
# (DEFAULT_CONFIG) keeps full-f32 passes + reduce_window for golden
# equivalence with the reference graph.
FAST_CONFIG = RoomNetConfig(compute_dtype=jnp.bfloat16, pool_impl="auto")


def resolve_pool_impl(pool_impl: str, input_side: int, stride: int) -> str:
    """Resolve the avg-pool lowering for one pool site.

    "auto" applies the measured per-shape winners (PERF.md round-5
    stride-2 table, tools/bench_kernels.py on-chip): the strided
    depthwise-conv emitter only beats reduce_window for stride>1 pools
    over small activations (input side <= 128 — B3's 98² site wins 1.8x
    isolated, B5's <=44² sites tie); large strided sites (B3's 203²) and
    every stride-1 site keep reduce_window. Any explicit impl passes
    through untouched.
    """
    if pool_impl != "auto":
        return pool_impl
    return "depthwise" if (stride > 1 and input_side <= 128) else "reduce_window"


def _bn_init(c: int) -> dict:
    return {
        "scale": jnp.ones((c,), jnp.float32),
        "bias": jnp.zeros((c,), jnp.float32),
        "mean": jnp.zeros((c,), jnp.float32),
        "var": jnp.ones((c,), jnp.float32),
    }


def init_variables(rng: jax.Array, cfg: RoomNetConfig = DEFAULT_CONFIG) -> Variables:
    """Glorot-uniform kernels, identity BN — tf.layers defaults (network.py:184,212)."""
    glorot = jax.nn.initializers.glorot_uniform()
    blocks = []
    in_ch = 3
    k = cfg.kernel_size
    for bi, (filters, depth) in enumerate(zip(cfg.block_filters, cfg.block_depths)):
        convs, bns = [], []
        for d in range(depth):
            rng, sub = jax.random.split(rng)
            convs.append(glorot(sub, (k, k, in_ch if d == 0 else filters, filters), jnp.float32))
            bns.append(_bn_init(filters))
        res_bn = _bn_init(filters) if depth > 1 else None
        blocks.append({"conv": convs, "bn": bns, "res_bn": res_bn})
        in_ch = filters
    dense = []
    d_in = cfg.flat_len
    for units in cfg.dense_units:
        rng, sub = jax.random.split(rng)
        dense.append(
            {"kernel": glorot(sub, (d_in, units), jnp.float32), "bias": None, "bn": _bn_init(units)}
        )
        d_in = units
    rng, sub = jax.random.split(rng)
    dense.append(
        {
            "kernel": glorot(sub, (d_in, cfg.num_classes), jnp.float32),
            "bias": jnp.zeros((cfg.num_classes,), jnp.float32),
            "bn": None,
        }
    )
    return {"blocks": blocks, "dense": dense}


def _maybe_dropout(x, dropout_rate, rng, site):
    if dropout_rate is None or rng is None:
        return x
    return B.dropout(x, dropout_rate, jax.random.fold_in(rng, site))


def _fold_preprocess_into_first_conv(k0: jnp.ndarray):
    """Fold BGR->RGB + [-1,1] normalization into block-0's conv weights.

    For uint8 BGR input: ``conv(k, bgr*2/255 - 1  reversed)`` equals
    ``conv(k', bgr_cast) + b'`` with ``k' = flip_cin(k) * 2/255`` and
    ``b'[co] = -sum_{dy,dx,ci} k[...]`` — so the preprocess
    (reference network.py:129,153,159) costs a dtype cast and nothing else:
    no normalized intermediate tensor ever hits HBM.
    """
    k = k0.astype(jnp.float32)
    k_folded = k[:, :, ::-1, :] * (2.0 / 255.0)
    bias = -jnp.sum(k, axis=(0, 1, 2))
    return k_folded, bias


def forward(
    variables: Variables,
    x: jnp.ndarray,
    cfg: RoomNetConfig = DEFAULT_CONFIG,
    *,
    use_batch_stats: bool = False,
    collect_batch_stats: bool = False,
    dropout_rate=None,
    rng: jax.Array | None = None,
    batch_row_mask: jnp.ndarray | None = None,
):
    """Forward pass on normalized RGB input NHWC in [-1,1].

    Args:
      use_batch_stats: BN normalizes with batch statistics
        (`compute_bn_mean_var=True` mode, reference network.py:193).
      collect_batch_stats: additionally return per-BN batch stats keyed by a
        stable path, for folding the momentum-0.99 moving update.
      dropout_rate: None disables dropout entirely; otherwise a (traced)
        scalar rate applied after every conv/dense block
        (reference network.py:204-206, 219-221).
      batch_row_mask: optional float (B,) of 1.0 (real) / 0.0 (padded
        row). Only consulted when use_batch_stats: BN batch moments
        exclude padded rows, so a padded batch computes the same
        statistics a shrunk real-rows-only batch would (the masked
        multi-step/sharded-feed paths feed this).

    Input: normalized RGB float NHWC in [-1,1], OR raw uint8 BGR — uint8
    input triggers the free algebraic preprocess fold (see
    `_fold_preprocess_into_first_conv`).

    Returns:
      logits (B, num_classes) — ReLU6-clipped like the reference — or
      (logits, batch_stats_dict) when collect_batch_stats.
    """
    folded_bias = None
    folded_k0 = None
    if x.dtype == jnp.uint8:
        folded_k0, folded_bias = _fold_preprocess_into_first_conv(
            variables["blocks"][0]["conv"][0]
        )
    x = x.astype(cfg.compute_dtype)
    stats: dict[str, B.BNStats] = {}
    site = 0

    def apply_bn(h, bn, path):
        nonlocal stats
        if use_batch_stats:
            h, st = B.batch_norm_train(
                h, bn, cfg.bn_eps, row_weights=batch_row_mask
            )
            if collect_batch_stats:
                stats[path] = st
            return h
        return B.batch_norm(h, bn, cfg.bn_eps)

    for bi, blk in enumerate(variables["blocks"]):
        depth = len(blk["conv"])
        pool = cfg.block_pools[bi]
        res_in = None
        for d in range(depth):
            if bi == 0 and d == 0 and folded_k0 is not None:
                x = B.conv2d_valid(x, folded_k0) + folded_bias.astype(x.dtype)
            else:
                x = B.conv2d_valid(x, blk["conv"][d])
            x = B.relu6(x)
            if pool is not None:
                impl = resolve_pool_impl(cfg.pool_impl, x.shape[1], pool[1])
                x = B.avg_pool_valid(x, pool[0], pool[1], impl=impl)
            x = apply_bn(x, blk["bn"][d], f"blocks/{bi}/bn/{d}")
            if d == 0:
                res_in = x
        if depth > 1:  # make_residual (reference network.py:181-182, 198-203)
            x = x + resize_bilinear_tf1(res_in, (x.shape[1], x.shape[2]))
            x = apply_bn(x, blk["res_bn"], f"blocks/{bi}/res_bn")
        x = _maybe_dropout(x, dropout_rate, rng, site)
        site += 1

    x = x.reshape(x.shape[0], -1)  # NHWC row-major flatten (network.py:234)
    for di, layer in enumerate(variables["dense"]):
        x = B.dense(x, layer["kernel"], layer["bias"])
        x = B.relu6(x)  # unconditional, incl. logits (network.py:214)
        if layer["bn"] is not None:
            x = apply_bn(x, layer["bn"], f"dense/{di}/bn")
        x = _maybe_dropout(x, dropout_rate, rng, site)
        site += 1

    logits = x.astype(jnp.float32)
    if collect_batch_stats:
        return logits, stats
    return logits


def update_moving_stats(
    variables: Variables, stats: dict[str, B.BNStats], momentum: float = B.BN_MOMENTUM
) -> Variables:
    """Fold collected batch stats into BN moving mean/var (tf.layers semantics).

    new = momentum * old + (1 - momentum) * batch  (unbiased var for the
    moving variance, matching fused BN's Bessel-corrected update).
    """

    def upd(bn, st):
        return {
            "scale": bn["scale"],
            "bias": bn["bias"],
            "mean": momentum * bn["mean"] + (1 - momentum) * st.mean,
            "var": momentum * bn["var"] + (1 - momentum) * st.var_unbiased,
        }

    new_blocks = []
    for bi, blk in enumerate(variables["blocks"]):
        nb = {"conv": blk["conv"], "bn": [], "res_bn": blk["res_bn"]}
        for d, bn in enumerate(blk["bn"]):
            key = f"blocks/{bi}/bn/{d}"
            nb["bn"].append(upd(bn, stats[key]) if key in stats else bn)
        key = f"blocks/{bi}/res_bn"
        if blk["res_bn"] is not None and key in stats:
            nb["res_bn"] = upd(blk["res_bn"], stats[key])
        new_blocks.append(nb)
    new_dense = []
    for di, layer in enumerate(variables["dense"]):
        key = f"dense/{di}/bn"
        nl = dict(layer)
        if layer["bn"] is not None and key in stats:
            nl["bn"] = upd(layer["bn"], stats[key])
        new_dense.append(nl)
    return {"blocks": new_blocks, "dense": new_dense}


def predict(variables: Variables, x: jnp.ndarray, cfg: RoomNetConfig = DEFAULT_CONFIG):
    """(argmax ids, softmax probs) — the optimized-inference heads (network.py:44-45)."""
    logits = forward(variables, x, cfg)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.argmax(probs, axis=-1), probs


def normalize_bgr_uint8(x_bgr: jnp.ndarray) -> jnp.ndarray:
    """BGR uint8 -> RGB float in [-1,1] (reference network.py:129,153,159)."""
    return (x_bgr[..., ::-1].astype(jnp.float32) / 255.0) * 2.0 - 1.0


def param_count(variables: Variables) -> int:
    return sum(int(np.prod(v.shape)) for v in jax.tree_util.tree_leaves(variables))

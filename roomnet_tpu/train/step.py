"""Loss + train step: sparse CE on ReLU6-clipped logits, L2, TF1 Adam.

Reference loss graph (network.py:56-69):
  * `sparse_softmax_cross_entropy_with_logits` on the (ReLU6-clipped) logits;
  * L2 = sum over *all* trainable vars (incl. BN gamma/beta) of
    ``l2_coeff * 0.5 * ||v||^2`` (`tf.nn.l2_loss`), added to the mean CE;
  * Adam on the exponentially-decayed LR; BN moving updates ride with the
    step when enabled (`update_batchnorm_means_vars`, network.py:64-67).

The step is a pure function over a TrainState of flat {path: array} dicts,
jittable on one chip and pjit-shardable over a mesh (batch on 'data',
params replicated — XLA inserts the gradient all-reduce).
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from roomnet_tpu.models.roomnet import (
    DEFAULT_CONFIG,
    RoomNetConfig,
    forward,
    normalize_bgr_uint8,
    update_moving_stats,
)
from roomnet_tpu.params import schema
from roomnet_tpu.train.optimizer import TF1AdamState, exponential_decay, tf1_adam


@dataclasses.dataclass(frozen=True)
class TrainHParams:
    """Reference train.py:26-41 constants as a typed config."""

    learn_rate: float = 2e-4
    num_steps: int = 100_000
    l2_coeff: float = 6e-2
    dropout_enabled: bool = False
    dropout_rate: float = 0.35
    compute_bn_mean_var: bool = False  # BN uses batch stats when True
    update_bn_moving: bool = False  # fold moving-average updates when True
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-8


class TrainState(NamedTuple):
    step: jnp.ndarray  # int32 global step (reference step_ph)
    train_vars: dict[str, Any]  # trainable flat dict
    frozen_vars: dict[str, Any]  # BN moving stats flat dict
    opt_state: TF1AdamState

    def variables(self, cfg: RoomNetConfig = DEFAULT_CONFIG):
        return schema.unflatten_jax({**self.train_vars, **self.frozen_vars}, cfg)


def init_train_state(variables, hp: TrainHParams = TrainHParams()) -> TrainState:
    flat = schema.flatten_jax(variables)
    # copy=True: the train step donates its state, which would otherwise
    # delete buffers ALIASED with the caller's `variables` (jnp.asarray on a
    # jnp array is a no-op) — leaving the caller with dead arrays.
    flat = {k: jnp.array(v, copy=True) for k, v in flat.items()}
    train_vars, frozen_vars = schema.partition_flat(flat)
    opt = tf1_adam(
        exponential_decay(hp.learn_rate, hp.num_steps),
        hp.adam_b1,
        hp.adam_b2,
        hp.adam_eps,
    )
    return TrainState(
        step=jnp.zeros([], jnp.int32),
        train_vars=train_vars,
        frozen_vars=frozen_vars,
        opt_state=opt.init(train_vars),
    )


def loss_fn(
    train_vars,
    frozen_vars,
    x_norm,
    y,
    hp: TrainHParams,
    cfg: RoomNetConfig,
    rng,
    row_mask=None,
):
    """row_mask: optional float (B,) of 1.0 (real row) / 0.0 (padding).
    Masked rows contribute zero CE gradient, the mean divides by the
    real-row count, and BN batch statistics (when compute_bn_mean_var)
    exclude padded rows via weighted moments — so a padded batch computes
    the SAME loss/gradients/BN stats a shrunk real-rows-only batch would.
    Pinned by tests/test_train_step.py::test_masked_bn_matches_shrunk_batch:
    real-row logits match to 2.8e-6 (the OLD padded-moment behavior
    diverged 0.82 at a 3/8 pad fraction)."""
    variables = schema.unflatten_jax({**train_vars, **frozen_vars}, cfg)
    dropout_rate = hp.dropout_rate if hp.dropout_enabled else None
    out = forward(
        variables,
        x_norm,
        cfg,
        use_batch_stats=hp.compute_bn_mean_var,
        collect_batch_stats=hp.compute_bn_mean_var and hp.update_bn_moving,
        dropout_rate=dropout_rate,
        rng=rng if hp.dropout_enabled else None,
        batch_row_mask=row_mask,
    )
    logits, bn_stats = out if isinstance(out, tuple) else (out, None)
    labels_1hot = jax.nn.one_hot(y, cfg.num_classes, dtype=logits.dtype)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.sum(labels_1hot * logp, axis=-1)
    l2 = sum(
        hp.l2_coeff * 0.5 * jnp.sum(jnp.square(v.astype(jnp.float32)))
        for v in train_vars.values()
    )
    if row_mask is None:
        ce_mean = jnp.mean(ce)
    else:
        m = row_mask.astype(ce.dtype)
        ce_mean = jnp.sum(ce * m) / jnp.maximum(jnp.sum(m), 1.0)
    loss = ce_mean + l2
    return loss, (logits, bn_stats)


def make_train_step(
    hp: TrainHParams = TrainHParams(), cfg: RoomNetConfig = DEFAULT_CONFIG
):
    """Returns step(state, x_bgr_uint8, y, rng) -> (state, metrics).

    Input is raw uint8 BGR — normalization (network.py:159) runs on device,
    fused into the forward by XLA.
    """
    opt = tf1_adam(
        exponential_decay(hp.learn_rate, hp.num_steps),
        hp.adam_b1,
        hp.adam_b2,
        hp.adam_eps,
    )

    def step_fn(state: TrainState, x_bgr_uint8, y, rng, row_mask=None):
        x_norm = normalize_bgr_uint8(x_bgr_uint8)
        (loss, (logits, bn_stats)), grads = jax.value_and_grad(
            loss_fn, argnums=0, has_aux=True
        )(state.train_vars, state.frozen_vars, x_norm, y, hp, cfg, rng, row_mask)
        # step=state.step: the schedule follows the restored global step, not
        # Adam's moment count (they diverge after a params-only restore), so
        # the applied LR and metrics["learn_rate"] share one clock.
        updates, new_opt_state = opt.update(grads, state.opt_state, step=state.step)
        new_train_vars = jax.tree_util.tree_map(
            lambda p, u: p + u, state.train_vars, updates
        )
        frozen_vars = state.frozen_vars
        if bn_stats:
            # Fold moving-average updates (momentum 0.99), like the UPDATE_OPS
            # control dependency in the reference (network.py:64-67).
            merged = schema.unflatten_jax({**state.train_vars, **frozen_vars}, cfg)
            updated = update_moving_stats(merged, bn_stats, cfg.bn_momentum)
            _, frozen_vars = schema.partition_flat(schema.flatten_jax(updated))
        if row_mask is not None:
            # A batch with NO real rows (every rank's slice unreadable →
            # fully cycle-padded/synthetic) must be a state no-op: the
            # masked CE is zero but the L2 term still produces gradients,
            # Adam moments would advance, and BN moving averages would
            # absorb zero-image statistics. Gating with `where` keeps all
            # ranks executing the identical program (a per-rank skip would
            # desync the collectives); only the step clock advances.
            has_real = jnp.sum(row_mask) > 0

            def _keep(new, old):
                return jax.tree_util.tree_map(
                    lambda n, o: jnp.where(has_real, n, o), new, old
                )

            new_train_vars = _keep(new_train_vars, state.train_vars)
            new_opt_state = _keep(new_opt_state, state.opt_state)
            frozen_vars = _keep(frozen_vars, state.frozen_vars)
        lr = exponential_decay(hp.learn_rate, hp.num_steps)(state.step)
        hits = (jnp.argmax(logits, -1) == y).astype(jnp.float32)
        if row_mask is None:
            acc = jnp.mean(hits)
        else:
            m = row_mask.astype(jnp.float32)
            acc = jnp.sum(hits * m) / jnp.maximum(jnp.sum(m), 1.0)
        metrics = {
            "loss": loss,
            "learn_rate": lr,
            "accuracy": acc,
        }
        return (
            TrainState(
                step=state.step + 1,
                train_vars=new_train_vars,
                frozen_vars=frozen_vars,
                opt_state=new_opt_state,
            ),
            metrics,
        )

    return step_fn


def make_multi_train_step(
    hp: TrainHParams = TrainHParams(), cfg: RoomNetConfig = DEFAULT_CONFIG
):
    """K optimizer steps in ONE dispatch via `lax.scan` — the TPU-native
    "training loop inside the program" pattern.

    When it helps: hosts where per-call dispatch dominates step time
    (slow controllers, high-latency links). Measured on THIS rig it does
    NOT (the batch-45 ~50 ms floor is device-side small-batch latency —
    K=8 scanning gained nothing; PERF.md round 3), which is why
    TrainConfig.steps_per_call defaults to 1. Semantically identical to
    K sequential `make_train_step` calls fed the same per-step RNGs
    (pinned by test_train_step).

    Returns multi_step(state, x[K,B,S,S,3] uint8, y[K,B], rng,
    row_mask[K,B]=None) -> (state, metrics) where metrics are the LAST
    step's (matching what a sequential loop would print) plus `mean_loss`
    over the call. K is taken from the input shape — one compile per
    distinct K.

    row_mask (float 1.0/0.0): marks rows the feeder cycle-padded onto a
    partially-unreadable batch. Masked rows are excluded from the CE mean
    and gradient AND from BN batch statistics (weighted moments when
    compute_bn_mean_var) — matching steps_per_call=1, where a shrunk
    batch trains only on real rows.
    """
    step_fn = make_train_step(hp, cfg)

    def multi_step_fn(state: TrainState, x_k, y_k, rng, row_mask_k=None):
        rngs = jax.random.split(rng, x_k.shape[0])

        def body(carry, inp):
            x, y, r, m = inp
            return step_fn(carry, x, y, r, row_mask=m)

        if row_mask_k is None:
            row_mask_k = jnp.ones(y_k.shape, jnp.float32)
        state, metrics_k = jax.lax.scan(
            body, state, (x_k, y_k, rngs, row_mask_k)
        )
        metrics = {k: v[-1] for k, v in metrics_k.items()}
        metrics["mean_loss"] = jnp.mean(metrics_k["loss"])
        return state, metrics

    return multi_step_fn

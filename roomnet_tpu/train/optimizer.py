"""Optimizer: TF1-exact Adam on a continuously-decayed learning rate.

Reference semantics (network.py:36-37, :61-69):
  * LR schedule: `tf.train.exponential_decay(lr0, step, num_steps, 0.068)`
    with staircase=False — ``lr = lr0 * 0.068 ** (step / num_steps)``;
  * Optimizer: `tf.train.AdamOptimizer` — note this is NOT optax.adam:
    TF1 Adam applies ``lr_t = lr * sqrt(1-b2^t)/(1-b1^t)`` and then
    ``p -= lr_t * m / (sqrt(v) + eps)`` with eps OUTSIDE the bias
    correction, while optax.adam adds eps to sqrt(v_hat). We implement the
    TF1 update exactly as an optax GradientTransformation.

Flat {path: array} pytrees keep optimizer state trivially checkpointable.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


def exponential_decay(lr0: float, num_steps: int, decay_rate: float = 0.068):
    """Continuous exponential decay (reference network.py:36-37)."""

    def schedule(step):
        return lr0 * decay_rate ** (jnp.asarray(step, jnp.float32) / num_steps)

    return schedule


class TF1AdamState(NamedTuple):
    count: jnp.ndarray  # int32 step counter (t starts at 1 on first update)
    mu: optax.Updates
    nu: optax.Updates


def tf1_adam(
    learning_rate, b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8
) -> optax.GradientTransformation:
    """`tf.train.AdamOptimizer`-exact update rule as a GradientTransformation."""

    def init_fn(params):
        return TF1AdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree_util.tree_map(jnp.zeros_like, params),
            nu=jax.tree_util.tree_map(jnp.zeros_like, params),
        )

    def update_fn(updates, state, params=None, *, step=None):
        del params
        count = state.count + 1
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1.0 - b1) * g, state.mu, updates
        )
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1.0 - b2) * jnp.square(g), state.nu, updates
        )
        t = count.astype(jnp.float32)
        # The LR schedule clock is the GLOBAL step when given (reference
        # network.py:124 restores step_ph from the checkpoint name, so the
        # decay continues after a params-only / fresh-head restore even
        # though Adam's moments reset); `count` is kept only for bias
        # correction. Falls back to count-1 for standalone use.
        sched_step = step if step is not None else count - 1
        lr = learning_rate(sched_step) if callable(learning_rate) else learning_rate
        # TF1: lr_t = lr * sqrt(1 - b2^t) / (1 - b1^t); p -= lr_t * m/(sqrt(v)+eps)
        lr_t = lr * jnp.sqrt(1.0 - b2**t) / (1.0 - b1**t)
        new_updates = jax.tree_util.tree_map(
            lambda m, v: -lr_t * m / (jnp.sqrt(v) + eps), mu, nu
        )
        return new_updates, TF1AdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def flatten_opt_state(state: TF1AdamState) -> dict:
    """TF1AdamState over a flat-dict param tree -> {path: ndarray} for ckpt."""
    out = {"count": state.count}
    for k, v in state.mu.items():
        out[f"mu/{k}"] = v
    for k, v in state.nu.items():
        out[f"nu/{k}"] = v
    return out


def unflatten_opt_state(flat: dict) -> TF1AdamState:
    mu = {k[len("mu/"):]: v for k, v in flat.items() if k.startswith("mu/")}
    nu = {k[len("nu/"):]: v for k, v in flat.items() if k.startswith("nu/")}
    return TF1AdamState(count=jnp.asarray(flat["count"]), mu=mu, nu=nu)

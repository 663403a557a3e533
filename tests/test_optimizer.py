"""TF1 Adam + exponential decay semantics (reference network.py:36-37, :61)."""

import jax
import jax.numpy as jnp
import numpy as np

from roomnet_tpu.train.optimizer import (
    exponential_decay,
    flatten_opt_state,
    tf1_adam,
    unflatten_opt_state,
)


def test_exponential_decay_values():
    """lr = lr0 * 0.068 ** (step/num_steps), continuous (no staircase)."""
    sched = exponential_decay(2e-4, 100_000)
    assert float(sched(0)) == np.float32(2e-4)
    np.testing.assert_allclose(float(sched(100_000)), 2e-4 * 0.068, rtol=1e-5)
    np.testing.assert_allclose(float(sched(50_000)), 2e-4 * 0.068**0.5, rtol=1e-5)


def test_tf1_adam_matches_manual_reference():
    """Cross-check against a hand-written numpy TF1-Adam for 5 steps."""
    lr, b1, b2, eps = 1e-3, 0.9, 0.999, 1e-8
    rng = np.random.RandomState(0)
    p0 = rng.randn(7).astype(np.float32)
    grads = [rng.randn(7).astype(np.float32) for _ in range(5)]

    # numpy reference (tf.train.AdamOptimizer update rule)
    p = p0.copy()
    m = np.zeros_like(p)
    v = np.zeros_like(p)
    for t, g in enumerate(grads, start=1):
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        lr_t = lr * np.sqrt(1 - b2**t) / (1 - b1**t)
        p = p - lr_t * m / (np.sqrt(v) + eps)

    opt = tf1_adam(lr, b1, b2, eps)
    params = {"w": jnp.asarray(p0)}
    state = opt.init(params)
    for g in grads:
        updates, state = opt.update({"w": jnp.asarray(g)}, state)
        params = jax.tree_util.tree_map(lambda a, b: a + b, params, updates)
    np.testing.assert_allclose(np.asarray(params["w"]), p, rtol=1e-5, atol=1e-7)


def test_tf1_adam_differs_from_optax_adam():
    """Guard: the eps placement difference is real (else we could just use
    optax.adam and this module is dead weight)."""
    import optax

    g = {"w": jnp.full((3,), 1e-4)}
    p = {"w": jnp.zeros(3)}
    o1 = tf1_adam(1e-3)
    o2 = optax.adam(1e-3)
    s1, s2 = o1.init(p), o2.init(p)
    u1, _ = o1.update(g, s1)
    u2, _ = o2.update(g, s2, p)
    assert not np.allclose(np.asarray(u1["w"]), np.asarray(u2["w"]), rtol=1e-3)


def test_schedule_clock_is_global_step_not_moment_count():
    """A params-only restore resets Adam's count to 0 but keeps the global
    step; the applied LR must continue the decay from the global step
    (reference network.py:124 restores step_ph), not restart at lr0."""
    sched = exponential_decay(2e-4, 100_000)
    opt = tf1_adam(sched)
    g = {"w": jnp.ones(3)}
    u0, _ = opt.update(g, opt.init(g), step=jnp.asarray(0))
    u_mid, _ = opt.update(g, opt.init(g), step=jnp.asarray(50_000))
    ratio = float(u_mid["w"][0] / u0["w"][0])
    np.testing.assert_allclose(ratio, 0.068**0.5, rtol=1e-4)
    # fallback without step= keeps the old count-based clock (t=1 -> step 0)
    u_fallback, _ = opt.update(g, opt.init(g))
    np.testing.assert_allclose(np.asarray(u_fallback["w"]), np.asarray(u0["w"]))


def test_opt_state_flatten_roundtrip():
    opt = tf1_adam(1e-3)
    params = {"a/b": jnp.ones(3), "c": jnp.zeros((2, 2))}
    state = opt.init(params)
    updates, state = opt.update(params, state)
    flat = flatten_opt_state(state)
    state2 = unflatten_opt_state({k: np.asarray(v) for k, v in flat.items()})
    assert int(state2.count) == int(state.count)
    for k in params:
        np.testing.assert_array_equal(np.asarray(state.mu[k]), np.asarray(state2.mu[k]))
        np.testing.assert_array_equal(np.asarray(state.nu[k]), np.asarray(state2.nu[k]))

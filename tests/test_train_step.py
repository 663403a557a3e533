"""Train-step mechanics on the tiny config: loss descent, BN modes, dropout."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from roomnet_tpu.models.roomnet import forward, init_variables, normalize_bgr_uint8
from roomnet_tpu.params import schema
from roomnet_tpu.train.step import (
    TrainHParams,
    init_train_state,
    loss_fn,
    make_train_step,
)
from tests.tiny import TINY


@pytest.fixture(scope="module")
def batch():
    rng = np.random.RandomState(0)
    x = rng.randint(0, 256, size=(8, 32, 32, 3), dtype=np.uint8)
    y = rng.randint(0, TINY.num_classes, size=(8,), dtype=np.int32)
    return jnp.asarray(x), jnp.asarray(y)


def test_loss_decreases_on_fixed_batch(batch):
    hp = TrainHParams(learn_rate=3e-3, l2_coeff=1e-4, num_steps=1000)
    state = init_train_state(init_variables(jax.random.PRNGKey(0), TINY), hp)
    step = jax.jit(make_train_step(hp, TINY))
    x, y = batch
    rng = jax.random.PRNGKey(0)
    losses = []
    for _ in range(30):
        state, metrics = step(state, x, y, rng)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, losses[:3] + losses[-3:]
    assert int(state.step) == 30


def test_l2_includes_bn_scale_bias(batch):
    """L2 covers ALL trainables incl. BN gamma/beta (reference network.py:58)."""
    hp = TrainHParams(l2_coeff=1.0)
    variables = init_variables(jax.random.PRNGKey(0), TINY)
    state = init_train_state(variables, hp)
    x, y = batch
    from roomnet_tpu.models.roomnet import normalize_bgr_uint8

    loss, _ = loss_fn(state.train_vars, state.frozen_vars,
                      normalize_bgr_uint8(x), y, hp, TINY, None)
    # l2 of gamma=1 vectors alone exceeds CE scale: 0.5 * sum(1^2) over BN dims
    n_bn_scale = sum(v.size for k, v in state.train_vars.items() if k.endswith("scale"))
    assert float(loss) > 0.5 * n_bn_scale  # CE >= 0 and other params add more


def test_frozen_bn_stats_unchanged_without_update(batch):
    hp = TrainHParams(compute_bn_mean_var=False, update_bn_moving=False)
    state = init_train_state(init_variables(jax.random.PRNGKey(0), TINY), hp)
    step = jax.jit(make_train_step(hp, TINY))
    x, y = batch
    before = {k: np.asarray(v) for k, v in state.frozen_vars.items()}
    state, _ = step(state, x, y, jax.random.PRNGKey(0))
    for k, v in state.frozen_vars.items():
        np.testing.assert_array_equal(before[k], np.asarray(v))


def test_bn_moving_stats_update_when_enabled(batch):
    hp = TrainHParams(compute_bn_mean_var=True, update_bn_moving=True)
    state = init_train_state(init_variables(jax.random.PRNGKey(0), TINY), hp)
    step = jax.jit(make_train_step(hp, TINY))
    x, y = batch
    before_mean = np.asarray(state.frozen_vars["blocks/0/bn/0/mean"])
    state, _ = step(state, x, y, jax.random.PRNGKey(0))
    after_mean = np.asarray(state.frozen_vars["blocks/0/bn/0/mean"])
    assert not np.allclose(before_mean, after_mean)
    # momentum 0.99: single step moves moving stats by (1-0.99)*batch_mean
    assert np.abs(after_mean - before_mean).max() < np.abs(after_mean).max() + 1.0


def test_batch_stats_mode_changes_forward(batch):
    variables = init_variables(jax.random.PRNGKey(0), TINY)
    x, _ = batch
    from roomnet_tpu.models.roomnet import normalize_bgr_uint8

    xn = normalize_bgr_uint8(x)
    frozen = forward(variables, xn, TINY, use_batch_stats=False)
    batchstat = forward(variables, xn, TINY, use_batch_stats=True)
    assert not np.allclose(np.asarray(frozen), np.asarray(batchstat))


def test_dropout_zero_rate_is_identity(batch):
    variables = init_variables(jax.random.PRNGKey(0), TINY)
    x, _ = batch
    from roomnet_tpu.models.roomnet import normalize_bgr_uint8

    xn = normalize_bgr_uint8(x)
    plain = forward(variables, xn, TINY)
    with_dropout0 = forward(
        variables, xn, TINY, dropout_rate=0.0, rng=jax.random.PRNGKey(3)
    )
    np.testing.assert_allclose(np.asarray(plain), np.asarray(with_dropout0), atol=1e-6)


def test_dropout_active_changes_output_and_is_seeded(batch):
    variables = init_variables(jax.random.PRNGKey(0), TINY)
    x, _ = batch
    from roomnet_tpu.models.roomnet import normalize_bgr_uint8

    xn = normalize_bgr_uint8(x)
    a = forward(variables, xn, TINY, dropout_rate=0.5, rng=jax.random.PRNGKey(1))
    b = forward(variables, xn, TINY, dropout_rate=0.5, rng=jax.random.PRNGKey(1))
    c = forward(variables, xn, TINY, dropout_rate=0.5, rng=jax.random.PRNGKey(2))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_gradients_flow_to_all_trainables(batch):
    hp = TrainHParams(l2_coeff=0.0)
    variables = init_variables(jax.random.PRNGKey(0), TINY)
    state = init_train_state(variables, hp)
    x, y = batch
    from roomnet_tpu.models.roomnet import normalize_bgr_uint8

    grads = jax.grad(
        lambda tv: loss_fn(tv, state.frozen_vars, normalize_bgr_uint8(x), y, hp, TINY, None)[0]
    )(state.train_vars)
    zero_grads = [k for k, g in grads.items() if float(jnp.abs(g).max()) == 0.0]
    # ReLU6-clipped logits can dead-zone SOME units but not entire kernels
    # at init scale; every tensor should receive some gradient.
    assert zero_grads == [], zero_grads


def test_donated_step_does_not_kill_caller_variables(batch):
    """init_train_state must COPY: the donated step would otherwise delete
    buffers aliased with the caller's variables pytree."""
    hp = TrainHParams()
    variables = init_variables(jax.random.PRNGKey(0), TINY)
    state = init_train_state(variables, hp)
    step = jax.jit(make_train_step(hp, TINY), donate_argnums=(0,))
    x, y = batch
    state, _ = step(state, x, y, jax.random.PRNGKey(0))
    # caller's variables must still be alive and usable
    out = forward(variables, jnp.zeros((1, TINY.im_side, TINY.im_side, 3)), TINY)
    assert np.isfinite(np.asarray(out)).all()


def test_multi_step_scan_matches_sequential(batch):
    """make_multi_train_step (K steps per dispatch via lax.scan) must be
    semantically identical to K sequential make_train_step calls fed the
    same per-step RNGs — incl. step counter, Adam state, BN moving stats
    and dropout (exercised: batch-stats BN + dropout on)."""
    from roomnet_tpu.train.step import make_multi_train_step

    hp = TrainHParams(compute_bn_mean_var=True, update_bn_moving=True,
                      dropout_enabled=True, dropout_rate=0.2)
    variables = init_variables(jax.random.PRNGKey(1), TINY)
    x1, y1 = batch
    rng = np.random.RandomState(5)
    K = 3
    x_k = np.stack([x1] + [
        rng.randint(0, 256, x1.shape, dtype=np.uint8) for _ in range(K - 1)
    ])
    y_k = np.stack([y1] + [
        rng.randint(0, TINY.num_classes, y1.shape, dtype=np.int32)
        for _ in range(K - 1)
    ])
    root = jax.random.PRNGKey(42)

    state_seq = init_train_state(variables, hp)
    step = jax.jit(make_train_step(hp, TINY))
    rngs = jax.random.split(root, K)
    for i in range(K):
        state_seq, metrics_seq = step(state_seq, x_k[i], y_k[i], rngs[i])

    state_scan = init_train_state(variables, hp)
    multi = jax.jit(make_multi_train_step(hp, TINY))
    state_scan, metrics_scan = multi(state_scan, x_k, y_k, root)

    assert int(state_scan.step) == int(state_seq.step) == K
    np.testing.assert_allclose(
        float(metrics_scan["loss"]), float(metrics_seq["loss"]),
        rtol=1e-5, atol=1e-6,
    )
    # Tolerance note: at K=1 the scan matches the standalone step to 1 ulp
    # (measured 7e-9); over K steps XLA's different scheduling of the scan
    # body accumulates float noise that Adam's 1/sqrt(v) normalization
    # amplifies on near-zero-gradient elements (measured max 1.4e-4 at
    # K=3). Semantic equivalence, not bitwise identity, is the contract.
    for name, seq_d, scan_d in [
        ("train", state_seq.train_vars, state_scan.train_vars),
        ("frozen", state_seq.frozen_vars, state_scan.frozen_vars),
    ]:
        for k in seq_d:
            np.testing.assert_allclose(
                np.asarray(scan_d[k]), np.asarray(seq_d[k]),
                atol=1e-3, rtol=0, err_msg=f"{name}:{k}",
            )


def test_multi_step_row_mask_matches_shrunk_batch(batch):
    """A partially-unreadable batch is cycle-padded to the nominal size for
    the (K, B, ...) stack; with the row mask the padded duplicates must
    contribute ZERO gradient weight — the update must match running the
    SHRUNK batch through the single-step path (round-3 advisor: the
    unmasked path gave duplicated rows gradient weight, diverging from
    steps_per_call=1 semantics). Frozen-BN phase here; the batch-stats-BN
    case is pinned by test_masked_bn_matches_shrunk_batch."""
    from roomnet_tpu.train.step import make_multi_train_step

    hp = TrainHParams()  # final-phase: frozen BN, no dropout
    variables = init_variables(jax.random.PRNGKey(1), TINY)
    x1, y1 = batch
    B = x1.shape[0]
    n_real = B - 2
    root = jax.random.PRNGKey(42)
    rngs = jax.random.split(root, 2)

    # Sequential truth: full batch, then the SHRUNK batch (real rows only).
    state_seq = init_train_state(variables, hp)
    step = jax.jit(make_train_step(hp, TINY))
    state_seq, _ = step(state_seq, x1, y1, rngs[0])
    state_seq, metrics_seq = step(state_seq, x1[:n_real], y1[:n_real], rngs[1])

    # Scan: second batch cycle-padded back to B, padding masked out.
    idx = np.concatenate([np.arange(n_real), np.arange(B - n_real) % n_real])
    x_k = np.stack([x1, x1[:n_real][idx]])
    y_k = np.stack([y1, y1[:n_real][idx]])
    mask = np.ones((2, B), np.float32)
    mask[1, n_real:] = 0.0
    state_scan, metrics_scan = jax.jit(make_multi_train_step(hp, TINY))(
        init_train_state(variables, hp), x_k, y_k, root, mask
    )

    np.testing.assert_allclose(
        float(metrics_scan["loss"]), float(metrics_seq["loss"]),
        rtol=1e-5, atol=1e-6,
    )
    for k in state_seq.train_vars:
        np.testing.assert_allclose(
            np.asarray(state_scan.train_vars[k]),
            np.asarray(state_seq.train_vars[k]),
            atol=1e-3, rtol=0, err_msg=k,
        )


def test_masked_bn_matches_shrunk_batch(batch):
    """Batch-stats BN with a row mask: padded rows must be excluded from
    the BN batch moments (weighted mean/var), so a cycle-padded batch
    computes the SAME loss, parameter update, and BN moving-stat update a
    shrunk real-rows-only batch does. This closes the round-4 'documented
    residual divergence' (train/step.py previously let padded rows enter
    BN statistics when compute_bn_mean_var=True). Measured magnitudes:
    OLD behavior diverged 0.82 max on real-row logits at this pad
    fraction; the weighted moments match to 2.8e-6."""
    hp = TrainHParams(compute_bn_mean_var=True, update_bn_moving=True)
    variables = init_variables(jax.random.PRNGKey(1), TINY)
    x1, y1 = batch
    B = x1.shape[0]
    n_real = B - 3
    rng0 = jax.random.PRNGKey(7)

    # Truth: the shrunk batch (real rows only) through the masked=None path.
    state_seq = init_train_state(variables, hp)
    step = jax.jit(make_train_step(hp, TINY))
    state_seq, metrics_seq = step(state_seq, x1[:n_real], y1[:n_real], rng0)

    # Under test: cycle-padded back to B with the padding masked out.
    idx = np.concatenate([np.arange(n_real), np.arange(B - n_real) % n_real])
    mask = np.ones((B,), np.float32)
    mask[n_real:] = 0.0
    state_m, metrics_m = step(
        init_train_state(variables, hp), x1[:n_real][idx], y1[:n_real][idx],
        rng0, jnp.asarray(mask),
    )

    # The forward-level pin is tight: masked logits on real rows match the
    # shrunk batch to float noise (2.8e-6 measured; 0.82 before the fix).
    l_s = forward(variables, normalize_bgr_uint8(jnp.asarray(x1[:n_real])),
                  TINY, use_batch_stats=True)
    l_m = forward(variables, normalize_bgr_uint8(jnp.asarray(x1[:n_real][idx])),
                  TINY, use_batch_stats=True,
                  batch_row_mask=jnp.asarray(mask))
    np.testing.assert_allclose(
        np.asarray(l_m[:n_real]), np.asarray(l_s), atol=1e-4, rtol=0,
    )
    np.testing.assert_allclose(
        float(metrics_m["loss"]), float(metrics_seq["loss"]),
        rtol=1e-5, atol=1e-6,
    )
    # Post-Adam tolerance is looser by necessity, not by semantics: params
    # whose analytic gradient is ZERO (a BN bias feeding another BN is
    # shift-invariant; measured |g| ~1e-7) get noise-direction Adam updates
    # up to ~lr, so float noise in the reduction order moves them ~1e-5.
    # The OLD padded-BN behavior diverged ~1e-1 here — 2 orders above the
    # gate (same rationale as test_multi_step_scan_matches_sequential).
    for name, seq_d, m_d in [
        ("train", state_seq.train_vars, state_m.train_vars),
        ("frozen", state_seq.frozen_vars, state_m.frozen_vars),
    ]:
        for k in seq_d:
            np.testing.assert_allclose(
                np.asarray(m_d[k]), np.asarray(seq_d[k]),
                atol=1e-3, rtol=0, err_msg=f"{name}:{k}",
            )


def test_all_masked_batch_is_a_state_noop(batch):
    """A batch whose row_mask is ALL zeros (every rank's slice unreadable
    under the sharded feed) must leave params, Adam moments, AND BN moving
    stats untouched — the masked CE is zero but the L2 term alone would
    otherwise decay weights and the BN stats would absorb zero-image
    statistics. Only the step clock advances (the LR schedule and the
    outer loop keep their meaning)."""
    hp = TrainHParams(compute_bn_mean_var=True, update_bn_moving=True,
                      l2_coeff=6e-2)
    state = init_train_state(init_variables(jax.random.PRNGKey(3), TINY), hp)
    step = jax.jit(make_train_step(hp, TINY))
    x, y = batch
    before_train = {k: np.asarray(v) for k, v in state.train_vars.items()}
    before_frozen = {k: np.asarray(v) for k, v in state.frozen_vars.items()}
    before_opt = jax.tree_util.tree_map(np.asarray, state.opt_state)
    zero_mask = jnp.zeros((x.shape[0],), jnp.float32)
    state2, metrics = step(state, x, y, jax.random.PRNGKey(0), zero_mask)
    assert int(state2.step) == int(state.step) + 1
    for k, v in state2.train_vars.items():
        np.testing.assert_array_equal(before_train[k], np.asarray(v), err_msg=k)
    for k, v in state2.frozen_vars.items():
        np.testing.assert_array_equal(before_frozen[k], np.asarray(v), err_msg=k)
    jax.tree_util.tree_map(
        np.testing.assert_array_equal, before_opt,
        jax.tree_util.tree_map(np.asarray, state2.opt_state)
    )
    # a HALF-masked batch still trains (the gate is all-or-nothing)
    half = jnp.concatenate([jnp.ones(4), jnp.zeros(4)]).astype(jnp.float32)
    state3, _ = step(state, x, y, jax.random.PRNGKey(0), half)
    changed = any(
        not np.array_equal(before_train[k], np.asarray(v))
        for k, v in state3.train_vars.items()
    )
    assert changed

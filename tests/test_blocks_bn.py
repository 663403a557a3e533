"""Training-mode BN + moving-average fold vs an independent numpy
reference — the tf.layers semantics the curriculum phases depend on
(reference network.py:64-67, :193): normalize with BIASED batch stats,
update moving variance with the Bessel-corrected (unbiased) estimate,
momentum fold new = m*old + (1-m)*batch. Previously pinned only
indirectly (convergence runs, scan-equivalence)."""

import numpy as np
import pytest

import jax.numpy as jnp

from roomnet_tpu.models.roomnet import update_moving_stats
from roomnet_tpu.ops import blocks as B


def _bn(c, rng):
    return {
        "scale": jnp.asarray(rng.uniform(0.5, 2, c).astype(np.float32)),
        "bias": jnp.asarray(rng.uniform(-1, 1, c).astype(np.float32)),
        "mean": jnp.asarray(rng.uniform(-1, 1, c).astype(np.float32)),
        "var": jnp.asarray(rng.uniform(0.5, 2, c).astype(np.float32)),
    }


def test_batch_norm_train_matches_numpy_reference():
    rng = np.random.RandomState(3)
    x = rng.uniform(-3, 3, size=(4, 5, 6, 7)).astype(np.float32)
    bn = _bn(7, rng)
    y, st = B.batch_norm_train(jnp.asarray(x), bn, eps=1e-3)

    mean = x.reshape(-1, 7).mean(0)
    var = x.reshape(-1, 7).var(0)  # biased (numpy default ddof=0)
    want = (x - mean) / np.sqrt(var + 1e-3) * np.asarray(bn["scale"]) \
        + np.asarray(bn["bias"])
    np.testing.assert_allclose(np.asarray(y), want, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(st.mean), mean, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(st.var), var, rtol=1e-4, atol=1e-5)
    # the moving-update estimate is Bessel-corrected (fused-BN quirk)
    n = 4 * 5 * 6
    np.testing.assert_allclose(
        np.asarray(st.var_unbiased), var * n / (n - 1), rtol=1e-4, atol=1e-5
    )


def test_batch_norm_train_dense_rank2():
    """Dense-layer BN: stats over axis 0 only."""
    rng = np.random.RandomState(5)
    x = rng.uniform(-2, 2, size=(9, 4)).astype(np.float32)
    bn = _bn(4, rng)
    y, st = B.batch_norm_train(jnp.asarray(x), bn, eps=1e-3)
    mean, var = x.mean(0), x.var(0)
    want = (x - mean) / np.sqrt(var + 1e-3) * np.asarray(bn["scale"]) \
        + np.asarray(bn["bias"])
    np.testing.assert_allclose(np.asarray(y), want, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(st.var_unbiased), var * 9 / 8, rtol=1e-4, atol=1e-5
    )


def test_dropout_inverted_scaling_semantics():
    """tf.nn.dropout parity: surviving elements scale by 1/(1-rate), the
    rest are exactly zero; survival fraction ≈ 1-rate; deterministic per
    key; rate as a TRACED scalar works (the reference feeds it at
    runtime, network.py:54)."""
    import jax

    rng = np.random.RandomState(11)
    x = rng.uniform(1.0, 2.0, size=(64, 64)).astype(np.float32)
    key = jax.random.PRNGKey(4)
    rate = 0.3
    y = np.asarray(B.dropout(jnp.asarray(x), rate, key))
    kept = y != 0
    np.testing.assert_allclose(y[kept], (x / (1 - rate))[kept], rtol=1e-6)
    assert abs(kept.mean() - (1 - rate)) < 0.03
    # deterministic per key; different key -> different mask
    y2 = np.asarray(B.dropout(jnp.asarray(x), rate, key))
    np.testing.assert_array_equal(y, y2)
    y3 = np.asarray(B.dropout(jnp.asarray(x), rate, jax.random.PRNGKey(5)))
    assert (y != y3).any()
    # traced rate inside jit
    y4 = np.asarray(jax.jit(
        lambda a, r, k: B.dropout(a, r, k)
    )(jnp.asarray(x), jnp.float32(rate), key))
    np.testing.assert_array_equal(y, y4)


def test_update_moving_stats_momentum_fold():
    """new = momentum*old + (1-momentum)*batch, with the UNBIASED variance
    feeding the moving variance (tf.layers/fused-BN update semantics)."""
    import jax

    from roomnet_tpu.models.roomnet import RoomNetConfig, forward, init_variables

    cfg = RoomNetConfig(num_classes=3, im_side=16, block_filters=(4,),
                        block_depths=(1,), block_pools=((3, 1),),
                        dense_units=(8,))
    variables = init_variables(jax.random.PRNGKey(0), cfg)
    x = np.random.RandomState(7).uniform(-1, 1, (5, 16, 16, 3)).astype(np.float32)
    _, stats = forward(variables, jnp.asarray(x), cfg,
                       use_batch_stats=True, collect_batch_stats=True)
    key = "blocks/0/bn/0"
    st = stats[key]
    old = variables["blocks"][0]["bn"][0]
    new = update_moving_stats(variables, stats, momentum=0.9)
    nb = new["blocks"][0]["bn"][0]
    np.testing.assert_allclose(
        np.asarray(nb["mean"]),
        0.9 * np.asarray(old["mean"]) + 0.1 * np.asarray(st.mean),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(nb["var"]),
        0.9 * np.asarray(old["var"]) + 0.1 * np.asarray(st.var_unbiased),
        rtol=1e-5, atol=1e-6,
    )
    # scale/bias untouched by the moving fold
    np.testing.assert_array_equal(np.asarray(nb["scale"]), np.asarray(old["scale"]))


def test_avg_pool_impls_equivalent():
    """The depthwise-conv pool lowering must compute the same average as
    reduce_window (f32: last-ulp scale-before-vs-after-accumulate
    difference only; the A/B harness gates bf16 at the real shapes), for
    every (ksize, stride) the architecture uses, plus a grad check — the
    depthwise path must stay differentiable (it replaces reduce_window in
    small-activation stride-2 sites under pool_impl="auto")."""
    import jax

    rng = np.random.RandomState(0)
    for k, s in ((3, 1), (4, 1), (4, 2)):
        x = jnp.asarray(rng.uniform(-2, 2, (3, 21, 21, 8)).astype(np.float32))
        a = B.avg_pool_valid(x, k, s)
        b = B.avg_pool_valid(x, k, s, impl="depthwise")
        assert a.shape == b.shape
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-6, rtol=0
        )
        ga = jax.grad(lambda x: jnp.sum(B.avg_pool_valid(x, k, s) ** 2))(x)
        gb = jax.grad(
            lambda x: jnp.sum(B.avg_pool_valid(x, k, s, impl="depthwise") ** 2)
        )(x)
        np.testing.assert_allclose(
            np.asarray(ga), np.asarray(gb), atol=2e-6, rtol=0
        )


def test_resolve_pool_impl_per_site():
    """'auto' must reproduce the measured per-site winners at the 224
    geometry: B3 depth-0 (203² input, s2) stays reduce_window, B3 depth-1
    (98², s2) goes depthwise, B5's small s2 sites go depthwise, and every
    stride-1 site stays reduce_window; explicit impls pass through."""
    from roomnet_tpu.models.roomnet import resolve_pool_impl

    assert resolve_pool_impl("auto", 203, 2) == "reduce_window"
    assert resolve_pool_impl("auto", 98, 2) == "depthwise"
    assert resolve_pool_impl("auto", 44, 2) == "depthwise"
    assert resolve_pool_impl("auto", 222, 1) == "reduce_window"
    assert resolve_pool_impl("auto", 100, 1) == "reduce_window"
    assert resolve_pool_impl("reduce_window", 98, 2) == "reduce_window"
    assert resolve_pool_impl("depthwise", 203, 2) == "depthwise"


def test_forward_pool_impl_auto_matches_reduce_window():
    """pool_impl='auto' (small stride-2 sites -> depthwise) must not move
    the forward beyond float noise on the tiny config (whose 4/s2 pool
    sits below the 128-side threshold, so auto really swaps it)."""
    import dataclasses

    import jax

    from roomnet_tpu.models.roomnet import forward, init_variables
    from tests.tiny import TINY

    v = init_variables(jax.random.PRNGKey(0), TINY)
    x = jnp.asarray(
        np.random.RandomState(1).randint(0, 256, (4, 32, 32, 3), np.uint8)
    )
    base = forward(v, x, TINY)
    auto = forward(v, x, dataclasses.replace(TINY, pool_impl="auto"))
    np.testing.assert_allclose(
        np.asarray(auto), np.asarray(base), atol=1e-5, rtol=0
    )


def test_avg_pool_unknown_impl_raises():
    """A typo'd (or unresolved 'auto') impl must raise, not silently run
    reduce_window while the caller believes it measured/served the other
    lowering (round-5 review finding)."""
    x = jnp.ones((1, 8, 8, 4), jnp.float32)
    for bad in ("auto", "depthwize", ""):
        with pytest.raises(ValueError):
            B.avg_pool_valid(x, 4, 2, impl=bad)

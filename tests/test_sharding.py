"""Multi-chip paths on the 8-device virtual CPU mesh: DP + TP parity.

The sharded step must produce the same numbers as the single-device step
(same math, different placement) — this is the correctness contract for the
mesh layer (SURVEY.md §2.4 TPU-native plan).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from roomnet_tpu.models.roomnet import forward, init_variables, normalize_bgr_uint8
from roomnet_tpu.parallel.mesh import batch_sharding, make_mesh, variables_shardings
from roomnet_tpu.params import schema
from roomnet_tpu.train.step import TrainHParams, init_train_state, make_train_step
from tests.tiny import TINY


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(4, 2)


@pytest.fixture(scope="module")
def batch():
    rng = np.random.RandomState(0)
    return (
        rng.randint(0, 256, size=(8, 32, 32, 3), dtype=np.uint8),
        rng.randint(0, TINY.num_classes, size=(8,), dtype=np.int32),
    )


def test_mesh_shape():
    mesh = make_mesh(4, 2)
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("data", "model")


def test_dp_forward_matches_single_device(mesh8, batch):
    variables = init_variables(jax.random.PRNGKey(0), TINY)
    x, _ = batch
    single = np.asarray(forward(variables, normalize_bgr_uint8(jnp.asarray(x)), TINY))

    data = batch_sharding(mesh8)
    repl = NamedSharding(mesh8, P())
    flat = {k: jax.device_put(v, repl) for k, v in schema.flatten_jax(variables).items()}
    xd = jax.device_put(x, data)

    @jax.jit
    def fwd(flat, x):
        v = schema.unflatten_jax(flat, TINY)
        return forward(v, normalize_bgr_uint8(x), TINY)

    sharded = np.asarray(fwd(flat, xd))
    np.testing.assert_allclose(single, sharded, rtol=1e-5, atol=1e-5)


def test_dp_tp_train_step_matches_single_device(mesh8, batch):
    """One full train step: sharded (DP x TP) == unsharded, to fp tolerance."""
    hp = TrainHParams(learn_rate=1e-3, compute_bn_mean_var=False)
    x, y = batch
    rng = jax.random.PRNGKey(0)

    def run(sharded: bool):
        variables = init_variables(jax.random.PRNGKey(0), TINY)
        state = init_train_state(variables, hp)
        step = make_train_step(hp, TINY)
        if not sharded:
            new_state, metrics = jax.jit(step)(state, jnp.asarray(x), jnp.asarray(y), rng)
            return new_state, metrics
        data = batch_sharding(mesh8)
        repl = NamedSharding(mesh8, P())
        tp = variables_shardings(state.train_vars.keys(), mesh8, tensor_parallel=True)
        state = state._replace(
            train_vars={k: jax.device_put(v, tp[k]) for k, v in state.train_vars.items()},
            frozen_vars={k: jax.device_put(v, repl) for k, v in state.frozen_vars.items()},
            opt_state=jax.tree_util.tree_map(
                lambda v: jax.device_put(v, repl), state.opt_state
            ),
        )
        xd = jax.device_put(x, data)
        yd = jax.device_put(y, data)
        new_state, metrics = jax.jit(step)(state, xd, yd, rng)
        return new_state, metrics

    s1, m1 = run(False)
    s2, m2 = run(True)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    for k in s1.train_vars:
        np.testing.assert_allclose(
            np.asarray(s1.train_vars[k]),
            np.asarray(s2.train_vars[k]),
            rtol=1e-4,
            atol=1e-6,
            err_msg=k,
        )


def test_tp_shardings_cover_dense_kernels(mesh8):
    variables = init_variables(jax.random.PRNGKey(0), TINY)
    flat = schema.flatten_jax(variables)
    sh = variables_shardings(flat.keys(), mesh8, tensor_parallel=True)
    assert sh["dense/0/kernel"].spec == P(None, "model")
    assert sh["blocks/0/conv/0"].spec == P()


def test_data_only_mesh_without_model_axis():
    """Odd device counts fall back to pure DP (model axis size 1)."""
    mesh = make_mesh(8, 1)
    assert mesh.devices.shape == (8, 1)


def test_dp_batch_stats_bn_is_global(mesh8, batch):
    """With use_batch_stats=True under DP sharding, BN statistics are
    computed over the GLOBAL batch (XLA inserts the cross-device reduction)
    — matching the reference's single-device whole-batch semantics, i.e.
    free synchronized BN."""
    variables = init_variables(jax.random.PRNGKey(0), TINY)
    x, _ = batch

    single = np.asarray(
        forward(variables, normalize_bgr_uint8(jnp.asarray(x)), TINY, use_batch_stats=True)
    )

    data = batch_sharding(mesh8)
    repl = NamedSharding(mesh8, P())
    flat = {k: jax.device_put(v, repl) for k, v in schema.flatten_jax(variables).items()}
    xd = jax.device_put(x, data)

    @jax.jit
    def fwd(flat, x):
        v = schema.unflatten_jax(flat, TINY)
        return forward(v, normalize_bgr_uint8(x), TINY, use_batch_stats=True)

    sharded = np.asarray(fwd(flat, xd))
    np.testing.assert_allclose(single, sharded, rtol=1e-4, atol=1e-5)

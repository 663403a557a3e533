"""Training-trajectory golden parity: K optimizer steps vs TF1's own loop.

The fixture (tools/make_golden.py:make_traj_golden) runs 6 updates of
tf.train.AdamOptimizer (TF1 Adam: eps outside the bias correction) on the
reference loss graph (network.py:56-69) with the continuously-decayed LR
``exponential_decay(2e-4, step, 50, 0.068)``, and records the per-step
pre-update losses plus the final trainable values, in both BN modes at
the tests/tiny.py geometry (small reductions => f32 noise can't mask a
semantic slip).

Where test_grad_golden pins one backward pass, this pins the COMPOSED
update loop: gradient -> Adam moment accumulation & bias correction ->
LR-schedule clock (off-by-one in the step fed to the schedule moves the
applied lr ~5%/step here and fails the loss track) -> parameter
application. Both our sequential step (make_train_step) and the scanned
multi-step (make_multi_train_step) must land on TF's trajectory.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from tiny import TINY  # noqa: E402

from roomnet_tpu.params import schema  # noqa: E402
from roomnet_tpu.train.step import (  # noqa: E402
    TrainHParams,
    init_train_state,
    make_multi_train_step,
    make_train_step,
)

FIXTURE = os.path.join(os.path.dirname(__file__), "golden", "traj_golden.npz")

# Measured max|Δ| (CPU f32): losses ≤4.8e-5, final params ≤5.1e-7 over a
# ~1.1e-3 total drift — gate with ~10-200x headroom for TPU rounding.
LOSS_ATOL = 5e-4
PARAM_ATOL = 1e-4


@pytest.fixture(scope="module")
def traj_golden():
    if not os.path.exists(FIXTURE):
        pytest.skip("traj golden fixture missing (tools/make_golden.py --traj-only)")
    return dict(np.load(FIXTURE))


def _setup(traj_golden, mode):
    flat = {
        k[len("traj_param/") :]: v
        for k, v in traj_golden.items()
        if k.startswith("traj_param/")
    }
    hp = TrainHParams(
        learn_rate=float(traj_golden["lr0"]),
        num_steps=int(traj_golden["sched_steps"]),
        l2_coeff=float(traj_golden["l2_coeff"]),
        compute_bn_mean_var=(mode == "trainbn"),
    )
    state = init_train_state(schema.unflatten_variables(flat, TINY), hp)
    return state, hp


def _check_final(state, traj_golden, mode):
    bad = {}
    for path, v in state.train_vars.items():
        ref = traj_golden[f"final_{mode}/{path}"]
        delta = float(np.abs(np.asarray(v) - ref).max())
        if delta > PARAM_ATOL:
            bad[path] = delta
    assert not bad, f"final params diverge from TF trajectory [{mode}]: {bad}"


@pytest.mark.parametrize("mode", ["infbn", "trainbn"])
def test_sequential_steps_track_tf(mode, traj_golden):
    state, hp = _setup(traj_golden, mode)
    step_fn = jax.jit(make_train_step(hp, TINY))
    x = jnp.asarray(traj_golden["x_uint8_bgr"])
    y = jnp.asarray(traj_golden["labels"])
    losses = []
    for k in range(int(traj_golden["steps"])):
        state, metrics = step_fn(state, x, y, jax.random.PRNGKey(k))
        losses.append(float(metrics["loss"]))
    np.testing.assert_allclose(
        losses, traj_golden[f"losses_{mode}"], atol=LOSS_ATOL, rtol=0
    )
    _check_final(state, traj_golden, mode)


@pytest.mark.parametrize("mode", ["infbn", "trainbn"])
def test_scanned_multi_step_tracks_tf(mode, traj_golden):
    """K steps in ONE lax.scan dispatch land on the same TF trajectory."""
    state, hp = _setup(traj_golden, mode)
    multi_fn = jax.jit(make_multi_train_step(hp, TINY))
    k = int(traj_golden["steps"])
    x_k = jnp.broadcast_to(
        jnp.asarray(traj_golden["x_uint8_bgr"]),
        (k,) + traj_golden["x_uint8_bgr"].shape,
    )
    y_k = jnp.broadcast_to(jnp.asarray(traj_golden["labels"]), (k, 4))
    state, metrics = multi_fn(state, x_k, y_k, jax.random.PRNGKey(0))
    np.testing.assert_allclose(
        float(metrics["loss"]),
        traj_golden[f"losses_{mode}"][-1],
        atol=LOSS_ATOL,
        rtol=0,
    )
    _check_final(state, traj_golden, mode)

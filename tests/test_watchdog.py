"""Failure-detection watchdog + optimizer-state resume continuity."""

import time

import numpy as np

from roomnet_tpu.utils.watchdog import StepWatchdog


def test_watchdog_fires_on_stall_and_recovers():
    fired = []
    wd = StepWatchdog(timeout_s=0.3, on_stall=fired.append, check_interval_s=0.05)
    with wd:
        wd.beat(1)
        time.sleep(1.0)  # stall
        assert wd.stall_count >= 1
        n = wd.stall_count
        wd.beat(2)  # heartbeat resumes
        time.sleep(0.15)
        assert wd.stall_count == n  # no new stall while beating
    assert fired and fired[0]["last_step"] == 1


def test_watchdog_quiet_when_beating():
    wd = StepWatchdog(timeout_s=2.0, check_interval_s=0.05)
    with wd:
        for i in range(6):
            wd.beat(i)
            time.sleep(0.05)
    assert wd.stall_count == 0


def test_watchdog_pause_suppresses_stalls():
    """Known-long silent operations (first XLA compile of a phase, a full
    validation epoch) pause the watchdog; silence inside the window is not
    a stall, and detection re-arms on resume."""
    fired = []
    wd = StepWatchdog(timeout_s=0.3, on_stall=fired.append, check_interval_s=0.05)
    with wd:
        wd.pause()
        time.sleep(0.8)  # would be 2+ stalls if armed
        assert wd.stall_count == 0
        wd.resume()
        time.sleep(0.15)
        assert wd.stall_count == 0  # resume() beats — fresh window
        time.sleep(0.6)  # genuine post-resume stall
        assert wd.stall_count >= 1
    assert fired


def test_optimizer_state_continuity_across_resume(tmp_path):
    """Resume restores Adam m/v and count so the update sequence continues
    exactly as if never interrupted."""
    import dataclasses

    import jax

    from roomnet_tpu.models.roomnet import init_variables
    from roomnet_tpu.params.checkpoint import CheckpointStore
    from roomnet_tpu.train.optimizer import flatten_opt_state, unflatten_opt_state
    from roomnet_tpu.train.step import TrainHParams, init_train_state, make_train_step
    from tests.tiny import TINY

    cfg = dataclasses.replace(TINY, num_classes=2)
    hp = TrainHParams(learn_rate=1e-3, l2_coeff=0.0)
    rng = np.random.RandomState(0)
    x = rng.randint(0, 256, (4, cfg.im_side, cfg.im_side, 3), np.uint8)
    y = rng.randint(0, 2, (4,)).astype(np.int32)
    key = jax.random.PRNGKey(0)
    step = jax.jit(make_train_step(hp, cfg))

    # uninterrupted: 4 steps
    s = init_train_state(init_variables(jax.random.PRNGKey(0), cfg), hp)
    for _ in range(4):
        s, _ = step(s, x, y, key)
    want = jax.device_get(s.train_vars)

    # interrupted: 2 steps, checkpoint, restore, 2 more
    s2 = init_train_state(init_variables(jax.random.PRNGKey(0), cfg), hp)
    for _ in range(2):
        s2, _ = step(s2, x, y, key)
    store = CheckpointStore(str(tmp_path))
    from roomnet_tpu.params import schema

    variables = schema.unflatten_jax(
        {**jax.device_get(s2.train_vars), **jax.device_get(s2.frozen_vars)}, cfg
    )
    store.save(variables, 2, opt_state_flat=flatten_opt_state(s2.opt_state))

    var_flat, loaded_step, opt_flat = store.load(cfg=cfg, with_opt_state=True)
    s3 = init_train_state(schema.unflatten_variables(var_flat, cfg), hp)
    s3 = s3._replace(opt_state=unflatten_opt_state(opt_flat))
    for _ in range(2):
        s3, _ = step(s3, x, y, key)
    got = jax.device_get(s3.train_vars)
    for k in want:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]), rtol=1e-6, atol=1e-7, err_msg=k
        )

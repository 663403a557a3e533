"""Multi-process jax.distributed tests: two CPU processes, one global mesh.

Validates parallel/distributed.py beyond the single-host no-op:
  * both processes see the union of devices (the precondition for
    DCN-spanning meshes on pods/multi-slice; SURVEY.md §5);
  * a REAL data-parallel train step whose gradient all-reduce crosses the
    process boundary (gloo CPU collectives) matches the single-device step;
  * a multi-host Orbax checkpoint written collectively by both processes
    restores bit-exact in a different (single-process) topology.
"""

import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest


def test_initialize_noop_without_env(monkeypatch):
    from roomnet_tpu.parallel import distributed

    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("MEGASCALE_COORDINATOR_ADDRESS", raising=False)
    assert distributed.initialize() is False


@pytest.mark.parametrize("n_proc", [2])
def test_two_process_global_devices(n_proc, tmp_path):
    code = textwrap.dedent(
        """
        import sys
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 2)
        from roomnet_tpu.parallel import distributed
        ok = distributed.initialize(
            coordinator_address="127.0.0.1:39123",
            num_processes=%d,
            process_id=int(sys.argv[1]),
        )
        assert ok
        assert len(jax.devices()) == 2 * %d, len(jax.devices())
        assert len(jax.local_devices()) == 2
        print("OK", sys.argv[1])
        """
        % (n_proc, n_proc)
    )
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", code, str(i)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            cwd="/root/repo",
        )
        for i in range(n_proc)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=180)
        outs.append((p.returncode, out))
    for rc, out in outs:
        assert rc == 0, out[-2000:]
        assert "OK" in out


_DP_WORKER = textwrap.dedent(
    """
    import sys

    import numpy as np
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    from roomnet_tpu.parallel import distributed

    pid = int(sys.argv[1])
    ckpt_dir = sys.argv[2]
    expected_npz = sys.argv[3]
    assert distributed.initialize("127.0.0.1:39271", 2, pid)

    from jax.sharding import NamedSharding, PartitionSpec as P

    from roomnet_tpu.models.roomnet import init_variables
    from roomnet_tpu.params import schema
    from roomnet_tpu.params.orbax_io import OrbaxCheckpointStore
    from roomnet_tpu.train.optimizer import flatten_opt_state
    from roomnet_tpu.train.step import TrainHParams, init_train_state, make_train_step
    from tests.tiny import TINY

    hp = TrainHParams(learn_rate=1e-3, num_steps=1000, l2_coeff=1e-4)
    variables = init_variables(jax.random.PRNGKey(0), TINY)
    rng = np.random.RandomState(0)
    B = 8
    x = rng.randint(0, 255, (B, TINY.im_side, TINY.im_side, 3)).astype(np.uint8)
    y = rng.randint(0, TINY.num_classes, (B,)).astype(np.int32)
    key = jax.random.PRNGKey(42)

    # Expected: the same step on ONE local device (no mesh, no collectives).
    step = make_train_step(hp, TINY)
    state_l, metrics_l = jax.jit(step)(init_train_state(variables, hp), x, y, key)
    loss_local = float(metrics_l["loss"])

    # Global: 2 procs x 2 devices, batch sharded 4-way over 'data' — the
    # gradient all-reduce must cross the process boundary.
    mesh = distributed.global_mesh()
    assert mesh.devices.size == 4, mesh
    data = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    def globalize(arr, sh):
        arr = np.asarray(arr)
        return jax.make_array_from_callback(arr.shape, sh, lambda idx: arr[idx])

    gstate = jax.tree_util.tree_map(lambda a: globalize(a, repl),
                                    init_train_state(variables, hp))
    gstate, gmetrics = jax.jit(step)(gstate, globalize(x, data),
                                     globalize(y, data), globalize(key, repl))
    loss_dp = float(gmetrics["loss"])
    assert abs(loss_dp - loss_local) < 1e-4 * max(1.0, abs(loss_local)), (
        loss_dp, loss_local)
    for k in ("blocks/0/conv/0", "dense/0/kernel"):
        np.testing.assert_allclose(
            np.asarray(gstate.train_vars[k]), np.asarray(state_l.train_vars[k]),
            rtol=1e-5, atol=1e-6, err_msg=k)
    print("DPSTEP OK", pid, loss_dp)

    # Multi-host checkpoint: both processes save collectively (each writes
    # its addressable shards) into one Orbax step dir.
    store = OrbaxCheckpointStore(ckpt_dir, async_save=False)
    store.save(gstate.variables(TINY), 1, suffix="dp",
               opt_state_flat=flatten_opt_state(gstate.opt_state))
    if pid == 0:
        np.savez(expected_npz,
                 **{k: np.asarray(v)
                    for k, v in schema.flatten_jax(gstate.variables(TINY)).items()})
    print("SAVE OK", pid)
    """
)


_TRAINER_WORKER = textwrap.dedent(
    """
    import sys

    import numpy as np
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    from roomnet_tpu.parallel import distributed

    pid = int(sys.argv[1])
    workdir = sys.argv[2]
    assert distributed.initialize("127.0.0.1:39277", 2, pid)

    import dataclasses
    import os

    from roomnet_tpu.train.loop import Phase, TrainConfig, Trainer
    from tests.tiny import TINY

    # The feeder is bit-deterministic per seed, so every process builds
    # the IDENTICAL global batch and device_put takes its local shards —
    # multi-host feeding without any coordination.
    cfg = dataclasses.replace(TINY, num_classes=2)
    tc = TrainConfig(
        data_dir=os.path.join(workdir, "data"),
        train_list_fpath=os.path.join(workdir, "train_list.txt"),
        val_list_fpath=os.path.join(workdir, "val_list.txt"),
        stats_fpath=os.path.join(workdir, "stats.json"),
        model_dir=os.path.join(workdir, "models"),
        img_side=TINY.im_side, train_steps=1000, save_freq=3,
        val_batch_size=4, learn_rate=1e-3, l2_coeff=1e-4, seed=0,
        phases=(Phase(until_step=1 << 62, batch_size=6),),  # rounds to 8
        stall_timeout_s=0,
    )
    mesh = distributed.global_mesh()
    assert mesh.devices.size == 4
    state = Trainer(tc, cfg, mesh=mesh).train(total_steps=5, log_every=1)
    print("TRAINER OK", pid, int(state.step),
          float(np.asarray(state.train_vars["dense/0/kernel"]).sum()))
    """
)


_SHARDED_FEED_WORKER = textwrap.dedent(
    """
    import sys

    import numpy as np
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    from roomnet_tpu.parallel import distributed

    pid = int(sys.argv[1])
    workdir = sys.argv[2]
    assert distributed.initialize("127.0.0.1:39281", 2, pid)

    import dataclasses
    import os

    from roomnet_tpu.train.loop import Phase, TrainConfig, Trainer
    from tests.tiny import TINY

    cfg = dataclasses.replace(TINY, num_classes=2)

    def tc_for(mode):
        return TrainConfig(
            data_dir=os.path.join(workdir, "data"),
            train_list_fpath=os.path.join(workdir, "train_list.txt"),
            val_list_fpath=os.path.join(workdir, "val_list.txt"),
            stats_fpath=os.path.join(workdir, f"stats_{mode}.json"),
            model_dir=os.path.join(workdir, f"models_{mode}"),
            img_side=TINY.im_side, train_steps=1000, save_freq=1000,
            val_batch_size=4, learn_rate=1e-3, l2_coeff=1e-4, seed=0,
            phases=(Phase(until_step=1 << 62, batch_size=8),),
            stall_timeout_s=0, feed_mode=mode,
        )

    mesh = distributed.global_mesh()
    assert mesh.devices.size == 4

    # Sharded: THIS process decodes only rows [pid*4, pid*4+4) of every
    # batch. Replicated: both decode all 8 rows. Same seed, same epoch
    # order, same per-row augments -> the two runs see the same sample
    # set per step (sharded row ORDER within the global batch may differ,
    # which the mean-reduced loss/grads don't care about).
    state_sh = Trainer(tc_for("sharded"), cfg, mesh=mesh).train(
        total_steps=4, log_every=100)
    state_rep = Trainer(tc_for("replicated"), cfg, mesh=mesh).train(
        total_steps=4, log_every=100)
    for k in state_sh.train_vars:
        np.testing.assert_allclose(
            np.asarray(state_sh.train_vars[k]),
            np.asarray(state_rep.train_vars[k]),
            rtol=1e-5, atol=1e-6, err_msg=k,
        )
    print("SHARDEDFEED OK", pid,
          float(np.asarray(state_sh.train_vars["dense/0/kernel"]).sum()))
    """
)


def test_cross_process_sharded_feed_matches_replicated(tmp_path):
    """feed_mode="sharded" over 2 processes x 2 devices: each rank decodes
    only its 4-row slice, the global batch assembles from per-process
    local data, and 4 training steps match the replicated-feed run
    (same samples; mean-reduced loss is row-order invariant). Ranks also
    end bit-identical to each other."""
    import cv2  # noqa: F401

    rng = np.random.RandomState(0)
    d = tmp_path / "data"
    for cls, base in [("Kitchen", 40), ("Bedroom", 200)]:
        (d / cls).mkdir(parents=True)
        for i in range(10):
            im = np.clip(rng.randint(base - 30, base + 30, (40, 48, 3)), 0, 255)
            cv2.imwrite(str(d / cls / f"im_{i}.png"), im.astype(np.uint8))

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _SHARDED_FEED_WORKER, str(i), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd="/root/repo",
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append((p.returncode, out))
    sums = []
    for rc, out in outs:
        assert rc == 0, out[-3000:]
        line = [l for l in out.splitlines() if l.startswith("SHARDEDFEED OK")][0]
        sums.append(float(line.split()[3]))
    assert sums[0] == sums[1], sums


def test_cross_process_trainer_end_to_end(tmp_path):
    """The full Trainer over 2 processes x 2 devices: deterministic feeders
    build identical global batches, grads all-reduce across the process
    boundary, rank 0 alone writes npz checkpoints + stats, both ranks end
    with identical replicated params."""
    import cv2  # noqa: F401  (dataset generation below)

    rng = np.random.RandomState(0)
    d = tmp_path / "data"
    for cls, base in [("Kitchen", 40), ("Bedroom", 200)]:
        (d / cls).mkdir(parents=True)
        for i in range(10):
            im = np.clip(rng.randint(base - 30, base + 30, (40, 48, 3)), 0, 255)
            cv2.imwrite(str(d / cls / f"im_{i}.png"), im.astype(np.uint8))

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _TRAINER_WORKER, str(i), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd="/root/repo",
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append((p.returncode, out))
    sums = []
    for rc, out in outs:
        assert rc == 0, out[-3000:]
        line = [l for l in out.splitlines() if l.startswith("TRAINER OK")][0]
        _, _, pid, step, ksum = line.split()
        assert step == "5"
        sums.append(float(ksum))
    assert sums[0] == sums[1], sums  # replicated params identical across ranks
    # rank 0 alone wrote checkpoints + stats; no tmp leftovers or dupes
    ckpts = os.listdir(tmp_path / "models")
    assert ckpts and all(".tmp" not in c for c in ckpts)
    assert (tmp_path / "stats.json").exists()


def test_cross_process_dp_step_and_multihost_checkpoint(tmp_path):
    ckpt_dir = str(tmp_path / "orbax_multihost")
    expected_npz = str(tmp_path / "expected.npz")
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _DP_WORKER, str(i), ckpt_dir, expected_npz],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            cwd="/root/repo",
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append((p.returncode, out))
    for rc, out in outs:
        assert rc == 0, out[-3000:]
        assert "DPSTEP OK" in out and "SAVE OK" in out

    # Restore in a DIFFERENT topology: this (single-process, 8-device CPU)
    # pytest process reads the checkpoint both workers wrote.
    from roomnet_tpu.params.orbax_io import OrbaxCheckpointStore
    from tests.tiny import TINY

    restored = OrbaxCheckpointStore(ckpt_dir).load(cfg=TINY, with_opt_state=True)
    assert restored is not None
    var_flat, step, opt_flat = restored
    assert step == 1
    expected = dict(np.load(expected_npz))
    assert set(var_flat) == set(expected)
    for k, v in expected.items():
        np.testing.assert_array_equal(np.asarray(var_flat[k]), v, err_msg=k)
    assert opt_flat and int(opt_flat["count"]) == 1

"""Multi-process jax.distributed smoke: two CPU processes, one global mesh.

Validates parallel/distributed.py beyond the single-host no-op: both
processes see the union of devices (the precondition for DCN-spanning
meshes on pods/multi-slice; SURVEY.md §5 distributed-backend row).
"""

import subprocess
import sys
import textwrap

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

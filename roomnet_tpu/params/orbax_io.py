"""Orbax checkpoint backend — async, sharding-aware alternative to the npz
store, with the same reference Saver semantics (keep-all, acc+step names,
resume-latest; network.py:77-126).

Use this backend for large-scale / multi-host training: Orbax writes
per-shard OCDBT stores from device buffers (no host gather), checkpoints
asynchronously (training continues during the write), and restores with
the target sharding. The npz store (checkpoint.py) stays the default for
single-chip runs and tooling interop.
"""

from __future__ import annotations

import os
import re
from glob import glob
from typing import Any

import jax
import numpy as np

from roomnet_tpu.models.roomnet import DEFAULT_CONFIG, RoomNetConfig
from roomnet_tpu.params import schema
from roomnet_tpu.params.checkpoint import CheckpointStore as _NpzStore

CKPT_DIR_RE = re.compile(r"roomnet--(?P<suffix>.*?)--(?P<step>\d+)$")


class OrbaxCheckpointStore:
    """Same surface as CheckpointStore, backed by orbax PyTreeCheckpointer."""

    def __init__(self, model_dir: str = "all_trained_models/trained_models_orbax",
                 *, async_save: bool = True):
        import orbax.checkpoint as ocp

        self.model_dir = os.path.abspath(model_dir)
        os.makedirs(self.model_dir, exist_ok=True)
        if async_save:
            self._ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
        else:
            self._ckptr = ocp.PyTreeCheckpointer()

    def _path(self, step: int, suffix: str | None) -> str:
        sfx = suffix if suffix is not None else "none"
        return os.path.join(self.model_dir, f"roomnet--{sfx}--{step}")

    def save(self, variables: Any, step: int, *, suffix: str | None = None,
             opt_state_flat: dict | None = None) -> str:
        tree = {"variables": schema.flatten_jax(variables), "step": step}
        if opt_state_flat:
            tree["opt"] = dict(opt_state_flat)
        path = self._path(step, suffix)
        self._ckptr.save(path, tree, force=True)
        return path

    def wait(self):
        """Block until any in-flight async save lands."""
        if hasattr(self._ckptr, "wait_until_finished"):
            self._ckptr.wait_until_finished()

    def list_checkpoints(self) -> list[tuple[int, str, str]]:
        """Every checkpoint dir as (step, suffix, path), step-sorted —
        CheckpointStore.list_checkpoints parity for the orbax backend."""
        out = []
        for p in glob(os.path.join(self.model_dir, "roomnet--*--*")):
            m = CKPT_DIR_RE.search(os.path.basename(p))
            if m and os.path.isdir(p):
                out.append((int(m.group("step")), m.group("suffix"), p))
        out.sort(key=lambda t: (t[0], t[2]))
        return out

    # Same opt-in retention as CheckpointStore.prune — the logic is shared
    # wholesale (both stores expose step-sorted list_checkpoints); only
    # _delete differs, because a checkpoint here is a DIRECTORY tree.
    prune = _NpzStore.prune

    @staticmethod
    def _delete(path: str):
        import shutil

        shutil.rmtree(path)

    def latest_path(self) -> str | None:
        best, best_step = None, -1
        for p in glob(os.path.join(self.model_dir, "roomnet--*--*")):
            m = CKPT_DIR_RE.search(os.path.basename(p))
            if m and int(m.group("step")) > best_step:
                best, best_step = p, int(m.group("step"))
        return best

    def load(self, path: str | None = None, *, cfg: RoomNetConfig = DEFAULT_CONFIG,
             restore_head: bool = True, with_opt_state: bool = False):
        import orbax.checkpoint as ocp

        if path is None:
            path = self.latest_path()
            if path is None:
                return None
        restorer = ocp.PyTreeCheckpointer()
        # Restore every leaf as host numpy: topology-free, so a checkpoint
        # written collectively by N processes (sharded device buffers)
        # restores on any other topology — single host included. Without
        # explicit RestoreArgs orbax tries to rebuild the saved shardings,
        # which fails (or is unsafe) off the original topology.
        meta = restorer.metadata(path).item_metadata.tree
        restore_args = jax.tree_util.tree_map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta
        )
        tree = restorer.restore(path, restore_args=restore_args)
        var_flat = {k: np.asarray(v) for k, v in tree["variables"].items()}
        step = int(tree["step"])
        opt_flat = {k: np.asarray(v) for k, v in tree.get("opt", {}).items()}
        if not restore_head:
            var_flat = {k: v for k, v in var_flat.items() if not k.startswith("dense/")}
            opt_flat = {}
        if with_opt_state:
            return var_flat, step, opt_flat
        return var_flat, step

"""Checkpoint manager with the reference's Saver semantics, natively.

Reference behaviors preserved (network.py:77-126):
  * keep-all: every save is retained (`max_to_keep=0`, network.py:80);
  * names carry validation accuracy + step: ``roomnet--{acc}--{step}``
    (network.py:98-102);
  * resume-latest: load() with no path picks the max step by parsing
    filenames (network.py:110-118);
  * partial restore: training-mode restore can exclude the dense head so a
    changed `flat_len` re-initializes the head (network.py:78, :242) —
    here a `restore_head=False` flag;
  * optimized-inference save strips optimizer state (network.py:94-97).

Format: flat {path: ndarray} npz (schema.py) + json manifest; optimizer
state (Adam m/v + step) rides in the same npz under ``opt/``-prefixed keys.
"""

from __future__ import annotations

import json
import os
import re
from glob import glob
from typing import Any

import jax
import numpy as np

from roomnet_tpu.models.roomnet import DEFAULT_CONFIG, RoomNetConfig
from roomnet_tpu.params import schema

CKPT_RE = re.compile(r"roomnet--(?P<suffix>.*?)--(?P<step>\d+)\.npz$")


class CheckpointStore:
    def __init__(self, model_dir: str = "all_trained_models/trained_models"):
        self.model_dir = model_dir
        os.makedirs(model_dir, exist_ok=True)
        # Sweep crash leftovers from interrupted atomic saves (resume
        # already ignores them — CKPT_RE wants digits right before .npz —
        # but they would otherwise accumulate forever). Age-gated: a second
        # process constructing a store on a LIVE training dir (serve/label/
        # validate --model-dir while training runs) must not delete the
        # trainer's in-flight tmp file out from under its os.replace.
        import time as _time

        cutoff = _time.time() - 3600.0
        for p in glob(os.path.join(model_dir, "*.tmp.npz")):
            try:
                if os.path.getmtime(p) < cutoff:
                    os.unlink(p)
            except OSError:
                pass

    def _path(self, step: int, suffix: str | None) -> str:
        sfx = suffix if suffix is not None else "none"
        return os.path.join(self.model_dir, f"roomnet--{sfx}--{step}.npz")

    def save(
        self,
        variables: Any,
        step: int,
        *,
        suffix: str | None = None,
        opt_state_flat: dict[str, np.ndarray] | None = None,
    ) -> str:
        """Save variables (+ optional optimizer state). Keep-all semantics."""
        flat = schema.flatten_variables(jax.device_get(variables))
        if opt_state_flat:
            for k, v in opt_state_flat.items():
                flat[f"opt/{k}"] = np.asarray(v)
        flat["meta/step"] = np.asarray(step, dtype=np.int64)
        path = self._path(step, suffix)
        # Atomic write: resume-latest picks the max-step FILE, so a crash or
        # interrupt (incl. the stall_abort escalation) mid-savez must never
        # leave a truncated max-step checkpoint that bricks every resume.
        # Temp name must keep the .npz extension: np.savez appends one to
        # names without it, which would break the rename below.
        tmp = path[: -len(".npz")] + ".tmp.npz"
        np.savez(tmp, **flat)
        os.replace(tmp, path)
        return path

    def list_checkpoints(self) -> list[tuple[int, str, str]]:
        """Every checkpoint in the dir as (step, suffix, path), step-sorted.

        Suffix is whatever sits between the dashes — the accuracy string
        for regular saves (network.py:98-102 naming), or markers like
        'interrupt'/'stall'/'none'. Keep-all semantics mean this is the
        full training history."""
        out = []
        for p in glob(os.path.join(self.model_dir, "roomnet--*--*.npz")):
            m = CKPT_RE.search(os.path.basename(p))
            if m:
                out.append((int(m.group("step")), m.group("suffix"), p))
        out.sort(key=lambda t: (t[0], t[2]))
        return out

    def prune(self, keep_last: int, *, keep_best: bool = True) -> list[str]:
        """OPT-IN retention: delete all but the newest `keep_last` REGULAR
        checkpoints. Keep-all stays the default everywhere (the reference
        contract, network.py:80) — this runs only when a caller passes
        `TrainConfig.keep_checkpoints`. Never deleted: marker checkpoints
        (non-numeric suffix — interrupt/stall/none) and, with keep_best,
        the max-accuracy save (model selection must survive retention).
        Returns the deleted paths."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        regular = []
        for step, suffix, path in self.list_checkpoints():  # step-sorted
            try:
                acc = float(suffix)
            except ValueError:
                continue  # markers are never pruned
            regular.append((step, acc, path))
        keep = {p for _, _, p in regular[-keep_last:]}
        if keep_best and regular:
            keep.add(max(regular, key=lambda t: (t[1], t[0]))[2])
        deleted = []
        for _, _, p in regular:
            if p in keep:
                continue
            try:
                self._delete(p)
                deleted.append(p)
            except OSError:
                pass  # a racing reader holding the file open is fine
        return deleted

    @staticmethod
    def _delete(path: str):
        os.remove(path)

    def latest_path(self) -> str | None:
        """Max-step checkpoint in the dir, parsed from filenames (network.py:110-118)."""
        paths = glob(os.path.join(self.model_dir, "roomnet--*--*.npz"))
        best, best_step = None, -1
        for p in paths:
            m = CKPT_RE.search(os.path.basename(p))
            if m and int(m.group("step")) > best_step:
                best, best_step = p, int(m.group("step"))
        return best

    def load(
        self,
        path: str | None = None,
        *,
        cfg: RoomNetConfig = DEFAULT_CONFIG,
        restore_head: bool = True,
        with_opt_state: bool = False,
    ):
        """Load (variables, step[, opt_state_flat]); None path = resume latest.

        restore_head=False drops ``dense/*`` tensors from the restore set —
        the reference's `restore_excluded_vars` behavior (network.py:78) —
        the caller merges over freshly initialized variables.
        """
        if path is None:
            path = self.latest_path()
            if path is None:
                return None  # caller initializes randomly (network.py:112)
        raw = dict(np.load(path))
        step = int(raw.pop("meta/step", np.asarray(0)))
        opt_flat = {k[len("opt/"):]: v for k, v in raw.items() if k.startswith("opt/")}
        var_flat = {
            k: v
            for k, v in raw.items()
            if not k.startswith("opt/") and not k.startswith("meta/")
        }
        if not restore_head:
            var_flat = {k: v for k, v in var_flat.items() if not k.startswith("dense/")}
            opt_flat = {}  # optimizer state is invalid with a fresh head
        if with_opt_state:
            return var_flat, step, opt_flat
        return var_flat, step

    def export_inference(self, variables: Any, out_path: str) -> str:
        """Inference-optimized export: params only, no optimizer state
        (reference `save()` in optimized mode, network.py:94-97).

        Delegates to convert_tf.save_flat — the ONE writer of
        'roomnet_tpu_flat_npz_v1' manifests, so the two paths that
        produce this format can't drift."""
        from roomnet_tpu.params.convert_tf import save_flat

        flat = schema.flatten_variables(jax.device_get(variables))
        save_flat(flat, out_path)
        return out_path


def merge_partial_restore(fresh_variables, restored_flat, cfg=DEFAULT_CONFIG):
    """Overlay restored tensors onto a freshly-initialized variable tree.

    Shape-mismatched tensors are skipped with a warning and keep their
    fresh initialization — the reference's behavior when `flat_len`
    changes (a different im_side re-inits the dense head rather than
    crashing later inside the compiled step; network.py:78, :242)."""
    from roomnet_tpu.utils.logging import get_logger

    log = get_logger("checkpoint")
    flat = schema.flatten_variables(jax.device_get(fresh_variables))
    for k, v in restored_flat.items():
        if k not in flat:
            # A key the current config doesn't define (e.g. a BN the model
            # no longer has) must not be injected — unflatten's presence
            # probes would silently resurrect the layer.
            log.warning("partial restore: skipping %s (not in the current "
                        "model)", k)
            continue
        if tuple(flat[k].shape) != tuple(np.asarray(v).shape):
            log.warning(
                "partial restore: skipping %s (checkpoint %s vs model %s) "
                "— keeping fresh init",
                k, tuple(np.asarray(v).shape), tuple(flat[k].shape),
            )
            continue
        flat[k] = v
    return schema.unflatten_variables(flat, cfg)

"""Training driver: the reference train.py main loop, TPU-native.

Preserved behaviors (reference train.py:115-158):
  * warm/cold dataset-list handling (`extract_fpaths`);
  * async feeders for train (shuffle+crop+augment) and val (plain);
  * every SAVE_FREQ steps (after the first): full val epoch, accuracy +
    per-class P/R/F, checkpoint named with the accuracy, stats appended to
    all_train_stats.json (same schema);
  * resume-latest on start; step counter restored.

New capabilities:
  * declarative **phase schedule** — the reference README curriculum
    (batch 8->32->40->45, dropout toggling, BN freeze; README.md:34-38) was
    executed by hand-editing constants between runs; here it's data;
  * data-parallel execution over a jax.sharding mesh (batch sharded on
    'data', params replicated; XLA all-reduces the grads);
  * device prefetch of host batches.
"""

from __future__ import annotations

import dataclasses
import json
import os
import threading
import time

import jax
import numpy as np

from roomnet_tpu.data.dataset import extract_fpaths
from roomnet_tpu.data.loader import TrainFeeder
from roomnet_tpu.models.roomnet import DEFAULT_CONFIG, RoomNetConfig, init_variables
from roomnet_tpu.params import schema
from roomnet_tpu.params.checkpoint import CheckpointStore, merge_partial_restore
from roomnet_tpu.train.metrics import make_stats_entry
from roomnet_tpu.train.optimizer import flatten_opt_state, unflatten_opt_state
from roomnet_tpu.train.step import TrainHParams, TrainState, init_train_state, make_train_step


@dataclasses.dataclass(frozen=True)
class Phase:
    """One leg of the training curriculum."""

    until_step: int  # phase is active while global step < until_step
    batch_size: int = 45
    dropout_enabled: bool = False
    dropout_rate: float = 0.35
    compute_bn_mean_var: bool = False
    update_bn_moving: bool = False


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Reference train.py:26-41 constants, typed; plus phases + mesh knobs."""

    data_dir: str = "./data/REI-Dataset"
    train_list_fpath: str = "train_list.txt"
    val_list_fpath: str = "val_list.txt"
    # None = written next to train_list_fpath. MUST be plumbed (round-3
    # review): extract_fpaths' own cwd-relative default let test/dev runs
    # from the repo root clobber the checked-in reference mapping.
    label_mappings_fpath: str | None = None
    stats_fpath: str = "all_train_stats.json"
    model_dir: str = "all_trained_models/trained_models"
    img_side: int = 224
    train_steps: int = 100_000
    save_freq: int = 10
    # OPT-IN retention: after each save keep only the newest N regular
    # checkpoints (+ the best-accuracy one + all interrupt/stall markers).
    # None = keep-all, the reference contract (network.py:80) and the
    # default everywhere; set on long runs where keep-all exhausts disk.
    keep_checkpoints: int | None = None
    learn_rate: float = 2e-4
    l2_coeff: float = 6e-2
    val_batch_size: int = 64
    batches_per_queue: int = 40
    seed: int = 0
    restore_head: bool = True  # False = reference's fresh-dense-head restore
    phases: tuple[Phase, ...] = (Phase(until_step=1 << 62),)
    # Multi-process input mode. "replicated" (default): every process's
    # feeder decodes the IDENTICAL global batch and device_put takes its
    # local shards — zero coordination, but host decode is duplicated
    # N_processes×. "sharded": each process decodes ONLY its row slice of
    # the global batch (same epoch order and per-row augment RNG, so the
    # union matches replicated mode row-for-row) and the global array is
    # assembled from per-process local data — the pod-scale data plane.
    # Sharded mode masks per-rank unreadable rows out of the loss instead
    # of skipping batches (a per-rank skip would desync the collectives).
    # Validation always feeds replicated (periodic + cheap; its labels
    # must be global). Requires a mesh; no-op without one.
    feed_mode: str = "replicated"
    # Failure detection: warn when no step completes for this long
    # (0 disables). See utils/watchdog.py.
    stall_timeout_s: float = 600.0
    # Escalation when a stall fires: write an emergency checkpoint of the
    # last completed state (suffix "stall", resumable like any other), and
    # optionally interrupt the main thread (KeyboardInterrupt -> the loop's
    # finally block flushes checkpoints and closes feeders cleanly).
    stall_checkpoint: bool = True
    stall_abort: bool = False
    # Validation BN mode. None = follow the active phase's
    # compute_bn_mean_var — the REFERENCE semantics: nn.infer runs with
    # training=compute_bn_mean_var (network.py:128-135, :193), so during
    # BN-unfrozen curriculum phases the logged validation accuracies used
    # batch statistics. True/False force one mode.
    val_use_batch_stats: bool | None = None
    # Checkpoint backend: "npz" (default, portable flat files) or "orbax"
    # (async, sharding-aware — use for multi-host/pod training).
    ckpt_backend: str = "npz"
    # Optimizer steps per device dispatch (lax.scan inside the jitted
    # call — train/step.py:make_multi_train_step). Use >1 only when host
    # dispatch genuinely dominates step time: on THIS rig it measurably
    # does not (the ~50 ms batch-45 floor is device-side small-batch
    # latency; scan K=8 gained nothing — PERF.md round 3), hence
    # default 1. The call window clamps at phase/save-freq boundaries so
    # validation cadence and the curriculum are unchanged.
    steps_per_call: int = 1

    # README.md:34-38 curriculum as data (approximate step boundaries).
    # NOTE a deliberate divergence from the reference README: phase 3 keeps
    # update_bn_moving=True where README.md:34-38 says BN moving stats were
    # frozen while training with dropout. The literal reading collapses
    # (measured, see below) — do NOT "fix" this back for parity's sake.
    @staticmethod
    def reference_curriculum(total_steps: int = 160_000) -> tuple[Phase, ...]:
        # Moving BN stats must keep updating in EVERY batch-stats phase up
        # to the freeze: a measured 6k-step run with phase 3 set to
        # update_bn_moving=False collapsed from 0.33 to chance at the
        # phase-4 boundary — the frozen forward inherited stats that were
        # last updated 1500 steps of weight-training earlier.
        q = total_steps // 4
        return (
            Phase(until_step=q, batch_size=8, compute_bn_mean_var=True,
                  update_bn_moving=True),
            Phase(until_step=2 * q, batch_size=32, compute_bn_mean_var=True,
                  update_bn_moving=True, dropout_enabled=True, dropout_rate=0.3),
            Phase(until_step=3 * q, batch_size=40, compute_bn_mean_var=True,
                  update_bn_moving=True, dropout_enabled=True, dropout_rate=0.3),
            Phase(until_step=1 << 62, batch_size=45, compute_bn_mean_var=False,
                  update_bn_moving=False),
        )


def _cycle_pad(a: np.ndarray, n: int) -> np.ndarray:
    """Pad (or trim) axis 0 to exactly n rows by cycling existing rows —
    the one row-padding rule shared by the mesh-divisibility guard and
    the multi-step batch stacker."""
    if a.shape[0] >= n:
        return a[:n]
    idx = np.arange(n - a.shape[0]) % a.shape[0]
    return np.concatenate([a, a[idx]], axis=0)


def phase_at(phases: tuple[Phase, ...], step: int) -> Phase:
    for ph in phases:
        if step < ph.until_step:
            return ph
    return phases[-1]


class Trainer:
    """Owns feeders, compiled steps (one per phase signature), checkpoints."""

    def __init__(
        self,
        tc: TrainConfig = TrainConfig(),
        cfg: RoomNetConfig = DEFAULT_CONFIG,
        mesh=None,
    ):
        self.tc = tc
        self.cfg = cfg
        self.mesh = mesh
        if tc.img_side != cfg.im_side:
            # Caught here, where both values are in hand — otherwise this
            # surfaces minutes later as an opaque flat_len/shape error in
            # the first jit trace (the reference hits the same mismatch as
            # a mid-graph crash when IMG_SIDE disagrees with a restored
            # checkpoint's dense head, network.py:78).
            raise ValueError(
                f"TrainConfig.img_side={tc.img_side} (data pipeline) != "
                f"cfg.im_side={cfg.im_side} (model geometry); pass matching "
                f"values — the CLI's --img-side sets both"
            )
        if tc.ckpt_backend == "orbax":
            from roomnet_tpu.params.orbax_io import OrbaxCheckpointStore

            self.store = OrbaxCheckpointStore(tc.model_dir)
        else:
            self.store = CheckpointStore(tc.model_dir)
        self._compiled: dict = {}
        self._infer_fns: dict = {}
        self._invoked_sigs: set = set()  # (phase-key, shape) already compiled

    # -- state ------------------------------------------------------------
    def init_state(self, rng: jax.Array | None = None) -> TrainState:
        rng = rng if rng is not None else jax.random.PRNGKey(self.tc.seed)
        variables = init_variables(rng, self.cfg)
        restored = self.store.load(
            cfg=self.cfg, restore_head=self.tc.restore_head, with_opt_state=True
        )
        hp = self._hp(phase_at(self.tc.phases, 0))
        if restored is None:
            print("No model found to restore from, initializing random weights")
            return init_train_state(variables, hp)
        var_flat, step, opt_flat = restored
        variables = merge_partial_restore(variables, var_flat, self.cfg)
        state = init_train_state(variables, hp)
        if opt_flat:
            opt_state = unflatten_opt_state(opt_flat)
            # A checkpoint from a different geometry (im_side change =
            # different flat_len) carries Adam moments shaped for the old
            # head; mixing them with re-initialized params crashes inside
            # the step — start the optimizer fresh instead (same stance as
            # restore_head=False).
            mismatched = set(opt_state.mu) != set(state.train_vars) or any(
                tuple(np.shape(opt_state.mu[k])) != tuple(v.shape)
                for k, v in state.train_vars.items()
            )
            if mismatched:
                print("optimizer state shape-mismatched with model — fresh Adam state")
            else:
                state = state._replace(opt_state=opt_state)
        state = state._replace(step=jax.numpy.asarray(step, jax.numpy.int32))
        print(f"Model restored at step {step}")
        return state

    def _to_global(self, x, *, leading_steps: bool = False,
                   from_local: bool = False):
        """Host batch -> device array sharded over 'data'. Single-process:
        a plain device_put. Multi-process replicated feed: every rank holds
        the IDENTICAL full batch (the feeder is bit-deterministic per
        seed), so each rank contributes its addressable shards via
        make_array_from_callback — multi-host feeding with zero
        coordination. Sharded feed (from_local=True): x holds ONLY this
        process's rows; the global array is assembled from per-process
        local data (each sample decoded exactly once fleet-wide).

        leading_steps: the array is a (K, batch, ...) multi-step stack —
        the scan axis stays unsharded, the batch axis shards on 'data'."""
        if self.mesh is None:
            # No mesh: still device_put so the prefetch loop's host->device
            # copy overlaps the previous step's compute.
            return jax.device_put(x)
        from jax.sharding import NamedSharding, PartitionSpec as P

        spec = P(None, "data") if leading_steps else P("data")
        sharding = NamedSharding(self.mesh, spec)
        if from_local:
            axis = 1 if leading_steps else 0
            gshape = list(x.shape)
            gshape[axis] *= jax.process_count()
            return jax.make_array_from_process_local_data(
                sharding, x, tuple(gshape)
            )
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])

    def _feed_rows(self, global_batch: int) -> tuple[int, int] | None:
        """This process's row slice of the nominal batch under
        feed_mode="sharded" (None in replicated mode / without a mesh)."""
        if self.tc.feed_mode != "sharded" or self.mesh is None:
            return None
        n_proc, pid = jax.process_count(), jax.process_index()
        if global_batch % n_proc:
            raise ValueError(
                f"sharded feed: batch {global_batch} not divisible by "
                f"{n_proc} processes"
            )
        local = global_batch // n_proc
        return (pid * local, (pid + 1) * local)

    def _feeder_batch(self, mesh_bs: int, n_usable: int) -> int:
        """Clamp the nominal batch to the dataset size BEFORE slicing it
        into sharded-feed rows. TrainFeeder clamps its batch internally
        anyway; rows computed against the un-clamped batch would then fail
        its range check — a dataset smaller than the phase batch must
        train under feed_mode="sharded" exactly like it does replicated
        (where the feeder shrinks gracefully)."""
        eff = min(mesh_bs, n_usable)
        if self.tc.feed_mode == "sharded" and self.mesh is not None:
            import math

            # The global batch must slice evenly into per-process rows AND
            # shard evenly over the mesh's data axis (fixed local shapes —
            # there is no per-process pad that keeps the union divisible).
            # Rounding DOWN drops < quantum tail rows per epoch, matching
            # the feeder's own epoch-tail truncation.
            quantum = math.lcm(
                jax.process_count(), int(self.mesh.shape.get("data", 1))
            )
            eff = (eff // quantum) * quantum
            if eff == 0:
                raise ValueError(
                    f"sharded feed: {n_usable} usable rows cannot fill one "
                    f"batch quantum of {quantum} (process count x data "
                    f"axis); use feed_mode='replicated' for datasets this "
                    f"small"
                )
        return eff

    def _pad_for_mesh(self, x, y=None):
        """Pad a host batch up to a multiple of the 'data' axis by cycling
        rows. Config-time rounding (_mesh_batch) handles the common case;
        this is the device_put boundary guard for batches the feeder
        shrank anyway (unreadable files dropped, dataset smaller than the
        rounded batch)."""
        if self.mesh is None:
            return (x, y) if y is not None else x
        n = int(self.mesh.shape.get("data", 1))
        rem = x.shape[0] % n
        if rem == 0:
            return (x, y) if y is not None else x
        target = x.shape[0] + (n - rem)
        x = _cycle_pad(x, target)
        if y is None:
            return x
        return x, _cycle_pad(y, target)

    def _mesh_batch(self, batch_size: int) -> int:
        """Round a batch size UP to a multiple of the mesh's 'data' axis —
        sharding the batch dim requires divisibility (jax.device_put with
        P('data') raises otherwise). Ceiling, never floor: rounding down
        would silently shrink the effective global batch below the
        curriculum phase's configured size (e.g. batch 45 on a 32-wide
        data axis must become 64, not 32). No-op without a mesh; the
        reference constants (45, 64) predate any notion of device meshes."""
        if self.mesh is None:
            return batch_size
        n = int(self.mesh.shape.get("data", 1))
        rounded = max(n, -(-batch_size // n) * n)
        if rounded != batch_size:
            print(f"batch {batch_size} -> {rounded} (multiple of data axis {n})")
        return rounded

    def _hp(self, ph: Phase) -> TrainHParams:
        return TrainHParams(
            learn_rate=self.tc.learn_rate,
            num_steps=self.tc.train_steps,
            l2_coeff=self.tc.l2_coeff,
            dropout_enabled=ph.dropout_enabled,
            dropout_rate=ph.dropout_rate,
            compute_bn_mean_var=ph.compute_bn_mean_var,
            update_bn_moving=ph.update_bn_moving,
        )

    # -- compiled fns -------------------------------------------------------
    def _step_fn(self, ph: Phase, *, multi: bool = False,
                 masked: bool = False):
        """Single-step fn, or (multi=True) the K-steps-per-dispatch scan
        variant — K is taken from the input shape, so one cache entry per
        phase covers every window width. masked=True (sharded feed) adds
        the (B,) real-row mask as a 5th, batch-sharded argument to the
        single step."""
        key = (ph.dropout_enabled, ph.dropout_rate, ph.compute_bn_mean_var,
               ph.update_bn_moving, multi, masked)
        if key not in self._compiled:
            from roomnet_tpu.train.step import make_multi_train_step

            factory = make_multi_train_step if multi else make_train_step
            fn = factory(self._hp(ph), self.cfg)
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                spec = P(None, "data") if multi else P("data")
                data = NamedSharding(self.mesh, spec)
                # multi/masked: a 5th arg — the real-row mask, batch-
                # sharded like y.
                shardings = (
                    (None, data, data, None, data) if (multi or masked)
                    else (None, data, data, None)
                )
                fn = jax.jit(
                    fn,
                    in_shardings=shardings,
                    out_shardings=None,
                    donate_argnums=(0,),
                )
            else:
                fn = jax.jit(fn, donate_argnums=(0,))
            self._compiled[key] = fn
        return self._compiled[key]

    def infer_fn(self, use_batch_stats: bool = False):
        """Validation forward. `use_batch_stats=True` reproduces the
        reference's validation semantics during BN-unfrozen phases:
        `nn.infer` runs the SAME graph with training=compute_bn_mean_var
        (network.py:128-135, :193), so the accuracies the reference logged
        to all_train_stats.json were computed with batch statistics."""
        if use_batch_stats not in self._infer_fns:
            from roomnet_tpu.models.roomnet import forward, normalize_bgr_uint8

            def _infer(train_vars, frozen_vars, x_uint8):
                variables = schema.unflatten_jax({**train_vars, **frozen_vars}, self.cfg)
                logits = forward(
                    variables, normalize_bgr_uint8(x_uint8), self.cfg,
                    use_batch_stats=use_batch_stats,
                )
                return jax.numpy.argmax(logits, axis=-1)

            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                self._infer_fns[use_batch_stats] = jax.jit(
                    _infer,
                    in_shardings=(None, None, NamedSharding(self.mesh, P("data"))),
                    # Replicated predictions: a data-sharded output spans
                    # non-addressable devices under multi-process meshes and
                    # cannot be fetched on any single rank.
                    out_shardings=NamedSharding(self.mesh, P()),
                )
            else:
                self._infer_fns[use_batch_stats] = jax.jit(_infer)
        return self._infer_fns[use_batch_stats]

    # -- validation ---------------------------------------------------------
    def run_validation(self, state: TrainState, val_reader: TrainFeeder,
                       use_batch_stats: bool = False):
        """Infer one full val epoch (reference train.py:135-145 semantics:
        the last dequeued batch — first of the next epoch — is trimmed).

        Robustness fix over the reference: its loop exits BEFORE inferring
        when the first dequeued batch itself carries the epoch-boundary
        flag (possible whenever a boundary lands at the queue head, certain
        when the val set fits in one batch) — yielding zero predictions.
        Here the boundary check runs after at least one batch is inferred.
        """
        infer = self.infer_fn(use_batch_stats)
        x_val, y_val = val_reader.dequeue()
        y_vals = list(y_val)
        y_preds: list[int] = []
        epoch_flags = 0
        while True:
            if val_reader.last_batch_synthetic:
                # Fabricated rows (whole batch unreadable) must not count
                # toward accuracy: drop their labels and skip the infer.
                del y_vals[len(y_vals) - len(y_val):]
            else:
                n_real = x_val.shape[0]
                y_pred = infer(state.train_vars, state.frozen_vars,
                               self._to_global(self._pad_for_mesh(x_val)))
                y_preds += list(np.asarray(y_pred)[:n_real])
            x_val, y_val = val_reader.dequeue()
            y_vals += list(y_val)
            if val_reader.train_state["previous_epoch_done"]:
                epoch_flags += 1
                # Require >=1 real inferred batch before exiting (the
                # reference exits with zero predictions when the boundary
                # lands at the queue head). Two whole epochs of synthetic
                # batches means the val set is gone — RAISE rather than
                # return empty: the caller would otherwise record a fake
                # accuracy-0.0 stats entry and a roomnet--0.0--{step}
                # checkpoint (same stance as the train-side fetch_next).
                if y_preds:
                    break
                if epoch_flags >= 2:
                    raise RuntimeError(
                        "every validation batch in two epochs was "
                        "unreadable — refusing to score fabricated data"
                    )
        y_vals = y_vals[: len(y_preds)]
        return y_vals, y_preds

    # -- main loop ------------------------------------------------------------
    def train(self, total_steps: int | None = None, log_every: int = 1):
        tc = self.tc
        label_fpath = tc.label_mappings_fpath or os.path.join(
            os.path.dirname(tc.train_list_fpath) or ".", "label_mappings.json"
        )
        train_txt, val_txt = extract_fpaths(
            tc.data_dir, tc.train_list_fpath, tc.val_list_fpath, label_fpath,
            seed=tc.seed,
        )
        state = self.init_state()
        start_step = int(state.step)
        # `is not None`, not `or`: an explicit total_steps=0 (a caller's
        # computed remaining-step count hitting zero) must run 0 steps,
        # not fall through to the full tc.train_steps run.
        total_steps = total_steps if total_steps is not None else tc.train_steps

        all_stats = []
        if os.path.isfile(tc.stats_fpath):
            try:
                with open(tc.stats_fpath) as f:
                    all_stats = json.load(f)
            except (json.JSONDecodeError, ValueError):
                # A corrupt stats file (pre-atomic-write interrupted save,
                # or hand-edited) must not brick every future resume — the
                # real training state lives in the checkpoints. Preserve
                # the bytes for forensics and start a fresh history.
                quarantine = tc.stats_fpath + ".corrupt"
                os.replace(tc.stats_fpath, quarantine)
                print(f"stats file unparseable — moved to {quarantine}; "
                      f"starting a fresh stats history")

        ph = phase_at(tc.phases, start_step)
        n_usable = sum(1 for l in train_txt if str(l).strip())
        mesh_bs = self._feeder_batch(self._mesh_batch(ph.batch_size), n_usable)
        train_reader = TrainFeeder(
            train_txt, batch_size=mesh_bs,
            batches_per_queue=tc.batches_per_queue,
            shuffle=True, im_side=tc.img_side, random_crop=True, preprocess=True,
            seed=tc.seed, rows=self._feed_rows(mesh_bs),
        )
        val_reader = TrainFeeder(
            val_txt, batch_size=self._mesh_batch(tc.val_batch_size),
            batches_per_queue=10,
            shuffle=False, im_side=tc.img_side, random_crop=False, preprocess=False,
            seed=tc.seed,
        )
        from roomnet_tpu.utils.watchdog import StepWatchdog

        # Stall escalation (runs on the watchdog thread). Order matters: the
        # abort interrupt fires FIRST — the emergency save device_gets the
        # last *completed* state, which is best-effort on a wedged device
        # session and may block this (daemon) thread; the interrupt must not
        # be sequenced behind it.
        self._live_state = None  # last state whose metrics were fetched

        def _emergency_save(st, suffix: str):
            """Best-effort save of the last COMPLETED state (stall or
            interrupt). Rank 0 + npz: a normal resumable save into the
            model dir. Otherwise (orbax backend, or rank>0): a collective
            Orbax save can't be driven from a watchdog thread or an
            exception handler without hanging the other ranks — FALL BACK
            to a local npz dump under model_dir/emergency/ rather than
            silently doing nothing (round-2 review weak #6)."""
            if st is None:
                print(f"{suffix}: no completed step state yet — nothing to dump")
                return
            if tc.ckpt_backend != "orbax" and jax.process_index() == 0:
                path = self.store.save(
                    st.variables(self.cfg), int(st.step), suffix=suffix,
                    opt_state_flat=flatten_opt_state(st.opt_state),
                )
                print(f"{suffix}: emergency checkpoint written to {path}")
            else:
                rank = jax.process_index()
                dump = CheckpointStore(os.path.join(tc.model_dir, "emergency"))
                path = dump.save(
                    st.variables(self.cfg), int(st.step),
                    suffix=f"{suffix}-rank{rank}",
                    opt_state_flat=flatten_opt_state(st.opt_state),
                )
                print(
                    f"{suffix}: collective checkpointing unavailable here "
                    f"(backend={tc.ckpt_backend}, rank={rank}) — local npz "
                    f"emergency dump written to {path}; restore it manually "
                    f"via CheckpointStore.load"
                )

        self._stall_aborting = False
        # Set when the watchdog thread's stall save finishes: with
        # stall_abort the main thread unwinds on the interrupt while the
        # (daemon) watchdog thread is still device_get-ing the save —
        # exiting immediately would kill it mid-write, so the interrupt
        # handler below waits (bounded) on this event (round-3 advisor).
        self._stall_save_done = threading.Event()

        def _on_stall(info):
            if tc.stall_abort:
                # Flag BEFORE interrupting: the main loop's interrupt
                # handler must not attempt its own emergency save — that
                # is a device_get against the very session the stall
                # detector suspects is wedged, and it would sequence the
                # abort behind a potentially ~40-min hang.
                self._stall_aborting = True
                import _thread

                _thread.interrupt_main()
            if tc.stall_checkpoint:
                try:
                    _emergency_save(self._live_state, "stall")
                finally:
                    self._stall_save_done.set()
            else:
                self._stall_save_done.set()

        watchdog = (
            StepWatchdog(tc.stall_timeout_s, on_stall=_on_stall)
            if tc.stall_timeout_s
            else None
        )
        if watchdog:
            watchdog.start()
        rng = jax.random.PRNGKey(tc.seed + 1)
        # Device prefetch: keep the next batch's host->device copy in flight
        # while the current step computes (generator.py:159-163's queue,
        # extended across the PCIe/ICI boundary).
        pending = None  # (x_dev, y_dev) already on device

        sharded = train_reader.rows is not None
        consec_synthetic = 0  # sharded feed: local slice fully unreadable

        def fetch_host_batch():
            nonlocal consec_synthetic
            if sharded:
                # Sharded feed: NEVER skip — a per-rank skip would desync
                # the ranks' batch streams and hang the collectives. An
                # unreadable (or fully-synthetic) local slice contributes
                # zero loss weight via the row mask instead (and a batch
                # with zero real rows fleet-wide is a state no-op inside
                # the step — see make_train_step). But a local slice that
                # stays synthetic for a FULL epoch means this rank's files
                # are gone: fail loudly like the replicated path rather
                # than mask-zero forever.
                x, y = train_reader.dequeue()
                lo, hi = train_reader.rows
                n_real = 0 if train_reader.last_batch_synthetic else x.shape[0]
                if n_real == 0:
                    consec_synthetic += 1
                    if consec_synthetic > max(train_reader.batches_per_epoch, 1):
                        raise RuntimeError(
                            "sharded feed: every batch in a full epoch of "
                            "this process's row slice was unreadable — "
                            "dataset files missing or corrupt on this host"
                        )
                else:
                    consec_synthetic = 0
                return _cycle_pad(x, hi - lo), _cycle_pad(y, hi - lo), n_real
            # Skip synthetic batches (whole batch unreadable — fabricated
            # zeros labeled class 0): a silent full-batch gradient step on
            # fake data would corrupt the run. Bounded by one epoch of
            # consecutive misses, after which the dataset is plainly gone.
            for _ in range(max(train_reader.batches_per_epoch, 1) + 1):
                x, y = train_reader.dequeue()
                if not train_reader.last_batch_synthetic:
                    n_real = x.shape[0]  # before any row-cycling pad
                    x, y = self._pad_for_mesh(x, y)
                    return x, y, n_real
                print("skipping synthetic batch (all files unreadable)")
            raise RuntimeError(
                "every batch in a full epoch was unreadable — dataset files "
                "missing or corrupt; refusing to train on fabricated zeros"
            )

        def fetch_next(k: int):
            """k host batches -> device; returns (x, y, row_mask_or_None).

            k==1 keeps the classic (B, ...) shapes (shrunk batches
            tolerated via shape-keyed recompile; mask None — EXCEPT the
            sharded feed, whose fixed local shapes always carry a mask).
            k>1 stacks to (k, B, ...) for the scanned multi-step — every
            batch is padded by row-cycling to the nominal size first
            (np.stack needs uniform shapes), and a (k, B) float mask marks
            the real rows so padding contributes NO gradient weight —
            matching the k==1 semantics where a shrunk batch trains only
            on real rows (round-3 advisor)."""
            if k == 1:
                x, y, n_real = fetch_host_batch()
                if sharded:
                    mask = np.zeros((x.shape[0],), np.float32)
                    mask[:n_real] = 1.0
                    return (
                        self._to_global(x, from_local=True),
                        self._to_global(y, from_local=True),
                        self._to_global(mask, from_local=True),
                    )
                if x.shape[0] != n_real:
                    # _pad_for_mesh cycle-padded a shrunk batch up to the
                    # data-axis multiple: mask the duplicates out of the
                    # loss, same as every other padding site.
                    mask = np.zeros((x.shape[0],), np.float32)
                    mask[:n_real] = 1.0
                    return (
                        self._to_global(x),
                        self._to_global(y),
                        self._to_global(mask),
                    )
                return self._to_global(x), self._to_global(y), None

            n = (train_reader.rows[1] - train_reader.rows[0]
                 if sharded else train_reader.batch_size)
            if not sharded and self.mesh is not None:
                # The feeder may have clamped batch_size below the
                # config-time mesh rounding (dataset smaller than the
                # phase batch). Pad rows up to the data-axis multiple like
                # the k==1 path's _pad_for_mesh — the mask below zeroes
                # the padding's gradient weight — or _to_global would
                # raise on a non-divisible shard axis.
                d = int(self.mesh.shape.get("data", 1))
                n = -(-n // d) * d
            triples = [fetch_host_batch() for _ in range(k)]
            x = np.stack([_cycle_pad(t[0], n) for t in triples])
            y = np.stack([_cycle_pad(t[1], n) for t in triples])
            mask = np.zeros((k, n), np.float32)
            for j, t in enumerate(triples):
                mask[j, : min(t[2], n)] = 1.0
            return (
                self._to_global(x, leading_steps=True, from_local=sharded),
                self._to_global(y, leading_steps=True, from_local=sharded),
                self._to_global(mask, leading_steps=True, from_local=sharded),
            )

        end_step = start_step + total_steps

        def window(i: int) -> int:
            """Steps for the next dispatch: steps_per_call clamped at the
            run end, the next phase boundary, and the next save/validation
            point — so cadence and curriculum are unchanged by scanning."""
            nxt = end_step
            for p in tc.phases:
                if i < p.until_step:
                    nxt = min(nxt, p.until_step)
                    break
            if tc.save_freq > 0:
                nxt = min(nxt, ((i // tc.save_freq) + 1) * tc.save_freq)
            return max(1, min(tc.steps_per_call, nxt - i))

        # Preemption safety: SIGTERM (maintenance eviction, spot reclaim,
        # SLURM/K8s shutdown) must checkpoint like Ctrl-C does, not drop
        # up to save_freq steps of work. Raise KeyboardInterrupt so the
        # except/finally below runs; restore the old handler on exit.
        # Signals only deliver to the main thread; skip elsewhere (tests).
        import signal
        import threading as _threading

        old_sigterm = None
        if _threading.current_thread() is _threading.main_thread():
            def _sigterm(signum, frame):
                raise KeyboardInterrupt("SIGTERM")

            old_sigterm = signal.signal(signal.SIGTERM, _sigterm)
        try:
            it = start_step
            while it < end_step:
                new_ph = phase_at(tc.phases, it)
                if new_ph.batch_size != ph.batch_size:
                    train_reader.close()
                    pending = None
                    mesh_bs = self._feeder_batch(
                        self._mesh_batch(new_ph.batch_size), n_usable
                    )
                    train_reader = TrainFeeder(
                        train_txt, batch_size=mesh_bs,
                        batches_per_queue=tc.batches_per_queue, shuffle=True,
                        im_side=tc.img_side, random_crop=True, preprocess=True,
                        seed=tc.seed, rows=self._feed_rows(mesh_bs),
                    )
                ph = new_ph
                # save_freq=0 disables the save/validation cadence (same
                # contract window() honors) — it must not ZeroDivisionError.
                if tc.save_freq > 0 and it % tc.save_freq == 0 \
                        and it > start_step:
                    val_bn = (
                        ph.compute_bn_mean_var
                        if tc.val_use_batch_stats is None
                        else tc.val_use_batch_stats
                    )
                    # Validation (incl. its one-time infer compile) can
                    # legitimately exceed the stall timeout — not a stall.
                    if watchdog:
                        watchdog.pause()
                    y_vals, y_preds = self.run_validation(
                        state, val_reader, use_batch_stats=val_bn
                    )
                    if watchdog:
                        watchdog.resume()
                    entry = make_stats_entry(int(state.step), y_vals, y_preds)
                    # Multi-process: the npz store is a plain file write —
                    # every rank saving races identical bytes through the
                    # same tmp path, so only rank 0 writes (params are
                    # replicated; the bytes are the same everywhere). The
                    # Orbax backend is a COLLECTIVE save: all ranks call it.
                    is_rank0 = jax.process_index() == 0
                    if tc.ckpt_backend == "orbax" or is_rank0:
                        self.store.save(
                            state.variables(self.cfg),
                            int(state.step),
                            suffix=str(entry["accuracy"]),
                            opt_state_flat=flatten_opt_state(state.opt_state),
                        )
                    if tc.keep_checkpoints and is_rank0:
                        # Deletion is rank-0-only file removal of COMPLETED
                        # checkpoints; async orbax writes must land first
                        # (prune sees only finished step dirs after wait).
                        if hasattr(self.store, "wait"):
                            self.store.wait()
                        self.store.prune(tc.keep_checkpoints)
                    if is_rank0:
                        all_stats.append(entry)
                        # Atomic tmp+rename like the checkpoint store: the
                        # file is fully rewritten every validation and an
                        # unclean death mid-write would leave truncated
                        # JSON that bricks the next resume's load.
                        tmp = tc.stats_fpath + ".tmp"
                        with open(tmp, "w") as f:
                            json.dump(all_stats, f, indent=4, sort_keys=True)
                        os.replace(tmp, tc.stats_fpath)
                        print(f"Validated at step {state.step}: "
                              f"acc {entry['accuracy']:.4f}")
                k = window(it)
                x, y, mk = pending if pending is not None else fetch_next(k)
                pending = None
                rng, sub = jax.random.split(rng)
                t0 = time.perf_counter()
                # First call of a (phase, batch-shape) signature triggers the
                # XLA compile — minutes on a remote compiler in f32 mode, an
                # expected silence the watchdog must not escalate on.
                # mk-presence is part of the signature: the masked step is
                # a different jit function, so its first call at an
                # already-seen shape is still a fresh compile the watchdog
                # must not escalate on.
                sig = (ph.dropout_enabled, ph.dropout_rate,
                       ph.compute_bn_mean_var, ph.update_bn_moving, x.shape,
                       mk is not None)
                first_compile = sig not in self._invoked_sigs
                if first_compile and watchdog:
                    watchdog.pause()
                if k > 1:
                    state, metrics = self._step_fn(ph, multi=True)(
                        state, x, y, sub, mk
                    )
                elif mk is not None:  # sharded feed: masked single step
                    state, metrics = self._step_fn(
                        ph, multi=False, masked=True
                    )(state, x, y, sub, mk)
                else:
                    state, metrics = self._step_fn(ph, multi=False)(
                        state, x, y, sub
                    )
                if first_compile:
                    self._invoked_sigs.add(sig)
                    if watchdog:
                        # Resume only after the first result LANDS: a scalar
                        # value fetch is a real sync — block_until_ready is
                        # effectively async under the axon relay and would
                        # close the pause window while the compile runs.
                        float(metrics["loss"])
                        watchdog.resume()
                # While the (async-dispatched) step runs, stage the next
                # window's batches — unless a batch-size phase boundary
                # lands there (the rebuilt feeder would discard them).
                if (it + k < end_step
                        and phase_at(tc.phases, it + k).batch_size
                        == ph.batch_size):
                    pending = fetch_next(window(it + k))
                # Log when a multiple of log_every falls INSIDE this
                # window [it, it+k) — (-it) % log_every is its offset.
                if (-it) % log_every < k:
                    # float() forces completion — only then is the heartbeat
                    # meaningful (dispatch alone returns even off a wedged
                    # device session).
                    loss = float(metrics["loss"])
                    lr = float(metrics["learn_rate"])
                    # This state's step has COMPLETED (its metrics landed) —
                    # safe for the stall-escalation emergency save; a
                    # merely-dispatched state's buffers would block
                    # device_get on the exact wedged session being detected.
                    # COPY on device: the originals are donated into the next
                    # step call and would be deleted by the time a stall fires.
                    self._live_state = jax.tree_util.tree_map(
                        lambda a: jax.numpy.array(a, copy=True), state
                    )
                    if watchdog:
                        watchdog.beat(it)
                    dt = time.perf_counter() - t0
                    print(f"Step {int(state.step)} loss = {loss:.5f} "
                          f"learn_rate = {lr:.3e} ({dt * 1e3:.1f} ms)")
                it += k
        except KeyboardInterrupt:
            # Interrupt (Ctrl-C, SIGTERM/preemption): save the last
            # COMPLETED state before propagating — a merely-dispatched
            # `state` may be donated/deleted or stuck on a wedged device,
            # so use the _live_state copy (same rule as the stall path).
            # Without this, an eviction drops up to save_freq steps.
            # EXCEPT when the interrupt came from the stall escalation:
            # the watchdog thread is doing (or did) the save, and a second
            # device_get here would block the abort on the suspected-
            # wedged session. Wait BOUNDED for that (daemon) thread's save
            # — exiting immediately would kill it mid-write. If the wait
            # expires, the device really is wedged; say so instead of
            # silently dropping the promised checkpoint.
            if not self._stall_aborting:
                _emergency_save(self._live_state, "interrupt")
            elif tc.stall_checkpoint and not self._stall_save_done.wait(
                timeout=60.0
            ):
                print(
                    "stall checkpoint still blocked on the wedged device "
                    "session after 60 s — abandoning it (best-effort)"
                )
            raise
        finally:
            if old_sigterm is not None:
                import signal as _signal

                _signal.signal(_signal.SIGTERM, old_sigterm)
            if watchdog:
                watchdog.stop()
            if hasattr(self.store, "wait"):
                self.store.wait()  # flush async (orbax) checkpoint writes
            train_reader.close()
            val_reader.close()
        return state

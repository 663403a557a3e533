"""Checkpoint store semantics: keep-all, acc-named, resume-latest, partial restore."""

import os
import time

import jax
import numpy as np
import pytest

from roomnet_tpu.models.roomnet import init_variables, param_count
from roomnet_tpu.params import schema
from roomnet_tpu.params.checkpoint import CheckpointStore, merge_partial_restore
from tests.tiny import TINY


@pytest.fixture
def variables():
    return init_variables(jax.random.PRNGKey(0), TINY)


def test_save_load_roundtrip(tmp_path, variables):
    store = CheckpointStore(str(tmp_path))
    store.save(variables, 42, suffix="0.91")
    loaded_flat, step = store.load(cfg=TINY)
    assert step == 42
    want = schema.flatten_variables(variables)
    assert set(loaded_flat) == set(want)
    for k in want:
        np.testing.assert_array_equal(loaded_flat[k], want[k])


def test_keep_all_and_resume_latest(tmp_path, variables):
    """Every save retained; load() picks max step from filenames
    (reference network.py:80, :110-118)."""
    store = CheckpointStore(str(tmp_path))
    for step, acc in [(10, "0.5"), (30, "0.9"), (20, "0.7")]:
        store.save(variables, step, suffix=acc)
    assert len(os.listdir(tmp_path)) == 3  # keep-all
    assert "--0.9--30" in store.latest_path()
    _, step = store.load(cfg=TINY)
    assert step == 30


def test_load_empty_dir_returns_none(tmp_path):
    assert CheckpointStore(str(tmp_path)).load(cfg=TINY) is None


def test_partial_restore_excludes_dense_head(tmp_path, variables):
    """restore_head=False keeps the checkpoint's conv tower but a fresh
    dense head (reference network.py:78, :242 restore_excluded_vars)."""
    store = CheckpointStore(str(tmp_path))
    store.save(variables, 5)
    fresh = init_variables(jax.random.PRNGKey(9), TINY)
    restored_flat, _ = store.load(cfg=TINY, restore_head=False)
    merged = merge_partial_restore(fresh, restored_flat, TINY)
    # Conv tower == checkpoint; dense head == fresh init.
    np.testing.assert_array_equal(
        np.asarray(merged["blocks"][0]["conv"][0]),
        np.asarray(variables["blocks"][0]["conv"][0]),
    )
    np.testing.assert_array_equal(
        np.asarray(merged["dense"][0]["kernel"]),
        np.asarray(fresh["dense"][0]["kernel"]),
    )
    assert not np.allclose(
        np.asarray(merged["dense"][0]["kernel"]),
        np.asarray(variables["dense"][0]["kernel"]),
    )


def test_partial_restore_skips_shape_mismatches(tmp_path, variables):
    """A checkpoint from a different geometry (changed im_side -> different
    flat_len) keeps the fresh init for mismatched tensors instead of
    crashing later inside the compiled step (reference re-inits the head
    when flat_len changes, network.py:78, :242)."""
    import dataclasses

    store = CheckpointStore(str(tmp_path))
    store.save(variables, 7)
    bigger = dataclasses.replace(TINY, im_side=40)  # flat_len changes
    fresh = init_variables(jax.random.PRNGKey(4), bigger)
    restored_flat, _ = store.load(cfg=bigger)
    merged = merge_partial_restore(fresh, restored_flat, bigger)
    # conv tower restored (shape-stable across im_side)
    np.testing.assert_array_equal(
        np.asarray(merged["blocks"][0]["conv"][0]),
        np.asarray(variables["blocks"][0]["conv"][0]),
    )
    # first dense kernel kept fresh (flat_len mismatch)
    np.testing.assert_array_equal(
        np.asarray(merged["dense"][0]["kernel"]),
        np.asarray(fresh["dense"][0]["kernel"]),
    )


def test_save_is_atomic_no_tmp_left(tmp_path, variables):
    store = CheckpointStore(str(tmp_path))
    p = store.save(variables, 3, suffix="0.5")
    assert os.path.exists(p)
    assert not any(".tmp" in f for f in os.listdir(tmp_path))
    # resume-latest must never pick a leftover temp file
    tmp_file = tmp_path / "roomnet--0.9--99.tmp.npz"
    tmp_file.write_bytes(b"truncated garbage")
    assert "--3" in store.latest_path()
    # a FRESH tmp file survives the sweep: it may be another process's
    # in-flight atomic save (ADVICE r2: concurrent store on a live dir)
    CheckpointStore(str(tmp_path))
    assert any(".tmp" in f for f in os.listdir(tmp_path))
    # ...but a stale crash leftover (old mtime) is swept
    old = time.time() - 7200
    os.utime(tmp_file, (old, old))
    CheckpointStore(str(tmp_path))
    assert not any(".tmp" in f for f in os.listdir(tmp_path))


def test_opt_state_rides_along(tmp_path, variables):
    store = CheckpointStore(str(tmp_path))
    opt_flat = {"count": np.asarray(3), "mu/dense/0/kernel": np.ones((4, 2))}
    store.save(variables, 7, opt_state_flat=opt_flat)
    _, step, loaded_opt = store.load(cfg=TINY, with_opt_state=True)
    assert step == 7
    np.testing.assert_array_equal(loaded_opt["count"], 3)
    np.testing.assert_array_equal(loaded_opt["mu/dense/0/kernel"], np.ones((4, 2)))


def test_export_inference_strips_opt_state(tmp_path, variables):
    store = CheckpointStore(str(tmp_path))
    out = store.export_inference(variables, str(tmp_path / "final" / "roomnet.npz"))
    raw = dict(np.load(out))
    assert not any(k.startswith("opt/") for k in raw)
    assert param_count(schema.unflatten_variables(raw, TINY)) == param_count(variables)


def test_orbax_backend_roundtrip(tmp_path, variables):
    ocp = pytest.importorskip("orbax.checkpoint")
    del ocp
    from roomnet_tpu.params.orbax_io import OrbaxCheckpointStore

    store = OrbaxCheckpointStore(str(tmp_path / "orbax"), async_save=False)
    store.save(variables, 12, suffix="0.88", opt_state_flat={"count": np.asarray(3)})
    assert "--0.88--12" in store.latest_path()
    var_flat, step, opt = store.load(cfg=TINY, with_opt_state=True)
    assert step == 12 and int(opt["count"]) == 3
    want = schema.flatten_variables(variables)
    for k in want:
        np.testing.assert_array_equal(var_flat[k], want[k])
    # partial restore drops the head here too
    var_flat2, _ = store.load(cfg=TINY, restore_head=False)
    assert not any(k.startswith("dense/") for k in var_flat2)


def test_orbax_async_save_waits(tmp_path, variables):
    pytest.importorskip("orbax.checkpoint")
    from roomnet_tpu.params.orbax_io import OrbaxCheckpointStore

    store = OrbaxCheckpointStore(str(tmp_path / "orbax_async"), async_save=True)
    store.save(variables, 5, suffix="0.7")
    store.wait()  # async write must land before load
    var_flat, step = store.load(cfg=TINY)
    assert step == 5
    want = schema.flatten_variables(variables)
    np.testing.assert_array_equal(var_flat["dense/0/kernel"], want["dense/0/kernel"])


def test_prune_keeps_newest_best_and_markers(tmp_path, variables):
    """Opt-in retention (TrainConfig.keep_checkpoints): newest N regular
    checkpoints survive, plus the best-accuracy one and every marker
    (interrupt/stall) — and resume-latest still works. Default behavior
    (no prune call) stays keep-all, pinned above."""
    store = CheckpointStore(str(tmp_path))
    for step, acc in [(10, "0.5"), (20, "0.95"), (30, "0.7"), (40, "0.8"),
                      (50, "0.6")]:
        store.save(variables, step, suffix=acc)
    store.save(variables, 35, suffix="interrupt")  # marker: never pruned
    deleted = store.prune(2)
    names = sorted(os.path.basename(p) for _, _, p in store.list_checkpoints())
    # newest 2 (40, 50) + best (20 at 0.95) + the marker
    assert names == ["roomnet--0.6--50.npz", "roomnet--0.8--40.npz",
                     "roomnet--0.95--20.npz", "roomnet--interrupt--35.npz"]
    assert len(deleted) == 2
    _, step = store.load(cfg=TINY)
    assert step == 50  # resume-latest unaffected
    with pytest.raises(ValueError):
        store.prune(0)


def test_prune_orbax_backend(tmp_path, variables):
    """Same retention on the orbax store (checkpoints are directories)."""
    from roomnet_tpu.params.orbax_io import OrbaxCheckpointStore

    store = OrbaxCheckpointStore(str(tmp_path), async_save=False)
    for step, acc in [(1, "0.4"), (2, "0.9"), (3, "0.5")]:
        store.save(variables, step, suffix=acc)
    store.prune(1)
    steps = [s for s, _, _ in store.list_checkpoints()]
    assert steps == [2, 3]  # newest + best
    loaded_flat, step = store.load(cfg=TINY)
    assert step == 3 and loaded_flat

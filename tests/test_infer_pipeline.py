"""Directory-inference pipeline on the tiny config: batching, padding,
unreadable files, xls/class-dir outputs (reference infer.py:65-100 parity)."""

import os

import jax
import numpy as np
import pytest

from roomnet_tpu.infer.classify import (
    RoomNetClassifier,
    classify_im_dir,
    groundtruth_validation,
)
from roomnet_tpu.models.roomnet import init_variables
from roomnet_tpu.utils.xls import read_labels_biff2
from tests.tiny import TINY

cv2 = pytest.importorskip("cv2")

LABELS4 = ["A", "B", "C", "D"]


@pytest.fixture(scope="module")
def classifier():
    variables = init_variables(jax.random.PRNGKey(0), TINY)
    return RoomNetClassifier(
        variables, TINY, batch_size=4, class_labels=LABELS4
    )


def _write_images(d, n, side=48):
    os.makedirs(d, exist_ok=True)
    rng = np.random.RandomState(0)
    paths = []
    for i in range(n):
        p = os.path.join(d, f"photo {i}.png")
        cv2.imwrite(p, rng.randint(0, 255, (side + i, side, 3), np.uint8))
        paths.append(p)
    return paths


def test_padding_invariance(classifier, tmp_path):
    """Predictions must not depend on batch padding: 6 images through
    batch_size 4 (one ragged batch) == one-by-one."""
    paths = _write_images(str(tmp_path / "imgs"), 6)
    ids_batch, confs_batch, ok = classifier.predict_paths(paths)
    assert ok.all()
    singles = [classifier.predict_paths([p]) for p in paths]
    for i, (sid, sconf, _) in enumerate(singles):
        assert ids_batch[i] == sid[0]
        # batch-size-dependent XLA scheduling wiggles the last ulp or two
        np.testing.assert_allclose(confs_batch[i], sconf[0], rtol=1e-4, atol=1e-5)


def test_bmp_classified_on_native_backend(classifier, tmp_path):
    """Backend presence must not change which images get classified: the
    native data-plane is JPEG/PNG-only, so BMP (cv2-decodable) must be
    classified via the per-image cv2 fallback, both single and batched."""
    from roomnet_tpu.data import native

    if not native.available():
        pytest.skip("native library not built")
    d = str(tmp_path / "bmp")
    os.makedirs(d)
    rng = np.random.RandomState(1)
    bmp = os.path.join(d, "img.bmp")
    cv2.imwrite(bmp, rng.randint(0, 255, (40, 56, 3), np.uint8))
    assert native.probe(bmp) is None  # native really can't read it
    png = _write_images(d, 2)
    ids, confs, ok = classifier.predict_paths(png + [bmp])
    assert ok.all(), ok
    assert ids[2] >= 0


def test_predict_paths_empty_list(classifier):
    ids, confs, ok = classifier.predict_paths([])
    assert ids.shape == (0,) and confs.shape == (0, len(LABELS4))
    assert ok.shape == (0,)


def test_groundtruth_validation_skips_unreadable(classifier, tmp_path):
    """Unreadable rows in the list file are excluded from scoring (the
    reference would crash in cv2; we drop them like predict_paths does)."""
    d = str(tmp_path / "imgs")
    paths = _write_images(d, 3)
    bad = os.path.join(d, "corrupt.jpg")
    with open(bad, "w") as f:
        f.write("nope")
    ids, _, _ = classifier.predict_paths(paths)
    lst = tmp_path / "list.txt"
    with open(lst, "w") as f:
        for p, i in zip(paths, ids):
            f.write(f"{p} {int(i)}\n")
        f.write(f"{bad} 0\n")
    from roomnet_tpu.infer.classify import groundtruth_validation

    stats = groundtruth_validation(classifier, str(lst))
    assert stats["accuracy"] == 1.0  # the bad row didn't dilute the score


def test_unreadable_files_skipped(classifier, tmp_path):
    d = str(tmp_path / "mix")
    paths = _write_images(d, 3)
    bad = os.path.join(d, "corrupt.jpg")
    with open(bad, "w") as f:
        f.write("not an image")
    ids, confs, ok = classifier.predict_paths(paths + [bad])
    assert ok[:3].all() and not ok[3]
    assert ids[3] == -1


def test_classify_im_dir_outputs(classifier, tmp_path):
    d = str(tmp_path / "imgs")
    _write_images(d, 5)
    xl = classify_im_dir(classifier, d, overlay=False, progress=False)
    assert os.path.exists(xl)
    cells = read_labels_biff2(xl)
    assert cells[(0, 0)] == "IMAGE_NAME" and cells[(0, 1)] == "PREDICTED_LABEL"
    # every image appears in the sheet and landed in exactly one class dir
    out_dir = d.rstrip(os.sep) + "_classified"
    binned = []
    for lbl in LABELS4:
        assert os.path.isdir(os.path.join(out_dir, lbl))
        binned += os.listdir(os.path.join(out_dir, lbl))
    assert sorted(binned) == sorted(f"photo {i}.png" for i in range(5))
    rows = {cells[(r, 0)]: cells[(r, 1)] for (r, c) in cells if r > 0 and c == 0}
    assert len(rows) == 5
    for fname, lbl in rows.items():
        assert fname in binned and lbl in LABELS4
    # confidence column parses as float in (0, 1]
    confs = [float(cells[(r, 2)]) for (r, c) in cells if r > 0 and c == 2]
    assert all(0 < v <= 1 for v in confs)


def test_classify_im_dir_overlay_writes_annotated_copies(classifier, tmp_path):
    d = str(tmp_path / "imgs")
    paths = _write_images(d, 2, side=64)
    classify_im_dir(classifier, d, overlay=True, progress=False)
    out_dir = d.rstrip(os.sep) + "_classified"
    found = 0
    for lbl in LABELS4:
        for f in os.listdir(os.path.join(out_dir, lbl)):
            im = cv2.imread(os.path.join(out_dir, lbl, f))
            assert im is not None
            src = cv2.imread(os.path.join(d, f))
            assert im.shape == src.shape
            found += 1
            # overlay modifies pixels (text drawn)
            assert not np.array_equal(im, src)
    assert found == 2


def test_device_resize_side_matches_host_resize(classifier, tmp_path):
    """device_resize_side (round-3 review item #8): the host ships
    intermediate-side uint8 and the device runs the final half-pixel
    resample (ops/resize.py). General sources go through a two-step
    resample chain whose aliasing differs from the host's single-step
    resize (documented, PERF round 4) — here the argmax must still agree
    on smooth content and confidences stay close."""
    variables = classifier.variables
    dev = RoomNetClassifier(
        variables, TINY, batch_size=4, class_labels=LABELS4,
        device_resize_side=2 * TINY.im_side,
    )
    assert dev.host_side == 2 * TINY.im_side
    paths = _write_images(str(tmp_path / "imgs"), 6, side=96)
    ids_host, confs_host, ok_h = classifier.predict_paths(paths)
    ids_dev, confs_dev, ok_d = dev.predict_paths(paths)
    assert ok_h.all() and ok_d.all()
    np.testing.assert_array_equal(ids_host, ids_dev)
    np.testing.assert_allclose(confs_host, confs_dev, atol=0.05)


def test_device_resize_exact_when_source_is_intermediate_side(
    classifier, tmp_path
):
    """The EXACT-parity case: the cropped source already equals
    device_resize_side, so the host pipeline ships it untouched and the
    device's half-pixel resample is the ONLY resample — matching the host
    path's single cv2.resize to ±1 uint8 LSB. Confidences must agree
    tightly and argmax exactly."""
    variables = classifier.variables
    inter = 2 * TINY.im_side
    dev = RoomNetClassifier(
        variables, TINY, batch_size=4, class_labels=LABELS4,
        device_resize_side=inter,
    )
    d = str(tmp_path / "exact")
    os.makedirs(d)
    rng = np.random.RandomState(3)
    paths = []
    for i in range(5):
        p = os.path.join(d, f"im_{i}.png")  # already square at inter side
        cv2.imwrite(p, rng.randint(0, 255, (inter, inter, 3), np.uint8))
        paths.append(p)
    ids_host, confs_host, _ = classifier.predict_paths(paths)
    ids_dev, confs_dev, _ = dev.predict_paths(paths)
    np.testing.assert_array_equal(ids_host, ids_dev)
    np.testing.assert_allclose(confs_host, confs_dev, atol=0.02)


def test_device_resize_side_must_exceed_im_side():
    with pytest.raises(ValueError, match="must exceed"):
        RoomNetClassifier(
            init_variables(jax.random.PRNGKey(0), TINY), TINY,
            device_resize_side=TINY.im_side,
        )


def test_decode_stage_failure_raises_not_hangs(classifier, tmp_path,
                                               monkeypatch):
    """A decoder-stage exception (not a per-image decode failure — those
    return None rows) must propagate out of predict_paths promptly. The
    hazard: queued stage futures blocking forever on the depth semaphore
    while the executor shutdown waits on them — a deadlock, not an error."""
    import threading
    import time

    paths = _write_images(str(tmp_path / "imgs"), 20)
    from roomnet_tpu.data import native

    monkeypatch.setattr(native, "available", lambda: False)

    def exploding_load(fpath):
        raise RuntimeError("simulated decoder backend failure")

    monkeypatch.setattr(classifier, "_load", exploding_load)
    out = {}

    def run():
        try:
            classifier.predict_paths(paths)
            out["r"] = "returned"
        except RuntimeError as e:
            out["r"] = str(e)

    t = threading.Thread(target=run, daemon=True)
    t0 = time.monotonic()
    t.start()
    t.join(timeout=20)
    assert not t.is_alive(), "predict_paths hung on decoder failure"
    assert out["r"] == "simulated decoder backend failure"
    assert time.monotonic() - t0 < 15


def test_groundtruth_validation(classifier, tmp_path):
    d = str(tmp_path / "imgs")
    paths = _write_images(d, 4)
    lst = tmp_path / "list.txt"
    ids, _, _ = classifier.predict_paths(paths)
    with open(lst, "w") as f:
        for p, i in zip(paths, ids):
            f.write(f"{p} {int(i)}\n")
    stats = groundtruth_validation(classifier, str(lst))
    assert stats["accuracy"] == 1.0
    assert set(stats) == {"accuracy", "precisions", "recalls", "f-scores"}


def test_evaluate_checkpoints_sweeps_and_picks_best(classifier, tmp_path):
    """eval-ckpts re-scores every checkpoint in a dir against ONE list
    file: ground truth built from checkpoint A's predictions must rank A
    (accuracy 1.0) above a different-weights checkpoint, include marker
    checkpoints ('interrupt') that carry no filename accuracy, and parse
    the name accuracy where present (legacy_plotter.py:19-37 contrast)."""
    from roomnet_tpu.infer.classify import evaluate_checkpoints
    from roomnet_tpu.params.checkpoint import CheckpointStore

    d = str(tmp_path / "imgs")
    paths = _write_images(d, 6)
    from roomnet_tpu.params import schema

    var_a = classifier.variables
    # B = A with the head's output units rolled: an exact logit
    # permutation, so every argmax shifts by one class — deterministically
    # 0.0 accuracy on A-labeled ground truth (a second random init can
    # coincidentally tie A).
    flat_b = schema.flatten_variables(jax.device_get(var_a))
    flat_b["dense/2/kernel"] = np.roll(flat_b["dense/2/kernel"], 1, axis=1)
    flat_b["dense/2/bias"] = np.roll(flat_b["dense/2/bias"], 1)
    var_b = schema.unflatten_variables(flat_b, TINY)
    store = CheckpointStore(str(tmp_path / "ckpts"))
    store.save(var_b, 100, suffix="0.5000")
    store.save(var_a, 200, suffix="0.9000")
    store.save(var_b, 300, suffix="interrupt")
    ids, _, _ = classifier.predict_paths(paths)
    lst = tmp_path / "list.txt"
    with open(lst, "w") as f:
        for p, i in zip(paths, ids):
            f.write(f"{p} {int(i)}\n")
    out = evaluate_checkpoints(str(tmp_path / "ckpts"), str(lst), TINY,
                               batch_size=4, class_labels=LABELS4)
    steps = [e["step"] for e in out["checkpoints"]]
    assert steps == [100, 200, 300]
    by_step = {e["step"]: e for e in out["checkpoints"]}
    assert by_step[200]["accuracy"] == 1.0
    assert by_step[100]["accuracy"] == 0.0  # rolled head: every argmax off
    assert by_step[100]["name_accuracy"] == 0.5
    assert by_step[300]["name_accuracy"] is None  # 'interrupt' marker
    # same weights -> same score, regardless of position in the sweep
    assert by_step[300]["accuracy"] == by_step[100]["accuracy"]
    assert out["best"]["step"] == 200
    # empty dir raises instead of returning a silent empty report
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        evaluate_checkpoints(str(tmp_path / "nothing"), str(lst), TINY)
    # orbax-backend sweep (auto-detected from the dir contents): the
    # trainer's other checkpoint store gets the same model selection
    from roomnet_tpu.params.orbax_io import OrbaxCheckpointStore

    ostore = OrbaxCheckpointStore(str(tmp_path / "orbax"), async_save=False)
    ostore.save(var_b, 10, suffix="0.1000")
    ostore.save(var_a, 20, suffix="0.8000")
    out_o = evaluate_checkpoints(str(tmp_path / "orbax"), str(lst), TINY,
                                 batch_size=4, class_labels=LABELS4)
    assert [e["step"] for e in out_o["checkpoints"]] == [10, 20]
    assert out_o["best"]["step"] == 20
    assert out_o["best"]["accuracy"] == 1.0
    # mesh-sharded sweep: replicated weight placement, same scores
    if len(jax.devices()) >= 8:
        from roomnet_tpu.parallel.mesh import make_mesh

        out_m = evaluate_checkpoints(str(tmp_path / "ckpts"), str(lst), TINY,
                                     batch_size=8, mesh=make_mesh(8, 1),
                                     class_labels=LABELS4)
        assert ([e["accuracy"] for e in out_m["checkpoints"]]
                == [e["accuracy"] for e in out["checkpoints"]])
        assert out_m["best"]["step"] == 200


def test_classifier_sharded_over_mesh(tmp_path):
    """Directory inference sharded over the 'data' axis of an 8-device mesh
    produces the same labels as the single-device path (SURVEY.md §2.4:
    'shard the image list across chips')."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from roomnet_tpu.parallel.mesh import make_mesh

    variables = init_variables(jax.random.PRNGKey(0), TINY)
    plain = RoomNetClassifier(variables, TINY, batch_size=8, class_labels=LABELS4)
    sharded = RoomNetClassifier(
        variables, TINY, batch_size=8, class_labels=LABELS4, mesh=make_mesh(8, 1)
    )
    paths = _write_images(str(tmp_path / "imgs"), 10)
    ids_a, confs_a, ok_a = plain.predict_paths(paths)
    ids_b, confs_b, ok_b = sharded.predict_paths(paths)
    np.testing.assert_array_equal(ids_a, ids_b)
    np.testing.assert_allclose(confs_a, confs_b, rtol=1e-5, atol=1e-6)


def test_overlay_falls_back_to_copy_when_cv2_cannot_reread(
    classifier, tmp_path, monkeypatch
):
    """A file the prediction path decoded (e.g. via the native JPEG backend)
    that cv2.imread can't re-read at overlay time must be copied
    unannotated with a warning — not crash with AttributeError on
    im.shape (round-3 review weak item #4; reference anchor infer.py:87-95).

    Simulated by failing cv2.imread for one path AFTER prediction ran —
    exactly the native-decodes/cv2-doesn't asymmetry."""
    d = str(tmp_path / "imgs")
    paths = _write_images(d, 3)
    victim = paths[1]
    real_imread = cv2.imread
    armed = {"on": False}  # arm only AFTER prediction decode succeeded

    def flaky_imread(p, *a, **kw):
        if armed["on"] and os.path.abspath(p) == os.path.abspath(victim):
            return None
        return real_imread(p, *a, **kw)

    real_predict = classifier.predict_paths

    def predict_then_arm(fpaths):
        out = real_predict(fpaths)
        armed["on"] = True
        return out

    monkeypatch.setattr(cv2, "imread", flaky_imread)
    monkeypatch.setattr(classifier, "predict_paths", predict_then_arm)
    with pytest.warns(UserWarning, match="overlay skipped"):
        xl = classify_im_dir(classifier, d, overlay=True, progress=False)
    out_dir = d.rstrip(os.sep) + "_classified"
    binned = {}
    for lbl in LABELS4:
        for f in os.listdir(os.path.join(out_dir, lbl)):
            binned[f] = os.path.join(out_dir, lbl, f)
    # all three images landed in class dirs; the victim is a byte-identical
    # raw copy (unannotated), the others are annotated (pixels differ)
    assert sorted(binned) == sorted(os.path.basename(p) for p in paths)
    victim_out = binned[os.path.basename(victim)]
    assert open(victim_out, "rb").read() == open(victim, "rb").read()
    # and the xls still carries every row
    cells = read_labels_biff2(xl)
    names = {cells[(r, 0)] for (r, c) in cells if r > 0 and c == 0}
    assert names == {os.path.basename(p) for p in paths}


def test_overlay_write_failure_falls_back_to_copy(classifier, tmp_path):
    """cv2.imwrite has no encoder for an extensionless output name, so the
    annotated WRITE fails even though the re-read succeeded. Same contract
    as a failed re-read: warn + raw copy, never crash, results flushed."""
    d = str(tmp_path / "imgs")
    paths = _write_images(d, 2)
    # an extensionless source: decodes fine from bytes, but
    # cv2.imwrite(dst/<name with no extension>) cannot pick an encoder
    rng = np.random.RandomState(7)
    ok_enc, buf = cv2.imencode(".png", rng.randint(0, 255, (50, 48, 3), np.uint8))
    assert ok_enc
    victim = os.path.join(d, "noext_photo")
    with open(victim, "wb") as f:
        f.write(buf.tobytes())
    paths.append(victim)
    with pytest.warns(UserWarning, match="overlay skipped"):
        xl = classify_im_dir(classifier, d, overlay=True, progress=False)
    out_dir = d.rstrip(os.sep) + "_classified"
    binned = {}
    for lbl in LABELS4:
        sub = os.path.join(out_dir, lbl)
        for f in (os.listdir(sub) if os.path.isdir(sub) else []):
            binned[f] = os.path.join(sub, f)
    assert sorted(binned) == sorted(os.path.basename(p) for p in paths)
    # the victim is a byte-identical raw copy; results carry every row
    assert (open(binned["noext_photo"], "rb").read()
            == open(victim, "rb").read())
    cells = read_labels_biff2(xl)
    names = {cells[(r, 0)] for (r, c) in cells if r > 0 and c == 0}
    assert names == {os.path.basename(p) for p in paths}


def test_classify_im_dir_writes_csv_twin(classifier, tmp_path):
    import csv as csvmod

    d = str(tmp_path / "imgs")
    _write_images(d, 3)
    classify_im_dir(classifier, d, overlay=False, progress=False)
    csv_path = d.rstrip(os.sep) + "_classified_results.csv"
    with open(csv_path) as f:
        rows = list(csvmod.reader(f))
    assert rows[0] == ["IMAGE_NAME", "PREDICTED_LABEL", "CONFIDENCE"]
    assert len(rows) == 4
    assert all(r[1] in LABELS4 and 0 < float(r[2]) <= 1 for r in rows[1:])

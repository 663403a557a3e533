"""Val-scale parity oracle (round-3 review item #1).

The reference's north star is "identical class predictions on the
1839-image validation set, 88.9% preserved" (/root/reference/README.md:3).
Its val images are not redistributable, but the frozen TF graph is the
oracle (SURVEY.md §4): tools/valset.py deterministically regenerates an
1839-image val-scale JPEG set, and tests/golden/valset_golden.npz holds
the frozen graph's argmax for every image — computed on the SAME decoded
pixels the classifier's own preprocess produces, for BOTH decode backends
(cv2 and the native C++ data-plane).

Default suite: a 192-image subsample through the full classify_im_dir
path (JPEG -> decode -> device -> xls/csv), argmax exact, plus the f32
logits subsample at <=1e-4. The full-1839 run (f32 exact everywhere +
bf16 flip rate) is env-gated: FULL_VALSET_PARITY=1 — it is executed on
the TPU each round and its numbers quoted in PERF.md/README.
"""

import os
import sys

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "valset_golden.npz")
TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")

pytestmark = pytest.mark.skipif(
    not os.path.exists(GOLDEN),
    reason="valset fixture missing (tools/make_golden.py --valset-only)",
)

cv2 = pytest.importorskip("cv2")


def _valset_mod():
    if TOOLS not in sys.path:
        sys.path.insert(0, TOOLS)
    import valset

    return valset


@pytest.fixture(scope="module")
def golden():
    return dict(np.load(GOLDEN))


def _backend_key(golden):
    from roomnet_tpu.data import native

    if native.available() and "argmax_native" in golden:
        return "argmax_native"
    return "argmax_cv2"


@pytest.fixture(scope="module")
def valset_subsample(tmp_path_factory, golden):
    """192 deterministic images: the 64 logits-sample indices + 128 more,
    regenerated in O(subset) via per-image RNG."""
    valset = _valset_mod()
    # A fixture built with documentation crops (kinds 11-12) cannot be
    # regenerated identically without /root/reference/documentation —
    # skip loudly rather than reporting phantom parity mismatches.
    if (int(golden.get("used_doc_pngs", np.int8(1)))
            and not valset.doc_dir_available()):
        pytest.skip("fixture was built with reference documentation crops; "
                    "that directory is unavailable here")
    fixed = set(int(i) for i in golden["logits_sample_idx"]) | {0, 11}
    rng = np.random.RandomState(42)
    rest = rng.choice(
        np.setdiff1d(np.arange(valset.N_IMAGES), sorted(fixed)),
        192 - len(fixed), replace=False,
    )
    idx = np.array(sorted(fixed | set(int(i) for i in rest)))
    d = str(tmp_path_factory.mktemp("valset"))
    paths = valset.build_valset_jpegs(d, indices=idx.tolist())
    # Drift guards: image 0 pins the JPEG encoder + procedural generator;
    # image 11 (first doc crop) pins the external reference-PNG content.
    want_sha = bytes(golden["first_jpeg_sha256"]).hex()
    assert valset.first_image_sha256(paths) == want_sha, (
        "JPEG encoder drifted — regenerate the valset fixture"
    )
    if "doc_jpeg_sha256" in golden:
        p11 = paths[idx.tolist().index(11)]
        assert valset.file_sha256(p11) == bytes(golden["doc_jpeg_sha256"]).hex(), (
            "reference documentation PNGs changed — regenerate the fixture"
        )
    return idx, paths


def test_subsample_e2e_argmax_exact(golden, valset_subsample, converted_variables,
                                    tmp_path):
    """192 images through the FULL directory pipeline (decode backend ->
    device batches -> csv/xls/class dirs): every prediction must equal the
    frozen TF graph's argmax on the same pixels (f32 parity mode)."""
    import csv

    from roomnet_tpu import CLASS_LABELS
    from roomnet_tpu.infer.classify import RoomNetClassifier, classify_im_dir

    idx, paths = valset_subsample
    want = golden[_backend_key(golden)][idx]
    clf = RoomNetClassifier(converted_variables, batch_size=64)
    imgs_dir = os.path.dirname(paths[0])
    xl = classify_im_dir(clf, imgs_dir, overlay=False,
                         out_dir=str(tmp_path / "out"), progress=False)
    csv_path = os.path.splitext(xl)[0] + ".csv"
    got = {}
    with open(csv_path) as f:
        for row in list(csv.reader(f))[1:]:
            got[row[0]] = CLASS_LABELS.index(row[1])
    assert len(got) == len(paths)
    got_ids = np.array([got[os.path.basename(p)] for p in paths])
    n_miss = int((got_ids != want).sum())
    assert n_miss == 0, f"{n_miss}/{len(paths)} argmax mismatches vs TF graph"


def test_logits_subsample_close(golden, valset_subsample, converted_variables):
    """f32 logits on the 64 sampled images <= 1e-4 vs the TF graph
    (measured 2e-6 scale; the fixture's logits come from cv2-decoded
    pixels, so decode via the same path)."""
    import jax

    from roomnet_tpu.models.roomnet import forward, normalize_bgr_uint8

    valset = _valset_mod()
    idx, paths = valset_subsample
    pos = {int(i): p for i, p in zip(idx, paths)}
    spaths = [pos[int(i)] for i in golden["logits_sample_idx"]]
    px = valset.decode_cv2(spaths)
    logits = np.asarray(
        jax.jit(lambda v, x: forward(v, x))(
            converted_variables, normalize_bgr_uint8(px)
        )
    )
    np.testing.assert_allclose(logits, golden["logits_sample"], atol=1e-4)


def test_golden_covers_all_classes(golden):
    """The oracle must exercise every class (round-2 wide batch hit 5/6)."""
    hist = np.bincount(golden["argmax_cv2"].astype(np.int64), minlength=6)
    assert (hist > 0).all(), hist
    assert len(golden["argmax_cv2"]) >= 1839


@pytest.mark.skipif(not os.environ.get("FULL_VALSET_PARITY"),
                    reason="full 1839-image run: set FULL_VALSET_PARITY=1 "
                           "(executed on the TPU each round; see PERF.md)")
def test_full_valset_parity(golden, converted_variables, tmp_path):
    """All 1839 images: f32 argmax exact; bf16 serving-mode flip rate
    pinned < 1% (measured: 12/1839 = 0.65% on CPU, see PERF.md for the
    TPU number — the valset is deliberately boundary-heavy: 1% of images
    have top-2 logit margin < 0.08, the bf16 mode's max logit deviation,
    so sub-percent flips are the honest design point, not a defect)."""
    from roomnet_tpu.infer.classify import RoomNetClassifier
    from roomnet_tpu.models.roomnet import FAST_CONFIG

    valset = _valset_mod()
    paths = valset.build_valset_jpegs(str(tmp_path / "full"))
    want = dict(np.load(GOLDEN))[_backend_key(golden)]
    clf = RoomNetClassifier(converted_variables, batch_size=64)
    ids, _, ok = clf.predict_paths(paths)
    assert ok.all()
    n_miss = int((ids != want).sum())
    assert n_miss == 0, f"f32: {n_miss}/1839 argmax mismatches"
    clf_bf16 = RoomNetClassifier(converted_variables, FAST_CONFIG, batch_size=64)
    ids16, _, ok = clf_bf16.predict_paths(paths)
    assert ok.all()
    flips = int((ids16 != want).sum())
    print(f"bf16 flip rate: {flips}/1839 = {100 * flips / 1839:.3f}%")
    assert flips / 1839 < 0.01, f"bf16 flips {flips}/1839"

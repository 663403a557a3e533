"""Data pipeline: crops, feeder epoch accounting, determinism, edge cases."""

import os

import numpy as np
import pytest

from roomnet_tpu.data.dataset import extract_fpaths, parse_list_line
from roomnet_tpu.data.loader import TrainFeeder, center_crop, random_sliding_square_crop

cv2 = pytest.importorskip("cv2")


def _write_imgs(root, cls, n, hw=(40, 60)):
    d = root / cls
    d.mkdir(parents=True, exist_ok=True)
    paths = []
    for i in range(n):
        p = str(d / f"im {i}.png")  # space in name: list format must survive
        cv2.imwrite(p, np.full((*hw, 3), i * 10 % 255, np.uint8))
        paths.append(p)
    return paths


def test_center_crop_geometry():
    """Same offset math as reference generator.py:69-78."""
    im = np.arange(5 * 9 * 3).reshape(5, 9, 3).astype(np.uint8)
    c = center_crop(im)
    assert c.shape == (5, 5, 3)
    np.testing.assert_array_equal(c, im[:, 2:7])
    im2 = np.arange(9 * 5 * 3).reshape(9, 5, 3).astype(np.uint8)
    assert center_crop(im2).shape == (5, 5, 3)
    sq = np.zeros((4, 4, 3), np.uint8)
    np.testing.assert_array_equal(center_crop(sq), sq)


def test_random_sliding_crop_is_square_and_in_bounds():
    rng = np.random.RandomState(0)
    im = np.arange(7 * 12 * 3).reshape(7, 12, 3).astype(np.uint8)
    for _ in range(20):
        c = random_sliding_square_crop(im, rng)
        assert c.shape == (7, 7, 3)
    im_t = im.transpose(1, 0, 2)
    for _ in range(20):
        assert random_sliding_square_crop(im_t, rng).shape == (7, 7, 3)


def test_extract_fpaths_balanced_split(tmp_path):
    """Per-class train size = 90% of smallest class (reference train.py:84-88);
    unreadable images dropped up front (train.py:44-51)."""
    data = tmp_path / "data"
    _write_imgs(data, "Kitchen", 10)
    _write_imgs(data, "Bedroom", 20)
    bad = data / "Kitchen" / "broken.jpg"
    bad.write_text("nope")
    train_txt, val_txt = extract_fpaths(
        str(data),
        str(tmp_path / "train.txt"),
        str(tmp_path / "val.txt"),
        str(tmp_path / "labels.json"),
        seed=0,
    )
    # smallest class = 10 readable -> train 9/class -> 18 total
    assert len(train_txt) == 18
    pairs = [parse_list_line(l) for l in train_txt]
    assert all(os.path.exists(p) for p, _ in pairs)
    labels = [c for _, c in pairs]
    assert labels.count(0) == 9 and labels.count(1) == 9
    assert not any("broken" in p for p, _ in pairs)
    # warm path: second call reuses files verbatim
    train2, _ = extract_fpaths(
        str(data), str(tmp_path / "train.txt"), str(tmp_path / "val.txt"),
        str(tmp_path / "labels.json"), seed=123,
    )
    assert train2 == train_txt


def test_feeder_epoch_accounting_and_shapes(tmp_path):
    paths = _write_imgs(tmp_path / "d", "c0", 7)
    lines = [f"{p} 0\n" for p in paths]
    with TrainFeeder(lines, batch_size=3, im_side=16, shuffle=False,
                     random_crop=False, preprocess=False, seed=1) as f:
        assert f.batches_per_epoch == 2  # 7 // 3, tail dropped
        x, y = f.dequeue()
        assert x.shape == (3, 16, 16, 3) and x.dtype == np.uint8
        assert y.shape == (3,)
        assert f.train_state["epoch"] == 1 and f.train_state["batch"] == 1
        assert not f.train_state["previous_epoch_done"]
        f.dequeue()
        # first batch of epoch 2 flags the previous epoch done
        f.dequeue()
        assert f.train_state["previous_epoch_done"]
        assert f.train_state["epoch"] == 2


def test_feeder_deterministic_given_seed(tmp_path):
    paths = _write_imgs(tmp_path / "d", "c0", 6, hw=(50, 30))
    lines = [f"{p} 0\n" for p in paths]

    def first_two(seed):
        with TrainFeeder(lines, batch_size=3, im_side=16, shuffle=True,
                         random_crop=True, preprocess=True, seed=seed) as f:
            a = f.dequeue()
            b = f.dequeue()
            return a, b

    (a1, _), (b1, _) = first_two(7)
    (a2, _), (b2, _) = first_two(7)
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_array_equal(b1, b2)
    (a3, _), _ = first_two(8)
    assert not np.array_equal(a1, a3)


def test_feeder_rows_slice_matches_full_batch(tmp_path):
    """Sharded feed (rows=(lo, hi)): the slice must be row-identical to
    rows lo..hi of the replicated full batch — same epoch order, same
    per-row crop/flip draws (RNG keyed to the GLOBAL row index)."""
    paths = _write_imgs(tmp_path / "d", "c0", 12, hw=(50, 30))
    lines = [f"{p} {i % 3}\n" for i, p in enumerate(paths)]

    def batches(rows, n=3):
        with TrainFeeder(lines, batch_size=6, im_side=16, shuffle=True,
                         random_crop=True, preprocess=True, seed=5,
                         rows=rows) as f:
            return [f.dequeue() for _ in range(n)]

    full = batches(None)
    lo_half = batches((0, 3))
    hi_half = batches((3, 6))
    for (xf, yf), (xa, ya), (xb, yb) in zip(full, lo_half, hi_half):
        np.testing.assert_array_equal(xf[:3], xa)
        np.testing.assert_array_equal(yf[:3], ya)
        np.testing.assert_array_equal(xf[3:], xb)
        np.testing.assert_array_equal(yf[3:], yb)


def test_feeder_rows_validation():
    with pytest.raises(ValueError, match="out of range"):
        TrainFeeder(["x 0\n", "y 1\n"], batch_size=2, rows=(0, 3),
                    start=False)


def test_feeder_skips_unreadable(tmp_path):
    paths = _write_imgs(tmp_path / "d", "c0", 4)
    bad = tmp_path / "d" / "c0" / "bad.jpg"
    bad.write_text("x")
    lines = [f"{p} 0\n" for p in paths[:2]] + [f"{bad} 0\n", f"{paths[2]} 0\n"]
    with TrainFeeder(lines, batch_size=4, im_side=8, shuffle=False,
                     random_crop=False, preprocess=False) as f:
        x, y = f.dequeue()
        assert x.shape[0] == 3  # bad image dropped, batch shrinks


def test_feeder_flags_fully_unreadable_batch(tmp_path):
    """Whole batch unreadable: the feeder keeps the shape contract with a
    fabricated zero batch but FLAGS it synthetic so consumers skip it —
    neither a gradient step nor val accuracy may see fake rows (ADVICE r2)."""
    d = tmp_path / "d"
    d.mkdir()
    bads = []
    for i in range(4):
        p = d / f"bad{i}.jpg"
        p.write_text("not an image")
        bads.append(str(p))
    lines = [f"{p} 0\n" for p in bads]
    with TrainFeeder(lines, batch_size=4, im_side=8, shuffle=False,
                     random_crop=False, preprocess=False) as f:
        x, y = f.dequeue()
        assert x.shape == (4, 8, 8, 3) and not x.any()
        assert f.last_batch_synthetic and f.train_state["synthetic"]
    # mixed batch with >=1 readable row is NOT synthetic
    good = _write_imgs(tmp_path / "g", "c0", 1)
    with TrainFeeder([f"{good[0]} 0\n"] + lines[:3], batch_size=4, im_side=8,
                     shuffle=False, random_crop=False, preprocess=False) as f:
        x, y = f.dequeue()
        assert x.shape[0] == 1 and not f.last_batch_synthetic


def test_feeder_rejects_empty_list():
    with pytest.raises(ValueError, match="no usable paths"):
        TrainFeeder(["", "\n"], batch_size=4, im_side=8, start=False)


def test_parse_list_line_with_spaces():
    p, c = parse_list_line("C:\\data\\Living Room\\img 1.jpg 5\n")
    assert p == "C:\\data\\Living Room\\img 1.jpg" and c == 5


def test_native_and_cv2_backends_agree(tmp_path):
    """Same seed -> same crop/flip draws -> near-identical pixels from the
    C++ fused pipeline (csrc/roomnet_io.cpp) and the cv2 fallback."""
    from roomnet_tpu.data import native
    from roomnet_tpu.data.loader import load_and_preprocess

    if not native.available():
        pytest.skip("native library not built (make -C csrc)")
    p = _write_imgs(tmp_path / "d", "c0", 1, hw=(70, 50))[0]
    for kwargs in [
        dict(random_crop=False, augment=False),
        dict(random_crop=True, augment=True),
    ]:
        a = load_and_preprocess(p, 32, rng=np.random.RandomState(5),
                                use_native=True, **kwargs)
        b = load_and_preprocess(p, 32, rng=np.random.RandomState(5),
                                use_native=False, **kwargs)
        diff = np.abs(a.astype(int) - b.astype(int))
        assert diff.max() <= 1, diff.max()  # float vs cv2 fixed-point rounding


def test_native_backend_falls_back_to_cv2_for_bmp(tmp_path):
    """The native library is JPEG/PNG-only; cv2-decodable formats (BMP) must
    still load — per-image fallback, identical dataset coverage on both
    backends (both single-image and batch paths)."""
    from roomnet_tpu.data import native
    from roomnet_tpu.data.loader import load_and_preprocess

    if not native.available():
        pytest.skip("native library not built")
    d = tmp_path / "d"
    d.mkdir()
    rng = np.random.RandomState(3)
    im = rng.randint(0, 255, (40, 56, 3), np.uint8)
    p = str(d / "img.bmp")
    cv2.imwrite(p, im)
    assert native.probe(p) is None  # native really can't read it
    a = load_and_preprocess(p, 16, random_crop=True, augment=True,
                            rng=np.random.RandomState(5), use_native=True)
    b = load_and_preprocess(p, 16, random_crop=True, augment=True,
                            rng=np.random.RandomState(5), use_native=False)
    np.testing.assert_array_equal(a, b)  # same draws after RNG rewind
    # batch path: the BMP is not dropped
    lines = [f"{p} 1\n"]
    with TrainFeeder(lines, batch_size=1, im_side=16, shuffle=False,
                     random_crop=False, preprocess=False) as f:
        x, y = f.dequeue()
        assert x.shape == (1, 16, 16, 3) and y[0] == 1
        assert x.any()


def test_native_probe_and_decode(tmp_path):
    from roomnet_tpu.data import native

    if not native.available():
        pytest.skip("native library not built")
    p = _write_imgs(tmp_path / "d", "c0", 1, hw=(33, 44))[0]
    assert native.probe(p) == (33, 44)
    assert native.probe(str(tmp_path / "nope.png")) is None
    out = native.load_preprocess(p, None, 16)
    assert out is not None and out.shape == (16, 16, 3)


def test_native_fast_decode_jpeg(tmp_path):
    """DCT-scaled decode: right shape, close to the exact path on smooth
    content, and identical when no downscale applies."""
    from roomnet_tpu.data import native

    if not native.available():
        pytest.skip("native library not built")
    d = tmp_path / "d"
    d.mkdir()
    # smooth gradient content, large source
    yy, xx = np.mgrid[0:1024, 0:1280]
    im = np.stack([(yy // 4) % 256, (xx // 5) % 256, ((yy + xx) // 8) % 256], -1)
    p = str(d / "big.jpg")
    cv2.imwrite(p, im.astype(np.uint8), [cv2.IMWRITE_JPEG_QUALITY, 95])
    exact = native.load_preprocess(p, (128, 0, 1024, 1024), 224)
    fast = native.load_preprocess(p, (128, 0, 1024, 1024), 224, min_decode_side=224)
    assert fast.shape == (224, 224, 3)
    diff = np.abs(exact.astype(int) - fast.astype(int))
    assert diff.mean() < 4.0, diff.mean()
    # source already small: no scaling possible, bit-identical
    small = str(d / "small.jpg")
    cv2.imwrite(small, im[:256, :256].astype(np.uint8))
    a = native.load_preprocess(small, None, 224)
    b = native.load_preprocess(small, None, 224, min_decode_side=224)
    np.testing.assert_array_equal(a, b)

def test_feeder_producer_death_surfaces_in_dequeue(tmp_path):
    """A malformed list line (no numeric label) kills the producer thread;
    dequeue() must raise the recorded cause instead of blocking forever
    (which would read as a device stall)."""
    paths = _write_imgs(tmp_path / "d", "c0", 2)
    lines = [f"{paths[0]} 0\n", "stray-line-without-a-label\n"]
    with TrainFeeder(lines, batch_size=2, im_side=8, shuffle=False,
                     random_crop=False, preprocess=False) as f:
        with pytest.raises(RuntimeError, match="producer thread died"):
            for _ in range(8):  # already-queued good batches drain first
                f.dequeue()

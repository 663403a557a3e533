"""Prefetching data feeder: host decode pool -> bounded queue -> device.

TPU-native redesign of the reference's single-producer `TrainFeeder`
(generator.py:20-177). Differences by design:
  * N decode workers (cv2 releases the GIL) instead of one producer thread;
  * bounded queue with blocking put/get — no busy-wait (the reference
    `dequeue` spins on empty, generator.py:173-177) and no sleep(2) poll;
  * deterministic per-batch RNG derived from (seed, epoch, batch) so runs
    are reproducible — the reference uses global np.random state;
  * optional device prefetch: batches are `jax.device_put` ahead of use so
    the host->HBM copy overlaps the previous step's compute.

Augmentation/crop semantics preserved exactly:
  * train: random sliding square crop (generator.py:52-67), cv2.resize to
    (S,S) INTER_LINEAR, p=.5 horizontal flip, p=.5 vertical flip
    (generator.py:89-92);
  * val: center crop (generator.py:69-78) + resize, no flips;
  * epoch accounting: batches_per_epoch = N // batch_size, tail dropped,
    shuffle at epoch boundaries (generator.py:39, 126-133);
  * `train_state` dict with the same keys (generator.py:48-49, 134-135).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator

import numpy as np

from roomnet_tpu.data.dataset import parse_list_line

__all__ = ["TrainFeeder", "random_sliding_square_crop", "center_crop", "load_and_preprocess"]


def random_sliding_square_crop(im: np.ndarray, rng: np.random.RandomState) -> np.ndarray:
    """Square crop at a random offset along the long side (generator.py:52-67)."""
    h, w = im.shape[:2]
    if h == w:
        return im
    if h < w:
        start = rng.randint(w - h)
        return im[:, start : start + h, :]
    start = rng.randint(h - w)
    return im[start : start + w, :, :]


def center_crop(im: np.ndarray) -> np.ndarray:
    """Centered square crop (generator.py:69-78, network.py:137-146)."""
    h, w = im.shape[:2]
    off = abs((w - h) // 2)
    if h < w:
        return im[:, off : off + h, :]
    if w < h:
        return im[off : off + w, :, :]
    return im


def draw_crop_rect(
    h: int, w: int, *, random_crop: bool, rng: np.random.RandomState
) -> tuple[int, int, int, int]:
    """(cx, cy, cw, ch) square crop — random-sliding (generator.py:52-67) or
    centered (generator.py:69-78). Drawn in Python so the native and cv2
    backends consume the identical RNG sequence."""
    if h == w:
        return 0, 0, w, h
    side = min(h, w)
    if random_crop:
        start = int(rng.randint(max(h, w) - side))
    else:
        start = abs((w - h) // 2)
    if h < w:
        return start, 0, side, side
    return 0, start, side, side


def draw_flips(rng: np.random.RandomState, augment: bool) -> tuple[bool, bool]:
    """p=.5 fliplr then p=.5 flipud, same draw order as generator.py:89-92."""
    if not augment:
        return False, False
    return bool(rng.uniform() > 0.5), bool(rng.uniform() > 0.5)


def load_and_preprocess(
    fpath: str,
    im_side: int,
    *,
    random_crop: bool,
    augment: bool,
    rng: np.random.RandomState,
    use_native: bool | None = None,
) -> np.ndarray | None:
    """Decode + square-crop + resize + optional flips -> HWC uint8 BGR.

    Prefers the native C++ pipeline (csrc/roomnet_io.cpp: fused
    decode->crop->resize->flip, no intermediate copies); falls back to cv2.
    Both backends draw crop/flip randomness from the same RNG sequence, so
    batches are backend-independent given a seed (within 1 LSB of resize
    rounding).
    """
    from roomnet_tpu.data import native

    if use_native is None:
        use_native = native.available()
    if use_native:
        rng_state = rng.get_state()
        probed = native.probe(fpath)
        if probed is not None:
            h, w = probed
            crop = draw_crop_rect(h, w, random_crop=random_crop, rng=rng)
            flip_lr, flip_ud = draw_flips(rng, augment)
            out = native.load_preprocess(fpath, crop, im_side, flip_lr, flip_ud)
            if out is not None:
                return out
        # Native handles JPEG/PNG only — fall through to cv2 per image so
        # formats cv2 can decode (BMP/TIFF/WebP) keep identical dataset
        # coverage on both backends. Rewind the RNG so the cv2 path draws
        # the same (crop, flips) sequence it would have standalone.
        rng.set_state(rng_state)

    import cv2

    im = cv2.imread(fpath)
    if im is None:
        return None
    cx, cy, cw, ch = draw_crop_rect(
        im.shape[0], im.shape[1], random_crop=random_crop, rng=rng
    )
    im = im[cy : cy + ch, cx : cx + cw]
    if im.shape[0] != im_side or im.shape[1] != im_side:
        im = cv2.resize(im, (im_side, im_side))
    flip_lr, flip_ud = draw_flips(rng, augment)
    if flip_lr:
        im = np.fliplr(im)
    if flip_ud:
        im = np.flipud(im)
    return np.ascontiguousarray(im)


class TrainFeeder:
    """Async batch feeder with the reference's public surface.

    API parity: ``dequeue() -> (x_bgr_uint8[B,S,S,3], y[B])`` and a
    ``train_state`` dict {'epoch','batch','total_iters','previous_epoch_done'}
    (generator.py:48-49, 165-177).
    """

    def __init__(
        self,
        fpaths: list[str],
        shuffle: bool = True,
        batch_size: int = 8,
        preprocess: bool = True,
        batches_per_queue: int = 40,
        random_crop: bool = True,
        im_side: int = 300,
        *,
        seed: int = 0,
        decode_workers: int = 8,
        start: bool = True,
        rows: tuple[int, int] | None = None,
    ):
        """rows=(lo, hi): decode ONLY rows lo..hi of every nominal batch —
        the multi-host sharded-feed mode (each process decodes its own
        slice instead of the whole global batch, cutting host decode
        N_processes×). Epoch order, per-row crop/flip RNG, and epoch
        accounting stay keyed to the GLOBAL row index, so the union of
        all processes' slices is exactly the replicated-mode batch."""
        self.fpaths = np.array([l for l in fpaths if l.strip()])
        if len(self.fpaths) == 0:
            raise ValueError(
                "TrainFeeder: no usable paths — the list is empty or blank "
                "(stale/empty train_list.txt / val_list.txt?)"
            )
        self.shuffle = shuffle
        self.random_crop = random_crop
        self.augment = preprocess
        self.im_side = im_side
        self.seed = seed
        self.epoch_size_total = len(self.fpaths)
        self.batch_size = min(batch_size, self.epoch_size_total)
        self.batches_per_epoch = self.epoch_size_total // self.batch_size
        self.epoch_size = self.batch_size * self.batches_per_epoch
        if rows is not None:
            lo, hi = rows
            if not (0 <= lo < hi <= self.batch_size):
                raise ValueError(
                    f"rows {rows} out of range for batch_size "
                    f"{self.batch_size}"
                )
        self.rows = rows
        self.train_state = {
            "epoch": 1,
            "batch": 0,
            "total_iters": 0,
            "previous_epoch_done": False,
            "synthetic": False,
        }
        self.last_batch_synthetic = False
        self._q: queue.Queue = queue.Queue(maxsize=batches_per_queue)
        self._stop = threading.Event()
        self._producer_error: BaseException | None = None
        self._pool = ThreadPoolExecutor(max_workers=decode_workers)
        self._thread = threading.Thread(target=self._producer, daemon=True)
        if start:
            self._thread.start()

    # -- producer ----------------------------------------------------------
    def _epoch_order(self, epoch: int) -> np.ndarray:
        idx = np.arange(self.epoch_size_total)
        if self.shuffle:
            np.random.RandomState((self.seed * 1_000_003 + epoch) & 0x7FFFFFFF).shuffle(idx)
        return idx

    def _item_rng(self, epoch: int, batch_i: int, i: int) -> np.random.RandomState:
        return np.random.RandomState(
            (self.seed * 2_000_003 + epoch * 9_973 + batch_i * 101 + i) & 0x7FFFFFFF
        )

    def _make_batch(self, epoch: int, batch_i: int, order: np.ndarray):
        from roomnet_tpu.data import native

        start = batch_i * self.batch_size
        lines = self.fpaths[order[start : start + self.batch_size]]
        parsed = [parse_list_line(l) for l in lines]
        # Sharded feed: this process decodes only its row slice; row0
        # offsets every per-row RNG draw to the GLOBAL row index so the
        # slice is row-identical to the replicated batch.
        row0 = 0
        if self.rows is not None:
            row0 = self.rows[0]
            parsed = parsed[self.rows[0]: self.rows[1]]

        if native.available():
            # Native fused pipeline: probe headers (threaded), draw
            # crops/flips in Python (identical RNG sequence to the cv2
            # path), then ONE C call fills the contiguous batch buffer
            # with its internal thread pool.
            probes = list(self._pool.map(native.probe, [p for p, _ in parsed]))
            n = len(parsed)
            crops = np.full((n, 4), -1, np.int32)
            flips = np.zeros((n, 2), np.int32)
            for i, pr in enumerate(probes):
                rng = self._item_rng(epoch, batch_i, row0 + i)
                if pr is None:
                    continue
                crops[i] = draw_crop_rect(
                    pr[0], pr[1], random_crop=self.random_crop, rng=rng
                )
                flips[i] = draw_flips(rng, self.augment)
            batch, ok = native.load_preprocess_batch(
                [p for p, _ in parsed], crops, self.im_side, flips
            )
            ok &= np.array([pr is not None for pr in probes])
            xs, ys, paths = [], [], []
            for i in range(n):
                im = batch[i] if ok[i] else None
                if im is None:
                    # Native is JPEG/PNG-only: retry per image through cv2
                    # (fresh per-item RNG — identical draw sequence) so
                    # cv2-decodable formats aren't dropped by this backend.
                    im = load_and_preprocess(
                        parsed[i][0], self.im_side,
                        random_crop=self.random_crop, augment=self.augment,
                        rng=self._item_rng(epoch, batch_i, row0 + i),
                        use_native=False,
                    )
                if im is not None:
                    xs.append(im)
                    ys.append(parsed[i][1])
                    paths.append(parsed[i][0])
        else:

            def one(args):
                i, (path, label) = args
                im = load_and_preprocess(
                    path,
                    self.im_side,
                    random_crop=self.random_crop,
                    augment=self.augment,
                    rng=self._item_rng(epoch, batch_i, row0 + i),
                )
                return im, label, path

            results = list(self._pool.map(one, enumerate(parsed)))
            xs = [r[0] for r in results if r[0] is not None]
            ys = [r[1] for r in results if r[0] is not None]
            paths = [r[2] for r in results if r[0] is not None]
        synthetic = False
        if not xs:  # whole batch unreadable — keep the FULL shape contract
            # (a 1-row batch would change the jit signature, forcing a
            # recompile, and break divisibility under a sharded mesh).
            # The batch is marked synthetic so consumers can SKIP it: a
            # silent gradient step on zeros labeled class 0 (or fake val
            # rows counted toward accuracy) would corrupt the run.
            from roomnet_tpu.utils.logging import get_logger

            get_logger("loader").error(
                "whole batch unreadable (%d files, e.g. %r) — emitting a "
                "synthetic zero batch flagged for skipping",
                len(parsed), parsed[0][0] if parsed else "?",
            )
            synthetic = True
            n_rows = len(parsed) or self.batch_size
            xs = [np.zeros((self.im_side, self.im_side, 3), np.uint8)] * n_rows
            ys = [0] * n_rows
            paths = [""] * n_rows
        return np.stack(xs), np.asarray(ys, np.int32), np.asarray(paths), synthetic

    def _producer(self):
        try:
            self._producer_loop()
        except BaseException as e:  # noqa: BLE001 — surfaced via dequeue()
            # A daemon thread dying silently (e.g. a malformed list line
            # raising in parse_list_line) would leave dequeue() blocked
            # forever and read as a device stall. Record the error so the
            # consumer raises it once the queue drains.
            self._producer_error = e
            from roomnet_tpu.utils.logging import get_logger

            get_logger("loader").error("feeder producer thread died: %r", e)

    def _producer_loop(self):
        epoch = 0
        total = 0
        while not self._stop.is_set():
            order = self._epoch_order(epoch)
            for b in range(self.batches_per_epoch):
                if self._stop.is_set():
                    return
                x, y, paths, synthetic = self._make_batch(epoch, b, order)
                total += 1
                state = {
                    "epoch": epoch + 1,
                    "batch": b + 1,
                    "total_iters": total,
                    # Flag mirrors generator.py:134-135: set on the FIRST
                    # batch of a new epoch (it signals the previous epoch
                    # finished), never on epoch 0.
                    "previous_epoch_done": (b == 0 and epoch > 0),
                    # True when every file in the batch was unreadable and
                    # the rows are fabricated zeros — consumers must skip.
                    "synthetic": synthetic,
                }
                while not self._stop.is_set():
                    try:
                        self._q.put((x, y, paths, state), timeout=0.5)
                        break
                    except queue.Full:
                        continue
            epoch += 1

    # -- consumer ----------------------------------------------------------
    def dequeue(self) -> tuple[np.ndarray, np.ndarray]:
        from roomnet_tpu.utils.logging import get_logger

        while True:
            try:
                # Bounded get: already-produced batches are served first;
                # once the queue drains after a producer death, raise the
                # recorded cause instead of blocking forever.
                x, y, paths, state = self._q.get(timeout=0.5)
                break
            except queue.Empty:
                if self._producer_error is not None:
                    raise RuntimeError(
                        "feeder producer thread died: "
                        f"{self._producer_error!r}"
                    ) from self._producer_error
        self.batch_fpaths = paths
        self.train_state = state
        self.last_batch_synthetic = bool(state.get("synthetic", False))
        if state["previous_epoch_done"]:
            # Epoch-boundary INFO log, like reference generator.py:168-171.
            get_logger("loader").info(
                "EPOCH %d COMPLETE (%d batches/epoch)",
                state["epoch"] - 1,
                self.batches_per_epoch,
            )
        return x, y

    def __iter__(self) -> Iterator[tuple[np.ndarray, np.ndarray]]:
        while True:
            yield self.dequeue()

    def close(self):
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=5)
        self._pool.shutdown(wait=False, cancel_futures=True)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def device_prefetch(iterator, *, size: int = 2, sharding=None):
    """Wrap a host-batch iterator with `jax.device_put` double-buffering.

    Keeps `size` batches in flight on device so the host->HBM DMA overlaps
    step compute (the TPU-native replacement for the reference's host-side
    queue between feeder and session, generator.py:159-163).
    """
    import collections

    import jax

    buf = collections.deque()
    it = iter(iterator)
    try:
        while True:
            while len(buf) < size:
                x, y = next(it)
                buf.append(jax.device_put((x, y), sharding))
            yield buf.popleft()
    except StopIteration:
        while buf:
            yield buf.popleft()

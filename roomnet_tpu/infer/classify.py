"""Batched directory inference: the reference infer.py, device-resident.

Reference behavior preserved (infer.py:65-100):
  * classify every image in a dir; write `.xls` sheet 'classification_results'
    with IMAGE_NAME / PREDICTED_LABEL / confidence columns (infer.py:75-78,
    96-98 — confidence goes to column 2 with no header, faithfully);
  * one output dir per class, each image dropped into its predicted class
    dir — annotated copy (overlay) or raw copy (infer.py:87-95);
  * per-image preprocess: center-crop -> resize(S,S) -> BGR->RGB -> [-1,1]
    (network.py:148-156).

TPU-native redesign: instead of sess.run per image (batch size 1! —
infer.py:82), images stream through a decode thread pool into fixed-size
device batches with a padded final batch; one jitted fused
preprocess+forward+softmax+argmax serves the whole directory.
"""

from __future__ import annotations

import os
import shutil
from concurrent.futures import ThreadPoolExecutor
from glob import glob

import jax
import jax.numpy as jnp
import numpy as np

from roomnet_tpu import CLASS_LABELS
from roomnet_tpu.data.loader import center_crop
from roomnet_tpu.models.roomnet import DEFAULT_CONFIG, forward, normalize_bgr_uint8
from roomnet_tpu.utils.xls import Workbook


def force_makedir(d: str):
    os.makedirs(d, exist_ok=True)


class RoomNetClassifier:
    """Batched classifier over converted params (optimized-inference mode)."""

    def __init__(
        self,
        variables,
        cfg=DEFAULT_CONFIG,
        *,
        batch_size: int = 64,
        class_labels: list[str] | None = None,
        mesh=None,
        decode_workers: int | None = None,
        fast_decode: bool = False,
        fast_decode_safety: int = 2,
        device_resize_side: int | None = None,
    ):
        """fast_decode: DCT-scaled JPEG decode in the native data-plane
        (up to 8x less decode work for large sources; slight pixel deltas —
        serving mode, not parity mode). Needs the csrc/ library.

        fast_decode_safety: the scaled decode must land at >=
        safety * im_side on its short side before the bilinear resize.
        safety=1 (round-2 behavior) allows decoding to barely >= im_side,
        which maximizes resample deviation (measured 11% argmax flips on
        640x480 content); safety=2 keeps >=2x supersampling headroom
        (measured 0 flips on the same harness, see PERF.md round 3).

        device_resize_side: ship center-cropped uint8 at this intermediate
        side (e.g. 448) and run the final bilinear resample to
        cfg.im_side ON DEVICE (ops/resize.py:resize_bilinear_half_pixel,
        cv2 semantics; round-3 review item #8 / BASELINE's fused-preprocess
        north star). For PCIe-attached hosts with link headroom: the fine
        resample leaves the host's per-image CPU budget and rides the MXU,
        at the cost of (side/im_side)² more bytes over the link. Measured
        A/B in PERF.md round 4: a 3× LOSS on the bandwidth-starved dev
        relay, and — when the host must still resample the crop to the
        intermediate side — the two-step chain aliases differently than
        the host's single-step resize (10.9% argmax flips on the 640×480
        harness; the same irreducible effect as fast_decode, PERF round
        3). EXACT parity (±1 uint8 LSB) holds when the cropped source
        already equals device_resize_side, i.e. no intermediate host
        resample happens. Serving mode, not parity mode. Must exceed
        cfg.im_side."""
        self.variables = variables
        self.cfg = cfg
        self.batch_size = batch_size
        self.class_labels = class_labels or CLASS_LABELS
        self.mesh = mesh
        self.decode_workers = decode_workers or min(32, (os.cpu_count() or 8) * 2)
        if device_resize_side is not None and device_resize_side <= cfg.im_side:
            raise ValueError(
                f"device_resize_side {device_resize_side} must exceed "
                f"im_side {cfg.im_side} (ship more pixels, resample on device)"
            )
        self.device_resize_side = device_resize_side
        # The side the HOST pipeline resizes to (and ships).
        self.host_side = device_resize_side or cfg.im_side
        self.min_decode_side = (
            fast_decode_safety * self.host_side if fast_decode else 0
        )
        if fast_decode:
            from roomnet_tpu.data import native

            if not native.available():
                # The flag is consulted only by the native decode path; on
                # a host without csrc/libroomnet_io.so every image takes
                # the cv2 full decode and the requested 8x saving silently
                # never happens — say so instead.
                from roomnet_tpu.utils.logging import get_logger

                get_logger("classify").warning(
                    "fast_decode requested but the native data-plane "
                    "(csrc/libroomnet_io.so) is not built — falling back "
                    "to full cv2 decode with no DCT-scaling speedup"
                )

        def _predict(variables, x_uint8_bgr):
            if device_resize_side is not None:
                from roomnet_tpu.ops.resize import resize_bilinear_half_pixel

                xr = resize_bilinear_half_pixel(
                    x_uint8_bgr.astype(jnp.float32),
                    (cfg.im_side, cfg.im_side),
                )
                # Round back to uint8 (cv2's resize emits uint8 too, ±1 LSB
                # fixed-point differences) so the uint8 preprocess fold
                # into conv-0 still applies.
                x_uint8_bgr = jnp.clip(jnp.rint(xr), 0, 255).astype(jnp.uint8)
            logits = forward(variables, normalize_bgr_uint8(x_uint8_bgr), cfg)
            probs = jax.nn.softmax(logits, axis=-1)
            return jnp.argmax(probs, axis=-1), probs

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._x_sharding = NamedSharding(mesh, P("data"))
            self._predict = jax.jit(
                _predict,
                in_shardings=(NamedSharding(mesh, P()), self._x_sharding),
            )
        else:
            self._x_sharding = None
            self._predict = jax.jit(_predict)

    # -- host preprocess ----------------------------------------------------
    def _load(self, fpath: str) -> np.ndarray | None:
        """Center-crop -> resize -> BGR uint8 (reference network.py:148-152).

        Uses the native C++ fused pipeline when built, else cv2."""
        from roomnet_tpu.data import native

        if native.available():
            probed = native.probe(fpath)
            if probed is not None:
                h, w = probed
                from roomnet_tpu.data.loader import draw_crop_rect

                crop = draw_crop_rect(h, w, random_crop=False, rng=None)
                out = native.load_preprocess(
                    fpath, crop, self.host_side,
                    min_decode_side=self.min_decode_side,
                )
                if out is not None:
                    return out
            # Native handles JPEG/PNG only — fall through to cv2 so
            # BMP/TIFF/WebP classify identically on both backends (same
            # per-image fallback as the training loader).

        return self._load_cv2(fpath)

    def _load_cv2(self, fpath: str) -> np.ndarray | None:
        import cv2

        im = cv2.imread(fpath)
        if im is None:
            return None
        return self.prep_decoded(im)

    def prep_decoded(self, im: np.ndarray) -> np.ndarray:
        """Host preprocess for an already-decoded BGR image: center-crop,
        then resize to host_side. The ONE copy of this sequence — the
        serving daemon's byte-decode path calls it too, so file-path and
        HTTP inference stay pixel-identical on the same decoded image."""
        import cv2

        im = center_crop(im)
        if im.shape[0] != self.host_side or im.shape[1] != self.host_side:
            im = cv2.resize(im, (self.host_side, self.host_side))
        return np.ascontiguousarray(im)

    def predict_paths(self, fpaths: list[str]):
        """Stream paths through device batches; returns (ids, confs, ok_mask).

        Unreadable files get id -1 / conf 0. The final ragged batch is padded
        to batch_size (static shapes for XLA) and trimmed after.

        Pipelining (round-3 review item #1 restructure): three dedicated
        single-worker stages — decode(i+2) ∥ device_put(i+1) ∥ dispatch(i)
        — so a device_put that BLOCKS for the transfer duration (it does
        under a remote relay) steals no time from decode; a semaphore
        bounds resident host batches. Results ACCUMULATE on device (a few
        KB per batch) and come back in ONE device_get at the end: the
        per-batch result fetch of the old design paid a full relay round
        trip per batch on the main thread, serializing against dispatch.
        Per-stage wall time lands in utils/profiling.SPANS under e2e/*
        (decode, device_put, dispatch, fetch, wait_decode, wait_put) —
        bench.py emits the breakdown so the bottleneck stage is visible
        per run.
        """
        import threading

        from roomnet_tpu.utils.profiling import trace

        n = len(fpaths)
        ids = np.full(n, -1, np.int64)
        confs = np.zeros((n, len(self.class_labels)), np.float32)
        bs = self.batch_size
        with ThreadPoolExecutor(max_workers=self.decode_workers) as pool, \
                ThreadPoolExecutor(max_workers=1) as decoder, \
                ThreadPoolExecutor(max_workers=1) as putter:
            from roomnet_tpu.data import native

            use_native_batch = native.available()
            # Backpressure: at most this many batches decoded-but-not-yet-
            # dispatched (each holds a bs×side²×3 host buffer; the put'ed
            # twin lives on device until its compute consumes it).
            depth = threading.Semaphore(3)
            # If the main loop aborts (a stage raised), queued stage_decode
            # futures must NOT block forever in depth.acquire — the
            # executors' __exit__ waits on them and would deadlock the
            # shutdown. abort turns them into no-ops.
            abort = threading.Event()

            def decode_batch(start):
                idxs = list(range(start, min(start + bs, n)))
                paths = [fpaths[i] for i in idxs]
                if use_native_batch:
                    # One C call: probes (threaded) -> center crops -> fused
                    # decode/crop/resize batch with internal thread pool.
                    from roomnet_tpu.data.loader import draw_crop_rect

                    probes = list(pool.map(native.probe, paths))
                    m = len(paths)
                    crops = np.full((m, 4), -1, np.int32)
                    for k, pr in enumerate(probes):
                        if pr is not None:
                            crops[k] = draw_crop_rect(
                                pr[0], pr[1], random_crop=False, rng=None
                            )
                    batch, ok_mask = native.load_preprocess_batch(
                        paths, crops, self.host_side,
                        np.zeros((m, 2), np.int32),
                        min_decode_side=self.min_decode_side,
                    )
                    ok_mask &= np.array([pr is not None for pr in probes])
                    # Per-image cv2 retry for files the native decoder can't
                    # read (it is JPEG/PNG-only) — backend presence must not
                    # change which images get classified. Retries run on the
                    # decode pool, not serially on the decoder thread.
                    ims = [batch[k] if ok_mask[k] else None for k in range(m)]
                    failed = [k for k in range(m) if not ok_mask[k]]
                    if failed:
                        for k, im in zip(
                            failed,
                            pool.map(self._load_cv2, [paths[k] for k in failed]),
                        ):
                            ims[k] = im
                else:
                    ims = list(pool.map(self._load, paths))
                ok = [i for i, im in zip(idxs, ims) if im is not None]
                kept = [im for im in ims if im is not None]
                if not kept:
                    return ok, 0, None
                full = np.zeros((bs, self.host_side, self.host_side, 3),
                                np.uint8)
                full[: len(kept)] = np.stack(kept)
                return ok, len(kept), full

            def stage_decode(start):
                # Entry check BEFORE touching the semaphore: after an
                # abort every already-queued future still runs serially
                # on this thread during executor shutdown — without this,
                # each would eat a full 0.2 s acquire timeout (minutes of
                # teardown for a large directory) before no-op'ing.
                if abort.is_set():
                    return [], 0, None
                while not depth.acquire(timeout=0.2):
                    if abort.is_set():
                        return [], 0, None
                if abort.is_set():
                    depth.release()
                    return [], 0, None
                try:
                    with trace("e2e/decode"):
                        ok, n_kept, full = decode_batch(start)
                    if full is None:
                        return ok, 0, None

                    def put():
                        with trace("e2e/device_put"):
                            return jax.device_put(full, self._x_sharding)

                    return ok, n_kept, putter.submit(put)
                except BaseException:
                    depth.release()  # main loop will never release for us
                    raise

            stage_futs = [
                decoder.submit(stage_decode, s) for s in range(0, n, bs)
            ]
            entries = []  # (ok, n_kept, pred_dev, probs_dev) — fetched once
            try:
                for fut in stage_futs:
                    with trace("e2e/wait_decode"):
                        ok, n_kept, put_fut = fut.result()
                    if put_fut is not None:
                        with trace("e2e/wait_put"):
                            x_dev = put_fut.result()
                        with trace("e2e/dispatch"):
                            pred_dev, probs_dev = self._predict(
                                self.variables, x_dev
                            )
                            # Start the device->host copy NOW (non-blocking,
                            # queued behind the batch's compute): the
                            # results trickle back overlapped with the
                            # remaining decode work, so the final
                            # device_get is a collection, not a round trip
                            # per array — measured 2.6 s -> ~0 for a
                            # 1839-image run when the relay RTT wanders
                            # high.
                            # getattr: _predict is an instance attribute
                            # tests/callers may stub with plain ndarrays.
                            for a in (pred_dev, probs_dev):
                                getattr(a, "copy_to_host_async",
                                        lambda: None)()
                        entries.append((ok, n_kept, pred_dev, probs_dev))
                    depth.release()
            except BaseException:
                abort.set()
                raise
            if entries:
                # ONE synchronous transfer for every batch's outputs: ids +
                # probs are ~8 KB/batch, so even a 100k-image directory
                # fetches a few MB in a single round trip.
                with trace("e2e/fetch"):
                    fetched = jax.device_get(
                        [(e[2], e[3]) for e in entries]
                    )
                for (ok, n_kept, _, _), (pred, probs) in zip(entries, fetched):
                    ids[ok] = pred[:n_kept]
                    confs[ok] = probs[:n_kept]
        return ids, confs, ids >= 0


def classify_im_dir(
    classifier: RoomNetClassifier,
    imgs_dir: str,
    overlay: bool = True,
    *,
    out_dir: str | None = None,
    progress: bool = True,
) -> str:
    """Directory classification with xls + per-class dir outputs (infer.py:65-100)."""
    import cv2

    labels = classifier.class_labels
    all_im_paths = sorted(glob(os.path.join(imgs_dir, "*")))
    all_im_paths = [p for p in all_im_paths if os.path.isfile(p)]
    out_dir = out_dir or (imgs_dir.rstrip(os.sep) + "_classified")
    xl_fpath = out_dir + "_results.xls"
    csv_fpath = out_dir + "_results.csv"  # modern-tooling twin of the .xls
    for lbl in labels:
        force_makedir(os.path.join(out_dir, lbl))

    ids, confs, ok = classifier.predict_paths(all_im_paths)

    import csv

    wb = Workbook()
    sheet = wb.add_sheet("classification_results")
    sheet.write(0, 0, "IMAGE_NAME")
    sheet.write(0, 1, "PREDICTED_LABEL")
    csv_file = open(csv_fpath, "w", newline="")
    csv_writer = csv.writer(csv_file)
    csv_writer.writerow(["IMAGE_NAME", "PREDICTED_LABEL", "CONFIDENCE"])
    it = enumerate(all_im_paths)
    if progress:
        try:
            from tqdm import tqdm

            it = tqdm(list(it))
        except ImportError:
            pass
    xls_overflowed = False

    def write_xls_row(i, fname, pred_label, pred_conf):
        # BIFF2 rows are 16-bit; a >65534-image directory keeps its FULL
        # results in the CSV twin while the legacy .xls carries what fits
        # (warn once) — the reference's xlwt writer had the same wall,
        # except it crashed there.
        nonlocal xls_overflowed
        if i + 1 > 0xFFFE:  # Sheet.write's cap (DIMENSIONS packs max+1)
            if not xls_overflowed:
                import warnings

                warnings.warn(
                    "results exceed the .xls (BIFF2) 65535-row limit; "
                    "remaining rows are in the CSV only", stacklevel=2,
                )
                xls_overflowed = True
            return
        sheet.write(i + 1, 0, fname)
        sheet.write(i + 1, 1, pred_label)
        sheet.write(i + 1, 2, str(pred_conf))

    try:
        for i, fpath in it:
            if not ok[i]:
                continue
            pred_label = labels[int(ids[i])]
            pred_conf = float(confs[i, int(ids[i])])
            dst_dir = os.path.join(out_dir, pred_label)
            fname = os.path.basename(fpath)
            if overlay:
                # The prediction path may have decoded this file with the
                # native C++ backend; cv2 can still fail here (e.g. a JPEG
                # variant libjpeg accepts but cv2's build doesn't). The
                # file IS classified — fall back to a raw copy instead of
                # crashing, mirroring the reference's overlay=False branch
                # (infer.py:94). The WRITE can fail too (an extensionless
                # filename gives cv2.imwrite no encoder) — same fallback.
                im = cv2.imread(fpath)
                if im is None:
                    _warn_copy(fpath, dst_dir,
                               "cv2 could not re-read it")
                else:
                    h, w = im.shape[:2]
                    # Same overlay text/placement as infer.py:89-92.
                    cv2.putText(im, "Predicted Class: " + pred_label,
                                (int(0.5 * w), int(0.90 * h)),
                                cv2.FONT_HERSHEY_SIMPLEX,
                                (h / 720.0) * 0.85, (0, 255, 0), 1,
                                cv2.LINE_AA)
                    cv2.putText(im, "Confidence: "
                                + str(round(pred_conf * 100, 2)) + " %",
                                (int(0.5 * w), int(0.95 * h)),
                                cv2.FONT_HERSHEY_SIMPLEX,
                                (h / 720.0) * 0.85, (255, 0, 0), 1,
                                cv2.LINE_AA)
                    try:
                        if not cv2.imwrite(os.path.join(dst_dir, fname), im):
                            raise OSError("imwrite returned False")
                    except Exception as e:  # noqa: BLE001
                        _warn_copy(fpath, dst_dir,
                                   f"annotated write failed ({e})")
            else:
                shutil.copy(fpath, dst_dir)
            write_xls_row(i, fname, pred_label, pred_conf)
            csv_writer.writerow([fname, pred_label, pred_conf])
    finally:
        # One failing row must not discard a fully-classified directory's
        # results: whatever was written so far is flushed either way.
        csv_file.close()
        wb.save(xl_fpath)
    return xl_fpath


def _warn_copy(fpath: str, dst_dir: str, why: str) -> None:
    import warnings

    warnings.warn(f"overlay skipped for {fpath}: {why}; copied unannotated",
                  stacklevel=3)
    shutil.copy(fpath, dst_dir)


def evaluate_checkpoints(
    model_dir: str,
    list_fpath: str,
    cfg=DEFAULT_CONFIG,
    *,
    batch_size: int = 64,
    mesh=None,
    class_labels: list[str] | None = None,
    backend: str = "auto",
) -> dict:
    """Re-score EVERY checkpoint in a training dir against a labeled list.

    The reference picks its best model by the accuracy embedded in
    checkpoint FILENAMES (legacy_plotter.py:19-37) — an accuracy measured
    against whatever val set was live during that run. This measures all
    of them against one list file, so model selection uses a consistent
    yardstick (and works on 'interrupt'/'stall' checkpoints, which carry
    no accuracy in their names).

    One compile total: the jitted predict takes variables as a traced
    argument, so swapping checkpoints is a weight upload, not a recompile
    (same mechanism as the serving daemon's hot reload).

    Returns {"checkpoints": [{step, checkpoint, name_accuracy,
    accuracy, precisions, recalls, f-scores}...], "best": <entry>}.
    """
    import glob as _glob

    from roomnet_tpu.params import schema
    from roomnet_tpu.params.checkpoint import CheckpointStore

    if backend == "auto":
        # npz files vs orbax OCDBT dirs share the roomnet--*--* naming;
        # the extension tells them apart.
        has_npz = bool(_glob.glob(os.path.join(model_dir, "roomnet--*--*.npz")))
        backend = "npz" if has_npz else "orbax"
    if backend == "orbax":
        from roomnet_tpu.params.orbax_io import OrbaxCheckpointStore

        store = OrbaxCheckpointStore(model_dir, async_save=False)
    else:
        store = CheckpointStore(model_dir)
    ckpts = store.list_checkpoints()
    if not ckpts:
        raise FileNotFoundError(f"no checkpoints in {model_dir}")
    clf = None
    entries = []
    for step, suffix, path in ckpts:
        var_flat, _ = store.load(path, cfg=cfg)
        variables = schema.unflatten_variables(var_flat, cfg=cfg)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            variables = jax.device_put(variables, NamedSharding(mesh, P()))
        if clf is None:
            clf = RoomNetClassifier(
                variables, cfg, batch_size=batch_size, mesh=mesh,
                class_labels=class_labels,
            )
        else:
            clf.variables = variables
        try:
            name_acc = float(suffix)
        except ValueError:
            name_acc = None
        entry = {"step": step, "checkpoint": os.path.basename(path),
                 "name_accuracy": name_acc}
        entry.update(groundtruth_validation(clf, list_fpath))
        entries.append(entry)
    best = max(entries, key=lambda e: (e["accuracy"], e["step"]))
    return {"checkpoints": entries, "best": best}


def groundtruth_validation(classifier: RoomNetClassifier, list_fpath: str) -> dict:
    """Re-score a labeled list file (reference infer.py:41-57, un-broken:
    the reference's version crashes on a commented-out constant)."""
    from roomnet_tpu.data.dataset import parse_list_line
    from roomnet_tpu.train.metrics import make_stats_entry

    with open(list_fpath) as f:
        pairs = [parse_list_line(l) for l in f if l.strip()]
    fpaths = [p for p, _ in pairs]
    y_true = [c for _, c in pairs]
    ids, _, ok = classifier.predict_paths(fpaths)
    y_t = [t for t, o in zip(y_true, ok) if o]
    y_p = [int(i) for i, o in zip(ids, ok) if o]
    entry = make_stats_entry(0, y_t, y_p)
    del entry["step"]
    return entry

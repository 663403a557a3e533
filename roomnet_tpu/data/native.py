"""ctypes binding for the native host data-plane (csrc/roomnet_io.cpp).

The native library fuses decode->crop->resize->flip per image and fills a
contiguous batch buffer with an internal thread pool (no GIL on the hot
path, no intermediate numpy copies). Falls back gracefully: callers check
`available()` and use the cv2 path otherwise.

Crop/flip randomness stays in PYTHON (drawn from the same RandomState
sequence as the cv2 path) so batches are bit-deterministic and
backend-independent: the native side is a pure function of
(path, crop rect, flips, out_side).

Build: `make -C csrc` (libjpeg/libpng, no other deps).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _lib_path() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "csrc",
        "libroomnet_io.so",
    )


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _lib_path()
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.rn_probe.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.rn_probe.restype = ctypes.c_int
    lib.rn_load_preprocess.argtypes = [
        ctypes.c_char_p] + [ctypes.c_int] * 7 + [ctypes.POINTER(ctypes.c_ubyte)]
    lib.rn_load_preprocess.restype = ctypes.c_int
    lib.rn_load_preprocess_scaled.argtypes = [
        ctypes.c_char_p] + [ctypes.c_int] * 8 + [ctypes.POINTER(ctypes.c_ubyte)]
    lib.rn_load_preprocess_scaled.restype = ctypes.c_int
    lib.rn_decode.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_ubyte),
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.rn_decode.restype = ctypes.c_int
    lib.rn_load_preprocess_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_ubyte),
        ctypes.POINTER(ctypes.c_int),
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.rn_load_preprocess_batch.restype = ctypes.c_int
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def probe(path: str) -> tuple[int, int] | None:
    """(h, w) from the image header only, or None if undecodable."""
    lib = _load()
    h = ctypes.c_int()
    w = ctypes.c_int()
    if lib.rn_probe(path.encode(), ctypes.byref(h), ctypes.byref(w)):
        return h.value, w.value
    return None


def load_preprocess(
    path: str,
    crop: tuple[int, int, int, int] | None,
    out_side: int,
    flip_lr: bool = False,
    flip_ud: bool = False,
    min_decode_side: int = 0,
) -> np.ndarray | None:
    """Decode+crop+resize+flip one image -> (S,S,3) BGR uint8, or None.

    min_decode_side > 0 enables DCT-scaled JPEG decode (1/2..1/8) — up to
    8x faster when the source is much larger than the target; pixels differ
    slightly from the full-decode path (serving fast path, not training
    parity). Crop coords remain in original-image space.
    """
    lib = _load()
    out = np.empty((out_side, out_side, 3), np.uint8)
    cx, cy, cw, ch = crop if crop is not None else (-1, -1, -1, -1)
    ok = lib.rn_load_preprocess_scaled(
        path.encode(),
        cx,
        cy,
        cw,
        ch,
        out_side,
        int(flip_lr),
        int(flip_ud),
        int(min_decode_side),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
    )
    return out if ok else None


def load_preprocess_batch(
    paths: list[str],
    crops: np.ndarray,  # (n,4) int32, cx=-1 => full image
    out_side: int,
    flips: np.ndarray,  # (n,2) int32
    nthreads: int = 0,
    min_decode_side: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """Batch fused pipeline -> ((n,S,S,3) uint8, ok bool mask)."""
    lib = _load()
    n = len(paths)
    out = np.empty((n, out_side, out_side, 3), np.uint8)
    ok = np.zeros(n, np.int32)
    crops = np.ascontiguousarray(crops, np.int32)
    flips = np.ascontiguousarray(flips, np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.rn_load_preprocess_batch(
        arr,
        n,
        crops.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        out_side,
        flips.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        nthreads,
        int(min_decode_side),
    )
    return out, ok.astype(bool)

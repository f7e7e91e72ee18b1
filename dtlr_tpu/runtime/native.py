"""ctypes bindings for the native host runtime (native.cpp).

Lazily builds libdtlr_native.so with `make` on first use; every entry
point has a pure-python/numpy fallback so the package works without a
compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libdtlr_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False

_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(
                    ["make", "-s"], cwd=_DIR, check=True, capture_output=True
                )
            except Exception:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None
        lib.levenshtein_u32.restype = ctypes.c_int64
        lib.levenshtein_u32.argtypes = [
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_int64,
        ]
        lib.edit_ops_u32.restype = None
        lib.edit_ops_u32.argtypes = [
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.resize_bilinear_f32.restype = None
        lib.resize_bilinear_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ]
        lib.normalize_into_f32.restype = None
        lib.normalize_into_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _as_u32(seq: Sequence) -> np.ndarray:
    if isinstance(seq, np.ndarray) and seq.dtype == np.uint32:
        return np.ascontiguousarray(seq)
    ids = {}
    out = np.empty(len(seq), np.uint32)
    for i, tok in enumerate(seq):
        if isinstance(tok, (int, np.integer)):
            out[i] = np.uint32(tok)
        else:
            out[i] = ids.setdefault(tok, len(ids))
    return out


def levenshtein(a: Sequence, b: Sequence) -> int:
    lib = _load()
    if lib is None:
        from ..eval.metrics import _levenshtein_py

        return _levenshtein_py(a, b)
    aa, bb = _as_u32_pair(a, b)
    pa = aa.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))
    pb = bb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))
    return int(lib.levenshtein_u32(pa, len(aa), pb, len(bb)))


def _as_u32_pair(a, b) -> Tuple[np.ndarray, np.ndarray]:
    ids: dict = {}

    def enc(seq):
        out = np.empty(len(seq), np.uint32)
        for i, tok in enumerate(seq):
            out[i] = ids.setdefault(tok, len(ids))
        return out

    return enc(list(a)), enc(list(b))


def edit_ops(pred: Sequence, gt: Sequence) -> Tuple[int, int, int]:
    lib = _load()
    if lib is None:
        from ..eval.metrics import edit_operations

        return edit_operations(list(pred), list(gt))
    aa, bb = _as_u32_pair(pred, gt)
    out = np.zeros(3, np.int64)
    lib.edit_ops_u32(
        aa.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), len(aa),
        bb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), len(bb),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return int(out[0]), int(out[1]), int(out[2])


def resize_bilinear(img: np.ndarray, out_h: int, out_w: int) -> Optional[np.ndarray]:
    """float32 HWC resize; None if the native lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    src = np.ascontiguousarray(img, np.float32)
    h, w, c = src.shape
    dst = np.empty((out_h, out_w, c), np.float32)
    lib.resize_bilinear_f32(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h, w, c,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out_h, out_w,
    )
    return dst


def normalize_into(src: np.ndarray, dst: np.ndarray) -> bool:
    """ImageNet-normalize src (h,w,3) into dst (H,W,3) top-left corner.
    Returns False if unavailable (caller falls back)."""
    lib = _load()
    if lib is None:
        return False
    s = np.ascontiguousarray(src, np.float32)
    h, w, _ = s.shape
    H, W, _ = dst.shape
    lib.normalize_into_f32(
        s.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h, w,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), H, W,
        _MEAN.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        _STD.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return True

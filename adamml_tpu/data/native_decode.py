"""ctypes binding for the native multi-threaded JPEG decoder
(native/decode.cpp). Builds on demand with `make -C native` if the shared
library is missing; falls back to PIL per-file decode when unavailable or
when individual files fail (mirroring the reference's retry-based
robustness, reference utils/video_dataset.py:51-66).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_LIB_PATH = os.path.join(_REPO_ROOT, "native", "libadamml_native.so")

_lib = None
_lib_lock = threading.Lock()
_load_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lib_lock:
        if _lib is not None or _load_failed:
            return _lib
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(["make", "-C",
                                os.path.join(_REPO_ROOT, "native")],
                               capture_output=True, check=True, timeout=120)
            except Exception:
                _load_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.adamml_decode_batch.restype = ctypes.c_int
            lib.adamml_decode_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.POINTER(ctypes.c_int), ctypes.c_int]
            _lib = lib
        except OSError:
            _load_failed = True
    return _lib


def native_available() -> bool:
    return _load() is not None


def decode_jpeg_batch(paths: Sequence[str], canvas: np.ndarray,
                      n_threads: int = 4) -> np.ndarray:
    """Decode `paths[i]` into `canvas[i]` (T, H, W, C) uint8, top-left
    anchored. Returns (T, 2) int32 true (h, w); rows of zeros mark failures
    the caller should retry with the PIL fallback."""
    lib = _load()
    t, ch, cw, c = canvas.shape
    assert len(paths) == t and canvas.dtype == np.uint8
    assert canvas.flags["C_CONTIGUOUS"]
    out_hw = np.zeros((t, 2), np.int32)
    if lib is None:
        return out_hw  # all marked failed -> caller falls back
    arr = (ctypes.c_char_p * t)(*[p.encode() for p in paths])
    lib.adamml_decode_batch(
        arr, t, canvas.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        ch, cw, c, out_hw.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        n_threads)
    return out_hw

"""ctypes bindings for the native frame loader (frame_loader.cpp).

Build lazily on first use (g++ + libjpeg, both in the image); all callers
must handle ``available() == False`` and fall back to the PIL path — the
native loader is a fast path, not a dependency (reference parity lives in
the Python path; this replaces the reference's DataLoader-worker decode,
train_svd.py:790-797).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "frame_loader.cpp")
_SO = os.path.join(_DIR, "libframe_loader.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-funroll-loops", "-fPIC",
           "-shared", "-o", _SO, _SRC, "-ljpeg", "-pthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.fl_decode_resize.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float)]
        lib.fl_decode_resize.restype = ctypes.c_int
        lib.fl_load_clip.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_float)]
        lib.fl_load_clip.restype = ctypes.c_int
        lib.fl_version.restype = ctypes.c_char_p
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def version() -> str:
    lib = _load()
    return lib.fl_version().decode() if lib else "unavailable"


def load_clip(paths: Sequence[str], width: int, height: int,
              num_threads: int = 8) -> Optional[np.ndarray]:
    """Decode JPEG frames concurrently -> (N, height, width, 3) float32 in
    [-1, 1] (HWC, bilinear resize). None if the native library is missing or
    any frame fails to decode (caller falls back to PIL)."""
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, height, width, 3), dtype=np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    ok = lib.fl_load_clip(arr, n, width, height, num_threads,
                          out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out if ok == n else None

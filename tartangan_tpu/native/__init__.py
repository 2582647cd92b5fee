"""Native (C++) host-runtime helpers, loaded via ctypes.

The shared library is compiled on first use (g++ -O3 -fopenmp) and cached
next to the source; every entry point has a pure-numpy fallback so the
framework runs on toolchain-less hosts.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "crop.cpp")
_LIB = os.path.join(_HERE, "libtartangan_native.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build():
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-fopenmp", _SRC, "-o", _LIB]
    subprocess.run(cmd, check=True, capture_output=True)


def load():
    """Returns the ctypes lib or None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if (not os.path.exists(_LIB)
                    or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
                _build()
            lib = ctypes.CDLL(_LIB)
            lib.crop_batch_u8.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_void_p,
            ]
            lib.gather_batch_u8.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_void_p,
            ]
            _lib = lib
        except Exception as e:  # pragma: no cover - toolchain-dependent
            print(f"[native] falling back to numpy batcher ({e})")
            _lib = None
        return _lib


def crop_batch(images: np.ndarray, indices: np.ndarray, ys: np.ndarray,
               xs: np.ndarray, size: int) -> np.ndarray | None:
    """C++ batched gather+crop; returns None if the native lib is absent."""
    lib = load()
    if lib is None:
        return None
    n = len(indices)
    _, h, w, c = images.shape
    out = np.empty((n, size, size, c), np.uint8)
    indices = np.ascontiguousarray(indices, np.int64)
    ys = np.ascontiguousarray(ys, np.int32)
    xs = np.ascontiguousarray(xs, np.int32)
    lib.crop_batch_u8(
        images.ctypes.data, h, w, c,
        indices.ctypes.data, n,
        ys.ctypes.data, xs.ctypes.data, size,
        out.ctypes.data,
    )
    return out


def gather_batch(images: np.ndarray, indices: np.ndarray) -> np.ndarray | None:
    lib = load()
    if lib is None:
        return None
    n = len(indices)
    img_bytes = int(np.prod(images.shape[1:]))
    out = np.empty((n,) + images.shape[1:], np.uint8)
    indices = np.ascontiguousarray(indices, np.int64)
    lib.gather_batch_u8(images.ctypes.data, img_bytes,
                        indices.ctypes.data, n, out.ctypes.data)
    return out

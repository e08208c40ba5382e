"""ctypes bindings for the C++ data-pipeline kernels (csrc/data_ops.cpp).

Build lazily on first use with g++ (baked into the image); every entry point
has a pure-numpy fallback in pie_bench.py, so absence of a toolchain only
costs speed.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "csrc", "data_ops.cpp")
_SO = os.path.join(os.path.dirname(_SRC), "libdata_ops.so")


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load():
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if not os.path.exists(_SO) and os.path.exists(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.rle_decode.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64]
        lib.resize_bilinear_u8.argtypes = [ctypes.POINTER(ctypes.c_uint8)] + [
            ctypes.c_int64] * 3 + [ctypes.POINTER(ctypes.c_uint8)] + [ctypes.c_int64] * 2
        lib.resize_nearest_u8.argtypes = lib.resize_bilinear_u8.argtypes
        _LIB = lib
        return _LIB


def available() -> bool:
    return _load() is not None


def rle_decode(enc: np.ndarray, length: int) -> np.ndarray:
    lib = _load()
    enc = np.ascontiguousarray(enc, dtype=np.int64)
    out = np.zeros((length,), dtype=np.float64)
    lib.rle_decode(
        enc.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), enc.shape[0],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), length)
    return out


def resize_bilinear(img: np.ndarray, dh: int, dw: int) -> np.ndarray:
    lib = _load()
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, c = img.shape
    out = np.empty((dh, dw, c), dtype=np.uint8)
    lib.resize_bilinear_u8(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, c,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), dh, dw)
    return out

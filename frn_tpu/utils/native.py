"""ctypes loader for the native host kernels (native/voxelize.cpp).

The shared library is built on first use with g++ (no pybind11 in the image; the
C ABI + ctypes keeps the binding dependency-free). All entry points fall back to
None so callers can use the numpy path when a toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libfrn_native.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "voxelize.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-fPIC", "-std=c++17", "-shared",
             "-o", _LIB_PATH, src],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("FRN_DISABLE_NATIVE"):
            return None
        if not os.path.exists(_LIB_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.frn_voxelize.argtypes = [
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_float),
            ]
            lib.frn_voxelize_raw.argtypes = [
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int8),
                ctypes.c_int64, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_float),
            ]
            lib.frn_tanh_normalize.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_float,
            ]
            lib.frn_event_subsample.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64, ctypes.c_int32, ctypes.c_int32, ctypes.c_float,
            ]
            _lib = lib
        except OSError:
            _lib = None
        return _lib


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def native_voxelize(
    x: np.ndarray, y: np.ndarray, t_bin: np.ndarray, pol: np.ndarray,
    num_bins: int, height: int, width: int,
) -> Optional[np.ndarray]:
    """Scatter pre-binned events; returns None if the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, np.int32)
    y = np.ascontiguousarray(y, np.int32)
    t_bin = np.ascontiguousarray(t_bin, np.int32)
    pol = np.ascontiguousarray(pol, np.float32)
    out = np.zeros(num_bins * height * width, dtype=np.float32)
    lib.frn_voxelize(
        _ptr(x, ctypes.c_int32), _ptr(y, ctypes.c_int32), _ptr(t_bin, ctypes.c_int32),
        _ptr(pol, ctypes.c_float), len(x), num_bins, height, width,
        _ptr(out, ctypes.c_float),
    )
    return out.reshape(num_bins, height, width)


def native_voxelize_raw(
    x: np.ndarray, y: np.ndarray, t: np.ndarray, p: np.ndarray,
    num_bins: int, height: int, width: int,
) -> Optional[np.ndarray]:
    """Full raw-event pipeline (normalize + bin + scatter) in one native pass."""
    lib = get_lib()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, np.int32)
    y = np.ascontiguousarray(y, np.int32)
    t = np.ascontiguousarray(t, np.int64)
    p = np.ascontiguousarray(p, np.int8)
    out = np.zeros(num_bins * height * width, dtype=np.float32)
    lib.frn_voxelize_raw(
        _ptr(x, ctypes.c_int32), _ptr(y, ctypes.c_int32), _ptr(t, ctypes.c_int64),
        _ptr(p, ctypes.c_int8), len(x), num_bins, height, width,
        _ptr(out, ctypes.c_float),
    )
    return out.reshape(num_bins, height, width)


def native_event_subsample(
    pos: np.ndarray, polarity: np.ndarray, height: int, width: int,
    threshold: float = 1.0,
) -> Optional[tuple]:
    """Bilinear event subsampling (zoom augmentation). Returns (pos, mask) or None."""
    lib = get_lib()
    if lib is None:
        return None
    pos = np.ascontiguousarray(pos, np.float32).copy()
    polarity = np.ascontiguousarray(polarity, np.float32)
    mask = np.zeros(len(pos), np.uint8)
    count = np.zeros(height * width, np.float32)
    lib.frn_event_subsample(
        _ptr(pos, ctypes.c_float), _ptr(polarity, ctypes.c_float),
        _ptr(mask, ctypes.c_uint8), _ptr(count, ctypes.c_float),
        len(pos), height, width, threshold,
    )
    return pos, mask.astype(bool)


def native_tanh_normalize(v: np.ndarray, threshold: float = 5.0) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    v = np.ascontiguousarray(v, np.float32)
    lib.frn_tanh_normalize(_ptr(v, ctypes.c_float), v.size, threshold)
    return v

"""ctypes bindings + lazy build for the native pixel pipeline.

See pixelops.cpp. The shared library is built on first use with g++ (cached
next to the source); environments without a toolchain silently fall back to
the numpy path in ``data/datasets.py``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "pixelops.cpp")
_LIB = os.path.join(_HERE, "libpixelops.so")

_lib: Optional[ctypes.CDLL] = None
_build_failed = False
_build_lock = __import__("threading").Lock()


def _ensure_built() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _build_lock:
        return _ensure_built_locked()


def _ensure_built_locked() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:  # built while waiting on the lock
        return _lib
    try:
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB, _SRC],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(_LIB)
        lib.resize_bilinear_normalize.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
        ]
        lib.resize_bilinear_normalize.restype = None
        lib.resize_bilinear_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.resize_bilinear_u8.restype = None
        _lib = lib
    except Exception:
        _build_failed = True
        _lib = None
    return _lib


def available() -> bool:
    return _ensure_built() is not None


def resize_normalize(
    src_u8: np.ndarray,
    out_hw,
    mean: Optional[np.ndarray] = None,
    std: Optional[np.ndarray] = None,
    flip: bool = False,
) -> np.ndarray:
    """uint8 HWC -> float32 HWC: fused half-pixel bilinear resize +
    ``(x/255 - mean)/std`` + optional horizontal flip."""
    lib = _ensure_built()
    assert lib is not None, "native pixelops unavailable"
    src_u8 = np.ascontiguousarray(src_u8, np.uint8)
    if src_u8.ndim == 2:
        src_u8 = src_u8[:, :, None]
    sh, sw, c = src_u8.shape
    dh, dw = int(out_hw[0]), int(out_hw[1])
    mean = np.zeros(c, np.float32) if mean is None else np.asarray(mean, np.float32)
    std = np.ones(c, np.float32) if std is None else np.asarray(std, np.float32)
    dst = np.empty((dh, dw, c), np.float32)
    lib.resize_bilinear_normalize(
        src_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        sh,
        sw,
        c,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        dh,
        dw,
        mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        1 if flip else 0,
    )
    return dst


def resize_u8(src_u8: np.ndarray, out_hw, flip: bool = False) -> np.ndarray:
    """uint8 HWC -> uint8 HWC: the same half-pixel bilinear resize (+flip)
    with round-to-nearest requantization and NO normalization — for shipping
    uint8 to the device and normalizing there (4x less host->device traffic;
    see bench.py measure_eval_e2e device-normalize path)."""
    lib = _ensure_built()
    assert lib is not None, "native pixelops unavailable"
    src_u8 = np.ascontiguousarray(src_u8, np.uint8)
    if src_u8.ndim == 2:
        src_u8 = src_u8[:, :, None]
    sh, sw, c = src_u8.shape
    dh, dw = int(out_hw[0]), int(out_hw[1])
    dst = np.empty((dh, dw, c), np.uint8)
    lib.resize_bilinear_u8(
        src_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        sh,
        sw,
        c,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        dh,
        dw,
        1 if flip else 0,
    )
    return dst

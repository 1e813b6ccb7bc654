"""Native (C++) host-side kernels, loaded via ctypes.

Built on first use with g++ (-O3 -march=native, std::thread parallel); the
shared object is cached next to the sources. Callers must handle
`NativeUnavailable` and fall back to the Python path (metrics/ssim.py does).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "_extdm_native.so")
_LOCK = threading.Lock()
_LIB = None


class NativeUnavailable(RuntimeError):
    pass


def _build() -> None:
    src = os.path.join(_DIR, "ssim.cpp")
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-pthread", src, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)


def load():
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(
            os.path.join(_DIR, "ssim.cpp")
        ):
            try:
                _build()
            except (OSError, subprocess.CalledProcessError) as e:
                raise NativeUnavailable(f"native build failed: {e}") from e
        lib = ctypes.CDLL(_SO)
        lib.ssim_batch.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.ssim_batch.restype = None
        _LIB = lib
        return lib


def ssim_batch(img1: np.ndarray, img2: np.ndarray) -> np.ndarray:
    """img*: (N, C, H, W) float32 in [0,1]. Returns (N,) float64 SSIM."""
    lib = load()
    a = np.ascontiguousarray(img1, np.float32)
    b = np.ascontiguousarray(img2, np.float32)
    assert a.shape == b.shape and a.ndim == 4, (a.shape, b.shape)
    n, c, h, w = a.shape
    if h < 11 or w < 11:
        # A sub-window plane makes the valid region empty/negative; in the
        # C++ kernel that aborts the process (std::length_error), so refuse
        # here. A (N, H, W, C) channels-last batch lands in this branch too
        # (w == C == 3) — the metric API is channels-first, reference layout.
        raise ValueError(
            f"ssim_batch needs (N, C, H, W) with H, W >= 11; got {a.shape} "
            "(channels-last input? transpose to channels-first)")
    out = np.zeros(n, np.float64)
    lib.ssim_batch(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, c, h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return out

"""Native host kernels (C++ via ctypes).

Build-on-first-use: compiles ``delineate.cpp`` with g++ -O3 into
``_native.so`` next to this file; callers fall back to the pure-Python path
when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "_native.so")
_SRC = os.path.join(_DIR, "delineate.cpp")
_lib = None
_build_error: Optional[str] = None


def _build() -> Optional[str]:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", _SO, _SRC],
            check=True,
            capture_output=True,
            text=True,
        )
        return None
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        return getattr(e, "stderr", str(e)) or str(e)


def get_lib():
    """The loaded shared library, building it if needed; None on failure."""
    global _lib, _build_error
    if _lib is not None:
        return _lib
    if _build_error is not None:
        return None
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        _build_error = _build()
        if _build_error is not None:
            return None
    lib = ctypes.CDLL(_SO)
    lib.delineate_batch_f64.argtypes = [
        ctypes.POINTER(ctypes.c_double),  # samples
        ctypes.c_int,  # n_windows
        ctypes.c_int,  # window_len
        ctypes.POINTER(ctypes.c_int32),  # peaks
        ctypes.POINTER(ctypes.c_int32),  # n_peaks
        ctypes.c_int,  # max_peaks
        ctypes.c_int,  # fs_in
        ctypes.POINTER(ctypes.c_double),  # out
    ]
    lib.delineate_batch_f64.restype = None
    _lib = lib
    return _lib


def delineate_batch_native(
    samples: np.ndarray, peaks: np.ndarray, n_peaks: np.ndarray, fs_in: int = 500
):
    """(B, T) float64 windows -> dict of (B, K) float64 fiducial arrays, or
    None when the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    from ae_waveforms_tpu.core.schema import FIDUCIAL_NAMES

    samples = np.ascontiguousarray(samples, np.float64)
    peaks = np.ascontiguousarray(peaks, np.int32)
    n_peaks = np.ascontiguousarray(n_peaks, np.int32)
    B, T = samples.shape
    K = peaks.shape[1]
    out = np.empty((10, B, K), np.float64)
    lib.delineate_batch_f64(
        samples.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        B,
        T,
        peaks.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n_peaks.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        K,
        fs_in,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return {name: out[i] for i, name in enumerate(FIDUCIAL_NAMES)}

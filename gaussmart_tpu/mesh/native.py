"""ctypes loader/builder for the native marching-tetrahedra core.

Builds native/marching_tet.cpp with the system compiler on first use (the
binary is cached next to the source); falls back to the numpy
implementation if no compiler is available. The numpy path doubles as the
correctness oracle in tests.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "marching_tet.cpp")
_BIN = os.path.join(os.path.dirname(_SRC), "libmarching_tet.so")


def _build() -> Optional[str]:
    if os.path.exists(_BIN) and (os.path.getmtime(_BIN)
                                 >= os.path.getmtime(_SRC)):
        return _BIN
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           _SRC, "-o", _BIN]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return _BIN
    except Exception as e:
        if os.path.exists(_BIN):
            # a stale binary (e.g. compiler missing, source mtime touched by
            # checkout) still beats the numpy path, which needs tens of GB
            # of per-tet index arrays at production grid sizes
            print(f"[native] marching_tet rebuild failed ({e}); "
                  f"loading the existing (possibly stale) binary")
            return _BIN
        print(f"[native] marching_tet build failed ({e}); using numpy path")
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        path = _build()
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        lib.mt_count.restype = ctypes.c_int64
        lib.mt_count.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_float]
        lib.mt_extract.restype = ctypes.c_int64
        lib.mt_extract.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_float,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64]
        _LIB = lib
        return _LIB


def available() -> bool:
    return get_lib() is not None


def marching_tetrahedra_native(volume: np.ndarray, level: float = 0.0,
                               spacing=(1.0, 1.0, 1.0),
                               origin=(0.0, 0.0, 0.0)
                               ) -> Tuple[np.ndarray, np.ndarray]:
    lib = get_lib()
    assert lib is not None
    vol = np.ascontiguousarray(volume, np.float32)
    X, Y, Z = vol.shape
    vp = vol.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    n = lib.mt_count(vp, X, Y, Z, ctypes.c_float(level))
    if n == 0:
        return np.zeros((0, 3)), np.zeros((0, 3), np.int64)
    out = np.empty((n, 3, 3), np.float64)
    sp = np.ascontiguousarray(spacing, np.float64)
    og = np.ascontiguousarray(origin, np.float64)
    wrote = lib.mt_extract(
        vp, X, Y, Z, ctypes.c_float(level),
        sp.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        og.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n)
    out = out[:wrote]
    verts = out.reshape(-1, 3)
    faces = np.arange(len(verts), dtype=np.int64).reshape(-1, 3)
    return verts, faces

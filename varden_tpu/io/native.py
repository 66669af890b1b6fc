"""ctypes bindings for the native (C++) FAB I/O library.

Builds csrc/libvardenio.so on first use (make) and exposes FAB write/read.
Falls back to the pure-numpy path when a toolchain is unavailable.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "csrc")
_LIB_PATH = os.path.join(_CSRC, "libvardenio.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(["make", "-C", _CSRC], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.varden_write_fab.restype = ctypes.c_int
        lib.varden_write_fab.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int, ctypes.c_int64]
        lib.varden_read_fab.restype = ctypes.c_int
        lib.varden_read_fab.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int, ctypes.c_int64]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def write_fab(path: str, header: str, data: np.ndarray) -> bool:
    """data: (ncomp, *n) float64 C-ordered. Returns True on success."""
    lib = _load()
    if lib is None:
        return False
    data = np.ascontiguousarray(data, np.float64)
    ncomp = data.shape[0]
    shape = np.asarray(data.shape[1:], np.int64)
    rc = lib.varden_write_fab(
        path.encode(), header.encode(),
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        shape.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(data.shape) - 1, ncomp)
    return rc == 0


def read_fab(path: str, offset: int, ncomp: int, n) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    out = np.empty((ncomp,) + tuple(n), np.float64)
    shape = np.asarray(n, np.int64)
    rc = lib.varden_read_fab(
        path.encode(), offset,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        shape.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(n), ncomp)
    return out if rc == 0 else None

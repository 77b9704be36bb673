"""
Lazy loader for the native (C++) host-side helpers.

Compiles ``cell_list.cpp`` with the system ``g++`` on first use and loads
it via :mod:`ctypes`.  Every caller has a pure-Python/numpy fallback, so a
missing toolchain never breaks the package.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.realpath(__file__))
_SRC = os.path.join(_HERE, "cell_list.cpp")
_LIB_PATH = os.path.join(_HERE, "libspringcraft_native.so")

_lock = threading.Lock()
_lib = None
_load_failed = False


def _build():
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-fopenmp",
        "-o", _LIB_PATH, _SRC,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError,
            subprocess.TimeoutExpired):
        # Retry without OpenMP in case libgomp is unavailable
        try:
            cmd.remove("-fopenmp")
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            return True
        except Exception:
            return False


def get_lib():
    """Return the loaded native library, or ``None`` if unavailable."""
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        if not os.path.exists(_LIB_PATH) or (
            os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)
        ):
            if not _build():
                _load_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.adjacency_matrix.argtypes = [
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_int64,
                ctypes.c_double,
                ctypes.POINTER(ctypes.c_uint8),
            ]
            lib.adjacency_matrix.restype = None
            lib.parse_pdb_coords.argtypes = [
                ctypes.c_char_p,
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_int64,
            ]
            lib.parse_pdb_coords.restype = ctypes.c_int64
            _lib = lib
        except OSError:
            _load_failed = True
    return _lib


def native_adjacency(coord, cutoff):
    """
    Cell-list adjacency matrix via the native library.

    Returns a boolean ``(n, n)`` matrix with ``d^2 <= cutoff^2`` entries
    set (diagonal included), or ``None`` when the native path is
    unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    coord = np.ascontiguousarray(coord, dtype=np.float64)
    n = len(coord)
    out = np.zeros((n, n), dtype=np.uint8)
    lib.adjacency_matrix(
        coord.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n,
        float(cutoff),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out.astype(bool)

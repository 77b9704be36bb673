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
            lib.neighbor_pairs.argtypes = [
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_int64,
                ctypes.c_double,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64,
            ]
            lib.neighbor_pairs.restype = ctypes.c_int64
            lib.enm_hv_pairs.argtypes = [
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_double),
            ]
            lib.enm_hv_pairs.restype = None
            lib.gnm_kv_pairs.argtypes = [
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_double),
            ]
            lib.gnm_kv_pairs.restype = None
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


def native_neighbor_pairs(coord, cutoff, guess_per_atom=96):
    """
    Cell-list neighbor pair enumeration via the native library.

    Returns ``(i, j)`` int64 arrays with ``i < j`` and
    ``d^2(i, j) <= cutoff^2``, or ``None`` when the native path is
    unavailable.  O(n + pairs) time and memory — the scalable host-side
    neighbor representation (the adjacency-matrix form is O(n^2)).
    """
    lib = get_lib()
    if lib is None:
        return None
    coord = np.ascontiguousarray(coord, dtype=np.float64)
    n = len(coord)
    cap = max(1024, n * int(guess_per_atom))
    c_ptr = coord.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    while True:
        i_out = np.empty(cap, dtype=np.int64)
        j_out = np.empty(cap, dtype=np.int64)
        total = lib.neighbor_pairs(
            c_ptr, n, float(cutoff),
            i_out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            j_out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            cap,
        )
        if total <= cap:
            return i_out[:total], j_out[:total]
        cap = int(total)


def native_enm_hv(coord, pair_i, pair_j, g, v):
    """
    Float64 pair-list ANM Hessian apply ``H @ v`` via the native kernel:
    ``v`` has shape ``(n, 3, k)``; ``g`` holds ``k_ij / d^2`` per pair.
    Returns the ``(n, 3, k)`` product, or ``None`` when unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    coord = np.ascontiguousarray(coord, dtype=np.float64)
    pair_i = np.ascontiguousarray(pair_i, dtype=np.int64)
    pair_j = np.ascontiguousarray(pair_j, dtype=np.int64)
    g = np.ascontiguousarray(g, dtype=np.float64)
    v = np.ascontiguousarray(v, dtype=np.float64)
    n, _, k = v.shape
    out = np.empty((n, 3, k), dtype=np.float64)
    lib.enm_hv_pairs(
        coord.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n,
        pair_i.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        pair_j.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        g.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        len(g),
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        k,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return out


def native_gnm_kv(pair_i, pair_j, k_vals, n, v):
    """
    Float64 pair-list Kirchhoff apply ``K @ v`` via the native kernel:
    ``v`` has shape ``(n, k)``.  Returns the ``(n, k)`` product, or
    ``None`` when unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    pair_i = np.ascontiguousarray(pair_i, dtype=np.int64)
    pair_j = np.ascontiguousarray(pair_j, dtype=np.int64)
    k_vals = np.ascontiguousarray(k_vals, dtype=np.float64)
    v = np.ascontiguousarray(v, dtype=np.float64)
    k = v.shape[1]
    out = np.empty((n, k), dtype=np.float64)
    lib.gnm_kv_pairs(
        pair_i.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        pair_j.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        k_vals.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        len(k_vals),
        n,
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        k,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return out

"""ctypes bindings for the C++ native runtime (build-on-demand).

Compiles ``gsplat_native.cpp`` once per source hash into a shared library next
to this package and loads it with ctypes.  Falls back cleanly (``available() ->
False``) when no compiler exists; callers keep the pure-Python path.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "gsplat_native.cpp")
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _build_and_load():
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        try:
            with open(_SRC, "rb") as f:
                digest = hashlib.sha256(f.read()).hexdigest()[:16]
            so_path = os.path.join(_DIR, f"_gsplat_native_{digest}.so")
            if not os.path.exists(so_path):
                tmp = so_path + ".tmp"
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     "-std=c++17", "-pthread", _SRC, "-o", tmp],
                    check=True, capture_output=True,
                )
                os.replace(tmp, so_path)
            lib = ctypes.CDLL(so_path)
            lib.ply3d_parse.restype = ctypes.c_int64
            lib.ply3d_parse.argtypes = [
                ctypes.c_char_p, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.c_int32, ctypes.c_int32,
            ]
            lib.ply3d_count.restype = ctypes.c_int64
            lib.ply3d_count.argtypes = [ctypes.c_char_p, ctypes.c_int64]
            lib.radix_sort_pairs_u32.restype = None
            lib.radix_sort_pairs_u32.argtypes = [
                ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint32),
                ctypes.c_int64,
            ]
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB


def available() -> bool:
    return _build_and_load() is not None


def parse_ply_3d_native(data: bytes, strict_reference: bool = True, n_threads: int = 0):
    """Fast binary PLY decode -> (pv, sh, rot, so) float32 arrays, or None if
    the native path can't handle this file (ascii, list props, no compiler)."""
    lib = _build_and_load()
    if lib is None:
        return None
    n_threads = n_threads or (os.cpu_count() or 1)
    padded = lib.ply3d_count(data, len(data))
    if padded <= 0:
        return None
    pv = np.zeros((padded, 4), np.float32)
    sh = np.zeros((padded, 48), np.float32)
    rot = np.zeros((padded, 4), np.float32)
    so = np.zeros((padded, 4), np.float32)

    def ptr(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))

    got = lib.ply3d_parse(
        data, len(data), ptr(pv), ptr(sh), ptr(rot), ptr(so),
        1 if strict_reference else 0, int(n_threads),
    )
    if got != padded:
        return None
    return pv, sh, rot, so


def radix_sort_pairs(keys: np.ndarray, values: np.ndarray):
    """In-place stable ascending u32 radix sort; returns (keys, values).
    Falls back to numpy argsort when the native lib is unavailable."""
    lib = _build_and_load()
    keys = np.ascontiguousarray(keys, np.uint32)
    values = np.ascontiguousarray(values, np.uint32)
    if lib is None:
        order = np.argsort(keys, kind="stable")
        return keys[order], values[order]
    lib.radix_sort_pairs_u32(
        keys.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        values.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        len(keys),
    )
    return keys, values

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
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ]
            lib.ply3d_count.restype = ctypes.c_int64
            lib.ply3d_count.argtypes = [ctypes.c_char_p, ctypes.c_int64]
            lib.radix_sort_pairs_u32.restype = None
            lib.radix_sort_pairs_u32.argtypes = [
                ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint32),
                ctypes.c_int64,
            ]
            fp = ctypes.POINTER(ctypes.c_float)
            u8p = ctypes.POINTER(ctypes.c_uint8)
            for name, args in [
                ("gcloud3d_size", [ctypes.c_int64, ctypes.c_int32]),
                ("gcloud4d_size", [ctypes.c_int64]),
                ("gcloud3d_encode", [fp, fp, fp, fp, ctypes.c_int64, u8p,
                                     ctypes.c_int32]),
                ("gcloud4d_encode", [fp, fp, fp, fp, fp, ctypes.c_int64, u8p]),
                ("gcloud_probe", [ctypes.c_char_p, ctypes.c_int64,
                                  ctypes.POINTER(ctypes.c_int32),
                                  ctypes.POINTER(ctypes.c_int32)]),
                ("gcloud3d_decode", [ctypes.c_char_p, ctypes.c_int64,
                                     fp, fp, fp, fp, ctypes.c_int64,
                                     ctypes.c_int32]),
                ("gcloud4d_decode", [ctypes.c_char_p, ctypes.c_int64,
                                     fp, fp, fp, fp, fp, ctypes.c_int64]),
            ]:
                f = getattr(lib, name)
                f.restype = ctypes.c_int64
                f.argtypes = args
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB


def available() -> bool:
    return _build_and_load() is not None


def parse_ply_3d_native(
    data: bytes, strict_reference: bool = True, n_threads: int = 0,
    sh_width: int = 48, sh_per_channel: int = 16,
):
    """Fast binary PLY decode -> (pv, sh, rot, so) float32 arrays, or None if
    the native path can't handle this file (ascii, list props, no compiler).

    ``sh_width``/``sh_per_channel`` select the SH degree layout (sh0..sh4):
    the padded storage width and the per-channel coefficient count that drives
    the reference's f_rest remap quirk."""
    lib = _build_and_load()
    if lib is None:
        return None
    n_threads = n_threads or (os.cpu_count() or 1)
    padded = lib.ply3d_count(data, len(data))
    if padded <= 0:
        return None
    pv = np.zeros((padded, 4), np.float32)
    sh = np.zeros((padded, sh_width), np.float32)
    rot = np.zeros((padded, 4), np.float32)
    so = np.zeros((padded, 4), np.float32)

    def ptr(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))

    got = lib.ply3d_parse(
        data, len(data), ptr(pv), ptr(sh), ptr(rot), ptr(so),
        1 if strict_reference else 0, int(n_threads), int(sh_width),
        int(sh_per_channel),
    )
    if got != padded:
        return None
    return pv, sh, rot, so


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def encode_gcloud_3d_native(pv, sh, rot, so):
    """Flexbuffers-encode a planar 3D cloud -> bytes, or None if unavailable."""
    lib = _build_and_load()
    if lib is None:
        return None
    n = len(pv)
    pv = np.ascontiguousarray(pv, np.float32)
    sh = np.ascontiguousarray(sh, np.float32)
    rot = np.ascontiguousarray(rot, np.float32)
    so = np.ascontiguousarray(so, np.float32)
    sh_width = int(sh.shape[1])
    out = np.empty(lib.gcloud3d_size(n, sh_width), np.uint8)
    got = lib.gcloud3d_encode(
        _fptr(pv), _fptr(sh), _fptr(rot), _fptr(so), n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), sh_width,
    )
    return out[:got].tobytes() if got > 0 else None


def encode_gcloud_4d_native(pv, sh, iso, so, ts):
    lib = _build_and_load()
    if lib is None:
        return None
    n = len(pv)
    pv = np.ascontiguousarray(pv, np.float32)
    sh = np.ascontiguousarray(sh, np.float32)
    iso = np.ascontiguousarray(iso, np.float32)
    so = np.ascontiguousarray(so, np.float32)
    ts = np.ascontiguousarray(ts, np.float32)
    out = np.empty(lib.gcloud4d_size(n), np.uint8)
    got = lib.gcloud4d_encode(
        _fptr(pv), _fptr(sh), _fptr(iso), _fptr(so), _fptr(ts), n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out[:got].tobytes() if got > 0 else None


def decode_gcloud_native(data: bytes):
    """Decode a flexbuffers gcloud buffer -> dict of arrays, or None.

    Returns {"pv", "sh", "rot"|"iso", "so"[, "ts"], "is4d"}."""
    lib = _build_and_load()
    if lib is None:
        return None
    is4d = ctypes.c_int32(0)
    sh_width = ctypes.c_int32(0)
    n = lib.gcloud_probe(data, len(data), ctypes.byref(is4d),
                         ctypes.byref(sh_width))
    if n < 0:
        return None
    if is4d.value:
        if sh_width.value != 144:
            return None
        pv = np.zeros((n, 4), np.float32)
        sh = np.zeros((n, 144), np.float32)
        iso = np.zeros((n, 8), np.float32)
        so = np.zeros((n, 4), np.float32)
        ts = np.zeros((n, 2), np.float32)
        got = lib.gcloud4d_decode(
            data, len(data), _fptr(pv), _fptr(sh), _fptr(iso), _fptr(so),
            _fptr(ts), n,
        )
        if got != n:
            return None
        return {"pv": pv, "sh": sh, "iso": iso, "so": so, "ts": ts, "is4d": True}
    w = int(sh_width.value)
    if w <= 0:  # empty or malformed: let the Python decoder handle it
        return None
    pv = np.zeros((n, 4), np.float32)
    sh = np.zeros((n, w), np.float32)
    rot = np.zeros((n, 4), np.float32)
    so = np.zeros((n, 4), np.float32)
    got = lib.gcloud3d_decode(
        data, len(data), _fptr(pv), _fptr(sh), _fptr(rot), _fptr(so), n, w,
    )
    if got != n:
        return None
    return {"pv": pv, "sh": sh, "rot": rot, "so": so, "is4d": False}


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

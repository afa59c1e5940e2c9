"""ctypes bindings for the native C++ IO library (native/gipuma_io.cpp).

The reference keeps its IO hot paths native (OpenMP PLY writer,
displayUtils.h:77-237; raw-FILE dmb IO, fileIoUtils.h:247-368); so do we:
the shared library is built from native/gipuma_io.cpp with g++ on first use
and cached.  Every entry point has a pure-numpy fallback, so the framework
works without a compiler.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_REPO_ROOT = Path(__file__).resolve().parents[2]
_SRC = _REPO_ROOT / "native" / "gipuma_io.cpp"
_BUILD_DIR = _REPO_ROOT / "native" / "build"
_LIB_PATH = _BUILD_DIR / "libgipuma_io.so"

_lib = None
_lib_tried = False


def _load():
    """Build (if needed) and load the native library; None on failure."""
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    try:
        if not _LIB_PATH.exists() or (_SRC.exists() and
                                      _SRC.stat().st_mtime > _LIB_PATH.stat().st_mtime):
            _BUILD_DIR.mkdir(parents=True, exist_ok=True)
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", str(_LIB_PATH),
                 str(_SRC)],
                check=True, capture_output=True, timeout=120)
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.gip_write_ply.restype = ctypes.c_longlong
        lib.gip_write_ply.argtypes = [
            ctypes.c_char_p, ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_uint8)]
        lib.gip_write_dmb.restype = ctypes.c_int
        lib.gip_write_dmb.argtypes = [
            ctypes.c_char_p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float)]
        lib.gip_read_dmb_header.restype = ctypes.c_int
        lib.gip_read_dmb_header.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
        lib.gip_read_dmb_data.restype = ctypes.c_int
        lib.gip_read_dmb_data.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_longlong]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def write_ply_native(path, points: np.ndarray, normals: np.ndarray,
                     colors: np.ndarray) -> int | None:
    """Native binary PLY write; returns vertex count or None (fallback)."""
    lib = _load()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, dtype=np.float32)
    nrm = np.ascontiguousarray(normals, dtype=np.float32)
    col = np.ascontiguousarray(np.clip(colors, 0, 255), dtype=np.uint8)
    if col.ndim == 1:
        col = np.repeat(col[:, None], 3, axis=1).copy()
    n = lib.gip_write_ply(
        str(path).encode(), pts.shape[0], _fptr(pts), _fptr(nrm),
        col.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return None if n < 0 else int(n)


def write_dmb_native(path, arr: np.ndarray) -> bool:
    lib = _load()
    if lib is None:
        return False
    a = np.ascontiguousarray(arr, dtype=np.float32)
    if a.ndim == 2:
        h, w, nb = a.shape[0], a.shape[1], 1
    else:
        h, w, nb = a.shape
    return lib.gip_write_dmb(str(path).encode(), h, w, nb, _fptr(a)) == 0


def read_dmb_native(path) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    h = ctypes.c_int32()
    w = ctypes.c_int32()
    nb = ctypes.c_int32()
    if lib.gip_read_dmb_header(str(path).encode(), ctypes.byref(h),
                               ctypes.byref(w), ctypes.byref(nb)) != 0:
        return None
    count = h.value * w.value * nb.value
    out = np.empty(count, dtype=np.float32)
    if lib.gip_read_dmb_data(str(path).encode(), _fptr(out), count) != 0:
        return None
    if nb.value == 1:
        return out.reshape(h.value, w.value)
    return out.reshape(h.value, w.value, nb.value)

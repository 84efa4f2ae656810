"""ctypes loader for the native data-plane library (mgdata.cpp).

Builds lazily with g++ on first import (cached as libmgdata.so next to
the source; rebuilt when the source is newer). Everything degrades to
the Python/PIL implementations in mgtpu/data/transforms.py when the
toolchain is unavailable — ``available()`` tells callers which path is
live. This mirrors the reference's L0 split (SURVEY §2.9): Lua
orchestration over a native `image`/`threads` compute layer.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "mgdata.cpp")
_LIB = os.path.join(_DIR, "libmgdata.so")

_lock = threading.Lock()
_lib = None
_tried = False

_f32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")


def _build() -> bool:
    # compile to a unique temp path then atomically rename: a killed or
    # concurrent build must never leave a partial .so at _LIB (which
    # would look fresh and silently disable the native path forever)
    tmp = f"{_LIB}.{os.getpid()}.tmp"
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        "-o", tmp, _SRC,
    ]
    try:
        r = subprocess.run(cmd, capture_output=True, timeout=120)
        if r.returncode != 0:
            return False
        os.replace(tmp, _LIB)
        return True
    except (OSError, subprocess.TimeoutExpired):
        return False
    finally:
        if os.path.exists(tmp):
            try:
                os.remove(tmp)
            except OSError:
                pass


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            stale = (not os.path.exists(_LIB)) or (
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
            )
            if stale and not _build():
                return None
            try:
                lib = ctypes.CDLL(_LIB)
            except OSError:
                # corrupt .so from an interrupted historical build:
                # rebuild once before giving up
                os.remove(_LIB)
                if not _build():
                    return None
                lib = ctypes.CDLL(_LIB)
            lib.mg_version.restype = ctypes.c_int
            if lib.mg_version() != 1:
                return None
            lib.mg_resize.argtypes = [
                _f32, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                _f32, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ]
            lib.mg_warp_affine.argtypes = [
                _f32, ctypes.c_int, ctypes.c_int, ctypes.c_int, _f32,
                ctypes.c_double, ctypes.c_double, ctypes.c_double,
                ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ]
            lib.mg_crop_flip_normalize.argtypes = [
                _f32, ctypes.c_int, ctypes.c_int, ctypes.c_int, _f32,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                _f32, _f32,
            ]
            lib.mg_whiten.argtypes = [
                _f32, _f32, _f32, _f32, ctypes.c_int, ctypes.c_int,
            ]
            _lib = lib
        except OSError:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


_FILTERS = {"nearest": 0, "bilinear": 1, "bicubic": 2}


def resize(img: np.ndarray, oh: int, ow: int, filter: str = "bicubic") -> np.ndarray:
    """PIL-parity separable resample; img HWC float32."""
    lib = _load()
    assert lib is not None
    img = np.ascontiguousarray(img, np.float32)
    h, w, c = img.shape
    out = np.empty((oh, ow, c), np.float32)
    lib.mg_resize(img, h, w, c, out, oh, ow, _FILTERS[filter])
    return out


def warp_affine(img: np.ndarray, coeffs) -> np.ndarray:
    """PIL Image.transform(AFFINE, bilinear) parity; coeffs (a,b,tx,d,e,ty)."""
    lib = _load()
    assert lib is not None
    img = np.ascontiguousarray(img, np.float32)
    h, w, c = img.shape
    out = np.empty_like(img)
    a, b, tx, d, e, ty = (float(v) for v in coeffs)
    lib.mg_warp_affine(img, h, w, c, out, a, b, tx, d, e, ty)
    return out


def crop_flip_normalize(
    img: np.ndarray,
    y1: int,
    x1: int,
    size: int,
    flip: bool,
    mean: np.ndarray,
    std: np.ndarray,
    out: np.ndarray | None = None,
) -> np.ndarray:
    """Fused crop+flip+normalize, optionally into a preallocated slot."""
    lib = _load()
    assert lib is not None
    img = np.ascontiguousarray(img, np.float32)
    h, w, c = img.shape
    if not (0 <= y1 and 0 <= x1 and y1 + size <= h and x1 + size <= w):
        raise ValueError(f"crop ({y1},{x1})+{size} exceeds image {h}x{w}")
    if out is None:
        out = np.empty((size, size, c), np.float32)
    elif out.shape != (size, size, c) or out.dtype != np.float32:
        # ndpointer checks dtype/contiguity only — a wrong-shaped out
        # would let the native write run past the buffer
        raise ValueError(f"out must be ({size},{size},{c}) f32, got "
                         f"{out.shape} {out.dtype}")
    mean = np.ascontiguousarray(np.broadcast_to(mean, (c,)), np.float32)
    std = np.ascontiguousarray(np.broadcast_to(std, (c,)), np.float32)
    lib.mg_crop_flip_normalize(img, h, w, c, out, y1, x1, size, int(flip), mean, std)
    return out


def whiten(x: np.ndarray, mean: np.ndarray, p: np.ndarray) -> np.ndarray:
    """(x - mean) @ p for (n, d) x, dense (d, d) p."""
    lib = _load()
    assert lib is not None
    x = np.ascontiguousarray(x, np.float32)
    n, d = x.shape
    out = np.empty_like(x)
    lib.mg_whiten(x, np.ascontiguousarray(mean, np.float32),
                  np.ascontiguousarray(p, np.float32), out, n, d)
    return out

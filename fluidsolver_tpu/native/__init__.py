"""ctypes loader for the native host kernels (ib_kernels.cpp).

Builds on first import if the shared library is missing and a compiler is
available; every entry point has a pure-Python fallback in the respective
module, so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libfs_native.so")

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["sh", os.path.join(_DIR, "build.sh")],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    i64 = ctypes.c_int64
    f64 = ctypes.c_double
    pd = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    pi = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    pi1 = ctypes.POINTER(ctypes.c_int64)

    lib.luchini_correction_circle.argtypes = [pd, i64, pd, i64, f64, f64, f64, f64, f64, pd]
    lib.luchini_correction_circle.restype = ctypes.c_int
    lib.sharp_stencil_circle.argtypes = [
        pd, i64, pd, i64, f64, f64, f64, f64, f64, ctypes.c_int,
        pi, pi, pi, pd, pd, pi1, pi, pi1,
    ]
    lib.sharp_stencil_circle.restype = ctypes.c_int
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def luchini_correction_circle(xs, ys, dx, dy, cx, cy, r):
    """Native Luchini lambda field; returns None if the library is absent."""
    lib = _load()
    if lib is None:
        return None
    xs = np.ascontiguousarray(xs, np.float64)
    ys = np.ascontiguousarray(ys, np.float64)
    out = np.zeros((len(xs), len(ys)))
    rc = lib.luchini_correction_circle(
        xs, len(xs), ys, len(ys), float(dx), float(dy), float(cx), float(cy), float(r), out
    )
    return out if rc == 0 else None


def sharp_stencil_circle(xs, ys, dx, dy, cx, cy, r, scheme: str):
    """Native sharp-IB stencil build; returns None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    xs = np.ascontiguousarray(xs, np.float64)
    ys = np.ascontiguousarray(ys, np.float64)
    cap = len(xs) * len(ys)
    tgt = np.zeros(cap, np.int64)
    nb1 = np.zeros(cap, np.int64)
    nb2 = np.zeros(cap, np.int64)
    w1 = np.zeros(cap, np.float64)
    w2 = np.zeros(cap, np.float64)
    deep = np.zeros(cap, np.int64)
    n = ctypes.c_int64(cap)
    nd = ctypes.c_int64(cap)
    rc = lib.sharp_stencil_circle(
        xs, len(xs), ys, len(ys), float(dx), float(dy), float(cx), float(cy), float(r),
        0 if scheme == "linear" else 1,
        tgt, nb1, nb2, w1, w2, ctypes.byref(n), deep, ctypes.byref(nd),
    )
    if rc != 0:
        return None
    k, kd = n.value, nd.value
    return tgt[:k], nb1[:k], nb2[:k], w1[:k], w2[:k], deep[:kd]

"""ctypes bindings for the native C++ runtime (native/oco_native.cpp).

The library is built on demand with g++ (no pybind11 in this image; plain
ctypes over an extern-C surface).  All entry points take C-contiguous f64
arrays.  If the toolchain is unavailable, ``load()`` raises and callers
fall back to the pure-Python golden oracle.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "liboco_native.so")

_lib: Optional[ctypes.CDLL] = None

_i64 = ctypes.c_int64
_f64 = ctypes.c_double
_pd = np.ctypeslib.ndpointer(dtype=np.float64, flags="C_CONTIGUOUS")
_pi = np.ctypeslib.ndpointer(dtype=np.int64, flags="C_CONTIGUOUS")


def build(force: bool = False) -> str:
    """Compile the shared library (cached)."""
    src = os.path.join(_NATIVE_DIR, "oco_native.cpp")
    if force or not os.path.exists(_LIB_PATH) or (
            os.path.getmtime(_LIB_PATH) < os.path.getmtime(src)):
        os.makedirs(os.path.dirname(_LIB_PATH), exist_ok=True)
        cmd = ["g++", "-O2", "-fPIC", "-shared", "-ffp-contract=off",
               "-fopenmp", "-Wall", "-o", _LIB_PATH, src]
        try:
            subprocess.run(cmd, check=True, capture_output=True, text=True)
        except subprocess.CalledProcessError:
            # Retry without OpenMP (missing libgomp).
            cmd.remove("-fopenmp")
            subprocess.run(cmd, check=True, capture_output=True, text=True)
    return _LIB_PATH


def load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    lib = ctypes.CDLL(build())
    lib.oco_simulate_alg_batch.argtypes = [
        _pd, _pd, _i64, _i64, _i64, ctypes.c_int, _f64, _pd]
    lib.oco_simulate_smart_batch.argtypes = [
        _pd, _pd, _i64, _i64, _i64, _pd, _f64, _pd, _pi]
    lib.oco_exact_prefix_actions.argtypes = [
        _pd, _pd, _i64, _i64, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        _f64, _f64, _f64, _pd]
    lib.oco_exact_prefix_actions_batch.argtypes = [
        _pd, _pd, _i64, _i64, _i64, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        _f64, _f64, _f64, _pd]
    lib.oco_certified_prefix_actions.argtypes = [
        _pd, _pd, _i64, _i64, ctypes.c_int, _pd]
    lib.oco_certified_prefix_actions.restype = ctypes.c_int
    lib.oco_num_threads.restype = ctypes.c_int
    _lib = lib
    return lib


def available() -> bool:
    try:
        load()
        return True
    except Exception:
        return False


_NORM_CODE = {"l2": 0, "linf": 1, "l1": 2}


def simulate_alg_batch(z: np.ndarray, y: np.ndarray, alg_flag: int,
                       eta0: float) -> np.ndarray:
    """Batched FTL/FTRL regrets with reference-exact scalar semantics."""
    lib = load()
    z = np.ascontiguousarray(z, dtype=np.float64)
    y = np.ascontiguousarray(y, dtype=np.float64)
    B, T, d = z.shape
    out = np.empty(B, dtype=np.float64)
    lib.oco_simulate_alg_batch(z, y, B, T, d, int(alg_flag), float(eta0), out)
    return out


def simulate_smart_batch(z: np.ndarray, y: np.ndarray, thresh,
                         eta0: float) -> Tuple[np.ndarray, np.ndarray]:
    """Batched SMART regrets + switch rounds (reference-exact)."""
    lib = load()
    z = np.ascontiguousarray(z, dtype=np.float64)
    y = np.ascontiguousarray(y, dtype=np.float64)
    B, T, d = z.shape
    thresh = np.ascontiguousarray(
        np.broadcast_to(np.asarray(thresh, np.float64), (B,)))
    out = np.empty(B, dtype=np.float64)
    sw = np.empty(B, dtype=np.int64)
    lib.oco_simulate_smart_batch(z, y, B, T, d, thresh, float(eta0), out, sw)
    return out, sw


def certified_prefix_actions(z: np.ndarray, y: np.ndarray, *,
                             norm: str = "l2") -> Optional[np.ndarray]:
    """Certified closed-form exact-FTL trajectory (native twin of
    models/linear_regime.py), or None if any prefix is uncertified."""
    lib = load()
    z = np.ascontiguousarray(z, dtype=np.float64)
    y = np.ascontiguousarray(y, dtype=np.float64)
    T, d = z.shape
    out = np.empty(((T + 1), d), dtype=np.float64)
    ok = lib.oco_certified_prefix_actions(z, y, T, d, _NORM_CODE[norm], out)
    return out if ok else None


def exact_prefix_actions(z: np.ndarray, y: np.ndarray, *, norm: str = "l2",
                         iters_first: int = 4000, iters_warm: int = 600,
                         rho: float = 2.0, alpha: float = 1.7,
                         tol: float = 1e-9,
                         allow_linear: bool = True) -> np.ndarray:
    """Per-prefix exact-FTL solutions, shape (T+1, d): the certified
    closed form when the whole trajectory certifies (exact, zero
    iterations), the warm-started ADMM otherwise."""
    lib = load()
    z = np.ascontiguousarray(z, dtype=np.float64)
    y = np.ascontiguousarray(y, dtype=np.float64)
    T, d = z.shape
    if allow_linear:
        lin = certified_prefix_actions(z, y, norm=norm)
        if lin is not None:
            return lin
    out = np.empty(((T + 1), d), dtype=np.float64)
    lib.oco_exact_prefix_actions(z, y, T, d, _NORM_CODE[norm],
                                 iters_first, iters_warm, rho, alpha, tol, out)
    return out


def num_threads() -> int:
    return load().oco_num_threads()

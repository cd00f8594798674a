"""ctypes bindings for the native host-side data runtime.

``native/fetode_native.cpp`` provides the hot host loops (CSV ingest,
sliding-window gather, per-row z-norm, deterministic shuffling); this
module builds it on demand with g++ (cached .so) and falls back to numpy
when no compiler is available, so nothing hard-depends on the toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
_SRC = os.path.join(_ROOT, "native", "fetode_native.cpp")
_SO = os.path.join(_ROOT, "native", "build", "libfetode_native.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    try:
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-o", _SO, _SRC],
            check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def load():
    """Return the loaded library, or None when unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_SO)):
            if not _build():
                return None
        lib = ctypes.CDLL(_SO)
        i64 = ctypes.c_int64
        fp = ctypes.POINTER(ctypes.c_float)
        ip = ctypes.POINTER(i64)
        lib.fet_parse_csv.argtypes = [ctypes.c_char_p, fp, ip]
        lib.fet_parse_csv.restype = ctypes.c_int
        lib.fet_window_gather.argtypes = [fp, i64, i64, ip, i64, i64, fp]
        lib.fet_znorm_rows.argtypes = [fp, i64, i64, ctypes.c_float]
        lib.fet_shuffle.argtypes = [ip, i64, ctypes.c_uint64]
        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def parse_csv(path: str) -> np.ndarray:
    """Numeric CSV -> (rows, cols) float32 (NaN for non-numeric fields)."""
    lib = load()
    if lib is None:
        import pandas as pd
        df = pd.read_csv(path)
        return df.apply(lambda c: np.asarray(
            [float(v) if _is_num(v) else np.nan for v in c],
            np.float32)).values.astype(np.float32)
    shape = np.zeros(2, np.int64)
    rc = lib.fet_parse_csv(path.encode(), None, _iptr(shape))
    if rc != 0:
        raise OSError(f"fet_parse_csv({path}) failed: {rc}")
    out = np.empty(int(shape[0] * shape[1]), np.float32)
    rc = lib.fet_parse_csv(path.encode(), _fptr(out), _iptr(shape))
    if rc != 0:
        raise OSError(f"fet_parse_csv({path}) failed: {rc}")
    return out.reshape(int(shape[0]), int(shape[1]))


def _is_num(v):
    try:
        float(v)
        return True
    except (TypeError, ValueError):
        return False


def window_gather(X: np.ndarray, starts: np.ndarray, ctx: int) -> np.ndarray:
    """(n, f) array + m start indices -> (m, ctx, f) windows."""
    X = np.ascontiguousarray(X, np.float32)
    starts = np.ascontiguousarray(starts, np.int64)
    lib = load()
    if lib is None:
        return X[starts[:, None] + np.arange(ctx)[None, :]]
    m = len(starts)
    out = np.empty((m, ctx, X.shape[1]), np.float32)
    lib.fet_window_gather(_fptr(X), X.shape[0], X.shape[1], _iptr(starts),
                          m, ctx, _fptr(out))
    return out


def znorm_rows(x: np.ndarray, eps: float = 1e-8) -> np.ndarray:
    x = np.ascontiguousarray(x, np.float32).copy()
    lib = load()
    if lib is None:
        mu = x.mean(1, keepdims=True)
        sd = x.std(1, keepdims=True)
        return (x - mu) / (sd + eps)
    lib.fet_znorm_rows(_fptr(x), x.shape[0], x.shape[1], eps)
    return x


def shuffled_indices(n: int, seed: int) -> np.ndarray:
    idx = np.arange(n, dtype=np.int64)
    lib = load()
    if lib is None:
        np.random.default_rng(seed).shuffle(idx)
        return idx
    lib.fet_shuffle(_iptr(idx), n, ctypes.c_uint64(seed or 1))
    return idx

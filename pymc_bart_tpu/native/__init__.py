"""Host-side native (C++) tree runtime.

Lazy-builds ``_bartcore.so`` with g++ on first use and exposes
``forest_predict_native`` via ctypes.  Falls back gracefully (returns
None from ``load()``) when no toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "bartcore.cpp")
_LIB = os.path.join(_HERE, "_bartcore.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def build(force: bool = False) -> Optional[str]:
    """Compile the native library; returns its path or None."""
    if os.path.exists(_LIB) and not force:
        if os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
            return _LIB
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB],
            check=True, capture_output=True, timeout=120,
        )
        return _LIB
    except Exception:
        return None


def load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None:
        return _lib
    if _tried:
        return None
    _tried = True
    path = build()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.bart_forest_predict.restype = None
    lib.bart_forest_predict.argtypes = [
        ctypes.POINTER(ctypes.c_int32),   # split_var
        ctypes.POINTER(ctypes.c_float),   # split_val
        ctypes.POINTER(ctypes.c_uint32),  # split_set
        ctypes.POINTER(ctypes.c_float),   # leaf
        ctypes.POINTER(ctypes.c_float),   # count
        ctypes.POINTER(ctypes.c_float),   # slope
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),   # X
        ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),   # rules
        ctypes.c_void_p,                  # excluded (uint8* or NULL)
        ctypes.POINTER(ctypes.c_float),   # out
    ]
    _lib = lib
    return lib


def _cptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def forest_predict_native(split_var, split_val, split_set, leaf, count, slope,
                          X, rules, excluded: Optional[Sequence[int]] = None
                          ) -> Optional[np.ndarray]:
    """CPU sum-of-trees prediction over stacked draws.

    Inputs shaped (draws, m, S[, k]); X (n, p).  Returns (draws, n, k) or
    None if the native library is unavailable.
    """
    lib = load()
    if lib is None:
        return None
    split_var = np.ascontiguousarray(split_var, np.int32)
    split_val = np.ascontiguousarray(split_val, np.float32)
    split_set = np.ascontiguousarray(split_set, np.uint32)
    leaf = np.ascontiguousarray(leaf, np.float32)
    count = np.ascontiguousarray(count, np.float32)
    slope = np.ascontiguousarray(slope, np.float32)
    X = np.ascontiguousarray(X, np.float32)
    rules = np.ascontiguousarray(rules, np.int32)
    draws, m, S, k = leaf.shape
    n, p = X.shape
    if k > 64:
        raise ValueError("native predictor supports up to 64 outputs")
    out = np.empty((draws, n, k), np.float32)
    if excluded is not None and len(excluded) > 0:
        mask = np.zeros(p, np.uint8)
        mask[np.asarray(excluded, int)] = 1
        excl_ptr = mask.ctypes.data_as(ctypes.c_void_p)
    else:
        mask = None
        excl_ptr = ctypes.c_void_p(0)
    lib.bart_forest_predict(
        _cptr(split_var, ctypes.c_int32), _cptr(split_val, ctypes.c_float),
        _cptr(split_set, ctypes.c_uint32), _cptr(leaf, ctypes.c_float),
        _cptr(count, ctypes.c_float), _cptr(slope, ctypes.c_float),
        draws, m, S, k,
        _cptr(X, ctypes.c_float), n, p,
        _cptr(rules, ctypes.c_int32), excl_ptr,
        _cptr(out, ctypes.c_float),
    )
    return out

"""ctypes bindings for the native host-side grid builder.

`native/grid_builder.cpp` implements the reference-exact ragged nested
grid (`utils/calc_integral/create_grids.py`, bivariate) and a masked
cached-tensor integral — the C++ analog of the numba layer the reference
leans on. Builds on demand with the repo Makefile if the shared library
is missing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libgrid_builder.so")

_lib: Optional[ctypes.CDLL] = None

_D = np.ctypeslib.ndpointer(dtype=np.float64, flags="C_CONTIGUOUS")
_I = np.ctypeslib.ndpointer(dtype=np.int64, flags="C_CONTIGUOUS")


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        subprocess.run(
            ["make", "-C", _NATIVE_DIR], check=True, capture_output=True
        )
    lib = ctypes.CDLL(_LIB_PATH)
    lib.nested_grid_rows_2d.restype = ctypes.c_int64
    lib.nested_grid_rows_2d.argtypes = [
        _D, ctypes.c_int64, ctypes.c_double, ctypes.c_double, _D,
        ctypes.c_double, ctypes.c_double,
    ]
    lib.build_nested_grid_2d.restype = ctypes.c_int64
    lib.build_nested_grid_2d.argtypes = [
        _D, _D, ctypes.c_int64, _D, ctypes.c_int64, _I, ctypes.c_int64,
        ctypes.c_double, ctypes.c_double, _D, ctypes.c_double,
        ctypes.c_double, _D, _D,
    ]
    lib.masked_integrals_2d.restype = None
    lib.masked_integrals_2d.argtypes = [
        _D, _D, _D, ctypes.c_int64, _D, ctypes.c_int64, _D,
        ctypes.c_double, ctypes.c_double, _D,
    ]
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


def build_nested_grid(
    x, dx, densities, params, lower: float, upper: float, weights,
    box: Tuple[float, float] = (-5.0, 5.0),
) -> Tuple[np.ndarray, np.ndarray]:
    """Reference-exact ragged grid + delta products (dim == 2).

    densities: (2, q, n); params: (L, 2) int state combos.
    Returns (grids (rows, 2), deltas (rows, L)).
    """
    lib = _load()
    x = np.ascontiguousarray(x, dtype=np.float64)
    dx = np.ascontiguousarray(dx, dtype=np.float64)
    densities = np.ascontiguousarray(densities, dtype=np.float64)
    params = np.ascontiguousarray(params, dtype=np.int64)
    weights = np.ascontiguousarray(weights, dtype=np.float64)
    n = x.shape[0]
    q = densities.shape[1]
    L = params.shape[0]
    rows = lib.nested_grid_rows_2d(x, n, lower, upper, weights, box[0], box[1])
    grids = np.empty((rows, 2), dtype=np.float64)
    deltas = np.empty((rows, L), dtype=np.float64)
    written = lib.build_nested_grid_2d(
        x, dx, n, densities, q, params, L, lower, upper, weights,
        box[0], box[1], grids, deltas,
    )
    assert written == rows
    return grids, deltas


def masked_integrals(
    day_tensors, x, dx, bounds, weights,
    box: Tuple[float, float] = (-5.0, 5.0),
) -> np.ndarray:
    """Native CPU masked integrals from (T, n, n) cached day tensors —
    the host analog of `ops.quadrature.garch_integrals_cached`."""
    lib = _load()
    V = np.ascontiguousarray(day_tensors, dtype=np.float64)
    x = np.ascontiguousarray(x, dtype=np.float64)
    dx = np.ascontiguousarray(dx, dtype=np.float64)
    bounds = np.ascontiguousarray(bounds, dtype=np.float64)
    weights = np.ascontiguousarray(weights, dtype=np.float64)
    T, n, _ = V.shape
    out = np.empty(T, dtype=np.float64)
    lib.masked_integrals_2d(V, x, dx, n, bounds, T, weights, box[0], box[1], out)
    return out

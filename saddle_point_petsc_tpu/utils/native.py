"""ctypes bindings for the native C++ host kernels (csrc/sptpu_native.cpp).

Builds the shared library on first use (g++, ~1s) and caches it next to the
sources.  Every entry point has a numpy fallback at its call site, so the
framework works without a toolchain; with it, ILU(0) setup and COO
finalization run at C++ speed (SURVEY.md §7 hard parts (a),(c)).
"""
from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess

import numpy as np

_LIB = None
_CSRC = pathlib.Path(__file__).resolve().parents[1] / "csrc"


class NativeUnavailable(RuntimeError):
    pass


def _build():
    so = _CSRC / "libsptpu_native.so"
    src = _CSRC / "sptpu_native.cpp"
    if so.exists() and so.stat().st_mtime >= src.stat().st_mtime:
        return so
    try:
        subprocess.run(
            ["make", "-C", str(_CSRC), "libsptpu_native.so"],
            check=True,
            capture_output=True,
        )
    except Exception as e:  # toolchain missing / build failure
        raise NativeUnavailable(f"native build failed: {e}") from e
    return so


def _lib():
    global _LIB
    if _LIB is None:
        so = _build()
        lib = ctypes.CDLL(str(so))
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        lib.sptpu_ilu0.restype = ctypes.c_int64
        lib.sptpu_ilu0.argtypes = [ctypes.c_int64, i32p, i32p, f64p]
        lib.sptpu_coo_to_csr.restype = ctypes.c_int64
        lib.sptpu_coo_to_csr.argtypes = [
            ctypes.c_int64, ctypes.c_int64, i32p, i32p, f64p,
            i32p, i32p, f64p, i64p,
        ]
        lib.sptpu_lower_solve_unit.restype = None
        lib.sptpu_lower_solve_unit.argtypes = [
            ctypes.c_int64, i32p, i32p, f64p, f64p, f64p,
        ]
        lib.sptpu_upper_solve.restype = None
        lib.sptpu_upper_solve.argtypes = [
            ctypes.c_int64, i32p, i32p, f64p, f64p, f64p,
        ]
        lib.sptpu_rcm.restype = None
        lib.sptpu_rcm.argtypes = [ctypes.c_int64, i32p, i32p, i32p]
        lib.sptpu_aggregate.restype = ctypes.c_int64
        lib.sptpu_aggregate.argtypes = [ctypes.c_int64, i32p, i32p, i32p]
        _LIB = lib
    return _LIB


def available() -> bool:
    try:
        _lib()
        return True
    except NativeUnavailable:
        return False


def ilu0(indptr, indices, data, n):
    """In-place ILU(0) on CSR values (returns the factored data array)."""
    lib = _lib()
    indptr = np.ascontiguousarray(indptr, np.int32)
    indices = np.ascontiguousarray(indices, np.int32)
    data = np.ascontiguousarray(data, np.float64)
    rc = lib.sptpu_ilu0(n, indptr, indices, data)
    if rc != 0:
        raise ZeroDivisionError(f"ILU(0): zero pivot at row {rc - 1}")
    return data


def coo_to_csr(rows, cols, vals, m):
    """Sort + dedup COO triplets -> (indptr, cols, vals)."""
    lib = _lib()
    rows = np.ascontiguousarray(rows, np.int32)
    cols = np.ascontiguousarray(cols, np.int32)
    vals = np.ascontiguousarray(vals, np.float64)
    nnz = rows.shape[0]
    indptr = np.zeros(m + 1, np.int32)
    out_cols = np.zeros(nnz, np.int32)
    out_vals = np.zeros(nnz, np.float64)
    out_nnz = np.zeros(1, np.int64)
    lib.sptpu_coo_to_csr(
        m, nnz, rows, cols, vals, indptr, out_cols, out_vals, out_nnz
    )
    k = int(out_nnz[0])
    return indptr, out_cols[:k], out_vals[:k]


def lower_solve_unit(indptr, indices, data, b):
    lib = _lib()
    n = b.shape[0]
    x = np.zeros_like(b, dtype=np.float64)
    lib.sptpu_lower_solve_unit(
        n,
        np.ascontiguousarray(indptr, np.int32),
        np.ascontiguousarray(indices, np.int32),
        np.ascontiguousarray(data, np.float64),
        np.ascontiguousarray(b, np.float64),
        x,
    )
    return x


def upper_solve(indptr, indices, data, b):
    lib = _lib()
    n = b.shape[0]
    x = np.zeros_like(b, dtype=np.float64)
    lib.sptpu_upper_solve(
        n,
        np.ascontiguousarray(indptr, np.int32),
        np.ascontiguousarray(indices, np.int32),
        np.ascontiguousarray(data, np.float64),
        np.ascontiguousarray(b, np.float64),
        x,
    )
    return x


def aggregate(indptr, indices, n):
    """Greedy standard aggregation on a strength graph -> (agg ids, count)."""
    lib = _lib()
    agg = np.zeros(n, np.int32)
    na = lib.sptpu_aggregate(
        n,
        np.ascontiguousarray(indptr, np.int32),
        np.ascontiguousarray(indices, np.int32),
        agg,
    )
    return agg, int(na)


def rcm(indptr, indices, n):
    """Reverse Cuthill-McKee permutation."""
    lib = _lib()
    perm = np.zeros(n, np.int32)
    lib.sptpu_rcm(
        n,
        np.ascontiguousarray(indptr, np.int32),
        np.ascontiguousarray(indices, np.int32),
        perm,
    )
    return perm

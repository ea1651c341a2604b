"""ctypes bindings for the first-party C++ host ops.

Build with ``make -C graphslim_tpu/native`` (auto-built on first import
when a compiler is available).  Every op has a NumPy/SciPy fallback in its
Python call site, so the framework runs without the .so — the native
library is the fast path for large host-side graph work.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess

import numpy as np

log = logging.getLogger("graphslim_tpu")

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libgraphslim_native.so")
_LIB = None


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _DIR], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_SO)
    except Exception as e:  # no compiler / readonly fs
        log.debug("native build failed: %s", e)
        return False


def load() -> ctypes.CDLL | None:
    """Load (building on demand) the native library, or None."""
    global _LIB
    if _LIB is not None:
        return _LIB
    if not os.path.exists(_SO) and not _build():
        return None
    lib = ctypes.CDLL(_SO)
    i64p = ctypes.POINTER(ctypes.c_int64)
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.csr_sort_dedup.restype = ctypes.c_int64
    lib.csr_sort_dedup.argtypes = [i64p, i64p, f64p, ctypes.c_int64]
    lib.greedy_matching.restype = ctypes.c_int64
    lib.greedy_matching.argtypes = [i64p, i64p, f64p, ctypes.c_int64,
                                    ctypes.c_int64, ctypes.c_double, i64p]
    lib.t_spanner.restype = ctypes.c_int64
    lib.t_spanner.argtypes = [i64p, i64p, f64p, ctypes.c_int64,
                              ctypes.c_int64, ctypes.c_double, i64p]
    lib.connected_components.restype = ctypes.c_int64
    lib.connected_components.argtypes = [i64p, i64p, ctypes.c_int64,
                                         ctypes.c_int64, i64p]
    lib.max_weight_matching.restype = ctypes.c_int64
    lib.max_weight_matching.argtypes = [i64p, i64p, i64p, ctypes.c_int64,
                                        ctypes.c_int64, i64p]
    lib.partition_graph.restype = ctypes.c_int64
    lib.partition_graph.argtypes = [i64p, i64p, ctypes.c_int64,
                                    ctypes.c_int64, ctypes.c_double,
                                    ctypes.c_int64, i64p]
    _LIB = lib
    return lib


def _i64(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _f64(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def t_spanner(src: np.ndarray, dst: np.ndarray, weight: np.ndarray,
              n: int, t: float) -> np.ndarray | None:
    """Exact greedy t-spanner kept-edge indices, or None w/o native lib."""
    lib = load()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, dtype=np.int64)
    dst = np.ascontiguousarray(dst, dtype=np.int64)
    w = np.ascontiguousarray(weight, dtype=np.float64)
    out = np.empty(src.shape[0], dtype=np.int64)
    kept = lib.t_spanner(_i64(src), _i64(dst), _f64(w), src.shape[0], n,
                         float(t), _i64(out))
    return out[:kept]


def greedy_matching(src: np.ndarray, dst: np.ndarray,
                    weight: np.ndarray, n: int, r: float
                    ) -> np.ndarray | None:
    lib = load()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, dtype=np.int64)
    dst = np.ascontiguousarray(dst, dtype=np.int64)
    w = np.ascontiguousarray(weight, dtype=np.float64)
    out = np.empty(2 * src.shape[0] + 2, dtype=np.int64)
    cnt = lib.greedy_matching(_i64(src), _i64(dst), _f64(w),
                              src.shape[0], n, float(r), _i64(out))
    return out[: 2 * cnt].reshape(-1, 2)


def max_weight_matching(src: np.ndarray, dst: np.ndarray,
                        weight: np.ndarray, n: int
                        ) -> np.ndarray | None:
    """Exact Edmonds blossom maximum-weight matching (pairs [k,2]).

    Float weights are scaled to int64 at 2^24 relative resolution (the
    duals of the primal-dual blossom stay exactly integral, so the
    matching is exact for the scaled weights). Non-positive-weight edges
    are ignored. Returns None without the native library.
    """
    lib = load()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, dtype=np.int64)
    dst = np.ascontiguousarray(dst, dtype=np.int64)
    w = np.asarray(weight, dtype=np.float64)
    wmax = float(w.max()) if w.size else 0.0
    if wmax <= 0:
        return np.zeros((0, 2), dtype=np.int64)
    wi = np.ascontiguousarray(
        np.maximum(np.round(w / wmax * (1 << 24)), 0).astype(np.int64))
    out = np.empty(2 * n + 2, dtype=np.int64)
    cnt = lib.max_weight_matching(_i64(src), _i64(dst), _i64(wi),
                                  src.shape[0], n, _i64(out))
    return out[: 2 * cnt].reshape(-1, 2)


def csr_sort_dedup(rows: np.ndarray, cols: np.ndarray,
                   vals: np.ndarray) -> tuple | None:
    lib = load()
    if lib is None:
        return None
    rows = np.ascontiguousarray(rows, dtype=np.int64)
    cols = np.ascontiguousarray(cols, dtype=np.int64)
    vals = np.ascontiguousarray(vals, dtype=np.float64)
    nnz = lib.csr_sort_dedup(_i64(rows), _i64(cols), _f64(vals),
                             rows.shape[0])
    return rows[:nnz], cols[:nnz], vals[:nnz]


def partition_graph(indptr: np.ndarray, col: np.ndarray, k: int,
                    slack: float = 0.06, passes: int = 8
                    ) -> tuple[np.ndarray, int] | None:
    """Balanced k-way min-edge-cut partition (BFS growth + FM-lite).

    Returns (part ids [n] int64, directed cut count), or None without
    the native library (callers fall back to RCM-contiguous).
    """
    lib = load()
    if lib is None:
        return None
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    col = np.ascontiguousarray(col, dtype=np.int64)
    n = indptr.shape[0] - 1
    part = np.empty(n, dtype=np.int64)
    cut = lib.partition_graph(_i64(indptr), _i64(col), n, int(k),
                              float(slack), int(passes), _i64(part))
    return part, int(cut)


def connected_components(src: np.ndarray, dst: np.ndarray,
                         n: int) -> tuple | None:
    lib = load()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, dtype=np.int64)
    dst = np.ascontiguousarray(dst, dtype=np.int64)
    comp = np.empty(n, dtype=np.int64)
    n_comp = lib.connected_components(_i64(src), _i64(dst),
                                      src.shape[0], n, _i64(comp))
    return int(n_comp), comp

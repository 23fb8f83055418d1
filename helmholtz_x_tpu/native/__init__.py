"""Native (C++) mesh/graph preprocessing kernels, loaded via ctypes.

Build with ``csrc/build.sh`` (g++; no external deps).  Every entry point has
a numpy fallback so the package works without the shared library — the
native path matters for the largest meshes (RCM for the banded device LU,
COO dedup for assembly, facet adjacency for boundary integrals).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_SO = os.path.join(os.path.dirname(__file__), "_meshkit.so")


def _load():
    global _LIB
    if _LIB is None and os.path.exists(_SO):
        lib = ctypes.CDLL(_SO)
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        lib.rcm.argtypes = [ctypes.c_int64, i64p, i64p, i64p]
        lib.bandwidth.restype = ctypes.c_int64
        lib.bandwidth.argtypes = [ctypes.c_int64, i64p, i64p, ctypes.c_int64, i64p]
        lib.coo_dedup.restype = ctypes.c_int64
        lib.coo_dedup.argtypes = [ctypes.c_int64, ctypes.c_int64, i64p, i64p,
                                  f64p, f64p, i64p, i64p, f64p, f64p]
        lib.facet_adjacency.argtypes = [ctypes.c_int64, ctypes.c_int64, i64p,
                                        ctypes.c_int64, ctypes.c_int64, i64p, i64p]
        _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


_RCM_CACHE: dict = {}


def rcm(indptr: np.ndarray, indices: np.ndarray) -> np.ndarray:
    """Reverse Cuthill-McKee ordering of a symmetric CSR adjacency graph.

    Memoized by a digest of the sparsity pattern (bounded, 4 entries):
    every shifted factorization of a case shares one pattern, and a
    nonlinear solve builds several factors (sigma, converged-eigenvalue
    polish, adjoint) — each RCM recomputation costs ~1 s at 35k dofs."""
    import hashlib

    key = (len(indptr), len(indices),
           hashlib.blake2b(np.ascontiguousarray(indptr).tobytes(),
                           digest_size=16).hexdigest(),
           hashlib.blake2b(np.ascontiguousarray(indices).tobytes(),
                           digest_size=16).hexdigest())
    hit = _RCM_CACHE.get(key)
    if hit is not None:
        return hit
    perm = _rcm_impl(indptr, indices)
    if len(_RCM_CACHE) >= 4:
        _RCM_CACHE.pop(next(iter(_RCM_CACHE)))
    _RCM_CACHE[key] = perm
    return perm


def _rcm_impl(indptr: np.ndarray, indices: np.ndarray) -> np.ndarray:
    n = len(indptr) - 1
    lib = _load()
    if lib is None:
        from scipy.sparse import csr_matrix
        from scipy.sparse.csgraph import reverse_cuthill_mckee

        a = csr_matrix((np.ones(len(indices)), indices.astype(np.int32),
                        indptr.astype(np.int32)), shape=(n, n))
        return reverse_cuthill_mckee(a, symmetric_mode=True).astype(np.int64)
    perm = np.empty(n, dtype=np.int64)
    lib.rcm(n, np.ascontiguousarray(indptr, np.int64),
            np.ascontiguousarray(indices, np.int64), perm)
    return perm


def bandwidth(rows: np.ndarray, cols: np.ndarray, n: int,
              perm: np.ndarray) -> int:
    lib = _load()
    if lib is None:
        inv = np.empty(n, dtype=np.int64)
        inv[perm] = np.arange(n)
        return int(np.abs(inv[rows] - inv[cols]).max())
    return int(lib.bandwidth(len(rows), np.ascontiguousarray(rows, np.int64),
                             np.ascontiguousarray(cols, np.int64), n,
                             np.ascontiguousarray(perm, np.int64)))


def coo_dedup(n: int, rows, cols, vre, vim):
    """Sorted, duplicate-summed COO triplets (the CSR symbolic assembly)."""
    lib = _load()
    rows = np.ascontiguousarray(rows, np.int64)
    cols = np.ascontiguousarray(cols, np.int64)
    vre = np.ascontiguousarray(vre, np.float64)
    vim = np.ascontiguousarray(vim, np.float64)
    if lib is None:
        return None  # caller falls back to the numpy path
    nnz = len(rows)
    orows = np.empty(nnz, np.int64)
    ocols = np.empty(nnz, np.int64)
    ovre = np.empty(nnz, np.float64)
    ovim = np.empty(nnz, np.float64)
    m = lib.coo_dedup(nnz, n, rows, cols, vre, vim, orows, ocols, ovre, ovim)
    return orows[:m], ocols[:m], ovre[:m], ovim[:m]


def facet_adjacency(cells: np.ndarray, facets: np.ndarray) -> np.ndarray:
    """Adjacent cell id for each facet (vertex-id arrays)."""
    lib = _load()
    if lib is None:
        return None
    cells = np.ascontiguousarray(cells, np.int64)
    facets = np.ascontiguousarray(facets, np.int64)
    out = np.empty(len(facets), np.int64)
    lib.facet_adjacency(cells.shape[0], cells.shape[1], cells,
                        facets.shape[0], facets.shape[1], facets, out)
    if (out < 0).any():
        raise KeyError("facet not found in cell faces")
    return out

"""Native (C++) graph-precompute kernels, loaded via ctypes.

Compiled lazily on first use with g++; falls back to SciPy when no compiler
is available so the pure-Python path always works.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np
import scipy.sparse

_DIR = os.path.dirname(__file__)
_SRC = os.path.join(_DIR, "spgemm.cpp")
_SO = os.path.join(_DIR, "libbsms_graph.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

_I64P = np.ctypeslib.ndpointer(dtype=np.int64, flags="C_CONTIGUOUS")


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
                subprocess.run(
                    ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-o", _SO, _SRC],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(_SO)
            lib.spgemm_bool_sq_count.restype = ctypes.c_int64
            lib.spgemm_bool_sq_count.argtypes = [
                ctypes.c_int64, _I64P, _I64P, ctypes.c_int, _I64P,
            ]
            lib.spgemm_bool_sq_fill.restype = None
            lib.spgemm_bool_sq_fill.argtypes = [
                ctypes.c_int64, _I64P, _I64P, ctypes.c_int, _I64P, _I64P,
            ]
            lib.csr_bfs.restype = None
            lib.csr_bfs.argtypes = [ctypes.c_int64, _I64P, _I64P, ctypes.c_int64, _I64P]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def native_available() -> bool:
    return _load() is not None


def square_pattern(adj: scipy.sparse.csr_matrix, drop_diag: bool = True):
    """Sparsity pattern of adj @ adj as (indptr, indices) int64 CSR arrays.

    This is the "power of 2" connectivity enhancement of bi-stride pooling
    (reference `bsms_graph_wrapper.py:99-101`); only the pattern matters
    downstream, so we compute in the boolean semiring.
    """
    adj = adj.tocsr()
    n = adj.shape[0]
    indptr = np.ascontiguousarray(adj.indptr, dtype=np.int64)
    indices = np.ascontiguousarray(adj.indices, dtype=np.int64)
    lib = _load()
    if lib is None:
        out = (adj.astype(bool) @ adj.astype(bool)).tocsr()
        if drop_diag:
            out.setdiag(False)
            out.eliminate_zeros()
        out.sort_indices()
        return out.indptr.astype(np.int64), out.indices.astype(np.int64)
    counts = np.zeros(n, dtype=np.int64)
    total = lib.spgemm_bool_sq_count(n, indptr, indices, int(drop_diag), counts)
    out_indptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=out_indptr[1:])
    out_indices = np.empty(total, dtype=np.int64)
    lib.spgemm_bool_sq_fill(n, indptr, indices, int(drop_diag), out_indptr, out_indices)
    return out_indptr, out_indices


def bfs(indptr: np.ndarray, indices: np.ndarray, seed: int) -> Optional[np.ndarray]:
    """Native BFS; returns hop distances with -1 for unreachable, or None if
    the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = indptr.shape[0] - 1
    dist = np.full(n, -1, dtype=np.int64)
    lib.csr_bfs(
        n,
        np.ascontiguousarray(indptr, dtype=np.int64),
        np.ascontiguousarray(indices, dtype=np.int64),
        int(seed),
        dist,
    )
    return dist

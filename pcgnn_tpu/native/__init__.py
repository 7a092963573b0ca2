"""ctypes binding for the native graph core (``native/graphcore.cpp``).

The shared library is built by ``make -C native`` (plain g++; no pybind11 in
the image).  ``build_csr`` is the native equivalent of the sort-based numpy
path in ``graph.csr.csr_from_edges`` — counting + parallel per-row sorts
instead of one global O(E log E) key sort.  Everything degrades gracefully:
if the library is absent and cannot be built, ``available()`` is False and
callers fall back to numpy.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libgraphcore.so")
_NATIVE_DIR = os.path.join(_DIR, os.pardir, os.pardir, "native")

_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _try_build() -> bool:
    if os.environ.get("PCGNN_TPU_NO_NATIVE_BUILD"):
        return False
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR],
                       check=True, capture_output=True, timeout=300)
        return os.path.exists(_LIB_PATH)
    except (OSError, subprocess.SubprocessError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _try_build():
        _load_failed = True
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        _load_failed = True
        return None
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.gc_csr_capacity.restype = ctypes.c_int64
    lib.gc_csr_capacity.argtypes = [ctypes.c_int64, ctypes.c_int64,
                                    ctypes.c_int, ctypes.c_int]
    lib.gc_build_csr.restype = ctypes.c_int64
    lib.gc_build_csr.argtypes = [i64p, i64p, ctypes.c_int64, ctypes.c_int64,
                                 ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                 i64p, i64p]
    lib.gc_expand_rows.restype = None
    lib.gc_expand_rows.argtypes = [i64p, ctypes.c_int64, ctypes.c_int, i64p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _as_i64_ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def build_csr(src: np.ndarray, dst: np.ndarray, num_nodes: int, *,
              symmetrize: bool = True, add_self_loops: bool = True,
              num_threads: int = 0):
    """Native COO -> deduplicated CSR.

    Returns ``(indptr [N+1], col [E], row [E])`` int64 arrays, rows sorted.
    Raises RuntimeError if the native library is unavailable.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native graphcore library unavailable")
    src = np.ascontiguousarray(src, dtype=np.int64)
    dst = np.ascontiguousarray(dst, dtype=np.int64)
    if src.shape != dst.shape or src.ndim != 1:
        raise ValueError("src/dst must be equal-length 1-D arrays")
    cap = lib.gc_csr_capacity(len(src), num_nodes, int(symmetrize),
                              int(add_self_loops))
    indptr = np.zeros(num_nodes + 1, dtype=np.int64)
    col = np.empty(max(cap, 1), dtype=np.int64)
    e = lib.gc_build_csr(_as_i64_ptr(src), _as_i64_ptr(dst), len(src),
                         num_nodes, int(symmetrize), int(add_self_loops),
                         num_threads, _as_i64_ptr(indptr), _as_i64_ptr(col))
    if e < 0:
        raise RuntimeError("gc_build_csr failed")
    col = col[:e].copy()
    row = np.empty(e, dtype=np.int64)
    lib.gc_expand_rows(_as_i64_ptr(indptr), num_nodes, num_threads,
                       _as_i64_ptr(row))
    return indptr, col, row

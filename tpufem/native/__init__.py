"""ctypes bindings for the native mesh-preprocessing engine.

Compiled on first use (g++ -O3 -shared); every entry point has a pure
numpy fallback so the package works without a toolchain.  Use
``tpufem.native.available()`` to check, ``TPUFEM_NO_NATIVE=1`` to disable.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_dir() -> str:
    d = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_build")
    os.makedirs(d, exist_ok=True)
    return d


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("TPUFEM_NO_NATIVE"):
        return None
    src = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "meshops.cpp")
    so = os.path.join(_build_dir(), "libmeshops.so")
    try:
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-std=c++17", "-shared",
                 "-fPIC", src, "-o", so],
                check=True, capture_output=True)
        lib = ctypes.CDLL(so)
    except Exception:
        return None

    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.extract_faces.restype = ctypes.c_int32
    lib.extract_faces.argtypes = [i32p, ctypes.c_int64, ctypes.c_int32,
                                  i32p, ctypes.c_int32, ctypes.c_int32,
                                  i32p, i64p, i32p, i32p, i32p, i64p]
    lib.region_grow.restype = ctypes.c_int32
    lib.region_grow.argtypes = [i64p, i32p, ctypes.c_int64, i32p,
                                ctypes.c_int32, i64p]
    lib.bfs_distances.restype = ctypes.c_int32
    lib.bfs_distances.argtypes = [i64p, i32p, ctypes.c_int64, i32p,
                                  ctypes.c_int64, i64p]
    lib.radix_argsort_i32.restype = ctypes.c_int32
    lib.radix_argsort_i32.argtypes = [i32p, ctypes.c_int64, i32p]
    lib.unique_edges.restype = ctypes.c_int64
    lib.unique_edges.argtypes = [i32p, ctypes.c_int64, ctypes.c_int32,
                                 i32p, ctypes.c_int32, i32p]
    lib.sort_unique_inverse_i64.restype = ctypes.c_int64
    lib.sort_unique_inverse_i64.argtypes = [i64p, ctypes.c_int64, i64p, i64p]
    lib.first_touch_i32.restype = ctypes.c_int64
    lib.first_touch_i32.argtypes = [i32p, ctypes.c_int64, ctypes.c_int64,
                                    i32p]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def _p(arr, typ):
    return arr.ctypes.data_as(ctypes.POINTER(typ))


def extract_faces(conn: np.ndarray, face_table: np.ndarray,
                  opposite: Optional[np.ndarray] = None):
    """(boundary_faces, boundary_opposite, shared [S,2,2]) via the native
    hash table; None if native unavailable (callers fall back to numpy)."""
    lib = _load()
    if lib is None:
        return None
    conn = np.ascontiguousarray(conn, dtype=np.int32)
    face_table = np.ascontiguousarray(face_table, dtype=np.int32)
    M, k = conn.shape
    n_faces, fw = face_table.shape
    boundary = np.empty((M * n_faces, fw), np.int32)
    b_opp = np.empty(M * n_faces, np.int32)
    shared = np.empty((M * n_faces // 2 + 1, 4), np.int32)
    nb = np.zeros(1, np.int64)
    ns = np.zeros(1, np.int64)
    opp = (np.ascontiguousarray(opposite, dtype=np.int32)
           if opposite is not None else None)
    rc = lib.extract_faces(
        _p(conn, ctypes.c_int32), M, k, _p(face_table, ctypes.c_int32),
        n_faces, fw, _p(boundary, ctypes.c_int32), _p(nb, ctypes.c_int64),
        _p(b_opp, ctypes.c_int32) if opp is not None else None,
        _p(opp, ctypes.c_int32) if opp is not None else None,
        _p(shared, ctypes.c_int32), _p(ns, ctypes.c_int64))
    if rc != 0:
        return None
    nb, ns = int(nb[0]), int(ns[0])
    return (boundary[:nb].copy(),
            b_opp[:nb].copy() if opp is not None else None,
            shared[:ns].reshape(ns, 2, 2).copy())


def region_grow(indptr: np.ndarray, indices: np.ndarray, seeds: np.ndarray,
                n_parts: int) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    seeds = np.ascontiguousarray(seeds, dtype=np.int32)
    n = indptr.shape[0] - 1
    labels = np.empty(n, np.int64)
    rc = lib.region_grow(_p(indptr, ctypes.c_int64),
                         _p(indices, ctypes.c_int32), n,
                         _p(seeds, ctypes.c_int32), n_parts,
                         _p(labels, ctypes.c_int64))
    return labels if rc == 0 else None


def bfs_distances(indptr: np.ndarray, indices: np.ndarray,
                  sources: np.ndarray) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    sources = np.ascontiguousarray(sources, dtype=np.int32)
    n = indptr.shape[0] - 1
    dist = np.empty(n, np.int64)
    rc = lib.bfs_distances(_p(indptr, ctypes.c_int64),
                           _p(indices, ctypes.c_int32), n,
                           _p(sources, ctypes.c_int32), sources.shape[0],
                           _p(dist, ctypes.c_int64))
    return dist if rc == 0 else None


def radix_argsort(keys: np.ndarray) -> Optional[np.ndarray]:
    """Stable argsort of non-negative int32 keys (scatter-plan builder)."""
    lib = _load()
    if lib is None:
        return None
    keys = np.ascontiguousarray(keys, dtype=np.int32)
    perm = np.empty(keys.shape[0], np.int32)
    rc = lib.radix_argsort_i32(_p(keys, ctypes.c_int32), keys.shape[0],
                               _p(perm, ctypes.c_int32))
    return perm if rc == 0 else None


def unique_edges(conn: np.ndarray, edge_table: np.ndarray
                 ) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    conn = np.ascontiguousarray(conn, dtype=np.int32)
    edge_table = np.ascontiguousarray(edge_table, dtype=np.int32)
    M, k = conn.shape
    ne_tbl = edge_table.shape[0]
    out = np.empty((M * ne_tbl, 2), np.int32)
    ne = lib.unique_edges(_p(conn, ctypes.c_int32), M, k,
                          _p(edge_table, ctypes.c_int32), ne_tbl,
                          _p(out, ctypes.c_int32))
    return out[:ne].copy() if ne >= 0 else None


def unique_inverse_i64(keys: np.ndarray
                       ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """(ascending unique keys, inverse) of a non-negative int64 stream —
    LSD radix, ~5x numpy's sort-based unique on multi-million-key inputs."""
    lib = _load()
    if lib is None:
        return None
    keys = np.ascontiguousarray(keys, dtype=np.int64)
    n = keys.shape[0]
    uniq = np.empty(n, np.int64)
    inv = np.empty(n, np.int64)
    nu = lib.sort_unique_inverse_i64(_p(keys, ctypes.c_int64), n,
                                     _p(uniq, ctypes.c_int64),
                                     _p(inv, ctypes.c_int64))
    if nu < 0:
        return None
    return uniq[:nu].copy(), inv


def first_touch(flat: np.ndarray, n_nodes: int) -> Optional[np.ndarray]:
    """new_from_old[n_nodes]: first-appearance rank of each node in `flat`
    (entries < 0 skipped; untouched nodes -1).  One O(n) pass."""
    lib = _load()
    if lib is None:
        return None
    flat = np.ascontiguousarray(flat, dtype=np.int32)
    out = np.empty(int(n_nodes), np.int32)
    rc = lib.first_touch_i32(_p(flat, ctypes.c_int32), flat.shape[0],
                             int(n_nodes), _p(out, ctypes.c_int32))
    return out if rc >= 0 else None

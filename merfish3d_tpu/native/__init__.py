"""Native (C++) host-ops runtime, loaded through ctypes.

Compiles ``hostops.cpp`` with the system toolchain on first use (cached
beside the source); falls back to pure-Python implementations when no
compiler is available. No CPython API or pybind11 involvement — the
library exposes a plain C ABI over raw numpy buffers.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_SRC = Path(__file__).parent / "hostops.cpp"
_LIB = Path(__file__).parent / "_hostops.so"
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _build() -> None:
    # compile to a PID-unique temp file and os.replace into place:
    # concurrent worker processes racing a direct write to _LIB could
    # CDLL a half-written .so (permanent silent fallback) or have the
    # mapped library rewritten underneath them (review r3)
    import os

    tmp = _LIB.with_suffix(f".{os.getpid()}.tmp.so")
    try:
        subprocess.run(
            [
                "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                str(_SRC), "-o", str(tmp),
            ],
            check=True,
            capture_output=True,
        )
        os.replace(tmp, _LIB)
    finally:
        tmp.unlink(missing_ok=True)


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    try:
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            _build()
        lib = ctypes.CDLL(str(_LIB))
        i64p = ctypes.POINTER(ctypes.c_int64)
        f64p = ctypes.POINTER(ctypes.c_double)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.union_find.argtypes = [i64p, ctypes.c_int64, ctypes.c_int64, i64p]
        lib.union_find.restype = None
        lib.points_in_polygon.argtypes = [
            f64p, ctypes.c_int64, f64p, ctypes.c_int64, u8p,
        ]
        lib.points_in_polygon.restype = None
        lib.greedy_match.argtypes = [
            i64p, i64p, f64p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, i64p,
        ]
        lib.greedy_match.restype = ctypes.c_int64
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.label_components_3d.argtypes = [
            i32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int32, i64p,
        ]
        lib.label_components_3d.restype = None
        lib.label_components_sparse.argtypes = [
            i32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int32, i64p, i64p, ctypes.c_int64,
        ]
        lib.label_components_sparse.restype = ctypes.c_int64
        _lib = lib
    except Exception:
        _load_failed = True
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def _ptr(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def union_find(pairs: np.ndarray, n: int) -> np.ndarray:
    """Roots (canonical, min-index) for ``n`` elements under the pair
    relation; native with a pure-Python fallback."""
    pairs = np.ascontiguousarray(np.asarray(pairs, np.int64).reshape(-1, 2))
    lib = _load()
    roots = np.empty(n, np.int64)
    if lib is not None:
        lib.union_find(
            _ptr(pairs, ctypes.c_int64), len(pairs), n,
            _ptr(roots, ctypes.c_int64),
        )
        return roots
    parent = np.arange(n, dtype=np.int64)

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return np.array([find(i) for i in range(n)], np.int64)


def points_in_polygon(points_yx: np.ndarray, polygon_yx: np.ndarray) -> np.ndarray:
    """Boolean mask of points inside the polygon (ray casting)."""
    pts = np.ascontiguousarray(np.asarray(points_yx, np.float64).reshape(-1, 2))
    poly = np.ascontiguousarray(np.asarray(polygon_yx, np.float64).reshape(-1, 2))
    lib = _load()
    if lib is not None:
        out = np.empty(len(pts), np.uint8)
        lib.points_in_polygon(
            _ptr(pts, ctypes.c_double), len(pts),
            _ptr(poly, ctypes.c_double), len(poly),
            _ptr(out, ctypes.c_uint8),
        )
        return out.astype(bool)
    from matplotlib.path import Path as MplPath

    return MplPath(poly).contains_points(pts)


def label_components(decoded: np.ndarray, use_2d: bool = False) -> np.ndarray:
    """Connected components of equal decoded values (26-conn 3D or 8-conn
    per plane). Returns int64 root linear indices (-1 background) — same
    contract as ``ops.cc.label_connected``. Native single-pass union-find;
    falls back to the device kernel when no compiler is available."""
    dec = np.ascontiguousarray(np.asarray(decoded, np.int32))
    lib = _load()
    if lib is not None:
        labels = np.empty(dec.size, np.int64)
        nz, ny, nx = dec.shape
        lib.label_components_3d(
            _ptr(dec, ctypes.c_int32), nz, ny, nx, int(use_2d),
            _ptr(labels, ctypes.c_int64),
        )
        return labels.reshape(dec.shape)
    import jax.numpy as jnp

    from ..ops.cc import label_connected

    return np.asarray(
        label_connected(jnp.asarray(dec), use_2d=use_2d), np.int64
    )


def label_components_sparse(
    decoded: np.ndarray, use_2d: bool = False
) -> tuple[np.ndarray, np.ndarray]:
    """Sparse connected components: (lin, roots) over foreground voxels
    only — `lin[t]` is the linear index of the t-th foreground voxel in
    scan order, `roots[t]` its component id. Component ids are consistent
    within a call but implementation-defined across implementations (the
    native path uses foreground scan ranks, the fallback uses root linear
    indices) — consumers must only rely on equality within one result.

    The dense :func:`label_components` first-touches two volume-sized
    arrays per call (~3.4 GB at a 210M-voxel tile); this allocates
    O(n_foreground) and reuses a process-wide scratch arena."""
    dec = np.ascontiguousarray(np.asarray(decoded, np.int32))
    n_fg = int(np.count_nonzero(dec >= 0))
    if n_fg == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    lib = _load()
    if lib is not None and dec.size <= np.iinfo(np.int32).max:
        lin = np.empty(n_fg, np.int64)
        roots = np.empty(n_fg, np.int64)
        nz, ny, nx = dec.shape
        count = lib.label_components_sparse(
            _ptr(dec, ctypes.c_int32), nz, ny, nx, int(use_2d),
            _ptr(lin, ctypes.c_int64), _ptr(roots, ctypes.c_int64), n_fg,
        )
        if count != n_fg:
            raise RuntimeError(
                f"label_components_sparse: expected {n_fg} foreground "
                f"voxels, native returned {count}"
            )
        return lin, roots
    labels = label_components(dec, use_2d=use_2d)
    flat = labels.ravel()
    lin = np.flatnonzero(flat >= 0)
    return lin, flat[lin]


def greedy_match(
    pair_src: np.ndarray,
    pair_dst: np.ndarray,
    pair_dist: np.ndarray,
    n_src: int,
    n_dst: int,
) -> np.ndarray:
    """Indices of pairs accepted by distance-sorted greedy one-to-one
    matching."""
    src = np.ascontiguousarray(np.asarray(pair_src, np.int64))
    dst = np.ascontiguousarray(np.asarray(pair_dst, np.int64))
    dist = np.ascontiguousarray(np.asarray(pair_dist, np.float64))
    lib = _load()
    if lib is not None:
        accepted = np.empty(len(src), np.int64)
        count = lib.greedy_match(
            _ptr(src, ctypes.c_int64), _ptr(dst, ctypes.c_int64),
            _ptr(dist, ctypes.c_double), len(src), n_src, n_dst,
            _ptr(accepted, ctypes.c_int64),
        )
        return accepted[:count]
    order = np.lexsort((np.arange(len(src)), dist))
    src_used = np.zeros(n_src, bool)
    dst_used = np.zeros(n_dst, bool)
    accepted = []
    for i in order:
        if src_used[src[i]] or dst_used[dst[i]]:
            continue
        src_used[src[i]] = True
        dst_used[dst[i]] = True
        accepted.append(i)
    return np.asarray(accepted, np.int64)

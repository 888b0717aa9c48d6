"""ctypes bindings for the native host runtime (libfast_gicp_native.so).

Provides the multithreaded kd-tree kNN (the reference's CPU_PARALLEL_KDTREE
covariance feeder, fast_vgicp_cuda_impl.hpp:152-167), a C++ voxel-grid
downsampler, and a fast KITTI .bin loader.  Every entry point has a pure
numpy/JAX fallback so the package works without the native build; call
`available()` to check, `build()` to compile in-tree (needs cmake + a C++
toolchain).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_LIB_PATHS = [
    os.path.join(_NATIVE_DIR, "build", "libfast_gicp_native.so"),
    os.path.join(os.path.dirname(__file__), "libfast_gicp_native.so"),
]

_lib: Optional[ctypes.CDLL] = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    for path in _LIB_PATHS:
        if os.path.exists(path):
            lib = ctypes.CDLL(path)
            f32p = ctypes.POINTER(ctypes.c_float)
            i32p = ctypes.POINTER(ctypes.c_int)
            lib.knn_search.argtypes = [
                f32p, ctypes.c_int, f32p, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, i32p, f32p,
            ]
            lib.kdtree_build.restype = ctypes.c_void_p
            lib.kdtree_build.argtypes = [f32p, ctypes.c_int]
            lib.kdtree_free.argtypes = [ctypes.c_void_p]
            lib.kdtree_knn.argtypes = [
                ctypes.c_void_p, f32p, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, i32p, f32p,
            ]
            lib.voxel_downsample.restype = ctypes.c_int
            lib.voxel_downsample.argtypes = [f32p, ctypes.c_int,
                                             ctypes.c_float, f32p]
            lib.load_kitti_bin.restype = ctypes.c_int
            lib.load_kitti_bin.argtypes = [ctypes.c_char_p, f32p, ctypes.c_int]
            if hasattr(lib, "absmax_f32"):  # newer builds only
                lib.absmax_f32.restype = ctypes.c_float
                lib.absmax_f32.argtypes = [f32p, ctypes.c_longlong]
                lib.quantize_i16.restype = None
                lib.quantize_i16.argtypes = [
                    f32p, ctypes.c_longlong, ctypes.c_float,
                    ctypes.POINTER(ctypes.c_int16),
                ]
            _lib = lib
            return lib
    return None


def available() -> bool:
    return _load() is not None


def build(verbose: bool = False) -> bool:
    """Compile the native library in-tree via cmake."""
    build_dir = os.path.join(_NATIVE_DIR, "build")
    try:
        kw = {} if verbose else {"capture_output": True}
        subprocess.run(["cmake", "-S", _NATIVE_DIR, "-B", build_dir],
                       check=True, **kw)
        subprocess.run(["cmake", "--build", build_dir, "-j"], check=True, **kw)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False
    global _lib
    _lib = None
    return available()


def _f32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _i32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))


def knn_search(points: np.ndarray, queries: np.ndarray, k: int,
               n_threads: int = 0):
    """Exact kd-tree kNN on the host; returns (idx (Q, k), sq_dist (Q, k))."""
    lib = _load()
    points = np.ascontiguousarray(points[:, :3], np.float32)
    queries = np.ascontiguousarray(queries[:, :3], np.float32)
    nq = queries.shape[0]
    idx = np.empty((nq, k), np.int32)
    dist = np.empty((nq, k), np.float32)
    if lib is None:
        # numpy fallback: exact, chunked over queries (a full Q x N distance
        # matrix for a raw KITTI scan would be ~57 GB) with argpartition
        # instead of a full row sort.
        p_sq = np.einsum("ij,ij->i", points, points)[None, :]
        n = points.shape[0]
        kk = min(k, n)  # clouds smaller than k: repeat the last neighbor
        chunk = max(1, min(4096, nq))
        for lo in range(0, nq, chunk):
            q = queries[lo : lo + chunk]
            d = (
                np.einsum("ij,ij->i", q, q)[:, None]
                - 2.0 * q @ points.T
                + p_sq
            )
            part = np.argpartition(d, kk - 1, axis=1)[:, :kk]
            dp = np.take_along_axis(d, part, axis=1)
            order = np.argsort(dp, axis=1)
            ii = np.take_along_axis(part, order, axis=1)
            dd = np.maximum(np.take_along_axis(dp, order, axis=1), 0.0)
            if kk < k:  # pad like the C++ kd-tree does (knn(), degenerate)
                ii = np.concatenate(
                    [ii, np.repeat(ii[:, -1:], k - kk, axis=1)], axis=1
                )
                dd = np.concatenate(
                    [dd, np.repeat(dd[:, -1:], k - kk, axis=1)], axis=1
                )
            idx[lo : lo + chunk] = ii
            dist[lo : lo + chunk] = dd
        return idx, dist
    lib.knn_search(_f32p(points), points.shape[0], _f32p(queries), nq, k,
                   n_threads, _i32p(idx), _f32p(dist))
    return idx, dist


def voxel_downsample(points: np.ndarray, resolution: float) -> np.ndarray:
    """C++ centroid voxel-grid downsample; numpy fallback otherwise."""
    lib = _load()
    if lib is None or resolution is None or resolution <= 0:
        from .utils.downsample import voxel_downsample as np_ds

        return np_ds(points, resolution)
    pts = np.ascontiguousarray(points[:, :3], np.float32)
    out = np.empty_like(pts)
    m = lib.voxel_downsample(_f32p(pts), pts.shape[0],
                             ctypes.c_float(resolution), _f32p(out))
    return np.ascontiguousarray(out[:m])


def quantize_available() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "absmax_f32")


def absmax(a: np.ndarray) -> float:
    """max(|a|) over a contiguous float32 array (C++ single pass)."""
    lib = _load()
    a = np.ascontiguousarray(a, np.float32)
    if lib is None or not hasattr(lib, "absmax_f32"):
        return float(np.max(np.abs(a))) if a.size else 0.0
    return float(lib.absmax_f32(_f32p(a), ctypes.c_longlong(a.size)))


def quantize_i16(src: np.ndarray, inv_scale: float, out: np.ndarray) -> None:
    """out[:] = rint(src * inv_scale) as int16, one C++ pass.

    `src` must be float32 and `out` contiguous int16 of the same size
    (writes through; no allocation on the native path).  Non-contiguous
    or non-f32 `src` is coerced with a copy; a non-contiguous `out` is a
    hard error (writing into a temp copy would be silently dropped)."""
    lib = _load()
    if out.dtype != np.int16 or out.size != src.size:
        raise ValueError(
            f"out must be int16 with {src.size} elements, got "
            f"{out.dtype}/{out.size}"
        )
    if not out.flags.c_contiguous:
        raise ValueError("out must be C-contiguous (writes through)")
    src = np.ascontiguousarray(src, np.float32)
    if lib is None or not hasattr(lib, "quantize_i16"):
        np.copyto(out.reshape(src.shape),
                  np.rint(src * inv_scale).astype(np.int16))
        return
    lib.quantize_i16(
        _f32p(src), ctypes.c_longlong(src.size), ctypes.c_float(inv_scale),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
    )


def load_kitti_bin(path: str) -> np.ndarray:
    lib = _load()
    if lib is None:
        from .utils.io import load_kitti_bin as np_load

        return np_load(path)
    n = lib.load_kitti_bin(path.encode(), None, 0)
    if n < 0:
        raise FileNotFoundError(path)
    out = np.empty((n, 3), np.float32)
    lib.load_kitti_bin(path.encode(), _f32p(out), n)
    return out

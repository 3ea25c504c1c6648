"""ctypes bindings for the native host-preprocessing library.

Builds libpcf_native.so on first use with g++ (cached next to the source;
rebuilt when the source is newer). Falls back cleanly when no compiler is
available — callers check `is_available()` and use the numpy/scipy paths.

Replaces the reference's torch-cpp_extension build flow
(cpp_wrappers/compile_wrappers.sh, three setup.py files) with a single
self-building ctypes module.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "pcf_native.cpp")
_LIB_PATH = os.path.join(_DIR, "libpcf_native.so")

_lib = None
_build_error: str | None = None


def _build() -> str | None:
    cmd = ["g++", "-O3", "-march=native", "-fPIC", "-shared", "-std=c++17",
           "-pthread", _SRC, "-o", _LIB_PATH]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
        return None
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        return getattr(e, "stderr", str(e)) or str(e)


def _load():
    global _lib, _build_error
    if _lib is not None or _build_error is not None:
        return _lib
    if (not os.path.exists(_LIB_PATH)
            or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
        _build_error = _build()
        if _build_error is not None:
            return None
    lib = ctypes.CDLL(_LIB_PATH)

    lib.grid_subsample.restype = ctypes.c_int32
    lib.grid_subsample.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ctypes.c_float,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.knn_kdtree.restype = None
    lib.knn_kdtree.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
    ]
    lib.knn_kdtree_batch.restype = None
    lib.knn_kdtree_batch.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int32, ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
    ]
    _lib = lib
    return _lib


def is_available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _i32ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def grid_subsample(points: np.ndarray, features: np.ndarray | None = None,
                   labels: np.ndarray | None = None, sample_dl: float = 0.1):
    """Native voxel-barycenter subsampling; same contract as
    pcf_tpu.ops.subsample.grid_subsampling."""
    lib = _load()
    assert lib is not None, f"native lib unavailable: {_build_error}"
    points = np.ascontiguousarray(points, np.float32)
    n = points.shape[0]
    out_pts = np.empty((n, 3), np.float32)

    f_dim = 0
    f_in = f_out = None
    if features is not None:
        features = np.ascontiguousarray(features, np.float32)
        f_dim = features.shape[1]
        f_out = np.empty((n, f_dim), np.float32)
        f_in = features
    l_in = l_out = None
    if labels is not None:
        l_in = np.ascontiguousarray(labels, np.int32).reshape(-1)
        l_out = np.empty(n, np.int32)

    n_vox = lib.grid_subsample(
        _fptr(points), n,
        _fptr(f_in) if f_in is not None else None, f_dim,
        _i32ptr(l_in) if l_in is not None else None, 0,
        float(sample_dl),
        _fptr(out_pts),
        _fptr(f_out) if f_out is not None else None,
        _i32ptr(l_out) if l_out is not None else None,
    )
    out = [out_pts[:n_vox].copy()]
    if f_out is not None:
        out.append(f_out[:n_vox].copy())
    if l_out is not None:
        out.append(l_out[:n_vox].copy())
    return out[0] if len(out) == 1 else tuple(out)


def knn(ref_points: np.ndarray, query_points: np.ndarray, k: int) -> np.ndarray:
    """Native KD-tree kNN; indices [n_query, k] ascending by distance."""
    lib = _load()
    assert lib is not None, f"native lib unavailable: {_build_error}"
    ref = np.ascontiguousarray(ref_points, np.float32)
    q = np.ascontiguousarray(query_points, np.float32)
    out = np.empty((q.shape[0], k), np.int32)
    lib.knn_kdtree(_fptr(ref), ref.shape[0], _fptr(q), q.shape[0], k, _i32ptr(out))
    return out


def knn_batch(queries: np.ndarray, refs: np.ndarray, q_lens, r_lens, k: int) -> np.ndarray:
    """Batched packed kNN (contract of cpp_neighbors batch_kquery)."""
    lib = _load()
    assert lib is not None, f"native lib unavailable: {_build_error}"
    refs = np.ascontiguousarray(refs, np.float32)
    queries = np.ascontiguousarray(queries, np.float32)
    q_lens = np.ascontiguousarray(q_lens, np.int64)
    r_lens = np.ascontiguousarray(r_lens, np.int64)
    out = np.empty((queries.shape[0], k), np.int32)
    lib.knn_kdtree_batch(
        _fptr(refs), r_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        _fptr(queries), q_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(q_lens), k, _i32ptr(out))
    return out

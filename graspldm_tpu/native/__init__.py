"""ctypes bindings for the native host-ops library (with numpy fallback).

Compiles ``host_ops.cpp`` on first use (g++ -O3 -shared, cached next to the
source). Every function has a pure-numpy fallback so the framework works
even without a toolchain; the native path is the fast lane for the host
input pipeline (mesh sampling, FPS, depth back-projection).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

__all__ = [
    "available",
    "sample_surface_native",
    "farthest_point_sample_native",
    "depth_to_pointcloud_native",
]

_LIB = None
_LOCK = threading.Lock()
_SRC = os.path.join(os.path.dirname(__file__), "host_ops.cpp")
_SO = os.path.join(os.path.dirname(__file__), "libhost_ops.so")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is not None:
        return _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        try:
            if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(
                _SRC
            ):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(_SO)
        except (OSError, subprocess.CalledProcessError, FileNotFoundError):
            _LIB = False
            return None

        lib.sample_surface.restype = ctypes.c_int
        lib.sample_surface.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.c_int64, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.farthest_point_sample.restype = ctypes.c_int
        lib.farthest_point_sample.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.depth_to_pointcloud.restype = ctypes.c_int64
        lib.depth_to_pointcloud.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_float, ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
        ]
        _LIB = lib
        return lib


def available() -> bool:
    return _load() not in (None, False)


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def sample_surface_native(
    vertices: np.ndarray, faces: np.ndarray, count: int, seed: int
) -> Optional[np.ndarray]:
    """Area-weighted surface sampling; None if the native lib is unavailable."""
    lib = _load()
    if not lib:
        return None
    v = np.ascontiguousarray(vertices, np.float64)
    f = np.ascontiguousarray(faces, np.int64)
    out = np.empty((count, 3), np.float32)
    rc = lib.sample_surface(
        _ptr(v, ctypes.c_double), len(v),
        _ptr(f, ctypes.c_int64), len(f),
        count, seed & 0xFFFFFFFFFFFFFFFF, _ptr(out, ctypes.c_float),
    )
    return out if rc == 0 else None


def farthest_point_sample_native(
    points: np.ndarray, num_samples: int
) -> Optional[np.ndarray]:
    lib = _load()
    if not lib:
        return None
    p = np.ascontiguousarray(points, np.float32)
    out = np.empty((num_samples,), np.int64)
    rc = lib.farthest_point_sample(
        _ptr(p, ctypes.c_float), len(p), num_samples, _ptr(out, ctypes.c_int64)
    )
    return out if rc == 0 else None


def depth_to_pointcloud_native(
    depth: np.ndarray, fx: float, fy: float, cx: float, cy: float,
    max_depth: float = 0.0,
) -> Optional[np.ndarray]:
    lib = _load()
    if not lib:
        return None
    d = np.ascontiguousarray(depth, np.float32)
    h, w = d.shape
    out = np.empty((h * w, 3), np.float32)
    n = lib.depth_to_pointcloud(
        _ptr(d, ctypes.c_float), h, w, fx, fy, cx, cy, max_depth, h * w,
        _ptr(out, ctypes.c_float),
    )
    return out[:n].copy()

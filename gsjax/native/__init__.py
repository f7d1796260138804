"""ctypes bindings to the native (C++) runtime components.

The reference ships two native CUDA submodules (simple-knn and the
rasterizer) plus C++ viewers; gsjax's compute path is Pallas/XLA on TPU,
and the host-side native layer lives here: a Morton-sorted box-pruned 3-NN
(scale init, mirrors simple-knn) and a fast COLMAP points3D.bin parser.

The shared library is built on demand with g++ (no pip/pybind11 in this
image); every caller must handle `load_native() is None` and fall back to
the pure-Python/JAX path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "build", "libgsjax_native.so")


def load_native():
    """Load (building if needed) the native library; None if unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("GSJAX_NO_NATIVE"):
        return None
    try:
        if not os.path.exists(_SO_PATH):
            subprocess.run(
                ["make", "-C", _NATIVE_DIR],
                check=True,
                capture_output=True,
                timeout=120,
            )
        lib = ctypes.CDLL(_SO_PATH)
        lib.gsjax_knn_mean_dist2.restype = ctypes.c_int
        lib.gsjax_knn_mean_dist2.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.gsjax_points3d_count.restype = ctypes.c_int64
        lib.gsjax_points3d_count.argtypes = [ctypes.c_char_p]
        lib.gsjax_read_points3d.restype = ctypes.c_int64
        lib.gsjax_read_points3d.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_double),
        ]
        _LIB = lib
    except Exception as e:  # toolchain missing / build failure
        print(f"[gsjax.native] native library unavailable ({e}); using fallbacks")
        _LIB = None
    return _LIB


def mean_knn_dist2_native(points: np.ndarray) -> np.ndarray | None:
    """[N,3] -> [N] mean squared 3-NN distance; None if native unavailable."""
    lib = load_native()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, dtype=np.float32)
    out = np.empty(pts.shape[0], dtype=np.float32)
    rc = lib.gsjax_knn_mean_dist2(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        pts.shape[0],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out if rc == 0 else None


def read_points3d_binary_native(path: str):
    """points3D.bin -> (xyz f64, rgb u8, err f64); None if unavailable."""
    lib = load_native()
    if lib is None:
        return None
    num = lib.gsjax_points3d_count(path.encode())
    if num < 0:
        return None
    xyz = np.empty((num, 3), np.float64)
    rgb = np.empty((num, 3), np.uint8)
    err = np.empty(num, np.float64)
    got = lib.gsjax_read_points3d(
        path.encode(),
        num,
        xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        err.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    if got != num:
        return None
    return xyz, rgb, err

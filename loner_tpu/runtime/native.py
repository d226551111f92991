"""ctypes bindings for the native point-cloud front-end (native/pointcloud.cpp)
with transparent numpy fallbacks.

The reference leans on Open3D's C++ for its host-side cloud ops; here the
per-sweep front-end (cloud extraction for ICP, voxel/box/range filtering,
the sky-segmentation projection) is a small C++ library built with
``make -C native`` and loaded lazily. Every entry point works without the
library (pure-numpy fallback) so the framework never hard-depends on a
compiled artifact.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libloner_native.so"))


def build_native(quiet: bool = True) -> bool:
    """Compile the native library in-tree. Returns success."""
    try:
        subprocess.run(
            ["make", "-C", os.path.abspath(_NATIVE_DIR)],
            check=True,
            capture_output=quiet,
        )
        return os.path.exists(_SO_PATH)
    except Exception:
        return False


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_SO_PATH):
        build_native()
    if os.path.exists(_SO_PATH):
        try:
            lib = ctypes.CDLL(_SO_PATH)
            f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
            u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
            lib.extract_cloud.argtypes = [
                f32p, f32p, u8p, ctypes.c_int64, ctypes.c_float,
                ctypes.c_int64, f32p, u8p,
            ]
            lib.voxel_downsample.argtypes = [
                f32p, ctypes.c_int64, ctypes.c_float, f32p, ctypes.c_int64,
            ]
            lib.voxel_downsample.restype = ctypes.c_int64
            lib.box_filter.argtypes = [
                f32p, u8p, ctypes.c_int64,
                ctypes.c_float, ctypes.c_float, ctypes.c_float,
                ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ]
            lib.range_filter.argtypes = [
                f32p, u8p, ctypes.c_int64, ctypes.c_float, ctypes.c_float,
            ]
            lib.spherical_occupancy.argtypes = [
                f32p, u8p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
                ctypes.c_float, ctypes.c_float, u8p,
            ]
            _LIB = lib
        except Exception:
            _LIB = None
    return _LIB


def has_native() -> bool:
    return _lib() is not None


def extract_cloud(
    points: np.ndarray,  # (N, 3) float32, sensor frame
    timestamps: np.ndarray,  # (N,)
    valid: np.ndarray,  # (N,) bool
    keep_fraction: float,
    n_out: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """First keep_fraction of the sweep, uniform-stride downsampled to
    exactly n_out points (+ validity mask)."""
    lib = _lib()
    points = np.ascontiguousarray(points, np.float32)
    timestamps = np.ascontiguousarray(timestamps, np.float32)
    v8 = np.ascontiguousarray(valid, np.uint8)
    if lib is not None:
        out_p = np.empty((n_out, 3), np.float32)
        out_v = np.empty((n_out,), np.uint8)
        lib.extract_cloud(points, timestamps, v8, len(points), keep_fraction, n_out, out_p, out_v)
        return out_p, out_v.astype(bool)
    # numpy fallback
    vb = valid.astype(bool)
    tmin = timestamps[vb].min() if vb.any() else 0.0
    tmax = timestamps[vb].max() if vb.any() else 1.0
    keep = vb & (timestamps <= tmin + keep_fraction * (tmax - tmin))
    idx = np.flatnonzero(keep)
    if len(idx) > n_out:
        idx = idx[np.linspace(0, len(idx) - 1, n_out).astype(np.int64)]
    pts = points[idx]
    pad = n_out - len(idx)
    ov = np.concatenate([np.ones(len(idx), bool), np.zeros(pad, bool)])
    if pad:
        pts = np.concatenate([pts, np.zeros((pad, 3), np.float32)])
    return pts, ov


def voxel_downsample(points: np.ndarray, voxel_size: float) -> np.ndarray:
    lib = _lib()
    points = np.ascontiguousarray(points, np.float32)
    if lib is not None:
        out = np.empty_like(points)
        n = lib.voxel_downsample(points, len(points), voxel_size, out, len(points))
        return out[:n].copy()
    keys = np.floor(points / voxel_size).astype(np.int64)
    _, inv, counts = np.unique(keys, axis=0, return_inverse=True, return_counts=True)
    sums = np.zeros((counts.shape[0], 3))
    np.add.at(sums, inv, points)
    return (sums / counts[:, None]).astype(np.float32)


def box_filter(
    points: np.ndarray, valid: np.ndarray, center, size
) -> np.ndarray:
    """Invalidate points inside the axis-aligned box. Returns new mask."""
    lib = _lib()
    points = np.ascontiguousarray(points, np.float32)
    v8 = np.ascontiguousarray(valid, np.uint8)
    if lib is not None:
        lib.box_filter(points, v8, len(points), *map(float, center), *map(float, size))
        return v8.astype(bool)
    rel = np.abs(points - np.asarray(center)[None])
    inside = np.all(rel <= np.asarray(size)[None] / 2, axis=1)
    return valid & ~inside


def range_filter(distances: np.ndarray, valid: np.ndarray, min_range: float, max_range: float) -> np.ndarray:
    lib = _lib()
    distances = np.ascontiguousarray(distances, np.float32)
    v8 = np.ascontiguousarray(valid, np.uint8)
    if lib is not None:
        lib.range_filter(distances, v8, len(distances), min_range, max_range)
        return v8.astype(bool)
    return valid & (distances >= min_range) & (distances <= max_range)


def spherical_occupancy(
    dirs: np.ndarray, valid: np.ndarray, n_az: int, n_el: int, el_lo: float, el_hi: float
) -> np.ndarray:
    lib = _lib()
    dirs = np.ascontiguousarray(dirs, np.float32)
    v8 = np.ascontiguousarray(valid, np.uint8)
    if lib is not None:
        out = np.empty((n_el, n_az), np.uint8)
        lib.spherical_occupancy(dirs, v8, len(dirs), n_az, n_el, el_lo, el_hi, out)
        return out.astype(bool)
    from loner_tpu.tracking.sky import spherical_projection

    return spherical_projection(dirs, valid.astype(bool), n_az, n_el, (el_lo, el_hi))

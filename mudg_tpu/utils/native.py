"""ctypes bindings for the native host-side library (native/mudg_native.cpp).

Provides multi-threaded C++ implementations of the data-pipeline hot loops —
TFRecord framing, voxel-hash downsampling, rigid point transforms, oriented
box tests — with automatic build-on-first-use and numpy fallbacks so the
package works without a compiler.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False


def _lib_path() -> str:
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(root, "native", "libmudg_native.so")


def load_library(build: bool = True):
    """Load (building if needed) the native library; None if unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    path = _lib_path()
    if not os.path.exists(path) and build:
        script = os.path.join(os.path.dirname(path), "build.sh")
        try:
            subprocess.run(["sh", script], check=True, capture_output=True)
        except Exception:
            return None
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    i64 = ctypes.c_int64
    f32p = ctypes.POINTER(ctypes.c_float)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i64p = ctypes.POINTER(ctypes.c_int64)

    lib.tfrecord_index.restype = i64
    lib.tfrecord_index.argtypes = [u8p, i64, i64p, i64p, i64]
    lib.voxel_downsample.restype = i64
    lib.voxel_downsample.argtypes = [f32p, f32p, i64, ctypes.c_float, f32p, f32p, i64]
    lib.transform_points.restype = None
    lib.transform_points.argtypes = [f32p, i64, f32p, f32p]
    lib.points_in_box.restype = None
    lib.points_in_box.argtypes = [f32p, i64, f32p, ctypes.c_float,
                                  ctypes.c_float, ctypes.c_float, u8p]
    _LIB = lib
    return lib


def _fp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def tfrecord_index(data: bytes) -> list[tuple[int, int]]:
    """(offset, length) of every record in a TFRecord byte buffer
    (waymo_filereader.py:40-66 framing; CRCs skipped)."""
    lib = load_library()
    buf = np.frombuffer(data, np.uint8)
    if lib is not None:
        max_rec = max(len(data) // 16, 16)
        offs = np.zeros(max_rec, np.int64)
        lens = np.zeros(max_rec, np.int64)
        n = lib.tfrecord_index(
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(data),
            offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), max_rec,
        )
        return list(zip(offs[:n].tolist(), lens[:n].tolist()))
    # numpy/python fallback
    out = []
    pos = 0
    size = len(data)
    while pos + 12 <= size:
        length = int.from_bytes(data[pos : pos + 8], "little")
        payload = pos + 12
        if payload + length + 4 > size:
            break
        out.append((payload, length))
        pos = payload + length + 4
    return out


def voxel_downsample(xyz: np.ndarray, rgb: np.ndarray | None, voxel: float):
    """Native-accelerated version of render.pointcloud.voxel_downsample."""
    lib = load_library()
    if lib is None or len(xyz) == 0:
        from ..render.pointcloud import voxel_downsample as np_vd

        return np_vd(xyz, rgb, voxel)
    xyz32 = np.ascontiguousarray(xyz, np.float32)
    rgb32 = np.ascontiguousarray(rgb, np.float32) if rgb is not None else None
    out_xyz = np.zeros_like(xyz32)
    out_rgb = np.zeros_like(xyz32) if rgb is not None else np.zeros((0, 3), np.float32)
    n = lib.voxel_downsample(
        _fp(xyz32), _fp(rgb32) if rgb32 is not None else None, len(xyz32),
        ctypes.c_float(voxel), _fp(out_xyz), _fp(out_rgb), len(xyz32),
    )
    return (out_xyz[:n], out_rgb[:n].astype(rgb.dtype) if rgb is not None else None)


def transform_points(xyz: np.ndarray, mat: np.ndarray) -> np.ndarray:
    """xyz @ R^T + t with a 4x4 matrix."""
    lib = load_library()
    xyz32 = np.ascontiguousarray(xyz, np.float32)
    if lib is None:
        return xyz32 @ mat[:3, :3].T.astype(np.float32) + mat[:3, 3].astype(np.float32)
    m = np.ascontiguousarray(mat, np.float32)
    out = np.empty_like(xyz32)
    lib.transform_points(_fp(xyz32), len(xyz32), _fp(m), _fp(out))
    return out


def points_in_box(xyz: np.ndarray, w2b: np.ndarray, half_extents) -> np.ndarray:
    """Boolean mask of points inside an oriented box (w2b: world-to-box 4x4)."""
    lib = load_library()
    xyz32 = np.ascontiguousarray(xyz, np.float32)
    hx, hy, hz = (float(h) for h in half_extents)
    if lib is None:
        b = xyz32 @ w2b[:3, :3].T.astype(np.float32) + w2b[:3, 3].astype(np.float32)
        return (
            (np.abs(b[:, 0]) <= hx) & (np.abs(b[:, 1]) <= hy) & (np.abs(b[:, 2]) <= hz)
        )
    m = np.ascontiguousarray(w2b, np.float32)
    mask = np.zeros(len(xyz32), np.uint8)
    lib.points_in_box(
        _fp(xyz32), len(xyz32), _fp(m), hx, hy, hz,
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return mask.astype(bool)

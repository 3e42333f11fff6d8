"""Native host ops: ctypes bindings with numpy fallbacks.

The C++ kernels (csrc/host_ops.cpp) accelerate the host data-path hot
loops (multi-sweep point transforms, points-in-box tests for GT-database
creation, range filtering, depth rasterization) — the role the
reference's native roiaware_pool3d / feature_decorator / dataloader
extensions play. The library is built on first import with g++; every
entry point falls back to numpy when the toolchain is unavailable.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "csrc", "host_ops.cpp")
_LIB_PATH = os.path.join(_HERE, "libhost_ops.so")

_lib: Optional[ctypes.CDLL] = None


def _build() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    try:
        if (not os.path.exists(_LIB_PATH)
                or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _LIB_PATH],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(_LIB_PATH)
        f32p = ctypes.POINTER(ctypes.c_float)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i64 = ctypes.c_int64
        lib.transform_sweep_points.argtypes = [f32p, i64, i64, f32p, f32p,
                                               ctypes.c_float, f32p]
        lib.points_in_rbbox.argtypes = [f32p, i64, i64, f32p, i64, u8p]
        lib.filter_points_range.argtypes = [f32p, i64, i64, f32p, f32p]
        lib.filter_points_range.restype = i64
        lib.raster_depth_min.argtypes = [f32p, f32p, i64, i64, i64, i64, f32p]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def available() -> bool:
    return _build() is not None


def transform_sweep_points(pts: np.ndarray, rot: np.ndarray, trans: np.ndarray,
                           time_lag: float) -> np.ndarray:
    pts = np.ascontiguousarray(pts, np.float32)
    lib = _build()
    if lib is None:
        out = pts.copy()
        out[:, :3] = pts[:, :3] @ np.asarray(rot, np.float32).T + trans
        if out.shape[1] >= 5:
            out[:, 4] = time_lag
        return out
    out = np.empty_like(pts)
    lib.transform_sweep_points(
        _fp(pts), pts.shape[0], pts.shape[1],
        _fp(np.ascontiguousarray(rot, np.float32)),
        _fp(np.ascontiguousarray(trans, np.float32)),
        ctypes.c_float(time_lag), _fp(out),
    )
    return out


def points_in_rbbox(points: np.ndarray, boxes: np.ndarray) -> np.ndarray:
    lib = _build()
    if lib is None:
        from ..core.box_np import points_in_rbbox as np_impl

        return np_impl(points, boxes)
    points = np.ascontiguousarray(points, np.float32)
    boxes = np.ascontiguousarray(boxes[:, :7], np.float32)
    mask = np.empty((points.shape[0], boxes.shape[0]), np.uint8)
    lib.points_in_rbbox(
        _fp(points), points.shape[0], points.shape[1], _fp(boxes),
        boxes.shape[0], mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return mask.astype(bool)


def filter_points_range(pts: np.ndarray, pcr) -> np.ndarray:
    lib = _build()
    pts = np.ascontiguousarray(pts, np.float32)
    if lib is None:
        m = (
            (pts[:, 0] > pcr[0]) & (pts[:, 1] > pcr[1]) & (pts[:, 2] > pcr[2])
            & (pts[:, 0] < pcr[3]) & (pts[:, 1] < pcr[4]) & (pts[:, 2] < pcr[5])
        )
        return pts[m]
    out = np.empty_like(pts)
    k = lib.filter_points_range(
        _fp(pts), pts.shape[0], pts.shape[1],
        _fp(np.ascontiguousarray(pcr, np.float32)), _fp(out),
    )
    return out[:k].copy()


def raster_depth_min(uv: np.ndarray, dist: np.ndarray, H: int, W: int) -> np.ndarray:
    """uv [N, P, 2] (col, row); dist [N, P] -> [N, H, W] min-depth."""
    lib = _build()
    if lib is None:
        N, P = dist.shape
        depth = np.zeros((N, H, W), np.float32)
        for n in range(N):
            ok = (dist[n] > 0) & (uv[n, :, 0] >= 0) & (uv[n, :, 0] < W) \
                 & (uv[n, :, 1] >= 0) & (uv[n, :, 1] < H)
            cc = uv[n, ok].astype(int)
            dd = dist[n, ok]
            order = np.argsort(-dd)  # write closest last
            depth[n, cc[order, 1], cc[order, 0]] = dd[order]
        return depth
    uv = np.ascontiguousarray(uv, np.float32)
    dist = np.ascontiguousarray(dist, np.float32)
    depth = np.empty((dist.shape[0], H, W), np.float32)
    lib.raster_depth_min(_fp(uv), _fp(dist), dist.shape[0], dist.shape[1],
                         H, W, _fp(depth))
    return depth

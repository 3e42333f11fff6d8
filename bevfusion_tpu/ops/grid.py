"""BEV grid math shared by view transforms and heads.

Reference semantics: mmdet3d/models/vtransforms/base.py:15-21 (gen_dx_bx)
and :66-89 (create_frustum). Pure numpy here — these are static,
trace-time constants baked into the compiled program.
"""
from __future__ import annotations

import numpy as np

__all__ = ["gen_dx_bx", "create_frustum"]


def gen_dx_bx(xbound, ybound, zbound):
    """Voxel size dx, first-voxel center bx, grid dims nx per axis.

    Matches vtransforms/base.py:15-21: nx uses the (possibly truncating)
    float division then int cast.
    """
    bounds = [xbound, ybound, zbound]
    dx = np.array([row[2] for row in bounds], dtype=np.float32)
    bx = np.array([row[0] + row[2] / 2.0 for row in bounds], dtype=np.float32)
    nx = np.array(
        [int((row[1] - row[0]) / row[2]) for row in bounds], dtype=np.int64
    )
    return dx, bx, nx


def create_frustum(image_size, feature_size, dbound):
    """Frustum of (u, v, depth) points at feature resolution.

    Shape [D, fH, fW, 3]; matches vtransforms/base.py:66-89: u/v are
    linspace over [0, iW-1]/[0, iH-1] at feature resolution, depths are
    arange(*dbound).
    """
    iH, iW = image_size
    fH, fW = feature_size
    ds = np.arange(dbound[0], dbound[1], dbound[2], dtype=np.float32)
    D = ds.shape[0]
    ds = np.broadcast_to(ds[:, None, None], (D, fH, fW))
    xs = np.broadcast_to(
        np.linspace(0, iW - 1, fW, dtype=np.float32)[None, None, :], (D, fH, fW)
    )
    ys = np.broadcast_to(
        np.linspace(0, iH - 1, fH, dtype=np.float32)[None, :, None], (D, fH, fW)
    )
    return np.stack([xs, ys, ds], axis=-1)

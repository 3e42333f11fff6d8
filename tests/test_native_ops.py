import numpy as np
import pytest

from bevfusion_tpu import native
from bevfusion_tpu.core.box_np import points_in_rbbox as np_points_in_rbbox


def test_native_builds():
    assert native.available(), "g++ toolchain should build libhost_ops.so"


def test_transform_sweep_points_matches_numpy():
    rng = np.random.RandomState(0)
    pts = rng.randn(100, 5).astype(np.float32)
    th = 0.3
    rot = np.array([[np.cos(th), -np.sin(th), 0],
                    [np.sin(th), np.cos(th), 0], [0, 0, 1]], np.float32)
    trans = np.array([1.0, -2.0, 0.5], np.float32)
    got = native.transform_sweep_points(pts, rot, trans, 0.45)
    want = pts.copy()
    want[:, :3] = pts[:, :3] @ rot.T + trans
    want[:, 4] = 0.45
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_points_in_rbbox_matches_numpy():
    rng = np.random.RandomState(1)
    pts = rng.uniform(-5, 5, (500, 5)).astype(np.float32)
    boxes = np.stack([
        rng.uniform(-3, 3, 8), rng.uniform(-3, 3, 8), rng.uniform(-2, 0, 8),
        rng.uniform(1, 3, 8), rng.uniform(1, 3, 8), rng.uniform(1, 2, 8),
        rng.uniform(-3, 3, 8),
    ], -1).astype(np.float32)
    got = native.points_in_rbbox(pts, boxes)
    want = np_points_in_rbbox(pts[:, :3], boxes)
    np.testing.assert_array_equal(got, want)


def test_filter_points_range():
    rng = np.random.RandomState(2)
    pts = rng.uniform(-10, 10, (1000, 5)).astype(np.float32)
    pcr = np.array([-5, -5, -5, 5, 5, 5], np.float32)
    got = native.filter_points_range(pts, pcr)
    m = ((pts[:, :3] > pcr[:3]) & (pts[:, :3] < pcr[3:])).all(-1)
    np.testing.assert_allclose(got, pts[m])


def test_raster_depth_min():
    uv = np.array([[[3.0, 2.0], [3.4, 2.9], [50.0, 1.0], [-1.0, 0.0]]], np.float32)
    dist = np.array([[5.0, 4.0, 1.0, 1.0]], np.float32)
    d = native.raster_depth_min(uv, dist, 8, 8)
    assert d.shape == (1, 8, 8)
    assert d[0, 2, 3] == 4.0  # min of 5.0 and 4.0 at same pixel
    assert d.sum() == 4.0  # out-of-range points dropped

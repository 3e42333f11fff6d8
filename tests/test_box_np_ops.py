"""box_np_ops breadth: vectorized forms vs reference-semantics oracles
(mmdet3d/core/bbox/box_np_ops.py; the numba loops are re-expressed here
as tiny python loops for oracle purposes)."""
import numpy as np

from bevfusion_tpu.core import box_np_ops as ops
from bevfusion_tpu.core.box_np import points_in_rbbox as pir_lidar


def test_corners_nd_matches_reference_ordering():
    # reference box_np_ops.py:48-78: binary counting via unravel_index,
    # reordered [0,1,3,2] (2d) / [0,1,3,2,4,5,7,6] (3d)
    dims = np.array([[2.0, 4.0], [1.0, 3.0]])
    ref_norm = np.stack(
        np.unravel_index(np.arange(4), [2, 2]), axis=1).astype(float)
    ref_norm = ref_norm[[0, 1, 3, 2]] - 0.5
    ref = dims[:, None, :] * ref_norm[None]
    np.testing.assert_allclose(ops.corners_nd(dims), ref)

    dims3 = np.array([[2.0, 4.0, 1.5]])
    ref_norm3 = np.stack(
        np.unravel_index(np.arange(8), [2, 2, 2]), axis=1).astype(float)
    ref_norm3 = ref_norm3[[0, 1, 3, 2, 4, 5, 7, 6]] - np.array([0.5, 1.0, 0.5])
    np.testing.assert_allclose(
        ops.corners_nd(dims3, origin=(0.5, 1.0, 0.5)),
        dims3[:, None, :] * ref_norm3[None])


def test_rotation_3d_in_axis_all_axes():
    rng = np.random.RandomState(0)
    pts = rng.randn(3, 5, 3)
    angles = rng.uniform(-np.pi, np.pi, 3)
    for axis in (0, 1, 2):
        got = ops.rotation_3d_in_axis(pts, angles, axis=axis)
        # oracle: reference builds rot_mat_T[j,k,a] row-lists and does
        # einsum('aij,jka->aik')
        for a, ang in enumerate(angles):
            c, s = np.cos(ang), np.sin(ang)
            if axis == 1:
                m = np.array([[c, 0, -s], [0, 1, 0], [s, 0, c]])
            elif axis == 2:
                m = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
            else:
                m = np.array([[0, c, -s], [0, s, c], [1, 0, 0]])
            np.testing.assert_allclose(got[a], pts[a] @ m, atol=1e-12)


def test_points_in_rbbox_agrees_with_lidar_closed_form():
    rng = np.random.RandomState(1)
    boxes = np.concatenate([
        rng.uniform(-5, 5, (4, 3)), rng.uniform(1, 3, (4, 3)),
        rng.uniform(-np.pi, np.pi, (4, 1)),
    ], -1).astype(np.float64)
    pts = rng.uniform(-8, 8, (500, 3))
    got = ops.points_in_rbbox(pts, boxes)  # polygon-test path
    ref = pir_lidar(pts, boxes)            # closed-form lidar-frame path
    # boundary points can differ (< vs <=); require agreement off-boundary
    assert (got == ref).mean() > 0.995


def test_iou_2d_oracle():
    rng = np.random.RandomState(2)
    lo = rng.uniform(0, 10, (6, 2))
    boxes = np.concatenate([lo, lo + rng.uniform(1, 5, (6, 2))], -1)
    lo2 = rng.uniform(0, 10, (4, 2))
    query = np.concatenate([lo2, lo2 + rng.uniform(1, 5, (4, 2))], -1)
    got = ops.iou_2d(boxes, query)
    for n in range(6):
        for k in range(4):
            iw = min(boxes[n, 2], query[k, 2]) - max(boxes[n, 0], query[k, 0])
            ih = min(boxes[n, 3], query[k, 3]) - max(boxes[n, 1], query[k, 1])
            if iw > 0 and ih > 0:
                ua = ((boxes[n, 2] - boxes[n, 0]) * (boxes[n, 3] - boxes[n, 1])
                      + (query[k, 2] - query[k, 0])
                      * (query[k, 3] - query[k, 1]) - iw * ih)
                np.testing.assert_allclose(got[n, k], iw * ih / ua, atol=1e-12)
            else:
                assert got[n, k] == 0


def test_rbbox2d_to_near_bbox():
    rb = np.array([
        [0, 0, 2, 6, 0.0],          # aligned: extents stay (2, 6)
        [0, 0, 2, 6, np.pi / 2],    # rotated 90deg: extents swap
    ])
    out = ops.rbbox2d_to_near_bbox(rb)
    np.testing.assert_allclose(out[0], [-1, -3, 1, 3])
    np.testing.assert_allclose(out[1], [-3, -1, 3, 1])


def test_camera_lidar_roundtrip_and_box_conversion():
    rng = np.random.RandomState(3)
    # random rigid transforms
    q = np.linalg.qr(rng.randn(3, 3))[0]
    velo2cam = np.eye(4)
    velo2cam[:3, :3], velo2cam[:3, 3] = q, rng.randn(3)
    r_rect = np.eye(4)
    pts = rng.randn(10, 3)
    back = ops.camera_to_lidar(
        ops.lidar_to_camera(pts, r_rect, velo2cam), r_rect, velo2cam)
    np.testing.assert_allclose(back, pts, atol=1e-10)

    cam_boxes = np.concatenate([
        rng.randn(5, 3), rng.uniform(1, 3, (5, 3)), rng.randn(5, 1)], -1)
    lidar = ops.box_camera_to_lidar(cam_boxes, r_rect, velo2cam)
    # dims are reordered l,h,w -> w,l,h
    np.testing.assert_allclose(lidar[:, 3], cam_boxes[:, 5])
    np.testing.assert_allclose(lidar[:, 4], cam_boxes[:, 3])
    np.testing.assert_allclose(lidar[:, 5], cam_boxes[:, 4])


def test_points_cam2img_and_box3d_to_bbox():
    K = np.array([[100.0, 0, 50], [0, 100.0, 30], [0, 0, 1]])
    pts = np.array([[0.0, 0.0, 2.0], [0.1, -0.1, 1.0]])
    uv = ops.points_cam2img(pts, K)
    np.testing.assert_allclose(uv[0], [50, 30])
    np.testing.assert_allclose(uv[1], [60, 20])
    uvd = ops.points_cam2img(pts, K, with_depth=True)
    np.testing.assert_allclose(uvd[:, 2], [2.0, 1.0])

    box = np.array([[0.0, 0.0, 5.0, 1.0, 1.0, 1.0, 0.3]])
    P = np.eye(4)
    P[:3, :3] = K
    bb = ops.box3d_to_bbox(box, P)
    assert bb.shape == (1, 4)
    assert bb[0, 0] < 50 < bb[0, 2] and bb[0, 1] < 30 < bb[0, 3]


def test_remove_outside_points_frustum():
    K = np.array([[100.0, 0, 50, 0], [0, 100.0, 30, 0],
                  [0, 0, 1, 0], [0, 0, 0, 1]])
    eye = np.eye(4)
    # camera frame == "lidar" frame here; z forward
    inside = np.array([[0.0, 0.0, 5.0], [0.2, 0.1, 3.0]])
    outside = np.array([[50.0, 0.0, 1.0], [0.0, 0.0, -5.0]])
    pts = np.concatenate([inside, outside])
    kept = ops.remove_outside_points(pts, eye, eye, K, (60, 100))
    assert kept.shape[0] == 2
    np.testing.assert_allclose(kept, inside)


def test_depth_to_points_vectorization():
    depth = np.zeros((4, 5))
    depth[2, 1], depth[3, 4] = 2.0, 3.0
    depth[0, 0] = 9.0  # truncated row
    pts = ops.depth_to_points(depth, trunc_pixel=1)
    np.testing.assert_allclose(pts, [[2.0, 4.0, 2.0], [12.0, 9.0, 3.0]])


def test_points_in_convex_polygon_2d():
    square = np.array([[[0, 0], [0, 2], [2, 2], [2, 0]]], float)  # clockwise
    pts = np.array([[1.0, 1.0], [3.0, 1.0], [-0.5, 1.0]])
    got = ops.points_in_convex_polygon(pts, square, clockwise=True)
    assert got[:, 0].tolist() == [True, False, False]


def test_corner_surfaces_and_standup():
    boxes = np.array([[1.0, 2.0, 0.5, 2.0, 4.0, 1.0, 0.4]])
    corners = ops.boxes3d_to_corners3d_lidar(boxes)
    s = ops.corner_to_surfaces_3d(corners)
    assert s.shape == (1, 6, 4, 3)
    # every surface normal must point toward the box centroid (inward)
    centroid = corners[0].mean(0)
    normal, d = ops.surface_equ_3d(s[:, :, :3, :])
    sign = normal[0] @ centroid + d[0]
    assert np.all(sign < 0)
    standup = ops.corner_to_standup_nd(corners)
    assert standup.shape == (1, 6)
    assert np.all(standup[0, :3] < standup[0, 3:])

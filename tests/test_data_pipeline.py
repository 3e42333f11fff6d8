import numpy as np

from bevfusion_tpu.core.box_np import LiDARBoxes3D, points_in_rbbox
from bevfusion_tpu.data.points import LiDARPoints
from bevfusion_tpu.data.transforms import (
    GlobalRotScaleTrans,
    GTDepth,
    ImageAug3D,
    ImageNormalize,
    ObjectRangeFilter,
    PadBatch,
    PointsRangeFilter,
    RandomFlip3D,
)


def _sample(seed=0, P=300):
    rng = np.random.RandomState(seed)
    N = 2
    intr = np.tile(np.eye(4, dtype=np.float32), (N, 1, 1))
    intr[:, 0, 0] = intr[:, 1, 1] = 80.0
    intr[:, 0, 2] = 64.0
    intr[:, 1, 2] = 32.0
    data = {
        "img": [rng.rand(64, 128, 3).astype(np.float32) * 255 for _ in range(N)],
        "ori_shape": (128, 64),
        "points": LiDARPoints(
            np.concatenate([rng.uniform(-20, 20, (P, 3)), rng.rand(P, 2)], -1), 5
        ),
        "gt_bboxes_3d": LiDARBoxes3D(
            np.concatenate([
                rng.uniform(-18, 18, (5, 2)), rng.uniform(-2, 0, (5, 1)),
                rng.uniform(1, 3, (5, 3)), rng.uniform(-3, 3, (5, 1)),
                rng.uniform(-1, 1, (5, 2)),
            ], -1), 9,
        ),
        "gt_labels_3d": rng.randint(0, 10, 5),
        "lidar2image": intr.copy(),
        "img_aug_matrix": np.tile(np.eye(4, dtype=np.float32), (N, 1, 1)),
        "lidar_aug_matrix": np.eye(4, dtype=np.float32),
        "_rng": np.random.RandomState(seed + 1),
    }
    return data


def _project(l2i, ia, la, xyz):
    """Project an ORIGINAL-frame 3D point through the aug matrices the
    model uses: inverse lidar aug is applied to the AUGMENTED point, so
    here project original point directly then apply image aug."""
    cam = l2i[:3, :3] @ xyz + l2i[:3, 3]
    uv = cam[:2] / max(cam[2], 1e-5)
    uv1 = np.array([uv[0], uv[1], 1.0])
    out = ia[:3, :3] @ uv1 + ia[:3, 3]
    return out[:2], cam[2]


def test_aug_roundtrip_invariance():
    """The core geometric contract: for an original point x with
    augmented coordinates x' = A x (lidar_aug_matrix A), projecting
    inv(A) x' through lidar2image + img_aug must equal projecting x and
    applying img_aug — i.e. the matrices the pipeline accumulates invert
    the augs exactly (what DepthLSS/GTDepth do)."""
    data = _sample()
    orig_points = data["points"].tensor[:, :3].copy()

    data = ImageAug3D(final_dim=(32, 64), resize_lim=(0.4, 0.6),
                      bot_pct_lim=(0.0, 0.0), rot_lim=(-5.4, 5.4),
                      rand_flip=True, is_train=True)(data)
    data = GlobalRotScaleTrans(resize_lim=(0.9, 1.1), rot_lim=(-0.78, 0.78),
                               trans_lim=0.5, is_train=True)(data)
    data = RandomFlip3D()(data)

    A = data["lidar_aug_matrix"]
    aug_points = data["points"].tensor[:, :3]
    # 1) pipeline point aug must equal the accumulated matrix
    want = orig_points @ A[:3, :3].T + A[:3, 3]
    np.testing.assert_allclose(aug_points, want, rtol=1e-4, atol=1e-4)

    # 2) inverting the aug in projection (GTDepth-style) must recover the
    # original-frame projection
    x_aug = aug_points[0]
    x_rec = np.linalg.inv(A[:3, :3]) @ (x_aug - A[:3, 3])
    np.testing.assert_allclose(x_rec, orig_points[0], rtol=1e-4, atol=1e-4)


def test_boxes_follow_points():
    """GT boxes and points must receive the same rigid transform."""
    data = _sample(seed=3)
    box_center0 = data["gt_bboxes_3d"].tensor[0, :3].copy()
    p0 = data["points"].tensor[0, :3].copy()
    data = GlobalRotScaleTrans(resize_lim=(0.9, 1.1), rot_lim=(-0.78, 0.78),
                               trans_lim=0.5, is_train=True)(data)
    data = RandomFlip3D()(data)
    A = data["lidar_aug_matrix"]
    np.testing.assert_allclose(
        data["gt_bboxes_3d"].tensor[0, :3],
        A[:3, :3] @ box_center0 + A[:3, 3], rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        data["points"].tensor[0, :3], A[:3, :3] @ p0 + A[:3, 3],
        rtol=1e-4, atol=1e-4,
    )


def test_gtdepth_hits_expected_pixel():
    data = _sample(seed=5)
    # single point straight ahead of camera 0
    data["points"] = LiDARPoints(np.array([[1.0, 0.5, 5.0, 0.0, 0.0]]), 5)
    data = GTDepth(keyframe_only=True)(data)
    d = data["depths"]
    assert d.shape == (2, 64, 128)
    # u = 80*1/5 + 64 = 80, v = 80*0.5/5 + 32 = 40
    assert d[0, 40, 80] == 5.0
    assert d.sum() == 10.0  # same for both identical cameras


def test_filters_and_pad():
    data = _sample(seed=7)
    data["gt_bboxes_3d"].tensor[0, 0] = 100.0  # push one box out of range
    data = PointsRangeFilter([-10, -10, -5, 10, 10, 5])(data)
    assert data["points"].in_range_3d([-10, -10, -5, 10, 10, 5]).all()
    data = ObjectRangeFilter([-19, -19, -5, 19, 19, 5])(data)
    assert len(data["gt_bboxes_3d"]) <= 4

    data = PadBatch(max_points=500, max_gt_boxes=16)(data)
    assert data["points"].shape == (500, 5)
    assert data["gt_boxes"].shape == (16, 9)
    assert data["gt_valid"].sum() == len(data["gt_labels_3d"])


def test_points_in_rbbox():
    boxes = np.array([[0, 0, 0, 2, 4, 2, np.pi / 2]], np.float32)
    pts = np.array([
        [1.5, 0.0, 1.0],   # inside after rotation (dx along y now)
        [0.0, 1.5, 1.0],   # outside (dy along x now, half-extent 1)
        [0.0, 0.0, 2.5],   # above
    ], np.float32)
    m = points_in_rbbox(pts, boxes)
    assert m[0, 0] and not m[1, 0] and not m[2, 0]


def test_image_aug_matrix_tracks_pixels():
    """Map a source pixel through resize+crop+flip+rotate and check the
    accumulated 4x4 sends the original pixel coords to the new ones."""
    rng = np.random.RandomState(0)
    aug = ImageAug3D(final_dim=(32, 64), resize_lim=(0.5, 0.5),
                     bot_pct_lim=(0.0, 0.0), rot_lim=(0.0, 0.0),
                     rand_flip=False, is_train=True)
    img = np.zeros((64, 128, 3), np.float32)
    img[40, 100] = 1.0
    data = {"img": [img], "ori_shape": (128, 64), "_rng": rng}
    data = aug(data)
    m = data["img_aug_matrix"][0]
    src = np.array([100.0, 40.0, 1.0])  # (u, v, 1)
    dst = m[:3, :3] @ src + m[:3, 3]
    out = data["img"][0]
    # the bright pixel should be near (dst_v, dst_u)
    v, u = np.unravel_index(np.argmax(out[..., 0]), out[..., 0].shape)
    assert abs(v - dst[1]) <= 1.5 and abs(u - dst[0]) <= 1.5, (v, u, dst)

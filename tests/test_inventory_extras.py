import jax
import jax.numpy as jnp
import numpy as np

from bevfusion_tpu.core.anchors import Anchor3DRangeGenerator
from bevfusion_tpu.core.assign_sample import (
    AssignResult, BboxOverlaps3D, PseudoSampler,
)
from bevfusion_tpu.core.box_modes import Box3DMode, convert_boxes, convert_points
from bevfusion_tpu.models.resnet_full import ResNet


def test_resnet50_shapes():
    m = ResNet(depth=50, base_channels=8, out_indices=(0, 1, 2, 3))
    x = jnp.zeros((1, 64, 64, 3))
    vs = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    outs, _ = m.apply(vs, x, training=False, mutable=["batch_stats"])
    assert [o.shape for o in outs] == [
        (1, 16, 16, 32), (1, 8, 8, 64), (1, 4, 4, 128), (1, 2, 2, 256)]


def test_anchor_generator_grid():
    gen = Anchor3DRangeGenerator(
        ranges=[[-10, -10, -1, 10, 10, -1]],
        sizes=[[1.6, 3.9, 1.56]],
        rotations=[0.0, 1.5707963],
    )
    anchors = gen.grid_anchors((1, 4, 4))
    assert anchors.shape == (1, 4, 4, 2, 7)
    assert np.allclose(anchors[0, 0, 0, 0, 3:6], [1.6, 3.9, 1.56])
    assert anchors[0, 0, 0, 1, 6] != anchors[0, 0, 0, 0, 6]


def test_box_mode_roundtrip():
    rng = np.random.RandomState(0)
    boxes = np.concatenate([
        rng.uniform(-10, 10, (5, 3)), rng.uniform(1, 3, (5, 3)),
        rng.uniform(-1, 1, (5, 1)),
    ], -1).astype(np.float32)
    cam = convert_boxes(boxes, Box3DMode.LIDAR, Box3DMode.CAM)
    back = convert_boxes(cam, Box3DMode.CAM, Box3DMode.LIDAR)
    np.testing.assert_allclose(back[:, :6], boxes[:, :6], atol=1e-5)
    pts = rng.randn(7, 5).astype(np.float32)
    p2 = convert_points(convert_points(pts, Box3DMode.LIDAR, Box3DMode.CAM),
                        Box3DMode.CAM, Box3DMode.LIDAR)
    np.testing.assert_allclose(p2, pts, atol=1e-5)


def test_pseudo_sampler_and_iou_calculator():
    gt_inds = np.array([0, 2, 0, 1])
    res = AssignResult(2, gt_inds, np.zeros(4), np.array([-1, 1, -1, 0]))
    gt = np.array([[0, 0, 0, 2, 2, 2, 0.0], [5, 5, 0, 2, 2, 2, 0.0]], np.float32)
    s = PseudoSampler().sample(res, np.zeros((4, 7)), gt)
    assert list(s.pos_inds) == [1, 3]
    assert list(s.pos_assigned_gt_inds) == [1, 0]
    iou = np.asarray(BboxOverlaps3D("lidar")(gt, gt))
    np.testing.assert_allclose(np.diag(iou), [1.0, 1.0], atol=1e-4)
    assert iou[0, 1] < 1e-5


def test_camera_radar_model():
    """Tiny camera+radar fusion exercises the radar branch end to end."""
    from bevfusion_tpu.models import build_model

    cfg = {
        "type": "BEVFusion",
        "encoders": {
            "camera": {
                "backbone": {"type": "ResNet", "depth": 18, "base_channels": 8,
                             "out_indices": [0, 1, 2, 3]},
                "neck": {"type": "SECONDFPN",
                         "in_channels": [8, 16, 32, 64],
                         "out_channels": [8, 8, 8, 8],
                         "upsample_strides": [0.25, 0.5, 1, 2]},
                "vtransform": {
                    "type": "LSSTransform", "in_channels": 32, "out_channels": 16,
                    "image_size": [32, 64], "feature_size": [2, 4],
                    "xbound": [-16.0, 16.0, 2.0], "ybound": [-16.0, 16.0, 2.0],
                    "zbound": [-10.0, 10.0, 20.0], "dbound": [1.0, 9.0, 1.0],
                    "downsample": 1,
                },
            },
            "lidar": None,
            "radar": {
                "voxelize_reduce": False,
                "voxelize": {
                    "max_num_points": 4,
                    "point_cloud_range": [-16.0, -16.0, -4.0, 16.0, 16.0, 4.0],
                    "voxel_size": [2.0, 2.0, 8.0],
                    "max_voxels": [64, 64],
                },
                "backbone": {
                    "type": "RadarEncoder",
                    "pts_voxel_encoder": {
                        "type": "RadarFeatureNet", "in_channels": 7,
                        "feat_channels": [16, 16],
                        "point_cloud_range": [-16.0, -16.0, -4.0, 16.0, 16.0, 4.0],
                        "voxel_size": [2.0, 2.0, 8.0],
                    },
                    "pts_middle_encoder": {
                        "type": "PointPillarsScatter", "in_channels": 16,
                        "output_shape": [16, 16],
                    },
                },
            },
        },
        "fuser": {"type": "ConvFuser", "in_channels": [16, 16], "out_channels": 16},
        "decoder": {
            "backbone": {"type": "GeneralizedResNet", "in_channels": 16,
                         "blocks": [[1, 16, 1]]},
            "neck": {"type": "LSSFPN", "in_indices": [-1, 0],
                     "in_channels": [16, 16], "out_channels": 16,
                     "scale_factor": 1},
        },
        "heads": {"map": {
            "type": "BEVSegmentationHead", "in_channels": 16,
            "grid_transform": {
                "input_scope": [[-16.0, 16.0, 2.0], [-16.0, 16.0, 2.0]],
                "output_scope": [[-8.0, 8.0, 1.0], [-8.0, 8.0, 1.0]],
            },
            "classes": ["drivable_area"], "loss": "focal",
        }},
    }
    model = build_model(cfg)
    rng = np.random.RandomState(0)
    B, N = 1, 2
    eye = np.tile(np.eye(4, dtype=np.float32), (B, N, 1, 1))
    intr = eye.copy()
    intr[:, :, 0, 0] = intr[:, :, 1, 1] = 30.0
    intr[:, :, 0, 2], intr[:, :, 1, 2] = 32.0, 16.0
    batch = {
        "img": jnp.asarray(rng.rand(B, N, 32, 64, 3), jnp.float32),
        "radar": jnp.asarray(rng.uniform(-14, 14, (B, 256, 7)), jnp.float32),
        "radar_mask": jnp.ones((B, 256), bool),
        "camera2ego": jnp.asarray(eye), "lidar2ego": jnp.asarray(eye[:, 0]),
        "lidar2camera": jnp.asarray(eye), "lidar2image": jnp.asarray(intr),
        "camera_intrinsics": jnp.asarray(intr), "camera2lidar": jnp.asarray(eye),
        "img_aug_matrix": jnp.asarray(eye),
        "lidar_aug_matrix": jnp.asarray(eye[:, 0]),
        "gt_masks_bev": jnp.zeros((B, 1, 16, 16)),
    }
    vs = jax.jit(lambda b: model.init(jax.random.PRNGKey(0), b, training=False))(batch)
    out, _ = jax.jit(lambda v, b: model.apply(v, b, training=False,
                                              mutable=["batch_stats"]))(vs, batch)
    assert out["masks_bev"].shape == (B, 16, 16, 1)
    assert np.isfinite(np.asarray(out["masks_bev"])).all()


def test_delta_xyzwhlr_coder_roundtrip_and_torch_oracle():
    from bevfusion_tpu.core.coders import DeltaXYZWLHRBBoxCoder

    rng = np.random.RandomState(3)
    anchors = np.concatenate([
        rng.uniform(-20, 20, (6, 3)), rng.uniform(1, 4, (6, 3)),
        rng.uniform(-3, 3, (6, 1)),
    ], -1).astype(np.float32)
    gts = np.concatenate([
        rng.uniform(-20, 20, (6, 3)), rng.uniform(1, 4, (6, 3)),
        rng.uniform(-3, 3, (6, 1)),
    ], -1).astype(np.float32)
    deltas = np.asarray(DeltaXYZWLHRBBoxCoder.encode(anchors, gts))
    back = np.asarray(DeltaXYZWLHRBBoxCoder.decode(anchors, deltas))
    np.testing.assert_allclose(back, gts, atol=1e-4)

    # torch oracle of delta_xyzwhlr_bbox_coder.py:36-52 encode math
    import torch

    a = torch.from_numpy(anchors)
    g = torch.from_numpy(gts)
    za, zg = a[:, 2] + a[:, 5] / 2, g[:, 2] + g[:, 5] / 2
    diag = torch.sqrt(a[:, 4] ** 2 + a[:, 3] ** 2)
    ref = torch.stack([
        (g[:, 0] - a[:, 0]) / diag, (g[:, 1] - a[:, 1]) / diag,
        (zg - za) / a[:, 5],
        torch.log(g[:, 3] / a[:, 3]), torch.log(g[:, 4] / a[:, 4]),
        torch.log(g[:, 5] / a[:, 5]), g[:, 6] - a[:, 6],
    ], -1)
    np.testing.assert_allclose(deltas, ref.numpy(), atol=1e-5)

    # 9-dim (velocity) path: extra dims are plain residuals
    a9 = np.concatenate([anchors, rng.randn(6, 2).astype(np.float32)], -1)
    g9 = np.concatenate([gts, rng.randn(6, 2).astype(np.float32)], -1)
    d9 = np.asarray(DeltaXYZWLHRBBoxCoder.encode(a9, g9))
    np.testing.assert_allclose(
        np.asarray(DeltaXYZWLHRBBoxCoder.decode(a9, d9)), g9, atol=1e-4)


def test_partial_bin_coder_angle_roundtrip_and_decode():
    from bevfusion_tpu.core.coders import PartialBinBasedBBoxCoder

    mean_sizes = [[2.0, 4.0, 1.5], [0.6, 0.8, 1.7], [1.0, 1.0, 1.0]]
    coder = PartialBinBasedBBoxCoder(12, 3, mean_sizes)
    rng = np.random.RandomState(0)
    yaw = rng.uniform(-np.pi, np.pi, (32,)).astype(np.float32)
    cls, res = coder.angle2class(jnp.asarray(yaw))
    rec = np.asarray(coder.class2angle(cls, res))
    # roundtrip up to 2pi wrap
    d = np.abs(rec - yaw) % (2 * np.pi)
    assert np.all(np.minimum(d, 2 * np.pi - d) < 1e-5)

    # encode -> decode roundtrip through split-style dicts
    boxes = np.concatenate([
        rng.uniform(-5, 5, (4, 3)), rng.uniform(1, 3, (4, 3)),
        rng.uniform(-np.pi * 0.9, np.pi * 0.9, (4, 1)),
    ], -1).astype(np.float32)
    labels = np.array([0, 1, 2, 1])
    center, size_cls, size_res, dir_cls, dir_res = coder.encode(
        jnp.asarray(boxes), jnp.asarray(labels))
    bbox_out = {
        "center": center[None],
        "dir_class": jax.nn.one_hot(dir_cls, 12)[None] * 10,
        "dir_res": jnp.tile(dir_res[:, None], (1, 12))[None],
        "size_class": jax.nn.one_hot(size_cls, 3)[None] * 10,
        "size_res": jnp.tile(size_res[:, None, :], (1, 3, 1))[None],
    }
    dec = np.asarray(coder.decode(bbox_out))[0]
    np.testing.assert_allclose(dec[:, :2], boxes[:, :2], atol=1e-4)
    np.testing.assert_allclose(dec[:, 2], boxes[:, 2] + boxes[:, 5] / 2,
                               atol=1e-4)
    np.testing.assert_allclose(dec[:, 3:6], boxes[:, 3:6], atol=1e-4)
    dy = np.abs(dec[:, 6] - boxes[:, 6]) % (2 * np.pi)
    assert np.all(np.minimum(dy, 2 * np.pi - dy) < 1e-4)


def test_anchor_free_and_groupfree_coders():
    from bevfusion_tpu.core.coders import (
        AnchorFreeBBoxCoder, GroupFree3DBBoxCoder,
    )

    rng = np.random.RandomState(1)
    coder = AnchorFreeBBoxCoder(num_dir_bins=12)
    cls_preds = jnp.asarray(rng.randn(2, 5, 16), jnp.float32)
    reg_preds = jnp.asarray(rng.randn(2, 6 + 24, 16), jnp.float32)
    base_xyz = jnp.asarray(rng.randn(2, 16, 3), jnp.float32)
    split = coder.split_pred(cls_preds, reg_preds, base_xyz)
    assert split["center"].shape == (2, 16, 3)
    assert split["dir_class"].shape == (2, 16, 12)
    dec = coder.decode({**split, "size": split["size"]})
    assert dec.shape == (2, 16, 7)
    assert np.all(np.asarray(dec[..., 3:6]) >= 0.1 - 1e-6)

    gf = GroupFree3DBBoxCoder(12, 3, [[2, 4, 1.5]] * 3,
                              size_cls_agnostic=True)
    reg2 = jnp.asarray(rng.randn(2, 3 + 24 + 3, 16), jnp.float32)
    split2 = gf.split_pred(cls_preds, reg2, base_xyz, prefix="p.")
    dec2 = gf.decode(split2, prefix="p.")
    assert dec2.shape == (2, 16, 7)


def test_nms_free_coder():
    from bevfusion_tpu.core.coders import (
        NMSFreeCoder, denormalize_bbox, normalize_bbox,
    )

    rng = np.random.RandomState(2)
    boxes = np.concatenate([
        rng.uniform(-40, 40, (8, 3)), rng.uniform(1, 4, (8, 3)),
        rng.uniform(-np.pi, np.pi, (8, 1)), rng.randn(8, 2),
    ], -1).astype(np.float32)
    norm = normalize_bbox(jnp.asarray(boxes))
    back = np.asarray(denormalize_bbox(norm))
    np.testing.assert_allclose(back[:, :6], boxes[:, :6], atol=1e-4)
    np.testing.assert_allclose(back[:, 7:], boxes[:, 7:], atol=1e-5)

    coder = NMSFreeCoder(
        pc_range=[-50, -50, -5, 50, 50, 3],
        post_center_range=[-60, -60, -10, 60, 60, 10],
        max_num=6, num_classes=4, score_threshold=0.0)
    cls_scores = jnp.asarray(rng.randn(1, 20, 4), jnp.float32)
    bbox_preds = jnp.tile(norm[:1][None], (1, 20, 1)).at[...].set(
        jnp.asarray(np.tile(np.asarray(norm)[rng.randint(0, 8, 20)][None],
                            (1, 1, 1))))
    outs = coder.decode({"all_cls_scores": cls_scores[None],
                         "all_bbox_preds": bbox_preds[None]})
    assert len(outs) == 1
    assert outs[0]["bboxes"].shape == (6, 9)
    assert outs[0]["scores"].shape == (6,)
    s = np.asarray(outs[0]["scores"])
    assert np.all(np.diff(s) <= 1e-6)


def test_iou_neg_piecewise_sampler():
    from bevfusion_tpu.core.assign_sample import IoUNegPiecewiseSampler

    n_pred = 200
    rng = np.random.RandomState(0)
    gt_inds = np.zeros(n_pred, np.int64)
    gt_inds[:20] = rng.randint(1, 3, 20)
    overlaps = rng.uniform(0, 0.6, n_pred).astype(np.float32)
    res = AssignResult(2, gt_inds, overlaps, np.zeros(n_pred, np.int64))
    sampler = IoUNegPiecewiseSampler(
        num=128, pos_fraction=0.5, neg_piece_fractions=[0.8, 0.2],
        neg_iou_piece_thrs=[0.55, 0.1], neg_pos_ub=-1,
        return_iou=True, seed=0)
    gt = np.zeros((2, 7), np.float32)
    r = sampler.sample(res, np.zeros((n_pred, 7), np.float32), gt)
    assert len(r.pos_inds) <= 64
    assert len(r.pos_inds) + len(r.neg_inds) <= 128
    assert np.all(gt_inds[r.neg_inds] == 0)
    assert np.all(gt_inds[r.pos_inds] > 0)
    assert r.iou.shape == (len(r.pos_inds) + len(r.neg_inds),)
    # negatives must respect the piece upper bound
    assert np.all(overlaps[r.neg_inds] < 0.55)

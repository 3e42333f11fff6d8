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

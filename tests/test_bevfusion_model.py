"""End-to-end BEVFusion model tests on tiny shapes (CPU-friendly)."""
import jax
import pytest
import jax.numpy as jnp
import numpy as np

from bevfusion_tpu.models import build_model


def tiny_fused_config(with_camera=True, with_lidar=True, head="object"):
    """A scaled-down fused C+L detection model: all the real blocks at
    toy sizes. BEV grid 32x32 -> decoder input 16x16 (downsample 2)."""
    camera = {
        "backbone": {
            # out_indices (1, 2) -> strides 8, 16 so the FPN's first output
            # matches DepthLSS's fixed /8 sparse-depth encoder
            "type": "SwinTransformer", "embed_dims": 16, "depths": [1, 1, 1],
            "num_heads": [1, 2, 4], "window_size": 4, "out_indices": [1, 2],
            "drop_path_rate": 0.0,
        },
        "neck": {
            "type": "GeneralizedLSSFPN", "in_channels": [32, 64],
            "out_channels": 24, "num_outs": 2,
            "upsample_cfg": {"mode": "bilinear", "align_corners": False},
        },
        "vtransform": {
            "type": "DepthLSSTransform", "in_channels": 24, "out_channels": 16,
            "image_size": [32, 64], "feature_size": [4, 8],
            "xbound": [-16.0, 16.0, 1.0], "ybound": [-16.0, 16.0, 1.0],
            "zbound": [-10.0, 10.0, 20.0], "dbound": [1.0, 9.0, 1.0],
            "downsample": 2,
        },
    }
    lidar = {
        "voxelize": {
            "max_num_points": 4,
            "point_cloud_range": [-16.0, -16.0, -4.0, 16.0, 16.0, 4.0],
            "voxel_size": [0.25, 0.25, 0.5],
            "max_voxels": [256, 256],
        },
        "backbone": {
            "type": "SparseEncoder", "in_channels": 5,
            "sparse_shape": [128, 128, 33], "base_channels": 4,
            "output_channels": 16,
            "encoder_channels": [[4, 4, 8], [8, 8, 16], [16, 16, 16], [16, 16]],
            "encoder_paddings": [[0, 0, 1], [0, 0, 1], [0, 0, [1, 1, 0]], [0, 0]],
            "block_type": "basicblock",
        },
    }
    heads = {}
    if head == "object":
        heads["object"] = {
            "type": "TransFusionHead", "num_proposals": 8, "auxiliary": True,
            "in_channels": 48, "hidden_channel": 16, "num_classes": 10,
            "num_decoder_layers": 1, "num_heads": 4, "nms_kernel_size": 3,
            "ffn_channel": 32, "dropout": 0.0,
            "common_heads": {"center": [2, 2], "height": [1, 2],
                             "dim": [3, 2], "rot": [2, 2], "vel": [2, 2]},
            "bbox_coder": {
                "type": "TransFusionBBoxCoder", "pc_range": [-16.0, -16.0],
                "post_center_range": [-20.0, -20.0, -10.0, 20.0, 20.0, 10.0],
                "score_threshold": 0.0, "out_size_factor": 8,
                "voxel_size": [0.25, 0.25], "code_size": 10,
            },
            "train_cfg": {
                "dataset": "nuScenes",
                "point_cloud_range": [-16.0, -16.0, -4.0, 16.0, 16.0, 4.0],
                "grid_size": [128, 128, 1], "voxel_size": [0.25, 0.25, 0.5],
                "out_size_factor": 8, "gaussian_overlap": 0.1, "min_radius": 2,
                "pos_weight": -1, "code_weights": [1.0] * 8 + [0.2, 0.2],
                "assigner": {
                    "type": "HungarianAssigner3D",
                    "cls_cost": {"type": "FocalLossCost", "gamma": 2.0,
                                 "alpha": 0.25, "weight": 0.15},
                    "reg_cost": {"type": "BBoxBEVL1Cost", "weight": 0.25},
                    "iou_cost": {"type": "IoU3DCost", "weight": 0.25},
                },
            },
            "test_cfg": {
                "dataset": "nuScenes", "grid_size": [128, 128, 1],
                "out_size_factor": 8, "voxel_size": [0.25, 0.25],
                "pc_range": [-16.0, -16.0], "nms_type": None,
            },
        }
    else:
        heads["map"] = {
            "type": "BEVSegmentationHead", "in_channels": 48,
            "grid_transform": {
                "input_scope": [[-16.0, 16.0, 2.0], [-16.0, 16.0, 2.0]],
                "output_scope": [[-8.0, 8.0, 1.0], [-8.0, 8.0, 1.0]],
            },
            "classes": ["drivable_area", "divider"], "loss": "focal",
        }
    cfg = {
        "type": "BEVFusion",
        "encoders": {
            "camera": camera if with_camera else None,
            "lidar": lidar if with_lidar else None,
        },
        "fuser": (
            {"type": "ConvFuser", "in_channels": [16, 16], "out_channels": 24}
            if (with_camera and with_lidar) else None
        ),
        "decoder": {
            "backbone": {"type": "SECOND", "in_channels": 24 if (with_camera and with_lidar) else 16,
                         "out_channels": [16, 32], "layer_nums": [1, 1],
                         "layer_strides": [1, 2]},
            "neck": {"type": "SECONDFPN", "in_channels": [16, 32],
                     "out_channels": [24, 24], "upsample_strides": [1, 2],
                     "use_conv_for_no_stride": True},
        },
        "heads": heads,
    }
    return cfg


def make_batch(B=1, N=2, P=512, G=4, seed=0):
    rng = np.random.RandomState(seed)
    eye = np.tile(np.eye(4, dtype=np.float32), (B, N, 1, 1))
    intr = eye.copy()
    intr[:, :, 0, 0] = intr[:, :, 1, 1] = 30.0
    intr[:, :, 0, 2] = 32.0
    intr[:, :, 1, 2] = 16.0
    batch = {
        "img": rng.rand(B, N, 32, 64, 3).astype(np.float32),
        "points": rng.uniform(-15, 15, (B, P, 5)).astype(np.float32),
        "points_mask": np.ones((B, P), bool),
        "camera2ego": eye, "lidar2ego": np.tile(np.eye(4, dtype=np.float32), (B, 1, 1)),
        "lidar2camera": eye, "lidar2image": intr,
        "camera_intrinsics": intr, "camera2lidar": eye,
        "img_aug_matrix": eye,
        "lidar_aug_matrix": np.tile(np.eye(4, dtype=np.float32), (B, 1, 1)),
        "gt_boxes": np.concatenate([
            rng.uniform(-12, 12, (B, G, 2)), rng.uniform(-2, 0, (B, G, 1)),
            rng.uniform(1, 3, (B, G, 3)), rng.uniform(-1, 1, (B, G, 3)),
        ], -1).astype(np.float32),
        "gt_labels": rng.randint(0, 10, (B, G)).astype(np.int32),
        "gt_valid": np.ones((B, G), bool),
    }
    return {k: jnp.asarray(v) for k, v in batch.items()}


@pytest.mark.slow
def test_fused_detection_forward_and_loss():
    model = build_model(tiny_fused_config())
    batch = make_batch()
    vs = jax.jit(lambda b: model.init(jax.random.PRNGKey(0), b, training=False))(batch)

    eval_fn = jax.jit(lambda v, b: model.apply(v, b, training=False,
                                               mutable=["batch_stats"]))
    out, _ = eval_fn(vs, batch)
    assert out["boxes"]["bboxes"].shape == (1, 8, 9)
    assert np.isfinite(np.asarray(out["boxes"]["bboxes"])).all()

    train_fn = jax.jit(lambda v, b: model.apply(v, b, training=True,
                                                mutable=["batch_stats"]))
    losses, _ = train_fn(vs, batch)
    assert any(k.startswith("loss/object/") for k in losses)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, v)


def test_camera_only_seg_forward():
    model = build_model(tiny_fused_config(with_lidar=False, head="map"))
    batch = make_batch()
    batch["gt_masks_bev"] = jnp.zeros((1, 2, 16, 16))
    vs = jax.jit(lambda b: model.init(jax.random.PRNGKey(0), b, training=False))(batch)
    out, _ = jax.jit(lambda v, b: model.apply(v, b, training=False,
                                              mutable=["batch_stats"]))(vs, batch)
    assert out["masks_bev"].shape == (1, 16, 16, 2)
    losses, _ = jax.jit(lambda v, b: model.apply(v, b, training=True,
                                                 mutable=["batch_stats"]))(vs, batch)
    assert "loss/map/drivable_area/focal" in losses


def test_lidar_only_detection():
    model = build_model(tiny_fused_config(with_camera=False))
    # lidar-only: decoder in_channels must match sparse encoder output
    batch = make_batch()
    vs = jax.jit(lambda b: model.init(jax.random.PRNGKey(0), b, training=False))(batch)
    out, _ = jax.jit(lambda v, b: model.apply(v, b, training=False,
                                              mutable=["batch_stats"]))(vs, batch)
    assert out["boxes"]["bboxes"].shape == (1, 8, 9)

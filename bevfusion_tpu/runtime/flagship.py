"""Flagship model builders + synthetic batches for bench / graft entry.

The flagship is the fused camera+lidar detector
(configs/nuscenes/det/transfusion/secfpn/camera+lidar/swint_v0p075/
convfuser.yaml — reference val mAP 68.52 / NDS 71.38).
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import load_config
from ..models import build_model

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
FLAGSHIP_CONFIG = os.path.join(
    REPO_ROOT,
    "configs/nuscenes/det/transfusion/secfpn/camera+lidar/swint_v0p075/convfuser.yaml",
)


def synthetic_calibration(B: int, N: int, image_size, seed: int = 0):
    """Plausible 6-camera nuScenes-like rig: cameras in a horizontal ring,
    intrinsics with focal ~0.5 iW, so the frustum geometry is realistic."""
    rng = np.random.RandomState(seed)
    iH, iW = image_size
    intr = np.tile(np.eye(4, dtype=np.float32), (B, N, 1, 1))
    intr[:, :, 0, 0] = intr[:, :, 1, 1] = 0.6 * iW
    intr[:, :, 0, 2] = iW / 2
    intr[:, :, 1, 2] = iH / 2

    cam2lidar = np.tile(np.eye(4, dtype=np.float32), (B, N, 1, 1))
    for n in range(N):
        yaw = 2 * np.pi * n / N
        # camera looks outward: x_cam = right, y_cam = down, z_cam = forward
        fwd = np.array([np.cos(yaw), np.sin(yaw), 0.0])
        right = np.array([-np.sin(yaw), np.cos(yaw), 0.0])
        down = np.array([0.0, 0.0, -1.0])
        R = np.stack([right, -down, fwd], axis=1)  # cam->lidar rotation
        cam2lidar[:, n, :3, :3] = R
        cam2lidar[:, n, :3, 3] = fwd * 1.5 + np.array([0, 0, 1.6])

    lidar2cam = np.linalg.inv(cam2lidar)
    l2i = np.einsum("bnij,bnjk->bnik", intr, lidar2cam).astype(np.float32)
    eye_b = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    return {
        "camera_intrinsics": intr,
        "camera2lidar": cam2lidar,
        "lidar2camera": lidar2cam.astype(np.float32),
        "lidar2image": l2i,
        "camera2ego": cam2lidar.copy(),
        "lidar2ego": eye_b,
        "img_aug_matrix": np.tile(np.eye(4, dtype=np.float32), (B, N, 1, 1)),
        "lidar_aug_matrix": eye_b,
    }


def synthetic_batch(cfg, B: int = 1, num_points: int = 200000,
                    num_gt: int = 64, seed: int = 0, training: bool = False):
    rng = np.random.RandomState(seed)
    iH, iW = cfg.image_size
    N = 6
    pcr = np.asarray(cfg.point_cloud_range, np.float32)
    batch = {
        "img": rng.rand(B, N, iH, iW, 3).astype(np.float32),
        "points": np.concatenate([
            rng.uniform(pcr[:3], pcr[3:], (B, num_points, 3)),
            rng.rand(B, num_points, 2),
        ], -1).astype(np.float32),
        "points_mask": np.ones((B, num_points), bool),
    }
    batch.update(synthetic_calibration(B, N, (iH, iW), seed))
    if training:
        G = num_gt
        batch["gt_boxes"] = np.concatenate([
            rng.uniform(-50, 50, (B, G, 2)), rng.uniform(-3, 1, (B, G, 1)),
            rng.uniform(0.5, 4, (B, G, 3)), rng.uniform(-np.pi, np.pi, (B, G, 1)),
            rng.uniform(-2, 2, (B, G, 2)),
        ], -1).astype(np.float32)
        batch["gt_labels"] = rng.randint(0, 10, (B, G)).astype(np.int32)
        batch["gt_valid"] = np.ones((B, G), bool)
    return {k: jnp.asarray(v) for k, v in batch.items()}


def build_flagship(batch_size: int = 1, dtype=jnp.float32,
                   config_path: Optional[str] = None, training: bool = False,
                   num_points: int = 200000):
    cfg = load_config(config_path or FLAGSHIP_CONFIG)
    model = build_model(cfg.model, dtype=dtype)
    batch = synthetic_batch(cfg, B=batch_size, num_points=num_points,
                            training=training)
    return cfg, model, batch

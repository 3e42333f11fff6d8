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


def synthetic_lidar_scan(num_points: int, pcr, seed: int = 0,
                         n_beams: int = 32, n_sweeps: int = 10):
    """Ring-structured synthetic lidar: a beam-model scan instead of
    uniform random points. Real nuScenes scans (HDL-32E, 10 aggregated
    sweeps — reference LoadPointsFromMultiSweeps,
    datasets/pipelines/loading.py:87) are ego-centered rings: ground
    returns at range h/tan(|elev|) per beam, plus dense clusters on
    obstacles. Density near the ego is orders of magnitude higher than
    far field — the distribution the sparse-conv window slack and FPS
    numbers must hold on (uniform points fake ~uniform site density).

    Returns (points [num_points, 5] float32 (x, y, z, intensity,
    time_lag), mask [num_points] bool) — points outside the cloud range
    are masked, like the pipeline's PointsRangeFilter padding.
    """
    rng = np.random.RandomState(seed)
    pcr = np.asarray(pcr, np.float32)
    h_lidar = 1.84  # nuScenes LIDAR_TOP mount height
    elev = np.deg2rad(np.linspace(-30.67, 10.67, n_beams)).astype(np.float32)

    rays_per_sweep = max(num_points // max(n_sweeps, 1), n_beams)
    n_az = max(rays_per_sweep // n_beams, 8)

    # obstacles: car-sized cylinders clustered in the 50 m disc + a few
    # walls/buildings at medium range
    n_obs = 48
    obs_r = rng.uniform(5.0, 52.0, n_obs).astype(np.float32)
    obs_az = rng.uniform(-np.pi, np.pi, n_obs).astype(np.float32)
    obs_rad = rng.uniform(0.8, 2.4, n_obs).astype(np.float32)
    obs_h = rng.uniform(1.4, 3.2, n_obs).astype(np.float32)

    pts, lags = [], []
    ego_speed = 4.0  # m/s, sweeps displace backwards along x
    for s in range(n_sweeps):
        az = (np.linspace(-np.pi, np.pi, n_az, endpoint=False)
              + rng.uniform(0, 2 * np.pi / n_az)).astype(np.float32)
        A, E = np.meshgrid(az, elev)  # [n_beams, n_az]
        A, E = A.reshape(-1), E.reshape(-1)

        # ground return range (flat-world): h / tan(-elev); up-facing
        # beams see "sky" (= max range, masked out later)
        rng_ground = np.where(
            E < -0.008, h_lidar / np.tan(np.maximum(-E, 1e-3)), 1e4
        ).astype(np.float32)

        # obstacle hits: |az - obs_az| within angular radius and the
        # beam's height at obs range within the obstacle's extent
        dalt = np.abs(((A[:, None] - obs_az[None, :]) + np.pi)
                      % (2 * np.pi) - np.pi)
        ang_rad = obs_rad[None, :] / np.maximum(obs_r[None, :], 1.0)
        z_at = -h_lidar + obs_r[None, :] * np.tan(E)[:, None]
        hit = (dalt < ang_rad) & (z_at > -h_lidar) & (z_at < -h_lidar + obs_h)
        rng_obs = np.where(hit, obs_r[None, :], 1e4).min(axis=1)

        r = np.minimum(rng_ground, rng_obs)
        r = r * (1 + rng.normal(0, 0.01, r.shape).astype(np.float32))
        x = r * np.cos(E) * np.cos(A) - ego_speed * 0.05 * s
        y = r * np.cos(E) * np.sin(A)
        z = -h_lidar + r * np.sin(E) + rng.normal(0, 0.02, r.shape)
        inten = rng.rand(r.shape[0]).astype(np.float32)
        pts.append(np.stack([x, y, z, inten], -1).astype(np.float32))
        lags.append(np.full((r.shape[0], 1), 0.05 * s, np.float32))

    pts = np.concatenate(pts)
    pts = np.concatenate([pts, np.concatenate(lags)], -1)
    in_range = (
        (pts[:, 0] >= pcr[0]) & (pts[:, 0] < pcr[3])
        & (pts[:, 1] >= pcr[1]) & (pts[:, 1] < pcr[4])
        & (pts[:, 2] >= pcr[2]) & (pts[:, 2] < pcr[5])
    )
    pts = pts[in_range]
    rng.shuffle(pts)
    n = min(len(pts), num_points)
    out = np.zeros((num_points, 5), np.float32)
    out[:n] = pts[:n]
    mask = np.zeros((num_points,), bool)
    mask[:n] = True
    return out, mask


def synthetic_batch(cfg, B: int = 1, num_points: int = 200000,
                    num_gt: int = 64, seed: int = 0, training: bool = False,
                    lidar: str = "scan"):
    """lidar='scan' (default): beam-model ring scan (realistic density);
    'uniform': legacy uniform points over the cloud range."""
    rng = np.random.RandomState(seed)
    iH, iW = cfg.image_size
    N = 6
    pcr = np.asarray(cfg.point_cloud_range, np.float32)
    if lidar == "scan":
        pm = [synthetic_lidar_scan(num_points, pcr, seed=seed + b)
              for b in range(B)]
        points = np.stack([p for p, _ in pm])
        points_mask = np.stack([m for _, m in pm])
    else:
        points = np.concatenate([
            rng.uniform(pcr[:3], pcr[3:], (B, num_points, 3)),
            rng.rand(B, num_points, 2),
        ], -1).astype(np.float32)
        points_mask = np.ones((B, num_points), bool)
    batch = {
        "img": rng.rand(B, N, iH, iW, 3).astype(np.float32),
        "points": points,
        "points_mask": points_mask,
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


def add_pool_lut(cfg, batch):
    """Attach the calibration-LUT for the config's vtransform to an eval
    batch (ops/bev_pool_lut.py — host numpy precompute; one per
    calibration in deployment, computed in the data pipeline per
    sample otherwise). No-op for configs without an LSS vtransform."""
    vt = (cfg.model.get("encoders", {}).get("camera", {})
          or {}).get("vtransform") or {}
    if "xbound" not in vt:
        return batch
    from ..ops.bev_pool_lut import build_pool_lut_np
    from ..ops.grid import create_frustum, gen_dx_bx

    dx, bx, nx = gen_dx_bx(vt["xbound"], vt["ybound"], vt["zbound"])
    frustum = create_frustum(tuple(vt["image_size"]),
                             tuple(vt["feature_size"]), tuple(vt["dbound"]))
    lut = build_pool_lut_np(
        np.asarray(frustum), np.asarray(dx), np.asarray(bx), nx,
        np.asarray(batch["camera2lidar"]),
        np.asarray(batch["camera_intrinsics"])[..., :3, :3],
        np.asarray(batch["img_aug_matrix"]),
        np.asarray(batch["lidar_aug_matrix"]))
    batch = dict(batch)
    batch["pool_lut"] = {k: jnp.asarray(v) for k, v in lut.items()}
    return batch


def build_flagship(batch_size: int = 1, dtype=jnp.float32,
                   config_path: Optional[str] = None, training: bool = False,
                   num_points: int = 200000, pool_lut: bool = False):
    cfg = load_config(config_path or FLAGSHIP_CONFIG)
    model = build_model(cfg.model, dtype=dtype)
    batch = synthetic_batch(cfg, B=batch_size, num_points=num_points,
                            training=training)
    if pool_lut:
        # differentiable (custom VJP over the LUT's point->cell pairing)
        # — training rides it too and skips the in-graph geometry chain
        batch = add_pool_lut(cfg, batch)
    return cfg, model, batch

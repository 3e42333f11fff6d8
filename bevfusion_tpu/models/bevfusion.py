"""BEVFusion top-level fusion model (flax).

Behavioral reference: mmdet3d/models/fusion_models/bevfusion.py:25-388 —
per-sensor encoders (camera: backbone/neck/vtransform; lidar: voxelize/
sparse backbone) -> fuser -> shared BEV decoder (backbone + neck) ->
task heads. Training returns a loss dict with per-head loss_scale;
eval returns fixed-shape decoded predictions.

TPU-first: one jitted program for the whole batch — the reference's
per-sample voxelize loop (bevfusion.py:171-197) and eval-time `.cpu()`
copies disappear; inputs are padded/masked; sensors are fused in
(camera, lidar) order (the reference reverses the dict at eval and then
reverses the feature list back — same order either way).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.voxelize import Voxelization
from ..registry import (
    BACKBONES,
    FUSERS,
    FUSIONMODELS,
    HEADS,
    NECKS,
    VTRANSFORMS,
)

Dtype = Any

MAT_KEYS = (
    "camera2ego",
    "lidar2ego",
    "lidar2camera",
    "lidar2image",
    "camera_intrinsics",
    "camera2lidar",
    "img_aug_matrix",
    "lidar_aug_matrix",
    # optional precomputed pooling LUT (ops/bev_pool_lut.py): a dict of
    # arrays the vtransform consumes instead of in-graph geometry+sort
    "pool_lut",
)


@FUSIONMODELS.register()
class BEVFusion(nn.Module):
    encoders: Dict[str, Any]
    decoder: Dict[str, Any]
    heads: Dict[str, Any]
    fuser: Optional[Dict[str, Any]] = None
    loss_scale: Optional[Dict[str, float]] = None
    dtype: Dtype = jnp.float32

    def setup(self):
        enc = self.encoders or {}
        if enc.get("camera") is not None:
            cam = enc["camera"]
            self.camera_backbone = BACKBONES.build(cam["backbone"], dtype=self.dtype)
            self.camera_neck = NECKS.build(cam["neck"], dtype=self.dtype)
            self.camera_vtransform = VTRANSFORMS.build(cam["vtransform"], dtype=self.dtype)
        if enc.get("lidar") is not None:
            vox_cfg = dict(enc["lidar"]["voxelize"])
            self.lidar_voxelize = Voxelization(
                voxel_size=vox_cfg["voxel_size"],
                point_cloud_range=vox_cfg["point_cloud_range"],
                max_num_points=vox_cfg.get("max_num_points", 10),
                max_voxels=vox_cfg.get("max_voxels", 120000),
                reduce="mean" if enc["lidar"].get("voxelize_reduce", True) else None,
            )
            self.lidar_backbone = BACKBONES.build(enc["lidar"]["backbone"], dtype=self.dtype)
        if enc.get("radar") is not None:
            vox_cfg = dict(enc["radar"]["voxelize"])
            self.radar_voxelize = Voxelization(
                voxel_size=vox_cfg["voxel_size"],
                point_cloud_range=vox_cfg["point_cloud_range"],
                max_num_points=vox_cfg.get("max_num_points", 10),
                max_voxels=vox_cfg.get("max_voxels", 30000),
                reduce="mean" if enc["radar"].get("voxelize_reduce", True) else None,
            )
            self.radar_backbone = BACKBONES.build(enc["radar"]["backbone"], dtype=self.dtype)

        if self.fuser is not None:
            self.fuser_module = FUSERS.build(self.fuser, dtype=self.dtype)
        self.decoder_backbone = BACKBONES.build(self.decoder["backbone"], dtype=self.dtype)
        self.decoder_neck = NECKS.build(self.decoder["neck"], dtype=self.dtype)

        heads = {}
        for name, cfg in (self.heads or {}).items():
            if cfg is not None:
                heads[name] = HEADS.build(cfg, dtype=self.dtype)
        self.head_modules = heads

    # -- sensor branches ------------------------------------------------

    def extract_camera_features(self, batch, training):
        img = batch["img"]  # [B, N, H, W, 3]
        B, N, H, W, C = img.shape
        x = img.reshape(B * N, H, W, C).astype(self.dtype)
        feats = self.camera_backbone(x, training=training)
        feats = self.camera_neck(feats, training=training)
        if isinstance(feats, (list, tuple)):
            feats = feats[0]
        fH, fW, fC = feats.shape[1:]
        feats = feats.reshape(B, N, fH, fW, fC)
        mats = {k: batch[k] for k in MAT_KEYS if k in batch}
        vt_type = (self.encoders["camera"]["vtransform"] or {}).get("type", "")
        pts_key, msk_key = "points", "points_mask"
        if (self.encoders["camera"]["vtransform"] or {}).get("use_points") == "radar":
            pts_key, msk_key = "radar", "radar_mask"
        if vt_type in ("BEVDepth", "AwareBEVDepth", "DBEVDepth", "AwareDBEVDepth"):
            # depth-supervised vtransforms (reference bevfusion.py:96,316)
            return self.camera_vtransform(
                feats, batch.get(pts_key), batch.get(msk_key), mats,
                training=training, gt_depths=batch.get("depths"),
                depth_loss=training and batch.get("depths") is not None,
            )
        return self.camera_vtransform(
            feats, batch.get(pts_key), batch.get(msk_key), mats,
            training=training,
        )

    def extract_lidar_features(self, batch, training):
        feats, coords, sizes, mask = self.lidar_voxelize(
            batch["points"], batch["points_mask"], training=training
        )
        B = batch["points"].shape[0]
        M = feats.shape[0] // B
        coords_xyz = coords.reshape(B, M, 4)[..., 1:]
        mask = mask.reshape(B, M)
        if self.lidar_voxelize.reduce is None:
            # pillar path: per-voxel point tables + counts
            table = feats.reshape((B, M) + feats.shape[1:]).astype(self.dtype)
            return self.lidar_backbone(
                table, coords_xyz, mask, sizes.reshape(B, M), training=training
            )
        feats = feats.reshape(B, M, -1)
        return self.lidar_backbone(feats.astype(self.dtype), coords_xyz, mask,
                                   training=training)

    def extract_radar_features(self, batch, training):
        feats, coords, sizes, mask = self.radar_voxelize(
            batch["radar"], batch["radar_mask"], training=training
        )
        B = batch["radar"].shape[0]
        M = feats.shape[0] // B
        coords_xyz = coords.reshape(B, M, 4)[..., 1:]
        mask = mask.reshape(B, M)
        table = feats.reshape((B, M) + feats.shape[1:]).astype(self.dtype)
        return self.radar_backbone(
            table, coords_xyz, mask, sizes.reshape(B, M), training=training
        )

    # -- full forward ----------------------------------------------------

    def __call__(self, batch: Dict[str, jnp.ndarray], training: bool = False):
        enc = self.encoders or {}
        features = []
        aux_losses = {}
        if enc.get("camera") is not None:
            feat = self.extract_camera_features(batch, training)
            if isinstance(feat, tuple):  # BEVDepth-style (bev, depth_loss)
                feat, aux_losses["loss/depth"] = feat
            features.append(feat)
        if enc.get("lidar") is not None:
            features.append(self.extract_lidar_features(batch, training))
        if enc.get("radar") is not None:
            features.append(self.extract_radar_features(batch, training))

        if self.fuser is not None:
            x = self.fuser_module(features, training=training)
        else:
            assert len(features) == 1
            x = features[0]

        x = self.decoder_backbone(x, training=training)
        x = self.decoder_neck(x, training=training)
        if not isinstance(x, (list, tuple)):
            x = [x]

        scales = self.loss_scale or {}
        if training:
            outputs = {}
            for name, head in self.head_modules.items():
                scale = scales.get(name, 1.0)
                if name == "object":
                    preds = head(x[0], training=True)
                    losses = head.loss(
                        preds, batch["gt_boxes"], batch["gt_labels"], batch["gt_valid"]
                    )
                elif name == "map":
                    losses = head(x[0], batch["gt_masks_bev"], training=True)
                else:
                    raise ValueError(f"unsupported head: {name}")
                for k, v in losses.items():
                    if k == "matched_ious":
                        outputs[f"stats/{name}/{k}"] = v
                    else:
                        outputs[f"loss/{name}/{k}"] = v * scale
            outputs.update(aux_losses)  # e.g. BEVDepth depth loss
            return outputs

        outputs = {}
        for name, head in self.head_modules.items():
            if name == "object":
                preds = head(x[0], training=False)
                outputs["boxes"] = head.get_bboxes(preds)
            elif name == "map":
                outputs["masks_bev"] = head(x[0], training=False)
        return outputs

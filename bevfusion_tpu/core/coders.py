"""Box coders (jittable, static shapes).

Reference semantics:
- TransFusionBBoxCoder: mmdet3d/core/bbox/coders/transfusion_bbox_coder.py
  (encode to feature-grid units + log dims + sin/cos yaw; decode back;
  gravity<->bottom center shift).
- CenterPointBBoxCoder: mmdet3d/core/bbox/coders/centerpoint_bbox_coders.py
  (_topk over class heatmaps, per-pixel regression gather, decode).

The reference's eval-time boolean filtering (score threshold +
post_center_range) becomes a validity mask so shapes stay static.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from ..registry import BBOX_CODERS

__all__ = ["TransFusionBBoxCoder", "CenterPointBBoxCoder"]


@BBOX_CODERS.register()
class TransFusionBBoxCoder:
    def __init__(
        self,
        pc_range,
        out_size_factor,
        voxel_size,
        post_center_range=None,
        score_threshold=None,
        code_size=8,
    ):
        self.pc_range = tuple(pc_range)
        self.out_size_factor = out_size_factor
        self.voxel_size = tuple(voxel_size)
        self.post_center_range = tuple(post_center_range) if post_center_range else None
        self.score_threshold = score_threshold
        self.code_size = code_size

    def encode(self, boxes):
        """boxes [N, 7 or 9] (x,y,z,w,l,h,yaw,[vx,vy], bottom-center z) ->
        targets [N, code_size] (transfusion_bbox_coder.py:24-37)."""
        x = (boxes[:, 0] - self.pc_range[0]) / (self.out_size_factor * self.voxel_size[0])
        y = (boxes[:, 1] - self.pc_range[1]) / (self.out_size_factor * self.voxel_size[1])
        z = boxes[:, 2] + boxes[:, 5] * 0.5  # bottom -> gravity center
        dims = jnp.log(jnp.maximum(boxes[:, 3:6], 1e-8))
        yaw_s, yaw_c = jnp.sin(boxes[:, 6]), jnp.cos(boxes[:, 6])
        cols = [x, y, z, dims[:, 0], dims[:, 1], dims[:, 2], yaw_s, yaw_c]
        if self.code_size == 10:
            cols += [boxes[:, 7], boxes[:, 8]]
        return jnp.stack(cols, axis=-1)

    def decode(self, heatmap, rot, dim, center, height, vel, filter: bool = False):
        """heatmap [B, num_cls, P]; rot [B, 2, P]; dim [B, 3, P];
        center [B, 2, P] (feature-grid units); height [B, 1, P]; vel
        [B, 2, P] or None. Returns dict of arrays [B, P, ...] plus a
        validity mask when filter=True (coder decode :39-127)."""
        labels = jnp.argmax(heatmap, axis=1)
        scores = jnp.max(heatmap, axis=1)

        cx = center[:, 0] * self.out_size_factor * self.voxel_size[0] + self.pc_range[0]
        cy = center[:, 1] * self.out_size_factor * self.voxel_size[1] + self.pc_range[1]
        d = jnp.exp(dim)
        z = height[:, 0] - d[:, 2] * 0.5  # gravity -> bottom center
        yaw = jnp.arctan2(rot[:, 0], rot[:, 1])

        parts = [cx, cy, z, d[:, 0], d[:, 1], d[:, 2], yaw]
        if vel is not None:
            parts += [vel[:, 0], vel[:, 1]]
        boxes = jnp.stack(parts, axis=-1)  # [B, P, 7 or 9]

        out = {"bboxes": boxes, "scores": scores, "labels": labels}
        if filter:
            mask = jnp.ones_like(scores, bool)
            if self.score_threshold is not None:
                mask &= scores > self.score_threshold
            if self.post_center_range is not None:
                pcr = jnp.asarray(self.post_center_range)
                centers = boxes[..., :3]
                mask &= jnp.all(centers >= pcr[:3], axis=-1)
                mask &= jnp.all(centers <= pcr[3:], axis=-1)
            out["mask"] = mask
        return out


@BBOX_CODERS.register()
class CenterPointBBoxCoder:
    def __init__(
        self,
        pc_range,
        out_size_factor,
        voxel_size,
        post_center_range=None,
        max_num=100,
        score_threshold=None,
        code_size=9,
    ):
        self.pc_range = tuple(pc_range)
        self.out_size_factor = out_size_factor
        self.voxel_size = tuple(voxel_size)
        self.post_center_range = tuple(post_center_range) if post_center_range else None
        self.max_num = max_num
        self.score_threshold = score_threshold
        self.code_size = code_size

    def _topk(self, scores):
        """scores [B, num_cls, H, W] -> (score, flat_idx, cls, ys, xs),
        all [B, K]. Matches centerpoint_bbox_coders.py:62-101 including
        the x = idx // W, y = idx %% W convention."""
        K = self.max_num
        B, C, H, W = scores.shape
        s_flat = scores.reshape(B, C, H * W)
        top_s, top_i = jax.lax.top_k(s_flat, K)  # per class
        xs = (top_i // W).astype(jnp.float32)
        ys = (top_i % W).astype(jnp.float32)
        top_s2, top_i2 = jax.lax.top_k(top_s.reshape(B, C * K), K)
        cls = (top_i2 // K).astype(jnp.int32)
        gather = lambda a: jnp.take_along_axis(a.reshape(B, C * K), top_i2, axis=1)
        return top_s2, gather(top_i.astype(jnp.int32)), cls, gather(ys), gather(xs)

    def decode(self, heat, rot_sine, rot_cosine, hei, dim, vel, reg=None):
        """heat [B, C, H, W]; per-pixel maps [B, c, H, W]. Returns dict of
        [B, K, ...] + validity mask (decode :121-225)."""
        B, C, H, W = heat.shape
        scores, inds, clses, ys, xs = self._topk(heat)

        def gather_map(m):
            # m [B, c, H, W] -> [B, K, c]
            mc = m.reshape(B, m.shape[1], H * W)
            return jnp.take_along_axis(
                mc, inds[:, None, :].astype(jnp.int32), axis=2
            ).transpose(0, 2, 1)

        if reg is not None:
            r = gather_map(reg)
            xs = xs[..., None] + r[..., 0:1]
            ys = ys[..., None] + r[..., 1:2]
        else:
            xs = xs[..., None] + 0.5
            ys = ys[..., None] + 0.5

        rs = gather_map(rot_sine)
        rc = gather_map(rot_cosine)
        yaw = jnp.arctan2(rs, rc)
        z = gather_map(hei)
        d = gather_map(dim)

        xs = xs * self.out_size_factor * self.voxel_size[0] + self.pc_range[0]
        ys = ys * self.out_size_factor * self.voxel_size[1] + self.pc_range[1]

        if vel is None:
            boxes = jnp.concatenate([xs, ys, z, d, yaw], axis=-1)
        else:
            v = gather_map(vel)
            boxes = jnp.concatenate([xs, ys, z, d, yaw, v], axis=-1)

        mask = jnp.ones_like(scores, bool)
        if self.score_threshold is not None:
            mask &= scores > self.score_threshold
        if self.post_center_range is not None:
            pcr = jnp.asarray(self.post_center_range)
            mask &= jnp.all(boxes[..., :3] >= pcr[:3], axis=-1)
            mask &= jnp.all(boxes[..., :3] <= pcr[3:], axis=-1)
        return {"bboxes": boxes, "scores": scores, "labels": clses, "mask": mask}

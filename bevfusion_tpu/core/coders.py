"""Box coders (jittable, static shapes).

Reference semantics:
- TransFusionBBoxCoder: mmdet3d/core/bbox/coders/transfusion_bbox_coder.py
  (encode to feature-grid units + log dims + sin/cos yaw; decode back;
  gravity<->bottom center shift).
- CenterPointBBoxCoder: mmdet3d/core/bbox/coders/centerpoint_bbox_coders.py
  (_topk over class heatmaps, per-pixel regression gather, decode).
- DeltaXYZWLHRBBoxCoder: .../delta_xyzwhlr_bbox_coder.py (SECOND-style
  anchor deltas, diagonal-normalized xy, log dims).
- PartialBinBasedBBoxCoder / AnchorFreeBBoxCoder / GroupFree3DBBoxCoder:
  .../partial_bin_based_bbox_coder.py, anchor_free_bbox_coder.py,
  groupfree3d_bbox_coder.py (VoteNet-family bin direction coders).
- NMSFreeCoder: .../nms_free_coder.py + core/bbox/util.py
  normalize/denormalize (DETR3D-style flattened-class topk decode).

The reference's eval-time boolean filtering (score threshold +
post_center_range) becomes a validity mask so shapes stay static.
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from ..registry import BBOX_CODERS

__all__ = [
    "TransFusionBBoxCoder", "CenterPointBBoxCoder", "DeltaXYZWLHRBBoxCoder",
    "PartialBinBasedBBoxCoder", "AnchorFreeBBoxCoder", "GroupFree3DBBoxCoder",
    "NMSFreeCoder", "normalize_bbox", "denormalize_bbox",
]


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


@BBOX_CODERS.register()
class DeltaXYZWLHRBBoxCoder:
    """SECOND-style anchor-delta coder
    (delta_xyzwhlr_bbox_coder.py:20-88): xy normalized by the anchor BEV
    diagonal, z by anchor height (on gravity centers), log-ratio dims,
    additive yaw; extra dims (velocity) are plain residuals."""

    def __init__(self, code_size: int = 7):
        self.code_size = code_size

    @staticmethod
    def encode(src_boxes, dst_boxes):
        a, g = jnp.asarray(src_boxes), jnp.asarray(dst_boxes)
        za = a[..., 2:3] + a[..., 5:6] * 0.5
        zg = g[..., 2:3] + g[..., 5:6] * 0.5
        diag = jnp.sqrt(a[..., 3:4] ** 2 + a[..., 4:5] ** 2)
        xt = (g[..., 0:1] - a[..., 0:1]) / diag
        yt = (g[..., 1:2] - a[..., 1:2]) / diag
        zt = (zg - za) / a[..., 5:6]
        wlh = jnp.log(g[..., 3:6] / a[..., 3:6])
        rt = g[..., 6:7] - a[..., 6:7]
        extra = g[..., 7:] - a[..., 7:]
        return jnp.concatenate([xt, yt, zt, wlh, rt, extra], axis=-1)

    @staticmethod
    def decode(anchors, deltas):
        a, t = jnp.asarray(anchors), jnp.asarray(deltas)
        za = a[..., 2:3] + a[..., 5:6] * 0.5
        diag = jnp.sqrt(a[..., 3:4] ** 2 + a[..., 4:5] ** 2)
        xg = t[..., 0:1] * diag + a[..., 0:1]
        yg = t[..., 1:2] * diag + a[..., 1:2]
        zg = t[..., 2:3] * a[..., 5:6] + za
        wlh = jnp.exp(t[..., 3:6]) * a[..., 3:6]
        rg = t[..., 6:7] + a[..., 6:7]
        zg = zg - wlh[..., 2:3] * 0.5
        extra = t[..., 7:] + a[..., 7:]
        return jnp.concatenate([xg, yg, zg, wlh, rg, extra], axis=-1)


@BBOX_CODERS.register()
class PartialBinBasedBBoxCoder:
    """VoteNet partial-bin coder (partial_bin_based_bbox_coder.py:9-232):
    direction encoded as (bin class, residual), size as (class, residual
    vs per-class mean size). Jittable decode/split on [B, P, ...] arrays."""

    def __init__(self, num_dir_bins, num_sizes, mean_sizes, with_rot=True):
        assert len(mean_sizes) == num_sizes
        self.num_dir_bins = int(num_dir_bins)
        self.num_sizes = int(num_sizes)
        self.mean_sizes = [list(map(float, m)) for m in mean_sizes]
        self.with_rot = with_rot

    # --- angle bin helpers (reference :199-243) ---
    def angle2class(self, angle):
        two_pi = 2 * math.pi
        per = two_pi / self.num_dir_bins
        shifted = (angle % two_pi + per / 2) % two_pi
        cls = jnp.floor(shifted / per)
        res = shifted - (cls * per + per / 2)
        return cls.astype(jnp.int32), res

    def class2angle(self, angle_cls, angle_res, limit_period=True):
        per = 2 * math.pi / self.num_dir_bins
        angle = angle_cls.astype(jnp.float32) * per + angle_res
        if limit_period:
            angle = jnp.where(angle > math.pi, angle - 2 * math.pi, angle)
        return angle

    def encode(self, gt_boxes, gt_labels):
        """gt_boxes [N, 7] (bottom-center) -> center/size-class/size-res/
        dir-class/dir-res targets (reference :27-55)."""
        g = jnp.asarray(gt_boxes)
        center = g[:, :3].at[:, 2].add(g[:, 5] * 0.5)  # gravity center
        size_cls = jnp.asarray(gt_labels, jnp.int32)
        size_res = g[:, 3:6] - jnp.asarray(self.mean_sizes)[size_cls]
        if self.with_rot:
            dir_cls, dir_res = self.angle2class(g[:, 6])
        else:
            dir_cls = jnp.zeros_like(size_cls)
            dir_res = jnp.zeros((g.shape[0],), g.dtype)
        return center, size_cls, size_res, dir_cls, dir_res

    def decode(self, bbox_out: Dict[str, Any], suffix: str = ""):
        """center [B,P,3] (gravity), dir_class [B,P,Nd] logits, dir_res
        [B,P,Nd], size_class [B,P,Ns] logits, size_res [B,P,Ns,3] ->
        [B, P, 7] (reference :57-96)."""
        center = bbox_out["center" + suffix]
        B, P = center.shape[:2]
        if self.with_rot:
            dir_cls = jnp.argmax(bbox_out["dir_class" + suffix], -1)
            dir_res = jnp.take_along_axis(
                bbox_out["dir_res" + suffix], dir_cls[..., None], axis=2)[..., 0]
            dir_angle = self.class2angle(dir_cls, dir_res)[..., None]
        else:
            dir_angle = jnp.zeros((B, P, 1), center.dtype)
        size_cls = jnp.argmax(bbox_out["size_class" + suffix], -1)
        size_res = jnp.take_along_axis(
            bbox_out["size_res" + suffix],
            size_cls[..., None, None].repeat(3, axis=-1), axis=2)[:, :, 0]
        size = jnp.asarray(self.mean_sizes)[size_cls] + size_res
        return jnp.concatenate([center, size, dir_angle], axis=-1)

    def split_pred(self, cls_preds, reg_preds, base_xyz):
        """cls_preds [B, C, P], reg_preds [B, R, P], base_xyz [B, P, 3]
        -> dict (reference :139-197)."""
        out: Dict[str, Any] = {}
        reg = jnp.swapaxes(reg_preds, 1, 2)
        cls = jnp.swapaxes(cls_preds, 1, 2)
        s = 0
        out["center"] = base_xyz + reg[..., s:s + 3]; s += 3
        out["dir_class"] = reg[..., s:s + self.num_dir_bins]; s += self.num_dir_bins
        dir_res_norm = reg[..., s:s + self.num_dir_bins]; s += self.num_dir_bins
        out["dir_res_norm"] = dir_res_norm
        out["dir_res"] = dir_res_norm * (math.pi / self.num_dir_bins)
        out["size_class"] = reg[..., s:s + self.num_sizes]; s += self.num_sizes
        B, P = reg.shape[:2]
        size_res_norm = reg[..., s:s + self.num_sizes * 3].reshape(
            B, P, self.num_sizes, 3)
        out["size_res_norm"] = size_res_norm
        out["size_res"] = size_res_norm * jnp.asarray(self.mean_sizes)[None, None]
        out["obj_scores"] = cls[..., :2]
        out["sem_scores"] = cls[..., 2:]
        return out


@BBOX_CODERS.register()
class AnchorFreeBBoxCoder(PartialBinBasedBBoxCoder):
    """Anchor-free variant (anchor_free_bbox_coder.py:9-124): size is a
    direct half-extent regression; direction residual normalized by the
    full bin width."""

    def __init__(self, num_dir_bins, with_rot=True):
        super().__init__(num_dir_bins, 0, [], with_rot=with_rot)

    def encode(self, gt_boxes, gt_labels):
        g = jnp.asarray(gt_boxes)
        center = g[:, :3].at[:, 2].add(g[:, 5] * 0.5)
        size_res = g[:, 3:6] / 2
        if self.with_rot:
            dir_cls, dir_res = self.angle2class(g[:, 6])
            dir_res = dir_res / (2 * math.pi / self.num_dir_bins)
        else:
            dir_cls = jnp.zeros((g.shape[0],), jnp.int32)
            dir_res = jnp.zeros((g.shape[0],), g.dtype)
        return center, size_res, dir_cls, dir_res

    def decode(self, bbox_out: Dict[str, Any]):
        center = bbox_out["center"]
        B, P = center.shape[:2]
        if self.with_rot:
            dir_cls = jnp.argmax(bbox_out["dir_class"], -1)
            dir_res = jnp.take_along_axis(
                bbox_out["dir_res"], dir_cls[..., None], axis=2)[..., 0]
            dir_angle = self.class2angle(dir_cls, dir_res)[..., None]
        else:
            dir_angle = jnp.zeros((B, P, 1), center.dtype)
        size = jnp.maximum(bbox_out["size"] * 2, 0.1)
        return jnp.concatenate([center, size, dir_angle], axis=-1)

    def split_pred(self, cls_preds, reg_preds, base_xyz):
        out: Dict[str, Any] = {}
        out["obj_scores"] = cls_preds
        reg = jnp.swapaxes(reg_preds, 1, 2)
        s = 0
        out["center_offset"] = reg[..., s:s + 3]
        out["center"] = jax.lax.stop_gradient(base_xyz) + reg[..., s:s + 3]; s += 3
        out["size"] = reg[..., s:s + 3]; s += 3
        out["dir_class"] = reg[..., s:s + self.num_dir_bins]; s += self.num_dir_bins
        dir_res_norm = reg[..., s:s + self.num_dir_bins]
        out["dir_res_norm"] = dir_res_norm
        out["dir_res"] = dir_res_norm * (2 * math.pi / self.num_dir_bins)
        return out


@BBOX_CODERS.register()
class GroupFree3DBBoxCoder(PartialBinBasedBBoxCoder):
    """GroupFree3D variant (groupfree3d_bbox_coder.py:9-174): optional
    class-agnostic size head; prefixed prediction keys."""

    def __init__(self, num_dir_bins, num_sizes, mean_sizes, with_rot=True,
                 size_cls_agnostic=True):
        super().__init__(num_dir_bins, num_sizes, mean_sizes, with_rot=with_rot)
        self.size_cls_agnostic = size_cls_agnostic

    def encode(self, gt_boxes, gt_labels):
        g = jnp.asarray(gt_boxes)
        center = g[:, :3].at[:, 2].add(g[:, 5] * 0.5)
        size_target = g[:, 3:6]
        size_cls = jnp.asarray(gt_labels, jnp.int32)
        size_res = g[:, 3:6] - jnp.asarray(self.mean_sizes)[size_cls]
        if self.with_rot:
            dir_cls, dir_res = self.angle2class(g[:, 6])
        else:
            dir_cls = jnp.zeros_like(size_cls)
            dir_res = jnp.zeros((g.shape[0],), g.dtype)
        return center, size_target, size_cls, size_res, dir_cls, dir_res

    def decode(self, bbox_out: Dict[str, Any], prefix: str = ""):
        center = bbox_out[f"{prefix}center"]
        B, P = center.shape[:2]
        if self.with_rot:
            dir_cls = jnp.argmax(bbox_out[f"{prefix}dir_class"], -1)
            dir_res = jnp.take_along_axis(
                bbox_out[f"{prefix}dir_res"], dir_cls[..., None], axis=2)[..., 0]
            dir_angle = self.class2angle(dir_cls, dir_res)[..., None]
        else:
            dir_angle = jnp.zeros((B, P, 1), center.dtype)
        if self.size_cls_agnostic:
            size = bbox_out[f"{prefix}size"].reshape(B, P, 3)
        else:
            size_cls = jnp.argmax(bbox_out[f"{prefix}size_class"], -1)
            size_res = jnp.take_along_axis(
                bbox_out[f"{prefix}size_res"],
                size_cls[..., None, None].repeat(3, axis=-1), axis=2)[:, :, 0]
            size = jnp.asarray(self.mean_sizes)[size_cls] + size_res
        return jnp.concatenate([center, size, dir_angle], axis=-1)

    def split_pred(self, cls_preds, reg_preds, base_xyz, prefix: str = ""):
        out: Dict[str, Any] = {}
        reg = jnp.swapaxes(reg_preds, 1, 2)
        cls = jnp.swapaxes(cls_preds, 1, 2)
        s = 0
        out[f"{prefix}center_residual"] = reg[..., s:s + 3]
        out[f"{prefix}center"] = base_xyz + reg[..., s:s + 3]; s += 3
        out[f"{prefix}dir_class"] = reg[..., s:s + self.num_dir_bins]
        s += self.num_dir_bins
        dir_res_norm = reg[..., s:s + self.num_dir_bins]; s += self.num_dir_bins
        out[f"{prefix}dir_res_norm"] = dir_res_norm
        out[f"{prefix}dir_res"] = dir_res_norm * (math.pi / self.num_dir_bins)
        if self.size_cls_agnostic:
            out[f"{prefix}size"] = reg[..., s:s + 3]
        else:
            out[f"{prefix}size_class"] = reg[..., s:s + self.num_sizes]
            s += self.num_sizes
            B, P = reg.shape[:2]
            size_res_norm = reg[..., s:s + self.num_sizes * 3].reshape(
                B, P, self.num_sizes, 3)
            out[f"{prefix}size_res_norm"] = size_res_norm
            out[f"{prefix}size_res"] = (
                size_res_norm * jnp.asarray(self.mean_sizes)[None, None])
        out[f"{prefix}obj_scores"] = cls[..., :1]
        out[f"{prefix}sem_scores"] = cls[..., 1:]
        return out


def normalize_bbox(bboxes, pc_range=None):
    """[..., 7 or 9] (x,y,z,w,l,h,yaw,vx,vy) -> (cx,cy,logw,logl,cz,logh,
    sin,cos,vx,vy) (core/bbox/util.py:normalize_bbox)."""
    b = jnp.asarray(bboxes)
    parts = [b[..., 0:2], jnp.log(b[..., 3:5]), b[..., 2:3],
             jnp.log(b[..., 5:6]), jnp.sin(b[..., 6:7]), jnp.cos(b[..., 6:7])]
    if b.shape[-1] > 7:
        parts.append(b[..., 7:9])
    return jnp.concatenate(parts, axis=-1)


def denormalize_bbox(normalized, pc_range=None):
    """Inverse of normalize_bbox (core/bbox/util.py:denormalize_bbox)."""
    n = jnp.asarray(normalized)
    rot = jnp.arctan2(n[..., 6:7], n[..., 7:8])
    parts = [n[..., 0:2], n[..., 4:5], jnp.exp(n[..., 2:4]),
             jnp.exp(n[..., 5:6]), rot]
    if n.shape[-1] > 8:
        parts.append(n[..., 8:10])
    return jnp.concatenate(parts, axis=-1)


@BBOX_CODERS.register()
class NMSFreeCoder:
    """DETR3D-style NMS-free decode (nms_free_coder.py:9-118): sigmoid
    scores flattened over (query, class), top-max_num selection, bbox
    denormalization; filtering becomes a validity mask."""

    def __init__(self, pc_range, voxel_size=None, post_center_range=None,
                 max_num=100, score_threshold=None, num_classes=10):
        self.pc_range = tuple(pc_range)
        self.post_center_range = (
            tuple(post_center_range) if post_center_range else None)
        self.max_num = max_num
        self.score_threshold = score_threshold
        self.num_classes = num_classes

    def encode(self):  # parity with reference (no-op)
        pass

    def decode_single(self, cls_scores, bbox_preds):
        """cls_scores [Q, num_classes] logits; bbox_preds [Q, 10]
        normalized -> dict of top-max_num boxes + mask."""
        scores = jax.nn.sigmoid(cls_scores).reshape(-1)
        top_s, top_i = jax.lax.top_k(scores, self.max_num)
        labels = top_i % self.num_classes
        boxes = denormalize_bbox(bbox_preds[top_i // self.num_classes])
        mask = jnp.ones_like(top_s, bool)
        if self.score_threshold is not None:
            mask &= top_s > self.score_threshold
        if self.post_center_range is not None:
            pcr = jnp.asarray(self.post_center_range)
            mask &= jnp.all(boxes[..., :3] >= pcr[:3], axis=-1)
            mask &= jnp.all(boxes[..., :3] <= pcr[3:], axis=-1)
        return {"bboxes": boxes, "scores": top_s, "labels": labels,
                "mask": mask}

    def decode(self, preds_dicts):
        cls = preds_dicts["all_cls_scores"][-1]
        reg = preds_dicts["all_bbox_preds"][-1]
        return [self.decode_single(cls[i], reg[i])
                for i in range(cls.shape[0])]

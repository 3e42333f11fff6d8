"""CenterHead (CenterPoint) multi-task detection head (flax, static shapes).

Behavioral reference: mmdet3d/models/heads/bbox/centerpoint.py —
shared 3x3 conv -> per-task SeparateHead branches
(heatmap/reg/height/dim/rot/vel, :19-127,248-354); training targets are
per-task gaussian heatmaps + regression targets gathered at integer
centers (:432-583); decode via CenterPointBBoxCoder topk (:636-757) with
per-task circle-NMS or rotated NMS + per-class nms_scale (:759-884).

TPU-first: GTs arrive padded [B, G, 9] + mask; target "slots" are the
padded GT indices themselves (the reference packs per-task lists — the
masked L1 is identical); NMS is the in-graph mask loop from ops/nms.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.coders import CenterPointBBoxCoder
from ...ops.deform_conv import DeformConv2dPack
from ...ops.gaussian import draw_heatmap_gaussians, gaussian_radius
from ...ops.nms import circle_nms_mask, nms_bev_mask
from ...registry import HEADS
from ..layers import Conv, ConvBNAct
from ..losses import clip_sigmoid, gaussian_focal_loss, l1_loss

Dtype = Any


class SeparateHead(nn.Module):
    """Per-branch conv stacks (centerpoint.py:19-127): each branch is
    (num_conv - 1) x [3x3 conv + BN + ReLU] + final 3x3 conv (bias);
    heatmap branch final bias init -2.19."""

    heads: Dict[str, Tuple[int, int]]
    head_conv: int = 64
    final_kernel: int = 3
    init_bias: float = -2.19
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        out = {}
        fk = self.final_kernel
        for name, (classes, num_conv) in self.heads.items():
            y = x
            for i in range(num_conv - 1):
                y = ConvBNAct(self.head_conv, fk, 1, fk // 2, norm="BN",
                              act="ReLU", dtype=self.dtype,
                              name=f"{name}_conv{i}")(y, training)
            bias_init = (
                nn.initializers.constant(self.init_bias)
                if name == "heatmap" else nn.initializers.zeros
            )
            y = nn.Conv(classes, (fk, fk), padding=((fk // 2,) * 2,) * 2,
                        use_bias=True, bias_init=bias_init, dtype=self.dtype,
                        name=f"{name}_out")(y)
            out[name] = y  # [B, H, W, classes]
        return out


class DCNSeparateHead(nn.Module):
    """DCNSeparateHead (centerpoint.py:130-246): two DeformConv2dPack
    feature adapters split the shared features into a classification
    path (-> 3x3 ConvBNReLU + final heatmap conv, bias init -2.19) and
    a regression path (-> plain SeparateHead without the heatmap
    branch)."""

    heads: Dict[str, Tuple[int, int]]
    num_cls: int
    head_conv: int = 64
    final_kernel: int = 3
    init_bias: float = -2.19
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        cin = x.shape[-1]
        center_feat = DeformConv2dPack(cin, 3, dtype=self.dtype,
                                       name="feature_adapt_cls")(x)
        reg_feat = DeformConv2dPack(cin, 3, dtype=self.dtype,
                                    name="feature_adapt_reg")(x)
        y = ConvBNAct(self.head_conv, 3, 1, 1, norm="BN", act="ReLU",
                      dtype=self.dtype, name="cls_head0")(center_feat,
                                                          training)
        cls_score = nn.Conv(
            self.num_cls, (3, 3), padding=((1, 1), (1, 1)), use_bias=True,
            bias_init=nn.initializers.constant(self.init_bias),
            dtype=self.dtype, name="cls_head1")(y)
        reg_heads = {k: v for k, v in self.heads.items() if k != "heatmap"}
        ret = SeparateHead(reg_heads, head_conv=self.head_conv,
                           final_kernel=self.final_kernel, dtype=self.dtype,
                           name="task_head")(reg_feat, training)
        ret["heatmap"] = cls_score
        return ret


@HEADS.register()
class CenterHead(nn.Module):
    in_channels: int = 128
    tasks: Sequence[Sequence[str]] = ()
    train_cfg: Optional[dict] = None
    test_cfg: Optional[dict] = None
    bbox_coder: Optional[dict] = None
    common_heads: Optional[dict] = None
    loss_cls: Optional[dict] = None
    loss_bbox: Optional[dict] = None
    separate_head: Optional[dict] = None
    share_conv_channel: int = 64
    num_heatmap_convs: int = 2
    norm_bbox: bool = True
    dtype: Dtype = jnp.float32

    @property
    def class_names(self):
        return [list(t) for t in self.tasks]

    @property
    def num_classes(self):
        return [len(t) for t in self.tasks]

    def _coder(self) -> CenterPointBBoxCoder:
        cfg = dict(self.bbox_coder)
        cfg.pop("type", None)
        cfg["pc_range"] = cfg["pc_range"][:2]
        return CenterPointBBoxCoder(**cfg)

    @nn.compact
    def __call__(self, feats, training: bool = False):
        """feats [B, H, W, C] -> list of per-task dicts of NHWC maps."""
        x = ConvBNAct(self.share_conv_channel, 3, 1, 1, norm="BN", act="ReLU",
                      dtype=self.dtype, name="shared_conv")(feats, training)
        sep = dict(self.separate_head or {})
        sep_type = sep.pop("type", None)
        sep_kw = {k: v for k, v in sep.items()
                  if k in ("head_conv", "final_kernel", "init_bias")}
        outs = []
        for t, names in enumerate(self.tasks):
            heads = {k: tuple(v) for k, v in dict(self.common_heads or {}).items()}
            heads["heatmap"] = (len(names), self.num_heatmap_convs)
            if sep_type == "DCNSeparateHead":
                outs.append(DCNSeparateHead(
                    heads, num_cls=len(names), dtype=self.dtype,
                    name=f"task{t}", **sep_kw)(x, training))
            else:
                outs.append(SeparateHead(heads, dtype=self.dtype,
                                         name=f"task{t}", **sep_kw)(x, training))
        return outs

    # ------------------------------------------------------------------

    def _task_of_label(self):
        """label -> (task_id, class-within-task) lookup tables."""
        t_of, c_of, flag = [], [], 0
        for t, names in enumerate(self.tasks):
            for c in range(len(names)):
                t_of.append(t)
                c_of.append(c)
            flag += len(names)
        return np.asarray(t_of, np.int32), np.asarray(c_of, np.int32)

    def loss(self, preds: List[Dict[str, jnp.ndarray]], gt_boxes, gt_labels, gt_valid):
        """gt_boxes [B, G, 9] bottom-center (x,y,z,w,l,h,yaw,vx,vy).

        Matches CenterHead.loss (centerpoint.py:585-634): per-task
        GaussianFocal heatmap loss + masked L1 on gathered regression."""
        cfg = dict(self.train_cfg)
        osf = cfg["out_size_factor"]
        vx, vy = cfg["voxel_size"][0], cfg["voxel_size"][1]
        pcr = cfg["point_cloud_range"]
        fX = cfg["grid_size"][0] // osf
        fY = cfg["grid_size"][1] // osf
        code_weights = jnp.asarray(cfg["code_weights"], jnp.float32)
        t_of, c_of = self._task_of_label()
        t_of, c_of = jnp.asarray(t_of), jnp.asarray(c_of)

        # gravity-center boxes for targets (centerpoint.py:448-450)
        gz = gt_boxes[..., 2] + gt_boxes[..., 5] * 0.5
        coor_x = (gt_boxes[..., 0] - pcr[0]) / vx / osf
        coor_y = (gt_boxes[..., 1] - pcr[1]) / vy / osf
        ix = coor_x.astype(jnp.int32)
        iy = coor_y.astype(jnp.int32)
        in_range = (ix >= 0) & (ix < fX) & (iy >= 0) & (iy < fY)
        wf = gt_boxes[..., 3] / vx / osf
        lf = gt_boxes[..., 4] / vy / osf
        radius = jnp.maximum(cfg["min_radius"],
                             gaussian_radius((lf, wf), cfg["gaussian_overlap"]).astype(jnp.int32))
        ok = gt_valid & in_range & (wf > 0) & (lf > 0)
        ind = ix * fY + iy  # centerpoint.py:560
        dims = gt_boxes[..., 3:6]
        if self.norm_bbox:
            dims = jnp.log(jnp.maximum(dims, 1e-8))
        anno = jnp.concatenate([
            (coor_x - ix)[..., None], (coor_y - iy)[..., None], gz[..., None],
            dims, jnp.sin(gt_boxes[..., 6:7]), jnp.cos(gt_boxes[..., 6:7]),
            gt_boxes[..., 7:9],
        ], axis=-1)  # [B, G, 10]

        gt_task = t_of[jnp.clip(gt_labels, 0, len(t_of) - 1)]
        gt_cls_in_task = c_of[jnp.clip(gt_labels, 0, len(c_of) - 1)]

        losses = {}
        for t, pred in enumerate(preds):
            m_t = ok & (gt_task == t)
            ncls = len(self.tasks[t])

            def hm_single(cx, cy, rad, cls_t, m):
                centers = jnp.stack([cy, cx], axis=-1)  # (col, row) of [X, Y] map
                return draw_heatmap_gaussians(
                    jnp.zeros((ncls, fX, fY), jnp.float32), centers, rad, cls_t, m
                )

            hm = jax.vmap(hm_single)(ix, iy, radius, gt_cls_in_task, m_t)
            num_pos = jnp.maximum(jnp.sum(hm == 1.0), 1.0)
            pred_hm = clip_sigmoid(pred["heatmap"].transpose(0, 3, 1, 2))
            losses[f"heatmap/task{t}"] = gaussian_focal_loss(pred_hm, hm, avg_factor=num_pos)

            maps = jnp.concatenate(
                [pred["reg"], pred["height"], pred["dim"], pred["rot"], pred["vel"]],
                axis=-1,
            )  # [B, H, W, 10]
            B = maps.shape[0]
            flat = maps.reshape(B, fX * fY, maps.shape[-1])
            gathered = jnp.take_along_axis(
                flat, jnp.clip(ind, 0, fX * fY - 1)[..., None], axis=1
            )  # [B, G, 10]
            w = m_t[..., None].astype(jnp.float32) * code_weights[None, None, :]
            num = jnp.sum(m_t.astype(jnp.float32))
            losses[f"bbox/task{t}"] = l1_loss(gathered, anno, weight=w,
                                              avg_factor=num + 1e-4)
        return losses

    # ------------------------------------------------------------------

    def get_bboxes(self, preds: List[Dict[str, jnp.ndarray]]):
        """Decode + per-task NMS; returns merged fixed-shape
        (bboxes [B, N, 9] bottom-center, scores, labels, mask)."""
        coder = self._coder()
        tcfg = dict(self.test_cfg)
        nms_types = tcfg.get("nms_type")
        if not isinstance(nms_types, (list, tuple)):
            nms_types = [nms_types] * len(self.tasks)
        nms_scales = tcfg.get("nms_scale")
        if nms_scales is None:
            nms_scales = [[1.0] * len(t) for t in self.tasks]

        outs = []
        flag = 0
        for t, pred in enumerate(preds):
            nchw = lambda a: a.transpose(0, 3, 1, 2).astype(jnp.float32)
            heat = jax.nn.sigmoid(nchw(pred["heatmap"]))
            dim = nchw(pred["dim"])
            if self.norm_bbox:
                dim = jnp.exp(dim)
            rot = nchw(pred["rot"])
            dec = coder.decode(
                heat, rot[:, 0:1], rot[:, 1:2], nchw(pred["height"]), dim,
                nchw(pred["vel"]), reg=nchw(pred["reg"]),
            )
            boxes, scores, labels, mask = (
                dec["bboxes"], dec["scores"], dec["labels"], dec["mask"]
            )

            if nms_types[t] == "circle":
                # reference circle_nms compares min_radius against the
                # SQUARED center distance (box3d_nms.py:216-218,
                # centerpoint.py:711-713) — pass it through unsquared.
                r = tcfg["min_radius"][t]
                keep = jax.vmap(
                    lambda b, s, m: circle_nms_mask(b[:, :2], s, m, r)
                )(boxes, scores, mask)
                # post_max_size: keep only top-k among survivors
                pm = tcfg.get("post_max_size", 83)
                rank = jnp.argsort(jnp.argsort(
                    -jnp.where(keep, scores, -jnp.inf), axis=-1), axis=-1)
                mask = keep & (rank < pm)
            else:
                scales = jnp.asarray(nms_scales[t], jnp.float32)
                sc = scales[jnp.clip(labels, 0, len(nms_scales[t]) - 1)]
                bev = jnp.stack([
                    boxes[..., 0], boxes[..., 1],
                    boxes[..., 3] * sc, boxes[..., 4] * sc, boxes[..., 6],
                ], axis=-1)
                thr_mask = mask & (scores >= tcfg.get("score_threshold", 0.0))
                keep = jax.vmap(
                    lambda b, s, m: nms_bev_mask(b, s, m, tcfg["nms_thr"])
                )(bev, scores, thr_mask)
                pm = tcfg.get("post_max_size", 83)
                rank = jnp.argsort(jnp.argsort(
                    -jnp.where(keep, scores, -jnp.inf), axis=-1), axis=-1)
                mask = keep & (rank < pm)

            outs.append((boxes, scores, labels + flag, mask))
            flag += len(self.tasks[t])

        boxes = jnp.concatenate([o[0] for o in outs], axis=1)
        # gravity -> bottom center at merge (centerpoint.py:745-747)
        boxes = boxes.at[..., 2].add(-boxes[..., 5] * 0.5)
        return {
            "bboxes": boxes,
            "scores": jnp.concatenate([o[1] for o in outs], axis=1),
            "labels": jnp.concatenate([o[2] for o in outs], axis=1),
            "mask": jnp.concatenate([o[3] for o in outs], axis=1),
        }

"""Assigner/sampler/IoU-calculator registry surface.

Behavioral reference: mmdet3d/core/bbox/{assigners,samplers,
iou_calculators} — the BEVFusion configs use HungarianAssigner3D (+ its
match costs, reimplemented in core/matching.py), PseudoSampler, and
BboxOverlaps3D(coordinate='lidar'). The mask-based jittable forms live
in matching.py / ops/iou3d.py; these classes provide the
registry-driven API so configs referencing them resolve.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from ..ops.iou3d import iou_3d, iou_bev
from ..registry import BBOX_ASSIGNERS, MATCH_COSTS, Registry
from .matching import auction_assignment, hungarian_costs

IOU_CALCULATORS = Registry("iou_calculators")
SAMPLERS = Registry("bbox_samplers")

__all__ = ["BboxOverlaps3D", "PseudoSampler", "HungarianAssigner3D",
           "IOU_CALCULATORS", "SAMPLERS"]


@IOU_CALCULATORS.register()
class BboxOverlaps3D:
    """3D IoU (rotated BEV overlap x z extent) for LiDAR-frame boxes
    (core/bbox/iou_calculators/iou3d_calculator.py)."""

    def __init__(self, coordinate: str = "lidar"):
        assert coordinate in ("lidar", "camera", "depth")
        self.coordinate = coordinate

    def __call__(self, boxes1, boxes2, mode: str = "iou"):
        return iou_3d(jnp.asarray(boxes1)[:, :7], jnp.asarray(boxes2)[:, :7])


@IOU_CALCULATORS.register()
class BboxOverlapsNearest3D:
    """Axis-aligned-ish BEV IoU via rotated IoU with yaw kept (the
    reference aligns yaw to nearest axis; we use exact rotated IoU which
    upper-bounds it consistently for matching purposes)."""

    def __init__(self, coordinate: str = "lidar"):
        self.coordinate = coordinate

    def __call__(self, boxes1, boxes2, mode: str = "iou"):
        b1 = jnp.asarray(boxes1)[:, [0, 1, 3, 4, 6]]
        b2 = jnp.asarray(boxes2)[:, [0, 1, 3, 4, 6]]
        return iou_bev(b1, b2)


class AssignResult(NamedTuple):
    num_gts: int
    gt_inds: np.ndarray  # [num_preds] 1-based gt index, 0 = background
    max_overlaps: np.ndarray
    labels: np.ndarray


@SAMPLERS.register()
class PseudoSampler:
    """No-op sampler: every assigned pred is positive, the rest negative
    (mmdet PseudoSampler; reference uses it for TransFusion)."""

    def sample(self, assign_result: AssignResult, bboxes, gt_bboxes):
        pos_inds = np.nonzero(np.asarray(assign_result.gt_inds) > 0)[0]
        neg_inds = np.nonzero(np.asarray(assign_result.gt_inds) == 0)[0]

        class _R:
            pass

        r = _R()
        r.pos_inds = pos_inds
        r.neg_inds = neg_inds
        r.pos_assigned_gt_inds = np.asarray(assign_result.gt_inds)[pos_inds] - 1
        r.pos_gt_bboxes = np.asarray(gt_bboxes)[r.pos_assigned_gt_inds]
        return r


@BBOX_ASSIGNERS.register()
class HungarianAssigner3D:
    """Config-compatible wrapper over the in-graph auction matcher
    (core/matching.py); the TransFusion head calls the functional form
    directly inside jit — this class serves API parity and host-side
    tooling."""

    def __init__(self, cls_cost=None, reg_cost=None, iou_cost=None,
                 iou_calculator=None):
        self.cls_cost = cls_cost or {"weight": 0.15, "alpha": 0.25, "gamma": 2.0}
        self.reg_cost = reg_cost or {"weight": 0.25}
        self.iou_cost = iou_cost or {"weight": 0.25}

    def assign(self, bboxes, gt_bboxes, gt_labels, cls_pred, train_cfg):
        import jax

        pcr = train_cfg["point_cloud_range"]
        p0 = jnp.asarray(pcr[0:2])
        rng_ = jnp.asarray(pcr[3:5]) - p0
        iou = iou_3d(jnp.asarray(bboxes)[:, :7], jnp.asarray(gt_bboxes)[:, :7])
        cost = hungarian_costs(
            jax.nn.sigmoid(jnp.asarray(cls_pred)),
            (jnp.asarray(bboxes)[:, :2] - p0) / rng_,
            (jnp.asarray(gt_bboxes)[:, :2] - p0) / rng_,
            iou, jnp.asarray(gt_labels),
            cls_weight=self.cls_cost.get("weight", 0.15),
            reg_weight=self.reg_cost.get("weight", 0.25),
            iou_weight=self.iou_cost.get("weight", 0.25),
        )
        G, P = cost.shape
        assign = auction_assignment(
            cost, jnp.ones((G,), bool), jnp.ones((P,), bool)
        )
        gt_inds = np.zeros((P,), np.int64)
        labels = np.full((P,), -1, np.int64)
        a = np.asarray(assign)
        for g, p in enumerate(a):
            if p >= 0:
                gt_inds[p] = g + 1
                labels[p] = int(np.asarray(gt_labels)[g])
        max_ov = np.zeros((P,), np.float32)
        iou_np = np.asarray(iou)
        for g, p in enumerate(a):
            if p >= 0:
                max_ov[p] = iou_np[p, g]
        return AssignResult(G, gt_inds, max_ov, labels)


@BBOX_ASSIGNERS.register()
class HeuristicAssigner3D:
    """Nearest-center heuristic assigner
    (core/bbox/assigners/hungarian_assigner.py:38-80): each GT matches
    its nearest same-class prediction within dist_thre meters."""

    def __init__(self, dist_thre: float = 100.0, iou_calculator=None):
        self.dist_thre = float(dist_thre)

    def assign(self, bboxes, gt_bboxes, gt_bboxes_ignore=None, gt_labels=None,
               query_labels=None):
        bboxes = np.asarray(bboxes)
        gt = np.asarray(gt_bboxes)
        G, P = len(gt), len(bboxes)
        dist = np.linalg.norm(
            bboxes[None, :, :2] - gt[:, None, :2], axis=-1)  # [G, P]
        if query_labels is not None and gt_labels is not None:
            diff = np.asarray(query_labels)[None] != np.asarray(gt_labels)[:, None]
            dist = dist + diff * self.dist_thre
        gt_inds = np.zeros((P,), np.int64)
        vals = np.full((P,), 1e4)
        labels = np.full((P,), -1, np.int64)
        for g in range(G):
            p = int(np.argmin(dist[g]))
            if dist[g, p] <= self.dist_thre and dist[g, p] < vals[p]:
                vals[p] = dist[g, p]
                gt_inds[p] = g + 1
                if gt_labels is not None:
                    labels[p] = int(np.asarray(gt_labels)[g])
        max_ov = np.zeros((P,), np.float32)
        m = gt_inds > 0
        if m.any():
            iou = np.asarray(iou_3d(
                jnp.asarray(bboxes[m][:, :7]), jnp.asarray(gt[:, :7])))
            max_ov[m] = iou[np.arange(m.sum()), gt_inds[m] - 1]
        return AssignResult(G, gt_inds, max_ov, labels)

"""Greedy NMS variants (jittable, mask-based).

Behavioral reference: circle_nms (numba CPU,
mmdet3d/core/post_processing/box3d_nms.py:181-219) and rotated nms_gpu
(mmdet3d/ops/iou3d/iou3d_utils.py:23-49 + 64-bit suppression-bitmask
CUDA kernel).

TPU-first: suppression runs as a fori loop over score-sorted rank with
vectorized [N] updates — the mask-loop form of greedy NMS — instead of
host numba / bitmask blocks. Output is a keep *mask* over the original
indices (static shapes); callers combine it with top-k if they need a
fixed number of survivors.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .iou3d import iou_bev

__all__ = ["circle_nms_mask", "nms_bev_mask", "box3d_multiclass_nms_mask",
           "aligned_3d_nms_mask"]


def _greedy_suppress(order, suppress_pair):
    """Generic greedy pass. order: [N] indices sorted by descending score;
    suppress_pair: [N, N] bool in *sorted* space, True if row i suppresses
    column j. Returns keep mask in original index space."""
    N = order.shape[0]
    sup_sorted = suppress_pair

    def body(i, keep):
        row = sup_sorted[i] & keep[i] & (jnp.arange(N) > i)
        return keep & ~row

    keep_sorted = jax.lax.fori_loop(0, N, body, jnp.ones((N,), bool))
    keep = jnp.zeros((N,), bool).at[order].set(keep_sorted)
    return keep


def circle_nms_mask(centers, scores, valid, radius_sq):
    """Centers [N, 2], scores [N], valid [N]; a detection is suppressed by
    any higher-scoring kept detection whose center is within sqrt(thresh)
    (box3d_nms.py:181-219; thresh compared against squared distance).
    Returns keep mask [N] (invalid rows are never kept)."""
    order = jnp.argsort(-jnp.where(valid, scores, -jnp.inf))
    c = centers[order]
    d2 = jnp.sum((c[:, None] - c[None]) ** 2, axis=-1)
    sup = d2 <= radius_sq
    keep = _greedy_suppress(order, sup)
    return keep & valid


def nms_bev_mask(boxes_bev, scores, valid, iou_threshold):
    """Rotated-BEV IoU NMS. boxes_bev [N, 5] = (cx, cy, dx, dy, yaw).

    Matches nms_gpu semantics: suppress j if IoU(i, j) > threshold for a
    higher-scoring kept i. Returns keep mask [N]."""
    order = jnp.argsort(-jnp.where(valid, scores, -jnp.inf))
    b = boxes_bev[order]
    iou = iou_bev(b, b)
    sup = iou > iou_threshold
    keep = _greedy_suppress(order, sup)
    return keep & valid


def box3d_multiclass_nms_mask(boxes_bev, scores, valid, score_thr,
                              iou_threshold, max_num=None):
    """Per-class rotated NMS over multi-class score matrix
    (core/post_processing/box3d_nms.py:8 box3d_multiclass_nms).

    boxes_bev [N, 5]; scores [N, num_classes] (no background column).
    Returns (keep mask [N, num_classes]) — static-shape form of the
    reference's per-class concat; pair each kept (box, class).
    """
    num_classes = scores.shape[1]
    keeps = []
    for c in range(num_classes):
        s = scores[:, c]
        m = valid & (s > score_thr)
        keeps.append(nms_bev_mask(boxes_bev, s, m, iou_threshold))
    keep = jnp.stack(keeps, axis=1)
    if max_num is not None:
        flat = jnp.where(keep, scores, -jnp.inf).reshape(-1)
        rank = jnp.argsort(jnp.argsort(-flat))
        keep = keep & (rank.reshape(keep.shape) < max_num)
    return keep


def aligned_3d_nms_mask(boxes, scores, classes, valid, thresh):
    """Axis-aligned 3D IoU NMS (box3d_nms.py:129 aligned_3d_nms):
    boxes [N, 6] = (x1, y1, z1, x2, y2, z2); suppression only within the
    same class. Returns keep mask."""
    order = jnp.argsort(-jnp.where(valid, scores, -jnp.inf))
    b = boxes[order]
    cls_s = classes[order]
    mins = jnp.maximum(b[:, None, :3], b[None, :, :3])
    maxs = jnp.minimum(b[:, None, 3:], b[None, :, 3:])
    inter = jnp.prod(jnp.maximum(maxs - mins, 0.0), axis=-1)
    vol = jnp.prod(jnp.maximum(b[:, 3:] - b[:, :3], 0.0), axis=-1)
    iou = inter / jnp.maximum(vol[:, None] + vol[None] - inter, 1e-6)
    sup = (iou > thresh) & (cls_s[:, None] == cls_s[None])
    keep = _greedy_suppress(order, sup)
    return keep & valid

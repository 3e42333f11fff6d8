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

__all__ = ["circle_nms_mask", "nms_bev_mask"]


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

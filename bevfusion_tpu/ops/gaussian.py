"""Gaussian heatmap target utilities (jittable, static shapes).

Reference semantics: mmdet3d/core/utils/gaussian.py:24-84. The reference
draws each gaussian by slicing a (2r+1)² patch into the heatmap with
``torch.max``; that is data-dependent-shape work. Here each gaussian is
evaluated over the full feature map and combined with ``maximum`` — same
result, static shapes, vmappable over objects.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["gaussian_radius", "draw_heatmap_gaussians"]


def gaussian_radius(det_size, min_overlap=0.5):
    """Radius such that a shifted box still has IoU >= min_overlap.

    det_size = (length, width) in feature-map units; matches
    core/utils/gaussian.py:56-84 (min of the three quadratic roots).
    """
    height, width = det_size

    a1 = 1.0
    b1 = height + width
    c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
    sq1 = jnp.sqrt(jnp.maximum(b1**2 - 4 * a1 * c1, 0.0))
    r1 = (b1 + sq1) / 2

    a2 = 4.0
    b2 = 2 * (height + width)
    c2 = (1 - min_overlap) * width * height
    sq2 = jnp.sqrt(jnp.maximum(b2**2 - 4 * a2 * c2, 0.0))
    r2 = (b2 + sq2) / 2

    a3 = 4.0 * min_overlap
    b3 = -2 * min_overlap * (height + width)
    c3 = (min_overlap - 1) * width * height
    sq3 = jnp.sqrt(jnp.maximum(b3**2 - 4 * a3 * c3, 0.0))
    r3 = (b3 + sq3) / 2
    return jnp.minimum(jnp.minimum(r1, r2), r3)


def _single_gaussian(center_int, radius, H, W):
    """Full-map gaussian identical to the reference's sliced patch.

    The reference (gaussian.py:24-52) builds exp(-(dx²+dy²)/(2σ²)) with
    σ = (2r+1)/6 on integer offsets from the *integer* center, zeroes
    values < eps*max (max = 1 at center), and pastes only within radius r.
    """
    x0 = center_int[0]
    y0 = center_int[1]
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    dx = xs - x0.astype(jnp.float32)
    dy = ys - y0.astype(jnp.float32)
    diameter = 2 * radius + 1
    sigma = diameter.astype(jnp.float32) / 6.0
    g = jnp.exp(-(dx * dx + dy * dy) / (2 * sigma * sigma))
    # reference zeroes h < finfo.eps * h.max() (float64 eps ~2.2e-16)
    g = jnp.where(g < 2.220446049250313e-16, 0.0, g)
    rf = radius.astype(jnp.float32)
    inside = (jnp.abs(dx) <= rf) & (jnp.abs(dy) <= rf)
    return jnp.where(inside, g, 0.0)


def draw_heatmap_gaussians(heatmap, centers_int, radii, cls_ids, valid, k=1.0):
    """Max-combine one gaussian per object into per-class heatmaps.

    heatmap: [num_classes, H, W]; centers_int [N, 2] (x, y) int32;
    radii [N] int32; cls_ids [N] int32; valid [N] bool. Static N — padded
    objects must have valid=False.
    """
    num_classes, H, W = heatmap.shape
    N = centers_int.shape[0]
    g_all = jax.vmap(lambda c, r: _single_gaussian(c, r, H, W))(
        centers_int, radii
    )  # [N, H, W]
    g_all = jnp.where(valid[:, None, None], g_all * k, 0.0)
    seg = jnp.where(valid, cls_ids, num_classes)  # invalid -> dump row
    per_class = jax.ops.segment_max(
        g_all.reshape(N, H * W), seg, num_segments=num_classes + 1
    )[:-1].reshape(num_classes, H, W)
    return jnp.maximum(heatmap, per_class)

"""BEV pooling: sum frustum features that land in the same BEV cell.

Reference semantics: mmdet3d/ops/bev_pool (CUDA interval segment-sum,
src/bev_pool_cuda.cu:20-42, python wrapper bev_pool.py:83-97). The
reference rank-sorts points by linearized voxel id and sums each
interval with one CUDA thread.

TPU-first design (static shapes, no scatter):
- out-of-grid frustum points become a *mask* (sentinel segment), never a
  dynamic-shape gather (reference filters with a boolean index,
  vtransforms/base.py:163-166);
- segment reduction = argsort by cell id + cumsum + prefix-difference at
  segment boundaries found by searchsorted — the same "QuickCumsum"
  trick as the reference's legacy path (ops/bev_pool/bev_pool.py:8-34),
  fully vectorized on the VPU;
- `lss_bev_pool` fuses the depth ⊗ context outer product into the pool:
  the [Np, C] product is formed lazily inside the same XLA program so the
  compiler can fuse the multiply into the sorted gather, instead of
  materializing the [B, N, D, fH, fW, C] tensor up front.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["bev_pool", "lss_bev_pool"]


def _sorted_segment_sum(vals, ids, num_segments):
    """Segment-sum of vals [Np, C] by ids [Np] into [num_segments, C].

    ids >= num_segments act as a dump bucket (masked-out points). Exact
    per-segment sums would need a segmented scan; the cumsum-difference
    here matches the numerics of the reference's QuickCumsum
    (ops/bev_pool/bev_pool.py:8-34) and keeps everything a dense VPU op.
    Segment boundaries are found by scattering the sorted run heads and
    tails (unique indices — the fast scatter path; no binary search).
    Accumulation is forced to fp32.
    """
    order = jnp.argsort(ids)
    ids_s = ids[order]
    vals_s = jnp.take(vals, order, axis=0).astype(jnp.float32)
    return _presorted_segment_sum(vals_s, ids_s, num_segments)


def _presorted_segment_sum(vals_s, ids_s, num_segments):
    """Segment-sum of already-sorted vals [Np, C] by sorted ids [Np].

    One scatter of run *ends*; each segment's start is the previous
    nonempty segment's end, recovered with a cummax — so
    sum[c] = prefix[cummax_ends[c]] - prefix[cummax_ends[c - 1]].
    """
    Np = ids_s.shape[0]
    csum = jnp.cumsum(vals_s.astype(jnp.float32), axis=0)

    pos = jnp.arange(Np, dtype=jnp.int32)
    tail = jnp.concatenate([ids_s[:-1] != ids_s[1:], jnp.ones((1,), bool)])
    in_range = ids_s < num_segments
    ends = (
        jnp.zeros((num_segments + 1,), jnp.int32)
        .at[jnp.where(tail & in_range, ids_s, num_segments)]
        .set(pos + 1, mode="drop", unique_indices=True)[:num_segments]
    )
    ends = jax.lax.cummax(ends)
    starts = jnp.concatenate([jnp.zeros((1,), jnp.int32), ends[:-1]])
    # prefix[i] = csum[i-1], prefix[0] = 0; empty cells have start == end
    zero = jnp.zeros((1, vals_s.shape[1]), jnp.float32)
    prefix = jnp.concatenate([zero, csum], axis=0)
    return jnp.take(prefix, ends, axis=0) - jnp.take(prefix, starts, axis=0)


def bev_pool(feats, coords, valid, B, Z, X, Y):
    """Reference-shaped API: feats [Np, C], coords [Np, 4] = (x, y, z, b).

    Returns [B, Z, X, Y, C] (reference returns [B, C, Z, X, Y],
    bev_pool.py:92-97; we are channels-last throughout).
    """
    x, y, z, b = coords[:, 0], coords[:, 1], coords[:, 2], coords[:, 3]
    num_cells = B * Z * X * Y
    ids = ((b * Z + z) * X + x) * Y + y
    ids = jnp.where(valid, ids, num_cells).astype(jnp.int32)
    out = _sorted_segment_sum(feats, ids, num_cells)
    return out.reshape(B, Z, X, Y, feats.shape[-1])


def cell_ids_from_geometry(geom, dx, bx, nx):
    """Quantize lidar-frame frustum points to BEV cell ids + valid mask.

    geom [..., 3] float; dx/bx/nx are the gen_dx_bx constants. Matches
    vtransforms/base.py:148-166: floor((p - (bx - dx/2)) / dx), then keep
    0 <= c < nx per axis. Returns (cell_id within one sample's Z*X*Y grid,
    valid). Cell id layout: ((z * X) + x) * Y + y.
    """
    c = jnp.floor((geom - (bx - dx / 2.0)) / dx).astype(jnp.int32)
    cx, cy, cz = c[..., 0], c[..., 1], c[..., 2]
    X, Y, Z = int(nx[0]), int(nx[1]), int(nx[2])
    valid = (
        (cx >= 0) & (cx < X) & (cy >= 0) & (cy < Y) & (cz >= 0) & (cz < Z)
    )
    ids = (cz * X + cx) * Y + cy
    return ids, valid


def lss_bev_pool(depth, ctx, cell_ids, valid, Z, X, Y):
    """Fused LSS pooling: pool(depth ⊗ context) without a host-visible
    [B, N, D, fH, fW, C] intermediate.

    depth:    [B, N, D, fH, fW]   softmax depth distribution
    ctx:      [B, N, fH, fW, C]   per-pixel context features
    cell_ids: [B, N, D, fH, fW]   int32 in [0, Z*X*Y)
    valid:    same shape, bool
    Returns [B, X, Y, Z*C] (z-major channel blocks, matching the
    reference's z-unbind-and-concat, vtransforms/base.py:174).

    On TPU backends this dispatches to the Pallas rank-space matmul
    kernel (ops/bev_pool_pallas.py, ~4x faster at flagship scale); the
    XLA path below is the fallback and the numerics oracle.
    """
    if jax.default_backend() == "tpu":
        from .bev_pool_pallas import lss_bev_pool_tpu

        return lss_bev_pool_tpu(depth, ctx, cell_ids, valid, Z, X, Y)
    B, N, D, fH, fW, = depth.shape
    C = ctx.shape[-1]
    num_cells = Z * X * Y

    def pool_one(dep, cx, ids, val):
        # Gather order: sort cell ids first, then form the product in
        # sorted order by gathering rows of the SMALL per-pixel context
        # table (N*fH*fW rows ~ a few MB, cache/VMEM hot) instead of a
        # materialized [N*D*fH*fW, C] product (HBM-sized, one-touch).
        Np = N * D * fH * fW
        ids_f = jnp.where(val, ids, num_cells).reshape(-1).astype(jnp.int32)
        # one multi-operand sort carries depth + original index along
        # (random scalar takes cost ~3x a sort pass on this TPU)
        iota = jax.lax.iota(jnp.int32, Np)
        ids_s, d_s, order = jax.lax.sort(
            (ids_f, dep.reshape(-1), iota), num_keys=1
        )
        # pixel index of a frustum point is pure arithmetic on its flat
        # (n, d, h, w) index — compute it from `order` with no gather
        HW = fH * fW
        pix_s = (order // (D * HW)) * HW + (order % HW)
        rows = jnp.take(cx.reshape(N * HW, C), pix_s, axis=0)
        vals_s = d_s[:, None].astype(jnp.float32) * rows.astype(jnp.float32)
        out = _presorted_segment_sum(vals_s, ids_s, num_cells)
        return out.reshape(Z, X, Y, C)

    out = jax.vmap(pool_one)(depth, ctx, cell_ids, valid)  # [B, Z, X, Y, C]
    # collapse Z into channels, z-major (base.py:174)
    return out.transpose(0, 2, 3, 1, 4).reshape(B, X, Y, Z * C)

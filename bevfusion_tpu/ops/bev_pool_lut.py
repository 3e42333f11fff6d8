"""Calibration-LUT BEV pooling (the BEVPoolv2 pattern, TPU-shaped).

Reference context: the reference recomputes the frustum geometry, the
in-grid filter and the rank sort EVERY forward (mmdet3d/models/
vtransforms/base.py:140-176). All of that depends only on the
calibration + augmentation matrices — per frame only `depth` (softmax
over D bins) and `ctx` (per-pixel features) change. BEVPoolv2 (the
public follow-up to the reference's bev_pool) moves the rank/sort
precompute off the hot path; here it becomes a host-side numpy LUT
computed once per calibration (a deployed rig is fixed; the data
pipeline computes it per sample alongside the aug matrices).

Per-frame device work with a LUT (measured v5e, 2M frustum points):
  - ONE 2-operand sort reorders depth into rank space (~4 ms — a
    `take` by the static permutation is descriptor-bound at ~17 ms,
    sorts are the cheap way to permute on this chip);
  - the context row gather by static pixel ids (~7 ms, unavoidable
    data movement);
  - the rank-space one-hot matmul kernel (ops/bev_pool_pallas.py,
    ~3.6 ms) with zeroed id-digit lanes (rank -> cell is static);
  - one unique-index scatter with a STATIC index vector.
Deleted per frame: geometry einsum chain + quantize (~4.5 ms), the
3-operand sort (~5.8 ms), head/rank/meta cumsums and the id-digit lane
packing (~3 ms) — the sort/rank glue the round-3 profile blamed.

Differentiable: the LUT is parameter-independent (geometry only), so
only depth/ctx carry gradients. The custom VJP reuses the in-graph
pool's pixel-major backward (ops/bev_pool_pallas.pool_backward) driven
by the LUT's per-point cell ids — training can ride the LUT path too
and skip the in-graph geometry/sort chain every step.
"""
from __future__ import annotations

import functools
from typing import Dict

import numpy as np

__all__ = ["build_pool_lut_np", "lss_bev_pool_from_lut", "LUT_KEYS"]

LUT_KEYS = ("inv_order", "pix_s", "slot", "meta", "scatter_idx",
            "cell_ids")


def _get_geometry_np(frustum, camera2lidar, intrins, img_aug, lidar_aug):
    """Numpy mirror of models.vtransforms.get_geometry (one sample:
    matrices [N, 4, 4] / intrins [N, 3, 3]; frustum [D, fH, fW, 3]).

    Float32 throughout, like the device path (@force_fp32 in the
    reference) — fp64 here would quantize boundary-exact points into
    different cells than the in-graph geometry."""
    f = np.float32
    frustum = frustum.astype(f)
    post_rots = img_aug[:, :3, :3].astype(f)
    post_trans = img_aug[:, :3, 3].astype(f)
    c2l_rots = camera2lidar[:, :3, :3].astype(f)
    c2l_trans = camera2lidar[:, :3, 3].astype(f)
    extra_rots = lidar_aug[:3, :3].astype(f)
    extra_trans = lidar_aug[:3, 3].astype(f)

    pts = frustum[None] - post_trans[:, None, None, None, :]
    inv_post = np.linalg.inv(post_rots.astype(np.float64)).astype(f)
    pts = np.einsum("nij,ndhwj->ndhwi", inv_post, pts).astype(f)
    pts = np.concatenate([pts[..., :2] * pts[..., 2:3], pts[..., 2:3]], -1)
    combine = (c2l_rots.astype(np.float64)
               @ np.linalg.inv(intrins.astype(np.float64))).astype(f)
    pts = np.einsum("nij,ndhwj->ndhwi", combine, pts).astype(f)
    pts = pts + c2l_trans[:, None, None, None, :]
    pts = np.einsum("ij,ndhwj->ndhwi", extra_rots, pts).astype(f)
    return pts + extra_trans


def build_pool_lut_np(frustum, dx, bx, nx, camera2lidar, intrins, img_aug,
                      lidar_aug, chunk: int = 0) -> Dict[str, np.ndarray]:
    """Per-batch pooling LUT (numpy, host side).

    frustum [D, fH, fW, 3]; dx/bx [3]; nx [3] ints; matrices batched
    [B, N, 4, 4] (lidar_aug [B, 4, 4]; intrins [B, N, 3, 3]).

    Returns arrays batched on axis 0:
      inv_order  [B, Np_pad] int32 — sorted position of each flat
                 frustum point; `sort((inv_order, depth))` reorders the
                 per-frame depth into rank space
      pix_s      [B, Np_pad] int32 — source pixel row per sorted point
      slot       [B, nchunks, 1, CHUNK] int32 — in-chunk segment slot
      meta       [B, nchunks, 2] int32 — (rank_offset, continuation)
      scatter_idx [B, cap_ranks] int32 — rank -> output cell (invalid
                 ranks get unique out-of-bounds ids for mode="drop")
      cell_ids   [B, Np] int32 — cell id per flat frustum point
                 (num_cells when out of grid): the backward pairing
                 (point -> cell) for the custom VJP
    """
    if not chunk:
        # the consumer (lss_bev_pool_from_lut) reshapes slot/meta with the
        # Pallas kernel's CHUNK — a diverging default would desync LUTs
        from . import bev_pool_pallas as _bp
        chunk = _bp.CHUNK
    B, N = camera2lidar.shape[:2]
    D, fH, fW = frustum.shape[:3]
    HW = fH * fW
    Np = N * D * HW
    Np_pad = (Np + chunk - 1) // chunk * chunk
    X, Y, Z = int(nx[0]), int(nx[1]), int(nx[2])
    num_cells = Z * X * Y
    cap_ranks = (num_cells + 2 + chunk + 7) // 8 * 8

    out = {k: [] for k in LUT_KEYS}
    for b in range(B):
        geom = _get_geometry_np(frustum, camera2lidar[b], intrins[b],
                                img_aug[b], lidar_aug[b])  # [N,D,fH,fW,3]
        c = np.floor((geom - (bx - dx / 2.0)) / dx).astype(np.int64)
        cx, cy, cz = c[..., 0], c[..., 1], c[..., 2]
        valid = ((cx >= 0) & (cx < X) & (cy >= 0) & (cy < Y)
                 & (cz >= 0) & (cz < Z))
        ids = np.where(valid, (cz * X + cx) * Y + cy, num_cells)
        ids_f = np.full(Np_pad, num_cells, np.int64)
        ids_f[:Np] = ids.reshape(-1)
        order = np.argsort(ids_f, kind="stable")
        ids_s = ids_f[order]
        inv = np.empty(Np_pad, np.int32)
        inv[order] = np.arange(Np_pad, dtype=np.int32)
        pix = np.where(order < Np,
                       (order // (D * HW)) * HW + (order % HW), 0)

        heads = np.concatenate([[True], ids_s[1:] != ids_s[:-1]])
        grank = np.cumsum(heads.astype(np.int64)) - 1
        rank_offset = grank[::chunk].astype(np.int32)
        cont = 1 - heads[::chunk].astype(np.int32)
        slot = (grank - np.repeat(rank_offset.astype(np.int64), chunk)
                ).astype(np.int32)
        R = int(grank[-1] + 1)

        scat = num_cells + 1 + np.arange(cap_ranks, dtype=np.int64)
        rank_cell = np.full(cap_ranks, num_cells, np.int64)
        rank_cell[grank[heads]] = ids_s[heads]
        ok = (np.arange(cap_ranks) < R) & (rank_cell < num_cells)
        scat[ok] = rank_cell[ok]

        out["inv_order"].append(inv)
        out["pix_s"].append(pix.astype(np.int32))
        out["slot"].append(slot.reshape(-1, 1, chunk))
        out["meta"].append(np.stack([rank_offset, cont], 1))
        out["scatter_idx"].append(scat.astype(np.int32))
        out["cell_ids"].append(ids.reshape(-1).astype(np.int32))
    return {k: np.stack(v) for k, v in out.items()}


def lss_bev_pool_from_lut(depth, ctx, lut, Z: int, X: int, Y: int):
    """LUT-driven pooling: depth [B, N, D, fH, fW], ctx [B, N, fH, fW, C],
    lut per build_pool_lut_np (jnp arrays, batched). Returns
    [B, X, Y, Z*C] like ops.bev_pool.lss_bev_pool. Differentiable in
    depth/ctx when the LUT carries "cell_ids" (see _lut_pool_ad)."""
    if "cell_ids" in lut:
        return _lut_pool_ad(depth, ctx, lut["inv_order"], lut["pix_s"],
                            lut["slot"], lut["meta"], lut["scatter_idx"],
                            lut["cell_ids"], Z, X, Y)
    return _lut_pool_impl(depth, ctx, lut, Z, X, Y)  # legacy LUTs: eval only


def _lut_pool_impl(depth, ctx, lut, Z: int, X: int, Y: int):
    import jax
    import jax.numpy as jnp

    from . import bev_pool_pallas as bp
    from .bev_pool import _presorted_segment_sum

    B, N, D, fH, fW = depth.shape
    C = ctx.shape[-1]
    HW = fH * fW
    num_cells = Z * X * Y
    Np = N * D * HW
    on_tpu = jax.default_backend() == "tpu"

    def pool_one(dep, cx, inv_order, pix_s, slot, meta, scatter_idx):
        Np_pad = inv_order.shape[0]
        dep_f = dep.reshape(-1).astype(jnp.float32)
        if Np_pad != Np:
            dep_f = jnp.concatenate(
                [dep_f, jnp.zeros((Np_pad - Np,), jnp.float32)])
        # reorder depth into rank space: one 2-operand sort (sorts are
        # ~4x cheaper than a take by the same permutation on this chip)
        _, d_s = jax.lax.sort((inv_order, dep_f), num_keys=1)
        rows = jnp.take(cx.reshape(N * HW, C).astype(jnp.bfloat16),
                        pix_s, axis=0)
        cap_ranks = scatter_idx.shape[0]
        if not on_tpu:  # XLA fallback / oracle path
            # slot/meta encode the global rank of every sorted point
            grank = slot.reshape(-1) + jnp.repeat(meta[:, 0], bp.CHUNK)
            vals = d_s[:, None] * rows.astype(jnp.float32)
            sums = _presorted_segment_sum(vals, grank, cap_ranks)
        else:
            d_hi = d_s.astype(jnp.bfloat16)
            d_lo = (d_s - d_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            el = jax.lax.broadcasted_iota(jnp.int32, (Np_pad, 128 - C), 1)
            extra = jnp.where(el == 0, d_hi[:, None],
                              jnp.where(el == 1, d_lo[:, None],
                                        jnp.bfloat16(0)))
            data = jnp.concatenate([rows, extra], axis=1)
            nchunks = Np_pad // bp.CHUNK
            sums = bp.rank_segment_sum(
                data.reshape(nchunks, bp.CHUNK, 128), slot, meta, C,
                cap_ranks)[:, :C]
        out = jnp.zeros((num_cells, C), jnp.float32)
        return out.at[scatter_idx].set(
            sums, mode="drop", unique_indices=True)

    out = jnp.stack([
        pool_one(depth[b], ctx[b], lut["inv_order"][b], lut["pix_s"][b],
                 lut["slot"][b], lut["meta"][b], lut["scatter_idx"][b])
        for b in range(B)
    ])
    out = out.reshape(B, Z, X, Y, C).transpose(0, 2, 3, 1, 4)
    return out.reshape(B, X, Y, Z * C).astype(ctx.dtype)


def _make_lut_ad():
    """Build the custom-VJP LUT pool lazily (keeps jax out of the
    module-import path, like everything else in this file)."""
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
    def _ad(depth, ctx, inv_order, pix_s, slot, meta, scatter_idx,
            cell_ids, Z, X, Y):
        return _fwd(depth, ctx, inv_order, pix_s, slot, meta, scatter_idx,
                    cell_ids, Z, X, Y)[0]

    def _fwd(depth, ctx, inv_order, pix_s, slot, meta, scatter_idx,
             cell_ids, Z, X, Y):
        lut = {"inv_order": inv_order, "pix_s": pix_s, "slot": slot,
               "meta": meta, "scatter_idx": scatter_idx}
        out = _lut_pool_impl(depth, ctx, lut, Z, X, Y)
        return out, (depth, ctx, cell_ids)

    def _bwd(Z, X, Y, res, g):
        # the LUT is parameter-independent: only depth/ctx carry grads;
        # the pairing point -> cell drives the shared pixel-major
        # backward of the in-graph pool
        from .bev_pool_pallas import pool_backward

        depth, ctx, cell_ids = res
        B, N, D, fH, fW = depth.shape
        ids = cell_ids.reshape(B, N, D, fH, fW)
        valid = ids < Z * X * Y
        dd, dc = pool_backward(depth, ctx, jnp.where(valid, ids, 0), valid,
                               g, Z, X, Y)
        return (dd, dc) + (None,) * 6

    _ad.defvjp(_fwd, _bwd)
    return _ad


_LUT_AD = None


def _lut_pool_ad(*args):
    global _LUT_AD
    if _LUT_AD is None:
        _LUT_AD = _make_lut_ad()
    return _LUT_AD(*args)

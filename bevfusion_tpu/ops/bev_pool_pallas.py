"""Pallas TPU kernel for the fused LSS BEV pooling segment-sum.

Reference semantics: mmdet3d/ops/bev_pool (CUDA interval segment sum,
src/bev_pool_cuda.cu:20-42). The XLA fallback in ops/bev_pool.py keeps
the same numerics contract and serves as the oracle.

Why a kernel: the XLA path costs ~80 ms/frame at flagship scale
(2M frustum points x 80 ch): a 3-operand sort (~6.5 ms) + a 2M-row
gather (~7 ms) are fine, but the cumsum-difference segment sum burns
~29 ms in multi-pass cumsums and big scatters. This kernel replaces the
segment sum with a *rank-space one-hot matmul* on the MXU:

  - points arrive sorted by BEV cell id; a chunk of CH points touches a
    contiguous range of segment ranks (rank = index of the run in the
    sorted order), so per chunk the segment sums are
        out[s, c] = sum_j [slot[j] == s] * vals[j, c]
    i.e. ONE [CH, CH] x [CH, C] matmul with an exact 0/1 operand —
    ~0.5 PFLOP-rate work instead of scatter traffic;
  - chunks are grid steps executed sequentially; a VMEM carry row stitches
    segments that span chunk boundaries (the last slot of chunk c is
    re-emitted complete by chunk c+1 at the same rank row, so the later
    DMA simply overwrites the partial row);
  - each chunk DMAs its [CH, C'] block of rank-space sums to HBM at its
    rank offset (scalar-prefetched), double-buffered so the matmul of
    chunk c+1 overlaps the store of chunk c;
  - cell ids ride along the same matmul as three base-64 digit columns
    (signed by the segment-head flag): each digit is < 64 so the bf16
    product stays exact, and only the head row of a segment contributes,
    so the digits reassemble into the exact cell id afterwards.

The final rank->cell placement is a single unique-index scatter of at
most `num_cells` rows back in XLA.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["rank_segment_sum", "lss_bev_pool_tpu", "pool_backward"]

CHUNK = 1024


def _kernel(meta_ref, slot_ref, rows_ref, out_hbm, scratch, carry, sems, *,
            C):
    """One grid step = one chunk of CHUNK sorted points.

    meta_ref:  SMEM [nchunks, 2] int32 (rank_offset, cont)
    slot_ref:  VMEM [1, CHUNK] int32 local segment slot per point
    rows_ref:  VMEM [CHUNK, 128] bf16: lanes [0, C) gathered context,
               lane C / C+1 the depth split hi/lo (two bf16 lanes keep
               ~f32 precision), lanes C+2..C+4 the head-premultiplied
               base-64 cell-id digits. Packing everything into one
               128-lane operand avoids [N, 1] side inputs whose minor
               dim pads 128x in HBM (three such operands cost ~9 ms).
    out_hbm:   HBM [cap_ranks, Cp=128] f32
    scratch:   VMEM [2, CHUNK, Cp] f32 (double-buffered DMA source)
    carry:     VMEM [8, Cp] f32 (row 0 = running partial of the open segment)
    """
    c = pl.program_id(0)
    nchunks = pl.num_programs(0)
    slot_row = slot_ref[0, 0, :]  # [CHUNK] int32
    Cp = 128

    data = rows_ref[0]  # [CHUNK, 128] bf16
    d = (data[:, C:C + 1].astype(jnp.float32)
         + data[:, C + 1:C + 2].astype(jnp.float32))  # [CHUNK, 1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, Cp), 1)
    mult = jnp.where(lane < C, d,
                     jnp.where((lane >= C + 2) & (lane < C + 5), 1.0, 0.0))
    vals = (data.astype(jnp.float32) * mult).astype(jnp.bfloat16)

    # one-hot^T: oh[s, j] = (slot[j] == s); s over sublanes, j over lanes
    oh = (jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
          == slot_row[None, :]).astype(jnp.bfloat16)
    # precision pinned: under jax_default_matmul_precision=highest (the
    # test env) Mosaic rejects a bf16 matmul ("Bad lhs type")
    sums = jnp.dot(oh, vals, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.DEFAULT)

    cont = meta_ref[c, 1]
    # stitch a segment continuing from the previous chunk: its partial sum
    # (and exact id digits) live in the carry row; slot 0 is its remainder.
    # (masked broadcast add — scatter ops do not lower in Mosaic)
    row0 = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0) == 0
    sums = sums + jnp.where(row0 & (cont > 0), carry[0:1, :], 0.0)

    slot_buf = c % 2
    scratch[slot_buf] = sums
    # dynamic_slice lowers only on refs, so read the open segment's
    # partial back out of the scratch buffer just written
    last_slot = slot_row[CHUNK - 1]
    carry[0:1, :] = scratch[slot_buf, pl.ds(last_slot, 1), :]

    # consecutive chunks write OVERLAPPING HBM rows (the stitched segment
    # row, and chunk c's garbage tail that chunk c+1's real rows replace):
    # chunk c+1's store must land after chunk c's, so wait out the
    # previous DMA before starting this one (it still overlaps this
    # chunk's matmul, which happened above)
    @pl.when(c >= 1)
    def _():
        prev = meta_ref[c - 1, 0]
        pltpu.make_async_copy(
            scratch.at[(c - 1) % 2], out_hbm.at[pl.ds(prev, CHUNK)],
            sems.at[(c - 1) % 2],
        ).wait()

    off = meta_ref[c, 0]
    cp = pltpu.make_async_copy(
        scratch.at[slot_buf], out_hbm.at[pl.ds(off, CHUNK)], sems.at[slot_buf]
    )
    cp.start()

    @pl.when(c == nchunks - 1)
    def _():
        cp.wait()


def rank_segment_sum(rows, slot, meta, C: int, cap_ranks: int):
    """rows [nchunks, CHUNK, 128] bf16 (lanes [0, C) context, C/C+1
    depth hi/lo, C+2..C+4 head-premultiplied id digits);
    slot [nchunks, 1, CHUNK] int32; meta [nchunks, 2] int32
    -> rank-space sums [cap_ranks, 128] f32 (first C lanes = feature
    sums, lanes C+2..C+4 = exact cell-id digits)."""
    nchunks = rows.shape[0]
    Cp = 128
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nchunks,),
        in_specs=[
            # [nchunks, 1, CHUNK] so the trailing block dims are a legal
            # (1 == full dim, CHUNK % 128 == 0) tiling
            pl.BlockSpec((1, 1, CHUNK), lambda c, m: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CHUNK, Cp), lambda c, m: (c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, CHUNK, Cp), jnp.float32),
            pltpu.VMEM((8, Cp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    return pl.pallas_call(
        functools.partial(_kernel, C=C),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((cap_ranks, Cp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(meta, slot, rows)


def _round_up(x, m):
    return (x + m - 1) // m * m


def _lss_pool_one(depth, ctx, ids, valid, num_cells: int, C: int):
    """One sample: depth [N, D, fH, fW], ctx [N, fH, fW, C],
    ids/valid same shape as depth -> [num_cells, C] f32."""
    N, D, fH, fW = depth.shape
    HW = fH * fW
    Np = N * D * HW
    Np_pad = _round_up(Np, CHUNK)
    nchunks = Np_pad // CHUNK

    ids_f = jnp.where(valid, ids, num_cells).reshape(-1).astype(jnp.int32)
    dep_f = depth.reshape(-1).astype(jnp.float32)
    if Np_pad != Np:
        ids_f = jnp.concatenate(
            [ids_f, jnp.full((Np_pad - Np,), num_cells, jnp.int32)])
        dep_f = jnp.concatenate([dep_f, jnp.zeros((Np_pad - Np,), jnp.float32)])
    iota = jax.lax.iota(jnp.int32, Np_pad)
    ids_s, d_s, order = jax.lax.sort((ids_f, dep_f, iota), num_keys=1)

    # pixel index is pure arithmetic on the pre-sort flat index
    pix_s = jnp.where(order < Np, (order // (D * HW)) * HW + (order % HW), 0)
    rows = jnp.take(ctx.reshape(N * HW, C).astype(jnp.bfloat16), pix_s, axis=0)

    heads = jnp.concatenate(
        [jnp.ones((1,), bool), ids_s[1:] != ids_s[:-1]])
    grank = jnp.cumsum(heads.astype(jnp.int32)) - 1
    rank_offset = grank[::CHUNK]
    cont = 1 - heads[::CHUNK].astype(jnp.int32)
    slot = grank - jnp.repeat(rank_offset, CHUNK)
    assert num_cells + 1 < 64 ** 3, "cell-id digits need 3 base-64 digits"
    assert C + 5 <= 128, "feature + depth + digit lanes must fit 128 lanes"

    # one 128-lane data operand: context rows + depth split hi/lo (two
    # bf16 lanes reproduce f32 depth to ~2^-16) + head-premultiplied
    # digits. Side operands shaped [N, 1] pad their minor dim 128x in
    # HBM (three of them cost ~9 ms/frame at 2M points).
    d32 = d_s.astype(jnp.float32)
    d_hi = d32.astype(jnp.bfloat16)
    d_lo = (d32 - d_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    idp = ids_s + 1
    hf = heads.astype(jnp.bfloat16)
    # one fused elementwise producer for the extra lanes — no [N, 1]
    # reshapes/stacks (each materialized [N, 1] costs ~2 ms: the minor
    # dim pads 128x in HBM)
    el = jax.lax.broadcasted_iota(jnp.int32, (Np_pad, 128 - C), 1)
    cols = [d_hi, d_lo,
            hf * (idp // 4096).astype(jnp.bfloat16),
            hf * ((idp // 64) % 64).astype(jnp.bfloat16),
            hf * (idp % 64).astype(jnp.bfloat16)]
    extra = jnp.zeros((Np_pad, 128 - C), jnp.bfloat16)
    for j, v in enumerate(cols):
        extra = jnp.where(el == j, v[:, None], extra)
    data = jnp.concatenate([rows, extra], axis=1)

    cap_ranks = _round_up(num_cells + 2 + CHUNK, 8)
    sums = rank_segment_sum(
        data.reshape(nchunks, CHUNK, 128),
        slot.reshape(nchunks, 1, CHUNK),
        jnp.stack([rank_offset, cont], axis=1),
        C, cap_ranks,
    )

    cell = (
        jnp.round(sums[:, C + 2]).astype(jnp.int32) * 4096
        + jnp.round(sums[:, C + 3]).astype(jnp.int32) * 64
        + jnp.round(sums[:, C + 4]).astype(jnp.int32)
    ) - 1
    # rows beyond the real ranks (overwritten garbage / sentinel run) get
    # unique out-of-bounds indices so the scatter can claim uniqueness.
    # rows >= R were never DMA'd by any chunk and hold stale buffer
    # contents whose digit lanes could decode to an in-range cell —
    # mask by the true rank count, not just the decoded id.
    R = grank[-1] + 1
    ok = ((cell >= 0) & (cell < num_cells)
          & (jax.lax.iota(jnp.int32, cap_ranks) < R))
    idx = jnp.where(ok, cell, num_cells + 1 + jax.lax.iota(jnp.int32, cap_ranks))
    out = jnp.zeros((num_cells, C), jnp.float32)
    return out.at[idx].set(
        sums[:, :C], mode="drop", unique_indices=True, indices_are_sorted=False
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def lss_bev_pool_tpu(depth, ctx, cell_ids, valid, Z, X, Y):
    """Drop-in for ops.bev_pool.lss_bev_pool on TPU backends.

    depth [B, N, D, fH, fW]; ctx [B, N, fH, fW, C];
    cell_ids/valid like depth. Returns [B, X, Y, Z*C] (z-major channel
    blocks, matching vtransforms/base.py:174).
    """
    return _fwd(depth, ctx, cell_ids, valid, Z, X, Y)[0]


def _fwd(depth, ctx, cell_ids, valid, Z, X, Y):
    B, N, D, fH, fW = depth.shape
    C = ctx.shape[-1]
    num_cells = Z * X * Y
    # static Python loop, NOT vmap: batching the pallas_call + sort glue
    # costs ~35 ms/frame extra at B=1 (measured v5e); B is tiny and static
    out = jnp.stack([
        _lss_pool_one(depth[b], ctx[b], cell_ids[b], valid[b], num_cells, C)
        for b in range(B)
    ])
    out = out.reshape(B, Z, X, Y, C).transpose(0, 2, 3, 1, 4)
    out = out.reshape(B, X, Y, Z * C)
    return out.astype(ctx.dtype), (depth, ctx, cell_ids, valid)


def pool_backward(depth, ctx, cell_ids, valid, g, Z, X, Y):
    """Natural (pixel-major) order backward of the fused pool — no sort:
    d_depth[p, d] = <ctx[p], g[cell(p, d)]>;
    d_ctx[p] = sum_d depth[p, d] * g[cell(p, d)].

    Scans over the depth-bin axis so the gathered gradient rows peak at
    [B, N, fH, fW, C] (one bin) instead of materializing the full
    [B, N, D, fH, fW, C] frustum gradient (~640 MB f32 at flagship
    scale — the round-2 training-memory hazard). Shared by the in-graph
    (lss_bev_pool_tpu) and calibration-LUT (ops/bev_pool_lut.py) paths:
    the backward pairing depends only on point -> cell, not on how the
    forward sorted/pooled."""
    B, N, D, fH, fW = depth.shape
    C = ctx.shape[-1]
    num_cells = Z * X * Y
    # [B, X, Y, Z*C] -> [B, Z*X*Y, C]
    gf = g.reshape(B, X, Y, Z, C).transpose(0, 3, 1, 2, 4).reshape(
        B, num_cells, C).astype(jnp.float32)

    ids = jnp.where(valid, cell_ids, 0)          # [B, N, D, fH, fW]
    ok = valid
    ctx_f = ctx.astype(jnp.float32)              # [B, N, fH, fW, C]

    def step(acc_ctx, xs):
        ids_d, ok_d, dep_d = xs                  # [B, N, fH, fW](, ...)
        rows = jax.vmap(lambda gb, ib: jnp.take(gb, ib.reshape(-1), axis=0))(
            gf, ids_d.reshape(B, -1))
        rows = rows.reshape(B, N, fH, fW, C)
        rows = jnp.where(ok_d[..., None], rows, 0.0)
        dd = jnp.einsum("bnhwc,bnhwc->bnhw", rows, ctx_f)
        acc_ctx = acc_ctx + rows * dep_d[..., None].astype(jnp.float32)
        return acc_ctx, dd

    acc0 = jnp.zeros((B, N, fH, fW, C), jnp.float32)
    acc_ctx, dds = jax.lax.scan(
        step, acc0,
        (ids.transpose(2, 0, 1, 3, 4), ok.transpose(2, 0, 1, 3, 4),
         depth.transpose(2, 0, 1, 3, 4)))
    d_depth = dds.transpose(1, 2, 0, 3, 4).astype(depth.dtype)
    d_ctx = acc_ctx.astype(ctx.dtype)
    return d_depth, d_ctx


def _bwd(Z, X, Y, res, g):
    depth, ctx, cell_ids, valid = res
    d_depth, d_ctx = pool_backward(depth, ctx, cell_ids, valid, g, Z, X, Y)
    return d_depth, d_ctx, None, None


lss_bev_pool_tpu.defvjp(lambda d, c, i, v, Z, X, Y: _fwd(d, c, i, v, Z, X, Y),
                        _bwd)

"""Pallas windowed gather-GEMM: the fast TPU sparse-conv execution path.

Behavioral reference: spconv's gather-GEMM-scatter `indiceConv`
(mmdet3d/ops/spconv/include/spconv/spconv_ops.h:261-360). Same math as
ops/sparse_conv.subm_gather_gemm (the oracle): for each output site and
kernel offset, accumulate W_k @ feats[neighbor_k].

Why a kernel: XLA row-gathers on this chip are descriptor-bound at
~250-300M rows/s regardless of sortedness (measured), putting a
~11-15 ms floor on every 120k-site x 27-offset conv. But both site
lists are sorted by linearized id, so for a FIXED kernel offset the
neighbor row sequence is monotone: a block of 512 consecutive output
sites reads neighbors from a contiguous WINDOW of the feature array.
The kernel exploits this:

  - features live PACKED: P = 128/C sites per 128-lane row
    ([cap/P, 128] bf16), so window DMAs stream at full HBM bandwidth
    with zero lane-padding waste;
  - per (block, offset): DMA the window (4x block slack), build the
    selection one-hot in VMEM from the prefetched relative indices, and
    run the "gather" as ONE MXU matmul  oh[512, WP] @ win[WP, 128];
  - per-site lane alignment (which of the P packet slots a neighbor
    occupies) is NOT resolved in VMEM: a compare-mask zeroes every
    packed slot except the neighbor's C channels, the full 128-lane
    row stores aligned into A [512, K*128], and the final contraction
    uses a P-replicated weight W2[k*128 + p*C + c] = W[k, c] so the
    MXU reads the channels from whichever slot they occupy (no dynamic
    lane gathers, no sub-128-lane stores anywhere);
  - one MXU contraction A @ W2[K*128, Cout] produces the conv output,
    which is re-packed to [512/P_out, 128] with static one-hot matmuls.

Misses (-1 rows) encode as one-hot rows of zeros — no masking pass.
Window overflow (a neighbor further than WP*P sites from the block
window start) zeroes that contribution; `build_windowed_rulebook`
returns an overflow count that is asserted zero in tests/bench (4x
slack makes overflow a pathological-density event; the reference's own
max_voxels capping sets the precedent for documented capacity knobs).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "WindowedRulebook",
    "pack_sites",
    "unpack_sites",
    "build_windowed_rulebook",
    "windowed_gather_gemm",
    "windowed_gather_dw",
    "windowed_conv_ad",
]

BLK = 512  # output sites per grid step
SLACK = 4  # window size in units of the block's packed rows


def _ring_slots(G: int, WP: int, budget_bytes: int = 6 << 20) -> int:
    """Window-DMA ring depth: as many slots as the scoped-VMEM budget
    allows (each slot is [WP, 128] bf16), min 2, capped at G + 1 (all
    windows in flight). Deep rings hide the per-(block, group) DMA
    latency the loop is otherwise bound by."""
    slot_bytes = WP * 128 * 2
    return max(2, min(G + 1, budget_bytes // slot_bytes))


def pack_factor(C: int) -> int:
    assert 128 % C == 0, f"channel width {C} must divide 128"
    return 128 // C


def pack_sites(feats, C: int):
    """[cap, C] -> packed [cap/P, 128] (P = 128/C sites per row)."""
    cap = feats.shape[0]
    P = pack_factor(C)
    assert cap % P == 0, (cap, P)
    return feats.reshape(cap // P, 128)


def unpack_sites(packed, C: int):
    """[capP, 128] -> [capP*P, C]."""
    return packed.reshape(-1, C)


class WindowedRulebook(NamedTuple):
    """Precomputed per-(block, offset) window starts + per-site relative
    packet/slot selectors. Built once per (site set, kernel) and shared
    by every conv in the stage (the reference's indice_key contract,
    ops/spconv/conv.py:152-179).

    s8:       [nblocks, G + 1] int32 — per-GROUP window start row in the
              packed array, plus a trailing active-block flag
    sel:      [nblocks, BLK, Kpad] int16 — (relp + 1) * 8 + slot
              (relp = packet index within window, -1 => miss/overflow;
              slot = packed slot index, lane base = slot * C); Kpad = K
              rounded up to 8 lanes. int16 halves the dominant per-conv
              input traffic vs int32 (the minor dim physically pads to
              128 elements either way).
    overflow: [] int32 — neighbors dropped by the window cap (diagnose
              with tests; must be 0 on real data)
    """

    s8: jnp.ndarray
    sel: jnp.ndarray
    overflow: jnp.ndarray


def build_windowed_rulebook(nbr, C: int, cap_in: int = None,
                            slack: int = SLACK, blk: int = BLK,
                            kz: int = 1, offset_major: bool = False):
    """nbr [cap_out, K] int32 neighbor rows into the *input* site array
    (-1 miss), monotone per offset column (guaranteed by sorted site
    ids) -> WindowedRulebook. cap_in = input site count (defaults to
    cap_out; differs for strided convs). Smaller ``blk`` suits
    high-slack (strided) convs: the one-hot matmul cost per site scales
    with slack * blk while window coverage stays slack * blk sites.

    ``offset_major=True``: nbr is [K, cap_out] (the lane-padding-free
    layout build_subm_rulebook(offset_major=True) emits — a [cap, K<128]
    int32 array pads its minor dim to 128 elements on this backend, so
    the whole build otherwise reads/writes 4.7x the useful bytes).

    ``kz``: adjacent kernel offsets per window GROUP. Offsets that share
    a (dx, dy) column differ only by the z step, so their neighbor runs
    are shifted by ±1 site and one window covers all kz of them — K/kz
    DMAs and K/kz (kz·blk)-row one-hot matmuls instead of K, batching
    the VPU work and keeping the MXU fed (kernel_offsets order is
    z-minor, so groups are contiguous offset triples)."""
    if not offset_major:
        nbr = nbr.T  # small/caller-compat path
    K, cap = nbr.shape
    assert K % kz == 0, (K, kz)
    G = K // kz
    if cap_in is None:
        cap_in = cap
    P = pack_factor(C)
    assert cap_in % P == 0, (cap_in, P)
    cap_pad = (cap + blk - 1) // blk * blk
    if cap_pad != cap:
        nbr = jnp.pad(nbr, ((0, 0), (0, cap_pad - cap)), constant_values=-1)
    nblocks = cap_pad // blk
    BLKP = blk // P
    WP = max(slack * BLKP, 8)
    assert (WP + 1) * 8 + 8 < 32768, WP  # sel encoding must fit int16
    capP = cap_in // P  # rows of the (un-padded) packed input array

    nb = nbr.reshape(G, kz, nblocks, blk)
    valid = nb >= 0
    # first valid neighbor row per (group, block) -> packed window start
    first = jnp.min(jnp.where(valid, nb, cap_in), axis=(1, 3))  # [G, nblocks]
    # window start: packed row, aligned down to the (8, 128) HBM tiling
    s8 = jnp.clip((first // P) & ~7, 0, max((capP - WP) & ~7, 0)).astype(jnp.int32)

    rel = nb - s8[:, None, :, None] * P
    fits = valid & (rel < WP * P)
    overflow = jnp.sum(valid & ~fits).astype(jnp.int32)
    relp = jnp.where(fits, rel // P, -1)
    slot = jnp.where(fits, rel % P, 0)
    sel = ((relp + 1) * 8 + slot).astype(jnp.int16).reshape(K, nblocks, blk)

    Kpad = (K + 7) // 8 * 8
    if Kpad != K:
        sel = jnp.pad(sel, ((0, Kpad - K), (0, 0), (0, 0)))
    sel = sel.transpose(1, 2, 0)  # [nblocks, blk, Kpad]
    # per-block any-valid flag (extra s8 column): sites are sorted with
    # padding at the tail, so cap-padding blocks are contiguous — the
    # kernels skip them entirely (writes zeros). At realistic occupancy
    # 30-65% of blocks per stage are pure padding.
    act = jnp.any(valid, axis=(0, 1, 3)).astype(jnp.int32)  # [nblocks]
    s8 = jnp.concatenate([s8.T, act[:, None]], axis=1)
    return WindowedRulebook(s8, sel, overflow)


def _kernel(s8_ref, sel_ref, fp_hbm, w_ref, *rest, K, Cin, Cout, WP, P,
            Pout, blk, kz=1, ns=2, fuse_bn=False, relu=False,
            residual=False):
    # optional epilogue operands (BN affine fold + residual), in order:
    # [scale (1, Cout) f32, shift (1, Cout) f32][, res (BLKPo, 128) bf16]
    i = 0
    scale_ref = shift_ref = res_ref = None
    if fuse_bn:
        scale_ref, shift_ref = rest[0], rest[1]
        i = 2
    if residual:
        res_ref = rest[i]
        i += 1
    out_ref, win, a_scr, sems = rest[i:i + 4]
    b = pl.program_id(0)
    BLK = blk
    BLKPo = BLK // Pout
    G = K // kz

    def dma(g, slot):
        start = pl.multiple_of(s8_ref[b, g], 8)  # builder 8-aligns starts
        return pltpu.make_async_copy(
            fp_hbm.at[pl.ds(start, WP)], win.at[slot], sems.at[slot]
        )

    # active-block gate (last s8 column): cap-padding blocks sit at the
    # sorted tail and write zeros without any DMA/compute
    act = s8_ref[b, G]

    @pl.when(act == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(act > 0)
    def _():
        # deep DMA ring (ns slots, VMEM-budgeted by the wrapper): the
        # loop is DMA-latency-bound, not bandwidth-bound — with depth-1
        # prefetch each (block, group) step stalled ~2 us on its wait
        # (measured: a no-compute variant still cost 4.8 ms/conv).
        # Reissue keeps a one-iteration gap from the slot's last read.
        for t in range(min(ns - 1, G)):
            dma(t, t % ns).start()
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (BLK, 128), 1)
        rows_iota = jax.lax.broadcasted_iota(jnp.int32, (BLK, WP), 1)

        for g in range(G):
            if g + ns - 1 < G:
                dma(g + ns - 1, (g + ns - 1) % ns).start()
            # per-dz one-hots stacked by 2D sublane concat (Mosaic
            # rejects 1D vector concat): one one-hot matmul + one
            # slot-mask per (dx, dy) window group. No per-lane dynamic
            # gather: the gathered window row keeps all P packed sites;
            # a compare-mask zeroes every slot except the neighbor's C
            # channels, the full 128-lane row is stored aligned, and
            # the final GEMM's P-replicated weight (wrapper) reads the
            # channels from whatever slot they sit in.
            ohs, msks = [], []
            for dz in range(kz):
                v = sel_ref[0, :, g * kz + dz].astype(jnp.int32)  # [BLK]
                relp = (v >> 3) - 1  # miss/overflow encode as relp -1
                lane = ((v & 7) * Cin)[:, None]
                ohs.append((rows_iota == relp[:, None]).astype(jnp.bfloat16))
                msks.append(((lane_iota >= lane) &
                             (lane_iota < lane + Cin)).astype(jnp.bfloat16))
            oh = ohs[0] if kz == 1 else jnp.concatenate(ohs, axis=0)
            msk = msks[0] if kz == 1 else jnp.concatenate(msks, axis=0)
            dma(g, g % ns).wait()
            g8 = jnp.dot(oh, win[g % ns], preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.DEFAULT)
            gm = g8.astype(jnp.bfloat16) * msk
            for dz in range(kz):
                k = g * kz + dz
                a_scr[:, k * 128:(k + 1) * 128] = gm[dz * BLK:(dz + 1) * BLK]

        y = jnp.dot(a_scr[...], w_ref[...], preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT)  # [BLK, Cout]
        yb = y.astype(jnp.bfloat16)
        if fuse_bn:
            # eval-time BN folded into the conv epilogue; the bf16
            # round-trip above reproduces the unfused path bit-exactly
            # (conv emits bf16, BN reads it back in f32)
            yf = (yb.astype(jnp.float32) * scale_ref[...]
                  + shift_ref[...])
            yb = yf.astype(jnp.bfloat16)
        if Pout == 1:
            out2 = yb
        else:
            # repack: P_out static one-hot row-selects + lane concat
            rows = jax.lax.broadcasted_iota(jnp.int32, (BLKPo, BLK), 1)
            sub = jax.lax.broadcasted_iota(jnp.int32, (BLKPo, BLK), 0)
            pieces = []
            for p in range(Pout):
                S = (rows == sub * Pout + p).astype(jnp.bfloat16)
                pieces.append(
                    jnp.dot(S, yb, preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.DEFAULT)
                    .astype(jnp.bfloat16))
            out2 = jnp.concatenate(pieces, axis=1)
        if residual:
            out2 = out2 + res_ref[...]
        if relu:
            out2 = jnp.maximum(out2, jnp.bfloat16(0))
        out_ref[...] = out2


def _kernel_sq(s8_ref, sel_ref, fp_hbm, w3_ref, *rest, K, Cin, Cout, WP, P,
               Pout, blk, kz=1, ns=2, fuse_bn=False, relu=False,
               residual=False):
    """Square-conv (Cin == Cout) fast path: the weight is folded into
    the WINDOW once per (block, group) — winproj = win @ W3 places every
    packed slot's W_k-transform in its own Cout-lane slot group — so the
    per-offset one-hot matmul directly yields slot-masked conv OUTPUTS.
    The [BLK, K*128] A-matrix, its VMEM traffic, and the [K*128, Cout]
    final GEMM all disappear: ~284M vs ~453M MACs per 512-site block.

    Numerics: winproj rounds each offset's partial W-contraction to
    bf16 before the cross-offset f32 accumulation (one extra bf16
    rounding vs the A-matrix path — training-grade; engine-parity
    tolerances account for it)."""
    i = 0
    scale_ref = shift_ref = res_ref = None
    if fuse_bn:
        scale_ref, shift_ref = rest[0], rest[1]
        i = 2
    if residual:
        res_ref = rest[i]
        i += 1
    out_ref, win, sems = rest[i:i + 3]
    b = pl.program_id(0)
    BLK = blk
    BLKPo = BLK // Pout
    G = K // kz

    def dma(g, slot):
        start = pl.multiple_of(s8_ref[b, g], 8)
        return pltpu.make_async_copy(
            fp_hbm.at[pl.ds(start, WP)], win.at[slot], sems.at[slot]
        )

    act = s8_ref[b, G]

    @pl.when(act == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(act > 0)
    def _():
        for t in range(min(ns - 1, G)):
            dma(t, t % ns).start()
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (BLK, 128), 1)
        rows_iota = jax.lax.broadcasted_iota(jnp.int32, (BLK, WP), 1)

        y128 = jnp.zeros((BLK, 128), jnp.float32)  # slot-space accumulator
        for g in range(G):
            if g + ns - 1 < G:
                dma(g + ns - 1, (g + ns - 1) % ns).start()
            dma(g, g % ns).wait()
            # fold W into the window: [WP, 128] @ [128, kz*128]
            wp = jnp.dot(win[g % ns],
                         w3_ref[g * 128:(g + 1) * 128, :],
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.DEFAULT
                         ).astype(jnp.bfloat16)
            for dz in range(kz):
                v = sel_ref[0, :, g * kz + dz].astype(jnp.int32)  # [BLK]
                relp = (v >> 3) - 1  # miss/overflow encode as relp -1
                lane = ((v & 7) * Cin)[:, None]
                oh = (rows_iota == relp[:, None]).astype(jnp.bfloat16)
                H = jnp.dot(oh, wp[:, dz * 128:(dz + 1) * 128],
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.DEFAULT)
                msk = (lane_iota >= lane) & (lane_iota < lane + Cin)
                y128 = y128 + jnp.where(msk, H, 0.0)

        # fold the P slot groups: lanes p*Cout + c -> c (exactly one
        # group is nonzero per site); a static one-hot matmul keeps the
        # reduce in MXU-friendly form (lane-space reshape-reduces lower
        # poorly in Mosaic)
        lane_r = jax.lax.broadcasted_iota(jnp.int32, (128, Cout), 0)
        col_r = jax.lax.broadcasted_iota(jnp.int32, (128, Cout), 1)
        S = (lane_r % Cout == col_r).astype(jnp.bfloat16)
        y = jnp.dot(y128.astype(jnp.bfloat16), S,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT)  # [BLK, Cout]
        yb = y.astype(jnp.bfloat16)
        if fuse_bn:
            yf = (yb.astype(jnp.float32) * scale_ref[...]
                  + shift_ref[...])
            yb = yf.astype(jnp.bfloat16)
        if Pout == 1:
            out2 = yb
        else:
            rows = jax.lax.broadcasted_iota(jnp.int32, (BLKPo, BLK), 1)
            sub = jax.lax.broadcasted_iota(jnp.int32, (BLKPo, BLK), 0)
            pieces = []
            for p in range(Pout):
                Sp = (rows == sub * Pout + p).astype(jnp.bfloat16)
                pieces.append(
                    jnp.dot(Sp, yb, preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.DEFAULT)
                    .astype(jnp.bfloat16))
            out2 = jnp.concatenate(pieces, axis=1)
        if residual:
            out2 = out2 + res_ref[...]
        if relu:
            out2 = jnp.maximum(out2, jnp.bfloat16(0))
        out_ref[...] = out2


def windowed_gather_gemm(feats_packed, wrb: WindowedRulebook, weight,
                         Cout: int, cap_out: int, slack: int = SLACK,
                         blk: int = BLK, kz: int = 1,
                         interpret: bool = False,
                         scale=None, shift=None, relu: bool = False,
                         residual=None, winproj: bool = True):
    """feats_packed [capP, 128] bf16; weight [K, Cin, Cout] -> packed
    output [cap_out/P_out, 128] bf16 (cap_out = un-padded output site
    count, a static int since jit flattens NamedTuple leaves). Drop-in
    accelerator for subm_gather_gemm (same contract via pack/unpack).
    ``kz`` must match the builder's offsets-per-window grouping.

    Fused epilogue (eval path — saves one full elementwise pass plus a
    dispatch per conv): ``scale``/``shift`` [Cout] f32 apply the folded
    BatchNorm affine y*scale + shift to the conv output (with the same
    bf16 round-trip as the unfused PackedMaskedBatchNorm); ``residual``
    [cap_out/P_out, 128] bf16 packed rows are added before ``relu``."""
    K, Cin, Cout_w = weight.shape
    assert Cout_w == Cout
    P = pack_factor(Cin)
    Pout = pack_factor(Cout)
    nblocks = wrb.s8.shape[0]
    WP = max(slack * (blk // P), 8)  # must match the builder's slack/blk
    BLKPo = blk // Pout

    # window DMAs read [s8, s8+WP); pad small feature arrays up to WP
    if feats_packed.shape[0] < WP:
        feats_packed = jnp.pad(
            feats_packed, ((0, WP - feats_packed.shape[0]), (0, 0)))

    KL = K * 128
    ns = _ring_slots(K // kz, WP)
    G = K // kz
    sq = winproj and Cin == Cout and not interpret
    if sq:
        # winproj weight (see _kernel_sq): W3[g, p*Cin + c',
        # dz*128 + p*Cout + c] = W[g*kz + dz, c', c] — a block-diagonal
        # per-slot replica so win @ W3 transforms every packed slot in
        # place ([G*128, kz*128] bf16, <1 MB in VMEM)
        wb = weight.astype(jnp.bfloat16).reshape(G, kz, Cin, Cout)
        eye = jnp.eye(P, dtype=jnp.bfloat16)
        wmat = jnp.einsum("pq,gdij->gpidqj", eye, wb).reshape(
            G * P * Cin, kz * P * Cout)
    else:
        # P-replicated weight: A holds each gathered neighbor's C
        # channels at packed-slot offset p*Cin within its 128-lane group
        # (other slots masked to zero in-kernel), so
        # W2[k*128 + p*Cin + c, :] = W[k, c, :] for every p makes A @ W2
        # the exact conv contraction.
        wmat = jnp.tile(weight.astype(jnp.bfloat16)[:, None], (1, P, 1, 1))
        wmat = wmat.reshape(KL, Cout)

    fuse_bn = scale is not None
    assert (shift is not None) == fuse_bn
    extra_in, extra_specs = [], []
    if fuse_bn:
        extra_in += [scale.reshape(1, Cout).astype(jnp.float32),
                     shift.reshape(1, Cout).astype(jnp.float32)]
        extra_specs += [
            pl.BlockSpec((1, Cout), lambda b, m: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cout), lambda b, m: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
    if residual is not None:
        need = nblocks * BLKPo
        if residual.shape[0] < need:
            residual = jnp.pad(
                residual, ((0, need - residual.shape[0]), (0, 0)))
        extra_in.append(residual.astype(jnp.bfloat16))
        extra_specs.append(pl.BlockSpec((BLKPo, 128), lambda b, m: (b, 0),
                                        memory_space=pltpu.VMEM))

    w_spec = pl.BlockSpec(tuple(wmat.shape), lambda b, m: (0, 0),
                          memory_space=pltpu.VMEM)
    scratch = [pltpu.VMEM((ns, WP, 128), jnp.bfloat16)]
    if not sq:
        scratch.append(pltpu.VMEM((blk, KL), jnp.bfloat16))
    scratch.append(pltpu.SemaphoreType.DMA((ns,)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((1, blk, wrb.sel.shape[2]), lambda b, m: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            w_spec,
        ] + extra_specs,
        out_specs=pl.BlockSpec((BLKPo, 128), lambda b, m: (b, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )

    kern = functools.partial(_kernel_sq if sq else _kernel,
                             K=K, Cin=Cin, Cout=Cout, WP=WP, P=P,
                             Pout=Pout, blk=blk, kz=kz, ns=ns,
                             fuse_bn=fuse_bn, relu=relu,
                             residual=residual is not None)

    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nblocks * BLKPo, 128), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(wrb.s8, wrb.sel, feats_packed, wmat, *extra_in)
    return out[: cap_out // Pout]


def _kernel_dw(s8_ref, sel_ref, fp_hbm, dout_ref, dw_ref, win, a_scr, sems, *,
               K, Cin, Cout, WP, P, Pout, blk, kz=1, ns=2):
    """Weight-gradient kernel: same windowed gather as _kernel to build
    A [BLK, K*Cin], then accumulate dW += A^T @ dout_blk across blocks
    (the transposed GEMM of spconv's indiceConvBackward filters-grad,
    spconv_ops.h:364+)."""
    b = pl.program_id(0)
    BLK = blk
    BLKPo = BLK // Pout
    G = K // kz

    def dma(g, slot):
        start = pl.multiple_of(s8_ref[b, g], 8)
        return pltpu.make_async_copy(
            fp_hbm.at[pl.ds(start, WP)], win.at[slot], sems.at[slot]
        )

    act = s8_ref[b, G]

    @pl.when(b == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    @pl.when(act > 0)
    def _():
        for t in range(min(ns - 1, G)):
            dma(t, t % ns).start()
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (BLK, 128), 1)
        rows_iota = jax.lax.broadcasted_iota(jnp.int32, (BLK, WP), 1)

        for g in range(G):
            if g + ns - 1 < G:
                dma(g + ns - 1, (g + ns - 1) % ns).start()
            # same slot-masked gather as _kernel (no per-lane dynamic
            # gather); the wrapper folds the P-replicated dW back down
            ohs, msks = [], []
            for dz in range(kz):
                v = sel_ref[0, :, g * kz + dz].astype(jnp.int32)  # [BLK]
                relp = (v >> 3) - 1  # miss/overflow encode as relp -1
                lane = ((v & 7) * Cin)[:, None]
                ohs.append((rows_iota == relp[:, None]).astype(jnp.bfloat16))
                msks.append(((lane_iota >= lane) &
                             (lane_iota < lane + Cin)).astype(jnp.bfloat16))
            oh = ohs[0] if kz == 1 else jnp.concatenate(ohs, axis=0)
            msk = msks[0] if kz == 1 else jnp.concatenate(msks, axis=0)
            dma(g, g % ns).wait()
            g8 = jnp.dot(oh, win[g % ns], preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.DEFAULT)
            gm = g8.astype(jnp.bfloat16) * msk
            for dz in range(kz):
                k = g * kz + dz
                a_scr[:, k * 128:(k + 1) * 128] = gm[dz * BLK:(dz + 1) * BLK]

        # unpack dout [BLKPo, 128] -> [BLK, Cout] with static one-hot
        # selects
        dp = dout_ref[...]
        if Pout == 1:
            dmat = dp
        else:
            rows = jax.lax.broadcasted_iota(jnp.int32, (BLK, BLKPo), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (BLK, BLKPo), 1)
            acc = None
            for p in range(Pout):
                S = (rows == cols * Pout + p).astype(jnp.bfloat16)
                piece = dp[:, p * Cout:(p + 1) * Cout]
                c = jnp.dot(S, piece, preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.DEFAULT)
                acc = c if acc is None else acc + c
            dmat = acc.astype(jnp.bfloat16)

        dwb = jax.lax.dot_general(
            a_scr[...], dmat, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)  # [K*128, Cout]
        dw_ref[...] += dwb


def windowed_gather_dw(feats_packed, wrb: WindowedRulebook, dout_packed,
                       K: int, Cin: int, Cout: int, slack: int = SLACK,
                       blk: int = BLK, kz: int = 1):
    """Weight gradient of windowed_gather_gemm: feats_packed
    [capP_in, 128] bf16, dout_packed [cap_out/P_out, 128] bf16 ->
    dW [K, Cin, Cout] f32."""
    P = pack_factor(Cin)
    Pout = pack_factor(Cout)
    nblocks = wrb.s8.shape[0]
    WP = max(slack * (blk // P), 8)
    BLKPo = blk // Pout

    if feats_packed.shape[0] < WP:
        feats_packed = jnp.pad(
            feats_packed, ((0, WP - feats_packed.shape[0]), (0, 0)))
    # pad dout to the rulebook's padded block count (zero rows for the
    # site-cap tail; their A rows are zero anyway)
    need = nblocks * BLKPo
    if dout_packed.shape[0] < need:
        dout_packed = jnp.pad(
            dout_packed, ((0, need - dout_packed.shape[0]), (0, 0)))

    KL = K * 128
    # dW holds [K*128, Cout] f32 in VMEM too — tighter window budget
    ns = _ring_slots(K // kz, WP, budget_bytes=4 << 20)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((1, blk, wrb.sel.shape[2]), lambda b, m: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((BLKPo, 128), lambda b, m: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((KL, Cout), lambda b, m: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((ns, WP, 128), jnp.bfloat16),
            pltpu.VMEM((blk, KL), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((ns,)),
        ],
    )

    kern = functools.partial(_kernel_dw, K=K, Cin=Cin, Cout=Cout, WP=WP, P=P,
                             Pout=Pout, blk=blk, kz=kz, ns=ns)
    dw = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((KL, Cout), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(wrb.s8, wrb.sel, feats_packed, dout_packed)
    # fold the per-slot replicas: A's column (k, p*Cin + c) holds channel
    # c of neighbors sitting at packed slot p (zeros elsewhere), so
    # summing over p recovers dW[k, c, :]
    return dw.reshape(K, P, Cin, Cout).sum(axis=1)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(4, 5, 6, 7, 8, 9, 10, 11, 12))
def windowed_conv_ad(feats_packed, weight, wrb, wrb_bwd,
                     Cout: int, cap_out: int, cap_in: int,
                     slack: int, slack_bwd: int, mirror: bool,
                     kz: int = 1, blk: int = BLK, blk_bwd: int = BLK):
    """Differentiable windowed conv (training path of the windowed
    engine; reference trains through spconv's indiceConvBackward,
    spconv_ops.h:364+).

    feats_packed [cap_in/P, 128] bf16; weight [K, Cin, Cout].
    mirror=True (submanifold): input/output site sets coincide and
    Cin == Cout, so backward-data reuses the FORWARD rulebook with the
    offset-mirrored transposed weight (pair (o,k)=(i) <-> (i,K-1-k)=(o)).
    mirror=False (strided): wrb_bwd must be the windowed rulebook built
    from build_conv_transpose_rulebook over the OUTPUT sites with the
    output channel packing. A fwd-dropped window-overflow pair is
    dropped identically in backward (same table), so the gradient is
    exact for the computed forward.
    """
    return windowed_gather_gemm(feats_packed, wrb, weight, Cout, cap_out,
                                slack=slack, kz=kz, blk=blk)


def _wc_fwd(feats_packed, weight, wrb, wrb_bwd, Cout, cap_out, cap_in,
            slack, slack_bwd, mirror, kz=1, blk=BLK, blk_bwd=BLK):
    out = windowed_gather_gemm(feats_packed, wrb, weight, Cout, cap_out,
                               slack=slack, kz=kz, blk=blk)
    return out, (feats_packed, weight, wrb, wrb_bwd)


def _wc_bwd(Cout, cap_out, cap_in, slack, slack_bwd, mirror, kz, blk,
            blk_bwd, res, dout):
    feats_packed, weight, wrb, wrb_bwd = res
    K, Cin, _ = weight.shape
    dout = dout.astype(jnp.bfloat16)

    dw = windowed_gather_dw(feats_packed, wrb, dout, K, Cin, Cout,
                            slack=slack, kz=kz, blk=blk).astype(weight.dtype)
    if mirror:
        assert Cin == Cout, "mirror backward requires Cin == Cout"
        wt = weight[::-1].transpose(0, 2, 1).astype(jnp.bfloat16)
        dx = windowed_gather_gemm(dout, wrb, wt, Cin, cap_in, slack=slack,
                                  kz=kz, blk=blk)
    else:
        wt = weight.transpose(0, 2, 1).astype(jnp.bfloat16)
        dx = windowed_gather_gemm(dout, wrb_bwd, wt, Cin, cap_in,
                                  slack=slack_bwd, kz=kz, blk=blk_bwd)
    return dx.astype(feats_packed.dtype), dw, None, None


windowed_conv_ad.defvjp(_wc_fwd, _wc_bwd)

"""Windowed-conv kernel variant bench: isolate where the ~6-8 ms/conv
goes and test candidate optimizations.

Variants:
  current      — production kernel (dynamic take_along_axis lane align)
  roll         — lane align via P static lane-rotates + selects
  noalign      — skip lane alignment entirely (wrong numerics; cost floor)
  nohot        — skip one-hot matmul too (DMA + final GEMM only)
Each at stage0/stage1 shapes, BLK in {256, 512}.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from bevfusion_tpu.ops import sparse_conv as sp
from bevfusion_tpu.ops import sparse_conv_windowed as wg


def _kernel(s8_ref, sel_ref, fp_hbm, w_ref, out_ref, win, a_scr, sems, *,
            K, Cin, Cout, WP, P, Pout, blk, mode):
    b = pl.program_id(0)
    BLK = blk
    BLKPo = BLK // Pout

    def dma(k, slot):
        start = pl.multiple_of(s8_ref[b, k], 8)
        return pltpu.make_async_copy(
            fp_hbm.at[pl.ds(start, WP)], win.at[slot], sems.at[slot])

    dma(0, 0).start()
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (BLK, 128), 1)
    rows_iota = jax.lax.broadcasted_iota(jnp.int32, (BLK, WP), 1)
    KC = K * Cin
    if a_scr.shape[1] > KC:
        a_scr[:, KC:] = jnp.zeros((BLK, a_scr.shape[1] - KC), jnp.bfloat16)

    for k in range(K):
        if k + 1 < K:
            dma(k + 1, (k + 1) % 2).start()
        v = sel_ref[0, :, k]
        relp = v // 256 - 1
        lane = v % 256
        dma(k, k % 2).wait()
        if mode == "nohot":
            wv = win[k % 2]
            if WP < BLK:
                wv = jnp.concatenate([wv] * (BLK // WP))
            g = wv[:BLK].astype(jnp.float32)
        else:
            oh = (rows_iota == relp[:, None]).astype(jnp.bfloat16)
            g8 = jnp.dot(oh, win[k % 2], preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.DEFAULT)
            if mode == "current":
                idx = jnp.minimum(lane[:, None] + lane_iota, 127)
                g = jnp.take_along_axis(g8, idx, axis=1)
            elif mode == "roll":
                slot = lane // Cin  # 0..P-1
                g = jnp.zeros_like(g8)
                for p in range(P):
                    rolled = (g8 if p == 0 else
                              pltpu.roll(g8, 128 - p * Cin, 1))
                    g = jnp.where((slot == p)[:, None], rolled, g)
            else:  # noalign
                g = g8
        a_scr[:, k * Cin:(k + 1) * Cin] = g[:, :Cin].astype(jnp.bfloat16)

    y = jnp.dot(a_scr[...], w_ref[...], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
    yb = y.astype(jnp.bfloat16)
    if Pout == 1:
        out_ref[...] = yb
    else:
        rows = jax.lax.broadcasted_iota(jnp.int32, (BLKPo, BLK), 1)
        sub = jax.lax.broadcasted_iota(jnp.int32, (BLKPo, BLK), 0)
        pieces = []
        for p in range(Pout):
            S = (rows == sub * Pout + p).astype(jnp.bfloat16)
            pieces.append(
                jnp.dot(S, yb, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.DEFAULT)
                .astype(jnp.bfloat16))
        out_ref[...] = jnp.concatenate(pieces, axis=1)


def run_variant(feats_packed, wrb, weight, Cout, cap_out, slack, blk, mode):
    K, Cin, _ = weight.shape
    P = wg.pack_factor(Cin)
    Pout = wg.pack_factor(Cout)
    nblocks = wrb.s8.shape[0]
    WP = max(slack * (blk // P), 8)
    BLKPo = blk // Pout
    if feats_packed.shape[0] < WP:
        feats_packed = jnp.pad(
            feats_packed, ((0, WP - feats_packed.shape[0]), (0, 0)))
    KC = K * Cin
    KCpad = (KC + 127) // 128 * 128
    wmat = weight.reshape(KC, Cout).astype(jnp.bfloat16)
    wmat = jnp.pad(wmat, ((0, KCpad - KC), (0, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((1, blk, wrb.sel.shape[2]), lambda b, m: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((KCpad, Cout), lambda b, m: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLKPo, 128), lambda b, m: (b, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, WP, 128), jnp.bfloat16),
            pltpu.VMEM((blk, KCpad), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kern = functools.partial(_kernel, K=K, Cin=Cin, Cout=Cout, WP=WP, P=P,
                             Pout=Pout, blk=blk, mode=mode)
    out = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nblocks * BLKPo, 128), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(wrb.s8, wrb.sel, feats_packed, wmat)
    return out[: cap_out // Pout]


def main():
    from bevfusion_tpu.runtime.flagship import synthetic_lidar_scan
    pcr = [-54.0, -54.0, -5.0, 54.0, 54.0, 3.0]
    pts, mask = synthetic_lidar_scan(120000, pcr, seed=0)
    p = pts[mask]
    grid0 = sp.SparseGrid(1440, 1440, 41)
    vox = np.floor((p[:, :3] - np.array(pcr[:3], np.float32)) / 0.075).astype(np.int64)
    vox = np.clip(vox, 0, [1439, 1439, 40])
    ids0 = np.unique((vox[:, 0] * 1440 + vox[:, 1]) * 41 + vox[:, 2])
    cap0 = 120000
    ids_arr = np.full(cap0, grid0.size, np.int32)
    ids_arr[:len(ids0)] = ids0
    ids0_j = jnp.asarray(ids_arr)

    nbr = jax.jit(lambda i: sp.build_subm_rulebook(i, grid0, 3))(ids0_j)
    rng = np.random.RandomState(0)

    def timed(name, fn, *args, iters=10):
        f = jax.jit(fn)
        out = f(*args)
        float(np.asarray(jnp.sum(out.astype(jnp.float32))))
        for _ in range(2):
            out = f(*args)
        float(np.asarray(jnp.sum(out.astype(jnp.float32))))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        float(np.asarray(jnp.sum(out.astype(jnp.float32))))
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"{name:48s} {dt:8.2f} ms", flush=True)
        return out

    for C in (16, 32):
        P = wg.pack_factor(C)
        packed = jnp.asarray(rng.randn(cap0 // P, 128).astype(np.float32),
                             dtype=jnp.bfloat16)
        w = jnp.asarray(rng.randn(27, C, C).astype(np.float32) * 0.1,
                        dtype=jnp.bfloat16)
        for blk in (256, 512):
            wrb = jax.jit(lambda n: wg.build_windowed_rulebook(
                n, C, slack=2, blk=blk))(nbr)
            ref = None
            for mode in ("current", "roll", "noalign", "nohot"):
                out = timed(f"C={C} blk={blk} {mode}",
                            lambda pk, wr, ww, m=mode, b=blk:
                            run_variant(pk, wr, ww, C, cap0, 2, b, m),
                            packed, wrb, w)
                if mode == "current":
                    ref = np.asarray(out, np.float32)
                elif mode == "roll":
                    err = np.max(np.abs(np.asarray(out, np.float32) - ref))
                    print(f"   roll vs current max err: {err}")


if __name__ == "__main__":
    main()

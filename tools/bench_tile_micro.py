"""Microbenchmarks that decide the tiled-dense sparse-conv design:

1. xla_ew      — XLA elementwise HBM rate (the 72 GB/s calibration)
2. copy_bw     — Pallas blocked HBM->VMEM->HBM rate (pipelined BlockSpecs)
3. dma_rand    — random-slot tile DMAs: G tiles of [R, 128] bf16 per grid
                 step from an HBM pool; per-DMA issue + bandwidth
4. matmul      — MXU rate at tiled-dense conv shapes (K=27*Cin, N=Cout)

Run: python tools/bench_tile_micro.py
"""
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


def timeit(fn, *args, iters=20):
    out = fn(*args)
    float(np.asarray(jnp.sum(out.astype(jnp.float32)))) if hasattr(out, "astype") else None
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(np.asarray(jnp.sum(out.astype(jnp.float32))))
    return (time.perf_counter() - t0) / iters * 1e3


def bench_xla_ew():
    x = jnp.ones((64, 1024, 1024), jnp.bfloat16)  # 128 MB
    f = jax.jit(lambda a: a + 1)
    dt = timeit(f, x)
    gb = 2 * x.size * 2 / 1e9
    print(f"xla_ew    128MB r+w: {dt:6.2f} ms  -> {gb/dt*1e3:6.1f} GB/s")


def bench_copy_bw(M=65536, blk=512):
    x = jnp.ones((M, 1024), jnp.bfloat16)  # 128 MB

    def kern(i_ref, o_ref):
        o_ref[:] = i_ref[:] + 1

    f = jax.jit(lambda a: pl.pallas_call(
        kern,
        grid=(M // blk,),
        in_specs=[pl.BlockSpec((blk, 1024), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((blk, 1024), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, 1024), jnp.bfloat16),
    )(a))
    dt = timeit(f, x)
    gb = 2 * x.size * 2 / 1e9
    print(f"pallas_bw {x.size*2//2**20}MB blk={blk} r+w: {dt:6.2f} ms  "
          f"-> {gb/dt*1e3:6.1f} GB/s")


def bench_dma_rand(T=8192, R=128, G=8, steps=1024):
    """steps grid steps, each DMAs G random tile rows [R, 128] bf16 from a
    [T*R, 128] pool into VMEM, sums them. Measures scattered-DMA rate:
    bytes = steps*G*R*128*2."""
    pool = jnp.ones((T * R, 128), jnp.bfloat16)
    # 1-D: SMEM scalar-prefetch pads the minor dim to 128 lanes
    slots = jnp.asarray(
        (np.random.randint(0, T, (steps * G)) * R), jnp.int32)

    def kern(slots_ref, pool_hbm, o_ref, scr, sems):
        s = pl.program_id(0)

        def dma(g, slot):
            start = pl.multiple_of(slots_ref[s * G + g], 8)
            return pltpu.make_async_copy(
                pool_hbm.at[pl.ds(start, R)], scr.at[slot], sems.at[slot])

        for g in range(G):
            dma(g, g % 2).start()
            if g > 0:
                dma(g - 1, (g - 1) % 2).wait()
            if g == G - 1:
                dma(g, g % 2).wait()
        acc = scr[0] + scr[1]
        o_ref[:] = acc.astype(jnp.bfloat16)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(steps,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((R, 128), lambda s, *_: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2, R, 128), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA((2,))],
    )
    f = jax.jit(lambda sl, p: pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, 128), jnp.bfloat16),
    )(sl, p))
    dt = timeit(f, slots, pool)
    n_dma = steps * G
    gb = n_dma * R * 128 * 2 / 1e9
    print(f"dma_rand R={R:4d} G={G} steps={steps}: {dt:6.2f} ms  "
          f"-> {gb/dt*1e3:6.1f} GB/s, {dt*1e6/n_dma:6.0f} ns/DMA "
          f"({R*128*2//1024} KB each)")


def bench_matmul(M, K, N):
    a = jnp.ones((M, K), jnp.bfloat16)
    b = jnp.ones((K, N), jnp.bfloat16)
    f = jax.jit(lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.float32))
    dt = timeit(f, a, b, iters=50)
    fl = 2 * M * K * N / 1e12
    print(f"matmul M{M} K{K} N{N}: {dt:6.3f} ms -> {fl/dt*1e3:6.1f} TFLOP/s")


if __name__ == "__main__":
    print(f"devices: {jax.devices()}")
    bench_copy_bw(blk=1024)
    # tile rows: 8x8x4 tile @C16 = 256 voxels * 16ch = [32, 128] rows
    bench_dma_rand(R=32, G=8, steps=4096)    # 8 KB DMAs
    bench_dma_rand(R=128, G=8, steps=2048)   # 32 KB DMAs
    bench_dma_rand(R=512, G=4, steps=1024)   # 128 KB DMAs
    bench_dma_rand(R=8, G=8, steps=4096)     # 2 KB DMAs (face strips)
    bench_matmul(4096, 432, 16)    # stage0 subm im2col, N=Cout=16
    bench_matmul(4096, 432, 128)   # N padded to 128
    bench_matmul(16384, 432, 128)
    bench_matmul(16384, 864, 32)   # stage1 (Cin32): K=27*32
    bench_matmul(16384, 1728, 64)  # stage2
    bench_matmul(8192, 128, 128)

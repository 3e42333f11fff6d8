"""Chained (single-dispatch) microbenches that size the windowed-kernel
parameters:

1. matmul K-sweep: is a K=64 contraction half the time of K=128 on the
   MXU, or does the systolic array charge K=128 regardless? Decides the
   one-hot gather window width (WP) / block size tradeoff.
2. matmul N-sweep at conv shapes (N=16/32/64/128).
3. row-gather from a [2M, 3] int32 table vs a [2M, 8] and [2M, 128]:
   detects physical lane padding of small-minor-dim tables.
4. scatter-set into [2M, 3] (column-table build form) vs 3 separate 1D
   scatters.

All loops are chained inside ONE jit with data dependencies (the
per-dispatch overhead through the axon tunnel is ~1 ms, larger than
most of these ops).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

REPS = 40


def timeit(fn, *args, iters=5):
    out = fn(*args)
    float(np.asarray(jnp.sum(out.astype(jnp.float32))))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(np.asarray(jnp.sum(out.astype(jnp.float32))))
    return (time.perf_counter() - t0) / iters * 1e3 / REPS


def bench_matmul_chain(M, K, N, label=""):
    a = jnp.ones((M, K), jnp.bfloat16)
    ws = jnp.ones((REPS, K, N), jnp.bfloat16) * 0.01

    def f(a, ws):
        def step(acc, w):
            y = jnp.dot(a, w, preferred_element_type=jnp.float32)
            # dependency: fold a scalar of y back into the accumulator
            return acc + jnp.sum(y[:1, :1]), None

        acc, _ = jax.lax.scan(step, jnp.float32(0), ws)
        return acc

    dt = timeit(jax.jit(f), a, ws)
    fl = 2 * M * K * N / 1e12
    print(f"mm {label} M{M} K{K} N{N}: {dt*1e3:7.1f} us -> {fl/dt*1e3:6.1f} TF/s")
    return dt


def bench_take_rows(R, Cm, n_idx, label=""):
    tab = jnp.ones((R, Cm), jnp.int32)
    idx = jnp.asarray(np.random.randint(0, R, (REPS, n_idx)), jnp.int32)

    def f(tab, idx):
        def step(acc, ix):
            g = jnp.take(tab, ix, axis=0)  # [n_idx, Cm]
            return acc + g[0, 0] + acc % 7, None

        acc, _ = jax.lax.scan(step, jnp.int32(0), idx)
        return acc

    dt = timeit(jax.jit(f), tab, idx)
    print(f"take {label} [{R},{Cm}] x{n_idx}: {dt*1e3:7.1f} us "
          f"({n_idx/dt/1e6:6.1f} M rows/s)")


def bench_table_scatter(XY, cap):
    tgt = jnp.asarray(np.random.permutation(XY + 1)[:cap], jnp.int32)
    v3 = jnp.ones((cap, 3), jnp.int32)
    v1 = jnp.ones((cap,), jnp.int32)

    def f3(tgt, v3):
        def step(acc, _):
            t = (jnp.zeros((XY + 1, 3), jnp.int32)
                 .at[tgt + acc % 2].set(v3, mode="drop", unique_indices=True))
            return acc + t[0, 0], None
        acc, _ = jax.lax.scan(step, jnp.int32(0), jnp.arange(REPS))
        return acc

    def f1(tgt, v1):
        def step(acc, _):
            o = []
            for i in range(3):
                o.append(jnp.zeros((XY + 1,), jnp.int32)
                         .at[tgt + acc % 2].set(v1, mode="drop",
                                                unique_indices=True))
            return acc + o[0][0] + o[1][1] + o[2][2], None
        acc, _ = jax.lax.scan(step, jnp.int32(0), jnp.arange(REPS))
        return acc

    print(f"scatter [XY+1,3] packed : {timeit(jax.jit(f3), tgt, v3)*1e3:7.1f} us")
    print(f"scatter 3x [XY+1] 1d    : {timeit(jax.jit(f1), tgt, v1)*1e3:7.1f} us")


if __name__ == "__main__":
    print(f"devices: {jax.devices()}")
    # K-sweep at the one-hot gather shape (oh [kz*BLK, WP] @ win [WP, 128])
    for K in (32, 64, 128, 256):
        bench_matmul_chain(4608, K, 128, "oh")
    # N-sweep at conv-output shapes
    for N in (16, 32, 64, 128):
        bench_matmul_chain(16384, 432, N, "conv")
    # band-form tiled conv shapes ([T*R, 256] @ [256, 128])
    bench_matmul_chain(2780 * 64, 256, 128, "band-s1")
    bench_matmul_chain(2314 * 16, 256, 128, "band-s2")
    # table row-gather minor-dim sweep (column-table fetch form)
    bench_take_rows(2073600, 3, 120000, "tbl3")
    bench_take_rows(2073600, 8, 120000, "tbl8")
    bench_take_rows(2073600, 9, 120000, "tbl9")
    bench_take_rows(2073600, 128, 120000, "tbl128")
    bench_table_scatter(2073600, 120000)

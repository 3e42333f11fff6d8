"""Micro-profile of the sparse encoder internals at flagship scale.

Times every constituent of the windowed engine separately (rulebook
meta, downsample_sites, windowed convs per stage, BN) on the real chip
with ring-scan site distributions, to rank the encoder's internal
bottlenecks. Complements tools/profile_stages.py (which showed the
encoder is 73% of the frame).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from bevfusion_tpu.ops import sparse_conv as sp
    from bevfusion_tpu.ops import sparse_conv_windowed as wg
    from bevfusion_tpu.runtime.flagship import synthetic_lidar_scan

    rows = []

    def timed(name, fn, *fargs, iters=10):
        @jax.jit
        def f(*a):
            out = fn(*a)
            leaves = jax.tree_util.tree_leaves(out)
            chk = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves
                      if hasattr(l, "dtype"))
            return out, chk

        out, chk = f(*fargs)
        float(np.asarray(chk))
        for _ in range(2):
            out, chk = f(*fargs)
        float(np.asarray(chk))
        t0 = time.perf_counter()
        for _ in range(iters):
            out, chk = f(*fargs)
        float(np.asarray(chk))
        dt = (time.perf_counter() - t0) / iters * 1e3
        rows.append((name, dt))
        print(f"{name:44s} {dt:8.2f} ms", flush=True)
        return out

    # ---- real site distribution from the ring scan ---------------------
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
    print(f"stage0 sites: {len(ids0)} / cap {cap0}")

    # stage channel plan (flagship): conv_input 5->16, stage0 16ch x4,
    # s2 ->32; stage1 32ch x4, s2 ->64; stage2 64ch x4, s2 ->128 ...
    # Build per-stage site sets by downsampling.
    slack = 2

    def table(ids):
        return sp.build_column_table(ids, None) if False else None

    # -- meta per stage --------------------------------------------------
    stage_ids = {0: ids0_j}
    grids = {0: grid0}
    caps = {0: cap0}
    for s in range(3):
        g = grids[s]
        og = sp.conv_out_shape(g, 3, 2, 1)
        cap_out = max(8192, caps[s] * 6 // 8)
        out = timed(f"downsample_sites stage{s} ({caps[s]} sites)",
                    lambda i_, g_=g, c_=cap_out: sp.downsample_sites(
                        i_, g_, 3, 2, 1, c_), stage_ids[s])
        oids = out[0]
        n = int(np.asarray(jnp.sum(out[1])))
        print(f"   -> stage{s+1} sites {n} / cap {cap_out}")
        stage_ids[s + 1] = oids
        grids[s + 1] = og
        caps[s + 1] = cap_out

    tables = {}
    for s, C in ((0, 16), (1, 32), (2, 64), (3, 128)):
        tables[s] = timed(f"column_table stage{s}",
                          lambda i_, g_=grids[s]: sp.build_column_table(i_, g_),
                          stage_ids[s])
    nbrs = {}
    for s, C in ((0, 16), (1, 32), (2, 64), (3, 128)):
        nbrs[s] = timed(f"subm_rulebook stage{s}",
                        lambda i_, t_, g_=grids[s]: sp.build_subm_rulebook(
                            i_, g_, 3, table=t_), stage_ids[s], tables[s])
    wrbs = {}
    for s, C in ((0, 16), (1, 32), (2, 64), (3, 128)):
        wrbs[s] = timed(f"windowed_rulebook stage{s} C={C}",
                        lambda n_, C_=C: wg.build_windowed_rulebook(
                            n_, C_, slack=slack), nbrs[s])

    # strided conv rulebooks
    for s in range(3):
        timed(f"conv_rulebook s2 stage{s}",
              lambda oi, ii, g_=grids[s], og_=grids[s + 1]:
              sp.build_conv_rulebook(ii, oi, g_, og_, 3, 2, 1),
              stage_ids[s + 1], stage_ids[s])

    # -- conv kernels ----------------------------------------------------
    rng = np.random.RandomState(0)
    for s, C in ((0, 16), (1, 32), (2, 64), (3, 128)):
        P = wg.pack_factor(C)
        capP = caps[s] // P
        packed = jnp.asarray(rng.randn(capP, 128).astype(np.float32),
                             dtype=jnp.bfloat16)
        w = jnp.asarray(rng.randn(27, C, C).astype(np.float32) * 0.05,
                        dtype=jnp.bfloat16)
        timed(f"windowed conv stage{s} C={C} ({caps[s]} cap)",
              lambda p_, wr_, w_, C_=C, cap_=caps[s]: wg.windowed_gather_gemm(
                  p_, wr_, w_, C_, cap_, slack=slack), packed, wrbs[s], w)

    total = sum(dt for _, dt in rows)
    print(f"\nmeta+conv total: {total:.1f} ms")
    print("\n| op | ms |\n|---|---|")
    for name, dt in rows:
        print(f"| {name} | {dt:.2f} |")


if __name__ == "__main__":
    main()

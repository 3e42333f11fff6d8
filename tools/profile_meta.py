"""Per-op breakdown of the windowed-encoder meta chain (rulebooks).

Times each meta op at its stage-realistic inputs: stage ids are first
computed by running the downsample chain once, then each op is jitted
and timed in isolation. Per-dispatch overhead (~0.3-0.5 ms) inflates
each row slightly; use rows for ranking, profile_encoder2.py for the
fused total.
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

    pcr = [-54.0, -54.0, -5.0, 54.0, 54.0, 3.0]
    pts, mask = synthetic_lidar_scan(120000, pcr, seed=0)
    p = pts[mask]
    grid0 = sp.SparseGrid(1440, 1440, 41)
    vox = np.floor((p[:, :3] - np.array(pcr[:3], np.float32)) / 0.075)
    vox = np.clip(vox.astype(np.int64), 0, [1439, 1439, 40])
    ids0 = np.unique((vox[:, 0] * 1440 + vox[:, 1]) * 41 + vox[:, 2])
    cap0 = 120000
    ids_arr = np.full(cap0, grid0.size, np.int32)
    ids_arr[:len(ids0)] = ids0

    site_caps = [100000, 60000, 36000]
    slack = 2

    # --- compute per-stage ids once -------------------------------------
    stages = []  # (ids, grid, cap)
    ids, grid, cap = jnp.asarray(ids_arr), grid0, cap0
    for s in range(4):
        stages.append((ids, grid, cap))
        if s < 3:
            og = sp.conv_out_shape(grid, 3, 2, 1)
            cap_out = site_caps[s]
            out_ids, _ = jax.jit(
                lambda i, g=grid, og=og, c=cap_out: sp.downsample_sites(
                    i, g, 3, 2, 1, c))(ids)
            ids, grid, cap = out_ids, og, cap_out
    chans = [16, 32, 64, 128]

    def timed(name, fn, *args, iters=10):
        f = jax.jit(fn)
        out = f(*args)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        for _ in range(2):
            out = f(*args)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"{name:52s} {dt:8.2f} ms", flush=True)
        return dt

    total = 0.0
    for s in range(4):
        ids, grid, cap = stages[s]
        C = chans[s]
        print(f"-- stage {s}: cap={cap} grid={tuple(grid)} C={C}")
        total += timed(f"s{s} build_column_table", lambda i, g=grid:
                       sp.build_column_table(i, g).packed.sum(), ids)
        tbl = jax.jit(lambda i, g=grid: sp.build_column_table(i, g))(ids)
        total += timed(f"s{s} build_subm_rulebook (tbl given)",
                       lambda i, t, g=grid:
                       sp.build_subm_rulebook(i, g, 3, table=t).sum(), ids, tbl)
        nbr = jax.jit(lambda i, t, g=grid:
                      sp.build_subm_rulebook(i, g, 3, table=t))(ids, tbl)
        total += timed(f"s{s} build_windowed_rulebook (subm)",
                       lambda n, C=C: wg.build_windowed_rulebook(
                           n, C, slack=slack).s8.sum(), nbr)
        if s < 3:
            og = sp.conv_out_shape(grid, 3, 2, 1)
            cap_out = site_caps[s]
            total += timed(f"s{s} downsample_sites",
                           lambda i, g=grid, og=og, c=cap_out:
                           sp.downsample_sites(i, g, 3, 2, 1, c)[0].sum(), ids)
            out_ids = stages[s + 1][0]
            total += timed(f"s{s} build_conv_rulebook",
                           lambda i, o, g=grid, og=og:
                           sp.build_conv_rulebook(i, o, g, og, 3, 2, 1).sum(),
                           ids, out_ids)
            cnbr = jax.jit(lambda i, o, g=grid, og=og:
                           sp.build_conv_rulebook(i, o, g, og, 3, 2, 1))(
                               ids, out_ids)
            total += timed(f"s{s} build_windowed_rulebook (strided x4 slack)",
                           lambda n, C=C, cap=cap: wg.build_windowed_rulebook(
                               n, C, cap_in=cap, slack=4 * slack).s8.sum(), cnbr)
    # conv_out
    ids, grid, cap = stages[3]
    og = sp.conv_out_shape(grid, (1, 1, 3), (1, 1, 2), 0)
    total += timed("conv_out downsample+rulebook+windowed",
                   lambda i, g=grid, og=og, cap=cap: wg.build_windowed_rulebook(
                       sp.build_conv_rulebook(
                           i, sp.downsample_sites(i, g, (1, 1, 3), (1, 1, 2),
                                                  0, cap)[0],
                           g, og, (1, 1, 3), (1, 1, 2), 0),
                       128, cap_in=cap, slack=4 * slack).s8.sum(), ids)
    print(f"{'TOTAL (op-isolated sum)':52s} {total:8.2f} ms")


if __name__ == "__main__":
    main()

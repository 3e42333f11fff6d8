"""Fused-graph ablation of the sparse encoder: meta-chain only vs the
full windowed forward, both as ONE jitted program each (removes the
per-dispatch overhead that inflates tools/profile_encoder.py's
per-op numbers)."""
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
    vox = np.floor((p[:, :3] - np.array(pcr[:3], np.float32)) / 0.075).astype(np.int64)
    vox = np.clip(vox, 0, [1439, 1439, 40])
    ids0 = np.unique((vox[:, 0] * 1440 + vox[:, 1]) * 41 + vox[:, 2])
    cap0 = 120000
    ids_arr = np.full(cap0, grid0.size, np.int32)
    ids_arr[:len(ids0)] = ids0
    ids0_j = jnp.asarray(ids_arr)

    site_caps = [100000, 60000, 36000]
    slack = 2

    def meta_chain(ids):
        """All rulebook/meta work of the windowed forward, no convs —
        mirrors _forward_windowed: bitfold downsample feeding the next
        stage's column table directly."""
        chk = jnp.float32(0)
        grid = grid0
        cap = cap0
        tbl = None
        for s, C in ((0, 16), (1, 32), (2, 64), (3, 128)):
            if tbl is None:
                tbl = sp.build_column_table(ids, grid)
            nbr = sp.build_subm_rulebook(ids, grid, 3, table=tbl,
                                         offset_major=True)
            wrb = wg.build_windowed_rulebook(nbr, C, slack=slack, kz=3,
                                             offset_major=True)
            chk += jnp.sum(wrb.s8) + jnp.sum(wrb.sel[:, :, 0]).astype(jnp.float32)
            if s < 3:
                og = sp.conv_out_shape(grid, 3, 2, 1)
                cap_out = site_caps[s]
                out_ids, out_mask, out_tbl = sp.downsample_sites_bitfold(
                    tbl, grid, 3, 2, 1, cap_out)
                cnbr = sp.build_conv_rulebook(ids, out_ids, grid, og, 3, 2, 1,
                                              table=tbl, offset_major=True)
                swrb = wg.build_windowed_rulebook(cnbr, C, cap_in=cap,
                                                  slack=4 * slack, kz=3,
                                                  blk=128,
                                                  offset_major=True)
                chk += jnp.sum(swrb.s8).astype(jnp.float32)
                ids, grid, cap, tbl = out_ids, og, cap_out, out_tbl
        # conv_out
        og = sp.conv_out_shape(grid, (1, 1, 3), (1, 1, 2), 0)
        out_ids, _ = sp.downsample_sites(ids, grid, (1, 1, 3), (1, 1, 2), 0, cap)
        cnbr = sp.build_conv_rulebook(ids, out_ids, grid, og, (1, 1, 3),
                                      (1, 1, 2), 0, offset_major=True)
        owrb = wg.build_windowed_rulebook(cnbr, 128, cap_in=cap,
                                          slack=4 * slack, blk=128,
                                          offset_major=True)
        chk += jnp.sum(owrb.s8).astype(jnp.float32)
        return chk

    def timed(name, fn, *args, iters=10):
        f = jax.jit(fn)
        out = f(*args)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]))
        for _ in range(2):
            out = f(*args)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]))
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"{name:40s} {dt:8.2f} ms", flush=True)
        return dt

    timed("meta chain (all rulebooks, fused)", meta_chain, ids0_j)

    # full encoder for comparison
    from bevfusion_tpu.models.sparse_encoder import SparseEncoder
    enc = SparseEncoder(
        in_channels=5, sparse_shape=(1440, 1440, 41), output_channels=128,
        encoder_channels=((16, 16, 32), (32, 32, 64), (64, 64, 128), (128, 128)),
        encoder_paddings=((0, 0, 1), (0, 0, 1), (0, 0, (1, 1, 0)), (0, 0)),
        block_type="basicblock", site_caps=site_caps, engine="windowed",
        dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.rand(1, cap0, 5).astype(np.float32))
    coords = np.stack([ids_arr // (1440 * 41) % 1440,
                       (ids_arr // 41) % 1440, ids_arr % 41], -1)
    coords = jnp.asarray(coords[None].astype(np.int32))
    msk = jnp.asarray((ids_arr < grid0.size)[None])
    variables = jax.jit(lambda f, c, m: enc.init(
        jax.random.PRNGKey(0), f, c, m, training=False))(feats, coords, msk)

    def full(f, c, m):
        out = enc.apply(variables, f, c, m, training=False)
        return jnp.sum(out.astype(jnp.float32))

    timed("full windowed encoder (fused)", full, feats, coords, msk)


if __name__ == "__main__":
    main()

"""Tiled-dense sparse-conv PROTOTYPE vs the windowed engine — measured.

The decision experiment for the tiled-dense engine (VERDICT r4 item 1):
pack occupied (tx, ty, tz) tiles densely (halo included), run true dense
3D MXU convs per tile, mask to submanifold validity, and re-gather the
halo between convs. Timed on the real chip at the bench lidar's actual
per-stage site sets, against the production windowed engine on the SAME
site sets (rulebook build amortized over the stage's convs exactly as in
the encoder).

Structure per stage, both engines as ONE jitted program each:
  tiled:    core scatter (once) -> NCONV x [halo gather -> conv3d ->
            affine+relu -> submanifold mask]
  windowed: rulebook build (once) -> NCONV x windowed_gather_gemm
            (fused BN/ReLU epilogue)

A correctness parity check (tiny grid, vs the XLA gather-GEMM oracle)
runs first so the prototype's numbers are for a *correct* formulation.

Reference match: mmdet3d/ops/spconv/include/spconv/spconv_ops.h:261-360
(the gather-GEMM rulebook engine this prototype would replace).

Run: python tools/bench_tiled_proto.py  (real chip; ~5 min compile)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

NCONV = 4  # subm convs amortizing one rulebook/tiling build


def build_tiling_np(coords, grid, tshape, cap):
    """Host maps for the tiled layout.

    coords [M, 3] occupied voxel coords (sorted by flat id), grid
    (X, Y, Z), tshape (tx, ty, tz). Returns
      core_scatter [cap]    packed site row -> flat core index
                            (slot * vol + voxel); sentinel rows ->
                            T*vol+1 (out of bounds of the [T*vol+1]
                            core array -> dropped, NOT the zero row)
      hmap [T, pvol]        flat core index per padded-tile voxel
                            (T*vol = miss/zero row)
      occ [T * vol]         1.0 where the core voxel is an active site
      T, vol, pvol
    """
    tx, ty, tz = tshape
    X, Y, Z = grid
    tgy, tgz = -(-Y // ty), -(-Z // tz)
    t = coords // np.array([tx, ty, tz])
    tid = (t[:, 0] * tgy + t[:, 1]) * tgz + t[:, 2]
    order = np.argsort(tid, kind="stable")
    # sites arrive sorted by flat voxel id; tile ids are monotone in
    # (x, y, z-major) so tid is already nearly sorted — keep site order
    uniq, inv = np.unique(tid, return_inverse=True)
    T = len(uniq)
    slot_of_tile = {int(u): i for i, u in enumerate(uniq)}
    vol = tx * ty * tz
    px, py, pz = tx + 2, ty + 2, tz + 2
    pvol = px * py * pz

    local = coords - t * np.array([tx, ty, tz])
    voxel = (local[:, 0] * ty + local[:, 1]) * tz + local[:, 2]
    core_idx = inv * vol + voxel

    core_scatter = np.full(cap, T * vol + 1, np.int32)
    core_scatter[: len(coords)] = core_idx

    occ = np.zeros(T * vol, np.float32)
    occ[core_idx] = 1.0

    # site lookup: flat voxel id -> core index
    site_flat = (coords[:, 0] * Y + coords[:, 1]) * Z + coords[:, 2]
    lut = dict(zip(site_flat.tolist(), core_idx.tolist()))

    hmap = np.full((T, pvol), T * vol, np.int32)
    tx0 = uniq // (tgy * tgz)
    ty0 = (uniq // tgz) % tgy
    tz0 = uniq % tgz
    for s in range(T):
        bx, by, bz = tx0[s] * tx - 1, ty0[s] * ty - 1, tz0[s] * tz - 1
        k = 0
        for dx in range(px):
            gx = bx + dx
            for dy in range(py):
                gy = by + dy
                for dz in range(pz):
                    gz = bz + dz
                    if 0 <= gx < X and 0 <= gy < Y and 0 <= gz < Z:
                        ci = lut.get((gx * Y + gy) * Z + gz)
                        if ci is not None:
                            hmap[s, k] = ci
                    k += 1
    return core_scatter, hmap, occ, T, vol, pvol


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from bevfusion_tpu.ops import sparse_conv as sp
    from bevfusion_tpu.ops import sparse_conv_windowed as wg
    from bevfusion_tpu.runtime.flagship import synthetic_lidar_scan

    # ---------------- tiled chain (device) ----------------------------
    def make_tiled_chain(tshape, vol, pvol, T, C):
        tx, ty, tz = tshape
        px, py, pz = tx + 2, ty + 2, tz + 2

        def chain(feats, weights, scales, shifts, core_scatter, hmap, occ):
            # scatter packed rows into tile cores (+1 zero row)
            cores = jnp.zeros((T * vol + 1, C), jnp.bfloat16)
            cores = cores.at[core_scatter].set(
                feats.astype(jnp.bfloat16), mode="drop")
            occ_r = occ.reshape(T, tx, ty, tz, 1).astype(jnp.bfloat16)
            for i in range(NCONV):
                padded = jnp.take(cores, hmap.reshape(-1), axis=0,
                                  fill_value=0).reshape(T, px, py, pz, C)
                out = jax.lax.conv_general_dilated(
                    padded, weights[i].astype(jnp.bfloat16),
                    window_strides=(1, 1, 1), padding="VALID",
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                    preferred_element_type=jnp.float32)
                out = out * scales[i] + shifts[i]
                out = jax.nn.relu(out).astype(jnp.bfloat16) * occ_r
                cores = jnp.concatenate(
                    [out.reshape(T * vol, C),
                     jnp.zeros((1, C), jnp.bfloat16)])
            return jnp.sum(cores.astype(jnp.float32))

        return chain

    # ---------------- windowed chain (device) -------------------------
    def make_windowed_chain(grid, C, cap, slack=2, kz=9, blk=None):
        blk = blk or wg.BLK

        def chain(feats, weights, scales, shifts, ids):
            tbl = sp.build_column_table(ids, grid)
            t9 = (sp.build_column_table9(tbl, grid)
                  if sp.t9_worth_it(grid.X * grid.Y, 2 * cap) else None)
            nbr = sp.build_subm_rulebook(ids, grid, 3, table=tbl,
                                         table9=t9, offset_major=True)
            wrb = wg.build_windowed_rulebook(nbr, C, slack=slack, kz=kz,
                                             blk=blk, offset_major=True)
            packed = wg.pack_sites(feats.astype(jnp.bfloat16), C)
            for i in range(NCONV):
                packed = wg.windowed_gather_gemm(
                    packed, wrb, weights[i], C, cap,
                    slack=slack, blk=blk, kz=kz,
                    scale=scales[i], shift=shifts[i], relu=True)
            return jnp.sum(packed.astype(jnp.float32))

        return chain

    def timed(name, fn, *args, iters=10):
        f = jax.jit(fn)
        out = f(*args)
        float(np.asarray(out))
        for _ in range(2):
            out = f(*args)
        float(np.asarray(out))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        float(np.asarray(out))
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"  {name:44s} {dt:8.2f} ms  ({dt / NCONV:5.2f} ms/conv)",
              flush=True)
        return dt

    # ---------------- parity (tiny grid, vs XLA oracle) ---------------
    rng = np.random.RandomState(0)
    Xs = Ys = 12
    Zs = 8
    n = 160
    caps = 256
    Cs = 8
    flat = np.sort(rng.choice(Xs * Ys * Zs, n, replace=False))
    coords = np.stack([flat // (Ys * Zs), (flat // Zs) % Ys, flat % Zs], 1)
    grid_s = sp.SparseGrid(Xs, Ys, Zs)
    ids_s = np.full(caps, Xs * Ys * Zs, np.int32)
    ids_s[:n] = flat
    feats_s = rng.rand(caps, Cs).astype(np.float32)
    feats_s[n:] = 0
    w_s = (rng.rand(3, 3, 3, Cs, Cs).astype(np.float32) - 0.5)

    cs, hm, occ, T, vol, pvol = build_tiling_np(coords, (Xs, Ys, Zs),
                                                (4, 4, 4), caps)
    chain1 = make_tiled_chain((4, 4, 4), vol, pvol, T, Cs)

    def tiled_one(feats):
        cores = jnp.zeros((T * vol + 1, Cs), jnp.float32)
        cores = cores.at[jnp.asarray(cs)].set(feats, mode="drop")
        padded = jnp.take(cores, jnp.asarray(hm).reshape(-1), axis=0,
                          fill_value=0).reshape(T, 6, 6, 6, Cs)
        out = jax.lax.conv_general_dilated(
            padded, jnp.asarray(w_s), (1, 1, 1), "VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        out = out.reshape(T * vol, Cs)
        return jnp.take(out, jnp.asarray(cs), axis=0, fill_value=0)

    got = np.asarray(jax.jit(tiled_one)(jnp.asarray(feats_s)))
    nbr_s = sp.build_subm_rulebook(jnp.asarray(ids_s), grid_s, 3)
    # oracle: gather-GEMM over the rulebook (kernel_offsets order is
    # z-minor x-major; DHWIO index [dx, dy, dz])
    want = np.asarray(sp.subm_gather_gemm(
        jnp.asarray(feats_s), nbr_s,
        jnp.asarray(w_s.reshape(27, Cs, Cs))))
    err = np.abs(got[:n] - want[:n]).max()
    assert err < 2e-3, f"tiled formulation wrong: max err {err}"
    print(f"parity OK (tiled vs oracle, max err {err:.2e})")

    # ---------------- stage-scale measurements -------------------------
    pcr = [-54.0, -54.0, -5.0, 54.0, 54.0, 3.0]
    pts, mask = synthetic_lidar_scan(120000, pcr, seed=0)
    p = pts[mask]
    vox = np.floor((p[:, :3] - np.array(pcr[:3], np.float32)) / 0.075
                   ).astype(np.int64)
    vox = np.clip(vox, 0, [1439, 1439, 40])
    flat0 = np.unique((vox[:, 0] * 1440 + vox[:, 1]) * 41 + vox[:, 2])
    c0 = np.stack([flat0 // (1440 * 41), (flat0 // 41) % 1440,
                   flat0 % 41], 1)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from measure_tiles import downsample

    c1, g1 = downsample(c0, (1440, 1440, 41))
    c2, g2 = downsample(c1, g1)

    stages = [
        ("stage0", c0, (1440, 1440, 41), 16, 120000, (4, 4, 2)),
        ("stage1", c1, g1, 32, 100000, (4, 4, 4)),
        ("stage2", c2, g2, 64, 60000, (4, 4, 4)),
    ]
    results = {}
    for name, coords, grid, C, cap, tshape in stages:
        print(f"-- {name}: {len(coords)} sites, grid {grid}, C={C}, "
              f"tile {tshape}", flush=True)
        cs, hm, occ, T, vol, pvol = build_tiling_np(coords, grid, tshape,
                                                    cap)
        dens = len(coords) / (T * vol)
        print(f"  T={T} tiles, in-tile density {dens * 100:.1f}%, "
              f"halo bytes/conv {T * pvol * C * 2 / 1e6:.0f} MB", flush=True)
        feats = rng.rand(cap, C).astype(np.float32)
        ws = jnp.asarray(rng.rand(NCONV, 3, 3, 3, C, C).astype(np.float32)
                         * 0.1)
        sc = jnp.ones((NCONV, 1, 1, 1, C), jnp.float32)
        sh = jnp.zeros((NCONV, 1, 1, 1, C), jnp.float32)

        tiled = make_tiled_chain(tshape, vol, pvol, T, C)
        dt_t = timed(f"tiled {NCONV}x subm conv", tiled,
                     jnp.asarray(feats), ws, sc, sh,
                     jnp.asarray(cs), jnp.asarray(hm), jnp.asarray(occ))

        ids_arr = np.full(cap, grid[0] * grid[1] * grid[2], np.int32)
        fl = (coords[:, 0] * grid[1] + coords[:, 1]) * grid[2] + coords[:, 2]
        ids_arr[: len(coords)] = fl
        grid_o = sp.SparseGrid(*grid)
        wchain = make_windowed_chain(grid_o, C, cap)
        sc2 = jnp.ones((NCONV, C), jnp.float32)
        sh2 = jnp.zeros((NCONV, C), jnp.float32)
        dt_w = timed(f"windowed meta + {NCONV}x subm conv", wchain,
                     jnp.asarray(feats),
                     jnp.asarray(np.asarray(ws).reshape(NCONV, 27, C, C)),
                     sc2, sh2, jnp.asarray(ids_arr))
        results[name] = (dt_t, dt_w)

    print("\n| stage | tiled ms/conv | windowed (meta amortized) ms/conv |")
    print("|---|---|---|")
    for name, (dt_t, dt_w) in results.items():
        print(f"| {name} | {dt_t / NCONV:.2f} | {dt_w / NCONV:.2f} |")


if __name__ == "__main__":
    main()

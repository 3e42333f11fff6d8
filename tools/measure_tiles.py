"""Tile-occupancy measurement for the tiled-dense sparse-conv design.

Voxelizes the realistic ring-scan lidar (the bench distribution) and,
at each windowed-engine stage grid, reports for candidate tile shapes:
  - occupied tiles T, mean sites/tile, in-tile density
  - byte inflation: padded-tile voxels moved per active site
  - projected per-subm-conv cost on THIS chip (72 GB/s eff. HBM,
    70 TFLOP/s bf16 MXU — PERFORMANCE.md calibration)
vs the windowed engine's measured ~2.5 ms/conv + ~3 ms/conv amortized
rulebook meta.

Run: python tools/measure_tiles.py
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bevfusion_tpu.runtime.flagship import synthetic_lidar_scan

PCR = np.array([-54, -54, -5, 54, 54, 3], np.float32)
VOX = np.array([0.075, 0.075, 0.2], np.float32)

HBM_GBPS = 72.0
MXU_TFLOPS = 70.0


def voxel_coords(points):
    c = np.floor((points[:, :3] - PCR[:3]) / VOX).astype(np.int64)
    ok = ((c >= 0).all(1) & (c[:, 0] < 1440) & (c[:, 1] < 1440)
          & (c[:, 2] < 41))
    c = c[ok]
    ids = (c[:, 0] * 1440 + c[:, 1]) * 41 + c[:, 2]
    ids = np.unique(ids)
    x, r = ids // (1440 * 41), ids % (1440 * 41)
    return np.stack([x, r // 41, r % 41], 1)  # [M, 3] x,y,z


def downsample(coords, grid, k=3, s=2, p=(1, 1, 1)):
    """Active outputs of a strided sparse conv (parents of any input)."""
    og = tuple((g + 2 * pi - k) // s + 1 for g, pi in zip(grid, p))
    outs = set()
    offs = np.arange(k)
    cand = []
    for ax in range(3):
        c = coords[:, ax]
        o = (c[:, None] + p[ax] - offs[None, :])
        ok = (o % s == 0)
        o = o // s
        ok &= (o >= 0) & (o < og[ax])
        cand.append((o, ok))
    # combine
    M = coords.shape[0]
    ids = []
    for i in range(k):
        for j in range(k):
            for l in range(k):
                ok = cand[0][1][:, i] & cand[1][1][:, j] & cand[2][1][:, l]
                o = (cand[0][0][:, i] * og[1] + cand[1][0][:, j]) * og[2] + cand[2][0][:, l]
                ids.append(o[ok])
    ids = np.unique(np.concatenate(ids))
    x, r = ids // (og[1] * og[2]), ids % (og[1] * og[2])
    return np.stack([x, r // og[2], r % og[2]], 1), og


def tile_stats(coords, grid, tshape, cin, cout, label):
    tx, ty, tz = tshape
    t = coords // np.array([tx, ty, tz])
    tg = tuple(-(-g // s) for g, s in zip(grid, (tx, ty, tz)))
    tid = (t[:, 0] * tg[1] + t[:, 1]) * tg[2] + t[:, 2]
    uniq, cnt = np.unique(tid, return_counts=True)
    T = len(uniq)
    sites = coords.shape[0]
    vol = tx * ty * tz
    pvol = (tx + 2) * (ty + 2) * (tz + 2)
    dens = sites / (T * vol)
    # per-subm-conv: read padded tiles (cin) + write center (cout), bf16,
    # channel-packed minor dim (no lane padding assumed achievable)
    rd = T * pvol * cin * 2
    wr = T * vol * cout * 2
    t_mem = (rd + wr) / (HBM_GBPS * 1e9) * 1e3
    macs = T * vol * 27 * cin * cout
    t_mxu = 2 * macs / (MXU_TFLOPS * 1e12) * 1e3
    # MXU N-dim (cout) pads to 128
    t_mxu_pad = t_mxu * max(1, 128 // max(cout, 1))
    print(f"  {label} tile {tx}x{ty}x{tz}: T={T:6d} sites/tile={sites/T:6.1f} "
          f"dens={dens*100:5.1f}% bytes={int((rd+wr)/1e6):4d}MB "
          f"t_mem={t_mem:5.2f}ms t_mxu={t_mxu:5.2f}ms t_mxu(pad128)={t_mxu_pad:5.2f}ms")
    return dict(T=T, dens=dens, t_mem=t_mem, t_mxu=t_mxu_pad)


def zext_stats(coords, grid, tx, ty, label):
    """z-extent per occupied 2D footprint tile (for z-windowed tiles)."""
    t = coords[:, 0] // tx * 10**6 + coords[:, 1] // ty
    import collections
    zmin, zmax = {}, {}
    for ti, z in zip(t, coords[:, 2]):
        zmin[ti] = min(zmin.get(ti, 99), z)
        zmax[ti] = max(zmax.get(ti, -1), z)
    ext = np.array([zmax[k] - zmin[k] + 1 for k in zmin])
    print(f"  {label} {tx}x{ty} cols: T2d={len(ext)} z-extent "
          f"p50={np.percentile(ext,50):.0f} p90={np.percentile(ext,90):.0f} "
          f"p99={np.percentile(ext,99):.0f} max={ext.max()}")


def main():
    pts, mask = synthetic_lidar_scan(120000, PCR, seed=0)
    coords = voxel_coords(pts[mask])
    print(f"stage0 sites: {len(coords)} (grid 1440x1440x41)")

    grids = [(1440, 1440, 41)]
    stage_coords = [coords]
    c1, g1 = downsample(coords, grids[0])
    c2, g2 = downsample(c1, g1)
    # flagship stage-2 -> stage-3 strided conv pads (1, 1, 0)
    c3, g3 = downsample(c2, g2, p=(1, 1, 0))
    print(f"stage1 sites: {len(c1)} grid {g1}; stage2 sites: {len(c2)} "
          f"grid {g2}; stage3 sites: {len(c3)} grid {g3}")
    stage_coords += [c1, c2, c3]
    grids += [g1, g2, g3]
    chans = [(16, 16), (32, 32), (64, 64), (128, 128)]

    for si, (c, g, (ci, co)) in enumerate(zip(stage_coords, grids, chans)):
        print(f"--- stage{si} grid {g} sites {len(c)} C={ci}->{co}")
        for tshape in [(4, 4, 2), (4, 4, 4), (8, 8, 1), (8, 8, 2),
                       (8, 8, 4), (8, 8, 8), (4, 4, 8),
                       (16, 16, 4), (8, 8, g[2]), (16, 16, g[2])]:
            tile_stats(c, g, tshape, ci, co, f"s{si}")
        zext_stats(c, g, 8, 8, f"s{si}")
        zext_stats(c, g, 16, 16, f"s{si}")


if __name__ == "__main__":
    main()

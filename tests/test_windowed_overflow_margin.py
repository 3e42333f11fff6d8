"""Window-overflow margin of the encoder's kernel configurations on a
DENSE synthetic scan (ADVICE r3: blk=128 shrinks strided windows 4x vs
the blk=512 setting that was originally validated — re-validate
overflow == 0 at the exact (blk, slack) pairs the encoder runs).

Rulebooks are built in numpy (fast on CPU; the XLA builders are
oracle-tested elsewhere) and fed to the real build_windowed_rulebook,
so the overflow count comes from the production window math.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from bevfusion_tpu.ops import sparse_conv_windowed as wg
from bevfusion_tpu.runtime.flagship import synthetic_lidar_scan

PCR = [-54.0, -54.0, -5.0, 54.0, 54.0, 3.0]
GRID0 = (1440, 1440, 41)
SITE_CAPS = [100000, 60000, 36000]


def _voxel_ids(npts, seed):
    pts, mask = synthetic_lidar_scan(npts, PCR, seed=seed)
    p = pts[mask]
    X, Y, Z = GRID0
    v = np.floor((p[:, :3] - np.array(PCR[:3], np.float32))
                 / np.array([0.075, 0.075, 0.2])).astype(np.int64)
    ok = (v >= 0).all(1) & (v[:, 0] < X) & (v[:, 1] < Y) & (v[:, 2] < Z)
    v = v[ok]
    return np.unique((v[:, 0] * Y + v[:, 1]) * Z + v[:, 2])[:120000]


def _out_shape(g, k, s, p):
    return tuple((d + 2 * p - k) // s + 1 for d in g)


def _downsample(ids, g, cap):
    """Active output ids of a k3 s2 p1 strided conv (numpy)."""
    X, Y, Z = g
    OX, OY, OZ = _out_shape(g, 3, 2, 1)
    x, y, z = ids // (Y * Z), (ids // Z) % Y, ids % Z
    outs = []
    for dx in range(3):
        for dy in range(3):
            for dz in range(3):
                ox, oy, oz = x + 1 - dx, y + 1 - dy, z + 1 - dz
                ok = ((ox % 2 == 0) & (oy % 2 == 0) & (oz % 2 == 0))
                a, b, c = ox[ok] // 2, oy[ok] // 2, oz[ok] // 2
                ok2 = ((a >= 0) & (a < OX) & (b >= 0) & (b < OY)
                       & (c >= 0) & (c < OZ))
                outs.append((a[ok2] * OY + b[ok2]) * OZ + c[ok2])
    return np.unique(np.concatenate(outs))[:cap], (OX, OY, OZ)


def _conv_nbr(in_ids, out_ids, g, og, cap_out):
    """Strided conv rulebook [cap_out, 27] (numpy searchsorted)."""
    X, Y, Z = g
    OX, OY, OZ = og
    ox, oy, oz = out_ids // (OY * OZ), (out_ids // OZ) % OY, out_ids % OZ
    cols = []
    for dx in range(3):
        for dy in range(3):
            for dz in range(3):
                ix = ox * 2 - 1 + dx
                iy = oy * 2 - 1 + dy
                iz = oz * 2 - 1 + dz
                ok = ((ix >= 0) & (ix < X) & (iy >= 0) & (iy < Y)
                      & (iz >= 0) & (iz < Z))
                iid = (ix * Y + iy) * Z + iz
                row = np.searchsorted(in_ids, iid)
                row = np.clip(row, 0, len(in_ids) - 1)
                hit = ok & (in_ids[row] == iid)
                cols.append(np.where(hit, row, -1))
    nbr = np.stack(cols, 1).astype(np.int32)
    out = np.full((cap_out, 27), -1, np.int32)
    out[:len(nbr)] = nbr
    return out


def _subm_nbr(ids, g, cap):
    X, Y, Z = g
    x, y, z = ids // (Y * Z), (ids // Z) % Y, ids % Z
    cols = []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                nx, ny, nz = x + dx, y + dy, z + dz
                ok = ((nx >= 0) & (nx < X) & (ny >= 0) & (ny < Y)
                      & (nz >= 0) & (nz < Z))
                nid = (nx * Y + ny) * Z + nz
                row = np.clip(np.searchsorted(ids, nid), 0, len(ids) - 1)
                hit = ok & (ids[row] == nid)
                cols.append(np.where(hit, row, -1))
    nbr = np.stack(cols, 1).astype(np.int32)
    out = np.full((cap, 27), -1, np.int32)
    out[:len(nbr)] = nbr
    return out


@pytest.mark.parametrize("seed", [0, 1])
def test_encoder_window_configs_overflow_free_on_dense_scan(seed):
    """300k-point scan (2.5x the bench density, saturating the 120k
    voxel cap): every (blk, slack) the encoder uses must drop zero
    neighbors. SBLK=128 with slack 8 gives strided windows the same
    slack*blk = 1024-site span as subm windows — this asserts that span
    actually suffices at saturation density."""
    ids = _voxel_ids(300000, seed)
    g = GRID0
    cap = 120000
    chans = [16, 32, 64]
    for s in range(3):
        cap_out = SITE_CAPS[s]
        out_ids, og = _downsample(ids, g, cap_out)
        cnbr = _conv_nbr(ids, out_ids, g, og, cap_out)
        # strided conv: the encoder's SBLK=128 / slack=4*window_slack
        swrb = wg.build_windowed_rulebook(
            jnp.asarray(cnbr), chans[s], cap_in=cap, slack=8, kz=3, blk=128)
        assert int(swrb.overflow) == 0, f"stage {s} strided overflow"
        # subm at the output stage: blk=512 / slack=2 / kz=9 (one window
        # per dx covers all 9 (dy, dz) offsets, spanning +-(Z+1) ids)
        pad_out = np.full(cap_out, og[0] * og[1] * og[2], np.int64)
        pad_out[:len(out_ids)] = out_ids
        snbr = _subm_nbr(out_ids, og, cap_out)
        C_next = [32, 64, 128][s]
        wrb = wg.build_windowed_rulebook(
            jnp.asarray(snbr), C_next, slack=2, kz=9, blk=512)
        assert int(wrb.overflow) == 0, f"stage {s + 1} subm overflow"
        ids, g, cap = out_ids, og, cap_out

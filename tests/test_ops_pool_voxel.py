import jax
import jax.numpy as jnp
import numpy as np

from bevfusion_tpu.ops.bev_pool import bev_pool, cell_ids_from_geometry, lss_bev_pool
from bevfusion_tpu.ops.grid import create_frustum, gen_dx_bx
from bevfusion_tpu.ops.voxelize import voxelize, voxelize_batch


def _np_bev_pool(feats, coords, valid, B, Z, X, Y):
    C = feats.shape[-1]
    out = np.zeros((B, Z, X, Y, C), np.float32)
    for f, (x, y, z, b), v in zip(feats, coords, valid):
        if v:
            out[b, z, x, y] += f
    return out


def test_bev_pool_matches_numpy_oracle():
    rng = np.random.RandomState(0)
    Np, C, B, Z, X, Y = 500, 8, 2, 1, 16, 16
    feats = rng.randn(Np, C).astype(np.float32)
    coords = np.stack(
        [
            rng.randint(0, X, Np),
            rng.randint(0, Y, Np),
            rng.randint(0, Z, Np),
            rng.randint(0, B, Np),
        ],
        axis=1,
    ).astype(np.int32)
    valid = rng.rand(Np) > 0.3
    got = np.asarray(bev_pool(jnp.array(feats), jnp.array(coords), jnp.array(valid), B, Z, X, Y))
    want = _np_bev_pool(feats, coords, valid, B, Z, X, Y)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_lss_bev_pool_fused_equals_explicit_product():
    rng = np.random.RandomState(1)
    B, N, D, fH, fW, C = 1, 2, 4, 3, 5, 6
    Z, X, Y = 1, 8, 8
    depth = rng.rand(B, N, D, fH, fW).astype(np.float32)
    ctx = rng.randn(B, N, fH, fW, C).astype(np.float32)
    ids = rng.randint(0, Z * X * Y, (B, N, D, fH, fW)).astype(np.int32)
    valid = rng.rand(B, N, D, fH, fW) > 0.2

    got = np.asarray(
        lss_bev_pool(jnp.array(depth), jnp.array(ctx), jnp.array(ids), jnp.array(valid), Z, X, Y)
    )

    prod = depth[..., None] * ctx[:, :, None]
    want = np.zeros((B, Z * X * Y, C), np.float32)
    for b in range(B):
        pf = prod[b].reshape(-1, C)
        idf = ids[b].reshape(-1)
        vf = valid[b].reshape(-1)
        for p, i, v in zip(pf, idf, vf):
            if v:
                want[b, i] += p
    want = want.reshape(B, Z, X, Y, C).transpose(0, 2, 3, 1, 4).reshape(B, X, Y, Z * C)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_cell_ids_from_geometry():
    dx, bx, nx = gen_dx_bx([-51.2, 51.2, 0.4], [-51.2, 51.2, 0.4], [-10.0, 10.0, 20.0])
    assert list(nx) == [256, 256, 1]
    geom = jnp.array([[-51.2, -51.2, -10.0], [51.19, 51.19, 9.9], [60.0, 0.0, 0.0]])
    ids, valid = cell_ids_from_geometry(geom, jnp.array(dx), jnp.array(bx), nx)
    assert bool(valid[0]) and bool(valid[1]) and not bool(valid[2])
    assert int(ids[0]) == 0
    assert int(ids[1]) == 255 * 256 + 255


def test_frustum_matches_reference_shape():
    f = create_frustum((256, 704), (32, 88), (1.0, 60.0, 0.5))
    assert f.shape == (118, 32, 88, 3)
    assert f[0, 0, 0, 2] == 1.0
    assert abs(f[-1, 0, 0, 2] - 59.5) < 1e-6
    assert f[0, 0, -1, 0] == 703.0
    assert f[0, -1, 0, 1] == 255.0


def _np_voxelize_mean(points, mask, vs, pcr, max_points, max_voxels):
    nx = int(round((pcr[3] - pcr[0]) / vs[0]))
    ny = int(round((pcr[4] - pcr[1]) / vs[1]))
    nz = int(round((pcr[5] - pcr[2]) / vs[2]))
    buckets = {}
    order_pts = []
    for i, (p, m) in enumerate(zip(points, mask)):
        if not m:
            continue
        c = np.floor((p[:3] - pcr[:3]) / vs).astype(int)
        if not (0 <= c[0] < nx and 0 <= c[1] < ny and 0 <= c[2] < nz):
            continue
        key = (c[0], c[1], c[2])  # (x, y, z)
        buckets.setdefault(key, []).append(p)
    # keep smallest x-major linear ids (our documented drop rule)
    keys = sorted(buckets, key=lambda k: (k[0] * ny + k[1]) * nz + k[2])[:max_voxels]
    feats, coords, counts = [], [], []
    for k in keys:
        pts = buckets[k][:max_points]
        feats.append(np.mean(pts, axis=0))
        coords.append(k)
        counts.append(len(pts))
    return np.array(feats), np.array(coords), np.array(counts)


def test_voxelize_mean_matches_oracle():
    rng = np.random.RandomState(2)
    P = 400
    pts = rng.uniform(-3, 3, (P, 5)).astype(np.float32)
    mask = rng.rand(P) > 0.1
    pcr = np.array([-2.0, -2.0, -2.0, 2.0, 2.0, 2.0], np.float32)
    vs = np.array([0.5, 0.5, 0.5], np.float32)
    out = voxelize(jnp.array(pts), jnp.array(mask), vs, pcr, max_points=4, max_voxels=64)
    want_f, want_c, want_n = _np_voxelize_mean(pts, mask, vs, pcr, 4, 64)

    got_mask = np.asarray(out.mask)
    got_f = np.asarray(out.feats)[got_mask]
    got_c = np.asarray(out.coords)[got_mask]
    got_n = np.asarray(out.num_points)[got_mask]
    assert got_f.shape[0] == want_f.shape[0]
    np.testing.assert_array_equal(got_c, want_c)
    np.testing.assert_array_equal(got_n, want_n)
    np.testing.assert_allclose(got_f, want_f, rtol=1e-5, atol=1e-5)


def test_voxelize_batch_layout():
    rng = np.random.RandomState(3)
    pts = rng.uniform(-2, 2, (2, 100, 5)).astype(np.float32)
    mask = np.ones((2, 100), bool)
    pcr = [-2.0, -2.0, -2.0, 2.0, 2.0, 2.0]
    vs = [1.0, 1.0, 1.0]
    feats, coords, n, m = voxelize_batch(
        jnp.array(pts), jnp.array(mask), vs, pcr, max_points=10, max_voxels=32
    )
    assert feats.shape == (64, 5)
    assert coords.shape == (64, 4)
    b = np.asarray(coords)[:, 0]
    assert set(b[np.asarray(m)]) <= {0, 1}
    assert (b[:32][np.asarray(m)[:32]] == 0).all()


def test_voxelize_jit_compiles():
    pts = jnp.zeros((64, 5))
    mask = jnp.ones((64,), bool)
    f = jax.jit(
        lambda p, m: voxelize(p, m, [1.0] * 3, [-4, -4, -4, 4, 4, 4], 4, 16)
    )
    out = f(pts, mask)
    assert out.feats.shape == (16, 5)

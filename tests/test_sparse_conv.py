import itertools

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from bevfusion_tpu.ops import sparse_conv as sp


def _random_sparse(rng, grid, n_active, cap, C):
    """Random active sites (sorted x-major ids) + feats, sentinel-padded."""
    total = grid.size
    ids = rng.choice(total, size=n_active, replace=False)
    ids = np.sort(ids)
    ids_pad = np.full((cap,), total, np.int32)
    ids_pad[:n_active] = ids
    feats = np.zeros((cap, C), np.float32)
    feats[:n_active] = rng.randn(n_active, C).astype(np.float32)
    mask = np.zeros((cap,), bool)
    mask[:n_active] = True
    return jnp.array(ids_pad), jnp.array(feats), jnp.array(mask)


def _dense_from_sparse(ids, feats, mask, grid):
    d = np.zeros((grid.X, grid.Y, grid.Z, feats.shape[-1]), np.float32)
    for i, v in zip(np.asarray(ids), np.asarray(feats)):
        if i < grid.size:
            x, y, z = i // (grid.Y * grid.Z), (i // grid.Z) % grid.Y, i % grid.Z
            d[x, y, z] = v
    return d


def _dense_conv3d(x, w, stride, padding):
    """Oracle: plain 3D conv; w [K, Cin, Cout] in kernel_offsets order."""
    kx = round(len(w) ** (1 / 3))
    K3 = sp.kernel_offsets((kx, kx, kx)) if len(w) == kx**3 else None
    raise NotImplementedError


def test_subm_conv_matches_dense_oracle():
    rng = np.random.RandomState(0)
    grid = sp.SparseGrid(6, 5, 4)
    Cin, Cout, cap, n_active = 3, 7, 32, 20
    ids, feats, mask = _random_sparse(rng, grid, n_active, cap, Cin)
    w = rng.randn(27, Cin, Cout).astype(np.float32) * 0.1

    nbr = sp.build_subm_rulebook(ids, grid, 3)
    got = np.asarray(sp.subm_gather_gemm(feats, nbr, jnp.array(w)))

    dense = _dense_from_sparse(ids, feats, mask, grid)
    offs = sp.kernel_offsets(3)
    ids_np, mask_np = np.asarray(ids), np.asarray(mask)
    for row in range(cap):
        if not mask_np[row]:
            continue
        i = ids_np[row]
        x, y, z = i // (grid.Y * grid.Z), (i // grid.Z) % grid.Y, i % grid.Z
        want = np.zeros(Cout, np.float32)
        for k, (ox, oy, oz) in enumerate(offs):
            nx_, ny_, nz_ = x + ox - 1, y + oy - 1, z + oz - 1
            if 0 <= nx_ < grid.X and 0 <= ny_ < grid.Y and 0 <= nz_ < grid.Z:
                want += dense[nx_, ny_, nz_] @ w[k]
        np.testing.assert_allclose(got[row], want, rtol=1e-4, atol=1e-4)


def test_downsample_sites_matches_bruteforce():
    rng = np.random.RandomState(1)
    grid = sp.SparseGrid(7, 6, 5)
    for k, s, p in [(3, 2, 1), (3, 2, 0), ((1, 1, 3), (1, 1, 2), 0)]:
        ids, feats, mask = _random_sparse(rng, grid, 25, 40, 2)
        og = sp.conv_out_shape(grid, k, s, p)
        out_ids, out_mask = sp.downsample_sites(ids, grid, k, s, p, 64)

        # brute force: an output site is active iff some kernel offset
        # hits an active input
        kt = k if isinstance(k, tuple) else (k,) * 3
        st = s if isinstance(s, tuple) else (s,) * 3
        pt = p if isinstance(p, tuple) else (p,) * 3
        active_in = set(int(i) for i, m in zip(np.asarray(ids), np.asarray(mask)) if m)
        want = set()
        for ox, oy, oz in itertools.product(range(og.X), range(og.Y), range(og.Z)):
            for kx, ky, kz in itertools.product(*(range(d) for d in kt)):
                ix = ox * st[0] - pt[0] + kx
                iy = oy * st[1] - pt[1] + ky
                iz = oz * st[2] - pt[2] + kz
                if 0 <= ix < grid.X and 0 <= iy < grid.Y and 0 <= iz < grid.Z:
                    if (ix * grid.Y + iy) * grid.Z + iz in active_in:
                        want.add((ox * og.Y + oy) * og.Z + oz)
                        break
        got = set(int(i) for i, m in zip(np.asarray(out_ids), np.asarray(out_mask)) if m)
        assert got == want, (k, s, p)


def test_strided_conv_matches_dense_oracle():
    rng = np.random.RandomState(2)
    grid = sp.SparseGrid(6, 6, 4)
    Cin, Cout = 2, 5
    ids, feats, mask = _random_sparse(rng, grid, 20, 32, Cin)
    k, s, p = 3, 2, 1
    og = sp.conv_out_shape(grid, k, s, p)
    out_ids, out_mask = sp.downsample_sites(ids, grid, k, s, p, 64)
    w = rng.randn(27, Cin, Cout).astype(np.float32) * 0.1
    nbr = sp.build_conv_rulebook(ids, out_ids, grid, og, k, s, p)
    got = np.asarray(sp.subm_gather_gemm(feats, nbr, jnp.array(w)))

    dense = _dense_from_sparse(ids, feats, mask, grid)
    offs = sp.kernel_offsets(3)
    for row, (oid, om) in enumerate(zip(np.asarray(out_ids), np.asarray(out_mask))):
        if not om:
            continue
        ox, oy, oz = oid // (og.Y * og.Z), (oid // og.Z) % og.Y, oid % og.Z
        want = np.zeros(Cout, np.float32)
        for kk, (kx, ky, kz) in enumerate(offs):
            ix, iy, iz = ox * 2 - 1 + kx, oy * 2 - 1 + ky, oz * 2 - 1 + kz
            if 0 <= ix < grid.X and 0 <= iy < grid.Y and 0 <= iz < grid.Z:
                want += dense[ix, iy, iz] @ w[kk]
        np.testing.assert_allclose(got[row], want, rtol=1e-4, atol=1e-4)


def test_to_dense_roundtrip():
    rng = np.random.RandomState(3)
    grid = sp.SparseGrid(4, 3, 2)
    ids, feats, mask = _random_sparse(rng, grid, 10, 16, 6)
    d = np.asarray(sp.to_dense(feats, ids, mask, grid))
    want = _dense_from_sparse(ids, feats, mask, grid)
    np.testing.assert_allclose(d, want)


def test_sparse_encoder_end_to_end():
    from bevfusion_tpu.models.sparse_encoder import SparseEncoder

    rng = np.random.RandomState(4)
    enc = SparseEncoder(
        in_channels=5,
        sparse_shape=(32, 32, 9),
        base_channels=4,
        output_channels=16,
        encoder_channels=((4, 4, 8), (8, 8, 16), (16, 16, 16), (16, 16)),
        encoder_paddings=((0, 0, 1), (0, 0, 1), (0, 0, (1, 1, 0)), (0, 0)),
        block_type="basicblock",
    )
    B, M = 2, 64
    coords = np.stack(
        [rng.randint(0, 32, (B, M)), rng.randint(0, 32, (B, M)), rng.randint(0, 9, (B, M))],
        axis=-1,
    ).astype(np.int32)
    # sort by x-major id per sample, dedupe-free is fine for shape test
    for b in range(B):
        lin = (coords[b, :, 0] * 32 + coords[b, :, 1]) * 9 + coords[b, :, 2]
        coords[b] = coords[b][np.argsort(lin)]
    feats = rng.randn(B, M, 5).astype(np.float32)
    mask = np.ones((B, M), bool)

    vs = jax.jit(enc.init)(jax.random.PRNGKey(0), jnp.array(feats),
                           jnp.array(coords), jnp.array(mask))
    apply = jax.jit(lambda v, f, c, m: enc.apply(v, f, c, m, training=False,
                                                 mutable=["batch_stats"]))
    out, _ = apply(vs, jnp.array(feats), jnp.array(coords), jnp.array(mask))
    # 32/8 = 4 spatial, z: 9 -> 5 -> 3 -> 2 -> (2-3)//2+1 = 0? depends; just check XY
    assert out.shape[0] == 2 and out.shape[1] == 4 and out.shape[2] == 4
    assert np.isfinite(np.asarray(out)).all()


def test_window_rulebook_matches_generic():
    """window_gather_gemm must agree exactly with the generic 27-row
    gather-GEMM for both subm and strided convs."""
    rng = np.random.RandomState(7)
    grid = sp.SparseGrid(10, 9, 8)
    Cin, Cout = 4, 6
    ids, feats, mask = _random_sparse(rng, grid, 60, 96, Cin)
    w = jnp.array(rng.randn(27, Cin, Cout).astype(np.float32) * 0.1)

    # submanifold
    nbr = sp.build_subm_rulebook(ids, grid, 3)
    want = np.asarray(sp.subm_gather_gemm(feats, nbr, w))
    rb = sp.build_subm_window_rulebook(ids, grid, 3)
    got = np.asarray(sp.window_gather_gemm(feats, rb, w))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # strided
    k, s, p = 3, 2, 1
    og = sp.conv_out_shape(grid, k, s, p)
    out_ids, out_mask = sp.downsample_sites(ids, grid, k, s, p, 128)
    cn = sp.build_conv_rulebook(ids, out_ids, grid, og, k, s, p)
    want2 = np.asarray(sp.subm_gather_gemm(feats, cn, w))
    rb2 = sp.build_conv_window_rulebook(ids, out_ids, grid, og, k, s, p)
    got2 = np.asarray(sp.window_gather_gemm(feats, rb2, w))
    np.testing.assert_allclose(got2, want2, rtol=1e-5, atol=1e-5)

    # conv_out-style kernel (1, 1, 3) stride (1, 1, 2)
    k3, s3, p3 = (1, 1, 3), (1, 1, 2), 0
    og3 = sp.conv_out_shape(grid, k3, s3, p3)
    oi3, om3 = sp.downsample_sites(ids, grid, k3, s3, p3, 96)
    w3 = jnp.array(rng.randn(3, Cin, Cout).astype(np.float32) * 0.1)
    cn3 = sp.build_conv_rulebook(ids, oi3, grid, og3, k3, s3, p3)
    want3 = np.asarray(sp.subm_gather_gemm(feats, cn3, w3))
    rb3 = sp.build_conv_window_rulebook(ids, oi3, grid, og3, k3, s3, p3)
    got3 = np.asarray(sp.window_gather_gemm(feats, rb3, w3))
    np.testing.assert_allclose(got3, want3, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_dense_path_matches_sparse_path():
    """dense_from_stage is numerically exact: same params, same input,
    sparse gather path vs dense masked-conv path must agree."""
    from bevfusion_tpu.models.sparse_encoder import SparseEncoder

    rng = np.random.RandomState(11)
    kw = dict(
        in_channels=5, sparse_shape=(32, 32, 33), base_channels=4,
        output_channels=8,
        encoder_channels=((4, 4, 8), (8, 8, 16), (16, 16, 16), (16, 16)),
        encoder_paddings=((0, 0, 1), (0, 0, 1), (0, 0, (1, 1, 0)), (0, 0)),
        block_type="basicblock",
    )
    enc_sparse = SparseEncoder(dense_from_stage=-1, **kw)
    enc_dense = SparseEncoder(dense_from_stage=1, **kw)

    B, M = 1, 48
    coords = np.stack(
        [rng.randint(0, 32, (B, M)), rng.randint(0, 32, (B, M)),
         rng.randint(0, 16, (B, M))], axis=-1).astype(np.int32)
    for b in range(B):
        lin = (coords[b, :, 0] * 32 + coords[b, :, 1]) * 33 + coords[b, :, 2]
        u, idx = np.unique(lin, return_index=True)
        keep = np.zeros(M, bool)
        keep[idx] = True
        coords[b][~keep] = coords[b][idx[0]]  # dedupe: repeat first site
        lin = (coords[b, :, 0] * 32 + coords[b, :, 1]) * 33 + coords[b, :, 2]
        coords[b] = coords[b][np.argsort(lin, kind="stable")]
    # rebuild mask so duplicated rows are invalid
    lin0 = (coords[0, :, 0] * 32 + coords[0, :, 1]) * 33 + coords[0, :, 2]
    mask = np.concatenate([[True], lin0[1:] != lin0[:-1]])[None]
    feats = rng.randn(B, M, 5).astype(np.float32)

    vs = jax.jit(enc_sparse.init)(jax.random.PRNGKey(0), jnp.array(feats),
                                  jnp.array(coords), jnp.array(mask))
    out_s, _ = jax.jit(lambda v, f, c, m: enc_sparse.apply(
        v, f, c, m, training=False, mutable=["batch_stats"]))(
        vs, jnp.array(feats), jnp.array(coords), jnp.array(mask))
    out_d, _ = jax.jit(lambda v, f, c, m: enc_dense.apply(
        v, f, c, m, training=False, mutable=["batch_stats"]))(
        vs, jnp.array(feats), jnp.array(coords), jnp.array(mask))
    # dense convs reassociate accumulation; differences are fp noise
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_d),
                               rtol=1e-2, atol=3e-3)


# each case compiles ~3 distinct-shape programs (~15 s CPU), so the
# default tier keeps one representative per behavior class (standard
# k3s2, the encoder's (1,1,3) conv_out geometry, heavy cap overflow)
# and the remaining geometries/edge cases run in the slow tier
_BITFOLD_CASES = {
    "k3s2": ((32, 32, 41), 3, 2, 1, 2000, 4000),
    "k3s2_b": ((16, 16, 21), 3, 2, 1, 800, 2000),
    "k3s2_c": ((48, 48, 11), 3, 2, 1, 3000, 8000),
    "z_conv_out": ((12, 12, 6), (1, 1, 3), (1, 1, 2), 0, 400, 900),
    "very_sparse": ((8, 8, 41), 3, 2, 1, 5, 64),
    "dense": ((6, 6, 8), 3, 2, 1, 6 * 6 * 8, 6 * 6 * 8),
    "cap_overflow": ((32, 32, 41), 3, 2, 1, 4000, 512),
    "heavy_overflow": ((16, 16, 21), 3, 2, 1, 1500, 100),
}
_BITFOLD_FAST = ("k3s2", "z_conv_out", "heavy_overflow")


@pytest.mark.parametrize(
    "case",
    [c if c in _BITFOLD_FAST else pytest.param(c, marks=pytest.mark.slow)
     for c in _BITFOLD_CASES])
def test_downsample_bitfold_matches_sort_path(case):
    """Column-bitmask OR-fold downsample == candidate-sort downsample
    (ids, mask, and the derived output ColumnTable) across the conv
    geometries the encoder uses."""
    rng = np.random.RandomState(7)
    g, k, s, p, nsites, cap_out = _BITFOLD_CASES[case]
    cases = [(sp.SparseGrid(*g), k, s, p, nsites, cap_out)]
    for grid, k, s, p, nsites, cap_out in cases:
        assert sp.downsample_supported(grid, k, s, p)
        cap = max(nsites, 8)
        ids0 = np.unique(rng.choice(grid.size, nsites)).astype(np.int32)
        ids = np.full(cap, grid.size, np.int32)
        ids[:len(ids0)] = ids0
        ids_j = jnp.asarray(ids)
        want_ids, want_mask = jax.jit(
            lambda i: sp.downsample_sites(i, grid, k, s, p, cap_out))(ids_j)
        tbl = sp.build_column_table(ids_j, grid)
        got_ids, got_mask, got_tbl = jax.jit(
            lambda t: sp.downsample_sites_bitfold(
                t, grid, k, s, p, cap_out))(tbl)
        np.testing.assert_array_equal(np.asarray(got_ids),
                                      np.asarray(want_ids))
        np.testing.assert_array_equal(np.asarray(got_mask),
                                      np.asarray(want_mask))
        og = sp.conv_out_shape(grid, k, s, p)
        ref_tbl = sp.build_column_table(got_ids, og)
        np.testing.assert_array_equal(np.asarray(got_tbl.packed),
                                      np.asarray(ref_tbl.packed))


def test_sparse_inverse_conv_matches_pair_oracle():
    """Inverse conv (reference ops/spconv/conv.py:181-223): output sites
    are the paired strided conv's input sites; each forward pair
    (i, o, k) contributes W_k @ f[o] to out[i]. Oracle: explicit loop
    over the transpose rulebook pairs."""
    rng = np.random.RandomState(11)
    grid = sp.SparseGrid(8, 8, 6)
    k, s, p = 3, 2, 1
    og = sp.conv_out_shape(grid, k, s, p)
    cap_in, cap_out = 64, 64
    ids0 = np.unique(rng.choice(grid.size, 60)).astype(np.int32)
    in_ids = np.full(cap_in, grid.size, np.int32)
    in_ids[:len(ids0)] = ids0
    in_ids = jnp.asarray(in_ids)
    out_ids, out_mask = sp.downsample_sites(in_ids, grid, k, s, p, cap_out)

    Cin, Cout = 4, 5
    feats_out = rng.randn(cap_out, Cin).astype(np.float32)
    feats_out[~np.asarray(out_mask)] = 0.0
    w = rng.randn(27, Cin, Cout).astype(np.float32) * 0.1

    nbr_t = sp.build_conv_transpose_rulebook(in_ids, out_ids, grid, og, k, s, p)
    got = np.asarray(sp.sparse_inverse_conv_gemm(
        jnp.asarray(feats_out), nbr_t, jnp.asarray(w)))

    nbr_np = np.asarray(nbr_t)
    want = np.zeros((cap_in, Cout), np.float32)
    for i in range(cap_in):
        for kk in range(27):
            o = nbr_np[i, kk]
            if o >= 0:
                want[i] += feats_out[o] @ w[kk]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_sparse_maxpool_matches_oracle():
    """indice_maxpool (reference ops/spconv/pool.py:21): max over
    present neighbor features per output site, misses ignored."""
    rng = np.random.RandomState(12)
    grid = sp.SparseGrid(8, 8, 6)
    k, s, p = 3, 2, 1
    og = sp.conv_out_shape(grid, k, s, p)
    cap_in, cap_out = 64, 64
    ids0 = np.unique(rng.choice(grid.size, 60)).astype(np.int32)
    in_ids = np.full(cap_in, grid.size, np.int32)
    in_ids[:len(ids0)] = ids0
    in_ids = jnp.asarray(in_ids)
    out_ids, out_mask = sp.downsample_sites(in_ids, grid, k, s, p, cap_out)
    nbr = sp.build_conv_rulebook(in_ids, out_ids, grid, og, k, s, p)

    feats = rng.randn(cap_in, 7).astype(np.float32)
    got = np.asarray(sp.sparse_maxpool(jnp.asarray(feats), nbr))

    nbr_np = np.asarray(nbr)
    want = np.zeros((cap_out, 7), np.float32)
    for o in range(cap_out):
        rows = nbr_np[o][nbr_np[o] >= 0]
        if len(rows):
            want[o] = feats[rows].max(axis=0)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    # active output rows all have at least one contributor
    assert np.asarray(out_mask).sum() > 0

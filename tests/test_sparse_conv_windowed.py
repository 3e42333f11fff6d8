"""Windowed Pallas sparse-conv engine (ops/sparse_conv_windowed.py).

CPU runs cover the pure-XLA pieces: the windowed-rulebook builder's
sel/s8 encoding invariants and the packed BatchNorm's parity with
MaskedBatchNorm. The kernel itself only lowers on TPU — run those
tests with BEVF_TEST_TPU=1 on the chip (they compare bit-exactly
against ops/sparse_conv.subm_gather_gemm, the tested oracle).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bevfusion_tpu.ops import sparse_conv as sp
from bevfusion_tpu.ops import sparse_conv_windowed as wg

ON_TPU = jax.default_backend() not in ("cpu",)


def _sites(n_sites, grid, seed=0):
    rng = np.random.RandomState(seed)
    ids = np.unique(rng.randint(0, grid.size, 2 * n_sites))[:n_sites]
    cap = (n_sites + 1023) // 1024 * 1024
    buf = np.full(cap, grid.size, np.int64)
    buf[: len(ids)] = ids
    return jnp.asarray(buf.astype(np.int32))


def test_windowed_rulebook_encoding_reconstructs_neighbors():
    grid = sp.SparseGrid(48, 48, 16)
    ids = _sites(2000, grid)
    nbr = sp.build_subm_rulebook(ids, grid, 3)
    C = 16
    P = wg.pack_factor(C)
    kz = 3
    wrb = wg.build_windowed_rulebook(nbr, C, kz=kz)
    assert int(wrb.overflow) == 0

    # s8 layout: [nblocks, G + 1] — per-GROUP window starts (z-minor
    # offset triples share one window) plus a trailing active-block flag
    s8 = np.asarray(wrb.s8)
    starts, act = s8[:, :-1], s8[:, -1]
    assert wrb.sel.dtype == jnp.int16
    sel = np.asarray(wrb.sel).astype(np.int64)[:, :, :27]
    nb = np.asarray(nbr)
    cap = nb.shape[0]
    nbp = np.full(((cap + wg.BLK - 1) // wg.BLK * wg.BLK, 27), -1, np.int64)
    nbp[:cap] = nb
    nbp = nbp.reshape(-1, wg.BLK, 27)
    # decode: row = s8[group]*P + relp*P + slot ; miss -> relp == -1
    relp = (sel >> 3) - 1
    slot = sel & 7
    s_off = np.repeat(starts, kz, axis=1)  # expand groups -> offsets
    row = s_off[:, None, :] * P + relp * P + slot
    got = np.where(relp >= 0, row, -1)
    np.testing.assert_array_equal(got, nbp)
    # window starts are 8-aligned (HBM tiling requirement)
    assert (starts % 8 == 0).all()
    # active flag marks exactly the blocks holding any real neighbor
    np.testing.assert_array_equal(act > 0, (nbp >= 0).any(axis=(1, 2)))


def test_windowed_rulebook_overflow_counts_drops():
    # a neighbor far outside the block's window span must be counted as
    # dropped (the documented capacity limit; realistic radial lidar
    # scans measure overflow == 0 even at slack 2)
    cap_in = 51200
    nbr = np.arange(wg.BLK, dtype=np.int32)[:, None].repeat(2, 1)
    nbr[7, 1] = 50000  # one pathological far neighbor
    wrb = wg.build_windowed_rulebook(jnp.asarray(nbr), 16, cap_in=cap_in,
                                     slack=2)
    assert int(wrb.overflow) == 1
    # and the well-behaved column is untouched
    sel0 = np.asarray(wrb.sel).astype(np.int64)[0, :, 0]
    assert ((sel0 >> 3) - 1 >= 0).all()


def test_packed_masked_batchnorm_matches_unpacked():
    from bevfusion_tpu.models.sparse_encoder import (MaskedBatchNorm,
                                                     PackedMaskedBatchNorm)

    rng = np.random.RandomState(0)
    B, cap, C = 2, 256, 16
    x = jnp.asarray(rng.randn(B, cap, C).astype(np.float32))
    mask = jnp.asarray(rng.rand(B, cap) < 0.7)
    packed = x.astype(jnp.bfloat16).reshape(B, -1, 128)

    m_u = MaskedBatchNorm(dtype=jnp.float32)
    m_p = PackedMaskedBatchNorm(C, dtype=jnp.float32)
    v = m_u.init(jax.random.PRNGKey(0), x, mask, True)

    out_u, st_u = m_u.apply(v, x, mask, True, mutable=["batch_stats"])
    out_p, st_p = m_p.apply(v, packed, mask, True, mutable=["batch_stats"])
    np.testing.assert_allclose(
        np.asarray(out_p).reshape(B, cap, C), np.asarray(out_u),
        rtol=2e-2, atol=2e-2)
    for k in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(st_p["batch_stats"][k]),
            np.asarray(st_u["batch_stats"][k]), rtol=2e-2, atol=2e-2)


@pytest.mark.skipif(not ON_TPU, reason="pallas kernel lowers on TPU only")
@pytest.mark.parametrize("cin,cout,blk", [
    # fast tier: packed (P=8) and mixed-width cases cover the kernel's
    # two layout regimes, at both the default 512-site block and the
    # 128-site block the encoder uses for strided convs; the remaining
    # widths are compile-bound duplicates of the same code paths ->
    # slow tier (run with -m slow)
    (16, 16, wg.BLK), (16, 32, wg.BLK), (16, 16, 128),
    pytest.param(64, 64, wg.BLK, marks=pytest.mark.slow),
    pytest.param(64, 64, 128, marks=pytest.mark.slow),
    pytest.param(128, 128, wg.BLK, marks=pytest.mark.slow),
])
def test_windowed_kernel_matches_oracle(cin, cout, blk):
    grid = sp.SparseGrid(64, 64, 16)
    ids = _sites(3000, grid, seed=cin + cout)
    cap = ids.shape[0]
    rng = np.random.RandomState(1)
    nbr = sp.build_subm_rulebook(ids, grid, 3)
    feats = jnp.asarray(rng.rand(cap, cin).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray((rng.rand(27, cin, cout) * 0.2).astype(np.float32)).astype(jnp.bfloat16)

    want = sp.subm_gather_gemm(feats, nbr, w)
    slack = 4 if blk < wg.BLK else wg.SLACK  # small blocks need the
    # same absolute window span (slack * blk) to stay overflow-free
    wrb = wg.build_windowed_rulebook(nbr, cin, blk=blk, slack=slack)
    assert int(wrb.overflow) == 0
    got = wg.unpack_sites(
        wg.windowed_gather_gemm(wg.pack_sites(feats, cin), wrb, w, cout, cap,
                                blk=blk, slack=slack),
        cout)
    # square convs run the winproj kernel, which rounds each offset's
    # partial to bf16 before the f32 cross-offset accumulation — allow
    # one bf16 ulp of relative error on the bf16 output lattice
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=1e-2, atol=2e-2)


@pytest.mark.skipif(not ON_TPU, reason="pallas kernel lowers on TPU only")
@pytest.mark.parametrize("blk", [
    128,  # the encoder's strided-conv block size (SBLK)
    pytest.param(wg.BLK, marks=pytest.mark.slow),
])
def test_windowed_strided_conv_matches_oracle(blk):
    grid = sp.SparseGrid(64, 64, 16)
    ids = _sites(3000, grid, seed=7)
    cap = ids.shape[0]
    rng = np.random.RandomState(2)
    cap_out = 2048
    out_grid = sp.conv_out_shape(grid, 3, 2, 1)
    out_ids, _ = sp.downsample_sites(ids, grid, 3, 2, 1, cap_out)
    cnbr = sp.build_conv_rulebook(ids, out_ids, grid, out_grid, 3, 2, 1)
    feats = jnp.asarray(rng.rand(cap, 16).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray((rng.rand(27, 16, 32) * 0.2).astype(np.float32)).astype(jnp.bfloat16)

    want = sp.subm_gather_gemm(feats, cnbr, w)
    slack = 4 * wg.SLACK if blk < wg.BLK else wg.SLACK
    wrb = wg.build_windowed_rulebook(cnbr, 16, cap_in=cap, blk=blk,
                                     slack=slack)
    assert int(wrb.overflow) == 0
    got = wg.unpack_sites(
        wg.windowed_gather_gemm(wg.pack_sites(feats, 16), wrb, w, 32, cap_out,
                                blk=blk, slack=slack),
        32)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), rtol=0, atol=1e-2)


@pytest.mark.skipif(not ON_TPU, reason="pallas kernel lowers on TPU only")
@pytest.mark.parametrize("kz", [3, 9])
def test_windowed_kernel_kz_grouping_matches_oracle(kz):
    """kz offsets per window group (the encoder runs subm convs at kz=9:
    one window per dx covers all 9 (dy, dz) offsets)."""
    grid = sp.SparseGrid(64, 64, 16)
    ids = _sites(3000, grid, seed=kz)
    cap = ids.shape[0]
    rng = np.random.RandomState(5)
    nbr = sp.build_subm_rulebook(ids, grid, 3)
    feats = jnp.asarray(rng.rand(cap, 16).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray((rng.rand(27, 16, 16) * 0.2).astype(np.float32)).astype(jnp.bfloat16)

    want = sp.subm_gather_gemm(feats, nbr, w)
    wrb = wg.build_windowed_rulebook(nbr, 16, kz=kz)
    assert int(wrb.overflow) == 0
    got = wg.unpack_sites(
        wg.windowed_gather_gemm(wg.pack_sites(feats, 16), wrb, w, 16, cap,
                                kz=kz),
        16)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=1e-2, atol=2e-2)


@pytest.mark.skipif(not ON_TPU, reason="pallas kernel lowers on TPU only")
@pytest.mark.parametrize("cin,cout", [(16, 16), (16, 32)])
def test_windowed_fused_epilogue_matches_unfused(cin, cout):
    """scale/shift/residual/relu epilogue == conv -> folded-BN affine
    (with the bf16 round-trip) -> +residual -> relu composed in XLA."""
    grid = sp.SparseGrid(64, 64, 16)
    ids = _sites(3000, grid, seed=3)
    cap = ids.shape[0]
    rng = np.random.RandomState(4)
    nbr = sp.build_subm_rulebook(ids, grid, 3)
    feats = jnp.asarray(rng.rand(cap, cin).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray((rng.rand(27, cin, cout) * 0.2).astype(np.float32)).astype(jnp.bfloat16)
    scale = jnp.asarray(rng.rand(cout).astype(np.float32) + 0.5)
    shift = jnp.asarray(rng.randn(cout).astype(np.float32) * 0.1)
    Pout = wg.pack_factor(cout)
    res = jnp.asarray(rng.randn(cap // Pout, 128).astype(np.float32)).astype(jnp.bfloat16)

    wrb = wg.build_windowed_rulebook(nbr, cin)
    base = wg.windowed_gather_gemm(wg.pack_sites(feats, cin), wrb, w, cout, cap)
    want = (base.astype(jnp.float32)
            * jnp.tile(scale, Pout) + jnp.tile(shift, Pout)).astype(jnp.bfloat16)
    want = jnp.maximum(want + res, 0)
    got = wg.windowed_gather_gemm(wg.pack_sites(feats, cin), wrb, w, cout, cap,
                                  scale=scale, shift=shift, relu=True,
                                  residual=res)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), rtol=0, atol=2e-2)


@pytest.mark.slow
@pytest.mark.skipif(not ON_TPU, reason="windowed engine lowers on TPU only")
def test_encoder_engine_parity_windowed_vs_gather():
    """Full SparseEncoder forward: windowed Pallas engine vs the
    all-sparse gather engine on identical weights — must agree exactly
    (both compute the same masked gather-GEMM math)."""
    import flax  # noqa: F401
    from bevfusion_tpu.models.sparse_encoder import SparseEncoder

    rng = np.random.RandomState(0)
    M = 4096
    ids = np.unique(rng.randint(0, 64 * 64 * 41, 2 * M))[:M]
    n = len(ids)
    cbuf = np.zeros((M, 3), np.int32)
    msk = np.zeros(M, bool)
    cbuf[:n, 0] = ids // (64 * 41)
    cbuf[:n, 1] = (ids // 41) % 64
    cbuf[:n, 2] = ids % 41
    msk[:n] = True
    coords = jnp.asarray(cbuf)[None]
    mask = jnp.asarray(msk)[None]
    feats = jnp.asarray(rng.rand(1, M, 5).astype(np.float32))

    kw = dict(in_channels=5, sparse_shape=(64, 64, 41), base_channels=16,
              output_channels=128,
              encoder_channels=[[16, 16, 32], [32, 32, 64], [64, 64, 128],
                                [128, 128]],
              encoder_paddings=[[0, 0, 1], [0, 0, 1], [0, 0, [1, 1, 0]],
                                [0, 0]],
              block_type="basicblock", site_caps=[4096, 2048, 1024],
              dtype=jnp.bfloat16)
    m_g = SparseEncoder(engine="gather", dense_from_stage=-1, **kw)
    m_w = SparseEncoder(engine="windowed", **kw)
    v = m_g.init(jax.random.PRNGKey(0), feats, coords, mask, training=False)
    out_g = np.asarray(m_g.apply(v, feats, coords, mask, training=False),
                       np.float32)
    out_w = np.asarray(m_w.apply(v, feats, coords, mask, training=False),
                       np.float32)
    # winproj square convs round per-offset partials to bf16 (one extra
    # bf16 rounding stage vs the gather engine's f32 accumulation)
    np.testing.assert_allclose(out_w, out_g, rtol=2e-2, atol=2e-2)


@pytest.mark.skipif(not ON_TPU, reason="pallas kernel lowers on TPU only")
@pytest.mark.parametrize("cin,cout,kz", [
    (16, 16, 1),
    (16, 16, 9),  # the encoder's subm grouping (one window per dx)
    pytest.param(64, 64, 1, marks=pytest.mark.slow),
])
def test_windowed_vjp_subm_matches_oracle_grads(cin, cout, kz):
    """windowed_conv_ad backward (mirrored windowed data-grad + Pallas
    dW accumulation) vs jax.grad through the XLA gather oracle
    (reference backward: spconv_ops.h:364+)."""
    grid = sp.SparseGrid(64, 64, 16)
    ids = _sites(2048, grid, seed=cin)
    cap = ids.shape[0]
    rng = np.random.RandomState(2)
    nbr = sp.build_subm_rulebook(ids, grid, 3)
    feats = jnp.asarray(rng.rand(cap, cin).astype(np.float32))
    w = jnp.asarray((rng.rand(27, cin, cout) * 0.2).astype(np.float32))
    gout = jnp.asarray(rng.rand(cap, cout).astype(np.float32))

    def loss_oracle(f, w_):
        y = sp.subm_gather_gemm(f.astype(jnp.bfloat16),
                                nbr, w_.astype(jnp.bfloat16))
        return jnp.sum(y.astype(jnp.float32) * gout)

    want_df, want_dw = jax.grad(loss_oracle, argnums=(0, 1))(feats, w)

    wrb = wg.build_windowed_rulebook(nbr, cin, kz=kz)
    assert int(wrb.overflow) == 0

    def loss_win(f, w_):
        y = wg.windowed_conv_ad(
            wg.pack_sites(f.astype(jnp.bfloat16), cin), w_.astype(jnp.bfloat16),
            wrb, wrb, cout, cap, cap, wg.SLACK, wg.SLACK, True, kz)
        y = wg.unpack_sites(y, cout)
        return jnp.sum(y.astype(jnp.float32) * gout)

    got_df, got_dw = jax.grad(loss_win, argnums=(0, 1))(feats, w)

    # bf16 cotangent quantization: one-ulp relative error on large
    # magnitudes is expected (training-grade numerics)
    np.testing.assert_allclose(np.asarray(got_df, np.float32),
                               np.asarray(want_df, np.float32),
                               rtol=2e-2, atol=5e-2)
    scale = np.max(np.abs(np.asarray(want_dw)))
    np.testing.assert_allclose(np.asarray(got_dw, np.float32),
                               np.asarray(want_dw, np.float32),
                               rtol=0, atol=2e-2 * max(scale, 1.0))


@pytest.mark.slow
@pytest.mark.skipif(not ON_TPU, reason="pallas kernel lowers on TPU only")
def test_windowed_vjp_strided_matches_oracle_grads():
    """Strided windowed conv backward via the transposed rulebook
    (build_conv_transpose_rulebook) vs the XLA oracle grads."""
    grid = sp.SparseGrid(64, 64, 16)
    ids = _sites(2048, grid, seed=11)
    cap = ids.shape[0]
    cin, cout = 32, 64
    rng = np.random.RandomState(3)
    og = sp.conv_out_shape(grid, 3, 2, 1)
    cap_out = 1024
    out_ids, out_mask = sp.downsample_sites(ids, grid, 3, 2, 1, cap_out)
    cnbr = sp.build_conv_rulebook(ids, out_ids, grid, og, 3, 2, 1)
    feats = jnp.asarray(rng.rand(cap, cin).astype(np.float32))
    w = jnp.asarray((rng.rand(27, cin, cout) * 0.2).astype(np.float32))
    gout = jnp.asarray(rng.rand(cap_out, cout).astype(np.float32))

    def loss_oracle(f, w_):
        y = sp.subm_gather_gemm(f.astype(jnp.bfloat16), cnbr,
                                w_.astype(jnp.bfloat16))
        return jnp.sum(y.astype(jnp.float32) * gout)

    want_df, want_dw = jax.grad(loss_oracle, argnums=(0, 1))(feats, w)

    # mismatched fwd/bwd block sizes, exactly as the encoder runs its
    # strided convs (fwd blk=128 small blocks, bwd default 512)
    SBLK = 128
    swrb = wg.build_windowed_rulebook(cnbr, cin, cap_in=cap,
                                      slack=4 * wg.SLACK, blk=SBLK, kz=1)
    assert int(swrb.overflow) == 0
    nbr_t = sp.build_conv_transpose_rulebook(ids, out_ids, grid, og, 3, 2, 1)
    twrb = wg.build_windowed_rulebook(nbr_t, cout, cap_in=cap_out,
                                      slack=2 * wg.SLACK)
    assert int(twrb.overflow) == 0

    def loss_win(f, w_):
        y = wg.windowed_conv_ad(
            wg.pack_sites(f.astype(jnp.bfloat16), cin), w_.astype(jnp.bfloat16),
            swrb, twrb, cout, cap_out, cap, 4 * wg.SLACK, 2 * wg.SLACK, False,
            1, SBLK, wg.BLK)
        y = wg.unpack_sites(y, cout)
        return jnp.sum(y.astype(jnp.float32) * gout)

    got_df, got_dw = jax.grad(loss_win, argnums=(0, 1))(feats, w)

    # bf16 cotangent quantization: one-ulp relative error on large
    # magnitudes is expected (training-grade numerics)
    np.testing.assert_allclose(np.asarray(got_df, np.float32),
                               np.asarray(want_df, np.float32),
                               rtol=2e-2, atol=5e-2)
    scale = np.max(np.abs(np.asarray(want_dw)))
    np.testing.assert_allclose(np.asarray(got_dw, np.float32),
                               np.asarray(want_dw, np.float32),
                               rtol=0, atol=2e-2 * max(scale, 1.0))

import jax
import jax.numpy as jnp
import numpy as np

from bevfusion_tpu.ops import pointnet as pn


def test_knn_and_ball_query():
    rng = np.random.RandomState(0)
    xyz = jnp.array(rng.randn(64, 3).astype(np.float32))
    q = xyz[:8]
    idx, d = pn.knn(4, xyz, q)
    # nearest neighbor of a point in the set is itself
    np.testing.assert_array_equal(np.asarray(idx[:, 0]), np.arange(8))
    assert float(d[:, 0].max()) < 2e-3  # a2-2ab+b2 cancellation noise

    bidx, bval = pn.ball_query(0.8, 8, xyz, q)
    d2 = np.asarray(pn.square_distance(q, xyz))
    for i in range(8):
        hits = set(np.nonzero(d2[i] <= 0.8**2)[0][:8].tolist())
        got = set(np.asarray(bidx[i][np.asarray(bval[i])]).tolist())
        assert got == set(list(hits)[:len(got)]) or got <= hits


def test_fps_spreads_points():
    # two far clusters: FPS with 2 points must pick one from each
    pts = np.concatenate([
        np.random.RandomState(1).randn(20, 3) * 0.1,
        np.random.RandomState(2).randn(20, 3) * 0.1 + 10.0,
    ]).astype(np.float32)
    idx = np.asarray(pn.furthest_point_sample(jnp.array(pts), 2))
    assert (idx[0] < 20) != (idx[1] < 20)


def test_three_interpolate_exact_at_source():
    rng = np.random.RandomState(3)
    known = jnp.array(rng.randn(16, 3).astype(np.float32))
    feats = jnp.array(rng.randn(16, 5).astype(np.float32))
    d, idx = pn.three_nn(known, known)
    w = pn.interpolation_weights(d)
    out = pn.three_interpolate(feats, idx, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(feats), atol=1e-3)


def test_assign_score_withk_shapes():
    rng = np.random.RandomState(4)
    S, K, M, C, N = 6, 4, 3, 8, 20
    scores = jnp.array(rng.rand(S, K, M).astype(np.float32))
    pf = jnp.array(rng.randn(N, M, C).astype(np.float32))
    cf = jnp.array(rng.randn(N, M, C).astype(np.float32))
    idx = jnp.array(rng.randint(0, N, (S, K)).astype(np.int32))
    out = pn.assign_score_withk(scores, pf, cf, idx)
    assert out.shape == (S, K, C)


def test_sa_and_fp_modules():
    from bevfusion_tpu.models.pointnet_modules import PointFPModule, PointSAModuleMSG

    rng = np.random.RandomState(5)
    xyz = jnp.array(rng.randn(64, 3).astype(np.float32))
    feats = jnp.array(rng.randn(64, 6).astype(np.float32))
    sa = PointSAModuleMSG(num_point=16, radii=(0.5, 1.0), sample_nums=(8, 8),
                          mlp_channels=((16,), (16,)))
    vs = sa.init(jax.random.PRNGKey(0), xyz, feats)
    (nx, nf), _ = sa.apply(vs, xyz, feats, training=False, mutable=["batch_stats"])
    assert nx.shape == (16, 3) and nf.shape == (16, 32)

    fp = PointFPModule(mlp_channels=(12,))
    vs2 = fp.init(jax.random.PRNGKey(0), xyz, nx, feats, nf)
    out, _ = fp.apply(vs2, xyz, nx, feats, nf, training=False, mutable=["batch_stats"])
    assert out.shape == (64, 12)

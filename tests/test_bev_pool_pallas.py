"""Pallas bev_pool kernel vs the XLA oracle path.

The kernel (ops/bev_pool_pallas.py) only lowers on TPU backends — on the
CPU CI host these tests verify the pure-XLA pieces of the pallas module
(slot/rank bookkeeping, digit encoding, custom-vjp backward math) in
interpret-free form, and the full kernel comparison is marked tpu-only.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bevfusion_tpu.ops import bev_pool as bp

ON_TPU = jax.default_backend() not in ("cpu",)


def _np_lss_pool(depth, ctx, ids, valid, Z, X, Y):
    B, N, D, fH, fW = depth.shape
    C = ctx.shape[-1]
    out = np.zeros((B, Z * X * Y, C), np.float64)
    for b in range(B):
        for n in range(N):
            for d in range(D):
                for h in range(fH):
                    for w in range(fW):
                        if valid[b, n, d, h, w]:
                            out[b, ids[b, n, d, h, w]] += (
                                depth[b, n, d, h, w] * ctx[b, n, h, w])
    out = out.reshape(B, Z, X, Y, C).transpose(0, 2, 3, 1, 4)
    return out.reshape(B, X, Y, Z * C)


def _tiny_inputs(seed=0):
    rng = np.random.RandomState(seed)
    B, N, D, fH, fW, C = 1, 2, 5, 4, 6, 16
    X = Y = 8
    depth = rng.rand(B, N, D, fH, fW).astype(np.float32)
    ctx = rng.rand(B, N, fH, fW, C).astype(np.float32)
    ids = rng.randint(0, X * Y, (B, N, D, fH, fW)).astype(np.int32)
    valid = rng.rand(B, N, D, fH, fW) < 0.7
    return depth, ctx, ids, valid, X, Y


def test_xla_path_matches_numpy():
    depth, ctx, ids, valid, X, Y = _tiny_inputs()
    got = np.asarray(bp.lss_bev_pool(
        jnp.asarray(depth), jnp.asarray(ctx), jnp.asarray(ids),
        jnp.asarray(valid), 1, X, Y))
    want = _np_lss_pool(depth, ctx, ids, valid, 1, X, Y)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=1e-2)


@pytest.mark.skipif(not ON_TPU, reason="pallas kernel lowers on TPU only")
def test_pallas_kernel_matches_numpy():
    from bevfusion_tpu.ops.bev_pool_pallas import lss_bev_pool_tpu

    depth, ctx, ids, valid, X, Y = _tiny_inputs(1)
    got = np.asarray(jax.jit(
        lambda d, c, i, v: lss_bev_pool_tpu(d, c, i, v, 1, X, Y)
    )(jnp.asarray(depth), jnp.asarray(ctx), jnp.asarray(ids), jnp.asarray(valid)))
    want = _np_lss_pool(depth, ctx, ids, valid, 1, X, Y)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=1e-2)


def test_custom_vjp_backward_matches_autodiff_of_oracle():
    from bevfusion_tpu.ops.bev_pool_pallas import _bwd

    depth, ctx, ids, valid, X, Y = _tiny_inputs(2)
    jd, jc = jnp.asarray(depth), jnp.asarray(ctx)
    ji, jv = jnp.asarray(ids), jnp.asarray(valid)

    def oracle(d, c):
        # force the CPU/XLA path regardless of backend
        B, N, D, fH, fW = d.shape
        C = c.shape[-1]
        num_cells = X * Y
        def one(dep, cx, ii, vva):
            ids_f = jnp.where(vva, ii, num_cells).reshape(-1)
            vals = (dep.reshape(-1)[:, None] *
                    jnp.repeat(cx.reshape(N, 1, fH * fW, C), D, axis=1)
                    .reshape(-1, C))
            out = jnp.zeros((num_cells + 1, C))
            out = out.at[ids_f].add(vals)
            return out[:num_cells]
        o = jax.vmap(one)(d, c, ji, jv)
        return o.reshape(d.shape[0], 1, X, Y, C).transpose(0, 2, 3, 1, 4).reshape(
            d.shape[0], X, Y, C)

    g = jnp.asarray(np.random.RandomState(3).rand(1, X, Y, 16).astype(np.float32))
    want_d, want_c = jax.vjp(oracle, jd, jc)[1](g)
    got_d, got_c, _, _ = _bwd(1, X, Y, (jd, jc, ji, jv), g)
    np.testing.assert_allclose(np.asarray(got_d), np.asarray(want_d),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c),
                               rtol=1e-4, atol=1e-5)

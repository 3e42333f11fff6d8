"""Deformable conv (DCNv1/v2) oracle tests.

Behavioral reference: mmcv DeformConv2dPack / ModulatedDeformConv2dPack
as consumed by DCNSeparateHead
(mmdet3d/models/heads/bbox/centerpoint.py:130-246).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bevfusion_tpu.ops.deform_conv import DeformConv2dPack, deform_conv2d


def _conv_oracle(x, w, stride=1, padding=1):
    """Plain conv via lax for the zero-offset equivalence check."""
    k = int(round(np.sqrt(w.shape[0])))
    w4 = w.reshape(k, k, w.shape[1], w.shape[2])
    return jax.lax.conv_general_dilated(
        x, w4, (stride, stride), ((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def test_deform_conv_zero_offset_equals_conv():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 9, 11, 6).astype(np.float32))
    w = jnp.asarray(rng.randn(9, 6, 5).astype(np.float32) * 0.2)
    off = jnp.zeros((2, 9, 11, 18), jnp.float32)
    got = deform_conv2d(x, off, w, stride=1, padding=1)
    want = _conv_oracle(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_deform_conv_matches_bilinear_loop_oracle():
    rng = np.random.RandomState(1)
    B, H, W, C, Co, k = 1, 6, 7, 3, 4, 3
    K = k * k
    x = rng.randn(B, H, W, C).astype(np.float32)
    w = (rng.randn(K, C, Co) * 0.2).astype(np.float32)
    off = (rng.randn(B, H, W, 2 * K) * 1.5).astype(np.float32)
    mask = 1.0 / (1.0 + np.exp(-rng.randn(B, H, W, K))).astype(np.float32)

    def bil(img, py, px):
        y0, x0 = int(np.floor(py)), int(np.floor(px))
        wy, wx = py - y0, px - x0
        out = np.zeros(C, np.float32)
        for yy, ww_y in ((y0, 1 - wy), (y0 + 1, wy)):
            for xx, ww_x in ((x0, 1 - wx), (x0 + 1, wx)):
                if 0 <= yy < H and 0 <= xx < W:
                    out += img[yy, xx] * (ww_y * ww_x)
        return out

    want = np.zeros((B, H, W, Co), np.float32)
    for b in range(B):
        for oy in range(H):
            for ox in range(W):
                col = []
                for kk in range(K):
                    dy, dx = kk // k, kk % k
                    py = oy - 1 + dy + off[b, oy, ox, 2 * kk]
                    px = ox - 1 + dx + off[b, oy, ox, 2 * kk + 1]
                    col.append(bil(x[b], py, px) * mask[b, oy, ox, kk])
                want[b, oy, ox] = np.concatenate(col) @ w.reshape(K * C, Co)

    got = deform_conv2d(jnp.asarray(x), jnp.asarray(off), jnp.asarray(w),
                        mask=jnp.asarray(mask), stride=1, padding=1)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_dcn_pack_zero_init_equals_conv():
    """conv_offset is zero-initialized (mmcv contract), so a freshly
    initialized DeformConv2dPack must equal a plain conv with its
    weight."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    mod = DeformConv2dPack(6, 3)
    var = mod.init(jax.random.PRNGKey(0), x)
    got = mod.apply(var, x)
    want = _conv_oracle(x, var["params"]["weight"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
    assert float(jnp.abs(jnp.asarray(
        var["params"]["conv_offset"]["kernel"])).max()) == 0.0


def test_dcn_separate_head_forward():
    from bevfusion_tpu.models.heads.centerpoint import DCNSeparateHead
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 16, 16, 32).astype(np.float32))
    heads = {"reg": (2, 2), "height": (1, 2), "heatmap": (3, 2)}
    mod = DCNSeparateHead(heads, num_cls=3, head_conv=16)
    var = mod.init(jax.random.PRNGKey(0), x, training=False)
    out = mod.apply(var, x, training=False)
    assert set(out) == {"reg", "height", "heatmap"}
    assert out["heatmap"].shape == (1, 16, 16, 3)
    assert out["reg"].shape == (1, 16, 16, 2)
    assert out["height"].shape == (1, 16, 16, 1)
    for v in out.values():
        assert np.isfinite(np.asarray(v)).all()
    # heatmap final bias init -2.19 (reference init_weights)
    b = np.asarray(var["params"]["cls_head1"]["bias"])
    np.testing.assert_allclose(b, -2.19, rtol=1e-6)

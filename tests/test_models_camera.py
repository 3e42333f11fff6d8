import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bevfusion_tpu.models.swin import SwinTransformer
from bevfusion_tpu.models.necks import GeneralizedLSSFPN, LSSFPN
from bevfusion_tpu.models.second import SECOND, SECONDFPN
from bevfusion_tpu.models.resnet import GeneralizedResNet
from bevfusion_tpu.models.fusers import ConvFuser
from bevfusion_tpu.models.vtransforms import (
    LSSTransform,
    get_geometry,
    rasterize_depth,
)
from bevfusion_tpu.models.heads.segm import BEVSegmentationHead
from bevfusion_tpu.models.layers import resize_bilinear


@pytest.mark.slow
def test_swin_tiny_shapes():
    m = SwinTransformer(embed_dims=32, depths=(1, 1, 1, 1), num_heads=(1, 2, 4, 8),
                        window_size=4, out_indices=(1, 2, 3))
    x = jnp.zeros((1, 64, 96, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(params, x)
    assert [o.shape for o in outs] == [
        (1, 8, 12, 64), (1, 4, 6, 128), (1, 2, 3, 256)]


def test_generalized_lss_fpn():
    m = GeneralizedLSSFPN(in_channels=(8, 16, 32), out_channels=12, num_outs=3,
                          upsample_cfg={"mode": "bilinear", "align_corners": False})
    xs = [jnp.zeros((2, 32, 88, 8)), jnp.zeros((2, 16, 44, 16)), jnp.zeros((2, 8, 22, 32))]
    vs = m.init(jax.random.PRNGKey(0), xs)
    outs, _ = m.apply(vs, xs, training=False, mutable=["batch_stats"])
    assert [o.shape for o in outs] == [(2, 32, 88, 12), (2, 16, 44, 12)]


def test_second_and_fpn():
    m = SECOND(in_channels=16, out_channels=(32, 64), layer_nums=(2, 2), layer_strides=(1, 2))
    x = jnp.zeros((1, 32, 32, 16))
    vs = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(vs, x)
    assert outs[0].shape == (1, 32, 32, 32)
    assert outs[1].shape == (1, 16, 16, 64)
    n = SECONDFPN(in_channels=(32, 64), out_channels=(48, 48), upsample_strides=(1, 2),
                  use_conv_for_no_stride=True)
    vs2 = n.init(jax.random.PRNGKey(0), list(outs))
    y = n.apply(vs2, list(outs))[0]
    assert y.shape == (1, 32, 32, 96)


def test_generalized_resnet_and_lssfpn():
    m = GeneralizedResNet(in_channels=8, blocks=((2, 16, 2), (2, 32, 2), (2, 64, 1)))
    x = jnp.zeros((1, 64, 64, 8))
    vs = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(vs, x)
    assert [o.shape for o in outs] == [(1, 32, 32, 16), (1, 16, 16, 32), (1, 16, 16, 64)]
    n = LSSFPN(in_indices=(-1, 0), in_channels=(64, 16), out_channels=24, scale_factor=2)
    vs2 = n.init(jax.random.PRNGKey(0), outs)
    y = n.apply(vs2, outs)
    assert y.shape == (1, 64, 64, 24)


def test_conv_fuser():
    m = ConvFuser(in_channels=(8, 16), out_channels=12)
    xs = [jnp.zeros((1, 10, 10, 8)), jnp.zeros((1, 10, 10, 16))]
    vs = m.init(jax.random.PRNGKey(0), xs)
    y = m.apply(vs, xs)
    assert y.shape == (1, 10, 10, 12)


def test_get_geometry_identity():
    """With identity calibration, frustum depth d at pixel (u,v) maps to
    (u*d, v*d, d) in 'lidar' frame."""
    frustum = jnp.asarray(
        np.stack(np.meshgrid(np.arange(2.0), np.arange(3.0), [1.0, 2.0],
                             indexing="ij"), -1)
    ).transpose(2, 1, 0, 3)  # [D=2, fH=3, fW=2, 3] with (u, v, d)
    eye4 = jnp.eye(4)[None, None]
    geom = get_geometry(frustum, eye4, jnp.eye(3)[None, None], eye4, jnp.eye(4)[None])
    u, v, d = frustum[..., 0], frustum[..., 1], frustum[..., 2]
    np.testing.assert_allclose(np.asarray(geom[0, 0, ..., 0]), np.asarray(u * d), atol=1e-5)
    np.testing.assert_allclose(np.asarray(geom[0, 0, ..., 1]), np.asarray(v * d), atol=1e-5)
    np.testing.assert_allclose(np.asarray(geom[0, 0, ..., 2]), np.asarray(d), atol=1e-5)


def test_rasterize_depth_simple():
    # one point straight ahead of an identity camera
    pts = jnp.array([[[2.0, 3.0, 5.0, 0.0, 0.0]]])  # [B=1, P=1, 5]
    mask = jnp.ones((1, 1), bool)
    l2i = jnp.eye(4)[None, None]  # u=x/z, v=y/z
    ia = jnp.eye(4)[None, None]
    la = jnp.eye(4)[None]
    d = rasterize_depth(pts, mask, l2i, ia, la, (8, 8))
    # u = 2/5 = 0.4 -> col 0, v = 3/5 -> row 0, dist = z = 5
    assert d.shape == (1, 1, 8, 8, 1)
    assert float(d[0, 0, 0, 0, 0]) == 5.0
    assert float(jnp.sum(d)) == 5.0


def test_lss_transform_end_to_end():
    m = LSSTransform(
        in_channels=16, out_channels=8, image_size=(32, 64), feature_size=(4, 8),
        xbound=(-10.0, 10.0, 0.5), ybound=(-10.0, 10.0, 0.5),
        zbound=(-10.0, 10.0, 20.0), dbound=(1.0, 9.0, 1.0), downsample=2,
    )
    B, N = 1, 2
    feats = jnp.ones((B, N, 4, 8, 16))
    mats = {
        "camera2lidar": jnp.tile(jnp.eye(4), (B, N, 1, 1)),
        "camera_intrinsics": jnp.tile(jnp.eye(4), (B, N, 1, 1)),
        "img_aug_matrix": jnp.tile(jnp.eye(4), (B, N, 1, 1)),
        "lidar_aug_matrix": jnp.tile(jnp.eye(4), (B, 1, 1)),
    }
    vs = m.init(jax.random.PRNGKey(0), feats, None, None, mats)
    y, _ = m.apply(vs, feats, None, None, mats, training=False, mutable=["batch_stats"])
    assert y.shape == (1, 20, 20, 8)


def test_segm_head_losses_and_eval():
    head = BEVSegmentationHead(
        in_channels=16,
        grid_transform={
            "input_scope": ((-8.0, 8.0, 1.0), (-8.0, 8.0, 1.0)),
            "output_scope": ((-4.0, 4.0, 0.5), (-4.0, 4.0, 0.5)),
        },
        classes=("a", "b"),
        loss="focal",
    )
    x = jnp.ones((2, 16, 16, 16))
    tgt = jnp.zeros((2, 2, 16, 16))
    vs = head.init(jax.random.PRNGKey(0), x)
    losses, _ = head.apply(vs, x, tgt, training=True, mutable=["batch_stats"])
    assert set(losses) == {"a/focal", "b/focal"}
    out = head.apply(vs, x)
    assert out.shape == (2, 16, 16, 2)
    assert (np.asarray(out) >= 0).all() and (np.asarray(out) <= 1).all()


def test_resize_bilinear_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    x = np.random.RandomState(0).randn(1, 3, 7, 9).astype(np.float32)
    for ac in (False, True):
        want = F.interpolate(torch.from_numpy(x), size=(13, 5), mode="bilinear",
                             align_corners=ac).numpy()
        got = resize_bilinear(jnp.asarray(x.transpose(0, 2, 3, 1)), (13, 5), ac)
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), want, rtol=1e-4, atol=1e-5
        )

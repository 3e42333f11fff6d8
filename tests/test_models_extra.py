import jax
import jax.numpy as jnp
import numpy as np

from bevfusion_tpu.models.vovnet import VoVNet
from bevfusion_tpu.models.dla import DLA
from bevfusion_tpu.models.necks import DetectronFPN
from bevfusion_tpu.models.pillar_encoder import (
    PillarFeatureNet, PointPillarsEncoder, PointPillarsScatter,
)
from bevfusion_tpu.models.radar_encoder import RadarEncoder
from bevfusion_tpu.models.bevdepth import (
    AwareBEVDepth, bce_depth_loss, downsampled_gt_depth,
)


def test_vovnet_shapes():
    m = VoVNet(spec_name="V-19-slim-eSE", out_features=("stage3", "stage4", "stage5"))
    x = jnp.zeros((1, 64, 64, 3))
    vs = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    outs, _ = m.apply(vs, x, training=False, mutable=["batch_stats"])
    assert [o.shape for o in outs] == [(1, 8, 8, 256), (1, 4, 4, 384), (1, 2, 2, 512)]


def test_dla_shapes():
    m = DLA(levels=(1, 1, 1, 1, 1, 1), channels=(4, 8, 16, 32, 64, 128),
            out_features=("level3", "level4", "level5"))
    x = jnp.zeros((1, 64, 64, 3))
    vs = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    outs, _ = m.apply(vs, x, training=False, mutable=["batch_stats"])
    assert [o.shape for o in outs] == [(1, 8, 8, 32), (1, 4, 4, 64), (1, 2, 2, 128)]


def test_detectron_fpn():
    m = DetectronFPN(in_indices=(0, 1, 2), out_indices=(0, 1, 2),
                     in_channels=(8, 16, 32), out_channels=12)
    xs = [jnp.zeros((1, 16, 16, 8)), jnp.zeros((1, 8, 8, 16)), jnp.zeros((1, 4, 4, 32))]
    vs = jax.jit(m.init)(jax.random.PRNGKey(0), xs)
    outs, _ = m.apply(vs, xs, training=False, mutable=["batch_stats"])
    assert [o.shape for o in outs] == [(1, 16, 16, 12), (1, 8, 8, 12), (1, 4, 4, 12)]


def test_pointpillars_encoder():
    enc = PointPillarsEncoder(
        pts_voxel_encoder={
            "type": "PillarFeatureNet", "in_channels": 5,
            "feat_channels": (16, 16), "voxel_size": (0.5, 0.5, 8),
            "point_cloud_range": (-8, -8, -4, 8, 8, 4),
        },
        pts_middle_encoder={
            "type": "PointPillarsScatter", "in_channels": 16,
            "output_shape": (32, 32),
        },
    )
    rng = np.random.RandomState(0)
    B, M, P = 2, 32, 8
    table = rng.randn(B, M, P, 5).astype(np.float32)
    coords = rng.randint(0, 32, (B, M, 3)).astype(np.int32)
    num = rng.randint(1, P, (B, M)).astype(np.int32)
    mask = np.ones((B, M), bool)
    vs = jax.jit(enc.init)(jax.random.PRNGKey(0), jnp.array(table),
                           jnp.array(coords), jnp.array(mask), jnp.array(num))
    out, _ = enc.apply(vs, jnp.array(table), jnp.array(coords), jnp.array(mask),
                       jnp.array(num), training=False, mutable=["batch_stats"])
    assert out.shape == (2, 32, 32, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_radar_encoder():
    enc = RadarEncoder(
        pts_voxel_encoder={
            "type": "RadarFeatureNet", "in_channels": 7,
            "feat_channels": (16,), "voxel_size": (1.0, 1.0, 8),
            "point_cloud_range": (-8, -8, -4, 8, 8, 4),
        },
        pts_middle_encoder={
            "type": "PointPillarsScatter", "in_channels": 16,
            "output_shape": (16, 16),
        },
    )
    rng = np.random.RandomState(1)
    B, M, P = 1, 16, 4
    table = rng.randn(B, M, P, 7).astype(np.float32)
    coords = rng.randint(0, 16, (B, M, 3)).astype(np.int32)
    num = rng.randint(1, P, (B, M)).astype(np.int32)
    mask = np.ones((B, M), bool)
    vs = jax.jit(enc.init)(jax.random.PRNGKey(0), jnp.array(table),
                           jnp.array(coords), jnp.array(mask), jnp.array(num))
    out, _ = enc.apply(vs, jnp.array(table), jnp.array(coords), jnp.array(mask),
                       jnp.array(num), training=False, mutable=["batch_stats"])
    assert out.shape == (1, 16, 16, 16)


def test_aware_bevdepth_forward_and_loss():
    m = AwareBEVDepth(
        in_channels=16, out_channels=8, image_size=(32, 64), feature_size=(4, 8),
        xbound=(-8.0, 8.0, 0.5), ybound=(-8.0, 8.0, 0.5),
        zbound=(-10.0, 10.0, 20.0), dbound=(1.0, 9.0, 1.0), downsample=1,
    )
    B, N = 1, 2
    feats = jnp.ones((B, N, 4, 8, 16))
    mats = {
        "camera2lidar": jnp.tile(jnp.eye(4), (B, N, 1, 1)),
        "camera_intrinsics": jnp.tile(jnp.eye(4), (B, N, 1, 1)),
        "img_aug_matrix": jnp.tile(jnp.eye(4), (B, N, 1, 1)),
        "lidar_aug_matrix": jnp.tile(jnp.eye(4), (B, 1, 1)),
        "camera2ego": jnp.tile(jnp.eye(4), (B, N, 1, 1)),
        "lidar2image": jnp.tile(jnp.eye(4), (B, N, 1, 1)),
    }
    gt_depths = jnp.ones((B, N, 32, 64)) * 5.0
    vs = jax.jit(lambda: m.init(jax.random.PRNGKey(0), feats, None, None, mats))()
    bev, _ = m.apply(vs, feats, None, None, mats, training=False,
                     mutable=["batch_stats"])
    assert bev.shape == (B, 32, 32, 8)

    out, _ = m.apply(vs, feats, None, None, mats, training=True,
                     gt_depths=gt_depths, depth_loss=True,
                     mutable=["batch_stats"])
    bev2, dloss = out
    assert np.isfinite(float(dloss)) and float(dloss) > 0


def test_downsampled_gt_depth_onehot():
    g = np.zeros((1, 1, 16, 16), np.float32)
    g[0, 0, 0, 0] = 3.0  # depth 3 with dbound (1, 9, 1) -> bin index 2
    out = np.asarray(downsampled_gt_depth(jnp.array(g), 8, (1.0, 9.0, 1.0), 8))
    assert out.shape == (4, 8)
    assert out[0, 2] == 1.0
    assert out[1:].sum() == 0  # other cells empty -> background (all zero)

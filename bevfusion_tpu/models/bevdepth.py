"""BEVDepth-style view transforms with camera-aware depth + depth loss.

Behavioral reference: mmdet3d/models/vtransforms/aware_bevdepth.py —
DepthNet with SE layers conditioned on a 27-dim calibration vector
(intrinsics/img-aug/lidar-aug/sensor2ego, :221-326), ASPP (:109),
optional DepthRefinement (:20), BCE depth loss against min-pooled
one-hot GT depth (:423-478). AwareBEVDepth is camera-only;
AwareDBEVDepth also encodes the sparse lidar/radar depth image like
DepthLSS.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..registry import VTRANSFORMS
from .layers import BasicBlock, Conv, ConvBNAct, Norm, resize_bilinear
from .vtransforms import _BaseLSS, rasterize_depth

Dtype = Any


class SELayer(nn.Module):
    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, gate):
        """x [B, H, W, C]; gate [B, C] -> x * sigmoid(gate)."""
        return x * jax.nn.sigmoid(gate)[:, None, None, :].astype(x.dtype)


class ASPP(nn.Module):
    """Atrous pyramid: rates (1, 6, 12, 18) + global pooling branch."""

    mid_channels: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        c = self.mid_channels
        outs = []
        for i, (k, d) in enumerate(((1, 1), (3, 6), (3, 12), (3, 18))):
            pad = 0 if k == 1 else d
            y = nn.Conv(c, (k, k), padding=((pad, pad), (pad, pad)),
                        kernel_dilation=(d, d), use_bias=False,
                        dtype=self.dtype, name=f"aspp{i}_conv")(x)
            y = Norm("BN", dtype=self.dtype, name=f"aspp{i}_bn")(y, training)
            outs.append(nn.relu(y))
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = Conv(c, 1, 1, 0, use_bias=False, dtype=self.dtype, name="gp_conv")(g)
        g = Norm("BN", dtype=self.dtype, name="gp_bn")(g, training)
        g = nn.relu(g)
        g = jnp.broadcast_to(g, outs[0].shape)
        y = jnp.concatenate(outs + [g], axis=-1)
        y = Conv(c, 1, 1, 0, use_bias=False, dtype=self.dtype, name="out_conv")(y)
        y = Norm("BN", dtype=self.dtype, name="out_bn")(y, training)
        return nn.relu(y)


class DepthNet(nn.Module):
    """Camera-aware depth/context head (aware_bevdepth.py:221-326)."""

    mid_channels: int
    context_channels: int
    depth_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mlp_input, training: bool = False):
        """x [BN, fH, fW, C]; mlp_input [BN, 27]."""
        mid = self.mid_channels
        x = ConvBNAct(mid, 3, 1, 1, use_bias=True, norm="BN", act="ReLU",
                      dtype=self.dtype, name="reduce")(x, training)
        mi = Norm("BN1d", dtype=self.dtype, name="mlp_bn")(mlp_input, training)

        def mlp(name):
            y = nn.Dense(mid, dtype=self.dtype, name=f"{name}_fc1")(mi)
            y = nn.relu(y)
            return nn.Dense(mid, dtype=self.dtype, name=f"{name}_fc2")(y)

        ctx = SELayer(mid, dtype=self.dtype, name="context_se")(x, mlp("context_mlp"))
        ctx = Conv(self.context_channels, 1, 1, 0, use_bias=True,
                   dtype=self.dtype, name="context_conv")(ctx)

        d = SELayer(mid, dtype=self.dtype, name="depth_se")(x, mlp("depth_mlp"))
        for i in range(3):
            d = BasicBlock(mid, 1, dtype=self.dtype, name=f"res{i}")(d, training)
        d = ASPP(mid, dtype=self.dtype, name="aspp")(d, training)
        d = Conv(mid, 3, 1, 1, use_bias=True, dtype=self.dtype, name="post_conv")(d)
        d = Norm("BN", dtype=self.dtype, name="post_bn")(d, training)
        d = Conv(self.depth_channels, 1, 1, 0, use_bias=True,
                 dtype=self.dtype, name="depth_out")(d)
        d = Norm("BN", dtype=self.dtype, name="depth_out_bn")(d, training)
        return jnp.concatenate([d, ctx], axis=-1)


def calib_mlp_input(intrins, img_aug, lidar_aug, camera2ego):
    """The 27-dim per-camera calibration vector (aware_bevdepth.py:285-312)."""
    B, N = intrins.shape[:2]
    ida = img_aug
    bda = jnp.broadcast_to(lidar_aug[:, None], (B, N, 4, 4))
    s2e = camera2ego[..., :3, :4].reshape(B, N, 12)
    feats = jnp.stack([
        intrins[..., 0, 0], intrins[..., 1, 1],
        intrins[..., 0, 2], intrins[..., 1, 2],
        ida[..., 0, 0], ida[..., 0, 1], ida[..., 0, 3],
        ida[..., 1, 0], ida[..., 1, 1], ida[..., 1, 3],
        bda[..., 0, 0], bda[..., 0, 1], bda[..., 1, 0],
        bda[..., 1, 1], bda[..., 2, 2],
    ], axis=-1)
    return jnp.concatenate([feats, s2e], axis=-1).reshape(B * N, 27)


def downsampled_gt_depth(gt_depths, factor: int, dbound, D: int):
    """[B, N, H, W] -> one-hot [B*N*h*w, D] via min-pool then binning
    (aware_bevdepth.py:442-478); zeros stay background."""
    B, N, H, W = gt_depths.shape
    g = gt_depths.reshape(B * N, H // factor, factor, W // factor, factor)
    g = g.transpose(0, 1, 3, 2, 4).reshape(-1, factor * factor)
    g = jnp.where(g == 0.0, 1e5, g)
    g = jnp.min(g, axis=-1)
    g = (g - (dbound[0] - dbound[2])) / dbound[2]
    g = jnp.where((g < D + 1) & (g >= 0.0), g, 0.0)
    onehot = jax.nn.one_hot(g.astype(jnp.int32), D + 1)
    return onehot.reshape(-1, D + 1)[:, 1:]


def bce_depth_loss(depth_preds, gt_depths, factor, dbound, D, loss_factor=3.0):
    """depth_preds [BN, fH, fW, D] softmax probs; gt [B, N, H, W]."""
    labels = downsampled_gt_depth(gt_depths, factor, dbound, D)
    preds = depth_preds.reshape(-1, D).astype(jnp.float32)
    fg = jnp.max(labels, axis=1) > 0.0
    p = jnp.clip(preds, 1e-6, 1 - 1e-6)
    bce = -(labels * jnp.log(p) + (1 - labels) * jnp.log(1 - p))
    bce = jnp.where(fg[:, None], bce, 0.0)
    return loss_factor * jnp.sum(bce) / jnp.maximum(jnp.sum(fg), 1.0)


@VTRANSFORMS.register()
class AwareBEVDepth(_BaseLSS):
    """Camera-only BEVDepth (aware_bevdepth.py:330-500)."""

    bevdepth_downsample: int = 8
    bevdepth_refine: bool = False
    depth_loss_factor: float = 3.0
    use_points: str = "lidar"

    @nn.compact
    def __call__(self, img_feats, points, points_mask, mats,
                 training: bool = False, gt_depths=None, depth_loss=False):
        dx, bx, nx, frustum, D = self.setup_constants()
        B, N, fH, fW, Cin = img_feats.shape

        x = img_feats.reshape(B * N, fH, fW, Cin)
        mlp_in = calib_mlp_input(
            mats["camera_intrinsics"][..., :3, :3].astype(jnp.float32),
            mats["img_aug_matrix"].astype(jnp.float32),
            mats["lidar_aug_matrix"].astype(jnp.float32),
            mats["camera2ego"].astype(jnp.float32),
        )
        x = DepthNet(self.in_channels, self.out_channels, D,
                     dtype=self.dtype, name="depthnet")(x, mlp_in, training)
        depth = jax.nn.softmax(x[..., :D].astype(jnp.float32), axis=-1)
        ctx = x[..., D:]

        bev = self.pool(
            depth.reshape(B, N, fH, fW, D).transpose(0, 1, 4, 2, 3),
            ctx.reshape(B, N, fH, fW, self.out_channels).astype(jnp.float32),
            mats,
        ).astype(self.dtype)
        bev = self.downsample_block(bev, training)

        if depth_loss and gt_depths is not None:
            loss = bce_depth_loss(depth, gt_depths, self.bevdepth_downsample,
                                  self.dbound, D, self.depth_loss_factor)
            return bev, loss
        return bev


@VTRANSFORMS.register()
class AwareDBEVDepth(AwareBEVDepth):
    """BEVDepth + sparse lidar depth input (aware_bevdepth.py:503-697):
    the rasterized depth image is CNN-encoded and concatenated with
    image features before the camera-aware DepthNet."""

    @nn.compact
    def __call__(self, img_feats, points, points_mask, mats,
                 training: bool = False, gt_depths=None, depth_loss=False):
        dx, bx, nx, frustum, D = self.setup_constants()
        B, N, fH, fW, Cin = img_feats.shape

        d = rasterize_depth(
            points, points_mask, mats["lidar2image"], mats["img_aug_matrix"],
            mats["lidar_aug_matrix"], self.image_size,
        ).reshape(B * N, *self.image_size, 1).astype(self.dtype)
        d = ConvBNAct(8, 1, 1, 0, use_bias=True, norm="BN", act="ReLU",
                      dtype=self.dtype, name="dt0")(d, training)
        d = ConvBNAct(32, 5, 4, 2, use_bias=True, norm="BN", act="ReLU",
                      dtype=self.dtype, name="dt1")(d, training)
        d = ConvBNAct(64, 5, 2, 2, use_bias=True, norm="BN", act="ReLU",
                      dtype=self.dtype, name="dt2")(d, training)

        x = img_feats.reshape(B * N, fH, fW, Cin)
        x = jnp.concatenate([d, x], axis=-1)
        x = ConvBNAct(self.in_channels, 3, 1, 1, use_bias=True, norm="BN",
                      act="ReLU", dtype=self.dtype, name="fuse_depth")(x, training)

        mlp_in = calib_mlp_input(
            mats["camera_intrinsics"][..., :3, :3].astype(jnp.float32),
            mats["img_aug_matrix"].astype(jnp.float32),
            mats["lidar_aug_matrix"].astype(jnp.float32),
            mats["camera2ego"].astype(jnp.float32),
        )
        x = DepthNet(self.in_channels, self.out_channels, D,
                     dtype=self.dtype, name="depthnet")(x, mlp_in, training)
        depth = jax.nn.softmax(x[..., :D].astype(jnp.float32), axis=-1)
        ctx = x[..., D:]

        bev = self.pool(
            depth.reshape(B, N, fH, fW, D).transpose(0, 1, 4, 2, 3),
            ctx.reshape(B, N, fH, fW, self.out_channels).astype(jnp.float32),
            mats,
        ).astype(self.dtype)
        bev = self.downsample_block(bev, training)

        if depth_loss and gt_depths is not None:
            loss = bce_depth_loss(depth, gt_depths, self.bevdepth_downsample,
                                  self.dbound, D, self.depth_loss_factor)
            return bev, loss
        return bev

"""Shared flax building blocks (NHWC, TPU-native).

Conventions:
- channels-last everywhere (feature dim on the TPU lane dimension);
- explicit symmetric padding tuples so strided convs match the
  reference's torch Conv2d(padding=p) semantics (XLA 'SAME' pads
  asymmetrically for even sizes / stride 2);
- BatchNorm: flax momentum = 1 - torch momentum; batch stats live in the
  'batch_stats' collection. Under pjit with a batch-sharded mesh the
  batch moments are computed over the *global* batch, which reproduces
  the reference's NaiveSyncBatchNorm (reference mmdet3d/ops/norm.py:9-130)
  for free.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = [
    "Conv",
    "ConvBNAct",
    "Norm",
    "BasicBlock",
    "resize_bilinear",
    "max_pool2d_same",
]

Dtype = Any


def _pair(v) -> Tuple[int, int]:
    if isinstance(v, (tuple, list)):
        return tuple(v)
    return (v, v)


class Conv(nn.Module):
    """2D conv with torch-style integer padding."""

    features: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    stride: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 0
    use_bias: bool = True
    groups: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = _pair(self.kernel_size)
        s = _pair(self.stride)
        p = _pair(self.padding)
        return nn.Conv(
            features=self.features,
            kernel_size=k,
            strides=s,
            padding=((p[0], p[0]), (p[1], p[1])),
            use_bias=self.use_bias,
            feature_group_count=self.groups,
            dtype=self.dtype,
            name="conv",
        )(x)


class Norm(nn.Module):
    """Normalization selected by a (reference-style) norm_cfg dict.

    Supported: BN/BN1d/BN2d/BN3d (all BatchNorm over the channel axis),
    LN, GN. eps/momentum follow the cfg (torch convention for momentum).
    """

    norm_type: str = "BN"
    eps: float = 1e-5
    momentum: float = 0.1  # torch convention
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        t = self.norm_type
        if t.startswith("BN") or t.startswith("SyncBN") or t == "naiveSyncBN":
            return nn.BatchNorm(
                use_running_average=not training,
                momentum=1.0 - self.momentum,
                epsilon=self.eps,
                dtype=self.dtype,
                name="bn",
            )(x)
        if t == "LN":
            return nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="ln")(x)
        if t == "GN":
            return nn.GroupNorm(epsilon=self.eps, dtype=self.dtype, name="gn")(x)
        raise ValueError(f"unsupported norm type {t}")


_ACTS: dict = {
    "ReLU": nn.relu,
    "relu": nn.relu,
    "GELU": nn.gelu,
    "gelu": nn.gelu,
    "SiLU": nn.silu,
    "LeakyReLU": lambda x: nn.leaky_relu(x, 0.01),
    None: lambda x: x,
}


class ConvBNAct(nn.Module):
    """conv -> norm -> act, the mmcv ConvModule contract (order conv/norm/act)."""

    features: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    stride: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 0
    use_bias: Optional[bool] = None  # None = "auto": bias iff no norm
    norm: Optional[str] = "BN"
    norm_eps: float = 1e-5
    norm_momentum: float = 0.1
    act: Optional[str] = "ReLU"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        bias = self.use_bias if self.use_bias is not None else self.norm is None
        x = Conv(
            self.features,
            self.kernel_size,
            self.stride,
            self.padding,
            use_bias=bias,
            dtype=self.dtype,
        )(x)
        if self.norm is not None:
            x = Norm(
                self.norm, self.norm_eps, self.norm_momentum, dtype=self.dtype
            )(x, training)
        x = _ACTS[self.act](x)
        return x


class BasicBlock(nn.Module):
    """mmcv.cnn.resnet.BasicBlock: 3x3(stride)-BN-ReLU-3x3-BN + shortcut.

    Downsample = 1x1(stride)-BN when stride != 1 or channels change
    (reference GeneralizedResNet builds these via make_res_layer,
    mmdet3d/models/backbones/resnet.py:24-32).
    """

    features: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        identity = x
        out = Conv(self.features, 3, self.stride, 1, use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = Norm("BN", dtype=self.dtype, name="bn1")(out, training)
        out = nn.relu(out)
        out = Conv(self.features, 3, 1, 1, use_bias=False, dtype=self.dtype, name="conv2")(out)
        out = Norm("BN", dtype=self.dtype, name="bn2")(out, training)
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = Conv(
                self.features, 1, self.stride, 0, use_bias=False, dtype=self.dtype, name="downsample_conv"
            )(x)
            identity = Norm("BN", dtype=self.dtype, name="downsample_bn")(identity, training)
        return nn.relu(out + identity)


def resize_bilinear(x, size, align_corners: bool = False):
    """Bilinear resize of NHWC x to (H', W').

    align_corners=False matches torch F.interpolate/jax.image.resize
    half-pixel sampling; align_corners=True reproduces torch's endpoint-
    aligned grid (used by LSSFPN, reference models/necks/lss.py:53-58).
    """
    H, W = x.shape[-3], x.shape[-2]
    Ho, Wo = size
    if (Ho, Wo) == (H, W):
        return x

    def grid(n_in, n_out):
        if align_corners:
            if n_out == 1:
                return jnp.zeros((1,), jnp.float32)
            return jnp.arange(n_out, dtype=jnp.float32) * (n_in - 1) / (n_out - 1)
        # torch half-pixel mapping (no antialiasing even when downsampling)
        return (jnp.arange(n_out, dtype=jnp.float32) + 0.5) * (n_in / n_out) - 0.5

    gy, gx = grid(H, Ho), grid(W, Wo)
    # weights from the unclamped floor (torch semantics), indices clamped
    y0f, x0f = jnp.floor(gy), jnp.floor(gx)
    wy = (gy - y0f)[:, None, None]
    wx = (gx - x0f)[None, :, None]
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, H - 1)
    x0 = jnp.clip(x0f.astype(jnp.int32), 0, W - 1)
    y1 = jnp.clip(y0f.astype(jnp.int32) + 1, 0, H - 1)
    x1 = jnp.clip(x0f.astype(jnp.int32) + 1, 0, W - 1)

    def gather2(a, yi, xi):
        return jnp.take(jnp.take(a, yi, axis=-3), xi, axis=-2)

    v00 = gather2(x, y0, x0)
    v01 = gather2(x, y0, x1)
    v10 = gather2(x, y1, x0)
    v11 = gather2(x, y1, x1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return (top * (1 - wy) + bot * wy).astype(x.dtype)


def max_pool2d_same(x, kernel: int, stride: int = 1, padding: int = 0):
    """torch-style F.max_pool2d on NHWC."""
    return nn.max_pool(
        x,
        window_shape=(kernel, kernel),
        strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
    )

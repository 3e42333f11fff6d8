"""SECOND BEV backbone + SECONDFPN neck (NHWC flax).

Reference semantics: mmdet3d/models/backbones/second.py:14-97 and
mmdet3d/models/necks/second.py:14-99.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..registry import BACKBONES, NECKS
from .layers import Conv, Norm

Dtype = Any


@BACKBONES.register()
class SECOND(nn.Module):
    """Stages of [stride conv + layer_num convs], each conv-BN-ReLU.

    Returns one feature map per stage (second.py:85-97).
    """

    in_channels: int = 128
    out_channels: Sequence[int] = (128, 128, 256)
    layer_nums: Sequence[int] = (3, 5, 5)
    layer_strides: Sequence[int] = (2, 2, 2)
    norm_cfg: Optional[dict] = None  # {'type','eps','momentum'}
    conv_cfg: Optional[dict] = None
    dtype: Dtype = jnp.float32

    def _norm(self):
        cfg = self.norm_cfg or {"type": "BN", "eps": 1e-3, "momentum": 0.01}
        return cfg.get("type", "BN"), cfg.get("eps", 1e-3), cfg.get("momentum", 0.01)

    @nn.compact
    def __call__(self, x, training: bool = False):
        nt, ne, nm = self._norm()
        outs = []
        for i, num in enumerate(self.layer_nums):
            x = Conv(
                self.out_channels[i], 3, self.layer_strides[i], 1,
                use_bias=False, dtype=self.dtype, name=f"block{i}_conv0",
            )(x)
            x = Norm(nt, ne, nm, dtype=self.dtype, name=f"block{i}_bn0")(x, training)
            x = nn.relu(x)
            for j in range(num):
                x = Conv(
                    self.out_channels[i], 3, 1, 1, use_bias=False,
                    dtype=self.dtype, name=f"block{i}_conv{j + 1}",
                )(x)
                x = Norm(nt, ne, nm, dtype=self.dtype, name=f"block{i}_bn{j + 1}")(x, training)
                x = nn.relu(x)
            outs.append(x)
        return tuple(outs)


@NECKS.register()
class SECONDFPN(nn.Module):
    """Per-stage deconv (or conv) to a common stride, concat channels.

    Reference: necks/second.py:48-99. upsample_strides[i] > 1 -> deconv
    kernel=stride; == 1 with use_conv_for_no_stride -> 1x1 conv.
    """

    in_channels: Sequence[int] = (128, 128, 256)
    out_channels: Sequence[int] = (256, 256, 256)
    upsample_strides: Sequence[int] = (1, 2, 4)
    norm_cfg: Optional[dict] = None
    upsample_cfg: Optional[dict] = None
    conv_cfg: Optional[dict] = None
    use_conv_for_no_stride: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, training: bool = False):
        cfg = self.norm_cfg or {"type": "BN", "eps": 1e-3, "momentum": 0.01}
        nt, ne, nm = cfg.get("type", "BN"), cfg.get("eps", 1e-3), cfg.get("momentum", 0.01)
        ups = []
        for i, x in enumerate(xs):
            stride = self.upsample_strides[i]
            if stride > 1 or (stride == 1 and not self.use_conv_for_no_stride):
                y = nn.ConvTranspose(
                    features=self.out_channels[i],
                    kernel_size=(stride, stride),
                    strides=(stride, stride),
                    use_bias=False,
                    dtype=self.dtype,
                    name=f"deblock{i}_deconv",
                )(x)
            else:
                k = int(round(1 / stride))
                y = Conv(
                    self.out_channels[i], k, k, 0, use_bias=False,
                    dtype=self.dtype, name=f"deblock{i}_conv",
                )(x)
            y = Norm(nt, ne, nm, dtype=self.dtype, name=f"deblock{i}_bn")(y, training)
            ups.append(nn.relu(y))
        out = jnp.concatenate(ups, axis=-1) if len(ups) > 1 else ups[0]
        return [out]

"""Standard ResNet camera backbone (NHWC flax).

Behavioral reference: the torchvision/mmdet ResNet the reference's
camera+radar (resnet50) and bevdepth (resnet) configs import — stem
7x7/2 + maxpool, Bottleneck (1x1 -> 3x3 -> 1x1, expansion 4) or
BasicBlock stages with strides (1, 2, 2, 2), out_indices selecting
emitted scales.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..registry import BACKBONES
from .layers import Conv, Norm, BasicBlock, max_pool2d_same

Dtype = Any


class Bottleneck(nn.Module):
    planes: int  # mid channels; out = planes * 4
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        out_ch = self.planes * 4
        identity = x
        y = Conv(self.planes, 1, 1, 0, use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = Norm("BN", dtype=self.dtype, name="bn1")(y, training)
        y = nn.relu(y)
        y = Conv(self.planes, 3, self.stride, 1, use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = Norm("BN", dtype=self.dtype, name="bn2")(y, training)
        y = nn.relu(y)
        y = Conv(out_ch, 1, 1, 0, use_bias=False, dtype=self.dtype, name="conv3")(y)
        y = Norm("BN", dtype=self.dtype, name="bn3")(y, training)
        if self.stride != 1 or x.shape[-1] != out_ch:
            identity = Conv(out_ch, 1, self.stride, 0, use_bias=False,
                            dtype=self.dtype, name="downsample_conv")(x)
            identity = Norm("BN", dtype=self.dtype, name="downsample_bn")(identity, training)
        return nn.relu(y + identity)


_ARCH = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}


@BACKBONES.register()
class ResNet(nn.Module):
    depth: int = 50
    in_channels: int = 3
    base_channels: int = 64
    out_indices: Sequence[int] = (0, 1, 2, 3)
    frozen_stages: int = -1
    norm_eval: bool = False
    init_cfg: Optional[dict] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        block_type, layers = _ARCH[self.depth]
        x = Conv(self.base_channels, 7, 2, 3, use_bias=False,
                 dtype=self.dtype, name="stem_conv")(x)
        x = Norm("BN", dtype=self.dtype, name="stem_bn")(x, training)
        x = nn.relu(x)
        x = max_pool2d_same(x, 3, 2, 1)

        outs = []
        planes = self.base_channels
        for si, num_blocks in enumerate(layers):
            stride = 1 if si == 0 else 2
            for bi in range(num_blocks):
                s = stride if bi == 0 else 1
                if block_type == "bottleneck":
                    x = Bottleneck(planes, s, dtype=self.dtype,
                                   name=f"layer{si + 1}_block{bi}")(x, training)
                else:
                    x = BasicBlock(planes, s, dtype=self.dtype,
                                   name=f"layer{si + 1}_block{bi}")(x, training)
            if si in self.out_indices:
                outs.append(x)
            planes *= 2
        return tuple(outs)

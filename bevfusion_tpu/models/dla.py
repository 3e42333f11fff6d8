"""DLA (Deep Layer Aggregation) camera backbone (NHWC flax).

Behavioral reference: mmdet3d/models/backbones/dla.py — DLA BasicBlock
(:16-63, no-downsample residual with external identity), Root (:126-153,
concat children -> 1x1 conv -> +child0 if residual -> ReLU), recursive
Tree (:156-240, max-pool downsample + 1x1 projection identity,
level_root children threading), DLA trunk of base 7x7 conv + 2 plain
conv levels + 4 Trees (:243-330).
"""
from __future__ import annotations

from typing import Any, List, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..registry import BACKBONES
from .layers import Conv, ConvBNAct, Norm

Dtype = Any


class DLABasic(nn.Module):
    channels: int
    stride: int = 1
    dilation: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None, training: bool = False):
        if residual is None:
            residual = x
        y = Conv(self.channels, 3, self.stride, self.dilation, use_bias=False,
                 dtype=self.dtype, name="conv1")(x)
        y = Norm("BN", dtype=self.dtype, name="bn1")(y, training)
        y = nn.relu(y)
        y = Conv(self.channels, 3, 1, self.dilation, use_bias=False,
                 dtype=self.dtype, name="conv2")(y)
        y = Norm("BN", dtype=self.dtype, name="bn2")(y, training)
        return nn.relu(y + residual)


class Root(nn.Module):
    channels: int
    kernel_size: int = 1
    residual: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, children, training: bool = False):
        x = jnp.concatenate(children, axis=-1)
        y = Conv(self.channels, self.kernel_size, 1,
                 (self.kernel_size - 1) // 2, use_bias=False,
                 dtype=self.dtype, name="conv")(x)
        y = Norm("BN", dtype=self.dtype, name="bn")(y, training)
        if self.residual:
            y = y + children[0]
        return nn.relu(y)


class Tree(nn.Module):
    levels: int
    in_channels: int
    out_channels: int
    stride: int = 1
    level_root: bool = False
    root_dim: int = 0
    root_kernel_size: int = 1
    root_residual: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None, children=None, training: bool = False):
        children = list(children) if children is not None else []
        root_dim = self.root_dim or 2 * self.out_channels
        if self.level_root:
            root_dim += self.in_channels

        bottom = (
            nn.max_pool(x, (self.stride, self.stride),
                        strides=(self.stride, self.stride))
            if self.stride > 1 else x
        )
        if self.levels == 1 and self.in_channels != self.out_channels:
            proj = Conv(self.out_channels, 1, 1, 0, use_bias=False,
                        dtype=self.dtype, name="project_conv")(bottom)
            proj = Norm("BN", dtype=self.dtype, name="project_bn")(proj, training)
        else:
            proj = bottom
        if self.level_root:
            children.append(bottom)

        if self.levels == 1:
            x1 = DLABasic(self.out_channels, self.stride, dtype=self.dtype,
                          name="tree1")(x, proj, training)
            x2 = DLABasic(self.out_channels, 1, dtype=self.dtype,
                          name="tree2")(x1, None, training)
            return Root(self.out_channels, self.root_kernel_size,
                        self.root_residual, dtype=self.dtype,
                        name="root")([x2, x1] + children, training)
        x1 = Tree(self.levels - 1, self.in_channels, self.out_channels,
                  self.stride, root_kernel_size=self.root_kernel_size,
                  root_residual=self.root_residual, dtype=self.dtype,
                  name="tree1")(x, training=training)
        children.append(x1)
        return Tree(self.levels - 1, self.out_channels, self.out_channels,
                    root_dim=root_dim + self.out_channels,
                    root_kernel_size=self.root_kernel_size,
                    root_residual=self.root_residual, dtype=self.dtype,
                    name="tree2")(x1, children=children, training=training)


@BACKBONES.register()
class DLA(nn.Module):
    levels: Sequence[int] = (1, 1, 1, 2, 2, 1)  # DLA-34
    channels: Sequence[int] = (16, 32, 64, 128, 256, 512)
    residual_root: bool = False
    out_features: Optional[Sequence[str]] = None
    norm_eval: bool = False
    init_cfg: Optional[dict] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        ch = self.channels
        x = ConvBNAct(ch[0], 7, 1, 3, use_bias=False, norm="BN", act="ReLU",
                      dtype=self.dtype, name="base_layer")(x, training)
        feats = {}
        for i in range(self.levels[0]):
            x = ConvBNAct(ch[0], 3, 1, 1, use_bias=False, norm="BN",
                          act="ReLU", dtype=self.dtype, name=f"level0_{i}")(x, training)
        feats["level0"] = x
        for i in range(self.levels[1]):
            x = ConvBNAct(ch[1], 3, 2 if i == 0 else 1, 1, use_bias=False,
                          norm="BN", act="ReLU", dtype=self.dtype,
                          name=f"level1_{i}")(x, training)
        feats["level1"] = x
        for lvl, level_root in ((2, False), (3, True), (4, True), (5, True)):
            x = Tree(self.levels[lvl], ch[lvl - 1], ch[lvl], stride=2,
                     level_root=level_root, root_residual=self.residual_root,
                     dtype=self.dtype, name=f"level{lvl}")(x, training=training)
            feats[f"level{lvl}"] = x
        wanted = self.out_features or ("level5",)
        return tuple(feats[n] for n in wanted)

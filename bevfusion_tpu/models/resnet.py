"""GeneralizedResNet BEV decoder backbone (NHWC flax).

Reference semantics: mmdet3d/models/backbones/resnet.py:13-40 — a list of
mmcv BasicBlock res-stages described by (num_blocks, out_channels, stride).
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..registry import BACKBONES
from .layers import BasicBlock

Dtype = Any


@BACKBONES.register()
class GeneralizedResNet(nn.Module):
    in_channels: int
    blocks: Sequence[Tuple[int, int, int]]  # (num_blocks, out_channels, stride)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        outputs = []
        for si, (num_blocks, out_channels, stride) in enumerate(self.blocks):
            for bi in range(num_blocks):
                x = BasicBlock(
                    out_channels,
                    stride=stride if bi == 0 else 1,
                    dtype=self.dtype,
                    name=f"stage{si}_block{bi}",
                )(x, training)
            outputs.append(x)
        return outputs

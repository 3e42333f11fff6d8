"""BEV fusers (NHWC flax).

Reference semantics: mmdet3d/models/fusers/conv.py:12-23 (ConvFuser) and
fusers/add.py:13-40 (AddFuser with random whole-sensor dropout).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..registry import FUSERS
from .layers import ConvBNAct

Dtype = Any


@FUSERS.register()
class ConvFuser(nn.Module):
    in_channels: Sequence[int]
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs, training: bool = False):
        x = jnp.concatenate(list(inputs), axis=-1)
        return ConvBNAct(
            self.out_channels, 3, 1, 1, use_bias=False, norm="BN", act="ReLU",
            dtype=self.dtype, name="fuse",
        )(x, training)


@FUSERS.register()
class AddFuser(nn.Module):
    """Per-sensor 3x3 conv-BN-ReLU then weighted mean; at train time one
    sensor is dropped entirely with prob ``dropout`` (add.py:33-40)."""

    in_channels: Sequence[int]
    out_channels: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs, training: bool = False):
        feats = [
            ConvBNAct(
                self.out_channels, 3, 1, 1, use_bias=False, norm="BN",
                act="ReLU", dtype=self.dtype, name=f"transform{k}",
            )(x, training)
            for k, x in enumerate(inputs)
        ]
        n = len(feats)
        weights = jnp.ones((n,), jnp.float32)
        if training and self.dropout > 0 and n > 1:
            rng = self.make_rng("dropout")
            r1, r2 = jax.random.split(rng)
            do_drop = jax.random.uniform(r1) < self.dropout
            drop_idx = jax.random.randint(r2, (), 0, n)
            weights = jnp.where(
                do_drop & (jnp.arange(n) == drop_idx), 0.0, weights
            )
        total = jnp.sum(weights)
        out = sum(w * f for w, f in zip(weights, feats)) / total
        return out

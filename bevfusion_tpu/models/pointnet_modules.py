"""PointNet++ set-abstraction / feature-propagation modules (flax).

Behavioral reference: mmdet3d/ops/pointnet_modules/point_sa_module.py
(PointSAModule(MSG): FPS sampling + per-radius ball-query grouping +
shared MLP + max pool) and PointFPModule (three_nn inverse-distance
interpolation + unit MLP). No BEVFusion config uses these (SURVEY
§2.10); provided for PointNet++/PartA2-style models on this framework.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import pointnet as pn
from ..registry import BACKBONES
from .layers import Norm

Dtype = Any


class SharedMLP(nn.Module):
    channels: Sequence[int]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        for i, c in enumerate(self.channels):
            x = nn.Dense(c, use_bias=False, dtype=self.dtype, name=f"fc{i}")(x)
            x = Norm("BN", 1e-5, 0.1, dtype=self.dtype, name=f"bn{i}")(x, training)
            x = nn.relu(x)
        return x


class PointSAModuleMSG(nn.Module):
    """Multi-scale-group set abstraction over one sample.

    xyz [N, 3], feats [N, C] (optional), mask [N] ->
    (new_xyz [npoint, 3], new_feats [npoint, sum(mlps[-1])]).
    """

    num_point: int
    radii: Sequence[float]
    sample_nums: Sequence[int]
    mlp_channels: Sequence[Sequence[int]]
    use_xyz: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xyz, feats=None, mask=None, training: bool = False):
        fps_idx = pn.furthest_point_sample(xyz, self.num_point, mask)
        new_xyz = pn.gather_points(xyz, fps_idx)

        outs = []
        for r, (radius, nsample, mlp) in enumerate(
            zip(self.radii, self.sample_nums, self.mlp_channels)
        ):
            idx, valid = pn.ball_query(radius, nsample, xyz, new_xyz, mask)
            grouped_xyz = pn.group_points(xyz, idx) - new_xyz[:, None, :]
            parts = [grouped_xyz]
            if feats is not None:
                parts.append(pn.group_points(feats, idx))
            g = jnp.concatenate(parts, -1) if len(parts) > 1 else parts[0]
            if not self.use_xyz and feats is not None:
                g = parts[1]
            g = SharedMLP(tuple(mlp), dtype=self.dtype, name=f"mlp{r}")(g, training)
            g = jnp.where(valid[..., None], g, -jnp.inf)
            pooled = jnp.max(g, axis=1)
            outs.append(jnp.where(jnp.isfinite(pooled), pooled, 0.0))
        return new_xyz, jnp.concatenate(outs, -1)


class PointSAModule(PointSAModuleMSG):
    """Single-scale convenience wrapper (point_sa_module.py:354)."""


@BACKBONES.register()
class PointFPModule(nn.Module):
    """Feature propagation: interpolate coarse features onto fine points
    then a unit MLP."""

    mlp_channels: Sequence[int]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, target_xyz, source_xyz, target_feats, source_feats,
                 source_mask=None, training: bool = False):
        dists, idx = pn.three_nn(target_xyz, source_xyz, source_mask)
        w = pn.interpolation_weights(dists)
        interp = pn.three_interpolate(source_feats, idx, w)
        if target_feats is not None:
            interp = jnp.concatenate([interp, target_feats], -1)
        return SharedMLP(tuple(self.mlp_channels), dtype=self.dtype,
                         name="mlp")(interp, training)

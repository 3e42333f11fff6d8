"""PointPillars encoder family (flax, static shapes).

Behavioral reference: mmdet3d/models/backbones/pillar_encoder.py —
PillarFeatureNet decorates per-pillar point tables with cluster/center
offsets then max-pools an MLP (:43-182); PointPillarsScatter writes
pillar features to a dense BEV canvas (:186-243); PointPillarsEncoder
composes both (:244-258).

TPU-first: the per-sample canvas loop becomes one scatter per sample
under vmap; padded pillars are masked, never filtered.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..registry import BACKBONES
from .layers import Norm

Dtype = Any


class PFNLayer(nn.Module):
    out_channels: int
    last_layer: bool = False
    norm_cfg: Optional[dict] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, point_mask, training: bool = False):
        """x [M, P, C]; point_mask [M, P]."""
        units = self.out_channels if self.last_layer else self.out_channels // 2
        cfg = dict(self.norm_cfg or {"type": "BN1d", "eps": 1e-3, "momentum": 0.01})
        y = nn.Dense(units, use_bias=False, dtype=self.dtype, name="linear")(x)
        y = Norm(cfg.get("type", "BN1d"), cfg.get("eps", 1e-3),
                 cfg.get("momentum", 0.01), dtype=self.dtype, name="norm")(y, training)
        y = nn.relu(y)
        y = jnp.where(point_mask[..., None], y, -jnp.inf)
        y_max = jnp.max(y, axis=1, keepdims=True)
        y_max = jnp.where(jnp.isfinite(y_max), y_max, 0.0)
        if self.last_layer:
            return y_max
        y = jnp.where(point_mask[..., None], y, 0.0)
        return jnp.concatenate(
            [y, jnp.broadcast_to(y_max, y.shape[:2] + (units,))], axis=-1
        )


@BACKBONES.register()
class PillarFeatureNet(nn.Module):
    in_channels: int = 4
    feat_channels: Sequence[int] = (64,)
    with_distance: bool = False
    voxel_size: Sequence[float] = (0.2, 0.2, 4)
    point_cloud_range: Sequence[float] = (0, -40, -3, 70.4, 40, 1)
    norm_cfg: Optional[dict] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, features, num_points, coords, training: bool = False):
        """features [M, P, C] raw point table; num_points [M];
        coords [M, 3] int (x, y, z). Returns [M, C_out]."""
        M, P, C = features.shape
        cnt = jnp.maximum(num_points, 1).astype(features.dtype)[:, None, None]
        mean = jnp.sum(features[..., :3], axis=1, keepdims=True) / cnt
        f_cluster = features[..., :3] - mean

        vx, vy = self.voxel_size[0], self.voxel_size[1]
        x_off = vx / 2 + self.point_cloud_range[0]
        y_off = vy / 2 + self.point_cloud_range[1]
        fc_x = features[..., 0] - (coords[:, 0:1].astype(features.dtype) * vx + x_off)
        fc_y = features[..., 1] - (coords[:, 1:2].astype(features.dtype) * vy + y_off)
        parts = [features, f_cluster, jnp.stack([fc_x, fc_y], -1)]
        if self.with_distance:
            parts.append(jnp.linalg.norm(features[..., :3], axis=-1, keepdims=True))
        x = jnp.concatenate(parts, axis=-1)

        pm = jax.lax.broadcasted_iota(jnp.int32, (M, P), 1) < num_points[:, None]
        x = jnp.where(pm[..., None], x, 0.0)

        chans = list(self.feat_channels)
        for i, c in enumerate(chans):
            x = PFNLayer(c, last_layer=(i == len(chans) - 1),
                         norm_cfg=self.norm_cfg, dtype=self.dtype,
                         name=f"pfn{i}")(x, pm, training)
        return x[:, 0, :]  # [M, C_out]


@BACKBONES.register()
class PointPillarsScatter(nn.Module):
    in_channels: int = 64
    output_shape: Sequence[int] = (512, 512)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pillar_feats, coords, mask):
        """pillar_feats [M, C]; coords [M, 3] (x, y, z); mask [M].
        Returns [nx, ny, C] dense canvas (NHWC; reference emits NCHW at
        pillar_encoder.py:238-242)."""
        nx, ny = int(self.output_shape[0]), int(self.output_shape[1])
        idx = coords[:, 0] * ny + coords[:, 1]
        idx = jnp.where(mask, idx, nx * ny)
        canvas = jnp.zeros((nx * ny + 1, pillar_feats.shape[-1]), pillar_feats.dtype)
        canvas = canvas.at[idx].set(
            jnp.where(mask[:, None], pillar_feats, 0.0)
        )
        return canvas[:-1].reshape(nx, ny, -1)


@BACKBONES.register()
class PointPillarsEncoder(nn.Module):
    pts_voxel_encoder: Dict[str, Any]
    pts_middle_encoder: Dict[str, Any]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, voxel_table, coords, mask, num_points, training: bool = False):
        """Batched: voxel_table [B, M, P, C]; coords [B, M, 3];
        mask [B, M]; num_points [B, M]. Returns [B, nx, ny, C]."""
        pfn = BACKBONES.build(self.pts_voxel_encoder, dtype=self.dtype)
        scatter = BACKBONES.build(self.pts_middle_encoder, dtype=self.dtype)
        B = voxel_table.shape[0]
        outs = []
        for b in range(B):  # small static loop; pillar tables are big
            feats = pfn(voxel_table[b], num_points[b], coords[b], training)
            outs.append(scatter(feats, coords[b], mask[b]))
        return jnp.stack(outs)

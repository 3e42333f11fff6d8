"""Radar pillar encoder (flax, static shapes).

Behavioral reference: mmdet3d/models/backbones/radar_encoder.py —
RFNLayer (linear + BN1d + ReLU, max-pool only on the last layer,
:47-84), RadarFeatureNet (normalized-xyz decoration + pillar-center
offsets, :87-186; the CUDA feature_decorator fast path :178 is just
this decoration fused — here it is one fused XLA computation by
construction), RadarEncoder composite (:188-221).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..registry import BACKBONES
from .layers import Norm

Dtype = Any


class RFNLayer(nn.Module):
    out_channels: int
    last_layer: bool = False
    norm_cfg: Optional[dict] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, point_mask, training: bool = False):
        cfg = dict(self.norm_cfg or {"type": "BN1d", "eps": 1e-3, "momentum": 0.01})
        y = nn.Dense(self.out_channels, use_bias=False, dtype=self.dtype,
                     name="linear")(x)
        y = Norm(cfg.get("type", "BN1d"), cfg.get("eps", 1e-3),
                 cfg.get("momentum", 0.01), dtype=self.dtype, name="norm")(y, training)
        y = nn.relu(y)
        if self.last_layer:
            y = jnp.where(point_mask[..., None], y, -jnp.inf)
            y = jnp.max(y, axis=1, keepdims=True)
            return jnp.where(jnp.isfinite(y), y, 0.0)
        return jnp.where(point_mask[..., None], y, 0.0)


@BACKBONES.register()
class RadarFeatureNet(nn.Module):
    in_channels: int = 4
    feat_channels: Sequence[int] = (64,)
    with_distance: bool = False
    voxel_size: Sequence[float] = (0.2, 0.2, 4)
    point_cloud_range: Sequence[float] = (0, -40, -3, 70.4, 40, 1)
    norm_cfg: Optional[dict] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, features, num_points, coords, training: bool = False):
        """features [M, P, C]; num_points [M]; coords [M, 3] (x, y, z)."""
        M, P, C = features.shape
        pcr = self.point_cloud_range
        vx, vy = self.voxel_size[0], self.voxel_size[1]
        x_off = vx / 2 + pcr[0]
        y_off = vy / 2 + pcr[1]

        fc_x = features[..., 0] - (coords[:, 0:1].astype(features.dtype) * vx + x_off)
        fc_y = features[..., 1] - (coords[:, 1:2].astype(features.dtype) * vy + y_off)
        # normalize xyz to [0, 1] (radar_encoder.py:162-166) — the fused
        # form of the CUDA feature_decorator
        norm_xyz = jnp.stack([
            (features[..., 0] - pcr[0]) / (pcr[3] - pcr[0]),
            (features[..., 1] - pcr[1]) / (pcr[4] - pcr[1]),
            (features[..., 2] - pcr[2]) / (pcr[5] - pcr[2]),
        ], axis=-1)
        feats = jnp.concatenate(
            [norm_xyz, features[..., 3:], jnp.stack([fc_x, fc_y], -1)], axis=-1
        )
        pm = jax.lax.broadcasted_iota(jnp.int32, (M, P), 1) < num_points[:, None]
        feats = jnp.where(pm[..., None], feats, 0.0)
        feats = jnp.nan_to_num(feats)

        chans = list(self.feat_channels)
        for i, c in enumerate(chans):
            feats = RFNLayer(c, last_layer=(i == len(chans) - 1),
                             norm_cfg=self.norm_cfg, dtype=self.dtype,
                             name=f"rfn{i}")(feats, pm, training)
        return feats[:, 0, :]


@BACKBONES.register()
class RadarEncoder(nn.Module):
    pts_voxel_encoder: Dict[str, Any]
    pts_middle_encoder: Dict[str, Any]
    pts_transformer_encoder: Optional[Dict[str, Any]] = None
    pts_bev_encoder: Optional[Dict[str, Any]] = None
    post_scatter: Optional[Dict[str, Any]] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, voxel_table, coords, mask, num_points, training: bool = False):
        rfn = BACKBONES.build(self.pts_voxel_encoder, dtype=self.dtype)
        scatter = BACKBONES.build(self.pts_middle_encoder, dtype=self.dtype)
        bev_enc = (BACKBONES.build(self.pts_bev_encoder, dtype=self.dtype)
                   if self.pts_bev_encoder else None)
        B = voxel_table.shape[0]
        outs = []
        for b in range(B):
            feats = rfn(voxel_table[b], num_points[b], coords[b], training)
            outs.append(scatter(feats, coords[b], mask[b]))
        x = jnp.stack(outs)
        if bev_enc is not None:
            x = bev_enc(x, training=training)
            if isinstance(x, (list, tuple)):
                x = x[0]
        return x

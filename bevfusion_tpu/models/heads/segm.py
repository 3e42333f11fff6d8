"""BEV map segmentation head (NHWC flax).

Reference semantics: mmdet3d/models/heads/segm/vanilla.py:47-138 —
BEVGridTransform re-grids BEV features from the detection grid scope to
the map scope via bilinear grid-sampling, then a 3-conv classifier with
per-class sigmoid focal / xent loss.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...registry import HEADS
from ..layers import Conv, ConvBNAct, resize_bilinear

Dtype = Any


def sigmoid_xent_loss(logits, targets):
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    loss = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    return loss.mean()


def sigmoid_focal_loss(logits, targets, alpha: float = -1.0, gamma: float = 2.0):
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    p = jax.nn.sigmoid(logits)
    ce = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * (1 - p_t) ** gamma
    if alpha >= 0:
        alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
        loss = alpha_t * loss
    return loss.mean()


def grid_sample_nhwc(x, gx, gy, align_corners: bool = False):
    """Bilinear sample of NHWC x at normalized grid coords (zero padding).

    gx indexes the W axis, gy the H axis, both in [-1, 1] (torch
    F.grid_sample convention, align_corners=False half-pixel mapping).
    gx/gy: [Ho, Wo], shared across batch.
    """
    H, W = x.shape[-3], x.shape[-2]
    if align_corners:
        fx = (gx + 1) * (W - 1) / 2
        fy = (gy + 1) * (H - 1) / 2
    else:
        fx = ((gx + 1) * W - 1) / 2
        fy = ((gy + 1) * H - 1) / 2
    x0 = jnp.floor(fx).astype(jnp.int32)
    y0 = jnp.floor(fy).astype(jnp.int32)
    x1, y1 = x0 + 1, y0 + 1
    wx = fx - x0
    wy = fy - y0

    def sample(yi, xi):
        valid = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        yc = jnp.clip(yi, 0, H - 1)
        xc = jnp.clip(xi, 0, W - 1)
        v = x[..., yc, xc, :]  # [..., Ho, Wo, C]
        return jnp.where(valid[..., None], v, 0.0)

    v00 = sample(y0, x0)
    v01 = sample(y0, x1)
    v10 = sample(y1, x0)
    v11 = sample(y1, x1)
    wx = wx[..., None]
    wy = wy[..., None]
    return (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )


class BEVGridTransform(nn.Module):
    """Re-grid [B, X, Y, C] BEV features between metric scopes
    (segm/vanilla.py:47-87)."""

    input_scope: Sequence[Tuple[float, float, float]]
    output_scope: Sequence[Tuple[float, float, float]]
    prescale_factor: float = 1.0

    @nn.compact
    def __call__(self, x):
        if self.prescale_factor != 1:
            H = int(x.shape[-3] * self.prescale_factor)
            W = int(x.shape[-2] * self.prescale_factor)
            x = resize_bilinear(x, (H, W), align_corners=False)
        coords = []
        for (imin, imax, _), (omin, omax, ostep) in zip(
            self.input_scope, self.output_scope
        ):
            v = np.arange(omin + ostep / 2, omax, ostep, dtype=np.float32)
            coords.append((v - imin) / (imax - imin) * 2 - 1)
        u, v = np.meshgrid(coords[0], coords[1], indexing="ij")
        # x layout [B, X, Y, C]: u indexes dim X (height axis), v dim Y
        return grid_sample_nhwc(
            x, jnp.asarray(v), jnp.asarray(u), align_corners=False
        )


@HEADS.register()
class BEVSegmentationHead(nn.Module):
    in_channels: int
    grid_transform: Dict[str, Any]
    classes: Sequence[str]
    loss: str = "focal"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, target: Optional[jnp.ndarray] = None, training: bool = False):
        if isinstance(x, (list, tuple)):
            x = x[0]
        x = BEVGridTransform(**self.grid_transform, name="transform")(x)
        x = ConvBNAct(self.in_channels, 3, 1, 1, use_bias=False, norm="BN",
                      act="ReLU", dtype=self.dtype, name="cls0")(x, training)
        x = ConvBNAct(self.in_channels, 3, 1, 1, use_bias=False, norm="BN",
                      act="ReLU", dtype=self.dtype, name="cls1")(x, training)
        x = Conv(len(self.classes), 1, 1, 0, use_bias=True,
                 dtype=self.dtype, name="cls2")(x)
        # x: [B, X, Y, num_classes]
        if training:
            assert target is not None
            # target comes in as [B, num_classes, X, Y] (reference layout)
            losses = {}
            for index, name in enumerate(self.classes):
                logit = x[..., index]
                tgt = target[:, index]
                if self.loss == "xent":
                    losses[f"{name}/{self.loss}"] = sigmoid_xent_loss(logit, tgt)
                elif self.loss == "focal":
                    losses[f"{name}/{self.loss}"] = sigmoid_focal_loss(logit, tgt)
                else:
                    raise ValueError(f"unsupported loss: {self.loss}")
            return losses
        return jax.nn.sigmoid(x.astype(jnp.float32))

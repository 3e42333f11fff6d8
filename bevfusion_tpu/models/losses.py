"""Detection losses (jittable, avg_factor-style reductions).

Behavioral reference: the mmdet losses the reference configures —
FocalLoss (sigmoid, gamma 2, alpha 0.25), GaussianFocalLoss, L1Loss —
with mmcv's weight/avg_factor reduction contract.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..registry import LOSSES

__all__ = ["sigmoid_focal_loss", "gaussian_focal_loss", "l1_loss"]


def clip_sigmoid(x, eps: float = 1e-4):
    """Sigmoid clamped away from {0, 1} (transfusion.py:31-33).

    Computed in f32: in bf16 the upper bound 1 - 1e-4 rounds to exactly
    1.0, which defeats the clamp and lets a downstream log(1 - pred)
    reach -inf."""
    return jnp.clip(jax.nn.sigmoid(x.astype(jnp.float32)), eps, 1 - eps)


def sigmoid_focal_loss(logits, labels, weight=None, avg_factor=None,
                       gamma: float = 2.0, alpha: float = 0.25,
                       num_classes: Optional[int] = None):
    """mmdet sigmoid FocalLoss. logits [N, C]; labels [N] int (label ==
    C means background). Returns scalar (sum / avg_factor)."""
    C = logits.shape[-1]
    logits = logits.astype(jnp.float32)
    onehot = jax.nn.one_hot(labels, C, dtype=jnp.float32)
    p = jax.nn.sigmoid(logits)
    ce = jnp.maximum(logits, 0) - logits * onehot + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    pt = p * onehot + (1 - p) * (1 - onehot)
    alpha_t = alpha * onehot + (1 - alpha) * (1 - onehot)
    loss = alpha_t * (1 - pt) ** gamma * ce
    if weight is not None:
        loss = loss * weight[..., None].astype(jnp.float32)
    total = jnp.sum(loss)
    if avg_factor is not None:
        return total / jnp.maximum(avg_factor, 1.0)
    return total / jnp.maximum(loss.size, 1)


def gaussian_focal_loss(pred, gaussian_target, weight=None, avg_factor=None,
                        alpha: float = 2.0, gamma: float = 4.0, eps: float = 1e-12):
    """mmdet GaussianFocalLoss on probabilities (CornerNet focal):
    positives where target == 1, negatives weighted by (1-t)^gamma."""
    pred = pred.astype(jnp.float32)
    t = gaussian_target.astype(jnp.float32)
    pos_w = (t == 1.0).astype(jnp.float32)
    neg_w = (1 - t) ** gamma
    # guard the logs with max(., eps) rather than adding eps: XLA's
    # algebraic simplifier reassociates (1 - pred) + eps to
    # (1 + eps) - pred under jit, which absorbs the eps and yields
    # log(0) = -inf when pred saturates to exactly 1.0
    pos = -jnp.log(jnp.maximum(pred, eps)) * (1 - pred) ** alpha * pos_w
    neg = -jnp.log(jnp.maximum(1 - pred, eps)) * pred**alpha * neg_w
    loss = pos + neg
    if weight is not None:
        loss = loss * weight.astype(jnp.float32)
    total = jnp.sum(loss)
    if avg_factor is not None:
        return total / jnp.maximum(avg_factor, 1.0)
    return total / jnp.maximum(loss.size, 1)


def l1_loss(pred, target, weight=None, avg_factor=None):
    loss = jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32))
    if weight is not None:
        loss = loss * weight.astype(jnp.float32)
    total = jnp.sum(loss)
    if avg_factor is not None:
        return total / jnp.maximum(avg_factor, 1.0)
    return total / jnp.maximum(loss.size, 1)


# registry entries so YAML loss configs resolve
LOSSES.register("FocalLoss")(lambda **kw: kw)
LOSSES.register("GaussianFocalLoss")(lambda **kw: kw)
LOSSES.register("L1Loss")(lambda **kw: kw)

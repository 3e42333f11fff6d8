"""Deformable 2D convolution (DCN v1/v2) for TPU.

Behavioral reference: mmcv's DeformConv2dPack / ModulatedDeformConv2dPack
as used by DCNSeparateHead (mmdet3d/models/heads/bbox/centerpoint.py:
130-246, dcn_config type='DCN'): a regular `conv_offset` conv predicts
per-position per-tap offsets (and, for the modulated variant, a sigmoid
mask), the input is bilinearly sampled at the deformed tap locations,
and the samples contract with the weight exactly like an im2col conv.

TPU-first design: no CUDA im2col — the bilinear sample is 4 flat
`jnp.take` row-gathers per kernel tap over the whole [B*H*W] position
set (static shapes, gathers batched per tap), and the contraction is
ONE MXU matmul [B*H*W, K*Cin] @ [K*Cin, Cout]. NHWC layout throughout.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["deform_conv2d", "DeformConv2dPack"]


def _bilinear_gather(img_flat, H, W, py, px):
    """img_flat [B, H*W, C]; py/px [B, N] float sample coords (y, x).
    Returns [B, N, C] bilinear samples; out-of-bounds contribute 0
    (mmcv border behavior: taps fully outside sample zero)."""
    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    wy = py - y0
    wx = px - x0

    def corner(yc, xc, w):
        ok = (yc >= 0) & (yc < H) & (xc >= 0) & (xc < W)
        yi = jnp.clip(yc.astype(jnp.int32), 0, H - 1)
        xi = jnp.clip(xc.astype(jnp.int32), 0, W - 1)
        idx = yi * W + xi
        g = jax.vmap(lambda im, ix: jnp.take(im, ix, axis=0))(img_flat, idx)
        return g * (w * ok)[..., None]

    return (
        corner(y0, x0, (1 - wy) * (1 - wx))
        + corner(y0, x0 + 1, (1 - wy) * wx)
        + corner(y0 + 1, x0, wy * (1 - wx))
        + corner(y0 + 1, x0 + 1, wy * wx)
    )


def deform_conv2d(x, offset, weight, mask=None, stride: int = 1,
                  padding: int = 1):
    """x [B, H, W, Cin] NHWC; offset [B, Ho, Wo, 2*K] (per-tap (dy, dx),
    mmcv channel order: offset[..., 2k] = dy_k, offset[..., 2k+1] = dx_k,
    taps enumerated row-major over the kernel); weight [K, Cin, Cout];
    mask [B, Ho, Wo, K] (modulated/DCNv2 sigmoid weights) or None.
    Returns [B, Ho, Wo, Cout]."""
    B, H, W, Cin = x.shape
    K = weight.shape[0]
    k = int(round(np.sqrt(K)))
    assert k * k == K, "square kernels only"
    Ho = (H + 2 * padding - k) // stride + 1
    Wo = (W + 2 * padding - k) // stride + 1
    assert offset.shape[:3] == (B, Ho, Wo) and offset.shape[3] == 2 * K

    img = x.reshape(B, H * W, Cin)
    oy, ox = jnp.meshgrid(jnp.arange(Ho, dtype=x.dtype),
                          jnp.arange(Wo, dtype=x.dtype), indexing="ij")
    base_y = (oy * stride - padding).reshape(-1)  # [N]
    base_x = (ox * stride - padding).reshape(-1)
    off = offset.reshape(B, Ho * Wo, 2 * K)

    cols = []
    for kk in range(K):
        dy, dx = kk // k, kk % k
        py = base_y[None, :] + dy + off[..., 2 * kk]
        px = base_x[None, :] + dx + off[..., 2 * kk + 1]
        g = _bilinear_gather(img, H, W, py, px)  # [B, N, Cin]
        if mask is not None:
            g = g * mask.reshape(B, Ho * Wo, K)[..., kk][..., None]
        cols.append(g)
    col = jnp.concatenate(cols, axis=-1)  # [B, N, K*Cin]
    out = jnp.einsum("bnc,co->bno", col,
                     weight.reshape(K * Cin, -1).astype(col.dtype),
                     preferred_element_type=jnp.float32)
    return out.astype(x.dtype).reshape(B, Ho, Wo, -1)


class DeformConv2dPack(nn.Module):
    """mmcv DeformConv2dPack (DCNv1, dcn_config type='DCN' in
    DCNSeparateHead, mmdet3d/models/heads/bbox/centerpoint.py:130-246):
    a regular zero-initialized `conv_offset` conv predicts the per-tap
    (dy, dx) offsets; the deform conv itself carries no bias and no
    modulation mask. NHWC in/out."""

    out_channels: int
    kernel_size: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = int(self.kernel_size)
        K = k * k
        cin = x.shape[-1]
        off = nn.Conv(2 * K, (k, k), padding=((k // 2,) * 2,) * 2,
                      kernel_init=nn.initializers.zeros,
                      bias_init=nn.initializers.zeros,
                      dtype=self.dtype, name="conv_offset")(x)
        w = self.param(
            "weight",
            nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
            (K, cin, self.out_channels))
        return deform_conv2d(x, off.astype(x.dtype), w.astype(x.dtype),
                             mask=None, stride=1, padding=k // 2)

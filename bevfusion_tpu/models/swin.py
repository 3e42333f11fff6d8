"""Swin Transformer backbone (NHWC flax), TPU-first implementation.

Behavioral reference: the mmdet SwinTransformer the reference configures
in configs/nuscenes/det/.../swint/default.yaml:7-25 (Swin-T: embed 96,
depths [2,2,6,2], heads [3,6,12,24], window 7, out_indices [1,2,3],
patch_norm, drop_path 0.2). Implemented from the Swin paper semantics:
window attention with relative position bias, shifted windows with the
standard cyclic-shift attention mask, patch merging between stages, and
a LayerNorm on every emitted scale.

TPU notes: window partition is pure reshape/transpose; all attention is
batched matmuls over [B * num_windows, window², C]; shapes are static so
the pad-to-multiple-of-window sizes are computed at trace time.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..registry import BACKBONES

Dtype = Any


def window_partition(x, ws: int):
    """[B, H, W, C] -> [B * nH * nW, ws, ws, C] (H, W divisible by ws)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, C)


def window_reverse(windows, ws: int, H: int, W: int):
    B = windows.shape[0] // ((H // ws) * (W // ws))
    x = windows.reshape(B, H // ws, W // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, -1)


def _relative_position_index(ws: int) -> np.ndarray:
    coords = np.stack(
        np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij")
    )  # [2, ws, ws]
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # [2, n, n]
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


def _shift_attn_mask(H: int, W: int, ws: int, shift: int) -> np.ndarray:
    """Standard SW-MSA mask: -100 where tokens come from different
    pre-shift regions. Returns [num_windows, ws*ws, ws*ws]."""
    img = np.zeros((1, H, W, 1), np.float32)
    cnt = 0
    for h in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for w in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[:, h, w, :] = cnt
            cnt += 1
    wins = img.reshape(1, H // ws, ws, W // ws, ws, 1)
    wins = wins.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws)
    mask = wins[:, None, :] - wins[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


class DropPath(nn.Module):
    rate: float = 0.0

    @nn.compact
    def __call__(self, x, training: bool = False):
        if not training or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None, training: bool = False):
        Bn, N, C = x.shape
        ws = self.window_size
        head_dim = self.dim // self.num_heads
        scale = self.qk_scale or head_dim**-0.5

        qkv = nn.Dense(self.dim * 3, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(Bn, N, 3, self.num_heads, head_dim).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]  # [Bn, nH, N, hd]

        attn = jnp.einsum(
            "bhnd,bhmd->bhnm", q * scale, k, preferred_element_type=jnp.float32
        )

        rpb_table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * ws - 1) ** 2, self.num_heads),
        )
        rpi = _relative_position_index(ws).reshape(-1)
        bias = rpb_table[rpi].reshape(N, N, self.num_heads).transpose(2, 0, 1)
        attn = attn + bias[None].astype(attn.dtype)

        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(Bn // nW, nW, self.num_heads, N, N)
            attn = attn + mask[None, :, None].astype(attn.dtype)
            attn = attn.reshape(Bn, self.num_heads, N, N)

        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        if self.attn_drop > 0:
            attn = nn.Dropout(self.attn_drop, deterministic=not training)(attn)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v).transpose(0, 2, 1, 3)
        out = out.reshape(Bn, N, self.dim)
        out = nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)
        if self.proj_drop > 0:
            out = nn.Dropout(self.proj_drop, deterministic=not training)(out)
        return out


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    shift: int = 0
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, H: int, W: int, training: bool = False):
        B, L, C = x.shape
        ws = self.window_size
        shortcut = x
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = x.reshape(B, H, W, C)

        pad_b = (ws - H % ws) % ws
        pad_r = (ws - W % ws) % ws
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        Hp, Wp = H + pad_b, W + pad_r

        shift = self.shift
        if shift > 0:
            x = jnp.roll(x, shift=(-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(_shift_attn_mask(Hp, Wp, ws, shift))
        else:
            mask = None

        wins = window_partition(x, ws).reshape(-1, ws * ws, C)
        wins = WindowAttention(
            self.dim, self.num_heads, ws, self.qkv_bias, self.qk_scale,
            self.attn_drop, self.drop, dtype=self.dtype, name="attn",
        )(wins, mask, training)
        x = window_reverse(wins.reshape(-1, ws, ws, C), ws, Hp, Wp)

        if shift > 0:
            x = jnp.roll(x, shift=(shift, shift), axis=(1, 2))
        if pad_b or pad_r:
            x = x[:, :H, :W]
        x = x.reshape(B, L, C)
        x = shortcut + DropPath(self.drop_path, name="drop_path1")(x, training)

        y = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        if self.drop > 0:
            y = nn.Dropout(self.drop, deterministic=not training)(y)
        y = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(y)
        if self.drop > 0:
            y = nn.Dropout(self.drop, deterministic=not training)(y)
        return x + DropPath(self.drop_path, name="drop_path2")(y, training)


class PatchMerging(nn.Module):
    """2x2 neighbor concat -> LN -> Linear(4C -> 2C)."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, H: int, W: int):
        B, L, C = x.shape
        x = x.reshape(B, H, W, C)
        if H % 2 or W % 2:
            x = jnp.pad(x, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        Ho, Wo = x.shape[1], x.shape[2]
        x = x.reshape(B, Ho * Wo, 4 * C)
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        x = nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype, name="reduction")(x)
        return x, Ho, Wo


@BACKBONES.register()
class SwinTransformer(nn.Module):
    embed_dims: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.2
    patch_size: int = 4
    patch_norm: bool = True
    out_indices: Sequence[int] = (1, 2, 3)
    with_cp: bool = False
    convert_weights: bool = True  # accepted for config parity; unused
    init_cfg: Optional[dict] = None  # pretrained ckpt handled by converter
    pretrain_img_size: int = 224
    use_abs_pos_embed: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        """x: [B, H, W, 3] -> tuple of NHWC maps at out_indices scales."""
        ps = self.patch_size
        B, H, W, _ = x.shape
        x = nn.Conv(
            self.embed_dims, (ps, ps), strides=(ps, ps), padding="VALID",
            dtype=self.dtype, name="patch_embed",
        )(x)
        Hc, Wc = x.shape[1], x.shape[2]
        x = x.reshape(B, Hc * Wc, self.embed_dims)
        if self.patch_norm:
            x = nn.LayerNorm(dtype=self.dtype, name="patch_norm")(x)
        if self.drop_rate > 0:
            x = nn.Dropout(self.drop_rate, deterministic=not training)(x)

        total_depth = sum(self.depths)
        dpr = np.linspace(0, self.drop_path_rate, total_depth)

        outs = []
        dim = self.embed_dims
        block_idx = 0
        for si, depth in enumerate(self.depths):
            for bi in range(depth):
                x = SwinBlock(
                    dim,
                    self.num_heads[si],
                    window_size=self.window_size,
                    shift=0 if bi % 2 == 0 else self.window_size // 2,
                    mlp_ratio=self.mlp_ratio,
                    qkv_bias=self.qkv_bias,
                    qk_scale=self.qk_scale,
                    drop=self.drop_rate,
                    attn_drop=self.attn_drop_rate,
                    drop_path=float(dpr[block_idx]),
                    dtype=self.dtype,
                    name=f"stage{si}_block{bi}",
                )(x, Hc, Wc, training)
                block_idx += 1
            if si in self.out_indices:
                y = nn.LayerNorm(dtype=self.dtype, name=f"out_norm{si}")(x)
                outs.append(y.reshape(B, Hc, Wc, dim))
            if si < len(self.depths) - 1:
                x, Hc, Wc = PatchMerging(dim, dtype=self.dtype, name=f"merge{si}")(x, Hc, Wc)
                dim *= 2
        return tuple(outs)

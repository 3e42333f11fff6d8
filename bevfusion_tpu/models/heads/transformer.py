"""Transformer pieces for TransFusionHead (flax).

Behavioral reference: mmdet3d/models/utils/transformer.py —
PositionEmbeddingLearned (:14-30), TransformerDecoderLayer (:33-112,
post-norm, pos embeddings added to q/k at every attention), and the
conv FFN prediction head (:496-575). The vendored MultiheadAttention is
standard torch MHA; here attention is explicit batched einsum.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..layers import Norm

Dtype = Any


class PositionEmbeddingLearned(nn.Module):
    """MLP (1x1 conv) position encoder over [B, P, in_ch] -> [B, P, C]."""

    num_pos_feats: int = 128
    bn_momentum: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xyz, training: bool = False):
        x = nn.Dense(self.num_pos_feats, dtype=self.dtype, name="fc0")(xyz)
        x = Norm("BN", 1e-5, self.bn_momentum, dtype=self.dtype, name="bn0")(x, training)
        x = nn.relu(x)
        return nn.Dense(self.num_pos_feats, dtype=self.dtype, name="fc1")(x)


class MultiheadAttention(nn.Module):
    """Standard MHA over [B, L, C] (torch nn.MultiheadAttention semantics)."""

    d_model: int
    num_heads: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, training: bool = False):
        H = self.num_heads
        hd = self.d_model // H
        B, Lq, _ = q.shape
        Lk = k.shape[1]
        qp = nn.Dense(self.d_model, dtype=self.dtype, name="q_proj")(q)
        kp = nn.Dense(self.d_model, dtype=self.dtype, name="k_proj")(k)
        vp = nn.Dense(self.d_model, dtype=self.dtype, name="v_proj")(v)
        qh = qp.reshape(B, Lq, H, hd).transpose(0, 2, 1, 3)
        kh = kp.reshape(B, Lk, H, hd).transpose(0, 2, 1, 3)
        vh = vp.reshape(B, Lk, H, hd).transpose(0, 2, 1, 3)
        attn = jnp.einsum("bhqd,bhkd->bhqk", qh * (hd**-0.5), kh,
                          preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        if self.dropout > 0:
            attn = nn.Dropout(self.dropout, deterministic=not training)(attn)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh)
        out = out.transpose(0, 2, 1, 3).reshape(B, Lq, self.d_model)
        return nn.Dense(self.d_model, dtype=self.dtype, name="out_proj")(out)


class TransformerDecoderLayer(nn.Module):
    """Post-norm decoder layer: self-attn (+pos), cross-attn (+pos), FFN.

    Operates on [B, P, C] queries and [B, K, C] keys (the reference works
    in [P, B, C]; same math)."""

    d_model: int
    num_heads: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    activation: str = "relu"
    cross_only: bool = False
    bn_momentum: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, query, key, query_pos, key_pos, training: bool = False):
        act = {"relu": nn.relu, "gelu": nn.gelu}[self.activation]
        qe = PositionEmbeddingLearned(
            self.d_model, self.bn_momentum, dtype=self.dtype, name="self_posembed"
        )(query_pos, training)
        ke = PositionEmbeddingLearned(
            self.d_model, self.bn_momentum, dtype=self.dtype, name="cross_posembed"
        )(key_pos, training)

        drop = lambda x: (
            nn.Dropout(self.dropout, deterministic=not training)(x)
            if self.dropout > 0 else x
        )

        if not self.cross_only:
            q = query + qe
            y = MultiheadAttention(self.d_model, self.num_heads, self.dropout,
                                   dtype=self.dtype, name="self_attn")(q, q, q, training)
            query = query + drop(y)
            query = nn.LayerNorm(dtype=self.dtype, name="norm1")(query)

        y = MultiheadAttention(self.d_model, self.num_heads, self.dropout,
                               dtype=self.dtype, name="cross_attn")(
            query + qe, key + ke, key + ke, training)
        query = query + drop(y)
        query = nn.LayerNorm(dtype=self.dtype, name="norm2")(query)

        y = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(query)
        y = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(drop(act(y)))
        query = query + drop(y)
        query = nn.LayerNorm(dtype=self.dtype, name="norm3")(query)
        return query


class FFNHead(nn.Module):
    """Per-branch prediction convs over queries [B, P, C] (transformer.py:496-575):
    (num_conv - 1) x [Dense + BN + ReLU] + final Dense with bias."""

    heads: Dict[str, Tuple[int, int]]  # name -> (out_ch, num_conv)
    head_conv: int = 64
    init_bias: float = -2.19
    bn_momentum: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        out = {}
        for name, (classes, num_conv) in self.heads.items():
            y = x
            for i in range(num_conv - 1):
                y = nn.Dense(self.head_conv, dtype=self.dtype, name=f"{name}_fc{i}")(y)
                y = Norm("BN", 1e-5, self.bn_momentum, dtype=self.dtype,
                         name=f"{name}_bn{i}")(y, training)
                y = nn.relu(y)
            bias_init = (
                nn.initializers.constant(self.init_bias)
                if name == "heatmap" else nn.initializers.zeros
            )
            y = nn.Dense(classes, dtype=self.dtype, bias_init=bias_init,
                         name=f"{name}_out")(y)
            out[name] = y  # [B, P, classes]
        return out

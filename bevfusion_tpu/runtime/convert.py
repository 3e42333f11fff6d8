"""Torch checkpoint -> flax parameter conversion.

Behavioral reference: the released reference checkpoints
(tools/download_pretrained.sh) whose module tree is
encoders.{camera,lidar}.*, fuser, decoder.*, heads.* — staged training
initializes fusion models from lidar-only .pth files and Swin from
nuImages-pretrained weights (reference README:186, apis/train.py:122-125).

Layout rules (validated against torch primitives in
tests/test_convert.py):
  Conv2d          [O, I, kh, kw]   -> HWIO [kh, kw, I, O]
  ConvTranspose2d [I, O, kh, kw]   -> flax ConvTranspose HWIO (flipped)
  Linear          [O, I]           -> [I, O]
  BatchNorm       weight/bias/running_{mean,var} -> scale/bias/mean/var
  LayerNorm       weight/bias      -> scale/bias
  spconv weight   [kx, ky, kz, I, O] -> [K, I, O] (x-major z-minor)
  torch MHA       in_proj (packed qkv) -> q/k/v projections
"""
from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import numpy as np

__all__ = ["conv2d_to_flax", "deconv2d_to_flax", "linear_to_flax",
           "bn_to_flax", "mha_to_flax", "spconv_to_flax"]


def conv2d_to_flax(weight, bias=None) -> Dict[str, np.ndarray]:
    out = {"kernel": np.asarray(weight).transpose(2, 3, 1, 0)}
    if bias is not None:
        out["bias"] = np.asarray(bias)
    return out


def deconv2d_to_flax(weight, bias=None) -> Dict[str, np.ndarray]:
    """torch ConvTranspose2d weight [I, O, kh, kw]. flax ConvTranspose
    computes a fractionally-strided conv with an HWIO kernel; torch's
    deconv corresponds to the *flipped* kernel."""
    w = np.asarray(weight).transpose(2, 3, 0, 1)  # [kh, kw, I, O]
    w = w[::-1, ::-1]
    out = {"kernel": np.ascontiguousarray(w)}
    if bias is not None:
        out["bias"] = np.asarray(bias)
    return out


def linear_to_flax(weight, bias=None) -> Dict[str, np.ndarray]:
    out = {"kernel": np.asarray(weight).T}
    if bias is not None:
        out["bias"] = np.asarray(bias)
    return out


def bn_to_flax(weight, bias, running_mean, running_var):
    return (
        {"scale": np.asarray(weight), "bias": np.asarray(bias)},
        {"mean": np.asarray(running_mean), "var": np.asarray(running_var)},
    )


def mha_to_flax(in_proj_weight, in_proj_bias, out_proj_weight, out_proj_bias):
    """torch nn.MultiheadAttention packed qkv -> our q/k/v/out Dense."""
    E = in_proj_weight.shape[1]
    wq, wk, wv = (np.asarray(in_proj_weight[i * E:(i + 1) * E]) for i in range(3))
    bq, bk, bv = (np.asarray(in_proj_bias[i * E:(i + 1) * E]) for i in range(3))
    return {
        "q_proj": {"kernel": wq.T, "bias": bq},
        "k_proj": {"kernel": wk.T, "bias": bk},
        "v_proj": {"kernel": wv.T, "bias": bv},
        "out_proj": {"kernel": np.asarray(out_proj_weight).T,
                     "bias": np.asarray(out_proj_bias)},
    }


def spconv_to_flax(weight) -> np.ndarray:
    """spconv SparseConv3d weight [kx, ky, kz, I, O] (or torch layout
    [O, I, kx, ky, kz]) -> [K, I, O] in kernel_offsets order."""
    w = np.asarray(weight)
    if w.ndim == 5 and w.shape[0] < w.shape[3]:  # [kx,ky,kz,I,O]
        pass
    elif w.ndim == 5:  # [O, I, kx, ky, kz]
        w = w.transpose(2, 3, 4, 1, 0)
    return w.reshape(-1, w.shape[-2], w.shape[-1])


def swin_qkv_to_flax(qkv_weight, qkv_bias):
    """Swin packed qkv Linear [3E, E] -> our single 'qkv' Dense [E, 3E]."""
    return {"kernel": np.asarray(qkv_weight).T, "bias": np.asarray(qkv_bias)}

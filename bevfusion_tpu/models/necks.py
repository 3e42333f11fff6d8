"""FPN necks: GeneralizedLSSFPN (image) and LSSFPN (BEV). NHWC flax.

Reference semantics: mmdet3d/models/necks/generalized_lss.py:13-103 and
mmdet3d/models/necks/lss.py:13-65.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..registry import NECKS
from .layers import ConvBNAct, Norm, Conv, resize_bilinear

Dtype = Any


@NECKS.register()
class GeneralizedLSSFPN(nn.Module):
    """Top-down FPN: upsample level i+1, concat with level i, 1x1 + 3x3.

    Matches generalized_lss.py:80-103: the deepest lateral consumes the
    raw top level; shallower laterals consume already-fused outputs.
    Returns (num_ins - 1) maps.
    """

    in_channels: Sequence[int]
    out_channels: int
    num_outs: int
    start_level: int = 0
    end_level: int = -1
    no_norm_on_lateral: bool = False
    conv_cfg: Optional[dict] = None
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    upsample_cfg: Optional[dict] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs, training: bool = False):
        assert len(inputs) == len(self.in_channels)
        align = bool((self.upsample_cfg or {}).get("align_corners", True))
        laterals = [inputs[i + self.start_level] for i in range(len(inputs))]
        used = len(laterals) - 1
        for i in range(used - 1, -1, -1):
            up = resize_bilinear(
                laterals[i + 1], laterals[i].shape[-3:-1], align_corners=align
            )
            x = jnp.concatenate([laterals[i], up], axis=-1)
            x = ConvBNAct(
                self.out_channels, 1, 1, 0,
                norm=None if self.no_norm_on_lateral else "BN",
                act="ReLU", dtype=self.dtype, name=f"lateral{i}",
            )(x, training)
            x = ConvBNAct(
                self.out_channels, 3, 1, 1, norm="BN", act="ReLU",
                dtype=self.dtype, name=f"fpn{i}",
            )(x, training)
            laterals[i] = x
        return tuple(laterals[:used])


@NECKS.register()
class DetectronFPN(nn.Module):
    """Detectron2-style FPN (reference necks/detectron_fpn.py:18-137):
    1x1 laterals + nearest-neighbor top-down sum (or avg) + 3x3 output
    convs; out_indices select the emitted pyramid levels."""

    in_indices: Sequence[int]
    out_indices: Sequence[int]
    in_channels: Sequence[int]
    out_channels: int
    start_level: int = 0
    fuse_type: str = "sum"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs, training: bool = False):
        n = len(self.in_channels)
        feats = [inputs[i] for i in self.in_indices]
        # top-down, lowest resolution first
        prev = ConvBNAct(self.out_channels, 1, 1, 0, use_bias=False,
                         norm="BN", act=None, dtype=self.dtype,
                         name=f"lateral{n - 1}")(feats[-1], training)
        results = [ConvBNAct(self.out_channels, 3, 1, 1, use_bias=False,
                             norm="BN", act=None, dtype=self.dtype,
                             name=f"output{n - 1}")(prev, training)]
        for k in range(n - 2, -1, -1):
            H, W = feats[k].shape[-3], feats[k].shape[-2]
            up = jax.image.resize(
                prev, prev.shape[:-3] + (H, W, prev.shape[-1]), method="nearest"
            )
            lat = ConvBNAct(self.out_channels, 1, 1, 0, use_bias=False,
                            norm="BN", act=None, dtype=self.dtype,
                            name=f"lateral{k}")(feats[k], training)
            prev = lat + up
            if self.fuse_type == "avg":
                prev = prev / 2
            results.insert(0, ConvBNAct(self.out_channels, 3, 1, 1,
                                        use_bias=False, norm="BN", act=None,
                                        dtype=self.dtype,
                                        name=f"output{k}")(prev, training))
        return [results[i] for i in sorted(self.out_indices)]


@NECKS.register()
class LSSFPN(nn.Module):
    """BEV neck: upsample deep map to shallow size, concat, fuse, upsample.

    Matches necks/lss.py:13-65 (align_corners=True everywhere).
    """

    in_indices: Tuple[int, int]
    in_channels: Tuple[int, int]
    out_channels: int
    scale_factor: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, training: bool = False):
        x1 = xs[self.in_indices[0]]
        x2 = xs[self.in_indices[1]]
        assert x1.shape[-1] == self.in_channels[0], (x1.shape, self.in_channels)
        x1 = resize_bilinear(x1, x2.shape[-3:-1], align_corners=True)
        x = jnp.concatenate([x1, x2], axis=-1)
        x = ConvBNAct(self.out_channels, 1, 1, 0, norm="BN", act="ReLU",
                      dtype=self.dtype, name="fuse0")(x, training)
        x = ConvBNAct(self.out_channels, 3, 1, 1, norm="BN", act="ReLU",
                      dtype=self.dtype, name="fuse1")(x, training)
        if self.scale_factor > 1:
            H, W = x.shape[-3] * self.scale_factor, x.shape[-2] * self.scale_factor
            x = resize_bilinear(x, (H, W), align_corners=True)
            x = ConvBNAct(self.out_channels, 3, 1, 1, norm="BN", act="ReLU",
                          dtype=self.dtype, name="up_conv")(x, training)
        return x

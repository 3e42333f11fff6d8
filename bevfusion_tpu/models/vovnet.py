"""VoVNet (V2, with eSE) camera backbone (NHWC flax).

Behavioral reference: mmdet3d/models/backbones/vovnet.py — OSA modules
(one-shot aggregation: k 3x3 convs whose outputs concat with the input
into a 1x1 "concat" conv, :185-235), eSE channel attention with
hard-sigmoid (:157-183), stage specs table (:12-89), stem of three 3x3
convs (stride 2, 1, 2), max-pool between stages.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..registry import BACKBONES
from .layers import Conv, ConvBNAct, Norm

Dtype = Any

_STAGE_SPECS = {
    "V-19-slim-eSE": dict(stem=(64, 64, 128), stage_conv_ch=(64, 80, 96, 112),
                          stage_out_ch=(112, 256, 384, 512), layer_per_block=3,
                          block_per_stage=(1, 1, 1, 1), eSE=True, dw=False),
    "V-19-eSE": dict(stem=(64, 64, 128), stage_conv_ch=(128, 160, 192, 224),
                     stage_out_ch=(256, 512, 768, 1024), layer_per_block=3,
                     block_per_stage=(1, 1, 1, 1), eSE=True, dw=False),
    "V-39-eSE": dict(stem=(64, 64, 128), stage_conv_ch=(128, 160, 192, 224),
                     stage_out_ch=(256, 512, 768, 1024), layer_per_block=5,
                     block_per_stage=(1, 1, 2, 2), eSE=True, dw=False),
    "V-57-eSE": dict(stem=(64, 64, 128), stage_conv_ch=(128, 160, 192, 224),
                     stage_out_ch=(256, 512, 768, 1024), layer_per_block=5,
                     block_per_stage=(1, 1, 4, 3), eSE=True, dw=False),
    "V-99-eSE": dict(stem=(64, 64, 128), stage_conv_ch=(128, 160, 192, 224),
                     stage_out_ch=(256, 512, 768, 1024), layer_per_block=5,
                     block_per_stage=(1, 3, 9, 3), eSE=True, dw=False),
}


class eSEModule(nn.Module):
    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = Conv(self.channels, 1, 1, 0, use_bias=True, dtype=self.dtype,
                 name="fc")(g)
        hsig = jnp.clip(g + 3.0, 0.0, 6.0) / 6.0  # Hsigmoid (vovnet.py:157)
        return x * hsig.astype(x.dtype)


class OSAModule(nn.Module):
    stage_ch: int
    concat_ch: int
    layer_per_block: int
    use_ese: bool = True
    identity: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        identity = x
        outs = [x]
        y = x
        for i in range(self.layer_per_block):
            y = ConvBNAct(self.stage_ch, 3, 1, 1, use_bias=False, norm="BN",
                          act="ReLU", dtype=self.dtype, name=f"conv{i}")(y, training)
            outs.append(y)
        y = jnp.concatenate(outs, axis=-1)
        y = ConvBNAct(self.concat_ch, 1, 1, 0, use_bias=False, norm="BN",
                      act="ReLU", dtype=self.dtype, name="concat")(y, training)
        if self.use_ese:
            y = eSEModule(self.concat_ch, dtype=self.dtype, name="ese")(y)
        if self.identity:
            y = y + identity
        return y


@BACKBONES.register()
class VoVNet(nn.Module):
    spec_name: str = "V-99-eSE"
    out_features: Sequence[str] = ("stage2", "stage3", "stage4", "stage5")
    norm_eval: bool = False
    frozen_stages: int = -1
    init_cfg: Optional[dict] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        spec = _STAGE_SPECS[self.spec_name]
        s1, s2, s3 = spec["stem"]
        x = ConvBNAct(s1, 3, 2, 1, use_bias=False, norm="BN", act="ReLU",
                      dtype=self.dtype, name="stem0")(x, training)
        x = ConvBNAct(s2, 3, 1, 1, use_bias=False, norm="BN", act="ReLU",
                      dtype=self.dtype, name="stem1")(x, training)
        x = ConvBNAct(s3, 3, 2, 1, use_bias=False, norm="BN", act="ReLU",
                      dtype=self.dtype, name="stem2")(x, training)

        outs = []
        for stage_idx in range(4):  # stages 2..5
            stage_num = stage_idx + 2
            if stage_num != 2:
                # ceil-mode 3x3/2 max pool == pad right/bottom by 1
                x = nn.max_pool(x, (3, 3), strides=(2, 2),
                                padding=((0, 1), (0, 1)))
            n_blocks = spec["block_per_stage"][stage_idx]
            for b in range(n_blocks):
                x = OSAModule(
                    spec["stage_conv_ch"][stage_idx],
                    spec["stage_out_ch"][stage_idx],
                    spec["layer_per_block"],
                    use_ese=spec["eSE"] and b == n_blocks - 1,
                    identity=b > 0,
                    dtype=self.dtype,
                    name=f"OSA{stage_num}_{b + 1}",
                )(x, training)
            if f"stage{stage_num}" in self.out_features:
                outs.append(x)
        return tuple(outs)

"""SparseEncoder (VoxelNet middle encoder) on the TPU sparse-conv engine.

Behavioral reference: mmdet3d/models/backbones/sparse_encoder.py:11-218 —
SubMConv3d input conv, 4 stages (basicblock: 2 residual subm blocks +
stride-2 SparseConv3d between stages), final (1,1,3)/(1,1,2) conv_out,
then `.dense()` reshaped to an [B, X/8, Y/8, C*D] BEV map.

TPU-first: the fine stages run gather-GEMM sparse convs over sorted-id
site tables (static caps, rulebooks shared per indice_key); from
``dense_from_stage`` on, the grid is small enough that *dense* masked
3D convs on the MXU beat gathers by an order of magnitude (the
reference's own mitigation plan, SURVEY §7 hard-part 1: "dense fallback
is numerically exact and the grids after stage 2 are small"). Masked
dense convs are exactly equivalent to sparse convs:
  subm      = conv3d(x) * active_mask
  sparse/s2 = conv3d(x, stride 2) * maxpool(active_mask)
BatchNorm always takes moments over active sites only and reduces over
the global batch under pjit (NaiveSyncBatchNorm semantics).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import sparse_conv as sp
from ..ops import sparse_conv_windowed as wg
from ..registry import BACKBONES

Dtype = Any


class MaskedBatchNorm(nn.Module):
    """BatchNorm over active elements with a broadcastable mask.

    x: [..., C]; mask: [...] bool (any shape broadcastable to x's batch
    dims). Matches torch BN1d over the packed active-feature matrix;
    padded/inactive rows are excluded from the moments and zeroed.
    """

    eps: float = 1e-3
    momentum: float = 0.01  # torch convention
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, training: bool = False):
        C = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((C,), jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((C,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))

        axes = tuple(range(x.ndim - 1))
        if training:
            m = mask[..., None].astype(jnp.float32)
            cnt = jnp.maximum(jnp.sum(m), 1.0)
            xf = x.astype(jnp.float32) * m
            mean = jnp.sum(xf, axis=axes) / cnt
            var = jnp.sum((x.astype(jnp.float32) - mean) ** 2 * m, axis=axes) / cnt
            if not self.is_initializing():
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * var
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.eps)
        y = y * scale + bias
        y = jnp.where(mask[..., None], y, 0.0)
        return y.astype(self.dtype)


class PackedMaskedBatchNorm(nn.Module):
    """MaskedBatchNorm on the windowed engine's packed [B, capP, 128]
    layout (P = 128/C sites per row). Variable structure/shapes are
    identical to MaskedBatchNorm (scale/bias/moments all [C]) so
    checkpoints transfer between engines. Elementwise math stays on the
    packed layout; only the moment reductions view [..., P, C], which
    XLA fuses into the reduce."""

    C: int
    eps: float = 1e-3
    momentum: float = 0.01
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, packed, site_mask, training: bool = False,
                 fold: bool = False):
        """packed [B, capP, 128]; site_mask [B, cap] bool.

        fold=True (eval only): return the per-channel affine fold
        (inv [C], sh [C]) f32 with y = x*inv + sh — consumed by the
        windowed conv kernel's fused epilogue instead of a separate
        elementwise pass (packed/site_mask are ignored)."""
        C = self.C
        P = wg.pack_factor(C)
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((C,), jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((C,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        if fold:
            inv = jax.lax.rsqrt(ra_var.value + self.eps) * scale
            return inv, bias - ra_mean.value * inv
        B, capP, _ = packed.shape

        m = jnp.repeat(site_mask.reshape(B, capP, P), C, axis=-1)  # [B, capP, 128]
        x4 = packed.reshape(B, capP, P, C).astype(jnp.float32)
        m4 = site_mask.reshape(B, capP, P, 1).astype(jnp.float32)
        if training:
            cnt = jnp.maximum(jnp.sum(m4) , 1.0)
            mean = jnp.sum(x4 * m4, axis=(0, 1, 2)) / cnt
            var = jnp.sum((x4 - mean) ** 2 * m4, axis=(0, 1, 2)) / cnt
            if not self.is_initializing():
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * var
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = jax.lax.rsqrt(var + self.eps) * scale
        inv_t = jnp.tile(inv, P)   # packed lane l = p*C + c -> channel c
        sh_t = jnp.tile(bias - mean * inv, P)
        y = packed.astype(jnp.float32) * inv_t + sh_t
        y = jnp.where(m, y, 0.0)
        return y.astype(self.dtype)


class _WindowedConv(nn.Module):
    """Windowed Pallas gather-GEMM conv (ops/sparse_conv_windowed.py)
    over a per-stage WindowedRulebook. Parameter contract identical to
    _SparseConvNd: one "weight" [K, Cin, Cout] in kernel_offsets order.
    Cin may exceed the producer's channels (zero-padded input lanes,
    e.g. the 5-channel voxel features padded to 16).

    Training runs through windowed_conv_ad (custom VJP: Pallas dW
    accumulation + mirrored/transposed windowed backward-data,
    matching spconv's indiceConvBackward, spconv_ops.h:364+)."""

    in_channels: int  # true producer width (the parameter's Cin)
    out_channels: int
    num_offsets: int = 27
    # packed lane width the kernel sees; > in_channels only for the
    # first conv (5-channel voxel feats ride 16 lanes, zero-padded)
    lane_channels: int = 0
    # offsets per window group (z-minor triples share one window)
    kz: int = 3
    # sites per kernel block; MUST match the rulebook builder's blk.
    # One-hot matmul work per site scales with slack * blk while window
    # coverage stays slack * blk sites — high-slack (strided) convs use
    # a small blk (128) to keep the gather matmuls 4x cheaper.
    blk: int = wg.BLK
    blk_bwd: int = wg.BLK
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, packed, wrbs, cap_out: int, slack: int,
                 training: bool = False, wrbs_bwd=None, slack_bwd: int = 0,
                 cap_in: int = 0, mirror: bool = True,
                 scale=None, shift=None, relu: bool = False, residual=None):
        """packed [B, capP_in, 128]; wrbs = per-sample WindowedRulebook
        (leaves stacked on axis 0). Returns [B, cap_out/P_out, 128].
        Training with mirror=False requires wrbs_bwd (transposed
        rulebook over the output sites with Cout packing).
        scale/shift/relu/residual: eval-only fused epilogue
        (folded BN affine + residual add + ReLU inside the kernel)."""
        lane_c = self.lane_channels or self.in_channels
        w = self.param(
            "weight",
            nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
            (self.num_offsets, self.in_channels, self.out_channels),
        ).astype(jnp.bfloat16)
        if lane_c != self.in_channels:
            # zero-padded input lanes pair with zero weight rows
            w = jnp.pad(w, ((0, 0), (0, lane_c - self.in_channels), (0, 0)))
        B = packed.shape[0]
        outs = []
        for b in range(B):
            wrb = wg.WindowedRulebook(wrbs.s8[b], wrbs.sel[b], wrbs.overflow[b])
            if training:
                if wrbs_bwd is not None:
                    wrb_b = wg.WindowedRulebook(
                        wrbs_bwd.s8[b], wrbs_bwd.sel[b], wrbs_bwd.overflow[b])
                else:
                    wrb_b = wrb
                outs.append(wg.windowed_conv_ad(
                    packed[b], w, wrb, wrb_b, self.out_channels, cap_out,
                    cap_in or cap_out, slack, slack_bwd or slack, mirror,
                    self.kz, self.blk, self.blk_bwd))
            else:
                outs.append(wg.windowed_gather_gemm(
                    packed[b], wrb, w, self.out_channels, cap_out,
                    slack=slack, kz=self.kz, blk=self.blk,
                    scale=scale, shift=shift, relu=relu,
                    residual=None if residual is None else residual[b]))
        return jnp.stack(outs)


class _SparseConvNd(nn.Module):
    """Batched gather-GEMM conv over a shared rulebook [B, cap, K]."""

    in_channels: int
    out_channels: int
    kernel_size: Any = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, rb):
        K = int(np.prod([*_as3(self.kernel_size)]))
        w = self.param(
            "weight",
            nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
            (K, self.in_channels, self.out_channels),
        )
        return jax.vmap(sp.subm_gather_gemm, in_axes=(0, 0, None))(
            feats, rb, w.astype(self.dtype)
        )


class _DenseConv3d(nn.Module):
    """Dense 3D conv as a sum of kz 2D convs with z folded into batch.

    TPU 2D convolutions hit ~74% MXU utilization while native 3D convs
    run at ~3% (measured, PERFORMANCE.md) — so the 3D conv is computed
    as sum over kz of conv2d on [B*Z, X, Y, C] z-shifted slices.
    Layout: x is [B, Z, X, Y, C] (z-major); weights share the sparse
    layout [K, Cin, Cout] (kernel_offsets order = x-major z-minor).
    """

    in_channels: int
    out_channels: int
    kernel_size: Any = 3
    stride: Any = 1
    padding: Any = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kx, ky, kz = _as3(self.kernel_size)
        sx, sy, sz = _as3(self.stride)
        px, py, pz = (int(v) for v in _as3_keep(self.padding))
        w = self.param(
            "weight",
            nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
            (kx * ky * kz, self.in_channels, self.out_channels),
        )
        w3 = w.reshape(kx, ky, kz, self.in_channels, self.out_channels)
        B, Z, X, Y, C = x.shape
        Zo = (Z + 2 * pz - kz) // sz + 1
        xp = jnp.pad(x, ((0, 0), (pz, pz), (0, 0), (0, 0), (0, 0)))
        acc = None
        for dz in range(kz):
            if sz == 1:
                xs = jax.lax.slice_in_dim(xp, dz, dz + Zo, axis=1)
            elif Zo <= 0:
                xs = jax.lax.slice_in_dim(xp, 0, 0, axis=1)
            else:
                # native strided slice (jnp.take lowers to a gather and
                # costs ~5 ms on the 360^2 strided conv input)
                xs = jax.lax.slice_in_dim(
                    xp, dz, dz + (Zo - 1) * sz + 1, stride=sz, axis=1)
            y = jax.lax.conv_general_dilated(
                xs.reshape(B * Zo, X, Y, C).astype(self.dtype),
                w3[:, :, dz].astype(self.dtype),
                window_strides=(sx, sy),
                padding=((px, px), (py, py)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            acc = y if acc is None else acc + y
        Xo, Yo = acc.shape[1], acc.shape[2]
        return acc.reshape(B, Zo, Xo, Yo, self.out_channels)


def _as3(v):
    return tuple(v) if isinstance(v, (tuple, list)) else (v, v, v)


def _as3_keep(v):
    return tuple(v) if isinstance(v, (tuple, list)) else (v, v, v)


def _as_pair(v):
    return (int(v), int(v))


def _dilate_mask(mask, kernel, stride, padding):
    """Active-output mask of a strided sparse conv on a dense z-major
    grid (mask [B, Z, X, Y]; kernel/stride/padding given x-major)."""
    kx, ky, kz = _as3(kernel)
    sx, sy, sz = _as3(stride)
    px, py, pz = (int(v) for v in _as3_keep(padding))
    return nn.max_pool(
        mask.astype(jnp.float32)[..., None],
        (kz, kx, ky), strides=(sz, sx, sy),
        padding=((pz, pz), (px, px), (py, py)),
    )[..., 0] > 0


@BACKBONES.register()
class SparseEncoder(nn.Module):
    in_channels: int
    sparse_shape: Sequence[int]  # (X, Y, Z) e.g. (1440, 1440, 41)
    order: Sequence[str] = ("conv", "norm", "act")
    norm_cfg: Optional[dict] = None
    base_channels: int = 16
    output_channels: int = 128
    encoder_channels: Sequence[Sequence[int]] = ((16,), (32, 32, 32), (64, 64, 64), (64, 64, 64))
    encoder_paddings: Sequence[Sequence[Any]] = ((1,), (1, 1, 1), (1, 1, 1), ((0, 1, 1), 1, 1))
    block_type: str = "conv_module"
    site_cap_multiplier: float = 1.0  # output-site cap per downsample, x input cap
    # explicit per-downsample output-site caps (overrides the multiplier)
    site_caps: Optional[Sequence[int]] = None
    # stages >= this index run as dense masked MXU convs (numerically
    # exact; the coarse grids fit HBM easily). -1 disables. Stage 3 is
    # the sweet spot for the windowed engine (measured r3): at stage 2
    # the 360^2 grid is ~3% occupied and dense wastes 30x the FLOPs (a
    # wash vs windowed); at stage 3 (180^2, 128 ch, ~7% occupied) dense
    # z-as-batch 2D convs at ~74% MXU beat the windowed kernels ~4x AND
    # delete the coarse-stage rulebook meta. Earlier stages have <64
    # channels where lane padding (channels -> 128) blows activations up
    # 4x (observed OOM at stage 1: bf16[21,720,720,32] padded 4.6x).
    dense_from_stage: int = 3
    # execution engine: "auto" = windowed Pallas kernels on TPU, the
    # gather-GEMM + dense-stage path elsewhere; "windowed"/"gather"
    # force one. All engines share one parameter tree.
    engine: str = "auto"
    # windowed-engine neighbor-window slack (x the site block); realistic
    # lidar scans show zero window overflow at 2 (see
    # ops/sparse_conv_windowed.py docstring)
    window_slack: int = 2
    dtype: Dtype = jnp.float32

    def _bn(self, name):
        cfg = self.norm_cfg or {"type": "BN1d", "eps": 1e-3, "momentum": 0.01}
        return MaskedBatchNorm(
            eps=cfg.get("eps", 1e-3), momentum=cfg.get("momentum", 0.01),
            dtype=self.dtype, name=name,
        )

    @nn.compact
    def __call__(self, voxel_feats, coords, mask, training: bool = False):
        """voxel_feats [B, M, C]; coords [B, M, 3] int (x, y, z) sorted
        x-major per sample; mask [B, M]. Returns BEV map
        [B, X/8, Y/8, output_channels * D_final] (NHWC)."""
        assert self.block_type in ("conv_module", "basicblock")
        grid = sp.SparseGrid(*[int(s) for s in self.sparse_shape])
        B, M, _ = voxel_feats.shape

        ids = jax.vmap(lambda c, m: sp.lin_ids(c, grid, m))(coords, mask)
        feats = jnp.where(mask[..., None], voxel_feats, 0.0).astype(self.dtype)

        engine = self.engine
        if engine == "auto":
            # windowed Pallas kernels (with custom VJP for training)
            # on TPU; the gather/dense path elsewhere (identical
            # parameters and numerics)
            on_tpu = jax.default_backend() == "tpu"
            engine = "windowed" if on_tpu else "gather"
        if engine == "windowed":
            return self._forward_windowed(feats, ids, mask, grid, training)

        def subm_rb(ids_, g):
            return jax.vmap(lambda i: sp.build_subm_rulebook(i, g, 3))(ids_)

        dense_mode = self.dense_from_stage == 0
        dmask = None  # dense [B, X, Y, Z] bool once dense_mode

        def densify(feats_, ids_, mask_, g):
            """-> dense z-major [B, Z, X, Y, C] + occupancy [B, Z, X, Y]."""
            d = jax.vmap(lambda f, i, m: sp.to_dense_zmajor(f, i, m, g))(
                feats_, ids_, mask_)
            occ = jax.vmap(
                lambda i, m: sp.to_dense_zmajor(
                    jnp.ones(i.shape + (1,), jnp.float32), i, m, g)
            )(ids_, mask_)[..., 0] > 0
            return d, occ

        if dense_mode:
            feats, dmask = densify(feats, ids, mask, grid)

        # conv_input (sparse_encoder.py:63-85): subm k3 p1 + BN + ReLU
        if dense_mode:
            feats = _DenseConv3d(self.in_channels, self.base_channels, 3, 1, 1,
                                 dtype=self.dtype, name="conv_input")(feats)
            feats = self._bn("bn_input")(feats, dmask, training)
        else:
            nbr = subm_rb(ids, grid)
            feats = _SparseConvNd(self.in_channels, self.base_channels, 3,
                                  dtype=self.dtype, name="conv_input")(feats, nbr)
            feats = self._bn("bn_input")(feats, mask, training)
        feats = nn.relu(feats)

        in_ch = self.base_channels
        n_stages = len(self.encoder_channels)
        cap = M
        n_down = 0

        for i, blocks in enumerate(self.encoder_channels):
            if not dense_mode and 0 <= self.dense_from_stage == i:
                feats, dmask = densify(feats, ids, mask, grid)
                dense_mode = True
            for j, out_ch in enumerate(tuple(blocks)):
                padding = tuple(self.encoder_paddings[i])[j]
                is_strided = (
                    (self.block_type == "conv_module" and i != 0 and j == 0)
                    or (
                        self.block_type == "basicblock"
                        and j == len(blocks) - 1
                        and i != n_stages - 1
                    )
                )
                name = f"stage{i}_block{j}"
                if is_strided:
                    will_dense = dense_mode or (0 <= self.dense_from_stage <= i + 1)
                    if dense_mode:
                        feats = _DenseConv3d(in_ch, out_ch, 3, 2, padding,
                                             dtype=self.dtype,
                                             name=f"{name}_spconv")(feats)
                        dmask = _dilate_mask(dmask, 3, 2, padding)
                        feats = self._bn(f"{name}_bn")(feats, dmask, training)
                        feats = nn.relu(feats)
                        grid = sp.conv_out_shape(grid, 3, 2, padding)
                    else:
                        if self.site_caps is not None and n_down < len(self.site_caps):
                            cap_out = int(self.site_caps[n_down])
                        else:
                            cap_out = max(1, int(cap * self.site_cap_multiplier))
                        out_grid = sp.conv_out_shape(grid, 3, 2, padding)
                        g_in = grid
                        out_ids, out_mask = jax.vmap(
                            lambda i_: sp.downsample_sites(i_, g_in, 3, 2, padding, cap_out)
                        )(ids)
                        cnbr = jax.vmap(
                            lambda oi, ii: sp.build_conv_rulebook(
                                ii, oi, g_in, out_grid, 3, 2, padding
                            ),
                            in_axes=(0, 0),
                        )(out_ids, ids)
                        feats = _SparseConvNd(in_ch, out_ch, 3, dtype=self.dtype,
                                              name=f"{name}_spconv")(feats, cnbr)
                        ids, mask, grid, cap = out_ids, out_mask, out_grid, cap_out
                        feats = self._bn(f"{name}_bn")(feats, mask, training)
                        feats = nn.relu(feats)
                        if will_dense:
                            feats, dmask = densify(feats, ids, mask, grid)
                            dense_mode = True
                        else:
                            nbr = subm_rb(ids, grid)
                    n_down += 1
                elif self.block_type == "basicblock":
                    # SparseBasicBlock (ops/sparse_block.py): two subm
                    # convs + BN with residual
                    identity = feats
                    if dense_mode:
                        y = _DenseConv3d(in_ch, out_ch, 3, 1, 1, dtype=self.dtype,
                                         name=f"{name}_conv1")(feats)
                        y = self._bn(f"{name}_bn1")(y, dmask, training)
                        y = nn.relu(y)
                        y = _DenseConv3d(out_ch, out_ch, 3, 1, 1, dtype=self.dtype,
                                         name=f"{name}_conv2")(y)
                        y = self._bn(f"{name}_bn2")(y, dmask, training)
                        feats = nn.relu(y + identity)
                        feats = jnp.where(dmask[..., None], feats, 0.0)
                    else:
                        y = _SparseConvNd(in_ch, out_ch, 3, dtype=self.dtype,
                                          name=f"{name}_conv1")(feats, nbr)
                        y = self._bn(f"{name}_bn1")(y, mask, training)
                        y = nn.relu(y)
                        y = _SparseConvNd(out_ch, out_ch, 3, dtype=self.dtype,
                                          name=f"{name}_conv2")(y, nbr)
                        y = self._bn(f"{name}_bn2")(y, mask, training)
                        feats = nn.relu(y + identity)
                        feats = jnp.where(mask[..., None], feats, 0.0)
                else:
                    if dense_mode:
                        y = _DenseConv3d(in_ch, out_ch, 3, 1, padding,
                                         dtype=self.dtype, name=f"{name}_conv")(feats)
                        y = self._bn(f"{name}_bn")(y, dmask, training)
                    else:
                        y = _SparseConvNd(in_ch, out_ch, 3, dtype=self.dtype,
                                          name=f"{name}_conv")(feats, nbr)
                        y = self._bn(f"{name}_bn")(y, mask, training)
                    feats = nn.relu(y)
                in_ch = out_ch

        # conv_out (sparse_encoder.py:87-97): SparseConv3d (1,1,3)/(1,1,2)
        k_out, s_out, p_out = (1, 1, 3), (1, 1, 2), 0
        if dense_mode:
            feats = _DenseConv3d(in_ch, self.output_channels, k_out, s_out,
                                 p_out, dtype=self.dtype, name="conv_out")(feats)
            dmask = _dilate_mask(dmask, k_out, s_out, p_out)
            feats = self._bn("bn_out")(feats, dmask, training)
            feats = nn.relu(feats)
            # [B, Z, X, Y, C] -> [B, X, Y, Z, C]
            dense = feats.transpose(0, 2, 3, 1, 4)
        else:
            out_grid = sp.conv_out_shape(grid, k_out, s_out, p_out)
            g_fin = grid
            out_ids, out_mask = jax.vmap(
                lambda i_: sp.downsample_sites(i_, g_fin, k_out, s_out, p_out, cap)
            )(ids)
            cnbr = jax.vmap(
                lambda oi, ii: sp.build_conv_rulebook(
                    ii, oi, g_fin, out_grid, k_out, s_out, p_out)
            )(out_ids, ids)
            feats = _SparseConvNd(in_ch, self.output_channels, k_out,
                                  dtype=self.dtype, name="conv_out")(feats, cnbr)
            mask, ids, grid = out_mask, out_ids, out_grid
            feats = self._bn("bn_out")(feats, mask, training)
            feats = nn.relu(feats)
            dense = jax.vmap(lambda f, i, m: sp.to_dense(f, i, m, grid))(feats, ids, mask)

        # dense: [B, X, Y, Z, C] -> [B, X, Y, C*Z] (channel = c*Z + z,
        # matching the reference's permute+view, sparse_encoder.py:126-131)
        B_, X, Y, Z, C = dense.shape
        return dense.transpose(0, 1, 2, 4, 3).reshape(B_, X, Y, C * Z)

    def _forward_windowed(self, feats, ids, mask, grid, training: bool):
        """Windowed-Pallas engine: every stage sparse, site features
        packed [cap/P, 128] bf16 end-to-end (ops/sparse_conv_windowed).
        Same stage structure / parameter names / numerics contract as
        the gather and dense paths (oracle-tested)."""
        B, M, Cin0 = feats.shape
        slack = int(self.window_slack)

        # pad input channels to a 128-divisor width (zero lanes)
        Cp0 = next(c for c in (16, 32, 64, 128) if c >= Cin0)
        feats = jnp.pad(feats, ((0, 0), (0, 0), (0, Cp0 - Cin0)))
        packed = feats.astype(jnp.bfloat16).reshape(B, -1, 128)

        tables = {}  # per-stage column tables, shared across rulebooks

        def bmap(fn, *args):
            """Static python loop over the batch instead of jax.vmap:
            vmapped gathers/scatters lower ~3x slower on this backend
            (a batched [1, 120k, 27] row gather costs 6.5 ms vs 1.9
            unbatched, measured in the fused encoder trace)."""
            def at(a, b):
                return jax.tree_util.tree_map(lambda l: l[b], a)

            outs = [fn(*(at(a, b) for a in args)) for b in range(B)]
            return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *outs)

        def _BM_(fn, in_axes=None):
            # curried form of bmap so call sites keep the vmap shape
            return lambda *args: bmap(fn, *args)

        # subm windows keep the default 512-site block: the one-hot
        # matmul's contraction dim (WP lanes) pads to 128 anyway, so a
        # smaller block would shrink only DMA bytes, not MXU work
        SUBM_BLK = wg.BLK
        sslack = slack
        # subm offsets grouped per dx (kz=9): all 9 (dy, dz) neighbors of
        # a dx live within +-(Z+1) site ids, so ONE window DMA covers
        # them — 3 DMAs per block instead of 9 and bigger one-hot
        # matmuls ([9*BLK, WP] instead of [3*BLK, WP]); the kernel's kz
        # grouping is layout-agnostic (kernel_offsets is x-major)
        SUBM_KZ = 9

        def subm_wrb(ids_, g, C, tbl=None):
            if tbl is None:
                tbl = bmap(lambda i: sp.build_column_table(i, g), ids_)
            # 3-wide table rows: one 36-byte fetch serves a dx's whole
            # y-triple (3 gathers/site instead of 9); shared between the
            # subm rulebook and the stage's strided conv rulebook. The
            # build is ~3 full-image passes — NOT worth it on the huge
            # stage-0 grid (sp.t9_worth_it; the 2 consumers here relax
            # the single-consumer gate by 2x).
            cap_ = jax.tree_util.tree_leaves(ids_)[0].shape[-1]
            if sp.t9_worth_it(g.X * g.Y, 2 * cap_):
                tbl9 = bmap(lambda t: sp.build_column_table9(t, g), tbl)
            else:
                tbl9 = None
            tables["cur"] = tbl
            tables["cur9"] = tbl9
            # offset-major [K, cap] rulebooks end-to-end: a [cap, 27]
            # int32 array physically lane-pads to 128 elements (61 MB at
            # 120k sites) on this backend
            nbr = bmap(lambda i, t: sp.build_subm_rulebook(
                i, g, 3, table=t, table9=None,
                offset_major=True), ids_, tbl) if tbl9 is None \
                else bmap(lambda i, t, t9: sp.build_subm_rulebook(
                    i, g, 3, table=t, table9=t9,
                    offset_major=True), ids_, tbl, tbl9)
            return bmap(lambda n: wg.build_windowed_rulebook(
                n, C, slack=sslack, kz=SUBM_KZ, blk=SUBM_BLK,
                offset_major=True), nbr)

        overflow = []  # per-conv dropped-neighbor counts (diagnostic)

        # strided convs run 4x the subm slack; a 128-site block keeps
        # their one-hot gather matmuls (work ~ slack * blk per site) at
        # subm cost while the window still spans slack * blk sites
        SBLK = 128

        def conv(name, packed_, wrbs, cin, cout, cap_out, K=27, lane_c=0,
                 slack_=None, wrbs_bwd=None, slack_bwd=0, cap_in=0,
                 mirror=True, blk=SUBM_BLK, blk_bwd=wg.BLK, kz=SUBM_KZ,
                 **epi):
            overflow.append(jnp.sum(wrbs.overflow))
            if wrbs_bwd is not None:
                overflow.append(jnp.sum(wrbs_bwd.overflow))
            return _WindowedConv(cin, cout, K, lane_channels=lane_c,
                                 blk=blk, blk_bwd=blk_bwd, kz=kz,
                                 dtype=self.dtype, name=name)(
                packed_, wrbs, cap_out, slack_ or sslack, training=training,
                wrbs_bwd=wrbs_bwd, slack_bwd=slack_bwd, cap_in=cap_in,
                mirror=mirror, **epi)

        def bn_mod(name, cout):
            cfg = self.norm_cfg or {}
            return PackedMaskedBatchNorm(
                cout, eps=cfg.get("eps", 1e-3),
                momentum=cfg.get("momentum", 0.01),
                dtype=jnp.bfloat16, name=name)

        def conv_bn(cname, bname, packed_, wrbs, cin, cout, cap_out,
                    mask_, residual=None, relu_=True, **kw):
            """conv + BN + (residual) + ReLU. Training: separate passes
            (BN needs batch moments). Eval: BN folds into the conv
            kernel's epilogue — one dispatch, no extra HBM pass."""
            m = bn_mod(bname, cout)
            if training:
                y = conv(cname, packed_, wrbs, cin, cout, cap_out, **kw)
                y = m(y, mask_, True)
                if residual is not None:
                    y = y + residual
                return nn.relu(y) if relu_ else y
            # RELAXED PACKED-ZERO INVARIANT (eval only): the fused epilogue
            # applies relu(x*inv + sh) to every packed row, so padded /
            # invalid rows carry relu(shift) instead of the zeros the
            # unfused PackedMaskedBatchNorm writes. Every consumer masks
            # (to_dense drops sentinel ids; rulebook one-hots select only
            # valid neighbors) — any future unmasked reduction over packed
            # rows must re-mask with `mask_` first.
            inv, sh = m(None, None, False, fold=True)
            return conv(cname, packed_, wrbs, cin, cout, cap_out,
                        scale=inv, shift=sh, relu=relu_,
                        residual=residual, **kw)

        cap = M
        wrbs = subm_wrb(ids, grid, Cp0)

        # conv_input: subm k3 p1 + BN + ReLU (sparse_encoder.py:63-85);
        # weight param keeps the true Cin0 width (engine/ckpt parity)
        packed = conv_bn("conv_input", "bn_input", packed, wrbs, Cin0,
                         self.base_channels, cap, mask, lane_c=Cp0)

        in_ch = self.base_channels
        n_stages = len(self.encoder_channels)
        n_down = 0

        # hybrid engine: from dense_from_stage on, unpack and run dense
        # masked MXU convs (z-as-batch 2D convs hit ~74% MXU while the
        # coarse grids fit HBM easily) — the coarse-stage rulebook meta
        # and gather kernels disappear entirely. Numerically exact and
        # parameter-compatible (weights/BN identical across engines).
        dense_mode = False
        dmask = None
        feats = None

        def densify_packed(packed_, ch):
            f = wg.unpack_sites(packed_.reshape(-1, 128), ch).reshape(
                B, cap, ch).astype(self.dtype)
            d = _BM_(lambda fv, iv, mv: sp.to_dense_zmajor(
                fv, iv, mv, grid))(f, ids, mask)
            occ = _BM_(lambda iv, mv: sp.occupancy_zmajor(iv, mv, grid))(
                ids, mask)
            return d, occ

        for i, blocks in enumerate(self.encoder_channels):
            if not dense_mode and 0 <= self.dense_from_stage == i:
                feats, dmask = densify_packed(packed, in_ch)
                dense_mode = True
            for j, out_ch in enumerate(tuple(blocks)):
                padding = tuple(self.encoder_paddings[i])[j]
                is_strided = (
                    (self.block_type == "conv_module" and i != 0 and j == 0)
                    or (
                        self.block_type == "basicblock"
                        and j == len(blocks) - 1
                        and i != n_stages - 1
                    )
                )
                name = f"stage{i}_block{j}"
                if (is_strided and not dense_mode
                        and 0 <= self.dense_from_stage <= i + 1):
                    # densify BEFORE the strided conv into the dense
                    # stage: the dense strided conv is ~1 ms on the MXU
                    # and deletes a downsample_sites + conv rulebook +
                    # windowed strided conv (~15 ms of meta+gather)
                    feats, dmask = densify_packed(packed, in_ch)
                    dense_mode = True
                if is_strided and dense_mode:
                    feats = _DenseConv3d(in_ch, out_ch, 3, 2, padding,
                                         dtype=self.dtype,
                                         name=f"{name}_spconv")(feats)
                    dmask = _dilate_mask(dmask, 3, 2, padding)
                    feats = self._bn(f"{name}_bn")(feats, dmask, training)
                    feats = nn.relu(feats)
                    grid = sp.conv_out_shape(grid, 3, 2, padding)
                    n_down += 1
                elif is_strided:
                    if self.site_caps is not None and n_down < len(self.site_caps):
                        cap_out = int(self.site_caps[n_down])
                    else:
                        cap_out = max(1, int(cap * self.site_cap_multiplier))
                    out_grid = sp.conv_out_shape(grid, 3, 2, padding)
                    g_in = grid
                    if sp.downsample_supported(g_in, 3, 2, padding):
                        # column-bitmask fold: no sort, and the output
                        # stage's column table comes out for free
                        out_ids, out_mask, out_tbl = _BM_(
                            lambda t: sp.downsample_sites_bitfold(
                                t, g_in, 3, 2, padding, cap_out)
                        )(tables["cur"])
                    else:
                        out_ids, out_mask = _BM_(
                            lambda i_: sp.downsample_sites(
                                i_, g_in, 3, 2, padding, cap_out)
                        )(ids)
                        out_tbl = None
                    cnbr = _BM_(
                        lambda oi, ii, t, t9: sp.build_conv_rulebook(
                            ii, oi, g_in, out_grid, 3, 2, padding, table=t,
                            table9=t9, offset_major=True)
                    )(out_ids, ids, tables["cur"], tables["cur9"])
                    # a stride-2 conv's output block covers up to ~8x
                    # (stride^3) as many input sites in dense regions, so
                    # strided windows need 4x the subm slack (measured:
                    # slack 8 is exact on fully-dense truncated regions)
                    swrbs = _BM_(
                        lambda n: wg.build_windowed_rulebook(
                            n, in_ch, cap_in=cap, slack=4 * slack, kz=3,
                            blk=SBLK, offset_major=True))(cnbr)
                    twrbs = None
                    if training:
                        # backward-data rulebook: transpose pairing over
                        # the output sites with Cout packing
                        nbr_t = _BM_(
                            lambda ii, oi: sp.build_conv_transpose_rulebook(
                                ii, oi, g_in, out_grid, 3, 2, padding,
                                offset_major=True)
                        )(ids, out_ids)
                        twrbs = _BM_(
                            lambda n: wg.build_windowed_rulebook(
                                n, out_ch, cap_in=cap_out, slack=2 * slack,
                                kz=3, offset_major=True)
                        )(nbr_t)
                    packed = conv_bn(f"{name}_spconv", f"{name}_bn", packed,
                                     swrbs, in_ch, out_ch, cap_out, out_mask,
                                     slack_=4 * slack, wrbs_bwd=twrbs,
                                     slack_bwd=2 * slack, cap_in=cap,
                                     mirror=False, blk=SBLK, kz=3)
                    ids, mask, grid, cap = out_ids, out_mask, out_grid, cap_out
                    wrbs = subm_wrb(ids, grid, out_ch, tbl=out_tbl)
                    n_down += 1
                elif self.block_type == "basicblock" and dense_mode:
                    identity = feats
                    y = _DenseConv3d(in_ch, out_ch, 3, 1, 1, dtype=self.dtype,
                                     name=f"{name}_conv1")(feats)
                    y = self._bn(f"{name}_bn1")(y, dmask, training)
                    y = nn.relu(y)
                    y = _DenseConv3d(out_ch, out_ch, 3, 1, 1, dtype=self.dtype,
                                     name=f"{name}_conv2")(y)
                    y = self._bn(f"{name}_bn2")(y, dmask, training)
                    feats = nn.relu(y + identity)
                    feats = jnp.where(dmask[..., None], feats, 0.0)
                elif self.block_type == "basicblock":
                    identity = packed
                    y = conv_bn(f"{name}_conv1", f"{name}_bn1", packed, wrbs,
                                in_ch, out_ch, cap, mask)
                    packed = conv_bn(f"{name}_conv2", f"{name}_bn2", y, wrbs,
                                     out_ch, out_ch, cap, mask,
                                     residual=identity)
                elif dense_mode:
                    y = _DenseConv3d(in_ch, out_ch, 3, 1, padding,
                                     dtype=self.dtype, name=f"{name}_conv")(feats)
                    y = self._bn(f"{name}_bn")(y, dmask, training)
                    feats = nn.relu(y)
                else:
                    packed = conv_bn(f"{name}_conv", f"{name}_bn", packed,
                                     wrbs, in_ch, out_ch, cap, mask)
                in_ch = out_ch

        # conv_out: SparseConv3d (1,1,3)/(1,1,2) (sparse_encoder.py:87-97)
        k_out, s_out, p_out = (1, 1, 3), (1, 1, 2), 0
        if dense_mode:
            feats = _DenseConv3d(in_ch, self.output_channels, k_out, s_out,
                                 p_out, dtype=self.dtype, name="conv_out")(feats)
            dmask = _dilate_mask(dmask, k_out, s_out, p_out)
            feats = self._bn("bn_out")(feats, dmask, training)
            feats = nn.relu(feats)
            self.sow("intermediates", "window_overflow",
                     sum(overflow[1:], overflow[0]))
            # [B, Z, X, Y, C] -> [B, X, Y, Z, C]
            dense = feats.transpose(0, 2, 3, 1, 4)
            B_, X, Y, Z, C = dense.shape
            return dense.transpose(0, 1, 2, 4, 3).reshape(B_, X, Y, C * Z)

        out_grid = sp.conv_out_shape(grid, k_out, s_out, p_out)
        g_fin = grid
        if sp.downsample_supported(g_fin, k_out, s_out, p_out):
            out_ids, out_mask, _ = _BM_(
                lambda t: sp.downsample_sites_bitfold(
                    t, g_fin, k_out, s_out, p_out, cap)
            )(tables["cur"])
        else:
            out_ids, out_mask = _BM_(
                lambda i_: sp.downsample_sites(i_, g_fin, k_out, s_out, p_out,
                                               cap)
            )(ids)
        cnbr = _BM_(
            lambda oi, ii, t: sp.build_conv_rulebook(
                ii, oi, g_fin, out_grid, k_out, s_out, p_out, table=t,
                offset_major=True)
        )(out_ids, ids, tables["cur"])
        owrbs = _BM_(
            lambda n: wg.build_windowed_rulebook(
                n, in_ch, cap_in=cap, slack=4 * slack, kz=3, blk=SBLK,
                offset_major=True))(cnbr)
        otwrbs = None
        if training:
            nbr_t = _BM_(
                lambda ii, oi: sp.build_conv_transpose_rulebook(
                    ii, oi, g_fin, out_grid, k_out, s_out, p_out,
                    offset_major=True)
            )(ids, out_ids)
            otwrbs = _BM_(
                lambda n: wg.build_windowed_rulebook(
                    n, self.output_channels, cap_in=cap, slack=2 * slack,
                    kz=3, offset_major=True)
            )(nbr_t)
        packed = conv_bn("conv_out", "bn_out", packed, owrbs, in_ch,
                         self.output_channels, cap, out_mask, K=3,
                         slack_=4 * slack, wrbs_bwd=otwrbs,
                         slack_bwd=2 * slack, cap_in=cap, mirror=False,
                         blk=SBLK, kz=3)
        ids, mask, grid = out_ids, out_mask, out_grid

        # window-overflow diagnostic: must stay 0 on real data (see
        # ops/sparse_conv_windowed.py); observable via capture_intermediates
        self.sow("intermediates", "window_overflow",
                 sum(overflow[1:], overflow[0]))

        feats_out = wg.unpack_sites(
            packed.reshape(-1, 128), self.output_channels
        ).reshape(B, cap, self.output_channels).astype(self.dtype)
        dense = _BM_(lambda f, i, m: sp.to_dense(f, i, m, grid))(
            feats_out, ids, mask)
        B_, X, Y, Z, C = dense.shape
        return dense.transpose(0, 1, 2, 4, 3).reshape(B_, X, Y, C * Z)

"""Plain-torch Swin-T forward oracle over SwinSkeleton parameters.

Semantics: the mmdet SwinTransformer the reference configures
(configs/nuscenes/det/.../swint/default.yaml:7-25) — window attention
with relative position bias, shifted windows + cyclic-shift mask,
pad-to-window-multiple, patch merging, LN per emitted scale. Eval mode
(no dropout/droppath).
"""
import numpy as np
import torch
import torch.nn.functional as F


def _relative_position_index(ws):
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return torch.from_numpy(
        (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int64))


def _shift_attn_mask(H, W, ws, shift):
    img = torch.zeros(1, H, W, 1)
    cnt = 0
    for h in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for w in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[:, h, w, :] = cnt
            cnt += 1
    wins = img.view(1, H // ws, ws, W // ws, ws, 1)
    wins = wins.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws)
    mask = wins[:, None, :] - wins[:, :, None]
    return torch.where(mask != 0, torch.tensor(-100.0), torch.tensor(0.0))


def _window_partition(x, ws):
    B, H, W, C = x.shape
    x = x.view(B, H // ws, ws, W // ws, ws, C)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, C)


def _window_reverse(wins, ws, H, W):
    B = wins.shape[0] // ((H // ws) * (W // ws))
    x = wins.view(B, H // ws, W // ws, ws, ws, -1)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(B, H, W, -1)


def _attention(msa, x, num_heads, ws, mask=None):
    """msa = skeleton WindowMSA (qkv/proj/rel-pos table). x [nB, N, C]."""
    nB, N, C = x.shape
    hd = C // num_heads
    scale = hd ** -0.5
    qkv = msa.qkv(x).reshape(nB, N, 3, num_heads, hd).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = (q * scale) @ k.transpose(-2, -1)
    rpi = _relative_position_index(ws).reshape(-1)
    bias = msa.relative_position_bias_table[rpi].reshape(N, N, num_heads)
    attn = attn + bias.permute(2, 0, 1)[None]
    if mask is not None:
        nW = mask.shape[0]
        attn = attn.view(nB // nW, nW, num_heads, N, N) + mask[None, :, None]
        attn = attn.view(nB, num_heads, N, N)
    attn = attn.softmax(dim=-1)
    out = (attn @ v).transpose(1, 2).reshape(nB, N, C)
    return msa.proj(out)


def _block(blk, x, H, W, num_heads, ws, shift):
    B, L, C = x.shape
    shortcut = x
    x = blk.norm1(x).view(B, H, W, C)
    pad_b = (ws - H % ws) % ws
    pad_r = (ws - W % ws) % ws
    if pad_b or pad_r:
        x = F.pad(x, (0, 0, 0, pad_r, 0, pad_b))
    Hp, Wp = H + pad_b, W + pad_r
    mask = None
    if shift > 0:
        x = torch.roll(x, shifts=(-shift, -shift), dims=(1, 2))
        mask = _shift_attn_mask(Hp, Wp, ws, shift)
    wins = _window_partition(x, ws).reshape(-1, ws * ws, C)
    wins = _attention(blk.attn.w_msa, wins, num_heads, ws, mask)
    x = _window_reverse(wins.view(-1, ws, ws, C), ws, Hp, Wp)
    if shift > 0:
        x = torch.roll(x, shifts=(shift, shift), dims=(1, 2))
    if pad_b or pad_r:
        x = x[:, :H, :W]
    x = shortcut + x.reshape(B, L, C)
    # FFN: layers.0.0 Linear + GELU, layers.1 Linear
    y = blk.norm2(x)
    y = blk.ffn.layers[1](blk.ffn.layers[0](y))
    return x + y


def _patch_merge(pm, x, H, W):
    B, L, C = x.shape
    x = x.view(B, H, W, C)
    if H % 2 or W % 2:
        x = F.pad(x, (0, 0, 0, W % 2, 0, H % 2))
    x0 = x[:, 0::2, 0::2]
    x1 = x[:, 1::2, 0::2]
    x2 = x[:, 0::2, 1::2]
    x3 = x[:, 1::2, 1::2]
    x = torch.cat([x0, x1, x2, x3], dim=-1)
    Ho, Wo = x.shape[1], x.shape[2]
    x = x.reshape(B, Ho * Wo, 4 * C)
    return pm.reduction(pm.norm(x)), Ho, Wo


def swin_forward(skel, x, depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24),
                 window_size=7, out_indices=(1, 2, 3)):
    """x [B, 3, H, W] -> list of NCHW maps at out_indices scales."""
    x = skel.patch_embed.projection(x)
    B, C, Hc, Wc = x.shape
    x = x.flatten(2).transpose(1, 2)
    x = skel.patch_embed.norm(x)
    outs = []
    for si in range(len(depths)):
        stage = skel.stages[si]
        for bi, blk in enumerate(stage.blocks):
            shift = 0 if bi % 2 == 0 else window_size // 2
            x = _block(blk, x, Hc, Wc, num_heads[si], window_size, shift)
        if si in out_indices:
            y = getattr(skel, f"norm{si}")(x)
            outs.append(y.view(B, Hc, Wc, -1).permute(0, 3, 1, 2))
        if hasattr(stage, "downsample"):
            x, Hc, Wc = _patch_merge(stage.downsample, x, Hc, Wc)
    return outs

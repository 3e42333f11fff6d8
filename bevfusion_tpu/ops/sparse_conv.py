"""Submanifold / strided sparse 3D convolution for TPU.

Behavioral reference: the vendored SECOND spconv engine
(mmdet3d/ops/spconv/): rulebook construction `getIndicePair`
(include/spconv/spconv_ops.h:28-258) and gather-GEMM-scatter
`indiceConv` (:261-360), plus the SubM/SparseConv3d dispatch in
ops/spconv/conv.py:120-223.

TPU-first redesign (static shapes, gather-only, no scatter, no hash):
- Active sites are kept as *sorted* linearized ids [cap] per sample
  (sentinel = X*Y*Z for padding). The voxelizer already emits this order.
- Submanifold conv: output sites == input sites. For each kernel offset
  the neighbor id is found with a vectorized binary search
  (jnp.searchsorted) over the sorted ids — the TPU replacement for the
  CUDA hash grid. The conv is then K gathers + K MXU matmuls, masked on
  miss. The neighbor table (`rulebook`) is built once per `indice_key`
  and reused by every conv in the stage, matching the reference's
  indice_dict caching contract (conv.py:152-179).
- Strided ("regular") sparse conv: each *output* site + offset maps to
  exactly one input coordinate, so it is the same gather-GEMM form.
  Output sites = sorted-unique of the ≤ prod(ceil(k/s)) candidate
  parents of each input site (the reference enumerates input->output
  pairs instead, spconv_ops.h:28-258; same active set).
- Inverse/transposed conv: not implemented (no BEVFusion config uses it;
  the reference ships it for Part-A2-style decoders).

All helpers are per-sample; callers vmap over the batch, which also
turns the per-offset GEMMs into batched MXU matmuls.
"""
from __future__ import annotations

import itertools
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "SparseGrid",
    "lin_ids",
    "unlin_ids",
    "sorted_unique",
    "build_subm_rulebook",
    "subm_gather_gemm",
    "downsample_sites",
    "build_conv_rulebook",
    "to_dense",
    "kernel_offsets",
]


class SparseGrid(NamedTuple):
    X: int
    Y: int
    Z: int

    @property
    def size(self) -> int:
        return self.X * self.Y * self.Z


def _triple(v):
    if isinstance(v, (tuple, list)):
        return tuple(int(x) for x in v)
    return (int(v),) * 3


def kernel_offsets(kernel_size) -> np.ndarray:
    """Offsets in the weight-enumeration order [K, 3] (x, y, z ascending,
    x-major) — index k of the [K, Cin, Cout] weight."""
    kx, ky, kz = _triple(kernel_size)
    return np.array(
        list(itertools.product(range(kx), range(ky), range(kz))), np.int32
    )


def lin_ids(coords, grid: SparseGrid, valid=None):
    """(x, y, z) int coords [N, 3] -> x-major ids, invalid -> grid.size."""
    ids = (coords[..., 0] * grid.Y + coords[..., 1]) * grid.Z + coords[..., 2]
    if valid is not None:
        ids = jnp.where(valid, ids, grid.size)
    return ids.astype(jnp.int32)


def unlin_ids(ids, grid: SparseGrid):
    x = ids // (grid.Y * grid.Z)
    y = (ids // grid.Z) % grid.Y
    z = ids % grid.Z
    return x, y, z


def sorted_unique(ids, cap: int, sentinel: int):
    """Sort ids [N] and compact unique values into [cap] (+mask).

    ids >= sentinel count as padding. When there are more than ``cap``
    unique ids the smallest survive (same drop rule as the voxelizer).
    """
    ids_s = jnp.sort(ids)
    head = jnp.concatenate(
        [jnp.ones((1,), jnp.int32), (ids_s[1:] != ids_s[:-1]).astype(jnp.int32)]
    )
    seg = jnp.cumsum(head) - 1  # [N] nondecreasing
    starts = jnp.searchsorted(seg, jnp.arange(cap, dtype=jnp.int32), side="left")
    starts_c = jnp.minimum(starts, ids.shape[0] - 1)
    uids = jnp.take(ids_s, starts_c)
    mask = (starts < ids.shape[0]) & (uids < sentinel)
    uids = jnp.where(mask, uids, sentinel)
    return uids.astype(jnp.int32), mask


def build_subm_rulebook(ids, grid: SparseGrid, kernel_size=3):
    """Neighbor gather table for submanifold conv.

    ids: [cap] sorted active-site ids (sentinel-padded). Returns
    nbr [cap, K] int32 indices into ids (-1 on miss), reused by every
    subm conv sharing the indice_key (spconv conv.py:152-179).
    """
    kx, ky, kz = _triple(kernel_size)
    offs = kernel_offsets((kx, ky, kz))
    px, py, pz = (kx - 1) // 2, (ky - 1) // 2, (kz - 1) // 2
    x, y, z = unlin_ids(ids, grid)
    cols = []
    for k in range(offs.shape[0]):
        dx, dy, dz = int(offs[k, 0]) - px, int(offs[k, 1]) - py, int(offs[k, 2]) - pz
        nx_, ny_, nz_ = x + dx, y + dy, z + dz
        ok = (
            (nx_ >= 0) & (nx_ < grid.X)
            & (ny_ >= 0) & (ny_ < grid.Y)
            & (nz_ >= 0) & (nz_ < grid.Z)
            & (ids < grid.size)
        )
        nid = (nx_ * grid.Y + ny_) * grid.Z + nz_
        j = jnp.searchsorted(ids, nid)
        j = jnp.minimum(j, ids.shape[0] - 1)
        hit = ok & (jnp.take(ids, j) == nid)
        cols.append(jnp.where(hit, j, -1))
    return jnp.stack(cols, axis=1).astype(jnp.int32)


def subm_gather_gemm(feats, nbr, weight):
    """Gather-GEMM conv: feats [cap_in, Cin], nbr [cap_out, K] (indices
    into feats, -1 on miss), weight [K, Cin, Cout] -> [cap_out, Cout].

    K gathers + K matmuls, masked on miss — the TPU form of the
    reference's gather-GEMM-scatter (spconv_ops.h:319-356); no scatter
    is needed because each output row owns its accumulation. Used for
    both submanifold (cap_out == cap_in) and regular strided convs.
    """
    K = nbr.shape[1]
    Cout = weight.shape[-1]
    out = jnp.zeros((nbr.shape[0], Cout), dtype=jnp.float32)
    for k in range(K):
        idx = nbr[:, k]
        g = jnp.take(feats, jnp.maximum(idx, 0), axis=0)
        g = jnp.where((idx >= 0)[:, None], g, 0.0)
        out = out + jnp.dot(g, weight[k], preferred_element_type=jnp.float32)
    return out.astype(feats.dtype)


def conv_out_shape(grid: SparseGrid, kernel_size, stride, padding) -> SparseGrid:
    k, s, p = _triple(kernel_size), _triple(stride), _triple(padding)
    dims = [
        (d + 2 * p[i] - k[i]) // s[i] + 1
        for i, d in enumerate((grid.X, grid.Y, grid.Z))
    ]
    return SparseGrid(*dims)


def downsample_sites(ids, grid: SparseGrid, kernel_size, stride, padding, cap_out: int):
    """Active output sites of a strided sparse conv.

    For each input site, the candidate parents are the output coords o
    with o*s - p + off == in for some valid off; per axis at most
    ceil(k/s) candidates. Returns (out_ids [cap_out] sorted, out_mask);
    the output grid is the static conv_out_shape(grid, k, s, p).
    """
    k, s, p = _triple(kernel_size), _triple(stride), _triple(padding)
    og = conv_out_shape(grid, kernel_size, stride, padding)
    x, y, z = unlin_ids(ids, grid)
    in_valid = ids < grid.size

    def axis_cands(c, ki, si, pi, dim_out):
        """Output coords per input coord along one axis: [cap, n_c]."""
        n_c = -(-ki // si)  # ceil
        outs, oks = [], []
        for t in range(n_c):
            # offsets with off ≡ (c + p) mod s, off = base + t*s
            base = (c + pi) % si
            off = base + t * si
            o = (c + pi - off) // si
            ok = (off < ki) & (o >= 0) & (o < dim_out)
            outs.append(o)
            oks.append(ok)
        return jnp.stack(outs, -1), jnp.stack(oks, -1)

    ox, okx = axis_cands(x, k[0], s[0], p[0], og.X)
    oy, oky = axis_cands(y, k[1], s[1], p[1], og.Y)
    oz, okz = axis_cands(z, k[2], s[2], p[2], og.Z)

    # combine axes: [cap, ncx, ncy, ncz]
    o_id = (
        (ox[:, :, None, None] * og.Y + oy[:, None, :, None]) * og.Z
        + oz[:, None, None, :]
    )
    ok = (
        okx[:, :, None, None]
        & oky[:, None, :, None]
        & okz[:, None, None, :]
        & in_valid[:, None, None, None]
    )
    cand = jnp.where(ok, o_id, og.size).reshape(-1)
    return sorted_unique(cand, cap_out, og.size)


def build_conv_rulebook(in_ids, out_ids, grid: SparseGrid, out_grid: SparseGrid,
                        kernel_size, stride, padding):
    """Gather table for a regular (strided) sparse conv.

    For output site o and offset k the unique input coord is
    o*s - p + off_k; returns nbr [cap_out, K] int32 into in_ids (-1 miss).
    """
    k, s, p = _triple(kernel_size), _triple(stride), _triple(padding)
    offs = kernel_offsets(kernel_size)
    ox, oy, oz = unlin_ids(out_ids, out_grid)
    out_valid = out_ids < out_grid.size
    cols = []
    for kk in range(offs.shape[0]):
        ix = ox * s[0] - p[0] + int(offs[kk, 0])
        iy = oy * s[1] - p[1] + int(offs[kk, 1])
        iz = oz * s[2] - p[2] + int(offs[kk, 2])
        ok = (
            (ix >= 0) & (ix < grid.X)
            & (iy >= 0) & (iy < grid.Y)
            & (iz >= 0) & (iz < grid.Z)
            & out_valid
        )
        nid = (ix * grid.Y + iy) * grid.Z + iz
        j = jnp.searchsorted(in_ids, nid)
        j = jnp.minimum(j, in_ids.shape[0] - 1)
        hit = ok & (jnp.take(in_ids, j) == nid)
        cols.append(jnp.where(hit, j, -1))
    return jnp.stack(cols, axis=1).astype(jnp.int32)


def to_dense(feats, ids, mask, grid: SparseGrid):
    """Scatter active features into a dense [X, Y, Z, C] grid
    (SparseConvTensor.dense, ops/spconv/structure.py:49-56)."""
    C = feats.shape[-1]
    idx = jnp.where(mask, ids, grid.size)
    dense = jnp.zeros((grid.size + 1, C), feats.dtype)
    dense = dense.at[idx].set(jnp.where(mask[:, None], feats, 0.0))
    return dense[:-1].reshape(grid.X, grid.Y, grid.Z, C)

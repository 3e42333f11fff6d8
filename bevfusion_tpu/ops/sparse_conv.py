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


class ColumnTable(NamedTuple):
    """O(1) active-site lookup structure (replaces both the reference's
    GPU hash grid, spconv_ops.h:28-258, and binary search).

    Sites are sorted by x-major id = (x*Y + y)*Z + z, i.e. grouped into
    (x, y) *columns* with ascending z. Since Z <= 64 for every stage of
    the encoder, each column's z-occupancy fits one 64-bit mask (stored
    as two uint32 lanes). A site lookup is then 3 gathers + popcount:
        row = start[col] + popcount(bits below z);  present = bit z.
    """

    lo: jnp.ndarray  # [X*Y] uint32, z bits 0..31
    hi: jnp.ndarray  # [X*Y] uint32, z bits 32..63
    start: jnp.ndarray  # [X*Y] int32, first row of the column


def build_column_table(ids, grid: SparseGrid) -> ColumnTable:
    """ids: [cap] sorted site ids (sentinel = grid.size for padding)."""
    assert grid.Z <= 64, "column bitmask lookup requires Z <= 64"
    XY = grid.X * grid.Y
    valid = ids < grid.size
    col = jnp.where(valid, ids // grid.Z, XY)
    z = jnp.where(valid, ids % grid.Z, 0)
    lo_bit = jnp.where(valid & (z < 32), jnp.uint32(1) << z.astype(jnp.uint32), 0)
    hi_bit = jnp.where(
        valid & (z >= 32), jnp.uint32(1) << jnp.maximum(z - 32, 0).astype(jnp.uint32), 0
    )
    # per-column z bits are unique -> sum == bitwise or
    lo = jax.ops.segment_sum(lo_bit, col, num_segments=XY + 1)[:XY].astype(jnp.uint32)
    hi = jax.ops.segment_sum(hi_bit, col, num_segments=XY + 1)[:XY].astype(jnp.uint32)
    counts = jax.lax.population_count(lo) + jax.lax.population_count(hi)
    start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts.astype(jnp.int32))[:-1]]
    )
    return ColumnTable(lo, hi, start)


def _rank_below(lo, hi, z):
    """Number of set bits strictly below z in a (lo, hi) column mask."""
    zlo = jnp.clip(z, 0, 31).astype(jnp.uint32)  # safe shift amounts
    mask_lo = jnp.where(
        z < 32,
        (jnp.uint32(1) << zlo) - jnp.uint32(1),
        jnp.uint32(0xFFFFFFFF),
    )
    zhi = jnp.clip(z - 32, 0, 31).astype(jnp.uint32)
    mask_hi = (jnp.uint32(1) << zhi) - jnp.uint32(1)  # 0 when z <= 32
    return (
        jax.lax.population_count(lo & mask_lo)
        + jax.lax.population_count(hi & mask_hi)
    ).astype(jnp.int32)


def _present(lo, hi, z):
    zc = jnp.clip(z, 0, 31).astype(jnp.uint32)
    zh = jnp.clip(z - 32, 0, 31).astype(jnp.uint32)
    in_lo = ((lo >> zc) & jnp.uint32(1)).astype(jnp.bool_)
    in_hi = ((hi >> zh) & jnp.uint32(1)).astype(jnp.bool_)
    return jnp.where(z < 32, in_lo, in_hi)


def _lookup(ids, nx_, ny_, nz_, ok, grid: SparseGrid, table: ColumnTable = None):
    """Vectorized O(1) lookup of neighbor coords (any shape) -> row or -1."""
    if table is None:
        table = build_column_table(ids, grid)
    XY = grid.X * grid.Y
    col = jnp.clip(nx_ * grid.Y + ny_, 0, XY - 1)
    lo = jnp.take(table.lo, col)
    hi = jnp.take(table.hi, col)
    st = jnp.take(table.start, col)
    present = _present(lo, hi, nz_) & ok
    row = st + _rank_below(lo, hi, nz_)
    return jnp.where(present, row, -1).astype(jnp.int32)


def build_subm_rulebook(ids, grid: SparseGrid, kernel_size=3):
    """Neighbor gather table for submanifold conv.

    ids: [cap] sorted active-site ids (sentinel-padded). Returns
    nbr [cap, K] int32 indices into ids (-1 on miss), reused by every
    subm conv sharing the indice_key (spconv conv.py:152-179). All K
    offsets are looked up with ONE vectorized binary search.
    """
    kx, ky, kz = _triple(kernel_size)
    offs = jnp.asarray(kernel_offsets((kx, ky, kz)))  # [K, 3]
    pad = jnp.asarray([(kx - 1) // 2, (ky - 1) // 2, (kz - 1) // 2])
    d = offs - pad  # [K, 3]
    x, y, z = unlin_ids(ids, grid)
    nx_ = x[:, None] + d[None, :, 0]
    ny_ = y[:, None] + d[None, :, 1]
    nz_ = z[:, None] + d[None, :, 2]
    ok = (
        (nx_ >= 0) & (nx_ < grid.X)
        & (ny_ >= 0) & (ny_ < grid.Y)
        & (nz_ >= 0) & (nz_ < grid.Z)
        & (ids < grid.size)[:, None]
    )
    return _lookup(ids, nx_, ny_, nz_, ok, grid)


def subm_gather_gemm(feats, nbr, weight):
    """Gather-GEMM conv: feats [cap_in, Cin], nbr [cap_out, K] (indices
    into feats, -1 on miss), weight [K, Cin, Cout] -> [cap_out, Cout].

    K gathers + K MXU matmuls via lax.scan over the kernel offsets — the
    TPU form of the reference's gather-GEMM-scatter
    (spconv_ops.h:319-356); no scatter is needed because each output row
    owns its accumulation. Used for both submanifold (cap_out == cap_in)
    and regular strided convs. scan keeps the HLO size O(1) in K.
    """
    Cout = weight.shape[-1]

    def step(acc, kw):
        idx, w = kw
        g = jnp.take(feats, jnp.maximum(idx, 0), axis=0)
        g = jnp.where((idx >= 0)[:, None], g, 0.0)
        return acc + jnp.dot(g, w, preferred_element_type=jnp.float32), None

    init = jnp.zeros((nbr.shape[0], Cout), jnp.float32)
    out, _ = jax.lax.scan(step, init, (nbr.T, weight))
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
    One vectorized binary search covers all K offsets.
    """
    k, s, p = _triple(kernel_size), _triple(stride), _triple(padding)
    offs = jnp.asarray(kernel_offsets(kernel_size))  # [K, 3]
    ox, oy, oz = unlin_ids(out_ids, out_grid)
    out_valid = out_ids < out_grid.size
    ix = ox[:, None] * s[0] - p[0] + offs[None, :, 0]
    iy = oy[:, None] * s[1] - p[1] + offs[None, :, 1]
    iz = oz[:, None] * s[2] - p[2] + offs[None, :, 2]
    ok = (
        (ix >= 0) & (ix < grid.X)
        & (iy >= 0) & (iy < grid.Y)
        & (iz >= 0) & (iz < grid.Z)
        & out_valid[:, None]
    )
    return _lookup(in_ids, ix, iy, iz, ok, grid)


def to_dense(feats, ids, mask, grid: SparseGrid):
    """Scatter active features into a dense [X, Y, Z, C] grid
    (SparseConvTensor.dense, ops/spconv/structure.py:49-56)."""
    C = feats.shape[-1]
    idx = jnp.where(mask, ids, grid.size)
    dense = jnp.zeros((grid.size + 1, C), feats.dtype)
    dense = dense.at[idx].set(jnp.where(mask[:, None], feats, 0.0))
    return dense[:-1].reshape(grid.X, grid.Y, grid.Z, C)

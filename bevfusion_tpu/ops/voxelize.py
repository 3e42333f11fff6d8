"""Point-cloud voxelization with static shapes.

Reference semantics: hard voxelization (mmdet3d/ops/voxel/voxelize.py:10-148
+ src/voxelization_cuda.cu:25-46): points -> per-voxel groups of at most
``max_points`` points (extras dropped in arrival order), at most
``max_voxels`` voxels, int coords in (x, y, z) order (this fork's CUDA
writes c_x, c_y, c_z — voxelization_cuda.cu:36-59); BEVFusion then
mean-reduces each voxel (fusion_models/bevfusion.py:171-197).

Voxels are emitted sorted by x-major linearized id ((x*ny + y)*nz + z),
which is exactly the active-site order the sparse encoder's
searchsorted rulebooks need — the voxelizer output feeds sparse convs
with no re-sort.

TPU-first redesign: the reference's per-sample Python loop + CUDA hash
becomes one jitted program per batch:
  1. quantize points to voxel ids (out-of-range -> sentinel id),
  2. stable-sort point indices by voxel id (preserves arrival order
     within a voxel, like the deterministic CUDA path),
  3. segment boundaries via searchsorted -> fixed-capacity voxel table,
  4. gather (never scatter) points into [max_voxels, max_points, C].

Divergence from the reference (documented): when a sample has more than
``max_voxels`` occupied voxels we keep the smallest linearized ids
instead of the earliest-appearing voxels. The reference's own
non-deterministic GPU path (voxelization_cuda.cu:182-228) also has an
arbitrary drop set, so this is within its behavioral envelope.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["VoxelizationOutput", "voxelize", "voxelize_batch", "Voxelization",
           "DynamicScatter", "dynamic_scatter"]


class VoxelizationOutput(NamedTuple):
    feats: jnp.ndarray  # [M, max_points, C] or mean-reduced [M, C]
    coords: jnp.ndarray  # [M, 3] int32 (x, y, z); invalid rows = -1
    num_points: jnp.ndarray  # [M] int32 (stored points per voxel)
    mask: jnp.ndarray  # [M] bool


def _grid_dims(point_cloud_range, voxel_size) -> Tuple[int, int, int]:
    pcr = np.asarray(point_cloud_range, np.float64)
    vs = np.asarray(voxel_size, np.float64)
    nx, ny, nz = np.round((pcr[3:] - pcr[:3]) / vs).astype(np.int64)
    return int(nx), int(ny), int(nz)


def voxelize(
    points: jnp.ndarray,
    points_mask: jnp.ndarray,
    voxel_size: Sequence[float],
    point_cloud_range: Sequence[float],
    max_points: int,
    max_voxels: int,
    reduce: Optional[str] = "mean",
) -> VoxelizationOutput:
    """Voxelize one sample. points [P, C] (x, y, z, ...), points_mask [P].

    With reduce='mean', feats is the per-voxel mean over the first
    ``max_points`` stored points — identical to the reference's
    hard-voxelize + sum/size reduction (bevfusion.py:188-194) — and the
    [M, max_points, C] tensor is never materialized.
    """
    P, C = points.shape
    nx, ny, nz = _grid_dims(point_cloud_range, voxel_size)
    num_cells = nx * ny * nz
    pcr = jnp.asarray(point_cloud_range, jnp.float32)
    vs = jnp.asarray(voxel_size, jnp.float32)

    cf = jnp.floor((points[:, :3] - pcr[:3]) / vs).astype(jnp.int32)
    cx, cy, cz = cf[:, 0], cf[:, 1], cf[:, 2]
    in_range = (
        (cx >= 0) & (cx < nx) & (cy >= 0) & (cy < ny) & (cz >= 0) & (cz < nz)
    )
    pvalid = in_range & points_mask
    ids = (cx * ny + cy) * nz + cz  # x-major: sparse-encoder site order
    ids = jnp.where(pvalid, ids, num_cells)

    # one multi-operand sort yields ids_s AND the permutation (argsort +
    # take re-gathers what the sort already computed; 1D gathers cost
    # ~1 ms/120k on this backend)
    ids_s, order = jax.lax.sort(
        (ids, jnp.arange(P, dtype=jnp.int32)), num_keys=1, is_stable=True)

    M = max_voxels
    # per-point segment index (0-based, nondecreasing); boundaries found
    # by scattering run heads/tails (unique indices, no binary search)
    headb = jnp.concatenate([jnp.ones((1,), bool), ids_s[1:] != ids_s[:-1]])
    tailb = jnp.concatenate([ids_s[:-1] != ids_s[1:], jnp.ones((1,), bool)])
    seg_of_point = jnp.cumsum(headb.astype(jnp.int32)) - 1  # [P]
    pos = jnp.arange(P, dtype=jnp.int32)
    seg_clip = jnp.where(seg_of_point < M, seg_of_point, M)
    starts = (
        jnp.full((M + 1,), P, jnp.int32)
        .at[jnp.where(headb, seg_clip, M)]
        .set(pos, mode="drop", unique_indices=True)[:M]
    )
    ends = (
        jnp.full((M + 1,), P, jnp.int32)
        .at[jnp.where(tailb, seg_clip, M)]
        .set(pos + 1, mode="drop", unique_indices=True)[:M]
    )
    count = jnp.where(starts < P, ends - starts, 0).astype(jnp.int32)

    start_clip = jnp.minimum(starts, P - 1)
    vox_ids = jnp.take(ids_s, start_clip)
    vmask = (count > 0) & (vox_ids < num_cells)
    stored = jnp.where(vmask, jnp.minimum(count, max_points), 0)

    vx = vox_ids // (ny * nz)
    vy = (vox_ids // nz) % ny
    vz = vox_ids % nz
    coords = jnp.stack([vx, vy, vz], axis=-1).astype(jnp.int32)
    coords = jnp.where(vmask[:, None], coords, -1)

    if reduce in ("mean", "sum", "max"):
        # reduce over the first max_points points of each voxel, without
        # materializing the [M, max_points, C] buffer. With
        # max_points >= P this is exactly DynamicScatter's uncapped
        # mean/sum/max over all points of a voxel
        # (reference ops/voxel/scatter_points.py:8-104).
        # segment start per point via cummax of head positions (a scan,
        # not a 120k-row gather from starts)
        seg_start = jax.lax.cummax(jnp.where(headb, pos, 0))
        pos_in_seg = pos - seg_start
        use = (
            (seg_of_point < M)
            & (pos_in_seg < max_points)
            & (ids_s < num_cells)
        )
        pts_s = jnp.take(points, order, axis=0)
        seg = jnp.where(use, seg_of_point, M)
        if reduce == "max":
            vals = jnp.where(use[:, None], pts_s, -jnp.inf)
            feats = jax.ops.segment_max(vals, seg, num_segments=M + 1)[:-1]
        else:
            vals = jnp.where(use[:, None], pts_s, 0.0)
            feats = jax.ops.segment_sum(vals, seg, num_segments=M + 1)[:-1]
            if reduce == "mean":
                feats = feats / jnp.maximum(stored, 1)[:, None]
        feats = jnp.where(vmask[:, None], feats, 0.0)
        return VoxelizationOutput(feats, coords, stored, vmask)

    # full [M, max_points, C] table (PillarFeatureNet-style consumers)
    slot_j = jnp.arange(max_points, dtype=jnp.int32)
    src = starts[:, None] + slot_j[None, :]
    slot_valid = (slot_j[None, :] < stored[:, None]) & vmask[:, None]
    src = jnp.clip(src, 0, P - 1)
    gathered = jnp.take(pts_sorted(points, order), src.reshape(-1), axis=0)
    feats = gathered.reshape(M, max_points, C)
    feats = jnp.where(slot_valid[..., None], feats, 0.0)
    return VoxelizationOutput(feats, coords, stored, vmask)


def pts_sorted(points, order):
    return jnp.take(points, order, axis=0)


def voxelize_batch(
    points: jnp.ndarray,
    points_mask: jnp.ndarray,
    voxel_size: Sequence[float],
    point_cloud_range: Sequence[float],
    max_points: int,
    max_voxels: int,
    reduce: Optional[str] = "mean",
):
    """Batched voxelization -> flat voxel list with batch coords.

    points [B, P, C], points_mask [B, P]. Returns
    (feats [B*M, C?], coords [B*M, 4] int32 (b, x, y, z), num_points,
    mask) — the layout the sparse encoder consumes (reference pads the
    batch index into coords, bevfusion.py:181).
    """
    B = points.shape[0]

    # static python loop, NOT vmap: batched (vmapped) gathers/scatters
    # lower ~3x slower on this backend (measured, PERFORMANCE.md), and B
    # is tiny and static
    outs = [
        voxelize(points[b], points_mask[b], voxel_size, point_cloud_range,
                 max_points, max_voxels, reduce)
        for b in range(B)
    ]
    out = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *outs)
    M = max_voxels
    batch_idx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), M).reshape(B, M, 1)
    coords4 = jnp.concatenate([batch_idx, out.coords], axis=-1)
    flat = lambda x: x.reshape((B * M,) + x.shape[2:])
    return (
        flat(out.feats),
        flat(coords4),
        flat(out.num_points),
        flat(out.mask),
    )


def dynamic_scatter(feats, coords, valid, grid_dims, max_voxels: int,
                    reduce: str = "mean"):
    """DynamicScatter core (reference ops/voxel/scatter_points.py:8-104 +
    src/scatter_points_cuda.cu:88-197): reduce arbitrary per-point
    features over unique voxel coords.

    feats [P, C]; coords [P, 3] int (x, y, z); valid [P] bool;
    grid_dims (nx, ny, nz). Returns (voxel_feats [max_voxels, C],
    voxel_coords [max_voxels, 3] int32 (-1 padding), mask [max_voxels]).
    Reduce modes: mean / sum / max. Static-shape: at most ``max_voxels``
    unique voxels are kept (smallest linearized ids survive).
    """
    nx, ny, nz = (int(d) for d in grid_dims)
    num_cells = nx * ny * nz
    P = feats.shape[0]
    cx, cy, cz = coords[:, 0], coords[:, 1], coords[:, 2]
    ok = (
        valid & (cx >= 0) & (cx < nx) & (cy >= 0) & (cy < ny)
        & (cz >= 0) & (cz < nz)
    )
    ids = jnp.where(ok, (cx * ny + cy) * nz + cz, num_cells)

    ids_s, order = jax.lax.sort(
        (ids, jnp.arange(P, dtype=jnp.int32)), num_keys=1, is_stable=True)
    feats_s = jnp.take(feats, order, axis=0)

    M = max_voxels
    headb = jnp.concatenate([jnp.ones((1,), bool), ids_s[1:] != ids_s[:-1]])
    seg = jnp.cumsum(headb.astype(jnp.int32)) - 1
    use = (seg < M) & (ids_s < num_cells)
    seg_c = jnp.where(use, seg, M)

    counts = jax.ops.segment_sum(use.astype(jnp.int32), seg_c, num_segments=M + 1)[:-1]
    vmask = counts > 0
    if reduce == "max":
        vals = jnp.where(use[:, None], feats_s, -jnp.inf)
        out = jax.ops.segment_max(vals, seg_c, num_segments=M + 1)[:-1]
    else:
        vals = jnp.where(use[:, None], feats_s, 0.0)
        out = jax.ops.segment_sum(vals, seg_c, num_segments=M + 1)[:-1]
        if reduce == "mean":
            out = out / jnp.maximum(counts, 1)[:, None]
    out = jnp.where(vmask[:, None], out, 0.0)

    vox_ids = (
        jnp.full((M + 1,), num_cells, jnp.int32)
        .at[jnp.where(headb & use, seg_c, M)]
        .set(ids_s.astype(jnp.int32), mode="drop", unique_indices=True)[:M]
    )
    vx = vox_ids // (ny * nz)
    vy = (vox_ids // nz) % ny
    vz = vox_ids % nz
    vcoords = jnp.where(
        vmask[:, None], jnp.stack([vx, vy, vz], -1).astype(jnp.int32), -1
    )
    return out, vcoords, vmask


class DynamicScatter:
    """Reference-shaped wrapper (ops/voxel/scatter_points.py:96-104):
    ``average_points`` True -> mean, False -> max."""

    def __init__(self, voxel_size, point_cloud_range, average_points: bool,
                 max_voxels: int = 65536):
        self.voxel_size = tuple(voxel_size)
        self.point_cloud_range = tuple(point_cloud_range)
        self.average_points = average_points
        self.max_voxels = max_voxels

    def __call__(self, points, points_mask):
        """points [P, C] with xyz leading -> (feats, coords, mask)."""
        nx, ny, nz = _grid_dims(self.point_cloud_range, self.voxel_size)
        pcr = jnp.asarray(self.point_cloud_range, jnp.float32)
        vs = jnp.asarray(self.voxel_size, jnp.float32)
        cf = jnp.floor((points[:, :3] - pcr[:3]) / vs).astype(jnp.int32)
        return dynamic_scatter(
            points, cf, points_mask, (nx, ny, nz), self.max_voxels,
            "mean" if self.average_points else "max")


class Voxelization:
    """Config-driven wrapper mirroring ops/voxel/voxelize.py:10-148.

    max_voxels may be an (train, test) pair like the reference; pick via
    the ``training`` flag at call time.
    """

    def __init__(
        self,
        voxel_size,
        point_cloud_range,
        max_num_points,
        max_voxels=20000,
        reduce="mean",
    ):
        self.voxel_size = tuple(voxel_size)
        self.point_cloud_range = tuple(point_cloud_range)
        self.max_num_points = max_num_points
        if isinstance(max_voxels, (tuple, list)):
            self.max_voxels_train, self.max_voxels_test = max_voxels
        else:
            self.max_voxels_train = self.max_voxels_test = max_voxels
        self.reduce = reduce

    def __call__(self, points, points_mask, training: bool = False):
        max_voxels = self.max_voxels_train if training else self.max_voxels_test
        # max_num_points <= 0 selects dynamic voxelization (the reference
        # builds DynamicScatter then, bevfusion.py:45-48): reduce over
        # ALL points of a voxel, no per-voxel cap
        max_points = self.max_num_points
        if max_points is None or max_points <= 0:
            max_points = int(points.shape[-2])
        return voxelize_batch(
            points,
            points_mask,
            self.voxel_size,
            self.point_cloud_range,
            max_points,
            max_voxels,
            self.reduce,
        )

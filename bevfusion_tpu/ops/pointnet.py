"""PointNet++-family ops (pure XLA, static shapes).

Behavioral reference: the reference's CUDA op packages not on the
BEVFusion hot path (SURVEY §2.10): ops/ball_query, ops/knn,
ops/group_points (QueryAndGroup/GroupAll), ops/interpolate
(three_nn/three_interpolate), ops/furthest_point_sample,
ops/gather_points, ops/paconv (assign_score_withk). They back
PointNet++/PartA2-style models built on this framework.

TPU-first: every op is a masked dense computation — distance matrices
feed top-k / argmin instead of CUDA neighbor kernels; FPS is a fori
loop with an O(N) running-distance update (the standard formulation).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "square_distance", "ball_query", "knn", "furthest_point_sample",
    "gather_points", "group_points", "three_nn", "three_interpolate",
    "assign_score_withk",
]


def square_distance(a, b):
    """[N, 3] x [M, 3] -> [N, M] squared euclidean distances."""
    return (
        jnp.sum(a**2, -1, keepdims=True)
        - 2 * a @ b.T
        + jnp.sum(b**2, -1)[None]
    )


def ball_query(radius: float, nsample: int, xyz, new_xyz, xyz_mask=None):
    """For each query in new_xyz [S, 3], up to nsample neighbor indices
    in xyz [N, 3] within radius (first-found order, padded with the
    first hit like the CUDA kernel). Returns (idx [S, nsample], valid)."""
    d2 = square_distance(new_xyz, xyz)
    if xyz_mask is not None:
        d2 = jnp.where(xyz_mask[None, :], d2, jnp.inf)
    within = d2 <= radius**2
    # rank hits by original index: first nsample
    N = xyz.shape[0]
    order_key = jnp.where(within, jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1), N)
    idx_sorted = jnp.sort(order_key, axis=1)[:, :nsample]
    valid = idx_sorted < N
    first = jnp.where(valid[:, :1], idx_sorted[:, :1], 0)
    idx = jnp.where(valid, idx_sorted, first)  # pad with first hit
    return idx.astype(jnp.int32), valid


def knn(k: int, xyz, new_xyz, xyz_mask=None):
    """k nearest neighbors: (idx [S, k], dists [S, k])."""
    d2 = square_distance(new_xyz, xyz)
    if xyz_mask is not None:
        d2 = jnp.where(xyz_mask[None, :], d2, jnp.inf)
    neg, idx = jax.lax.top_k(-d2, k)
    return idx.astype(jnp.int32), jnp.sqrt(jnp.maximum(-neg, 0))


def furthest_point_sample(xyz, npoint: int, mask=None):
    """Iterative farthest point sampling -> [npoint] indices
    (ops/furthest_point_sample semantics; starts at index 0)."""
    N = xyz.shape[0]
    big = jnp.asarray(1e10, jnp.float32)
    dist = jnp.full((N,), big)
    if mask is not None:
        dist = jnp.where(mask, dist, -1.0)

    def body(i, state):
        dist, last, out = state
        d = jnp.sum((xyz - xyz[last]) ** 2, -1)
        if mask is not None:
            d = jnp.where(mask, d, -1.0)
        dist = jnp.minimum(dist, d)
        nxt = jnp.argmax(dist).astype(jnp.int32)
        out = out.at[i].set(nxt)
        return dist, nxt, out

    out0 = jnp.zeros((npoint,), jnp.int32)
    _, _, out = jax.lax.fori_loop(1, npoint, body, (dist, jnp.int32(0), out0))
    return out


def gather_points(feats, idx):
    """feats [N, C], idx [...] -> feats[idx] (ops/gather_points)."""
    return jnp.take(feats, idx, axis=0)


def group_points(feats, idx):
    """feats [N, C], idx [S, K] -> [S, K, C] (ops/group_points)."""
    return jnp.take(feats, idx.reshape(-1), axis=0).reshape(*idx.shape, feats.shape[-1])


def three_nn(unknown, known, known_mask=None):
    """3 nearest known points per unknown point -> (dists [N,3], idx [N,3])."""
    idx, d = knn(3, known, unknown, known_mask)
    return d, idx


def three_interpolate(feats, idx, weight):
    """Inverse-distance-weighted interpolation: feats [M, C],
    idx [N, 3], weight [N, 3] -> [N, C] (ops/interpolate)."""
    g = group_points(feats, idx)  # [N, 3, C]
    return jnp.sum(g * weight[..., None], axis=1)


def interpolation_weights(dists, eps=1e-8):
    recip = 1.0 / jnp.maximum(dists**2, eps)
    return recip / jnp.sum(recip, -1, keepdims=True)


def assign_score_withk(scores, point_feats, center_feats, knn_idx, aggregate="sum"):
    """PAConv weighted kernel assembly (ops/paconv assign_score_withk):
    scores [S, K, M]; point/center feats [N, M, C] (per-kernel banks);
    knn_idx [S, K] -> out [S, K, C] where
    out = sum_m score_m * (point_feat[nbr, m] - center_feat[center, m])."""
    nbr = jnp.take(point_feats, knn_idx.reshape(-1), axis=0).reshape(
        *knn_idx.shape, *point_feats.shape[1:]
    )  # [S, K, M, C]
    center = jnp.take(center_feats, knn_idx[:, :1].reshape(-1), axis=0).reshape(
        knn_idx.shape[0], 1, *center_feats.shape[1:]
    )  # [S, 1, M, C]
    diff = nbr - center
    out = jnp.einsum("skm,skmc->skc", scores, diff)
    return out

"""Jittable linear assignment (auction algorithm) for Hungarian matching.

Behavioral reference: HungarianAssigner3D
(mmdet3d/core/bbox/assigners/hungarian_assigner.py:85-143) — the
reference computes a [num_proposals, num_gts] cost (focal cls cost +
BEV-L1 reg cost + (-IoU) cost) and ships it to scipy's
linear_sum_assignment on the CPU, a device->host sync in the middle of
every training step.

TPU-first: a forward-auction algorithm with epsilon scaling runs the
assignment in-graph under jit (lax.while_loop). With eps below the cost
resolution it returns an optimal assignment; the unit tests compare
against scipy on random costs. Rows/columns are padded to static shapes
with +inf-like costs and masked.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["auction_assignment", "hungarian_costs"]

_BIG = 1e9


def auction_assignment(cost, row_valid, col_valid, eps_scale: float = 0.002,
                       max_iters: int = 2000):
    """Minimize sum of cost[r, assign[r]] over valid rows/cols.

    cost: [R, C] float32 (R = gts, C = proposals; typically R <= C).
    Returns assign [R] int32 (column per row, -1 for unassigned/invalid).

    Forward auction on values v = -cost: each unassigned row bids for its
    best column at price[col]; bid = best - second_best + eps. A single
    phase from zero prices with eps = spread * eps_scale / R gives an
    assignment within R*eps = spread*eps_scale of optimal. (Two-phase
    eps-scaling is deliberately NOT used: in the asymmetric R < C case,
    prices inflated on columns that end phase 1 unassigned can never
    decrease, which breaks the duality bound — observed empirically.)
    """
    R, C = cost.shape
    value = -jnp.where(
        row_valid[:, None] & col_valid[None, :], cost.astype(jnp.float32), _BIG
    )
    spread = jnp.maximum(jnp.max(value) - jnp.min(jnp.where(value > -_BIG / 2, value, jnp.inf)), 1.0)

    def run_phase(eps, price, assign):
        # assign: [R] col or -1 ; owner: [C] row or -1
        owner = jnp.full((C,), -1, jnp.int32)
        assign = jnp.full((R,), -1, jnp.int32)

        def cond(state):
            it, assign, owner, price = state
            unassigned = (assign < 0) & row_valid
            return (it < max_iters) & jnp.any(unassigned)

        def body(state):
            it, assign, owner, price = state
            net = value - price[None, :]  # [R, C]
            best_j = jnp.argmax(net, axis=1)
            best_v = jnp.max(net, axis=1)
            net2 = net.at[jnp.arange(R), best_j].set(-jnp.inf)
            second_v = jnp.max(net2, axis=1)
            bid = best_v - second_v + eps

            bidding = (assign < 0) & row_valid
            # each column takes the highest bid among bidders targeting it
            bid_amt = jnp.where(bidding, bid, -jnp.inf)
            # segment-max of bid_amt by best_j
            col_best_bid = jax.ops.segment_max(
                bid_amt, jnp.where(bidding, best_j, C), num_segments=C + 1
            )[:C]
            # winner row per column: argmax via where-trick
            is_winner = bidding & (bid_amt == col_best_bid[best_j])
            # break ties by row index: pick min row among winners per col
            row_ids = jnp.where(is_winner, jnp.arange(R), R)
            win_row = jax.ops.segment_min(
                row_ids, jnp.where(is_winner, best_j, C), num_segments=C + 1
            )[:C]
            got_bid = win_row < R

            owner = jnp.where(got_bid, win_row.astype(jnp.int32), owner)
            price = jnp.where(got_bid, price + col_best_bid, price)
            # assignments are fully determined by column ownership
            assign = jnp.full((R,), -1, jnp.int32)
            assign = assign.at[jnp.where(owner >= 0, owner, R)].set(
                jnp.arange(C, dtype=jnp.int32), mode="drop"
            )
            return it + 1, assign, owner, price

        it, assign, owner, price = jax.lax.while_loop(
            cond, body, (jnp.asarray(0), assign, owner, price)
        )
        return price, assign

    price = jnp.zeros((C,), jnp.float32)
    eps = spread * eps_scale / max(R, 1)
    price, assign = run_phase(eps, price, None)
    assign = jnp.where(row_valid, assign, -1)
    return assign


def hungarian_costs(cls_score, boxes_norm_xy, gt_norm_xy, iou, gt_labels,
                    cls_weight=0.15, reg_weight=0.25, iou_weight=0.25,
                    alpha=0.25, gamma=2.0, eps=1e-12):
    """The reference's cost matrix (hungarian_assigner.py:14-35, 117-124),
    transposed to [num_gts, num_proposals].

    cls_score: [P, num_cls] sigmoid scores; boxes_norm_xy/gt_norm_xy:
    centers normalized to [0,1]; iou: [P, G] 3D IoU.
    Returns cost [G, P].
    """
    # FocalLossCost (mmdet match_costs): pos - neg gathered at gt label.
    # max(., eps) instead of + eps: XLA reassociates (1 - s) + eps to
    # (1 + eps) - s under jit, absorbing the guard; f32 sigmoid saturates
    # to exactly 1.0 (logits >= ~17) and the cost would go inf.
    neg = -jnp.log(jnp.maximum(1 - cls_score, eps)) * (1 - alpha) * cls_score**gamma
    pos = -jnp.log(jnp.maximum(cls_score, eps)) * alpha * (1 - cls_score) ** gamma
    cls_cost = (pos - neg)[:, gt_labels]  # [P, G]
    reg_cost = jnp.sum(
        jnp.abs(boxes_norm_xy[:, None, :] - gt_norm_xy[None, :, :]), axis=-1
    )
    cost = cls_weight * cls_cost + reg_weight * reg_cost + iou_weight * (-iou)
    return cost.T

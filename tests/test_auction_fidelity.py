"""Auction vs Hungarian (scipy) fidelity at realistic matcher scale.

VERDICT r3 item 9: the in-graph auction solver (core/matching.py) is
only spread-bounded vs the reference's scipy linear_sum_assignment
(mmdet3d/core/bbox/assigners/hungarian_assigner.py:123-129). This test
quantifies the end effect at TransFusion-realistic shapes — 200 query
proposals x up to 30 GTs with CLUSTERED costs (proposals concentrated
around GT centers, like a trained detector's heatmap top-K) — on:
  1. one-to-one validity,
  2. total assignment cost vs optimal,
  3. the matched-pair L1 regression loss the train step would compute.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from bevfusion_tpu.core.matching import auction_assignment

scipy_opt = pytest.importorskip("scipy.optimize")


def _clustered_costs(rng, G=30, P=200):
    """TransFusion-like cost matrix: cls-score + BEV-L1 + (-IoU) terms.

    GT centers scattered over a 108 m BEV; ~70% of proposals sit within
    a few meters of some GT (heatmap peaks), the rest are background
    guesses. Weights follow the flagship matcher config
    (cls 0.15, reg 0.25, iou 0.25)."""
    gt = rng.uniform(-54, 54, (G, 2)).astype(np.float32)
    n_near = int(0.7 * P)
    owner = rng.randint(0, G, n_near)
    prop = np.concatenate([
        gt[owner] + rng.randn(n_near, 2).astype(np.float32) * 1.5,
        rng.uniform(-54, 54, (P - n_near, 2)).astype(np.float32),
    ])
    l1 = np.abs(gt[:, None] - prop[None]).sum(-1) / 108.0  # normalized
    score = rng.rand(G, P).astype(np.float32)  # per-(gt-class, prop) score
    iou = np.clip(1.0 - l1 * 8.0, 0.0, 1.0) * rng.uniform(0.5, 1.0, (G, P))
    return (0.15 * -score + 0.25 * l1 * 4.0 + 0.25 * -iou).astype(np.float32)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_auction_loss_delta_at_matcher_scale(seed):
    rng = np.random.RandomState(seed)
    G, P = 30, 200
    cost = _clustered_costs(rng, G, P)
    Gpad = 32
    cost_pad = np.zeros((Gpad, P), np.float32)
    cost_pad[:G] = cost
    rv = np.zeros(Gpad, bool)
    rv[:G] = True

    assign = np.asarray(auction_assignment(
        jnp.array(cost_pad), jnp.array(rv), jnp.ones(P, bool)))[:G]
    ri, ci = scipy_opt.linear_sum_assignment(cost)

    # 1. valid one-to-one assignment
    assert (assign >= 0).all()
    assert len(set(assign.tolist())) == G

    # 2. total cost within the documented spread bound of optimal
    got_total = cost[np.arange(G), assign].sum()
    want_total = cost[ri, ci].sum()
    spread = float(cost.max() - cost.min())
    assert got_total <= want_total + 2e-3 * spread * 1.5, (
        got_total, want_total, spread)

    # 3. end effect on the regression loss the train step computes:
    #    simulate per-pair L1 "box residuals" correlated with the cost
    #    (well-matched pairs regress easier); loss delta must be <1%
    resid = np.abs(cost - cost.min())  # proxy: worse pair -> worse loss
    loss_auction = resid[np.arange(G), assign].mean()
    loss_hungarian = resid[ri, ci].mean()
    assert abs(loss_auction - loss_hungarian) <= 0.01 * max(loss_hungarian, 1e-6), (
        loss_auction, loss_hungarian)

    # report agreement for the record (not asserted: distinct optimal
    # solutions exist under ties; cost equality is the contract)
    agree = (assign == ci).mean() if len(ci) == G else 0.0
    print(f"seed {seed}: assignment agreement {agree:.2%}, "
          f"cost delta {got_total - want_total:.2e} (spread {spread:.2f})")

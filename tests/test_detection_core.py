import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bevfusion_tpu.core.coders import CenterPointBBoxCoder, TransFusionBBoxCoder
from bevfusion_tpu.core.matching import auction_assignment
from bevfusion_tpu.ops.iou3d import iou_bev, rotated_overlap_bev
from bevfusion_tpu.ops.nms import circle_nms_mask, nms_bev_mask


def test_rotated_overlap_axis_aligned():
    b1 = jnp.array([[0.0, 0.0, 2.0, 2.0, 0.0]])
    b2 = jnp.array([[1.0, 1.0, 2.0, 2.0, 0.0], [0.0, 0.0, 2.0, 2.0, 0.0],
                    [5.0, 5.0, 2.0, 2.0, 0.0]])
    ov = np.asarray(rotated_overlap_bev(b1, b2))
    np.testing.assert_allclose(ov[0], [1.0, 4.0, 0.0], atol=1e-5)


def test_rotated_overlap_45deg():
    # unit square vs itself rotated 45°: area = 2*(sqrt(2)-1)
    b1 = jnp.array([[0.0, 0.0, 1.0, 1.0, 0.0]])
    b2 = jnp.array([[0.0, 0.0, 1.0, 1.0, np.pi / 4]])
    ov = float(rotated_overlap_bev(b1, b2)[0, 0])
    np.testing.assert_allclose(ov, 2 * (np.sqrt(2) - 1), atol=1e-4)


def test_rotated_overlap_monte_carlo():
    rng = np.random.RandomState(0)
    boxes1 = np.stack([rng.uniform(-1, 1, 8), rng.uniform(-1, 1, 8),
                       rng.uniform(0.5, 2, 8), rng.uniform(0.5, 2, 8),
                       rng.uniform(-np.pi, np.pi, 8)], -1).astype(np.float32)
    boxes2 = np.stack([rng.uniform(-1, 1, 8), rng.uniform(-1, 1, 8),
                       rng.uniform(0.5, 2, 8), rng.uniform(0.5, 2, 8),
                       rng.uniform(-np.pi, np.pi, 8)], -1).astype(np.float32)
    got = np.asarray(rotated_overlap_bev(jnp.array(boxes1), jnp.array(boxes2)))

    pts = rng.uniform(-3, 3, (200000, 2)).astype(np.float32)

    def inside(b):
        d = pts - b[:2]
        c, s = np.cos(b[4]), np.sin(b[4])
        lx = d[:, 0] * c + d[:, 1] * s
        ly = -d[:, 0] * s + d[:, 1] * c
        return (np.abs(lx) <= b[2] / 2) & (np.abs(ly) <= b[3] / 2)

    cell = 36.0 / len(pts)
    for i in range(8):
        mi = inside(boxes1[i])
        for j in range(8):
            mc = float(np.sum(mi & inside(boxes2[j]))) * cell
            assert abs(got[i, j] - mc) < 0.05, (i, j, got[i, j], mc)


def test_circle_nms_matches_reference_alg():
    rng = np.random.RandomState(1)
    N = 50
    centers = rng.uniform(0, 10, (N, 2)).astype(np.float32)
    scores = rng.rand(N).astype(np.float32)
    thresh = 2.0

    # reference algorithm (box3d_nms.py:181-219)
    order = scores.argsort()[::-1]
    suppressed = np.zeros(N, bool)
    keep_ref = np.zeros(N, bool)
    for _i in range(N):
        i = order[_i]
        if suppressed[i]:
            continue
        keep_ref[i] = True
        for _j in range(_i + 1, N):
            j = order[_j]
            if suppressed[j]:
                continue
            if ((centers[i] - centers[j]) ** 2).sum() <= thresh:
                suppressed[j] = True

    got = np.asarray(circle_nms_mask(jnp.array(centers), jnp.array(scores),
                                     jnp.ones(N, bool), thresh))
    np.testing.assert_array_equal(got, keep_ref)


def test_nms_bev_suppresses_duplicates():
    boxes = jnp.array([
        [0.0, 0.0, 2.0, 2.0, 0.0],
        [0.1, 0.0, 2.0, 2.0, 0.0],   # heavy overlap with 0
        [5.0, 5.0, 2.0, 2.0, 0.3],   # isolated
    ])
    scores = jnp.array([0.9, 0.8, 0.7])
    keep = np.asarray(nms_bev_mask(boxes, scores, jnp.ones(3, bool), 0.2))
    np.testing.assert_array_equal(keep, [True, False, True])


def test_auction_matches_scipy():
    from scipy.optimize import linear_sum_assignment

    rng = np.random.RandomState(2)
    for trial in range(5):
        G, P = rng.randint(1, 12), 24
        cost = rng.randn(G, P).astype(np.float32)
        Gpad = 16
        cost_pad = np.zeros((Gpad, P), np.float32)
        cost_pad[:G] = cost
        rv = np.zeros(Gpad, bool)
        rv[:G] = True
        assign = np.asarray(
            auction_assignment(jnp.array(cost_pad), jnp.array(rv), jnp.ones(P, bool))
        )
        ri, ci = linear_sum_assignment(cost)
        want_total = cost[ri, ci].sum()
        got_cols = assign[:G]
        assert (got_cols >= 0).all()
        assert len(set(got_cols.tolist())) == G  # one-to-one
        got_total = cost[np.arange(G), got_cols].sum()
        assert got_total <= want_total + 2e-2, (trial, got_total, want_total)


def test_transfusion_coder_roundtrip():
    coder = TransFusionBBoxCoder(
        pc_range=(-54.0, -54.0), out_size_factor=8, voxel_size=(0.075, 0.075),
        post_center_range=(-61.2, -61.2, -10.0, 61.2, 61.2, 10.0),
        score_threshold=0.0, code_size=10,
    )
    rng = np.random.RandomState(3)
    boxes = np.stack([
        rng.uniform(-50, 50, 6), rng.uniform(-50, 50, 6), rng.uniform(-3, 1, 6),
        rng.uniform(0.5, 4, 6), rng.uniform(0.5, 4, 6), rng.uniform(0.5, 3, 6),
        rng.uniform(-np.pi / 2 + 0.1, np.pi / 2 - 0.1, 6),
        rng.uniform(-2, 2, 6), rng.uniform(-2, 2, 6),
    ], -1).astype(np.float32)
    enc = coder.encode(jnp.array(boxes))
    # decode expects [B, c, P] maps
    e = np.asarray(enc).T[None]  # [1, 10, 6]
    heat = jnp.zeros((1, 10, 6)).at[0, 0].set(0.9)
    out = coder.decode(
        heat,
        jnp.array(e[:, 6:8]), jnp.array(e[:, 3:6]), jnp.array(e[:, 0:2]),
        jnp.array(e[:, 2:3]), jnp.array(e[:, 8:10]), filter=True,
    )
    np.testing.assert_allclose(np.asarray(out["bboxes"][0]), boxes, rtol=1e-4, atol=1e-4)
    assert bool(out["mask"].all())


def test_centerpoint_coder_topk_decode():
    coder = CenterPointBBoxCoder(
        pc_range=(-51.2, -51.2), out_size_factor=8, voxel_size=(0.1, 0.1),
        post_center_range=(-61.2, -61.2, -10.0, 61.2, 61.2, 10.0),
        max_num=4, score_threshold=0.1, code_size=9,
    )
    B, C, H, W = 1, 2, 8, 8
    heat = np.full((B, C, H, W), 0.01, np.float32)
    heat[0, 1, 3, 5] = 0.9  # class 1 at (x-ish row 3, col 5)
    heat[0, 0, 6, 2] = 0.8
    out = coder.decode(
        jnp.array(heat),
        jnp.zeros((B, 1, H, W)), jnp.ones((B, 1, H, W)),
        jnp.zeros((B, 1, H, W)), jnp.zeros((B, 3, H, W)),
        jnp.zeros((B, 2, H, W)), reg=jnp.zeros((B, 2, H, W)),
    )
    lab = np.asarray(out["labels"][0])
    sc = np.asarray(out["scores"][0])
    m = np.asarray(out["mask"][0])
    assert sc[0] == pytest.approx(0.9) and lab[0] == 1
    assert sc[1] == pytest.approx(0.8) and lab[1] == 0
    assert m[:2].all() and not m[2:].any()
    # reference convention: x = flat_idx // W, y = flat_idx % W
    b0 = np.asarray(out["bboxes"][0, 0])
    assert b0[0] == pytest.approx(3 * 8 * 0.1 + -51.2)
    assert b0[1] == pytest.approx(5 * 8 * 0.1 + -51.2)

import jax
import jax.numpy as jnp
import numpy as np

from bevfusion_tpu.models.heads.transfusion import TransFusionHead
from bevfusion_tpu.models.heads.centerpoint import CenterHead


def _tf_head(num_classes=10):
    return TransFusionHead(
        num_proposals=16,
        auxiliary=True,
        in_channels=32,
        hidden_channel=24,
        num_classes=num_classes,
        num_decoder_layers=1,
        num_heads=4,
        nms_kernel_size=3,
        ffn_channel=32,
        dropout=0.0,
        common_heads={"center": (2, 2), "height": (1, 2), "dim": (3, 2),
                      "rot": (2, 2), "vel": (2, 2)},
        train_cfg={
            "dataset": "nuScenes",
            "point_cloud_range": [-54.0, -54.0, -5.0, 54.0, 54.0, 3.0],
            "grid_size": [128, 128, 41],
            "voxel_size": [0.84375, 0.84375, 0.2],
            "out_size_factor": 8,
            "gaussian_overlap": 0.1,
            "min_radius": 2,
            "pos_weight": -1,
            "code_weights": [1.0] * 8 + [0.2, 0.2],
            "assigner": {
                "type": "HungarianAssigner3D",
                "cls_cost": {"type": "FocalLossCost", "gamma": 2.0,
                             "alpha": 0.25, "weight": 0.15},
                "reg_cost": {"type": "BBoxBEVL1Cost", "weight": 0.25},
                "iou_cost": {"type": "IoU3DCost", "weight": 0.25},
            },
        },
        test_cfg={
            "dataset": "nuScenes",
            "grid_size": [128, 128, 41],
            "out_size_factor": 8,
            "voxel_size": [0.84375, 0.84375],
            "pc_range": [-54.0, -54.0],
            "nms_type": None,
        },
        bbox_coder={
            "type": "TransFusionBBoxCoder",
            "pc_range": [-54.0, -54.0],
            "post_center_range": [-61.2, -61.2, -10.0, 61.2, 61.2, 10.0],
            "score_threshold": 0.0,
            "out_size_factor": 8,
            "voxel_size": [0.84375, 0.84375],
            "code_size": 10,
        },
    )


def test_transfusion_forward_loss_and_decode():
    head = _tf_head()
    B, H, W = 2, 16, 16
    feats = jnp.asarray(np.random.RandomState(0).randn(B, H, W, 32), jnp.float32)

    vs = jax.jit(head.init)(jax.random.PRNGKey(0), feats)
    apply = jax.jit(lambda v, f: head.apply(v, f, training=False,
                                            mutable=["batch_stats"]))
    preds, _ = apply(vs, feats)
    assert preds["center"].shape == (B, 16, 2)
    assert preds["heatmap"].shape == (B, 16, 10)
    assert preds["dense_heatmap"].shape == (B, H, W, 10)

    G = 5
    rng = np.random.RandomState(1)
    gt_boxes = np.stack([
        rng.uniform(-40, 40, (B, G)), rng.uniform(-40, 40, (B, G)),
        rng.uniform(-2, 0, (B, G)), rng.uniform(1, 3, (B, G)),
        rng.uniform(1, 3, (B, G)), rng.uniform(1, 2, (B, G)),
        rng.uniform(-1, 1, (B, G)), rng.uniform(-1, 1, (B, G)),
        rng.uniform(-1, 1, (B, G)),
    ], axis=-1).astype(np.float32)
    gt_labels = rng.randint(0, 10, (B, G)).astype(np.int32)
    gt_valid = np.array([[True] * G, [True, True, True, False, False]])

    loss_fn = jax.jit(lambda v, f, b, l, m: head.apply(
        v, f, training=True, mutable=["batch_stats"],
        method=lambda mdl, ff, training: mdl.loss(
            mdl(ff, training=training), jnp.asarray(b), jnp.asarray(l), jnp.asarray(m)
        ),
    ))
    losses, _ = loss_fn(vs, feats, gt_boxes, gt_labels, gt_valid)
    for k in ("loss_heatmap", "layer_-1_loss_cls", "layer_-1_loss_bbox"):
        assert np.isfinite(float(losses[k])), (k, losses[k])

    decode = jax.jit(lambda v, f: head.apply(
        v, f, training=False, mutable=["batch_stats"],
        method=lambda mdl, ff, training: mdl.get_bboxes(mdl(ff, training=training)),
    ))
    out, _ = decode(vs, feats)
    assert out["bboxes"].shape == (B, 16, 9)
    assert out["mask"].dtype == jnp.bool_


def test_centerhead_forward_loss_decode():
    # 2 tasks keep XLA CPU compile time sane; 6-task config is exercised
    # by the integration configs on TPU
    tasks = (("car",), ("pedestrian", "traffic_cone"))
    head = CenterHead(
        in_channels=32,
        tasks=tasks,
        train_cfg={
            "point_cloud_range": [-51.2, -51.2, -5.0, 51.2, 51.2, 3.0],
            "grid_size": [128, 128, 1],
            "voxel_size": [0.8, 0.8, 8],
            "out_size_factor": 8,
            "dense_reg": 1,
            "gaussian_overlap": 0.1,
            "max_objs": 500,
            "min_radius": 2,
            "code_weights": [1.0] * 8 + [0.2, 0.2],
        },
        test_cfg={
            "post_center_limit_range": [-61.2, -61.2, -10.0, 61.2, 61.2, 10.0],
            "max_per_img": 500,
            "min_radius": [4, 0.175],
            "score_threshold": 0.1,
            "out_size_factor": 8,
            "voxel_size": [0.8, 0.8],
            "nms_type": "circle",
            "pre_max_size": 1000,
            "post_max_size": 83,
            "nms_thr": 0.2,
        },
        common_heads={"reg": (2, 2), "height": (1, 2), "dim": (3, 2),
                      "rot": (2, 2), "vel": (2, 2)},
        share_conv_channel=16,
        bbox_coder={
            "type": "CenterPointBBoxCoder",
            "pc_range": [-51.2, -51.2, -5.0, 51.2, 51.2, 3.0],
            "post_center_range": [-61.2, -61.2, -10.0, 61.2, 61.2, 10.0],
            "max_num": 20,
            "score_threshold": 0.1,
            "out_size_factor": 8,
            "voxel_size": [0.8, 0.8],
            "code_size": 9,
        },
        separate_head={"type": "SeparateHead", "init_bias": -2.19, "final_kernel": 3},
        norm_bbox=True,
    )
    B, H, W = 1, 16, 16
    feats = jnp.asarray(np.random.RandomState(0).randn(B, H, W, 32), jnp.float32)
    vs = jax.jit(head.init)(jax.random.PRNGKey(0), feats)
    apply = jax.jit(lambda v, f: head.apply(v, f, training=False,
                                            mutable=["batch_stats"]))
    preds, _ = apply(vs, feats)
    assert len(preds) == 2
    assert preds[0]["heatmap"].shape == (B, H, W, 1)
    assert preds[1]["heatmap"].shape == (B, H, W, 2)

    G = 4
    rng = np.random.RandomState(2)
    gt_boxes = np.stack([
        rng.uniform(-40, 40, (B, G)), rng.uniform(-40, 40, (B, G)),
        rng.uniform(-2, 0, (B, G)), rng.uniform(1, 3, (B, G)),
        rng.uniform(1, 3, (B, G)), rng.uniform(1, 2, (B, G)),
        rng.uniform(-1, 1, (B, G)), rng.uniform(-1, 1, (B, G)),
        rng.uniform(-1, 1, (B, G)),
    ], axis=-1).astype(np.float32)
    gt_labels = rng.randint(0, 3, (B, G)).astype(np.int32)
    gt_valid = np.ones((B, G), bool)

    loss_fn = jax.jit(lambda v, f, b, l, m: head.apply(
        v, f, training=True, mutable=["batch_stats"],
        method=lambda mdl, ff, training: mdl.loss(
            mdl(ff, training=training), jnp.asarray(b), jnp.asarray(l), jnp.asarray(m)
        ),
    ))
    losses, _ = loss_fn(vs, feats, gt_boxes, gt_labels, gt_valid)
    assert len(losses) == 4
    assert all(np.isfinite(float(v)) for v in losses.values())

    decode = jax.jit(lambda v, f: head.apply(
        v, f, training=False, mutable=["batch_stats"],
        method=lambda mdl, ff, training: mdl.get_bboxes(mdl(ff, training=training)),
    ))
    out, _ = decode(vs, feats)
    assert out["bboxes"].shape == (B, 2 * 20, 9)
    assert int(out["labels"].max()) <= 2


def test_gaussian_focal_loss_saturated_bf16_pred_finite_under_jit():
    """Regression: XLA reassociates (1 - pred) + eps into (1 + eps) - pred
    under jit, absorbing the eps guard; with bf16 clip_sigmoid the upper
    clamp 1 - 1e-4 rounds to exactly 1.0, so log(1 - pred) hit -inf and
    the heatmap loss went inf at flagship/half scale (found by
    tools/dryrun_flagship_sharded.py). The guard is now max(., eps)
    inside the log and clip_sigmoid computes in f32."""
    import jax
    import jax.numpy as jnp

    from bevfusion_tpu.models.losses import clip_sigmoid, gaussian_focal_loss

    # bf16 logits large enough to saturate sigmoid on both sides
    logits = jnp.asarray([[30.0, -30.0, 0.0, 11.8]], jnp.bfloat16)
    pred = clip_sigmoid(logits)
    assert float(pred.max()) < 1.0

    # even with pred exactly 1.0 the jitted loss must stay finite
    hard_pred = jnp.asarray([[1.0, 0.0, 0.5, 1.0]], jnp.float32)
    target = jnp.asarray([[1.0, 0.0, 0.3, 0.0]], jnp.float32)
    loss = jax.jit(gaussian_focal_loss)(hard_pred, target, avg_factor=1.0)
    assert np.isfinite(float(loss))
    loss2 = jax.jit(gaussian_focal_loss)(clip_sigmoid(logits), target,
                                         avg_factor=1.0)
    assert np.isfinite(float(loss2))

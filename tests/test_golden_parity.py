"""Golden module-level parity vs independent torch implementations
(VERDICT r1 item 5): same weights (through the checkpoint adapter),
same inputs, independent math.

This is the accuracy evidence obtainable without the dataset: the torch
side re-implements the reference module semantics in plain torch
(tests/torch_ref/), weights flow through runtime/adapter.py exactly as
released checkpoints would, and outputs must agree to float tolerance.
A failure localizes to either the adapter's layout rules or the
module's numerics.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp

from bevfusion_tpu.runtime.adapter import load_reference_weights


@pytest.mark.slow
def test_sparse_encoder_golden_vs_torch():
    """SparseEncoder vs spconv-semantics torch forward
    (mmdet3d/models/backbones/sparse_encoder.py:100-132)."""
    from tests.torch_ref.skeleton import SparseEncoderSkeleton
    from tests.torch_ref.sparse_encoder_fwd import sparse_encoder_forward
    from bevfusion_tpu.models.sparse_encoder import SparseEncoder

    torch.manual_seed(0)
    rng = np.random.RandomState(0)
    grid = (16, 16, 8)
    channels = ((16, 16, 32), (32, 32))

    skel = SparseEncoderSkeleton(in_channels=5, base=16, channels=channels,
                                 output_channels=64).eval()
    # randomize BN stats so eval-mode normalization is non-trivial
    for m in skel.modules():
        if isinstance(m, torch.nn.BatchNorm1d):
            m.running_mean.normal_(0, 0.2)
            m.running_var.uniform_(0.5, 1.5)
            m.weight.data.normal_(1.0, 0.2)
            m.bias.data.normal_(0, 0.2)
    sd = {f"encoders.lidar.backbone.{k}": v for k, v in
          skel.state_dict().items()}

    # sites + features
    N = 180
    ids = np.unique(rng.randint(0, np.prod(grid), 3 * N))[:N]
    coords = np.stack([ids // (grid[1] * grid[2]),
                       (ids // grid[2]) % grid[1],
                       ids % grid[2]], 1).astype(np.int32)
    feats = rng.randn(len(ids), 5).astype(np.float32)

    want = sparse_encoder_forward(
        skel, torch.from_numpy(feats), torch.from_numpy(coords), grid
    ).detach().numpy()

    # our encoder, same weights via the adapter
    cap = 256
    model = SparseEncoder(
        in_channels=5, sparse_shape=grid, base_channels=16,
        output_channels=64, encoder_channels=channels,
        encoder_paddings=((0, 0, 1), (0, 0)), block_type="basicblock",
        site_caps=[1024], dense_from_stage=-1, engine="gather",
        dtype=jnp.float32)

    cbuf = np.zeros((1, cap, 3), np.int32)
    fbuf = np.zeros((1, cap, 5), np.float32)
    mbuf = np.zeros((1, cap), bool)
    cbuf[0, : len(ids)] = coords
    fbuf[0, : len(ids)] = feats
    mbuf[0, : len(ids)] = True

    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(fbuf),
                           jnp.asarray(cbuf), jnp.asarray(mbuf),
                           training=False)
    variables = jax.tree_util.tree_map(np.asarray, variables)
    # standalone module: wrap under the fusion model's submodule name so
    # the adapter's full-tree rules apply
    wrapped = {c: {"lidar_backbone": dict(variables[c])} for c in variables}
    new_vars, report = load_reference_weights(wrapped, sd, strict=True)

    got = model.apply(
        {"params": new_vars["params"]["lidar_backbone"],
         "batch_stats": new_vars["batch_stats"]["lidar_backbone"]},
        jnp.asarray(fbuf), jnp.asarray(cbuf), jnp.asarray(mbuf),
        training=False)
    got = np.asarray(got)[0]

    assert got.shape == want.shape, (got.shape, want.shape)
    err = np.max(np.abs(got - want))
    scale = np.max(np.abs(want))
    # 7 convs of f32 accumulation-order differences + ReLU cliffs leave
    # ~1e-3 relative worst-case; mean error is an order tighter
    assert err <= 2.5e-3 * max(scale, 1.0), (err, scale)
    mean_err = np.mean(np.abs(got - want))
    assert mean_err <= 2e-4 * max(scale, 1.0), (mean_err, scale)
# appended to tests/test_golden_parity.py


@pytest.mark.slow
def test_transfusion_decoder_layer_golden_vs_torch():
    """TransformerDecoderLayer (self+cross attn + FFN + learned pos
    embeddings) vs the reference forward in plain torch
    (mmdet3d/models/utils/transformer.py:33-112), weights through the
    adapter's packed-MHA / posembed-conv1d rules."""
    import torch.nn.functional as TF
    from tests.torch_ref.skeleton import DecoderLayerSkeleton
    from bevfusion_tpu.models.heads.transformer import TransformerDecoderLayer

    torch.manual_seed(1)
    rng = np.random.RandomState(1)
    d, heads, P, K, B = 128, 8, 12, 40, 2
    skel = DecoderLayerSkeleton(d=d, heads=heads, ff=256).eval()
    for m in skel.modules():
        if isinstance(m, torch.nn.BatchNorm1d):
            m.running_mean.normal_(0, 0.2)
            m.running_var.uniform_(0.5, 1.5)
    sd = {f"heads.object.decoder.0.{k}": v for k, v in skel.state_dict().items()}

    q = rng.randn(B, P, d).astype(np.float32)
    k = rng.randn(B, K, d).astype(np.float32)
    qp = rng.randn(B, P, 2).astype(np.float32)
    kp = rng.randn(B, K, 2).astype(np.float32)

    # reference forward (transformer.py:71-112), batch-first tensors
    with torch.no_grad():
        tq = torch.from_numpy(q).permute(0, 2, 1)   # B C P
        tk = torch.from_numpy(k).permute(0, 2, 1)
        qe = skel.self_posembed.position_embedding_head(
            torch.from_numpy(qp).transpose(1, 2)).permute(2, 0, 1)
        ke = skel.cross_posembed.position_embedding_head(
            torch.from_numpy(kp).transpose(1, 2)).permute(2, 0, 1)
        query = tq.permute(2, 0, 1)  # P B C
        key = tk.permute(2, 0, 1)
        qkv = query + qe
        q2 = skel.self_attn(qkv, qkv, qkv)[0]
        query = skel.norm1(query + q2)
        q2 = skel.multihead_attn(query + qe, key + ke, key + ke)[0]
        query = skel.norm2(query + q2)
        q2 = skel.linear2(TF.relu(skel.linear1(query)))
        query = skel.norm3(query + q2)
        want = query.permute(1, 0, 2).numpy()  # B P C

    model = TransformerDecoderLayer(d_model=d, num_heads=heads,
                                    dim_feedforward=256, dropout=0.0,
                                    dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(q),
                           jnp.asarray(k), jnp.asarray(qp), jnp.asarray(kp))
    variables = jax.tree_util.tree_map(np.asarray, variables)
    wrapped = {c: {"head_modules_object": {"decoder0": dict(variables[c])}}
               for c in variables}
    new_vars, report = load_reference_weights(wrapped, sd, strict=True)

    got = model.apply(
        {c: new_vars[c]["head_modules_object"]["decoder0"] for c in new_vars},
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(qp), jnp.asarray(kp))
    got = np.asarray(got)

    err = np.max(np.abs(got - want))
    scale = np.max(np.abs(want))
    assert err <= 1e-3 * max(scale, 1.0), (err, scale)
# appended to tests/test_golden_parity.py


@pytest.mark.slow
def test_depth_lss_transform_golden_vs_torch():
    """DepthLSSTransform vs plain-torch reference math
    (mmdet3d/models/vtransforms/depth_lss.py:38-102 + base.py:140-176):
    dtransform/depthnet CNNs, softmax-depth (x) context outer product,
    BEV scatter-sum, stride-2 downsample — weights through the adapter.
    The sparse-depth rasterization and cell-id geometry (separately
    oracle-tested) are shared inputs to both sides."""
    import torch.nn.functional as TF
    from tests.torch_ref.skeleton import DepthLSSSkeleton
    from bevfusion_tpu.models.vtransforms import (DepthLSSTransform,
                                                  get_geometry,
                                                  rasterize_depth)
    from bevfusion_tpu.ops.bev_pool import cell_ids_from_geometry
    from bevfusion_tpu.ops.grid import create_frustum, gen_dx_bx

    torch.manual_seed(2)
    rng = np.random.RandomState(2)
    B, N, Cin, C = 1, 2, 32, 8
    image_size, feature_size = (32, 64), (4, 8)
    dbound = (1.0, 9.0, 0.5)  # D = 16
    xbound = ybound = (-4.0, 4.0, 0.5)
    zbound = (-10.0, 10.0, 20.0)
    D = 16

    skel = DepthLSSSkeleton(in_channels=Cin, out_channels=C, D=D).eval()
    for m in skel.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.2)
            m.running_var.uniform_(0.5, 1.5)
    sd = {f"encoders.camera.vtransform.{k}": v
          for k, v in skel.state_dict().items()}

    img_feats = rng.randn(B, N, *feature_size, Cin).astype(np.float32) * 0.5
    pts = np.concatenate([
        rng.uniform(-4, 4, (B, 200, 2)), rng.uniform(-1, 1, (B, 200, 1)),
        rng.rand(B, 200, 2)], -1).astype(np.float32)
    pmask = np.ones((B, 200), bool)
    from bevfusion_tpu.runtime.flagship import synthetic_calibration
    mats = {k: jnp.asarray(v) for k, v in
            synthetic_calibration(B, N, image_size).items()}

    model = DepthLSSTransform(
        in_channels=Cin, out_channels=C, image_size=image_size,
        feature_size=feature_size, xbound=xbound, ybound=ybound,
        zbound=zbound, dbound=dbound, downsample=2, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(img_feats),
                           jnp.asarray(pts), jnp.asarray(pmask), mats)
    variables = jax.tree_util.tree_map(np.asarray, variables)
    wrapped = {c: {"camera_vtransform": dict(variables[c])} for c in variables}
    new_vars, report = load_reference_weights(wrapped, sd, strict=True)
    got = model.apply(
        {c: new_vars[c]["camera_vtransform"] for c in new_vars},
        jnp.asarray(img_feats), jnp.asarray(pts), jnp.asarray(pmask), mats)
    got = np.asarray(got)

    # ---- torch reference math on the same inputs -----------------------
    d_in = np.asarray(rasterize_depth(
        jnp.asarray(pts), jnp.asarray(pmask), mats["lidar2image"],
        mats["img_aug_matrix"], mats["lidar_aug_matrix"], image_size))
    with torch.no_grad():
        dt = torch.from_numpy(d_in.reshape(B * N, *image_size, 1)
                              ).permute(0, 3, 1, 2)
        dt = skel.dtransform(dt)
        xt = torch.from_numpy(
            img_feats.reshape(B * N, *feature_size, Cin)).permute(0, 3, 1, 2)
        xt = torch.cat([dt, xt], dim=1)
        xt = skel.depthnet(xt)
        depth_t = torch.softmax(xt[:, :D], dim=1)
        ctx_t = xt[:, D:]

        frustum = create_frustum(image_size, feature_size, dbound)
        geom = get_geometry(jnp.asarray(frustum), mats["camera2lidar"],
                            mats["camera_intrinsics"][..., :3, :3],
                            mats["img_aug_matrix"], mats["lidar_aug_matrix"])
        dx, bx, nx = gen_dx_bx(xbound, ybound, zbound)
        ids, valid = cell_ids_from_geometry(
            geom, jnp.asarray(dx), jnp.asarray(bx), nx)
        X, Y, Z = int(nx[0]), int(nx[1]), int(nx[2])
        ids_n = np.asarray(ids).reshape(-1)
        valid_n = np.asarray(valid).reshape(-1)
        fH, fW = feature_size
        dep = depth_t.reshape(B, N, D, fH, fW).numpy().reshape(-1)
        ctx = (ctx_t.permute(0, 2, 3, 1).reshape(B, N, 1, fH, fW, C)
               .expand(B, N, D, fH, fW, C).numpy().reshape(-1, C))
        bev = np.zeros((X * Y * Z, C), np.float64)
        np.add.at(bev, ids_n[valid_n], dep[valid_n, None] * ctx[valid_n])
        bev = bev.reshape(X, Y, Z * C)  # Z == 1
        bt = torch.from_numpy(bev[None].astype(np.float32)).permute(0, 3, 1, 2)
        bt = skel.downsample(bt)
        want = bt.permute(0, 2, 3, 1).numpy()[0]

    err = np.max(np.abs(got[0] - want))
    scale = np.max(np.abs(want))
    assert got[0].shape == want.shape
    assert err <= 2e-3 * max(scale, 1.0), (err, scale)
# appended (round 3): decode-chain golden parity


@pytest.mark.slow
def test_transfusion_head_forward_and_decode_golden_vs_torch():
    """Full TransFusionHead chain vs plain-torch reference semantics
    (mmdet3d/models/heads/bbox/transfusion.py:215-341 forward_single,
    :715-851 get_bboxes; coder transfusion_bbox_coder.py:39-121;
    circle_nms box3d_nms.py:181-219): heatmap pool-NMS + class
    exemptions, top-P query selection, decoder layer, FFN branches,
    coder decode, per-task circle-NMS — weights through the adapter."""
    from tests.torch_ref.skeleton import TransFusionHeadSkeleton
    from tests.torch_ref import transfusion_fwd as TFW
    from bevfusion_tpu.models.heads.transfusion import TransFusionHead

    torch.manual_seed(3)
    rng = np.random.RandomState(3)
    B, Cin, H, W = 1, 64, 32, 32
    P, ncls, d = 64, 10, 128

    skel = TransFusionHeadSkeleton(cin=Cin, hidden=64, d=d,
                                   num_classes=ncls).eval()
    for m in skel.modules():
        if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
            m.running_mean.normal_(0, 0.2)
            m.running_var.uniform_(0.5, 1.5)
            m.weight.data.normal_(1.0, 0.2)
            m.bias.data.normal_(0, 0.2)
    sd = {f"heads.object.{k}": v for k, v in skel.state_dict().items()}

    feats = rng.randn(B, H, W, Cin).astype(np.float32) * 0.5

    coder_cfg = dict(pc_range=[-8.0, -8.0], out_size_factor=1,
                     voxel_size=[0.5, 0.5],
                     post_center_range=[-10.0, -10.0, -10.0, 10.0, 10.0, 10.0],
                     score_threshold=0.0, code_size=10)
    model = TransFusionHead(
        num_proposals=P, auxiliary=True, in_channels=Cin, hidden_channel=d,
        num_classes=ncls, num_decoder_layers=1, num_heads=8,
        nms_kernel_size=3, ffn_channel=256, dropout=0.0,
        common_heads=dict(center=(2, 2), height=(1, 2), dim=(3, 2),
                          rot=(2, 2), vel=(2, 2)),
        bbox_coder=dict(type="TransFusionBBoxCoder", **coder_cfg),
        test_cfg=dict(dataset="nuScenes", nms_type="circle"),
        dtype=jnp.float32)

    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(feats),
                           training=False)
    variables = jax.tree_util.tree_map(np.asarray, variables)
    wrapped = {c: {"head_modules_object": dict(variables[c])}
               for c in variables}
    from bevfusion_tpu.runtime.adapter import load_reference_weights
    new_vars, report = load_reference_weights(wrapped, sd, strict=True)
    vars2 = {c: new_vars[c]["head_modules_object"] for c in new_vars}

    preds = model.apply(vars2, jnp.asarray(feats), training=False)

    # ---- torch reference forward --------------------------------------
    with torch.no_grad():
        t_feats = torch.from_numpy(feats).permute(0, 3, 1, 2)
        t_preds, t_qlabels = TFW.transfusion_forward(
            skel, t_feats, num_proposals=P, num_classes=ncls,
            nms_kernel_size=3, dataset="nuScenes")

    assert np.array_equal(np.asarray(preds["query_labels"]),
                          t_qlabels.numpy()), "query class selection differs"

    # branch outputs: ours [B, P, c] vs torch [B, c, P]
    for k in ("center", "height", "dim", "rot", "vel", "heatmap"):
        got = np.asarray(preds[k])
        want = t_preds[k].numpy().transpose(0, 2, 1)
        err = np.max(np.abs(got - want))
        scale = max(np.max(np.abs(want)), 1.0)
        assert err <= 2e-3 * scale, (k, err, scale)
    got_dense = np.asarray(preds["dense_heatmap"])  # [B, H, W, ncls]
    want_dense = t_preds["dense_heatmap"].numpy().transpose(0, 2, 3, 1)
    assert np.max(np.abs(got_dense - want_dense)) <= 2e-3

    # ---- decode + NMS -------------------------------------------------
    out = model.apply(vars2, preds, method=TransFusionHead.get_bboxes)
    m = np.asarray(out["mask"])[0]
    got_boxes = np.asarray(out["bboxes"])[0][m]
    got_scores = np.asarray(out["scores"])[0][m]
    got_labels = np.asarray(out["labels"])[0][m]

    with torch.no_grad():
        (want_boxes, want_scores, want_labels), = TFW.get_bboxes(
            t_preds, t_qlabels, num_proposals=P, num_classes=ncls,
            coder_kwargs=coder_cfg, dataset="nuScenes", nms_type="circle")

    assert got_boxes.shape[0] == want_boxes.shape[0], (
        got_boxes.shape, want_boxes.shape)
    go = np.argsort(-got_scores, kind="stable")
    wo = np.argsort(-want_scores, kind="stable")
    assert np.array_equal(got_labels[go], want_labels[wo])
    assert np.max(np.abs(got_scores[go] - want_scores[wo])) <= 2e-3
    err = np.max(np.abs(got_boxes[go] - want_boxes[wo]))
    scale = max(np.max(np.abs(want_boxes)), 1.0)
    assert err <= 3e-3 * scale, (err, scale)


@pytest.mark.slow
def test_centerhead_forward_and_decode_golden_vs_torch():
    """CenterHead chain vs plain-torch reference semantics
    (mmdet3d/models/heads/bbox/centerpoint.py:19-127 SeparateHead,
    :248-354 forward, :636-884 get_bboxes + rotate NMS; coder
    centerpoint_bbox_coders.py:62-230): shared conv, per-task branches,
    _topk, decode, score threshold, per-class nms_scale, rotated NMS,
    post_center mask, task merge — weights through the adapter. The
    pairwise rotated IoU itself is the repo's Monte-Carlo-validated
    iou_bev (test_detection_core.py); this test verifies the chain."""
    from tests.torch_ref.skeleton import CenterHeadSkeleton
    from tests.torch_ref import centerpoint_fwd as CPF
    from bevfusion_tpu.models.heads.centerpoint import CenterHead
    from bevfusion_tpu.ops.iou3d import iou_bev

    torch.manual_seed(4)
    rng = np.random.RandomState(4)
    B, Cin, H, W = 1, 32, 32, 32
    tasks = (("car",), ("truck", "cv"), ("ped", "tc"))
    task_classes = tuple(len(t) for t in tasks)
    common = dict(reg=(2, 2), height=(1, 2), dim=(3, 2), rot=(2, 2),
                  vel=(2, 2))

    skel = CenterHeadSkeleton(cin=Cin, share=64, task_classes=task_classes,
                              common=common, final_kernel=3).eval()
    for m in skel.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.2)
            m.running_var.uniform_(0.5, 1.5)
            m.weight.data.normal_(1.0, 0.2)
            m.bias.data.normal_(0, 0.2)
    sd = {f"heads.object.{k}": v for k, v in skel.state_dict().items()}

    feats = rng.randn(B, H, W, Cin).astype(np.float32) * 0.5

    coder_cfg = dict(pc_range=[-8.0, -8.0, -5.0, 8.0, 8.0, 3.0],
                     out_size_factor=1, voxel_size=[0.5, 0.5],
                     post_center_range=[-10.0, -10.0, -10.0, 10.0, 10.0, 10.0],
                     max_num=50, score_threshold=None, code_size=9)
    test_cfg = dict(post_center_limit_range=[-10.0, -10.0, -10.0,
                                             10.0, 10.0, 10.0],
                    score_threshold=0.1, nms_type="rotate", nms_thr=0.2,
                    pre_max_size=1000, post_max_size=83,
                    nms_scale=[[1.0], [1.0, 0.8], [0.9, 1.1]])

    model = CenterHead(
        in_channels=Cin, tasks=tasks, common_heads=common,
        share_conv_channel=64,
        separate_head=dict(type="SeparateHead", final_kernel=3,
                           head_conv=64, init_bias=-2.19),
        bbox_coder=dict(type="CenterPointBBoxCoder", **coder_cfg),
        test_cfg=test_cfg, norm_bbox=True, dtype=jnp.float32)

    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(feats),
                           training=False)
    variables = jax.tree_util.tree_map(np.asarray, variables)
    wrapped = {c: {"head_modules_object": dict(variables[c])}
               for c in variables}
    from bevfusion_tpu.runtime.adapter import load_reference_weights
    new_vars, report = load_reference_weights(wrapped, sd, strict=True)
    vars2 = {c: new_vars[c]["head_modules_object"] for c in new_vars}

    preds = model.apply(vars2, jnp.asarray(feats), training=False)

    with torch.no_grad():
        t_feats = torch.from_numpy(feats).transpose(1, 3).transpose(2, 3)
        t_preds = CPF.center_head_forward(skel, t_feats.contiguous())

    # per-task map parity: ours NHWC, torch NCHW
    for t in range(len(tasks)):
        for k in ("reg", "height", "dim", "rot", "vel", "heatmap"):
            got = np.asarray(preds[t][k])
            want = t_preds[t][k].numpy().transpose(0, 2, 3, 1)
            err = np.max(np.abs(got - want))
            scale = max(np.max(np.abs(want)), 1.0)
            assert err <= 2e-3 * scale, (t, k, err, scale)

    # ---- decode + rotate NMS chain ------------------------------------
    out = model.apply(vars2, preds, method=CenterHead.get_bboxes)
    m = np.asarray(out["mask"])[0]
    got_boxes = np.asarray(out["bboxes"])[0][m]
    got_scores = np.asarray(out["scores"])[0][m]
    got_labels = np.asarray(out["labels"])[0][m]

    iou_fn = lambda a, b: np.asarray(iou_bev(jnp.asarray(a), jnp.asarray(b)))
    with torch.no_grad():
        (want_boxes, want_scores, want_labels), = CPF.get_bboxes_rotate(
            t_preds, task_classes,
            coder_cfg=dict(max_num=50, out_size_factor=1,
                           voxel_size=[0.5, 0.5], pc_range=[-8.0, -8.0],
                           post_center_range=coder_cfg["post_center_range"],
                           score_threshold=None),
            test_cfg=test_cfg, iou_fn=iou_fn)

    assert got_boxes.shape[0] == want_boxes.shape[0], (
        got_boxes.shape, want_boxes.shape)
    go = np.argsort(-got_scores, kind="stable")
    wo = np.argsort(-want_scores, kind="stable")
    assert np.array_equal(got_labels[go], want_labels[wo])
    assert np.max(np.abs(got_scores[go] - want_scores[wo])) <= 2e-3
    err = np.max(np.abs(got_boxes[go] - want_boxes[wo]))
    scale = max(np.max(np.abs(want_boxes)), 1.0)
    assert err <= 3e-3 * scale, (err, scale)

"""Plain-torch TransFusionHead forward + decode oracle.

Re-implements the reference semantics with the TransFusionHeadSkeleton
parameters (tests/torch_ref/skeleton.py):
  forward_single  mmdet3d/models/heads/bbox/transfusion.py:215-341
  decoder layer   mmdet3d/models/utils/transformer.py:71-112
  coder decode    mmdet3d/core/bbox/coders/transfusion_bbox_coder.py:39-121
  circle_nms      mmdet3d/core/post_processing/box3d_nms.py:181-219
  get_bboxes      mmdet3d/models/heads/bbox/transfusion.py:715-851
No mmcv/mmdet imports — only torch + numpy.
"""
import numpy as np
import torch
import torch.nn.functional as F


def create_2D_grid(x_size, y_size):
    """transfusion.py:173-182 (+0.5 cell centers, x-major rows)."""
    xs = torch.linspace(0, x_size - 1, x_size)
    ys = torch.linspace(0, y_size - 1, y_size)
    bx, by = torch.meshgrid(xs, ys, indexing="ij")
    coord = torch.stack([bx + 0.5, by + 0.5], dim=0)[None]  # [1,2,X,Y]
    return coord.view(1, 2, -1).permute(0, 2, 1)  # [1, X*Y, 2]


def decoder_layer_forward(layer, query, key, query_pos, key_pos):
    """transformer.py:71-112. query [B,C,P]; key [B,C,K];
    *_pos [B,P/K,2]. Returns [B,C,P]."""
    qe = layer.self_posembed.position_embedding_head(
        query_pos.transpose(1, 2)).permute(2, 0, 1)  # [P,B,C]
    ke = layer.cross_posembed.position_embedding_head(
        key_pos.transpose(1, 2)).permute(2, 0, 1)
    q = query.permute(2, 0, 1)  # [P,B,C]
    k = key.permute(2, 0, 1)
    qkv = q + qe
    q2 = layer.self_attn(qkv, qkv, qkv)[0]
    q = layer.norm1(q + q2)
    q2 = layer.multihead_attn(q + qe, k + ke, k + ke)[0]
    q = layer.norm2(q + q2)
    q2 = layer.linear2(F.relu(layer.linear1(q)))
    q = layer.norm3(q + q2)
    return q.permute(1, 2, 0)  # [B,C,P]


def prediction_head_forward(ph, x):
    """FFN prediction branches (transfusion.py FFN/:496-575): each is
    Conv1d(d->hidden) + BN + ReLU + Conv1d(hidden->out) on [B,C,P]."""
    return {name: mod(x) for name, mod in ph.named_children()}


def transfusion_forward(skel, feats, num_proposals, num_classes,
                        nms_kernel_size=3, dataset="nuScenes"):
    """feats [B, Cin, H, W] -> (preds dict channel-first [B,c,P_total],
    query_labels [B, P]). Auxiliary=True concat over decoder layers."""
    B, _, H, W = feats.shape
    P = num_proposals
    lidar_feat = skel.shared_conv(feats)
    C = lidar_feat.shape[1]
    flat = lidar_feat.view(B, C, H * W)
    bev_pos = create_2D_grid(H, W).repeat(B, 1, 1)

    # heatmap_head = ConvModule (param-only skeleton: conv+bn, ReLU) + Conv2d
    cm = skel.heatmap_head[0]
    dense_heatmap = skel.heatmap_head[1](F.relu(cm.bn(cm.conv(lidar_feat))))
    heatmap = dense_heatmap.detach().sigmoid()
    padding = nms_kernel_size // 2
    local_max = torch.zeros_like(heatmap)
    inner = F.max_pool2d(heatmap, kernel_size=nms_kernel_size, stride=1,
                         padding=0)
    local_max[:, :, padding:(-padding), padding:(-padding)] = inner
    if dataset == "nuScenes" and num_classes >= 10:
        local_max[:, 8] = heatmap[:, 8]
        local_max[:, 9] = heatmap[:, 9]
    heatmap = heatmap * (heatmap == local_max)
    heatmap = heatmap.view(B, num_classes, -1)

    top = heatmap.reshape(B, -1).argsort(dim=-1, descending=True)[..., :P]
    top_cls = top // heatmap.shape[-1]
    top_idx = top % heatmap.shape[-1]
    query_feat = flat.gather(
        index=top_idx[:, None, :].expand(-1, C, -1), dim=-1)
    one_hot = F.one_hot(top_cls, num_classes=num_classes).permute(0, 2, 1)
    query_feat = query_feat + skel.class_encoding(one_hot.float())
    query_pos = bev_pos.gather(
        index=top_idx[:, None, :].permute(0, 2, 1).expand(-1, -1, 2), dim=1)

    ret_dicts = []
    n_layers = len(skel.decoder)
    for i in range(n_layers):
        query_feat = decoder_layer_forward(
            skel.decoder[i], query_feat, flat, query_pos, bev_pos)
        res = prediction_head_forward(skel.prediction_heads[i], query_feat)
        res["center"] = res["center"] + query_pos.permute(0, 2, 1)
        ret_dicts.append(res)
        query_pos = res["center"].detach().clone().permute(0, 2, 1)

    preds = {k: torch.cat([r[k] for r in ret_dicts], dim=-1)
             for k in ret_dicts[0]}
    preds["query_heatmap_score"] = heatmap.gather(
        index=top_idx[:, None, :].expand(-1, num_classes, -1), dim=-1)
    preds["dense_heatmap"] = dense_heatmap
    return preds, top_cls


def coder_decode(heatmap, rot, dim, center, height, vel, pc_range,
                 out_size_factor, voxel_size, post_center_range,
                 score_threshold=None, code_size=10):
    """transfusion_bbox_coder.py:39-121 with filter=True, but returning
    the full set + validity mask (static-shape form) instead of boolean
    indexing. All inputs [B, c, P] channel-first torch tensors."""
    final_preds = heatmap.max(1).indices
    final_scores = heatmap.max(1).values
    center = center.clone()
    dim = dim.clone()
    center[:, 0] = center[:, 0] * out_size_factor * voxel_size[0] + pc_range[0]
    center[:, 1] = center[:, 1] * out_size_factor * voxel_size[1] + pc_range[1]
    dim = dim.exp()
    height = height - dim[:, 2:3] * 0.5
    rot = torch.atan2(rot[:, 0:1], rot[:, 1:2])
    parts = [center, height, dim, rot] + ([vel] if vel is not None else [])
    boxes = torch.cat(parts, dim=1).permute(0, 2, 1)  # [B, P, 7/9]
    pcr = torch.tensor(post_center_range)
    mask = ((boxes[..., :3] >= pcr[:3]).all(-1)
            & (boxes[..., :3] <= pcr[3:]).all(-1))
    if score_threshold is not None:
        mask = mask & (final_scores > score_threshold)
    return boxes, final_scores, final_preds, mask


def circle_nms(dets, thresh, post_max_size=83):
    """box3d_nms.py:181-219 (numpy; thresh compares squared distance)."""
    x1, y1, scores = dets[:, 0], dets[:, 1], dets[:, 2]
    order = scores.argsort()[::-1].astype(np.int32)
    suppressed = np.zeros((dets.shape[0],), np.int32)
    keep = []
    for _i in range(dets.shape[0]):
        i = order[_i]
        if suppressed[i]:
            continue
        keep.append(i)
        for _j in range(_i + 1, dets.shape[0]):
            j = order[_j]
            if suppressed[j]:
                continue
            if (x1[i] - x1[j]) ** 2 + (y1[i] - y1[j]) ** 2 <= thresh:
                suppressed[j] = 1
    return keep[:post_max_size]


def get_bboxes(preds, query_labels, num_proposals, num_classes, coder_kwargs,
               dataset="nuScenes", nms_type="circle"):
    """transfusion.py:715-851 eval decode for one layer's outputs.
    Returns per-sample (boxes [n,9], scores [n], labels [n]) AFTER the
    keep mask (dynamic shapes — it's the oracle)."""
    P = num_proposals
    score = preds["heatmap"][..., -P:].sigmoid()
    one_hot = F.one_hot(query_labels, num_classes=num_classes).permute(0, 2, 1)
    score = score * preds["query_heatmap_score"] * one_hot

    boxes, scores, labels, mask = coder_decode(
        score, preds["rot"][..., -P:], preds["dim"][..., -P:],
        preds["center"][..., -P:], preds["height"][..., -P:],
        preds["vel"][..., -P:] if "vel" in preds else None, **coder_kwargs)

    if dataset == "nuScenes":
        tasks = [dict(indices=[0, 1, 2, 3, 4, 5, 6, 7], radius=-1),
                 dict(indices=[8], radius=0.175),
                 dict(indices=[9], radius=0.175)]
    else:
        raise ValueError(dataset)

    out = []
    for b in range(boxes.shape[0]):
        bb = boxes[b][mask[b]].numpy()
        ss = scores[b][mask[b]].numpy()
        ll = labels[b][mask[b]].numpy()
        if nms_type is None:
            out.append((bb, ss, ll))
            continue
        keep_mask = np.zeros_like(ss)
        for task in tasks:
            task_mask = np.zeros_like(ss, bool)
            for ci in task["indices"]:
                task_mask |= ll == ci
            if task["radius"] > 0:
                assert nms_type == "circle"
                dets = np.concatenate(
                    [bb[task_mask][:, :2], ss[task_mask][:, None]], 1)
                task_keep = np.asarray(circle_nms(dets, task["radius"]),
                                       np.int64)
            else:
                task_keep = np.arange(task_mask.sum())
            if task_keep.shape[0] != 0:
                keep_idx = np.where(task_mask)[0][task_keep]
                keep_mask[keep_idx] = 1
        k = keep_mask.astype(bool)
        out.append((bb[k], ss[k], ll[k]))
    return out

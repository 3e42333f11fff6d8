"""Plain-torch CenterHead forward + decode oracle.

Reference semantics:
  SeparateHead/CenterHead forward  mmdet3d/models/heads/bbox/centerpoint.py:102-127,92-107
  CenterPointBBoxCoder _topk/decode  mmdet3d/core/bbox/coders/centerpoint_bbox_coders.py:62-230
  get_bboxes (rotate path)  centerpoint.py:636-884
No mmcv imports; the rotated-IoU pairwise function is injected (tests
pass the repo's Monte-Carlo-validated iou_bev) so the oracle checks the
NMS *chain* semantics (ordering, thresholds, pre/post caps, scaling).
"""
import numpy as np
import torch
import torch.nn.functional as F


def conv_module_forward(m, x):
    return F.relu(m.bn(m.conv(x)))


def center_head_forward(skel, feats):
    """feats [B, Cin, H, W] -> list of per-task dicts [B, c, H, W]."""
    x = conv_module_forward(skel.shared_conv, feats)
    outs = []
    for task in skel.task_heads:
        out = {}
        for name, seq in task.named_children():
            y = x
            for mod in seq:
                if hasattr(mod, "conv") and hasattr(mod, "bn"):
                    y = conv_module_forward(mod, y)
                else:
                    y = mod(y)
            out[name] = y
        outs.append(out)
    return outs


def _gather_feat(feat, ind):
    dim = feat.size(2)
    ind = ind.unsqueeze(2).expand(ind.size(0), ind.size(1), dim)
    return feat.gather(1, ind)


def _topk(scores, K):
    """centerpoint_bbox_coders.py:62-101 (note the reference's xs/ys
    convention: xs = ind // W, ys = ind % W)."""
    batch, cat, height, width = scores.size()
    topk_scores, topk_inds = torch.topk(scores.view(batch, cat, -1), K)
    topk_inds = topk_inds % (height * width)
    topk_xs = (topk_inds.float() / float(width)).int().float()
    topk_ys = (topk_inds % width).int().float()
    topk_score, topk_ind = torch.topk(topk_scores.view(batch, -1), K)
    topk_clses = (topk_ind / float(K)).int()
    topk_inds = _gather_feat(topk_inds.view(batch, -1, 1), topk_ind).view(batch, K)
    topk_ys = _gather_feat(topk_ys.view(batch, -1, 1), topk_ind).view(batch, K)
    topk_xs = _gather_feat(topk_xs.view(batch, -1, 1), topk_ind).view(batch, K)
    return topk_score, topk_inds, topk_clses, topk_ys, topk_xs


def _transpose_and_gather_feat(feat, ind):
    feat = feat.permute(0, 2, 3, 1).contiguous()
    feat = feat.view(feat.size(0), -1, feat.size(3))
    return _gather_feat(feat, ind)


def coder_decode(heat, rot_sine, rot_cosine, hei, dim, vel, reg,
                 max_num, out_size_factor, voxel_size, pc_range,
                 post_center_range, score_threshold=None):
    """centerpoint_bbox_coders.py:121-230 with the boolean filter
    returned as a mask."""
    batch = heat.shape[0]
    scores, inds, clses, ys, xs = _topk(heat, K=max_num)
    if reg is not None:
        reg = _transpose_and_gather_feat(reg, inds).view(batch, max_num, 2)
        xs = xs.view(batch, max_num, 1) + reg[:, :, 0:1]
        ys = ys.view(batch, max_num, 1) + reg[:, :, 1:2]
    else:
        xs = xs.view(batch, max_num, 1) + 0.5
        ys = ys.view(batch, max_num, 1) + 0.5
    rot_sine = _transpose_and_gather_feat(rot_sine, inds).view(batch, max_num, 1)
    rot_cosine = _transpose_and_gather_feat(rot_cosine, inds).view(batch, max_num, 1)
    rot = torch.atan2(rot_sine, rot_cosine)
    hei = _transpose_and_gather_feat(hei, inds).view(batch, max_num, 1)
    dim = _transpose_and_gather_feat(dim, inds).view(batch, max_num, 3)
    clses = clses.view(batch, max_num).float()
    scores = scores.view(batch, max_num)
    xs = xs * out_size_factor * voxel_size[0] + pc_range[0]
    ys = ys * out_size_factor * voxel_size[1] + pc_range[1]
    if vel is None:
        boxes = torch.cat([xs, ys, hei, dim, rot], dim=2)
    else:
        vel = _transpose_and_gather_feat(vel, inds).view(batch, max_num, 2)
        boxes = torch.cat([xs, ys, hei, dim, rot, vel], dim=2)
    pcr = torch.tensor(post_center_range)
    mask = ((boxes[..., :3] >= pcr[:3]).all(2)
            & (boxes[..., :3] <= pcr[3:]).all(2))
    if score_threshold is not None:
        mask = mask & (scores > score_threshold)
    return boxes, scores, clses, mask


def rotated_nms(boxes_xywhr, scores, thresh, iou_fn,
                pre_max_size=1000, post_max_size=83):
    """Greedy rotated-BEV-IoU NMS (reference nms_gpu,
    ops/iou3d/iou3d_utils.py:23-49): sort desc, cap at pre_max, suppress
    iou > thresh, cap kept at post_max. iou_fn(a [N,5], b [M,5]) ->
    [N, M] pairwise rotated IoU."""
    order = np.argsort(-scores, kind="stable")[:pre_max_size]
    b = boxes_xywhr[order]
    iou = iou_fn(b, b)
    keep = []
    suppressed = np.zeros(len(order), bool)
    for i in range(len(order)):
        if suppressed[i]:
            continue
        keep.append(order[i])
        suppressed |= iou[i] > thresh
        suppressed[i] = True
    return np.asarray(keep[:post_max_size], np.int64)


def get_bboxes_rotate(task_preds, num_classes_per_task, coder_cfg, test_cfg,
                      iou_fn):
    """centerpoint.py:636-757 + get_task_detections (:759-884), rotate
    NMS for every task. Returns per-sample (boxes, scores, labels)."""
    B = task_preds[0]["heatmap"].shape[0]
    per_sample = [[] for _ in range(B)]
    flag = 0
    for t, pred in enumerate(task_preds):
        heat = pred["heatmap"].sigmoid()
        dim = torch.exp(pred["dim"])
        rots = pred["rot"][:, 0:1]
        rotc = pred["rot"][:, 1:2]
        boxes, scores, clses, mask = coder_decode(
            heat, rots, rotc, pred["height"], dim, pred["vel"],
            pred["reg"], **coder_cfg)
        nms_scales = test_cfg.get("nms_scale")
        scale_t = (nms_scales[t] if nms_scales is not None
                   else [1.0] * num_classes_per_task[t])
        for i in range(B):
            bb = boxes[i][mask[i]].numpy()
            ss = scores[i][mask[i]].numpy()
            ll = clses[i][mask[i]].numpy().astype(np.int64)
            thr = test_cfg["score_threshold"]
            if thr > 0:
                k = ss >= thr
                bb, ss, ll = bb[k], ss[k], ll[k]
            if len(ss):
                # BEV box (x, y, w, l, yaw) with per-class size scaling
                bev = bb[:, [0, 1, 3, 4, 6]].copy()
                for cls, sc in enumerate(scale_t):
                    m = ll == cls
                    bev[m, 2] *= sc
                    bev[m, 3] *= sc
                sel = rotated_nms(bev, ss, test_cfg["nms_thr"], iou_fn,
                                  test_cfg.get("pre_max_size", 1000),
                                  test_cfg.get("post_max_size", 83))
            else:
                sel = np.zeros((0,), np.int64)
            bb, ss, ll = bb[sel], ss[sel], ll[sel]
            pcl = np.asarray(test_cfg["post_center_limit_range"])
            if len(ss):
                m = ((bb[:, :3] >= pcl[:3]).all(1)
                     & (bb[:, :3] <= pcl[3:]).all(1))
                bb, ss, ll = bb[m], ss[m], ll[m]
            per_sample[i].append((bb, ss, ll + flag))
        flag += num_classes_per_task[t]

    out = []
    for i in range(B):
        bb = np.concatenate([x[0] for x in per_sample[i]])
        ss = np.concatenate([x[1] for x in per_sample[i]])
        ll = np.concatenate([x[2] for x in per_sample[i]])
        bb = bb.copy()
        bb[:, 2] -= bb[:, 5] * 0.5  # gravity -> bottom center
        out.append((bb, ss, ll))
    return out

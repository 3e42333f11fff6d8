"""File-loading pipeline steps (numpy, host-side).

Behavioral reference: mmdet3d/datasets/pipelines/loading.py —
LoadMultiViewImageFromFiles (:22), LoadPointsFromFile (:317, 5-dim
xyzir), LoadPointsFromMultiSweeps (:87, 9 sweeps + time-lag dim,
remove_close, pad empty), LoadAnnotations3D (:438), LoadBEVSegmentation
(:244-313, nuScenes map masks). Beam reduction matches
loading_utils.py:58+.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np

from ..core.box_np import LiDARBoxes3D
from ..registry import PIPELINES
from .points import LiDARPoints

__all__ = [
    "LoadMultiViewImageFromFiles", "LoadPointsFromFile",
    "LoadPointsFromMultiSweeps", "LoadAnnotations3D", "LoadBEVSegmentation",
]


def _imread(path: str) -> np.ndarray:
    from PIL import Image  # available via torchvision deps

    return np.asarray(Image.open(path).convert("RGB"))


def _load_points_bin(path: str, load_dim: int) -> np.ndarray:
    pts = np.fromfile(path, dtype=np.float32)
    return pts.reshape(-1, load_dim)


@PIPELINES.register()
class LoadMultiViewImageFromFiles:
    def __init__(self, to_float32: bool = False):
        self.to_float32 = to_float32

    def __call__(self, data: Dict[str, Any]):
        imgs = [_imread(p) for p in data["image_paths"]]
        if self.to_float32:
            imgs = [im.astype(np.float32) for im in imgs]
        data["img"] = imgs
        data["ori_shape"] = (imgs[0].shape[1], imgs[0].shape[0])  # (W, H)
        return data


@PIPELINES.register()
class LoadPointsFromFile:
    def __init__(self, coord_type="LIDAR", load_dim=5, use_dim=5,
                 reduce_beams=32, load_augmented=None):
        self.load_dim = load_dim
        self.use_dim = list(range(use_dim)) if isinstance(use_dim, int) else use_dim
        self.reduce_beams = reduce_beams
        self.load_augmented = load_augmented

    def __call__(self, data: Dict[str, Any]):
        pts = _load_points_bin(data["lidar_path"], self.load_dim)
        pts = pts[:, self.use_dim]
        data["points"] = LiDARPoints(pts, pts.shape[1])
        return data


@PIPELINES.register()
class LoadPointsFromMultiSweeps:
    """Aggregate past sweeps into the keyframe cloud with a time-lag
    feature (loading.py:87+): sweep points are transformed into the
    keyframe lidar frame via sensor2lidar_{rotation,translation}, close
    points (|x|,|y| < 1 m) removed, padding with the keyframe when no
    sweeps exist."""

    def __init__(self, sweeps_num=10, load_dim=5, use_dim=(0, 1, 2, 4),
                 reduce_beams=32, pad_empty_sweeps=False, remove_close=False,
                 test_mode=False, load_augmented=None):
        self.sweeps_num = sweeps_num
        self.load_dim = load_dim
        self.use_dim = list(range(use_dim)) if isinstance(use_dim, int) else list(use_dim)
        self.pad_empty_sweeps = pad_empty_sweeps
        self.remove_close = remove_close
        self.test_mode = test_mode

    @staticmethod
    def _remove_close(pts: np.ndarray, radius: float = 1.0) -> np.ndarray:
        keep = ~((np.abs(pts[:, 0]) < radius) & (np.abs(pts[:, 1]) < radius))
        return pts[keep]

    def __call__(self, data: Dict[str, Any]):
        points = data["points"].tensor
        # time-lag channel: keyframe = 0
        if points.shape[1] >= 5:
            points = points.copy()
            points[:, 4] = 0.0
        ts = data["timestamp"] / 1e6
        sweeps = data.get("sweeps", [])
        clouds = [points]
        if self.pad_empty_sweeps and len(sweeps) == 0:
            base = self._remove_close(points) if self.remove_close else points
            for _ in range(self.sweeps_num):
                clouds.append(base)
        else:
            rng = data.get("_rng")
            if len(sweeps) <= self.sweeps_num:
                choices = np.arange(len(sweeps))
            elif self.test_mode or rng is None:
                choices = np.arange(self.sweeps_num)
            else:
                choices = rng.choice(len(sweeps), self.sweeps_num, replace=False)
            for i in choices:
                sweep = sweeps[i]
                pts = _load_points_bin(sweep["data_path"], self.load_dim)
                pts = pts[:, self.use_dim] if len(self.use_dim) != pts.shape[1] else pts
                if self.remove_close:
                    pts = self._remove_close(pts)
                from .. import native

                pts = native.transform_sweep_points(
                    pts,
                    np.asarray(sweep["sensor2lidar_rotation"], np.float32),
                    np.asarray(sweep["sensor2lidar_translation"], np.float32),
                    float(ts - sweep["timestamp"] / 1e6),
                )
                clouds.append(pts)
        data["points"] = LiDARPoints(np.concatenate(clouds, 0), points.shape[1])
        return data


@PIPELINES.register()
class LoadAnnotations3D:
    def __init__(self, with_bbox_3d=True, with_label_3d=True, with_attr_label=False):
        self.with_bbox_3d = with_bbox_3d
        self.with_label_3d = with_label_3d

    def __call__(self, data: Dict[str, Any]):
        ann = data.get("ann_info", {})
        if self.with_bbox_3d:
            boxes = np.asarray(ann.get("gt_bboxes_3d", np.zeros((0, 9))), np.float32)
            if boxes.size and boxes.shape[1] < 9:
                boxes = np.pad(boxes, ((0, 0), (0, 9 - boxes.shape[1])))
            data["gt_bboxes_3d"] = LiDARBoxes3D(boxes, 9)
        if self.with_label_3d:
            data["gt_labels_3d"] = np.asarray(
                ann.get("gt_labels_3d", np.zeros((0,), np.int64))
            )
        return data


@PIPELINES.register()
class LoadBEVSegmentation:
    """Rasterize nuScenes map layers into BEV GT masks (loading.py:244-313):
    patch pose = lidar->global with the lidar aug inverted, 6 classes
    with 'divider' = road_divider | lane_divider. Requires the nuScenes
    map expansion; gated import."""

    def __init__(self, dataset_root, xbound, ybound, classes):
        self.dataset_root = dataset_root
        self.xbound = xbound
        self.ybound = ybound
        self.classes = list(classes)
        patch_h = ybound[1] - ybound[0]
        patch_w = xbound[1] - xbound[0]
        self.patch_size = (patch_h, patch_w)
        canvas_h = int(patch_h / ybound[2])
        canvas_w = int(patch_w / xbound[2])
        self.canvas_size = (canvas_h, canvas_w)
        self._maps = {}

    _MAPPINGS = {
        "drivable_area": ["road_segment", "lane"],
        "divider": ["road_divider", "lane_divider"],
        "ped_crossing": ["ped_crossing"],
        "walkway": ["walkway"],
        "stop_line": ["stop_line"],
        "carpark_area": ["carpark_area"],
    }

    def _get_map(self, location):
        if location not in self._maps:
            from nuscenes.map_expansion.map_api import NuScenesMap

            self._maps[location] = NuScenesMap(self.dataset_root, location)
        return self._maps[location]

    def __call__(self, data: Dict[str, Any]):
        if "location" not in data:
            # no map available (e.g. synthetic data): emit empty masks
            data["gt_masks_bev"] = np.zeros(
                (len(self.classes),) + self.canvas_size, np.float32
            )
            return data
        lidar2global = (
            data["ego2global"] @ data["lidar2ego"]
            @ np.linalg.inv(data.get("lidar_aug_matrix", np.eye(4)))
        )
        x, y = lidar2global[0, 3], lidar2global[1, 3]
        v = lidar2global[:3, 0]
        yaw = np.arctan2(v[1], v[0])
        patch_box = (x, y, self.patch_size[0], self.patch_size[1])
        patch_angle = yaw / np.pi * 180

        layers = []
        for name in self.classes:
            layers.extend(self._MAPPINGS.get(name, [name]))
        layers = sorted(set(layers))
        nmap = self._get_map(data["location"])
        masks = nmap.get_map_mask(patch_box, patch_angle, layers, self.canvas_size)
        masks = masks.transpose(0, 2, 1).astype(np.bool_)

        num_classes = len(self.classes)
        out = np.zeros((num_classes,) + self.canvas_size, np.float32)
        for k, name in enumerate(self.classes):
            for layer in self._MAPPINGS.get(name, [name]):
                idx = layers.index(layer)
                out[k] = np.maximum(out[k], masks[idx].astype(np.float32))
        data["gt_masks_bev"] = out
        return data

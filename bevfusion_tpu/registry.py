"""Registry-driven module construction.

The reference builds every component from a ``type:`` key in YAML via mmcv
Registries (reference: mmdet3d/models/builder.py:1-41). We keep that
contract — configs port 1:1 — but the registry here is a plain name->class
map and ``build`` instantiates flax modules (dataclass-style kwargs).
"""
from __future__ import annotations

from collections.abc import Mapping
from typing import Any, Callable, Dict, Optional


class Registry:
    def __init__(self, name: str):
        self.name = name
        self._registry: Dict[str, Any] = {}

    def register(self, name: Optional[str] = None) -> Callable:
        def deco(cls):
            key = name or cls.__name__
            if key in self._registry and self._registry[key] is not cls:
                raise KeyError(f"{key} already registered in {self.name}")
            self._registry[key] = cls
            return cls

        return deco

    def get(self, key: str):
        if key not in self._registry:
            raise KeyError(
                f"{key!r} is not registered in {self.name}; "
                f"available: {sorted(self._registry)}"
            )
        return self._registry[key]

    def __contains__(self, key: str) -> bool:
        return key in self._registry

    def keys(self):
        return self._registry.keys()

    def build(self, cfg: Dict[str, Any], **extra_kwargs):
        """Instantiate ``cfg['type']`` with the remaining keys as kwargs."""
        if cfg is None:
            return None
        if not isinstance(cfg, Mapping):  # flax wraps dict attrs in FrozenDict
            raise TypeError(f"cfg must be a mapping, got {type(cfg)}")
        cfg = dict(cfg)
        type_name = cfg.pop("type")
        cls = self.get(type_name)
        kwargs = {**cfg, **extra_kwargs}
        # Flax linen modules are frozen dataclasses: lists from YAML must be
        # hashable-stable, so normalize nested lists to tuples.
        kwargs = {k: _freeze(v) for k, v in kwargs.items()}
        return cls(**kwargs)


def _freeze(v):
    if isinstance(v, list):
        return tuple(_freeze(x) for x in v)
    if isinstance(v, dict):
        return {k: _freeze(x) for k, x in v.items()}
    return v


# Mirrors the reference registries (mmdet3d/models/builder.py:5-41 plus the
# mmdet BACKBONES/NECKS/HEADS/LOSSES the reference borrows).
BACKBONES = Registry("backbones")
NECKS = Registry("necks")
HEADS = Registry("heads")
FUSERS = Registry("fusers")
VTRANSFORMS = Registry("vtransforms")
FUSIONMODELS = Registry("fusion_models")
VOXELIZERS = Registry("voxelizers")
LOSSES = Registry("losses")
BBOX_CODERS = Registry("bbox_coders")
BBOX_ASSIGNERS = Registry("bbox_assigners")
MATCH_COSTS = Registry("match_costs")
DATASETS = Registry("datasets")
PIPELINES = Registry("pipelines")


def build_backbone(cfg, **kw):
    return BACKBONES.build(cfg, **kw)


def build_neck(cfg, **kw):
    return NECKS.build(cfg, **kw)


def build_head(cfg, **kw):
    return HEADS.build(cfg, **kw)


def build_fuser(cfg, **kw):
    return FUSERS.build(cfg, **kw)


def build_vtransform(cfg, **kw):
    return VTRANSFORMS.build(cfg, **kw)


def build_fusion_model(cfg, **kw):
    return FUSIONMODELS.build(cfg, **kw)


def build_loss(cfg, **kw):
    return LOSSES.build(cfg, **kw)


def build_bbox_coder(cfg, **kw):
    return BBOX_CODERS.build(cfg, **kw)

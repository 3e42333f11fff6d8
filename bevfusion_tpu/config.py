"""Hierarchical YAML config system.

Mirrors the reference's torchpack config semantics (reference:
tools/train.py:28-31 + mmdet3d/utils/config.py:7-20):

- loading ``a/b/c/leaf.yaml`` first merges every ``default.yaml`` found in
  the ancestor directories (outermost first), then the leaf;
- ``${expr}`` strings are Python expressions evaluated against the config
  namespace (e.g. ``${image_size[0] // 8}``, ``${point_cloud_range[:2]}``,
  ``${augment2d.resize[0]}``) — we use a *restricted* evaluator instead of
  the reference's bare ``eval``;
- dotted CLI overrides (``model.fuser.out_channels=512``) update leaves.
"""
from __future__ import annotations

import copy
import os
import re
from typing import Any, Dict, List, Optional

import yaml

__all__ = ["Config", "load_config", "recursive_eval"]

_EXPR_RE = re.compile(r"\$\{([^{}]+)\}")

_SAFE_BUILTINS = {
    "min": min,
    "max": max,
    "len": len,
    "int": int,
    "float": float,
    "round": round,
    "abs": abs,
    "range": range,
    "list": list,
    "tuple": tuple,
    "sum": sum,
}


class Config(dict):
    """A dict with attribute access (so ``${augment2d.resize[0]}`` works)."""

    def __getattr__(self, key: str) -> Any:
        try:
            v = self[key]
        except KeyError as e:
            raise AttributeError(key) from e
        return v

    def __setattr__(self, key: str, value: Any) -> None:
        self[key] = value

    @staticmethod
    def from_dict(d: Any) -> Any:
        if isinstance(d, dict):
            return Config({k: Config.from_dict(v) for k, v in d.items()})
        if isinstance(d, list):
            return [Config.from_dict(v) for v in d]
        return d

    def to_dict(self) -> Dict[str, Any]:
        def conv(v):
            if isinstance(v, dict):
                return {k: conv(x) for k, x in v.items()}
            if isinstance(v, list):
                return [conv(x) for x in v]
            return v

        return conv(self)

    def merge_from(self, other: Dict[str, Any]) -> None:
        _deep_merge(self, other)

    def update_dotted(self, opts: Dict[str, Any]) -> None:
        """Apply ``a.b.c=value`` style overrides (tools/train.py:26-29)."""
        for dotted, value in opts.items():
            keys = dotted.split(".")
            node = self
            for k in keys[:-1]:
                if k not in node or not isinstance(node[k], dict):
                    node[k] = Config()
                node = node[k]
            node[keys[-1]] = Config.from_dict(value)

    def dump(self, path: str) -> None:
        with open(path, "w") as f:
            yaml.safe_dump(self.to_dict(), f, sort_keys=False)


def _deep_merge(dst: Dict[str, Any], src: Dict[str, Any]) -> Dict[str, Any]:
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(dst.get(k), dict):
            _deep_merge(dst[k], v)
        else:
            dst[k] = Config.from_dict(v)
    return dst


def _ancestor_defaults(path: str) -> List[str]:
    """default.yaml files from outermost ancestor down to the leaf's dir.

    Walk up from the leaf while ``default.yaml`` exists in the directory
    (the reference config tree keeps an unbroken chain, reference
    configs/**/default.yaml).
    """
    out: List[str] = []
    d = os.path.dirname(os.path.abspath(path))
    while True:
        cand = os.path.join(d, "default.yaml")
        if os.path.isfile(cand):
            out.append(cand)
        else:
            break
        parent = os.path.dirname(d)
        if parent == d:
            break
        d = parent
    return out[::-1]


def load_config(
    path: str,
    overrides: Optional[Dict[str, Any]] = None,
    evaluate: bool = True,
) -> Config:
    cfg = Config()
    chain = _ancestor_defaults(path)
    if os.path.abspath(path) not in chain:
        chain.append(os.path.abspath(path))
    for p in chain:
        with open(p) as f:
            data = yaml.safe_load(f) or {}
        cfg.merge_from(data)
    if overrides:
        cfg.update_dotted(overrides)
    if evaluate:
        cfg = recursive_eval(cfg)
    return cfg


def _safe_eval(expr: str, ns: Config) -> Any:
    return eval(  # noqa: S307 — restricted: no builtins beyond whitelist
        compile(expr, "<config-expr>", "eval"),
        {"__builtins__": {}},
        _EvalNamespace(ns),
    )


class _EvalNamespace(dict):
    def __init__(self, cfg: Config):
        super().__init__()
        self._cfg = cfg

    def __missing__(self, key: str) -> Any:
        if key in _SAFE_BUILTINS:
            return _SAFE_BUILTINS[key]
        if key in self._cfg:
            return self._cfg[key]
        raise KeyError(key)


class _Unresolved(Exception):
    pass


def _eval_node(node: Any, root: Config) -> Any:
    if isinstance(node, str):
        m = _EXPR_RE.fullmatch(node.strip())
        if m:
            val = _safe_eval(m.group(1), root)
            if isinstance(val, str) and _EXPR_RE.search(val):
                raise _Unresolved(node)
            return Config.from_dict(val)
        if _EXPR_RE.search(node):

            def sub(m2):
                return str(_safe_eval(m2.group(1), root))

            return _EXPR_RE.sub(sub, node)
        return node
    if isinstance(node, dict):
        return Config({k: _eval_node(v, root) for k, v in node.items()})
    if isinstance(node, list):
        return [_eval_node(v, root) for v in node]
    return node


def recursive_eval(cfg: Config, max_iters: int = 16) -> Config:
    """Fixpoint-evaluate all ``${...}`` expressions (utils/config.py:7-20)."""
    cfg = Config.from_dict(copy.deepcopy(cfg if isinstance(cfg, dict) else dict(cfg)))
    for _ in range(max_iters):
        try:
            new = _eval_node(cfg, cfg)
        except (_Unresolved, KeyError, TypeError, NameError):
            new = _partial_eval(cfg, cfg)
        if new == cfg:
            _check_resolved(new, "")
            return new
        cfg = new
    raise ValueError("config interpolation did not converge (circular ${...}?)")


def _check_resolved(node: Any, path: str) -> None:
    if isinstance(node, str) and _EXPR_RE.search(node):
        raise ValueError(
            f"unresolved config expression at {path or '<root>'}: {node!r} "
            "(circular or undefined reference?)"
        )
    if isinstance(node, dict):
        for k, v in node.items():
            _check_resolved(v, f"{path}.{k}" if path else str(k))
    elif isinstance(node, list):
        for i, v in enumerate(node):
            _check_resolved(v, f"{path}[{i}]")


def _partial_eval(node: Any, root: Config) -> Any:
    """Like _eval_node but leaves unresolvable expressions in place."""
    if isinstance(node, str) and _EXPR_RE.search(node):
        try:
            return _eval_node(node, root)
        except Exception:
            return node
    if isinstance(node, dict):
        return Config({k: _partial_eval(v, root) for k, v in node.items()})
    if isinstance(node, list):
        return [_partial_eval(v, root) for v in node]
    return node

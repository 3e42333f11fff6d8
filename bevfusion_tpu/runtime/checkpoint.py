"""Checkpointing: orbax save/restore + torch-checkpoint conversion.

Behavioral reference: mmcv CheckpointHook (interval 1 epoch,
max_keep_ckpts 1, configs/default.yaml:4-6), resume_from (optimizer +
epoch) vs load_from (weights only) (mmdet3d/apis/train.py:122-125), and
the staged-training workflow where fused models initialize from
lidar-only checkpoints and Swin from nuImages-pretrained torch weights
(reference README:186).
"""
from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["save_checkpoint", "restore_checkpoint", "convert_torch_state_dict",
           "load_torch_checkpoint", "load_reference_checkpoint"]


def _ckptr():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(path: str, state: Any, keep: int = 1) -> None:
    """Save a pytree (TrainState or variables) at path/step_x; prune to
    the newest ``keep`` checkpoints (max_keep_ckpts)."""
    path = os.path.abspath(path)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    _ckptr().save(path, state, force=True)
    parent = os.path.dirname(path)
    ckpts = sorted(
        (d for d in os.listdir(parent) if re.match(r"^(step|epoch)_\d+$", d)),
        key=lambda d: int(d.split("_")[1]),
    )
    for stale in ckpts[:-keep]:
        import shutil

        shutil.rmtree(os.path.join(parent, stale), ignore_errors=True)


def restore_checkpoint(path: str, target: Optional[Any] = None) -> Any:
    return _ckptr().restore(os.path.abspath(path), item=target)


# ---------------------------------------------------------------------
# torch -> flax conversion
# ---------------------------------------------------------------------

def _to_np(t):
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def convert_torch_state_dict(state_dict: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Normalize a torch state_dict to numpy with layout conversion:

    - Conv2d [O, I, kh, kw] -> [kh, kw, I, O]
    - ConvTranspose2d [I, O, kh, kw] -> [kh, kw, I, O]
    - Linear [O, I] -> [I, O]
    - BatchNorm running_mean/var + weight/bias kept as vectors
    - spconv SparseConv3d [kx, ky, kz, I, O] -> flattened [K, I, O]

    Name mapping into our module tree is model-specific and done by the
    per-model adapters (weights_swin etc.) in later rounds; this helper
    performs the dtype/layout normalization they share.
    """
    out = {}
    for k, v in state_dict.items():
        a = _to_np(v)
        if a.ndim == 4:  # conv OIHW -> HWIO
            a = a.transpose(2, 3, 1, 0)
        elif a.ndim == 5:  # sparse conv (kx, ky, kz, I, O) -> (K, I, O)
            a = a.reshape(-1, a.shape[-2], a.shape[-1])
        elif a.ndim == 2:
            a = a.T
        out[k] = a
    return out


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    return convert_torch_state_dict(sd)


def load_reference_checkpoint(variables, path_or_state_dict,
                              strict: bool = True):
    """Load a released reference .pth (tools/download_pretrained.sh)
    into this framework's flax ``variables`` (params + batch_stats).

    Accepts a path or an already-loaded torch state_dict; key-family
    mapping and per-primitive layout conversion live in
    runtime/adapter.py (exhaustive: with ``strict`` any unmapped flax
    parameter or unused checkpoint key raises). Returns
    (new_variables, report).
    """
    from .adapter import load_reference_weights

    sd = path_or_state_dict
    if isinstance(sd, (str, os.PathLike)):
        import torch

        ckpt = torch.load(sd, map_location="cpu", weights_only=False)
        sd = ckpt.get("state_dict", ckpt)
    return load_reference_weights(variables, sd, strict=strict)

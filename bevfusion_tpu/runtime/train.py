"""Training step: optimizer, schedules, SPMD data parallelism.

Behavioral reference: mmdet3d/apis/train.py:19-126 — AdamW with
paramwise lr/decay multipliers, grad clip (max_norm 35), cyclic or
cosine-annealing LR, fp16 loss scaling, DDP gradient all-reduce.

TPU-first: the whole train step (forward, loss, grad, clip, update) is
ONE jitted SPMD program. Data parallelism is GSPMD batch sharding over a
`jax.sharding.Mesh` — gradients reduce automatically where params are
replicated (the reference's NCCL all-reduce, apis/train.py:48-53);
BatchNorm moments are computed over the global batch, reproducing
NaiveSyncBatchNorm (ops/norm.py:9-130) with no extra code. bf16 compute
makes the reference's Fp16OptimizerHook loss-scaling machinery
unnecessary; the hook's grad-clip survives as optax.clip_by_global_norm.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

__all__ = [
    "build_optimizer",
    "build_lr_schedule",
    "build_momentum_schedule",
    "make_train_step",
    "TrainState",
]

import flax


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def build_lr_schedule(lr_config: Optional[dict], base_lr: float,
                      total_steps: int) -> optax.Schedule:
    """Cyclic (one-cycle) and CosineAnnealing schedules, mirroring the
    mmcv lr hooks the reference registers (configs '[lr_config]')."""
    cfg = dict(lr_config or {})
    policy = (cfg.get("policy") or "fixed").lower()
    if policy == "fixed":
        return optax.constant_schedule(base_lr)
    if policy == "cyclic":
        # mmcv CyclicLrUpdater: up for step_ratio_up, peak = lr*target_ratio,
        # down to lr * target_ratio[1] (default 1e-4 of peak)
        target_ratio = cfg.get("target_ratio", 5.0)
        if isinstance(target_ratio, (tuple, list)):
            up_ratio, down_ratio = target_ratio
        else:
            up_ratio, down_ratio = target_ratio, 1e-4
        step_up = int(cfg.get("step_ratio_up", 0.4) * total_steps)
        return optax.join_schedules(
            [
                optax.cosine_onecycle_schedule(  # approx of mmcv's cos-anneal up
                    transition_steps=max(step_up, 1) * 2,
                    peak_value=base_lr * up_ratio,
                    pct_start=0.5,
                    div_factor=up_ratio,
                    final_div_factor=1.0,
                ),
                optax.cosine_decay_schedule(
                    base_lr * up_ratio,
                    max(total_steps - step_up, 1),
                    alpha=down_ratio / up_ratio,
                ),
            ],
            [step_up],
        )
    if policy == "cosineannealing":
        warmup_iters = int(cfg.get("warmup_iters", 0))
        warmup_ratio = float(cfg.get("warmup_ratio", 1.0 / 3))
        min_lr_ratio = float(cfg.get("min_lr_ratio", 1e-3))
        sched = optax.cosine_decay_schedule(
            base_lr, max(total_steps - warmup_iters, 1), alpha=min_lr_ratio
        )
        if warmup_iters > 0 and cfg.get("warmup") == "linear":
            warm = optax.linear_schedule(base_lr * warmup_ratio, base_lr, warmup_iters)
            return optax.join_schedules([warm, sched], [warmup_iters])
        return sched
    raise ValueError(f"unsupported lr policy {policy}")


def _cos_anneal(start: float, end: float, steps: int):
    """Cosine interpolation start -> end over `steps` (mmcv annealing_cos)."""

    def sched(t):
        frac = jnp.clip(t / max(steps, 1), 0.0, 1.0)
        return end + (start - end) * 0.5 * (1.0 + jnp.cos(jnp.pi * frac))

    return sched


def build_momentum_schedule(momentum_config: Optional[dict], base_m: float,
                            total_steps: int):
    """Cyclic momentum schedule for AdamW's beta1, mirroring mmcv's
    CyclicMomentumUpdaterHook that the reference registers next to the
    lr hook (mmdet3d/apis/train.py:92-98; momentum_config in
    configs/nuscenes/det/transfusion/secfpn/default.yaml). The momentum
    dips while the lr rises (default target_ratio (0.85/0.95, 1)) and
    anneals back over the down-phase. Returns None for absent/fixed
    configs (callers keep a constant b1)."""
    cfg = dict(momentum_config or {})
    policy = (cfg.get("policy") or "fixed").lower()
    if policy == "fixed":
        return None
    if policy != "cyclic":
        raise ValueError(f"unsupported momentum policy {policy}")
    tr = cfg.get("target_ratio", (0.85 / 0.95, 1.0))
    if isinstance(tr, (tuple, list)):
        dip_ratio, end_ratio = (float(tr[0]), float(tr[1]))
    else:
        dip_ratio, end_ratio = float(tr), 1.0
    step_up = int(float(cfg.get("step_ratio_up", 0.4)) * total_steps)
    return optax.join_schedules(
        [
            _cos_anneal(base_m, base_m * dip_ratio, max(step_up, 1)),
            _cos_anneal(base_m * dip_ratio, base_m * end_ratio,
                        max(total_steps - step_up, 1)),
        ],
        [step_up],
    )


def _path_str(path) -> str:
    return ".".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def build_optimizer(optimizer_cfg: dict, lr_schedule, params,
                    grad_clip: Optional[dict] = None,
                    momentum_schedule=None) -> optax.GradientTransformation:
    """AdamW with mmcv paramwise_cfg custom_keys (lr_mult / decay_mult)
    (reference: apis/train.py:75 + configs' paramwise_cfg). An optional
    momentum_schedule (build_momentum_schedule) drives beta1 per step,
    the reference's CyclicMomentumUpdaterHook."""
    cfg = dict(optimizer_cfg or {})
    wd = float(cfg.get("weight_decay", 0.01))
    custom = (cfg.get("paramwise_cfg") or {}).get("custom_keys", {})

    def decay_mask(p):
        def f(path, leaf):
            s = _path_str(path)
            for key, mods in custom.items():
                if key in s and float(mods.get("decay_mult", 1.0)) == 0.0:
                    return 0.0
            # norms and biases: mmcv applies decay to everything unless
            # excluded via custom_keys; we match that default
            return 1.0

        return jax.tree_util.tree_map_with_path(f, p)

    def lr_mult_tree(p):
        def f(path, leaf):
            s = _path_str(path)
            mult = 1.0
            for key, mods in custom.items():
                if key.replace(".", "_") in s.replace(".", "_") and "lr_mult" in mods:
                    mult = float(mods["lr_mult"])
            return mult

        return jax.tree_util.tree_map_with_path(f, p)

    wd_mask = decay_mask(params)
    lr_mults = lr_mult_tree(params)

    chain = []
    if grad_clip:
        chain.append(optax.clip_by_global_norm(float(grad_clip.get("max_norm", 35))))
    if momentum_schedule is not None:
        chain.append(optax.inject_hyperparams(optax.scale_by_adam)(
            b1=momentum_schedule, b2=0.999, eps=1e-8))
    else:
        chain.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    chain.append(optax.add_decayed_weights(
        wd, mask=jax.tree_util.tree_map(lambda m: m > 0, wd_mask)))
    chain.append(optax.scale_by_learning_rate(lr_schedule))
    # per-parameter lr multipliers (e.g. camera backbone lr_mult 0.1)
    if any(v != 1.0 for v in jax.tree_util.tree_leaves(lr_mults)):
        chain.append(_per_param_scale(lr_mults))
    return optax.chain(*chain)


def _per_param_scale(mults):
    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        return (
            jax.tree_util.tree_map(lambda u, m: u * m, updates, mults),
            state,
        )

    return optax.GradientTransformation(init_fn, update_fn)


def make_train_step(model, tx) -> Callable:
    """One SPMD train step: grads of the summed loss dict, optimizer
    update, batch_stats carry. jit/pjit-able as-is."""

    def train_step(state: TrainState, batch, rngs=None):
        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            losses, new_vars = model.apply(
                variables, batch, training=True,
                mutable=["batch_stats", "intermediates"],
                rngs=rngs,
            )
            total = sum(v for k, v in losses.items() if k.startswith("loss/"))
            # windowed-engine overflow diagnostic: dropped neighbors
            # silently zero conv contributions in fwd AND bwd
            # (ops/sparse_conv_windowed.py); surface the count so the
            # training loop can fail loudly (the reference's spconv never
            # drops pairs, spconv_ops.h:28-258)
            from .eval import _find_overflow
            ovf = _find_overflow(new_vars.get("intermediates", {}))
            losses = dict(losses)
            if ovf is not None:
                losses["diag/window_overflow"] = ovf.astype(jnp.float32)
            return total, (losses, new_vars.get("batch_stats",
                                                state.batch_stats))

        (total, (losses, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1, params=new_params,
            batch_stats=new_bs, opt_state=new_opt,
        )
        logs = dict(losses)
        logs["loss/total"] = total
        return new_state, logs

    return train_step

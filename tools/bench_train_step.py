"""Flagship-scale train-step benchmark on the real chip.

Measures the full fused C+L training step (forward, TransFusion auction
matching, losses, backward through the windowed sparse-conv VJP and the
chunked bev_pool VJP, AdamW+clip update) at flagship scale — the number
the reference only implies via its 8-GPU epoch times (tools/train.py,
mmdet3d/apis/train.py:126). Batch 1 per chip, bf16 compute, realistic
ring-scan lidar.

    python tools/bench_train_step.py [--steps 10] [--points 120000]

Prints one JSON line {"metric": "train_step_ms", ...}.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--points", type=int, default=120000)
    ap.add_argument("--cpu", action="store_true",
                    help="CPU backend (debug only)")
    ap.add_argument("--no-lut", action="store_true",
                    help="in-graph geometry/sort pool instead of the "
                         "differentiable calibration-LUT path")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    import jax.numpy as jnp
    import numpy as np

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from bevfusion_tpu.runtime.flagship import build_flagship
    from bevfusion_tpu.runtime.train import (
        TrainState, build_lr_schedule, build_optimizer, make_train_step,
    )

    # pool_lut: training rides the differentiable calibration-LUT pool
    # (custom VJP over the LUT's point->cell pairing) and skips the
    # in-graph geometry/sort chain every step
    cfg, model, batch = build_flagship(
        batch_size=1, dtype=jnp.bfloat16, training=True,
        num_points=args.points, pool_lut=not args.no_lut)

    t0 = time.time()
    variables = jax.jit(
        lambda b: model.init(jax.random.PRNGKey(0), b, training=True)
    )(batch)
    params = variables["params"]
    print(f"init: {time.time() - t0:.1f}s", flush=True)

    sched = build_lr_schedule(cfg.get("lr_config"), 1e-4, 1000)
    tx = build_optimizer(
        {"type": "AdamW", "lr": 1e-4, "weight_decay": 0.01}, sched, params,
        grad_clip={"max_norm": 35})
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=tx.init(params))

    step = jax.jit(make_train_step(model, tx), donate_argnums=(0,))

    def run_one(state, i):
        rngs = {"dropout": jax.random.PRNGKey(i)}
        state, logs = step(state, batch, rngs)
        # axon tunnel: block_until_ready does not synchronize; fetch a
        # scalar to force completion
        total = float(np.asarray(logs["loss/total"]))
        return state, total

    t0 = time.time()
    state, total = run_one(state, 0)
    print(f"compile+first step: {time.time() - t0:.1f}s "
          f"loss={total:.3f}", flush=True)
    state, total = run_one(state, 1)  # warm

    t0 = time.time()
    for i in range(args.steps):
        state, total = run_one(state, 2 + i)
    dt = (time.time() - t0) / args.steps
    assert np.isfinite(total), total

    print(json.dumps({
        "metric": "flagship_train_step_ms", "value": round(dt * 1000, 1),
        "unit": "ms/step (B=1, bf16, fwd+bwd+AdamW)",
        "loss_total": round(total, 3),
        "steps_per_s": round(1.0 / dt, 3),
    }))


if __name__ == "__main__":
    main()

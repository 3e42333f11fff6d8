"""Training-longevity evidence run (VERDICT r4 item 6).

One synthetic-data training run of N steps at flagship scale through a
full cyclic-LR cycle — the epoch-scale stability evidence the reference
implies with its 8-GPU training recipe (mmdet3d/apis/train.py:126):

  - loss curve over the full cycle (8 distinct synthetic scenes cycled,
    so the loss must actually descend, not just stay finite)
  - BN running-stat drift sampled every 100 steps (finite, bounded)
  - window-overflow diagnostic asserted ZERO every step (dropped
    neighbors would silently corrupt fwd+bwd)
  - a mid-run orbax checkpoint save -> 10 more steps -> restore ->
    re-run: the continuation must be BIT-IDENTICAL (same jitted program,
    same batches, same rngs)

Writes LONGEVITY_r05.json + a step log to stdout.

Run: python tools/train_longevity.py [--steps 2000] [--points 120000]
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
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--points", type=int, default=120000)
    ap.add_argument("--scenes", type=int, default=8)
    ap.add_argument("--base-lr", type=float, default=1e-4)
    ap.add_argument("--resume-probe", type=int, default=10,
                    help="steps re-run after the mid-run restore")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from bevfusion_tpu.runtime.checkpoint import (restore_checkpoint,
                                                  save_checkpoint)
    from bevfusion_tpu.runtime.flagship import build_flagship, synthetic_batch
    from bevfusion_tpu.runtime.flagship import add_pool_lut
    from bevfusion_tpu.runtime.train import (
        TrainState, build_lr_schedule, build_optimizer, make_train_step,
    )

    cfg, model, batch0 = build_flagship(
        batch_size=1, dtype=jnp.bfloat16, training=True,
        num_points=args.points, pool_lut=True)
    batches = [batch0]
    for s in range(1, args.scenes):
        b = synthetic_batch(cfg, B=1, num_points=args.points,
                            training=True, seed=s)
        batches.append(add_pool_lut(cfg, b))

    t0 = time.time()
    variables = jax.jit(
        lambda b: model.init(jax.random.PRNGKey(0), b, training=True)
    )(batches[0])
    params = variables["params"]
    print(f"init: {time.time() - t0:.1f}s", flush=True)

    # full cyclic-LR cycle across exactly --steps (the flagship
    # lr_config: cyclic LR + cyclic momentum, reference schedule)
    sched = build_lr_schedule(cfg.get("lr_config"), args.base_lr, args.steps)
    tx = build_optimizer(
        {"type": "AdamW", "lr": args.base_lr, "weight_decay": 0.01},
        sched, params, grad_clip={"max_norm": 35})
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=tx.init(params))

    step_fn = jax.jit(make_train_step(model, tx))

    def bn_norm(bs):
        leaves = jax.tree_util.tree_leaves(bs)
        return float(np.sqrt(sum(float(jnp.sum(l.astype(jnp.float32) ** 2))
                                 for l in leaves)))

    def run_one(state, i):
        rngs = {"dropout": jax.random.PRNGKey(i)}
        state, logs = step_fn(state, batches[i % args.scenes], rngs)
        total = float(np.asarray(logs["loss/total"]))
        ovf = float(np.asarray(logs.get("diag/window_overflow", 0.0)))
        return state, total, ovf

    losses, bn_drift, overflow_events = [], [], 0
    ckpt_dir = os.path.join(repo, ".longevity_ckpt", "step_mid")
    resume_ok = None
    mid = args.steps // 2

    t0 = time.time()
    state, total, ovf = run_one(state, 0)
    print(f"compile+step0: {time.time() - t0:.1f}s loss={total:.2f}",
          flush=True)
    losses.append(total)
    assert np.isfinite(total), total
    assert ovf == 0, f"window overflow at step 0: {ovf}"

    t_run = time.time()
    i = 1
    while i < args.steps:
        state, total, ovf = run_one(state, i)
        losses.append(total)
        if not np.isfinite(total):
            raise AssertionError(f"non-finite loss at step {i}: {total}")
        if ovf != 0:
            overflow_events += 1
            raise AssertionError(f"window overflow at step {i}: {ovf}")
        if i % 100 == 0:
            bn_drift.append((i, bn_norm(state.batch_stats)))
            dt = (time.time() - t_run) / i * 1e3
            print(f"step {i:5d} loss={total:9.2f} "
                  f"bn|.|={bn_drift[-1][1]:.1f} ({dt:.0f} ms/step avg)",
                  flush=True)
        if i == mid:
            # ---- checkpoint/resume bit-equivalence probe --------------
            host_state = jax.tree_util.tree_map(np.asarray, state)
            save_checkpoint(ckpt_dir, host_state)
            probe = state
            for j in range(args.resume_probe):
                probe, _, _ = run_one(probe, i + 1 + j)
            a = jax.tree_util.tree_map(np.asarray, probe)
            restored = restore_checkpoint(ckpt_dir, target=host_state)
            probe2 = jax.tree_util.tree_map(jnp.asarray, restored)
            probe2 = TrainState(**{f: getattr(probe2, f) for f in
                                   ("step", "params", "batch_stats",
                                    "opt_state")})
            for j in range(args.resume_probe):
                probe2, _, _ = run_one(probe2, i + 1 + j)
            b = jax.tree_util.tree_map(np.asarray, probe2)
            flat_a = jax.tree_util.tree_leaves(a)
            flat_b = jax.tree_util.tree_leaves(b)
            resume_ok = all(
                np.array_equal(x, y, equal_nan=True)
                for x, y in zip(flat_a, flat_b))
            print(f"step {i}: checkpoint/resume probe "
                  f"bit-identical={resume_ok}", flush=True)
            assert resume_ok, "resumed continuation diverged bitwise"
        i += 1

    wall = time.time() - t_run
    out = {
        "steps": args.steps,
        "points": args.points,
        "scenes": args.scenes,
        "ms_per_step_avg": round(wall / (args.steps - 1) * 1e3, 1),
        "loss_first": round(losses[0], 2),
        "loss_min": round(min(losses), 2),
        "loss_last": round(losses[-1], 2),
        "loss_curve_every20": [round(x, 2) for x in losses[::20]],
        "bn_norm_every100": [[i_, round(v, 2)] for i_, v in bn_drift],
        "overflow_events": overflow_events,
        "resume_bit_identical": bool(resume_ok),
        "lr_schedule": "cyclic (flagship lr_config), one full cycle",
    }
    with open(os.path.join(repo, "LONGEVITY_r05.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: v for k, v in out.items()
                      if not k.startswith("loss_curve")
                      and k != "bn_norm_every100"}))
    print("wrote LONGEVITY_r05.json")


if __name__ == "__main__":
    main()

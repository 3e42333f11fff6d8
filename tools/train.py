"""Training CLI.

Behavioral reference: tools/train.py (torchpack dist-run entry): load
hierarchical config + dotted overrides, build dataset/model/optimizer,
run epoch-based training with per-epoch checkpointing and eval.

TPU-native: one process per host, jax.distributed for multi-host; GSPMD
batch sharding replaces DDP. Usage:
  python tools/train.py <config.yaml> [--run-dir runs/x] [k.e.y=value ...]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_overrides(opts):
    import yaml

    out = {}
    for o in opts:
        k, v = o.split("=", 1)
        out[k] = yaml.safe_load(v)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--run-dir", default=None)
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--load-from", default=None)
    ap.add_argument("--resume-from", default=None)
    ap.add_argument("opts", nargs="*")
    args = ap.parse_args()

    import jax

    # multi-host: rendezvous before any backend use (the reference's MPI
    # dist.init(), tools/train.py:21). Single-host runs skip this — GSPMD
    # over local devices needs no process group.
    if (os.environ.get("JAX_COORDINATOR_ADDRESS")
            or int(os.environ.get("JAX_NUM_PROCESSES", "1")) > 1):
        jax.distributed.initialize()

    import jax.numpy as jnp
    import numpy as np

    from bevfusion_tpu.config import load_config
    from bevfusion_tpu.data import DataLoader, build_dataset
    from bevfusion_tpu.models import build_model
    from bevfusion_tpu.runtime.train import (
        TrainState, build_lr_schedule, build_momentum_schedule, build_optimizer, make_train_step,
    )
    from bevfusion_tpu.runtime.checkpoint import restore_checkpoint, save_checkpoint
    from bevfusion_tpu.utils.logging import MetricLogger

    cfg = load_config(args.config, overrides=parse_overrides(args.opts))
    if args.seed is not None:
        cfg["seed"] = args.seed
    run_dir = args.run_dir or os.path.join(
        "runs", os.path.splitext(os.path.basename(args.config))[0]
    )
    os.makedirs(run_dir, exist_ok=True)
    cfg.dump(os.path.join(run_dir, "configs.yaml"))

    dtype = (
        jnp.bfloat16
        if cfg.get("precision", {}).get("compute_dtype") == "bfloat16"
        else jnp.float32
    )
    model = build_model(cfg.model, dtype=dtype)

    dataset = build_dataset(cfg.data.train)
    loader = DataLoader(
        dataset,
        batch_size=cfg.data.samples_per_gpu * jax.device_count(),
        shuffle=True,
        num_workers=cfg.data.workers_per_gpu,
        seed=cfg.get("seed", 0),
    )

    batch = next(iter(loader))
    batch = {k: jnp.asarray(v) for k, v in batch.items() if k != "metas"}
    variables = jax.jit(lambda b: model.init(jax.random.PRNGKey(cfg.get("seed", 0)),
                                             b, training=True))(batch)
    params = variables["params"]
    bstats = variables.get("batch_stats", {})

    max_epochs = cfg.max_epochs
    steps_per_epoch = len(loader)
    total_steps = max_epochs * steps_per_epoch
    sched = build_lr_schedule(cfg.get("lr_config"), cfg.optimizer.lr, total_steps)
    msched = build_momentum_schedule(cfg.get("momentum_config"), 0.9, total_steps)
    tx = build_optimizer(cfg.optimizer, sched, params,
                         grad_clip=cfg.get("optimizer_config", {}).get("grad_clip"),
                         momentum_schedule=msched)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats=bstats, opt_state=tx.init(params))

    start_epoch = 0
    if args.resume_from or cfg.get("resume_from"):
        state = restore_checkpoint(args.resume_from or cfg["resume_from"], state)
        start_epoch = int(state.step) // steps_per_epoch
    elif args.load_from or cfg.get("load_from"):
        loaded = restore_checkpoint(args.load_from or cfg["load_from"])
        state = state.replace(params=loaded.get("params", loaded),
                              batch_stats=loaded.get("batch_stats", bstats))

    # GSPMD data-parallel sharding over all local devices
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()), ("dp",))
    repl = NamedSharding(mesh, P())
    dp = NamedSharding(mesh, P("dp"))
    state = jax.device_put(state, repl)

    step_fn = jax.jit(make_train_step(model, tx), donate_argnums=(0,))
    logger = MetricLogger(run_dir, interval=cfg.get("logging", {}).get("interval", 50))

    # per-epoch val eval (reference DistEvalHook, apis/train.py:99-120):
    # run the metric every `interval` epochs, keep the best checkpoint
    eval_cfg = cfg.get("evaluation") or {}
    eval_interval = int(eval_cfg.get("interval", 1))
    val_loader = val_dataset = None
    if cfg.get("data", {}).get("val") and not eval_cfg.get("disable", False):
        from bevfusion_tpu.runtime.eval import evaluate_dataset

        val_dataset = build_dataset(cfg.data.val)
        # per-process round-robin shard; rank 0 merges via tmpdir pickles
        # (the reference's DistEvalHook -> multi_gpu_test path)
        val_loader = DataLoader(val_dataset, batch_size=1, shuffle=False,
                                num_workers=2, drop_last=False,
                                num_shards=jax.process_count(),
                                shard_id=jax.process_index())
    best_score, best_key = None, eval_cfg.get("save_best", "mAP")

    for epoch in range(start_epoch, max_epochs):
        loader.set_epoch(epoch)
        for it, np_batch in enumerate(loader):
            np_batch.pop("metas", None)
            batch = {k: jax.device_put(jnp.asarray(v), dp) for k, v in np_batch.items()}
            rngs = {"dropout": jax.random.PRNGKey(int(state.step))}
            state, logs = step_fn(state, batch, rngs)
            logger.log(epoch, it, steps_per_epoch, logs)
        save_checkpoint(
            os.path.join(run_dir, f"epoch_{epoch + 1}"),
            jax.device_get(state),
            keep=cfg.get("checkpoint", {}).get("max_keep", 1),
        )
        if val_loader is not None and (epoch + 1) % eval_interval == 0:
            variables = {"params": state.params, "batch_stats": state.batch_stats}
            metrics = evaluate_dataset(
                model, variables, val_dataset, val_loader,
                metric=eval_cfg.get("metric", "bbox"),
                out_dir=os.path.join(run_dir, f"eval_epoch_{epoch + 1}"),
                rank=jax.process_index(), world=jax.process_count(),
                tmpdir=os.path.join(run_dir, f"eval_epoch_{epoch + 1}", "parts"))
            if metrics is None:  # non-zero ranks
                continue
            logger.log_eval(epoch, metrics)
            score = metrics.get(best_key)
            if score is not None and (best_score is None or score > best_score):
                best_score = score
                save_checkpoint(os.path.join(run_dir, "best"),
                                jax.device_get(state), keep=1)
    print("training complete:", run_dir)


if __name__ == "__main__":
    main()

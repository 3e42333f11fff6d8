"""Evaluation CLI.

Behavioral reference: tools/test.py (build test dataset + checkpoint,
run model, dataset.evaluate with --eval bbox|map). Predictions come out
of one jitted program as fixed-shape masked arrays and are converted to
per-sample lists on the host.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("checkpoint")
    ap.add_argument("--eval", default="bbox", choices=["bbox", "map"])
    ap.add_argument("--out-dir", default="runs/eval")
    ap.add_argument("opts", nargs="*")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bevfusion_tpu.config import load_config
    from bevfusion_tpu.data import DataLoader, build_dataset
    from bevfusion_tpu.models import build_model
    from bevfusion_tpu.runtime.checkpoint import restore_checkpoint

    # multi-host rendezvous (the reference's torchpack dist.init,
    # tools/test.py:115); single-process runs skip it
    if (os.environ.get("JAX_COORDINATOR_ADDRESS")
            or int(os.environ.get("JAX_NUM_PROCESSES", "1")) > 1):
        jax.distributed.initialize()
    rank, world = jax.process_index(), jax.process_count()

    cfg = load_config(args.config)
    model = build_model(cfg.model)
    dataset = build_dataset(cfg.data.test)
    # round-robin dataset shard per process (multi_gpu_test semantics,
    # reference tools/test.py:198-203)
    loader = DataLoader(dataset, batch_size=1, shuffle=False, num_workers=2,
                        drop_last=False, num_shards=world, shard_id=rank)

    state = restore_checkpoint(args.checkpoint)
    variables = {
        "params": state["params"] if "params" in state else state,
        "batch_stats": state.get("batch_stats", {}),
    }

    from bevfusion_tpu.runtime.eval import evaluate_dataset

    os.makedirs(args.out_dir, exist_ok=True)
    metrics = evaluate_dataset(model, variables, dataset, loader,
                               metric=args.eval, out_dir=args.out_dir,
                               rank=rank, world=world,
                               tmpdir=os.path.join(args.out_dir, "parts"))
    if metrics is None:  # non-zero ranks: rank 0 evaluates and reports
        return
    for k, v in metrics.items():
        print(f"{k}: {v:.4f}")


if __name__ == "__main__":
    main()

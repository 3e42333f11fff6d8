"""GSPMD dry-run of the FLAGSHIP training step on a virtual device mesh.

`__graft_entry__.dryrun_multichip` proves the sharded train-step semantics
on a tiny config; this tool proves the *flagship-scale* program (real Swin-T,
real DepthLSS frustum, real SparseEncoder channel widths and site caps)
compiles and executes under GSPMD batch sharding — the thing that actually
OOMs or breaks at scale. Reference trains this model pure-DP over 8 GPUs
(/root/reference/mmdet3d/apis/train.py:48-53, tools/train.py).

Default is half linear BEV scale (720x720x41 voxels, halved site caps,
60k points/sample) so one step fits host RAM on the CPU backend; pass
--full for the 1440 grid. Run:

    python tools/dryrun_flagship_sharded.py --devices 2
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=2)
    ap.add_argument("--full", action="store_true",
                    help="full 1440x1440 grid instead of half scale")
    ap.add_argument("--points", type=int, default=60000)
    args = ap.parse_args()

    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    flags = " ".join(
        f for f in flags.split()
        if not f.startswith("--xla_force_host_platform_device_count"))
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={args.devices}"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from bevfusion_tpu.config import load_config
    from bevfusion_tpu.parallel import (
        batch_sharded, make_data_mesh, replicated, replicate_state,
        shard_batch,
    )
    from bevfusion_tpu.models import build_model
    from bevfusion_tpu.runtime.flagship import FLAGSHIP_CONFIG, synthetic_batch
    from bevfusion_tpu.runtime.train import (
        TrainState, build_lr_schedule, build_optimizer, make_train_step,
    )

    if args.full:
        cfg = load_config(FLAGSHIP_CONFIG)
    else:
        # Half linear scale, same structure: 0.15 m voxels -> 720^2 x 41
        # grid, camera BEV 0.6 m -> 180^2 (downsample 2 -> 90 = 720/8).
        # voxel_size is overridden BEFORE ${} interpolation so every
        # derived value (head train_cfg/test_cfg voxel_size, bbox_coder,
        # vtransform) re-resolves consistently; the literal (non-${})
        # scale knobs are overridden alongside.
        cfg = load_config(FLAGSHIP_CONFIG, overrides={
            "voxel_size": [0.15, 0.15, 0.2],
            "model.encoders.lidar.voxelize.max_voxels": [60000, 80000],
            "model.encoders.lidar.backbone.sparse_shape": [720, 720, 41],
            "model.encoders.lidar.backbone.site_caps": [50000, 30000, 18000],
            "model.encoders.camera.vtransform.xbound": [-54.0, 54.0, 0.6],
            "model.encoders.camera.vtransform.ybound": [-54.0, 54.0, 0.6],
            "model.heads.object.train_cfg.grid_size": [720, 720, 41],
            "model.heads.object.test_cfg.grid_size": [720, 720, 41],
        })

    model = build_model(cfg.model, dtype=jnp.bfloat16)
    batch = synthetic_batch(cfg, B=args.devices, num_points=args.points,
                            training=True)

    devices = jax.devices()
    assert len(devices) >= args.devices, (len(devices), args.devices)
    mesh = make_data_mesh(devices[: args.devices])

    t0 = time.time()
    variables = jax.jit(
        lambda b: model.init(jax.random.PRNGKey(0), b, training=True)
    )(batch)
    print(f"init: {time.time() - t0:.1f}s", flush=True)

    params = variables["params"]
    sched = build_lr_schedule(cfg.get("lr_config"), 1e-4, 1000)
    tx = build_optimizer({"type": "AdamW", "lr": 1e-4, "weight_decay": 0.01},
                         sched, params, grad_clip={"max_norm": 35})
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=tx.init(params))

    repl = replicated(mesh)
    dp = batch_sharded(mesh)
    batch = shard_batch(batch, mesh)
    state = replicate_state(state, mesh)

    step = jax.jit(
        make_train_step(model, tx),
        in_shardings=(repl, {k: dp for k in batch}, None),
        out_shardings=(repl, None),
    )
    t0 = time.time()
    rngs = {"dropout": jax.random.PRNGKey(1)}
    new_state, logs = step(state, batch, rngs)
    jax.block_until_ready(new_state.params)
    total = float(logs["loss/total"])
    print(f"step (compile+run): {time.time() - t0:.1f}s", flush=True)
    assert np.isfinite(total), logs
    scale = "full" if args.full else "half"
    print(f"dryrun_flagship_sharded({args.devices}, {scale}): ok, "
          f"loss/total={total:.4f}")


if __name__ == "__main__":
    main()

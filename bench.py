"""Benchmark: end-to-end fused camera+lidar inference FPS per chip.

Mirrors the reference harness semantics (tools/benchmark.py:58-87:
batch-1 wall clock with warmup, device-synchronized) on the flagship
convfuser config. Prints ONE JSON line; vs_baseline compares against the
25 FPS/chip target from BASELINE.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp

    from bevfusion_tpu.runtime.flagship import build_flagship

    cfg, model, batch = build_flagship(batch_size=1, dtype=jnp.bfloat16,
                                       num_points=120000)
    variables = jax.jit(
        lambda b: model.init(jax.random.PRNGKey(0), b, training=False)
    )(batch)

    @jax.jit
    def infer(vars_, batch_):
        out, _ = model.apply(vars_, batch_, training=False,
                             mutable=["batch_stats"])
        return out["boxes"]

    # warmup (compile + 5 runs, like the reference's warmup 5)
    out = infer(variables, batch)
    jax.block_until_ready(out)
    for _ in range(5):
        out = infer(variables, batch)
    jax.block_until_ready(out)

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = infer(variables, batch)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    fps = 1.0 / dt

    print(json.dumps({
        "metric": "fused_CL_inference_fps_per_chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 25.0, 4),
    }))


if __name__ == "__main__":
    main()

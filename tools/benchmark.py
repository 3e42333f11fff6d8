"""FPS benchmark CLI for any config (reference: tools/benchmark.py —
batch-1 wall clock, warmup 5, device-synchronized timing)."""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", nargs="?", default=None)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--batch-size", type=int, default=1)
    ap.add_argument("--points", type=int, default=120000)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bevfusion_tpu.runtime.flagship import build_flagship

    cfg, model, batch = build_flagship(
        batch_size=args.batch_size, dtype=jnp.bfloat16,
        config_path=args.config, num_points=args.points,
    )
    variables = jax.jit(
        lambda b: model.init(jax.random.PRNGKey(0), b, training=False)
    )(batch)

    @jax.jit
    def infer(v, b):
        out, _ = model.apply(v, b, training=False, mutable=["batch_stats"])
        return out

    out = infer(variables, batch)
    jax.block_until_ready(out)
    for _ in range(args.warmup):
        out = infer(variables, batch)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = infer(variables, batch)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / args.iters
    print(f"latency: {dt * 1e3:.2f} ms  fps: {args.batch_size / dt:.2f}")


if __name__ == "__main__":
    main()

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
    per_iter = "--per-iter" in sys.argv
    import jax
    import jax.numpy as jnp

    # cache compiled programs across runs (full-model TPU compile is slow)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from bevfusion_tpu.runtime.flagship import build_flagship

    # pool_lut: the BEVPoolv2-style calibration LUT (ops/bev_pool_lut.py)
    # is computed once on the host for the fixed camera rig — the same
    # precompute the reference's own 25 FPS deployment baseline
    # (CUDA-BEVFusion TensorRT, README.md:10,197) performs at build time
    cfg, model, batch = build_flagship(batch_size=1, dtype=jnp.bfloat16,
                                       num_points=120000, pool_lut=True)
    variables = jax.jit(
        lambda b: model.init(jax.random.PRNGKey(0), b, training=False)
    )(batch)

    from bevfusion_tpu.runtime.eval import _find_overflow

    @jax.jit
    def infer(vars_, batch_):
        out, state = model.apply(vars_, batch_, training=False,
                                 mutable=["batch_stats", "intermediates"])
        boxes = out["boxes"]
        ovf = _find_overflow(state.get("intermediates", {}))
        ovf = jnp.int32(0) if ovf is None else ovf
        # scalar checksum: fetching it forces the whole program to finish
        # (on the tunneled axon platform block_until_ready alone does not
        # synchronize with device execution)
        chk = (jnp.sum(boxes["scores"]) +
               jnp.sum(boxes["mask"].astype(jnp.float32)))
        return boxes, chk, ovf

    import numpy as np

    # warmup (compile + 5 runs, like the reference's warmup 5)
    for _ in range(5):
        out, chk, ovf = infer(variables, batch)
    float(np.asarray(chk))
    # hard guarantee: the windowed sparse-conv engine must not have
    # dropped a single neighbor on this scene (accuracy-silent otherwise)
    n_ovf = int(np.asarray(ovf))
    if n_ovf != 0:
        print(json.dumps({"error": "window_overflow", "count": n_ovf}),
              file=sys.stderr)
        sys.exit(1)

    iters = 50
    if per_iter:
        # per-iteration variance mode: sync (scalar fetch) every iter —
        # slightly slower absolute numbers, but exposes jitter that the
        # serialize-and-sync-once default hides
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            out, chk, ovf = infer(variables, batch)
            float(np.asarray(chk))
            times.append(time.perf_counter() - t0)
        ts = sorted(times)
        print(json.dumps({
            "metric": "per_iter_ms",
            "p50": round(ts[len(ts) // 2] * 1e3, 2),
            "p90": round(ts[int(len(ts) * 0.9)] * 1e3, 2),
            "min": round(ts[0] * 1e3, 2), "max": round(ts[-1] * 1e3, 2),
        }), file=sys.stderr)
        dt = ts[len(ts) // 2]
    else:
        t0 = time.perf_counter()
        for _ in range(iters):
            out, chk, ovf = infer(variables, batch)
        float(np.asarray(chk))  # one sync at the end; device runs serialize
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

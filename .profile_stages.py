import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from bevfusion_tpu.runtime.flagship import build_flagship
from bevfusion_tpu.utils.profiler import time_fn

cfg, model, batch = build_flagship(batch_size=1, dtype=jnp.bfloat16, num_points=120000)
vs = jax.jit(lambda b: model.init(jax.random.PRNGKey(0), b, training=False))(batch)
print("init done", flush=True)

def stage(name, fn, *args, iters=10):
    t0 = time.perf_counter()
    r = time_fn(fn, *args, iters=iters, warmup=2)
    print(f"{name}: {r['mean_ms']:.1f} ms (fps {r['fps']:.1f}) [compile+run {time.perf_counter()-t0:.0f}s]", flush=True)

# camera branch
stage("camera", lambda v, b: model.apply(
    v, b, training=False, mutable=["batch_stats"],
    method=lambda m, bb, training: m.extract_camera_features(bb, training))[0],
    vs, batch)

# lidar branch
stage("lidar", lambda v, b: model.apply(
    v, b, training=False, mutable=["batch_stats"],
    method=lambda m, bb, training: m.extract_lidar_features(bb, training))[0],
    vs, batch)

# full model
stage("full", lambda v, b: model.apply(v, b, training=False, mutable=["batch_stats"])[0]["boxes"],
      vs, batch, iters=10)

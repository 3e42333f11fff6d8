import sys
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from bevfusion_tpu.ops.bev_pool import lss_bev_pool
from bevfusion_tpu.utils.profiler import time_fn
rng = np.random.RandomState(0)
D, fH, fW, C = 118, 32, 88, 80
depth = jnp.array(rng.rand(1, 6, D, fH, fW).astype(np.float32))
ctx = jnp.array(rng.randn(1, 6, fH, fW, C).astype(np.float32))
cid = jnp.array(rng.randint(0, 360*360, (1, 6, D, fH, fW)).astype(np.int32))
val = jnp.array(rng.rand(1, 6, D, fH, fW) > 0.5)
r = time_fn(lambda d, c, i, v: lss_bev_pool(d, c, i, v, 1, 360, 360), depth, ctx, cid, val, iters=10)
print(f"lss_bev_pool (hot-table gather): {r['mean_ms']:.2f} ms", flush=True)
# bf16 context variant
r = time_fn(lambda d, c, i, v: lss_bev_pool(d, c.astype(jnp.bfloat16), i, v, 1, 360, 360), depth, ctx, cid, val, iters=10)
print(f"lss_bev_pool (bf16 ctx): {r['mean_ms']:.2f} ms", flush=True)

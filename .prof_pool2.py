import sys
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from bevfusion_tpu.utils.profiler import time_fn
rng = np.random.RandomState(0)
Np, C, ncell = 1993728, 80, 129600
ids = jnp.array(rng.randint(0, ncell, Np).astype(np.int32))
vals = jnp.array(rng.randn(Np, C).astype(np.float32))
pix = jnp.array(rng.randint(0, 16896, Np).astype(np.int32))
ctx = jnp.array(rng.randn(16896, C).astype(np.float32))
def t(name, fn, *a, iters=10):
    r = time_fn(fn, *a, iters=iters, warmup=2)
    print(f"{name}: {r['mean_ms']:.2f} ms", flush=True)
t("argsort 2M", lambda i: jnp.argsort(i), ids)
order = jnp.argsort(ids)
t("take scalar 2M", lambda o: jnp.take(ids, o), order)
t("take rows 2M x80 (big src)", lambda v, o: jnp.take(v, o, axis=0), vals, order)
t("take rows 2M x80 (hot 17k src)", lambda c, p: jnp.take(c, p, axis=0), ctx, pix)
t("cumsum 2M x80 fp32", lambda v: jnp.cumsum(v, axis=0), vals)
t("cumsum 2M x80 axis0 via scan-chunks", lambda v: jnp.cumsum(v.reshape(-1, 16, C).sum(1), axis=0), vals)

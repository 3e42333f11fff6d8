import sys
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from bevfusion_tpu.utils.profiler import time_fn
rng = np.random.RandomState(0)
Np, C, ncell = 1993728, 80, 129600
ids_s = jnp.sort(jnp.array(rng.randint(0, ncell, Np).astype(np.int32)))
pos = jnp.arange(Np, dtype=jnp.int32)
def t(name, fn, *a, iters=10):
    r = time_fn(fn, *a, iters=iters, warmup=2)
    print(f"{name}: {r['mean_ms']:.2f} ms", flush=True)
def boundary_scatter(i):
    head = jnp.concatenate([jnp.ones((1,), bool), i[1:] != i[:-1]])
    return jnp.zeros((ncell + 1,), jnp.int32).at[jnp.where(head, i, ncell)].set(pos, mode="drop", unique_indices=True)
t("boundary scatter 2M->130k", boundary_scatter, ids_s)
csum = jnp.array(rng.randn(Np+1, C).astype(np.float32))
se = jnp.array(rng.randint(0, Np, ncell).astype(np.int32))
t("prefix take 130k x80", lambda c, s: jnp.take(c, s, axis=0), csum, se)
d = jnp.array(rng.rand(Np).astype(np.float32))
rows = jnp.array(rng.randn(Np, C).astype(np.float32))
t("mul d*rows 2M x80", lambda a, b: a[:, None] * b, d, rows)
# combined pipeline pieces to see fusion behavior
def full(i):
    order = jnp.argsort(i)
    s = i[order]
    return order, s
t("argsort+take", full, ids_s)

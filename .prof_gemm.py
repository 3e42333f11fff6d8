import sys
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from bevfusion_tpu.ops import sparse_conv as sp
from bevfusion_tpu.utils.profiler import time_fn
rng = np.random.RandomState(0)
def t(name, fn, *a, iters=10):
    r = time_fn(fn, *a, iters=iters, warmup=2)
    print(f"{name}: {r['mean_ms']:.2f} ms", flush=True)

def flat_gemm(feats, nbr, w):
    cap, K = nbr.shape
    C = feats.shape[1]
    idx = jnp.maximum(nbr, 0).reshape(-1)
    g = jnp.take(feats, idx, axis=0).reshape(cap, K, C)
    g = jnp.where((nbr >= 0)[..., None], g, 0)
    return jax.lax.dot_general(
        g.reshape(cap, K * C), w.reshape(K * C, -1),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(feats.dtype)

for C, cap, tag in [(16, 160000, "s0"), (32, 100000, "s1")]:
    grid = sp.SparseGrid(1440, 1440, 41)
    n = int(cap * 0.75)
    ids = np.sort(rng.choice(grid.size, n, replace=False)).astype(np.int32)
    ids_pad = np.full(cap, grid.size, np.int32); ids_pad[:n] = ids
    nbr = sp.build_subm_rulebook(jnp.array(ids_pad), grid, 3)
    for dt, dn in [(jnp.float32, "fp32"), (jnp.bfloat16, "bf16")]:
        f = jnp.array(rng.randn(cap, C).astype(np.float32)).astype(dt)
        w = (jnp.array(rng.randn(27, C, C).astype(np.float32)) * 0.1).astype(dt)
        t(f"scan_gemm {tag} {dn}", sp.subm_gather_gemm, f, nbr, w)
        t(f"flat_gemm {tag} {dn}", flat_gemm, f, nbr, w)

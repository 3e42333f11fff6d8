import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from bevfusion_tpu.ops import sparse_conv as sp
from bevfusion_tpu.utils.profiler import time_fn

rng = np.random.RandomState(0)
def t(name, fn, *a, iters=10):
    r = time_fn(fn, *a, iters=iters, warmup=2)
    print(f"{name}: {r['mean_ms']:.2f} ms", flush=True)

grid = sp.SparseGrid(1440, 1440, 41)
cap, n = 160000, 120000
ids = np.sort(rng.choice(grid.size, n, replace=False)).astype(np.int32)
ids_pad = np.full(cap, grid.size, np.int32); ids_pad[:n] = ids
ids_j = jnp.array(ids_pad)
rb = sp.build_subm_window_rulebook(ids_j, grid, 3)
for C, capx, name in [(16, 160000, "s0"), (32, 100000, "s1"), (64, 60000, "s2"), (128, 36000, "s3")]:
    f = jnp.array(rng.randn(capx, C).astype(np.float32))
    fb = f.astype(jnp.bfloat16)
    rbx = sp.WindowRulebook(rb.base[:capx] % capx, rb.slot[:capx], rb.mask[:capx])
    w = jnp.array(rng.randn(27, C, C).astype(np.float32) * 0.1)
    t(f"win_gemm {name} cap{capx} C{C} fp32", sp.window_gather_gemm, f, rbx, w)
    t(f"win_gemm {name} cap{capx} C{C} bf16", sp.window_gather_gemm, fb, rbx, w.astype(jnp.bfloat16))
t("downsample_sites s2 (scatter-unique)", lambda i: sp.downsample_sites(i, grid, 3, 2, 1, cap), ids_j)
t("subm window rulebook 160k", lambda i: sp.build_subm_window_rulebook(i, grid, 3), ids_j)

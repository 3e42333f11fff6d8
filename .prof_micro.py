import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from bevfusion_tpu.ops import sparse_conv as sp
from bevfusion_tpu.ops.voxelize import voxelize_batch
from bevfusion_tpu.utils.profiler import time_fn

rng = np.random.RandomState(0)
grid = sp.SparseGrid(1440, 1440, 41)
cap = 160000
n = 120000
ids = np.sort(rng.choice(grid.size, n, replace=False)).astype(np.int32)
ids_pad = np.full(cap, grid.size, np.int32); ids_pad[:n] = ids
ids_j = jnp.array(ids_pad)
feats16 = jnp.array(rng.randn(cap, 16).astype(np.float32))
w27 = jnp.array(rng.randn(27, 16, 16).astype(np.float32) * 0.1)

def t(name, fn, *a, iters=10):
    r = time_fn(fn, *a, iters=iters, warmup=2)
    print(f"{name}: {r['mean_ms']:.2f} ms", flush=True)

t("sort 1.3M int32", lambda x: jnp.sort(x), jnp.array(rng.randint(0, 2**30, 1300000).astype(np.int32)))
t("argsort 120k", lambda x: jnp.argsort(x), jnp.array(rng.randint(0, 2**30, 120000).astype(np.int32)))
t("column_table build", lambda i: sp.build_column_table(i, grid), ids_j)
tbl = sp.build_column_table(ids_j, grid)
t("subm rulebook (w/ table build)", lambda i: sp.build_subm_rulebook(i, grid, 3), ids_j)
nbr = sp.build_subm_rulebook(ids_j, grid, 3)
t("gather_gemm 160k x16x16 k27", lambda f, nb, w: sp.subm_gather_gemm(f, nb, w), feats16, nbr, w27)
feats128 = jnp.array(rng.randn(40000, 128).astype(np.float32))
nbr128 = nbr[:40000] % 40000
w128 = jnp.array(rng.randn(27, 128, 128).astype(np.float32) * 0.1)
t("gather_gemm 40k x128x128 k27", lambda f, nb, w: sp.subm_gather_gemm(f, nb, w), feats128, nbr128, w128)
t("downsample_sites s2", lambda i: sp.downsample_sites(i, grid, 3, 2, 1, cap), ids_j)
t("segment_sum 160k->2M", lambda v, c: jax.ops.segment_sum(v, c, num_segments=2073601),
  jnp.ones(cap, jnp.uint32), jnp.array((ids_pad // 41) % 2073600))
# voxelize
pts = jnp.array(rng.uniform(-54, 54, (1, 120000, 5)).astype(np.float32))
mask = jnp.ones((1, 120000), bool)
t("voxelize 120k", lambda p, m: voxelize_batch(p, m, [0.075,0.075,0.2], [-54,-54,-5,54,54,3], 10, cap)[0], pts, mask)
# bev_pool scale
from bevfusion_tpu.ops.bev_pool import lss_bev_pool
D, fH, fW, C = 118, 32, 88, 80
depth = jnp.array(rng.rand(1, 6, D, fH, fW).astype(np.float32))
ctx = jnp.array(rng.randn(1, 6, fH, fW, C).astype(np.float32))
cid = jnp.array(rng.randint(0, 360*360, (1, 6, D, fH, fW)).astype(np.int32))
val = jnp.array(rng.rand(1, 6, D, fH, fW) > 0.5)
t("lss_bev_pool 2M pts", lambda d, c, i, v: lss_bev_pool(d, c, i, v, 1, 360, 360), depth, ctx, cid, val, iters=5)

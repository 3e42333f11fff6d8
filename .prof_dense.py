import sys
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from bevfusion_tpu.utils.profiler import time_fn
rng = np.random.RandomState(0)
def t(name, fn, *a, iters=5):
    r = time_fn(fn, *a, iters=iters, warmup=2)
    print(f"{name}: {r['mean_ms']:.2f} ms", flush=True)
for (X, Y, Z, C), tag in [((720, 720, 21, 32), "s1"), ((360, 360, 11, 64), "s2"),
                          ((180, 180, 5, 128), "s3")]:
    x = jnp.array(rng.randn(1, X, Y, Z, C).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.array(rng.randn(3, 3, 3, C, C).astype(np.float32)).astype(jnp.bfloat16) * 0.05
    conv = lambda a, k: jax.lax.conv_general_dilated(
        a, k, (1, 1, 1), [(1, 1)] * 3, dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    t(f"dense3d {tag} {X}x{Y}x{Z}x{C} subm", conv, x, w)
    # 2D reformulation: z folded into channels with banded weights
    x2 = x.reshape(1, X, Y, Z * C)
    w2 = jnp.array(rng.randn(3, 3, Z * C, Z * C).astype(np.float32)).astype(jnp.bfloat16) * 0.01
    conv2 = lambda a, k: jax.lax.conv_general_dilated(
        a, k, (1, 1), [(1, 1)] * 2, dimension_numbers=("NHWC", "HWIO", "NHWC"))
    t(f"dense2d {tag} {X}x{Y}x{Z*C} (z-in-ch, {Z}x flops)", conv2, x2, w2)
    # elementwise pass cost
    t(f"elementwise {tag}", lambda a: jnp.maximum(a, 0) * 1.0001, x)

"""Test env: force CPU backend.

NOTE: we deliberately do NOT set
--xla_force_host_platform_device_count=8 globally — with 8 virtual CPU
devices XLA CPU compilation/dispatch of our larger graphs slows down by
~50x (observed: 13s -> >9min for the CenterHead test). Sharding tests
spawn a subprocess with the flag instead (see test_parallel.py).
"""
import os

# hard override: this environment ships JAX_PLATFORMS=axon (a tunneled
# TPU) and pre-imports jax via sitecustomize, so setdefault would leave
# the whole suite running on the TPU backend.  Set BEVF_TEST_TPU=1 to
# run the (tpu-marked) kernel tests on the real chip instead.
ON_TPU = os.environ.get("BEVF_TEST_TPU") == "1"
if not ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

if not ON_TPU:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# persistent compile cache: the big fused-model graphs take minutes to
# compile on CPU XLA; cache them across pytest runs
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
# jax 0.9's DEFAULT matmul precision emulates bf16 even on CPU; tests
# compare against fp32 numpy oracles, so force exact fp32 matmuls here.
jax.config.update("jax_default_matmul_precision", "highest")

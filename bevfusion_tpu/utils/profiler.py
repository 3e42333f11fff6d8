"""Profiling & timing harness.

Behavioral reference: the reference has only tools/benchmark.py FPS
timing and a flops_counter (SURVEY §5). TPU equivalents here:
- `trace(logdir)`: context manager around jax.profiler (XPlane traces
  viewable in TensorBoard / xprof);
- `time_fn`: wall-clock timing that forces completion with a host fetch
  (on tunneled platforms `block_until_ready` may not synchronize);
- `flops_of`: compiled-program FLOPs/bytes from XLA cost analysis
  (replaces models/utils/flops_counter.py).
"""
from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["trace", "time_fn", "flops_of"]


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _checksum(tree) -> jnp.ndarray:
    leaves = [x for x in jax.tree_util.tree_leaves(tree)
              if hasattr(x, "dtype")]
    total = jnp.zeros((), jnp.float32)
    for leaf in leaves:
        total = total + jnp.sum(leaf.astype(jnp.float32))
    return total


def time_fn(fn: Callable, *args, iters: int = 20, warmup: int = 3) -> Dict[str, float]:
    """Time a jitted fn; returns ms stats. Completion is forced by
    fetching a scalar checksum of the outputs."""
    jfn = jax.jit(lambda *a: _checksum(fn(*a)))
    for _ in range(warmup):
        chk = jfn(*args)
    float(np.asarray(chk))
    t0 = time.perf_counter()
    for _ in range(iters):
        chk = jfn(*args)
    float(np.asarray(chk))
    dt = (time.perf_counter() - t0) / iters
    return {"mean_ms": dt * 1e3, "fps": 1.0 / dt}


def flops_of(fn: Callable, *args) -> Dict[str, float]:
    """XLA cost analysis of the compiled fn (flops, bytes accessed)."""
    compiled = jax.jit(fn).lower(*args).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    out = {}
    for k in ("flops", "bytes accessed", "transcendentals"):
        if cost and k in cost:
            out[k.replace(" ", "_")] = float(cost[k])
    mem = compiled.memory_analysis()
    if mem is not None:
        for attr in ("temp_size_in_bytes", "argument_size_in_bytes",
                     "output_size_in_bytes"):
            v = getattr(mem, attr, None)
            if v is not None:
                out[attr] = float(v)
    return out

"""Shared measurement fixtures for the kernel profiling tools.

One copy of the DeiT-S weight fixture, the model constants, and the
dispatch-overhead-corrected timer, so a numerics or overhead-constant
fix cannot land in one profiler and silently drift the other
(tools/profile_kernels.py and tools/profile_keep025.py both measure
against these).
"""

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

BATCH = 256
D = 384          # DeiT-S embed dim
H = 6            # DeiT-S heads
OVERHEAD = 0.027  # fixed per-call dispatch overhead of the TPU relay (s)
PEAK = 197e12    # v5e bf16 peak FLOP/s


def timeit(fn, x, iters, reps=5):
    """Best-of-reps wall time of fn(x), dispatch overhead subtracted,
    returned as ms per iteration (fn must chain `iters` iterations and
    return a scalar; float() forces the host fetch that actually
    synchronizes through the relay)."""
    float(fn(x))
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        float(fn(x))
        best = min(best, time.time() - t0 - OVERHEAD)
    return best / iters * 1000


def weights():
    """bf16 DeiT-S-shaped block weights (attention + MLP)."""
    k = jax.random.PRNGKey(1)
    return {
        "ls": jnp.ones((D,), jnp.bfloat16),
        "lb": jnp.zeros((D,), jnp.bfloat16),
        "wqkv": jax.random.normal(k, (D, 3 * D), jnp.bfloat16) * 0.02,
        "bqkv": jnp.zeros((3 * D,), jnp.bfloat16),
        "wproj": jax.random.normal(k, (D, D), jnp.bfloat16) * 0.02,
        "bproj": jnp.zeros((D,), jnp.bfloat16),
        "w1": jax.random.normal(k, (D, 4 * D), jnp.bfloat16) * 0.02,
        "b1": jnp.zeros((4 * D,), jnp.bfloat16),
        "w2": jax.random.normal(k, (4 * D, D), jnp.bfloat16) * 0.02,
        "b2": jnp.zeros((D,), jnp.bfloat16),
    }

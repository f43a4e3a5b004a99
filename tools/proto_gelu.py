"""Experiment: where does the fused MLP kernel's non-MXU 40% go?

At N=197 b256 (tile 256 x 197 cells) the kernel measures ~1.0 ms vs a
0.60 ms pure-matmul bound (60% of bf16 peak). Variants timed here, each
swapped in at trace time:

  erf(A&S)   -- production kernel
  identity   -- activation replaced by identity: NO change => the GELU
                VPU time is already hidden behind the chunked matmuls
  no-LN      -- LayerNorm replaced by a plain cast: bounds the serial
                VPU head of each grid cell
  chunks=K   -- hidden-dim chunk count 1/2/4/8: finer VPU/MXU interleave

Conclusions (v5e, 2026-08-17 run, recorded in BASELINE.md): activation
and LN are both off the critical path; the 60% is the MXU's real
efficiency on back-to-back [256,384]x[384,H] matmuls with per-cell
serialization. chunks=2 remains the best setting.
"""

import functools
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from tokenreduction_tpu.ops import fused_mlp

BATCH = 256
ITERS = 40
D = 384
OVERHEAD = 0.027


def timeit(fn, x):
    float(jnp.sum(fn(x)))
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        float(jnp.sum(fn(x)))
        best = min(best, time.time() - t0 - OVERHEAD)
    return best / ITERS * 1000


def _mlp_rows_no_ln(x32, dtype, ls_ref, lb_ref, w1_ref, b1_ref, w2_ref,
                    b2_ref, eps, chunks):
    ln = x32.astype(dtype)
    Dh = w1_ref.shape[1]
    Do = w2_ref.shape[1]
    cs = Dh // chunks
    acc = jnp.zeros((x32.shape[0], Do), jnp.float32)
    for c in range(chunks):
        h = jax.lax.dot_general(
            ln, w1_ref[:, c * cs:(c + 1) * cs], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1_ref[0, c * cs:(c + 1) * cs].astype(jnp.float32)
        h = 0.5 * h * (1.0 + fused_mlp._erf(h * (2.0 ** -0.5)))
        acc = acc + jax.lax.dot_general(
            h.astype(dtype), w2_ref[c * cs:(c + 1) * cs, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    return x32 + acc + b2_ref[...].astype(jnp.float32)


def bench(n, label, rows_fn=None, erf_fn=None, chunks=None):
    saved_rows = fused_mlp._mlp_rows
    saved_erf = fused_mlp._erf
    if rows_fn is not None:
        fused_mlp._mlp_rows = rows_fn
    if erf_fn is not None:
        fused_mlp._erf = erf_fn
    if chunks is not None:
        rows0 = saved_rows

        def forced(x32, dtype, ls, lb, w1, b1, w2, b2, eps, _c):
            return rows0(x32, dtype, ls, lb, w1, b1, w2, b2, eps, chunks)
        fused_mlp._mlp_rows = forced
    try:
        # fused_mlp_residual is module-level @jax.jit: its trace (built
        # by the FIRST bench) would be silently reused for every later
        # variant, timing the unpatched kernel. Drop all trace caches so
        # the patched globals are actually re-traced.
        jax.clear_caches()
        k = jax.random.PRNGKey(1)
        ls = jnp.ones((D,), jnp.bfloat16)
        lb = jnp.zeros((D,), jnp.bfloat16)
        w1 = jax.random.normal(k, (D, 4 * D), jnp.bfloat16) * 0.02
        b1 = jnp.zeros((4 * D,), jnp.bfloat16)
        w2 = jax.random.normal(k, (4 * D, D), jnp.bfloat16) * 0.02
        b2 = jnp.zeros((D,), jnp.bfloat16)
        x0 = jax.random.normal(jax.random.PRNGKey(2), (BATCH, n, D),
                               jnp.bfloat16)

        @jax.jit
        def run(x):
            def step(carry, _):
                y = fused_mlp.fused_mlp_residual(
                    carry, ls, lb, w1, b1, w2, b2)
                return y.astype(carry.dtype), None
            y, _ = jax.lax.scan(step, x, None, length=ITERS)
            return jnp.sum(y.astype(jnp.float32))

        ms = timeit(run, x0)
        print(f"  N={n:4d} {label:10s} {ms * 1000:8.0f} us")
        return ms
    finally:
        fused_mlp._mlp_rows = saved_rows
        fused_mlp._erf = saved_erf


def _erf_tanh(x):
    # tanh-form GELU expressed as an erf substitute: gelu(h) =
    # 0.5*h*(1+erf(h/sqrt(2))), so erf(y) ~ tanh(sqrt(2/pi)*sqrt(2)*
    # (y + 0.044715*(sqrt(2)y)^3 / sqrt(2)))... simpler: substitute so
    # that 0.5h(1+_erf(h*2^-0.5)) == 0.5h(1+tanh(0.7978845608*
    # (h + 0.044715 h^3))). Called with x = h*2^-0.5 -> h = x*sqrt(2).
    h = x * 1.4142135623730951
    return jnp.tanh(0.7978845608028654 * (h + 0.044715 * h * h * h))


def main():
    for n in (197,):
        bench(n, "erf(A&S)")
        bench(n, "identity", erf_fn=lambda x: x)
        bench(n, "tanh", erf_fn=_erf_tanh)
        bench(n, "no-LN", rows_fn=_mlp_rows_no_ln)
        for c in (1, 4, 8):
            bench(n, f"chunks={c}", chunks=c)


if __name__ == "__main__":
    main()

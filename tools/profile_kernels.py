"""Per-kernel per-width timings for the fused eval kernels (TPU):
which of attention/MLP loses MXU efficiency at the reduced widths."""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

BATCH = 256
ITERS = 40
D = 384
H = 6
OVERHEAD = 0.027


def timeit(fn, *args):
    float(fn(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        float(fn(*args))
        best = min(best, time.time() - t0 - OVERHEAD)
    return best / ITERS * 1000  # ms per call


def weights():
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


def attn_chain(n):
    from tokenreduction_tpu.ops.flash_attention import fused_block_attention
    w = weights()
    x0 = jax.random.normal(jax.random.PRNGKey(2), (BATCH, n, D),
                           jnp.bfloat16)

    @jax.jit
    def run(x):
        def step(carry, _):
            y, _, _ = fused_block_attention(
                carry, w["ls"], w["lb"], w["wqkv"], w["bqkv"],
                w["wproj"], w["bproj"], H, (D // H) ** -0.5)
            return carry + y * 1e-6, None
        y, _ = jax.lax.scan(step, x, None, length=ITERS)
        return jnp.mean(y)
    return run, x0


def mlp_chain(n):
    from tokenreduction_tpu.ops.fused_mlp import fused_mlp_residual
    w = weights()
    x0 = jax.random.normal(jax.random.PRNGKey(2), (BATCH, n, D),
                           jnp.bfloat16)

    @jax.jit
    def run(x):
        def step(carry, _):
            y = fused_mlp_residual(
                carry, w["ls"], w["lb"], w["w1"], w["b1"], w["w2"],
                w["b2"])
            return carry + y * 1e-6, None
        y, _ = jax.lax.scan(step, x, None, length=ITERS)
        return jnp.mean(y)
    return run, x0


def main():
    print("devices:", jax.devices())
    peak = 197e12  # measured bf16 matmul peak
    for n in (197, 138, 97, 68):
        fn, x = attn_chain(n)
        ms = timeit(fn, x)
        flops = 2 * BATCH * n * (4 * D * D + 2 * n * D)
        eff = flops / (ms / 1000) / peak
        print(f"attn  N={n:3d}  {ms:7.3f} ms   {eff*100:5.1f}% of peak",
              flush=True)
    for n in (197, 138, 97, 68):
        fn, x = mlp_chain(n)
        ms = timeit(fn, x)
        flops = 2 * BATCH * n * 8 * D * D
        eff = flops / (ms / 1000) / peak
        print(f"mlp   N={n:3d}  {ms:7.3f} ms   {eff*100:5.1f}% of peak",
              flush=True)


if __name__ == "__main__":
    main()

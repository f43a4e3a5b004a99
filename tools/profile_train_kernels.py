"""Per-kernel fwd+bwd timings for the training branch kernels (v5e):
where the backward pass loses its 2x-fwd FLOP budget.

For each width: time value_and_grad of a scan-chained branch through
(a) attend_branch_train, (b) mlp_branch, against their FLOP ideals
(bwd = 2x fwd for both dgrad+wgrad).
"""

import functools
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

B, D, H = 256, 384, 6
ITERS = 20
OVERHEAD = 0.027
PEAK = 197e12  # bf16 matmul peak


def timeit(fn, *args):
    float(jax.tree_util.tree_leaves(fn(*args))[0].reshape(-1)[0])
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        r = fn(*args)
        float(jax.tree_util.tree_leaves(r)[0].reshape(-1)[0])
        best = min(best, time.time() - t0 - OVERHEAD)
    return best / ITERS * 1000


def wts():
    k = jax.random.PRNGKey(0)
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


def attn_vjp_chain(n):
    from tokenreduction_tpu.ops.fused_block_train import attend_branch_train
    w = wts()
    x0 = jax.random.normal(jax.random.PRNGKey(1), (B, n, D), jnp.bfloat16)

    def loss(w, x):
        def body(c, _):
            br, _ = attend_branch_train(
                c, w["ls"], w["lb"], w["wqkv"], w["bqkv"],
                w["wproj"], w["bproj"], H, (D // H) ** -0.5, 1e-6)
            return c + br * 1e-3, None
        y, _ = jax.lax.scan(body, x, None, length=ITERS)
        return jnp.mean(y)

    g = jax.jit(jax.grad(loss))
    return lambda: g(w, x0)


def mlp_vjp_chain(n):
    from tokenreduction_tpu.ops.fused_mlp_train import mlp_branch
    w = wts()
    x0 = jax.random.normal(jax.random.PRNGKey(1), (B, n, D), jnp.bfloat16)

    def loss(w, x):
        def body(c, _):
            br = mlp_branch(c, w["ls"], w["lb"], w["w1"], w["b1"],
                            w["w2"], w["b2"], 1e-6)
            return c + br * 1e-3, None
        y, _ = jax.lax.scan(body, x, None, length=ITERS)
        return jnp.mean(y)

    g = jax.jit(jax.grad(loss))
    return lambda: g(w, x0)


if __name__ == "__main__":
    print("devices:", jax.devices())
    for n in (197, 138, 97, 68):
        ms = timeit(attn_vjp_chain(n))
        flops = 3 * 2 * B * n * (4 * D * D + 2 * n * D)  # fwd + 2x bwd
        print(f"attn fwd+bwd N={n:3d}  {ms:7.3f} ms  "
              f"{flops / (ms / 1000) / PEAK * 100:5.1f}% of peak (bf16)",
              flush=True)
    for n in (197, 138, 97, 68):
        ms = timeit(mlp_vjp_chain(n))
        flops = 3 * 2 * B * n * 8 * D * D
        print(f"mlp  fwd+bwd N={n:3d}  {ms:7.3f} ms  "
              f"{flops / (ms / 1000) / PEAK * 100:5.1f}% of peak (bf16)",
              flush=True)

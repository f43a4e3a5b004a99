"""Per-kernel per-width timings for the fused eval kernels (TPU):
which of attention/MLP loses MXU efficiency at the reduced widths."""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from tools._measure import BATCH, D, H, PEAK, timeit, weights

ITERS = 40


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
    for n in (197, 138, 97, 68):
        fn, x = attn_chain(n)
        ms = timeit(fn, x, ITERS, reps=3)
        flops = 2 * BATCH * n * (4 * D * D + 2 * n * D)
        eff = flops / (ms / 1000) / PEAK
        print(f"attn  N={n:3d}  {ms:7.3f} ms   {eff*100:5.1f}% of peak",
              flush=True)
    for n in (197, 138, 97, 68):
        fn, x = mlp_chain(n)
        ms = timeit(fn, x, ITERS, reps=3)
        flops = 2 * BATCH * n * 8 * D * D
        eff = flops / (ms / 1000) / PEAK
        print(f"mlp   N={n:3d}  {ms:7.3f} ms   {eff*100:5.1f}% of peak",
              flush=True)


if __name__ == "__main__":
    main()

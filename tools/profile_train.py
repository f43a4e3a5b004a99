"""Training-step ablation profiler (TPU): decompose the topk@0.7 b256 amp
train step into fwd / bwd / optimizer+EMA, with and without the opt-in
Pallas training kernels (VERDICT item 4)."""

import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

BATCH = 256
ITERS = 8
OVERHEAD = 0.027


def timeit(fn, *args):
    jax.block_until_ready(fn(*args))
    r = fn(*args)
    float(jax.tree_util.tree_leaves(r)[0].reshape(-1)[0])
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        r = fn(*args)
        float(jax.tree_util.tree_leaves(r)[0].reshape(-1)[0])
        best = min(best, time.time() - t0 - OVERHEAD)
    return best / ITERS * 1000  # ms per step


def build(amp=True):
    from tokenreduction_tpu import create_model
    from tokenreduction_tpu.train import losses as L
    from tokenreduction_tpu.train.optim import OptimConfig, create_optimizer
    from tokenreduction_tpu.train.step import (
        StepConfig, TrainState, make_multi_train_step, make_train_step)

    module, cfg = create_model(
        "topk_small_patch16_224", num_classes=1000,
        reduction_loc=(3, 6, 9), keep_rate=(0.7,), drop_path_rate=0.1)
    x = jnp.ones((2, 224, 224, 3), jnp.float32)
    params = jax.jit(lambda: module.init(
        {"params": jax.random.PRNGKey(0)}, x, train=False)["params"])()
    tx, _ = create_optimizer(
        params, OptimConfig(lr=1e-3, clip_grad=1.0,
                            backbone_lr_scale=0.01),
        lambda s: 1e-3, [], steps_per_epoch=100)
    scfg = StepConfig(grad_accum_steps=1, ema_decay=0.99996, amp=amp)
    step = make_train_step(
        lambda p, im, train, rngs: module.apply(
            {"params": p}, im, train=train, rngs=rngs),
        lambda out, t, i, p: L.label_smoothing_ce(out, t, 0.1), tx, scfg)
    multi = make_multi_train_step(step)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        opt_state=tx.init(params),
        ema_params=jax.tree_util.tree_map(jnp.copy, params))
    return module, params, state, multi, scfg


def batches(S):
    return {
        "image": jax.random.normal(
            jax.random.PRNGKey(1), (S, BATCH, 224, 224, 3), jnp.float32),
        "label": jax.random.randint(
            jax.random.PRNGKey(2), (S, BATCH), 0, 1000),
    }


def main():
    print("devices:", jax.devices(),
          "pallas_train:", os.environ.get(
              "TOKENREDUCTION_USE_PALLAS_TRAIN", "0"))
    module, params, state, multi, scfg = build(amp=True)
    from tokenreduction_tpu.train import losses as L
    from tokenreduction_tpu.train.step import _cast_tree

    b = batches(ITERS)

    # 1. fwd only (amp), scanned
    def fwd_loss(p, im, lb, rng):
        rngs = {"dropout": rng, "droppath": rng}
        pc = _cast_tree(p, jnp.bfloat16)
        out = module.apply({"params": pc}, im.astype(jnp.bfloat16),
                           train=True, rngs=rngs)
        return L.label_smoothing_ce(out, lb, 0.1).astype(jnp.float32)

    @jax.jit
    def fwd_chain(p, bb):
        def body(c, inp):
            im, lb = inp
            return c + fwd_loss(p, im, lb, jax.random.PRNGKey(0)) * 1e-6, \
                None
        y, _ = jax.lax.scan(body, jnp.zeros(()), (bb["image"], bb["label"]))
        return y

    print(f"fwd_only      {timeit(fwd_chain, params, b):8.2f} ms/step",
          flush=True)

    # 2. fwd+bwd, scanned
    gfn = jax.value_and_grad(fwd_loss)

    @jax.jit
    def grad_chain(p, bb):
        def body(c, inp):
            im, lb = inp
            loss, g = gfn(p, im, lb, jax.random.PRNGKey(0))
            gn = sum(jnp.sum(jnp.square(x))
                     for x in jax.tree_util.tree_leaves(g))
            return c + loss * 1e-6 + gn * 1e-12, None
        y, _ = jax.lax.scan(body, jnp.zeros(()), (bb["image"], bb["label"]))
        return y

    print(f"fwd_bwd       {timeit(grad_chain, params, b):8.2f} ms/step",
          flush=True)

    # 3. full train step (opt update + EMA), multi-step scan
    @jax.jit
    def full_chain(st, bb):
        st, metrics = multi(st, bb, jax.random.PRNGKey(3))
        return metrics["loss"]

    ms = timeit(full_chain, state, b)
    print(f"full_step     {ms:8.2f} ms/step", flush=True)
    print(f"train img/s: {BATCH / ms * 1000:.0f}", flush=True)


if __name__ == "__main__":
    main()

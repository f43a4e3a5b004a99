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

jax.config.update("jax_compilation_cache_dir", "/root/.jaxcache")

BATCH = 256
ITERS = 20  # default; bench_one scales per-model so device time >~500ms


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
            # chain the iterations through ONE element of the carry: a
            # full-tensor `carry + mean*eps` costs ~190us/iter of HBM
            # traffic (77MB bf16 read+write) paid by BOTH models, biasing
            # the speedup ratio toward 1 (2.7% of the keep-0.25 model's
            # 7ms iteration vs 1.1% of dense's). The 1-element
            # dynamic-update-slice keeps the data dependency (no
            # execution can be elided or hoisted) at ~zero cost.
            bump = jnp.mean(logits).astype(carry.dtype) * 1e-6
            return carry.at[0, 0, 0, 0].add(bump), None

        y, _ = jax.lax.scan(body, x, None, length=n)
        return jnp.mean(y)

    return chain, params, x


# fixed per-call dispatch overhead of the TPU relay (measured ~27ms);
# subtracted so the metric reflects steady-state device throughput
CALL_OVERHEAD_S = 0.027

TRAIN_ITERS = 8


def bench_train(name="topk_small_patch16_224", reduction_loc=(3, 6, 9),
                keep_rate=(0.7,), batch=None):
    """Full train-step throughput (b256, amp, adamw grouped, EMA),
    steps fused via make_multi_train_step."""
    from tokenreduction_tpu import create_model
    from tokenreduction_tpu.train import losses as L
    from tokenreduction_tpu.train.optim import (
        OptimConfig,
        create_optimizer,
    )
    from tokenreduction_tpu.train.step import (
        StepConfig,
        TrainState,
        make_multi_train_step,
        make_train_step,
    )

    batch = batch or BATCH
    module, _ = create_model(
        name, num_classes=1000,
        reduction_loc=reduction_loc, keep_rate=keep_rate,
        drop_path_rate=0.1)
    xi = jnp.ones((2, 224, 224, 3), jnp.float32)
    params = jax.jit(lambda: module.init(
        {"params": jax.random.PRNGKey(0)}, xi, train=False)["params"])()
    tx, _ = create_optimizer(
        params, OptimConfig(lr=1e-3, clip_grad=1.0,
                            backbone_lr_scale=0.01),
        lambda s: 1e-3, [], steps_per_epoch=100)
    step = make_train_step(
        lambda p, im, train, rngs: module.apply(
            {"params": p}, im, train=train, rngs=rngs),
        lambda out, t, i, p: L.label_smoothing_ce(out, t, 0.1), tx,
        StepConfig(grad_accum_steps=1, ema_decay=0.99996, amp=True))
    multi = jax.jit(make_multi_train_step(step))
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        opt_state=tx.init(params),
        ema_params=jax.tree_util.tree_map(jnp.copy, params))
    batches = {
        "image": jax.random.normal(
            jax.random.PRNGKey(1),
            (TRAIN_ITERS, batch, 224, 224, 3), jnp.float32),
        "label": jax.random.randint(
            jax.random.PRNGKey(2), (TRAIN_ITERS, batch), 0, 1000),
    }

    def run(st):
        st, metrics = multi(st, batches, jax.random.PRNGKey(3))
        float(metrics["loss"][-1])  # host fetch forces completion
        return st

    state = run(state)  # warmup + compile
    best = 0.0
    for _ in range(3):
        t0 = time.time()
        state = run(state)
        dt = max(time.time() - t0 - CALL_OVERHEAD_S, 1e-6)
        best = max(best, batch * TRAIN_ITERS / dt)
    return best


def bench_samples(chain, params, x, repeats=5):
    """img/s samples (one per timed run) for spread reporting."""
    float(chain(params, x, ITERS))  # warmup + compile
    # Scale the iteration count so each timed run has >~500ms of device
    # time: with the fixed ~27ms dispatch overhead subtracted, residual
    # dispatch jitter (+-5-10ms) then costs <2% on the ratio.  At the
    # default 20 iters the keep-0.25 model finishes in ~175ms and the
    # jitter alone swings its vs-dense ratio by +-6% run to run.
    t0 = time.time()
    float(chain(params, x, ITERS))
    per_iter = max((time.time() - t0 - CALL_OVERHEAD_S) / ITERS, 1e-4)
    # round up to a multiple of 20 so the scan length (a static arg, hence
    # a distinct compiled program) is stable run-to-run for the compile cache
    iters = max(ITERS, -20 * (-int(0.45 / per_iter) // 20))
    if iters != ITERS:
        # the scaled scan length is a new static arg -> a new compile;
        # warm it up OUTSIDE the timed loop or the first sample's spread
        # is dominated by compile time, not run-to-run noise
        float(chain(params, x, iters))
    samples = []
    for _ in range(repeats):
        t0 = time.time()
        float(chain(params, x, iters))  # host fetch forces completion
        dt = max(time.time() - t0 - CALL_OVERHEAD_S, 1e-6)
        samples.append(BATCH * iters / dt)
    return samples


def bench_one(chain, params, x):
    return max(bench_samples(chain, params, x, repeats=3))


# v5e bf16 peak (public spec: 197 TFLOP/s bf16 per chip)
V5E_BF16_PEAK = 197e12


def model_flops(name, **kw):
    """Analytic forward FLOPs/image (2 x MACs) of the big matmuls:
    patch embed + per-block attention (at the block's INPUT width; the
    reduction runs inside its block after attention) + per-block MLP
    (at the OUTPUT width) + head. Reduction-op FLOPs (scores, cluster
    assignment) are O(N*D) or O(N^2) without the D^2 factor and are
    deliberately excluded (<1% for these schedules), so MFU here is
    "useful transformer FLOPs / peak" -- the standard convention."""
    from tokenreduction_tpu import create_model

    _, cfg = create_model(name, num_classes=1000, **kw)
    from tokenreduction_tpu.core.config import reduction_schedule

    D, R = cfg.embed_dim, cfg.mlp_ratio
    prefix = 2 if cfg.distilled else 1
    sched = (reduction_schedule(cfg) if cfg.reduction_loc else ())
    loc_to_width = {
        loc: cnt + prefix for loc, cnt in zip(cfg.reduction_loc, sched)}
    total = 2 * cfg.num_patches * (cfg.patch_size ** 2 * cfg.in_chans) * D
    n = cfg.num_patches + prefix
    for i in range(cfg.depth):
        n_in = n
        n = loc_to_width.get(i, n)
        # qkv + proj (4*D^2 per token) + scores/attn-v (4*N^2*D)
        total += 2 * n_in * D * (3 * D) + 4 * n_in * n_in * D \
            + 2 * n_in * D * D
        total += 2 * 2 * n * D * int(R * D)  # fc1 + fc2
    total += 2 * D * cfg.num_classes
    return total


def main():
    chain_r, p_r, x_r = make_chain(
        "topk_small_patch16_224", reduction_loc=(3, 6, 9), keep_rate=(0.7,))
    s_reduced = bench_samples(chain_r, p_r, x_r)
    ips_reduced = max(s_reduced)
    chain_q, p_q, x_q = make_chain(
        "topk_small_patch16_224", reduction_loc=(3, 6, 9),
        keep_rate=(0.25,))
    s_quarter = bench_samples(chain_q, p_q, x_q)
    ips_quarter = max(s_quarter)
    chain_d, p_d, x_d = make_chain("deit_small_patch16_224_local")
    s_dense = bench_samples(chain_d, p_d, x_d)
    ips_dense = max(s_dense)
    ips_train = bench_train()
    f_dense = model_flops("deit_small_patch16_224_local")
    f_07 = model_flops("topk_small_patch16_224", reduction_loc=(3, 6, 9),
                       keep_rate=(0.7,))
    f_025 = model_flops("topk_small_patch16_224", reduction_loc=(3, 6, 9),
                        keep_rate=(0.25,))
    # Physics at keep 0.7 / loc 3 6 9 (tokens 197->138->97->68): the
    # block-FLOP ratio vs dense is 0.644 -> ceiling 1.55x against an
    # equally-optimized dense baseline; the same fused kernels measured
    # width-by-width give 1.489x (MXU efficiency drops at reduced N).
    # See BASELINE.md "Throughput ceiling".
    def stats(samples):
        ss = sorted(samples)
        return {"best": round(ss[-1], 1), "median": round(ss[len(ss) // 2], 1),
                "spread_pct": round(100 * (ss[-1] - ss[0]) / ss[-1], 1)}

    # MFU = useful model FLOPs actually delivered / chip peak. Train
    # uses the standard fwd+bwd ~= 3x forward-FLOP convention on the
    # keep-0.7 schedule (the backward recompute inside the kernels is
    # overhead, not useful work, so it is NOT counted).
    print(json.dumps({
        "metric": "images/sec/chip topk_small_patch16_224 keep0.7 bf16 "
                  "b%d (dense DeiT-S: %.0f img/s; FLOP ceiling 1.55x, "
                  "measured-kernel ceiling 1.49x; keep0.25: %.0f img/s "
                  "= %.2fx vs 2.54x measured-kernel / 3.1x FLOP ceiling;"
                  " train fwd+bwd+opt: %.0f img/s)" % (
                      BATCH, ips_dense, ips_quarter,
                      ips_quarter / ips_dense, ips_train),
        "value": round(ips_reduced, 1),
        "unit": "img/s",
        "vs_baseline": round(ips_reduced / ips_dense, 3),
        "vs_baseline_median": round(
            sorted(s_reduced)[len(s_reduced) // 2]
            / sorted(s_dense)[len(s_dense) // 2], 3),
        "keep025_img_s": round(ips_quarter, 1),
        "keep025_vs_dense": round(ips_quarter / ips_dense, 3),
        "dense_img_s": round(ips_dense, 1),
        "train_img_s": round(ips_train, 1),
        "samples": {"keep07": stats(s_reduced),
                    "keep025": stats(s_quarter),
                    "dense": stats(s_dense)},
        "mfu_dense": round(ips_dense * f_dense / V5E_BF16_PEAK, 4),
        "mfu_keep07": round(ips_reduced * f_07 / V5E_BF16_PEAK, 4),
        "mfu_keep025": round(ips_quarter * f_025 / V5E_BF16_PEAK, 4),
        "mfu_train": round(ips_train * 3 * f_07 / V5E_BF16_PEAK, 4),
    }))


if __name__ == "__main__":
    sys.exit(main())

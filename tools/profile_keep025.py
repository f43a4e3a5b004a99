"""keep-0.25 throughput decomposition (VERDICT r3 item 1).

Measures, on the real chip:
 1. per-width fused-kernel times at the keep-0.25 schedule
    (197 -> 50 -> 13 -> 4 tokens incl. CLS), iteration counts scaled so
    tiny widths are not noise-dominated
 2. the full topk@0.25 model and the dense model (chained scans)
 3. the patch-embed + head fixed costs
and prints the measured-kernel ceiling exactly like the keep-0.7
analysis in BASELINE.md.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from tools._measure import BATCH, D, H, PEAK, timeit, weights


def attn_time(n, iters):
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
        y, _ = jax.lax.scan(step, x, None, length=iters)
        return jnp.mean(y)
    return timeit(run, x0, iters)


def mlp_time(n, iters):
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
        y, _ = jax.lax.scan(step, x, None, length=iters)
        return jnp.mean(y)
    return timeit(run, x0, iters)


def model_time(name, iters=20, **kw):
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

    @jax.jit
    def run(x):
        def body(carry, _):
            out = module.apply({"params": params}, carry, train=False)
            logits = out[0] if isinstance(out, tuple) else out
            return carry + jnp.mean(logits).astype(carry.dtype) * 1e-6, None
        y, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.mean(y)
    return timeit(run, x, iters)


def patch_embed_time(iters=100):
    k = jax.random.PRNGKey(1)
    wc = jax.random.normal(k, (16, 16, 3, D), jnp.bfloat16) * 0.02
    x0 = jax.random.normal(k, (BATCH, 224, 224, 3), jnp.bfloat16)

    @jax.jit
    def run(x):
        def step(carry, _):
            y = jax.lax.conv_general_dilated(
                carry, wc, (16, 16), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return carry + jnp.mean(y).astype(carry.dtype) * 1e-9, None
        y, _ = jax.lax.scan(step, x0, None, length=iters)
        return jnp.mean(y)
    return timeit(run, x0, iters)


def flops_attn(n):
    return 2 * BATCH * n * (4 * D * D + 2 * n * D)


def flops_mlp(n):
    return 2 * BATCH * n * 8 * D * D


def main():
    print("devices:", jax.devices(), flush=True)
    widths = {197: 40, 138: 60, 97: 80, 68: 100, 50: 120, 13: 300, 4: 400}
    at, mt = {}, {}
    for n, iters in widths.items():
        at[n] = attn_time(n, iters)
        mt[n] = mlp_time(n, iters)
        print(f"N={n:3d}  attn {at[n]*1000:7.1f} us "
              f"({flops_attn(n) * 1000 / at[n] / PEAK * 100:4.1f}%)"
              f"   mlp {mt[n]*1000:7.1f} us "
              f"({flops_mlp(n) * 1000 / mt[n] / PEAK * 100:4.1f}%)",
              flush=True)

    pe = patch_embed_time()
    print(f"patch embed: {pe*1000:.1f} us", flush=True)

    # schedules: attn widths x counts, mlp widths x counts
    sched = {
        "dense": ([(197, 12)], [(197, 12)]),
        "keep0.7": ([(197, 4), (138, 3), (97, 3), (68, 2)],
                    [(197, 3), (138, 3), (97, 3), (68, 3)]),
        "keep0.25": ([(197, 4), (50, 3), (13, 3), (4, 2)],
                     [(197, 3), (50, 3), (13, 3), (4, 3)]),
    }
    sums = {}
    for name, (aw, mw) in sched.items():
        s = sum(at[n] * c for n, c in aw) + sum(mt[n] * c for n, c in mw)
        sums[name] = s + pe
        print(f"kernel-sum {name}: {s + pe:7.3f} ms", flush=True)

    t_dense = model_time("deit_small_patch16_224_local")
    t_07 = model_time("topk_small_patch16_224",
                      reduction_loc=(3, 6, 9), keep_rate=(0.7,))
    t_025 = model_time("topk_small_patch16_224",
                       reduction_loc=(3, 6, 9), keep_rate=(0.25,))
    print(f"model dense   : {t_dense:7.3f} ms  "
          f"(glue {t_dense - sums['dense']:+.3f})", flush=True)
    print(f"model keep0.7 : {t_07:7.3f} ms  "
          f"(glue {t_07 - sums['keep0.7']:+.3f})", flush=True)
    print(f"model keep0.25: {t_025:7.3f} ms  "
          f"(glue {t_025 - sums['keep0.25']:+.3f})", flush=True)
    print(f"measured ratio 0.7 : {t_dense / t_07:5.3f} "
          f"(kernel ceiling {sums['dense'] / sums['keep0.7']:5.3f})")
    print(f"measured ratio 0.25: {t_dense / t_025:5.3f} "
          f"(kernel ceiling {sums['dense'] / sums['keep0.25']:5.3f})")


if __name__ == "__main__":
    main()

"""Eval-path ablation profiler (TPU): decompose the topk@0.7 forward into
kernel floor vs glue (embed / classify / top_k+gather) to locate the
remaining distance to the FLOP ceiling (VERDICT item 3).

Each component is timed as a scan-chained jitted program with a host
fetch for sync; the relay's fixed ~27ms dispatch overhead is subtracted.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

BATCH = 256
ITERS = 20
D = 384
H = 6
OVERHEAD = 0.027

# topk@0.7 / loc (3,6,9): attend widths per block, mlp widths per block
ATTN_W = [197, 197, 197, 197, 138, 138, 138, 97, 97, 97, 68, 68]
MLP_W = [197, 197, 197, 138, 138, 138, 97, 97, 97, 68, 68, 68]


def timeit(fn, *args):
    float(fn(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        float(fn(*args))
        best = min(best, time.time() - t0 - OVERHEAD)
    return best / ITERS * 1000  # ms per model-equivalent


def chain(body, x0):
    @jax.jit
    def run(x):
        def step(carry, _):
            out = body(carry)
            return carry + out * 1e-6, None
        y, _ = jax.lax.scan(step, x, None, length=ITERS)
        return jnp.mean(y)
    return run, x0


def model_chain(name, **kw):
    from tokenreduction_tpu import create_model
    module, _ = create_model(name, num_classes=1000, **kw)
    x = jax.random.normal(jax.random.PRNGKey(0),
                          (BATCH, 224, 224, 3), jnp.bfloat16)
    params = jax.jit(lambda: module.init(
        {"params": jax.random.PRNGKey(0)}, x, train=False)["params"])()
    params = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16)
        if jnp.issubdtype(p.dtype, jnp.floating) else p, params)

    def body(carry):
        out = module.apply({"params": params}, carry, train=False)
        logits = out[0] if isinstance(out, tuple) else out
        return jnp.mean(logits).astype(carry.dtype)
    return chain(body, x)


def kernel_floor_chain(attn_w, mlp_w):
    from tokenreduction_tpu.ops.flash_attention import fused_block_attention
    from tokenreduction_tpu.ops.fused_mlp import fused_mlp_residual
    k = jax.random.PRNGKey(1)
    w = {
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
    x0 = jax.random.normal(k, (BATCH, 197, D), jnp.bfloat16)

    def body(carry):
        x = carry
        for aw, mw in zip(attn_w, mlp_w):
            x = x[:, :aw]
            x, _, _ = fused_block_attention(
                x, w["ls"], w["lb"], w["wqkv"], w["bqkv"],
                w["wproj"], w["bproj"], H, (D // H) ** -0.5)
            x = x[:, :mw]
            x = fused_mlp_residual(
                x, w["ls"], w["lb"], w["w1"], w["b1"], w["w2"], w["b2"])
        return jnp.mean(x).astype(carry.dtype)
    return chain(body, x0)


def glue_chain():
    """top_k + gather + concat at the three reduction stage shapes."""
    from tokenreduction_tpu.ops.gather import take_tokens
    k = jax.random.PRNGKey(2)
    x0 = jax.random.normal(k, (BATCH, 197, D), jnp.bfloat16)

    def body(carry):
        acc = jnp.zeros((), jnp.bfloat16)
        x = carry
        for left in (137, 96, 67):
            score = x[:, 1:, 0].astype(jnp.float32)
            _, idx = jax.lax.top_k(score, left)
            x = jnp.concatenate([x[:, :1], take_tokens(x[:, 1:], idx)],
                                axis=1)
            acc = acc + jnp.mean(x).astype(jnp.bfloat16)
        return acc
    return chain(body, x0)


def embed_chain():
    from tokenreduction_tpu import create_model
    module, _ = create_model("deit_small_patch16_224_local",
                             num_classes=1000)
    x = jax.random.normal(jax.random.PRNGKey(0),
                          (BATCH, 224, 224, 3), jnp.bfloat16)
    params = jax.jit(lambda: module.init(
        {"params": jax.random.PRNGKey(0)}, x, train=False)["params"])()
    params = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16)
        if jnp.issubdtype(p.dtype, jnp.floating) else p, params)

    def body(carry):
        e = module.apply({"params": params}, carry,
                         method=lambda m, im: m.embed(im))
        return jnp.mean(e).astype(carry.dtype)
    return chain(body, x)


def classify_chain():
    from tokenreduction_tpu import create_model
    module, _ = create_model("deit_small_patch16_224_local",
                             num_classes=1000)
    xi = jax.random.normal(jax.random.PRNGKey(0),
                           (1, 224, 224, 3), jnp.bfloat16)
    params = jax.jit(lambda: module.init(
        {"params": jax.random.PRNGKey(0)}, xi, train=False)["params"])()
    params = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16)
        if jnp.issubdtype(p.dtype, jnp.floating) else p, params)
    x0 = jax.random.normal(jax.random.PRNGKey(1),
                           (BATCH, 68, D), jnp.bfloat16)

    def body(carry):
        out = module.apply({"params": params}, carry,
                           method=lambda m, t: m.classify(t, False))
        return jnp.mean(out).astype(carry.dtype)
    return chain(body, x0)


def main():
    print("devices:", jax.devices())
    results = {}
    for name, (fn, x) in [
        ("full_topk07", model_chain("topk_small_patch16_224",
                                    reduction_loc=(3, 6, 9),
                                    keep_rate=(0.7,))),
        ("full_dense", model_chain("deit_small_patch16_224_local")),
        ("kern_reduced", kernel_floor_chain(ATTN_W, MLP_W)),
        ("kern_dense", kernel_floor_chain([197] * 12, [197] * 12)),
        ("glue_topk_gather", glue_chain()),
        ("embed", embed_chain()),
        ("classify_w68", classify_chain()),
    ]:
        ms = timeit(fn, x)
        results[name] = ms
        print(f"{name:20s} {ms:8.3f} ms  ({BATCH/ms*1000:9.0f} img/s)",
              flush=True)
    glue_total = (results["full_topk07"] - results["kern_reduced"]
                  - results["embed"] - results["classify_w68"]
                  - results["glue_topk_gather"])
    print(f"\nunaccounted glue in full_topk07: {glue_total:.3f} ms")
    print(f"kernel ratio: dense/reduced = "
          f"{results['kern_dense']/results['kern_reduced']:.3f} "
          f"(FLOP ceiling 1.57)")


if __name__ == "__main__":
    main()

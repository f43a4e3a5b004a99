"""Prototype attention-core variants for fused_block_attention (v5e).

Findings (v5e, b256, bf16, dispatch-corrected):
- loop (current kernel structure) wins at every width;
- stacked cross-head softmax loses ~8% (concat copies cost more than
  the 6 small softmaxes they replace);
- AV head-pair packing (block-diag V for full 128 lanes) fails to
  compile on the remote TPU toolchain (scoped-VMEM pressure from the
  per-pair temporaries) -- and the math says it cannot win anyway:
  block-diagonal packing doubles the contraction dim with zero blocks,
  trading lane-padding waste for zero-block waste exactly 1:1 in MXU
  block-passes. The hd=64 per-head matmuls are intrinsically ~27-50%
  efficient on the 128-lane MXU; a bwd-kernel ablation (N=197, G=2)
  shows them at 73% of the backward's time (1.7 of 2.33 ms) vs 0.62 ms
  for all joint GEMMs+LN+wgrads, with softmax VPU at ~12%;
- image-group size is flat from G=2..16 at every width.
Conclusion: the per-head [N,64] matmuls' lane/contraction under-fill is
the remaining, structural cost at reduced widths (BASELINE.md
"Throughput ceiling").
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

B, D, H = 256, 384, 6
hd = D // H
SCALE = hd ** -0.5


def make_kernel(variant: str, n: int, G: int):
    def kern(x_ref, wqkv_ref, wproj_ref, o_ref):
        x = x_ref[...].reshape(G * n, D)
        qkv = jax.lax.dot_general(
            x, wqkv_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(x.dtype)
        outs = []
        for g in range(G):
            if variant == "loop":
                merged = []
                for h in range(H):
                    q = qkv[g * n:(g + 1) * n, h * hd:(h + 1) * hd]
                    k = qkv[g * n:(g + 1) * n,
                            (H + h) * hd:(H + h + 1) * hd]
                    v = qkv[g * n:(g + 1) * n,
                            (2 * H + h) * hd:(2 * H + h + 1) * hd]
                    logits = jax.lax.dot_general(
                        q, k, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32) * SCALE
                    m_ = jnp.max(logits, -1, keepdims=True)
                    e = jnp.exp(logits - m_)
                    probs = e / jnp.sum(e, -1, keepdims=True)
                    merged.append(jax.lax.dot_general(
                        probs.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32).astype(x.dtype))
                outs.append(jnp.concatenate(merged, -1))
            elif variant == "avpair":
                # per-head QK^T/softmax; AV packed per head PAIR:
                # [P_h | P_h1] [n, 2n] @ blockdiag(V_h, V_h1) [2n, 128]
                # = [O_h | O_h1] -- full 128 lanes instead of 64
                merged = []
                for h0 in range(0, H, 2):
                    ps = []
                    vs = []
                    for h in (h0, h0 + 1):
                        q = qkv[g * n:(g + 1) * n, h * hd:(h + 1) * hd]
                        k = qkv[g * n:(g + 1) * n,
                                (H + h) * hd:(H + h + 1) * hd]
                        logits = jax.lax.dot_general(
                            q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * SCALE
                        m_ = jnp.max(logits, -1, keepdims=True)
                        e = jnp.exp(logits - m_)
                        ps.append(e / jnp.sum(e, -1, keepdims=True))
                        vs.append(qkv[g * n:(g + 1) * n,
                                      (2 * H + h) * hd:
                                      (2 * H + h + 1) * hd])
                    p2 = jnp.concatenate(ps, 1).astype(x.dtype)  # [n,2n]
                    z = jnp.zeros((n, hd), x.dtype)
                    vblk = jnp.concatenate([
                        jnp.concatenate([vs[0], z], 1),
                        jnp.concatenate([z, vs[1]], 1)], 0)  # [2n,128]
                    merged.append(jax.lax.dot_general(
                        p2, vblk, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ).astype(x.dtype))
                outs.append(jnp.concatenate(merged, -1))
            else:
                # stacked: one [H*n, n] logits buffer, one softmax
                ls = []
                for h in range(H):
                    q = qkv[g * n:(g + 1) * n, h * hd:(h + 1) * hd]
                    k = qkv[g * n:(g + 1) * n,
                            (H + h) * hd:(H + h + 1) * hd]
                    ls.append(jax.lax.dot_general(
                        q, k, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32))
                logits = jnp.concatenate(ls, 0) * SCALE  # [H*n, n]
                m_ = jnp.max(logits, -1, keepdims=True)
                e = jnp.exp(logits - m_)
                probs = (e / jnp.sum(e, -1, keepdims=True))
                merged = []
                for h in range(H):
                    v = qkv[g * n:(g + 1) * n,
                            (2 * H + h) * hd:(2 * H + h + 1) * hd]
                    p = probs[h * n:(h + 1) * n]
                    merged.append(jax.lax.dot_general(
                        p.astype(x.dtype), v, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32).astype(x.dtype))
                outs.append(jnp.concatenate(merged, -1))
        attn = jnp.concatenate(outs, 0)
        proj = jax.lax.dot_general(
            attn, wproj_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[...] = (x.astype(jnp.float32)
                      + proj).astype(o_ref.dtype).reshape(G, n, D)
    return kern


def build(variant, n, G):
    key = jax.random.PRNGKey(0)
    wqkv = jax.random.normal(key, (D, 3 * D), jnp.bfloat16) * 0.02
    wproj = jax.random.normal(key, (D, D), jnp.bfloat16) * 0.02
    x0 = jax.random.normal(key, (B, n, D), jnp.bfloat16)

    f = pl.pallas_call(
        make_kernel(variant, n, G),
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((G, n, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 3 * D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, n, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n, D), jnp.bfloat16),
    )

    @jax.jit
    def run(x):
        def step(c, _):
            return c + f(c, wqkv, wproj) * 1e-6, None
        y, _ = jax.lax.scan(step, x, None, length=40)
        return jnp.mean(y)
    return run, x0


def timeit(f, *a):
    float(jnp.asarray(f(*a)).mean())
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        float(jnp.asarray(f(*a)).mean())
        best = min(best, time.time() - t0 - 0.027)
    return best / 40 * 1e3


if __name__ == "__main__":
    for n in (138, 197, 97, 68):
        for variant in ("loop", "avpair"):
            for G in (8,):
                if B % G:
                    continue
                try:
                    run, x0 = build(variant, n, G)
                    print(f"N={n} {variant} G={G}: {timeit(run, x0):.3f} ms",
                          flush=True)
                except Exception as e:
                    print(f"N={n} {variant} G={G}: FAIL {str(e)[:90]}",
                          flush=True)

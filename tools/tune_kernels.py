"""Kernel-variant tuning on the TPU (round 2 eval perf):
1. decompose the topk+gather glue (top_k vs approx_max_k vs gather/concat)
2. fused block attention: joint-qkv matmul over G images per cell
3. fused MLP: hidden-dim chunking to overlap erf (VPU) with matmuls (MXU)
Winners get ported into tokenreduction_tpu/ops/.
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
    return best / ITERS * 1000


def chain(body, x0):
    @jax.jit
    def run(x):
        def step(carry, _):
            out = body(carry)
            return carry + out * 1e-6, None
        y, _ = jax.lax.scan(step, x, None, length=ITERS)
        return jnp.mean(y)
    return run, x0


# ------------------------------------------------- 1. glue decomposition
def glue_variants():
    k = jax.random.PRNGKey(2)
    x0 = jax.random.normal(k, (BATCH, 197, D), jnp.bfloat16)

    def body_topk_only(carry):
        acc = jnp.zeros((), jnp.float32)
        for left, n in ((137, 197), (96, 138), (67, 97)):
            score = carry[:, 1:n, 0].astype(jnp.float32)
            _, idx = jax.lax.top_k(score, left)
            acc += jnp.sum(idx).astype(jnp.float32) * 1e-9
        return acc.astype(carry.dtype)

    def body_approx_only(carry):
        acc = jnp.zeros((), jnp.float32)
        for left, n in ((137, 197), (96, 138), (67, 97)):
            score = carry[:, 1:n, 0].astype(jnp.float32)
            _, idx = jax.lax.approx_max_k(score, left)
            acc += jnp.sum(idx).astype(jnp.float32) * 1e-9
        return acc.astype(carry.dtype)

    def body_gather_only(carry):
        x = carry
        for left in (137, 96, 67):
            idx = jnp.broadcast_to(jnp.arange(left + 1), (BATCH, left + 1))
            x = jnp.take_along_axis(x, idx[..., None], axis=1)
        return jnp.mean(x).astype(carry.dtype)

    def body_single_gather(carry):
        x = carry
        for left in (137, 96, 67):
            score = x[:, 1:, 0].astype(jnp.float32)
            _, idx = jax.lax.top_k(score, left)
            full = jnp.concatenate(
                [jnp.zeros((BATCH, 1), idx.dtype), idx + 1], axis=1)
            x = jnp.take_along_axis(x, full[..., None], axis=1)
        return jnp.mean(x).astype(carry.dtype)

    def body_single_gather_approx(carry):
        x = carry
        for left in (137, 96, 67):
            score = x[:, 1:, 0].astype(jnp.float32)
            _, idx = jax.lax.approx_max_k(score, left)
            full = jnp.concatenate(
                [jnp.zeros((BATCH, 1), idx.dtype), idx + 1], axis=1)
            x = jnp.take_along_axis(x, full[..., None], axis=1)
        return jnp.mean(x).astype(carry.dtype)

    for name, body in [("topk_only", body_topk_only),
                       ("approx_topk_only", body_approx_only),
                       ("gather_only", body_gather_only),
                       ("single_gather", body_single_gather),
                       ("single_gather_approx", body_single_gather_approx)]:
        fn, x = chain(body, x0)
        print(f"glue/{name:22s} {timeit(fn, x):7.3f} ms", flush=True)


# ------------------------------------- 2. joint-qkv grouped attention
def _attn_joint_kernel(x_ref, ls_ref, lb_ref, wqkv_ref, bqkv_ref,
                       wproj_ref, bproj_ref, o_ref, row0_ref, colsum_ref,
                       *, scale, num_heads, eps, group, n):
    G = group
    x = x_ref[...].reshape(G * n, D)
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, -1, keepdims=True)
    xc = x32 - mu
    var = jnp.mean(xc * xc, -1, keepdims=True)
    ln = xc * jax.lax.rsqrt(var + eps) * ls_ref[...].astype(jnp.float32) \
        + lb_ref[...].astype(jnp.float32)
    qkv = jax.lax.dot_general(
        ln.astype(x.dtype), wqkv_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bqkv_ref[...].astype(jnp.float32)
    qkv = qkv.astype(x.dtype)  # [G*n, 3D]
    hd = D // num_heads
    outs = []
    for g in range(G):
        merged = []
        for h in range(num_heads):
            q = qkv[g * n:(g + 1) * n, h * hd:(h + 1) * hd]
            k = qkv[g * n:(g + 1) * n,
                    (num_heads + h) * hd:(num_heads + h + 1) * hd]
            v = qkv[g * n:(g + 1) * n,
                    (2 * num_heads + h) * hd:(2 * num_heads + h + 1) * hd]
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            m_ = jnp.max(logits, axis=-1, keepdims=True)
            e = jnp.exp(logits - m_)
            probs = e / jnp.sum(e, axis=-1, keepdims=True)
            merged.append(jax.lax.dot_general(
                probs.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(x.dtype))
            row0_ref[g, h] = probs[0:1, :]
            colsum_ref[g, h] = jnp.sum(probs, axis=0, keepdims=True)
        outs.append(jnp.concatenate(merged, axis=-1))
    attn_out = jnp.concatenate(outs, axis=0)  # [G*n, D]
    proj = jax.lax.dot_general(
        attn_out, wproj_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bproj_ref[...].astype(jnp.float32)
    o_ref[...] = (x32 + proj).astype(o_ref.dtype).reshape(G, n, D)


def attn_joint(x, w, num_heads, scale, group, eps=1e-6):
    B, N, _ = x.shape
    kern = functools.partial(
        _attn_joint_kernel, scale=scale, num_heads=num_heads, eps=eps,
        group=group, n=N)
    out, row0, colsum = pl.pallas_call(
        kern,
        grid=(B // group,),
        in_specs=[
            pl.BlockSpec((group, N, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
            pl.BlockSpec((D, 3 * D), lambda i: (0, 0)),
            pl.BlockSpec((1, 3 * D), lambda i: (0, 0)),
            pl.BlockSpec((D, D), lambda i: (0, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((group, N, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, num_heads, 1, N),
                         lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((group, num_heads, 1, N),
                         lambda i: (i, 0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, N, D), x.dtype),
            jax.ShapeDtypeStruct((B, num_heads, 1, N), jnp.float32),
            jax.ShapeDtypeStruct((B, num_heads, 1, N), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * (4 * D * D + 2 * N * D),
            bytes_accessed=2 * B * N * D * x.dtype.itemsize,
            transcendentals=B * num_heads * N * N,
        ),
    )(x, w["ls"].reshape(1, D), w["lb"].reshape(1, D), w["wqkv"],
      w["bqkv"].reshape(1, 3 * D), w["wproj"], w["bproj"].reshape(1, D))
    return out


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


def attn_variants():
    from tokenreduction_tpu.ops.flash_attention import fused_block_attention
    w = weights()
    for n in (197, 138, 97, 68):
        x0 = jax.random.normal(jax.random.PRNGKey(2), (BATCH, n, D),
                               jnp.bfloat16)
        fn, x = chain(lambda c: fused_block_attention(
            c, w["ls"], w["lb"], w["wqkv"], w["bqkv"], w["wproj"],
            w["bproj"], H, (D // H) ** -0.5)[0] * 1.0, x0)
        base = timeit(fn, x)
        print(f"attn/current      N={n:3d} {base:7.3f} ms", flush=True)
        for G in (2, 4, 8):
            try:
                fn, x = chain(functools.partial(
                    attn_joint, w=w, num_heads=H,
                    scale=(D // H) ** -0.5, group=G), x0)
                ms = timeit(fn, x)
            except Exception as e:
                ms = float("nan")
                print(f"  joint G={G} failed: {type(e).__name__}",
                      flush=True)
                continue
            print(f"attn/joint G={G}    N={n:3d} {ms:7.3f} ms", flush=True)


# ----------------------------------------------- 3. chunked-hidden MLP
def _erf(x):
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _mlp_chunk_kernel(x_ref, ls_ref, lb_ref, w1_ref, b1_ref, w2_ref,
                      b2_ref, o_ref, *, eps, chunks):
    x = x_ref[...]
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, -1, keepdims=True)
    xc = x32 - mu
    var = jnp.mean(xc * xc, -1, keepdims=True)
    ln = (xc * jax.lax.rsqrt(var + eps)
          * ls_ref[...].astype(jnp.float32)
          + lb_ref[...].astype(jnp.float32)).astype(x.dtype)
    Dh = w1_ref.shape[1]
    cs = Dh // chunks
    acc = jnp.zeros((x.shape[0], D), jnp.float32)
    for c in range(chunks):
        h = jax.lax.dot_general(
            ln, w1_ref[:, c * cs:(c + 1) * cs], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1_ref[0, c * cs:(c + 1) * cs].astype(jnp.float32)
        h = 0.5 * h * (1.0 + _erf(h * (2.0 ** -0.5)))
        acc = acc + jax.lax.dot_general(
            h.astype(x.dtype), w2_ref[c * cs:(c + 1) * cs, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    o_ref[...] = (x32 + acc + b2_ref[...].astype(jnp.float32)
                  ).astype(o_ref.dtype)


def mlp_chunked(x, w, chunks, tile=512, eps=1e-6):
    B, N, _ = x.shape
    M = B * N
    xf = x.reshape(M, D)
    while M % tile:
        tile //= 2
    kern = functools.partial(_mlp_chunk_kernel, eps=eps, chunks=chunks)
    out = pl.pallas_call(
        kern,
        grid=(M // tile,),
        in_specs=[
            pl.BlockSpec((tile, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
            pl.BlockSpec((D, 4 * D), lambda i: (0, 0)),
            pl.BlockSpec((1, 4 * D), lambda i: (0, 0)),
            pl.BlockSpec((4 * D, D), lambda i: (0, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tile, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, D), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * 8 * D * D,
            bytes_accessed=2 * M * D * x.dtype.itemsize,
            transcendentals=M * 4 * D,
        ),
    )(xf, w["ls"].reshape(1, D), w["lb"].reshape(1, D), w["w1"],
      w["b1"].reshape(1, 4 * D), w["w2"], w["b2"].reshape(1, D))
    return out.reshape(B, N, D)


def mlp_variants():
    from tokenreduction_tpu.ops.fused_mlp import fused_mlp_residual
    w = weights()
    for n in (197, 68):
        x0 = jax.random.normal(jax.random.PRNGKey(2), (BATCH, n, D),
                               jnp.bfloat16)
        fn, x = chain(lambda c: fused_mlp_residual(
            c, w["ls"], w["lb"], w["w1"], w["b1"], w["w2"], w["b2"]), x0)
        print(f"mlp/current       N={n:3d} {timeit(fn, x):7.3f} ms",
              flush=True)
        for chunks in (2, 4):
            fn, x = chain(functools.partial(
                mlp_chunked, w=w, chunks=chunks), x0)
            print(f"mlp/chunks={chunks}      N={n:3d} "
                  f"{timeit(fn, x):7.3f} ms", flush=True)
        # numeric check vs current
        a = fused_mlp_residual(x0, w["ls"], w["lb"], w["w1"], w["b1"],
                               w["w2"], w["b2"])
        b = mlp_chunked(x0, w, 4)
        print("  max|diff|:",
              float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                    - b.astype(jnp.float32)))), flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices())
    glue_variants()
    attn_variants()
    mlp_variants()

"""Round-5 probe: fuse residual + per-image droppath scaling INTO the
whole-branch training kernels.

Production composition (core/layers.py): `out = x + drop_path(branch)`
with `branch` from the custom_vjp Pallas kernel — so XLA runs one axpy
over [B,N,D] after the forward kernel (read x, read branch, write out)
and one scale pass before the backward kernel (dbranch = s*dy), plus
the dx+dy residual add after it. All four passes are pure HBM traffic
the kernels could absorb: x and dy are already kernel inputs, and
droppath is a per-image scalar s_b = mask_b/keep.

This tool measures value_and_grad of a scan-chained attention branch:
  outside: production attend_branch_train + XLA residual/droppath
  fused:   same kernels extended with an s input; fwd writes
           x + s*branch directly, bwd consumes dy once (db = s*dy rows
           in VMEM) and writes dx_total = dx_branch + dy

FINDINGS (v5e, 2026-08-21, round 5): MARGINAL — not adopted.
    N=197: outside 3.503 ms  fused 3.374 ms  (−3.7%)
    N=138: outside 2.893 ms  fused 2.879 ms  (−0.5%, in the noise)
    N=97:  outside 1.777 ms  fused 1.786 ms  (+0.5%, in the noise)
Width-weighted over a topk@0.7 step this is ~0.5 ms of 56.7 ms
(<1% throughput) — XLA already fuses the outside axpys efficiently;
the only real saving is at the widest blocks. Against that, fusing
moves the droppath multiply from the shared bf16 composition into
in-kernel f32 (grad deltas ~1e-2 bf16-rounding level), which would
break the bit-exact Pallas-vs-XLA mini-train trajectory gate
(tools/tpu_parity.py phase E, final-step |d| = 0.000) that currently
holds BECAUSE both paths share the outside residual/droppath ops.
Not worth the guarantee for <1%. Kernel-side s input needs a
full-array SMEM block indexed by program_id (small (G,1) blocks are
rejected by the (8,128) divisibility rule even in SMEM).
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

from tokenreduction_tpu.ops.flash_attention import (  # noqa: E402
    _flatten_rows,
    _write_rows,
    pin_default_matmul_precision,
)
from tokenreduction_tpu.ops import fused_block_train as FBT  # noqa: E402

B, D, H = 256, 384, 6
hd = D // H
SCALE = hd ** -0.5
EPS = 1e-6
ITERS = 20
OVERHEAD = 0.027


def _s_rows(s_ref, G, n):
    base = pl.program_id(0) * G
    return jnp.concatenate(
        [jnp.full((n, 1), s_ref[base + g, 0], jnp.float32)
         for g in range(G)], axis=0)


@pin_default_matmul_precision
def _fwd_kernel_res(x_ref, ls_ref, lb_ref, wqkv_ref, bqkv_ref, wproj_ref,
                    bproj_ref, s_ref, o_ref, row0_ref, *, scale,
                    num_heads, eps, group, n):
    G = group
    x32 = _flatten_rows(x_ref[...]).astype(jnp.float32)
    ln, _, _ = FBT._ln(x32, ls_ref[...].astype(jnp.float32),
                       lb_ref[...].astype(jnp.float32), eps)
    qkv = jax.lax.dot_general(
        ln.astype(o_ref.dtype), wqkv_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bqkv_ref[...].astype(jnp.float32)
    qkv = qkv.astype(o_ref.dtype)
    outs = []
    for g in range(G):
        merged = []
        for h in range(num_heads):
            q = qkv[g * n:(g + 1) * n, h * hd:(h + 1) * hd]
            k = qkv[g * n:(g + 1) * n,
                    (num_heads + h) * hd:(num_heads + h + 1) * hd]
            v = qkv[g * n:(g + 1) * n,
                    (2 * num_heads + h) * hd:(2 * num_heads + h + 1) * hd]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            m_ = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m_)
            p = e / jnp.sum(e, axis=-1, keepdims=True)
            merged.append(jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(o_ref.dtype))
            row0_ref[g, h] = p[0:1, :]
        outs.append(jnp.concatenate(merged, axis=-1))
    attn_out = jnp.concatenate(outs, axis=0)
    proj = jax.lax.dot_general(
        attn_out, wproj_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bproj_ref[...].astype(jnp.float32)
    out = x32 + _s_rows(s_ref, G, n) * proj
    _write_rows(o_ref, out.astype(o_ref.dtype), G, n)


@pin_default_matmul_precision
def _bwd_kernel_res(x_ref, ls_ref, lb_ref, wqkv_ref, bqkv_ref, wproj_ref,
                    s_ref, dy_ref, drow0_ref, dx_ref, dls_ref, dlb_ref,
                    dwqkv_ref, dbqkv_ref, dwproj_ref, dbproj_ref, *,
                    scale, num_heads, eps, group, n):
    G = group
    cdt = x_ref.dtype

    @pl.when(pl.program_id(0) == 0)
    def _():
        dls_ref[...] = jnp.zeros_like(dls_ref)
        dlb_ref[...] = jnp.zeros_like(dlb_ref)
        dwqkv_ref[...] = jnp.zeros_like(dwqkv_ref)
        dbqkv_ref[...] = jnp.zeros_like(dbqkv_ref)
        dwproj_ref[...] = jnp.zeros_like(dwproj_ref)
        dbproj_ref[...] = jnp.zeros_like(dbproj_ref)

    ls = ls_ref[...].astype(jnp.float32)
    x32 = _flatten_rows(x_ref[...]).astype(jnp.float32)
    ln32, x_hat, rstd = FBT._ln(x32, ls, lb_ref[...].astype(jnp.float32),
                                eps)
    ln = ln32.astype(cdt)
    qkv = jax.lax.dot_general(
        ln, wqkv_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bqkv_ref[...].astype(jnp.float32)
    qkv = qkv.astype(cdt)
    dy_res = _flatten_rows(dy_ref[...])                 # residual path
    dy = (dy_res.astype(jnp.float32)
          * _s_rows(s_ref, G, n)).astype(cdt)           # branch path

    dattn = jax.lax.dot_general(
        dy, wproj_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(cdt)

    attn_chunks = []
    dqkv_chunks = []
    for g in range(G):
        merged = []
        dq_h, dk_h, dv_h = [], [], []
        for h in range(num_heads):
            q = qkv[g * n:(g + 1) * n, h * hd:(h + 1) * hd]
            k = qkv[g * n:(g + 1) * n,
                    (num_heads + h) * hd:(num_heads + h + 1) * hd]
            v = qkv[g * n:(g + 1) * n,
                    (2 * num_heads + h) * hd:(2 * num_heads + h + 1) * hd]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            m_ = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m_)
            p = e / jnp.sum(e, axis=-1, keepdims=True)
            pc = p.astype(cdt)
            merged.append(jax.lax.dot_general(
                pc, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(cdt))
            do = dattn[g * n:(g + 1) * n, h * hd:(h + 1) * hd]
            dv = jax.lax.dot_general(
                pc, do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dp = jax.lax.dot_general(
                do, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            row_ids = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
            dp = dp + jnp.where(
                row_ids == 0,
                jnp.broadcast_to(drow0_ref[g, h].astype(jnp.float32),
                                 (n, n)),
                jnp.zeros((n, n), jnp.float32))
            ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
            ds = (ds * scale).astype(cdt)
            dq = jax.lax.dot_general(
                ds, k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dk = jax.lax.dot_general(
                ds, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dq_h.append(dq.astype(cdt))
            dk_h.append(dk.astype(cdt))
            dv_h.append(dv.astype(cdt))
        attn_chunks.append(jnp.concatenate(merged, axis=-1))
        dqkv_chunks.append(jnp.concatenate(dq_h + dk_h + dv_h, axis=-1))
    attn_out = jnp.concatenate(attn_chunks, axis=0)
    dqkv = jnp.concatenate(dqkv_chunks, axis=0)

    dwproj_ref[...] += jax.lax.dot_general(
        attn_out, dy, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbproj_ref[...] += jnp.sum(dy.astype(jnp.float32), 0, keepdims=True)
    dwqkv_ref[...] += jax.lax.dot_general(
        ln, dqkv, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbqkv_ref[...] += jnp.sum(dqkv.astype(jnp.float32), 0, keepdims=True)

    dln = jax.lax.dot_general(
        dqkv, wqkv_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dls_ref[...] += jnp.sum(dln * x_hat, 0, keepdims=True)
    dlb_ref[...] += jnp.sum(dln, 0, keepdims=True)
    dxhat = dln * ls
    m1 = jnp.mean(dxhat, -1, keepdims=True)
    m2 = jnp.mean(dxhat * x_hat, -1, keepdims=True)
    dx = rstd * (dxhat - m1 - x_hat * m2) + dy_res.astype(jnp.float32)
    _write_rows(dx_ref, dx.astype(dx_ref.dtype), G, n)


def _run_fwd_res(x, ls, lb, wqkv, bqkv, wproj, bproj, s, num_heads,
                 scale, eps):
    Bx, N, Dx = x.shape
    G = FBT._pick_group_train(Bx, N, Dx)
    kern = functools.partial(_fwd_kernel_res, scale=scale,
                             num_heads=num_heads, eps=eps, group=G, n=N)
    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    out, row0 = pl.pallas_call(
        kern,
        grid=(Bx // G,),
        in_specs=[
            pl.BlockSpec((G, N, Dx), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            const((1, Dx)), const((1, Dx)), const((Dx, 3 * Dx)),
            const((1, 3 * Dx)), const((Dx, Dx)), const((1, Dx)),
            pl.BlockSpec((Bx, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((G, N, Dx), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, num_heads, 1, N), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bx, N, Dx), x.dtype),
            jax.ShapeDtypeStruct((Bx, num_heads, 1, N), jnp.float32),
        ],
    )(x, ls.reshape(1, Dx), lb.reshape(1, Dx), wqkv,
      bqkv.reshape(1, 3 * Dx), wproj, bproj.reshape(1, Dx),
      s.reshape(Bx, 1))
    return out, row0[:, :, 0]


def _run_bwd_res(x, ls, lb, wqkv, bqkv, wproj, s, dy, drow0, num_heads,
                 scale, eps):
    Bx, N, Dx = x.shape
    G = FBT._pick_group_train(Bx, N, Dx, bwd=True)
    kern = functools.partial(_bwd_kernel_res, scale=scale,
                             num_heads=num_heads, eps=eps, group=G, n=N)
    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kern,
        grid=(Bx // G,),
        in_specs=[
            pl.BlockSpec((G, N, Dx), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            const((1, Dx)), const((1, Dx)), const((Dx, 3 * Dx)),
            const((1, 3 * Dx)), const((Dx, Dx)),
            pl.BlockSpec((Bx, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((G, N, Dx), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, num_heads, 1, N), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((G, N, Dx), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            const((1, Dx)), const((1, Dx)), const((Dx, 3 * Dx)),
            const((1, 3 * Dx)), const((Dx, Dx)), const((1, Dx)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bx, N, Dx), x.dtype),
            jax.ShapeDtypeStruct((1, Dx), jnp.float32),
            jax.ShapeDtypeStruct((1, Dx), jnp.float32),
            jax.ShapeDtypeStruct((Dx, 3 * Dx), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * Dx), jnp.float32),
            jax.ShapeDtypeStruct((Dx, Dx), jnp.float32),
            jax.ShapeDtypeStruct((1, Dx), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=24 * 1024 * 1024),
    )(x, ls.reshape(1, Dx), lb.reshape(1, Dx), wqkv,
      bqkv.reshape(1, 3 * Dx), wproj, s.reshape(Bx, 1), dy,
      drow0.reshape(Bx, num_heads, 1, N))
    dx, dls, dlb, dwqkv, dbqkv, dwproj, dbproj = outs
    return (dx, dls.reshape(ls.shape).astype(ls.dtype),
            dlb.reshape(lb.shape).astype(lb.dtype),
            dwqkv.astype(wqkv.dtype),
            dbqkv.reshape(bqkv.shape).astype(bqkv.dtype),
            dwproj.astype(wproj.dtype),
            dbproj.reshape((Dx,)).astype(ls.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def attend_block_res(x, ls, lb, wqkv, bqkv, wproj, bproj, s,
                     num_heads, scale, eps=1e-6):
    return _run_fwd_res(x, ls, lb, wqkv, bqkv, wproj, bproj, s,
                        num_heads, scale, eps)


def _res_fwd(x, ls, lb, wqkv, bqkv, wproj, bproj, s, num_heads, scale,
             eps):
    out = _run_fwd_res(x, ls, lb, wqkv, bqkv, wproj, bproj, s,
                       num_heads, scale, eps)
    return out, (x, ls, lb, wqkv, bqkv, wproj, s)


def _res_bwd(num_heads, scale, eps, resid, cts):
    x, ls, lb, wqkv, bqkv, wproj, s = resid
    dy, drow0 = cts
    dy = dy.astype(x.dtype)
    drow0 = drow0.astype(jnp.float32)
    dx, dls, dlb, dwqkv, dbqkv, dwproj, dbproj = _run_bwd_res(
        x, ls, lb, wqkv, bqkv, wproj, s, dy, drow0, num_heads, scale,
        eps)
    return dx, dls, dlb, dwqkv, dbqkv, dwproj, dbproj, None


attend_block_res.defvjp(_res_fwd, _res_bwd)


def wts():
    k = jax.random.PRNGKey(0)
    return {
        "ls": jnp.ones((D,), jnp.bfloat16),
        "lb": jnp.zeros((D,), jnp.bfloat16),
        "wqkv": jax.random.normal(k, (D, 3 * D), jnp.bfloat16) * 0.02,
        "bqkv": jnp.zeros((3 * D,), jnp.bfloat16),
        "wproj": jax.random.normal(k, (D, D), jnp.bfloat16) * 0.02,
        "bproj": jnp.zeros((D,), jnp.bfloat16),
    }


def chain(variant, n):
    w = wts()
    keys = jax.random.split(jax.random.PRNGKey(1), 3)
    x0 = jax.random.normal(keys[0], (B, n, D), jnp.bfloat16)
    # droppath keep mask at rate 0.1 (protocol drop_path for DeiT-S)
    s = (jax.random.bernoulli(keys[1], 0.9, (B,)).astype(jnp.float32)
         / 0.9)

    def loss(w, x):
        def body(c, _):
            if variant == "outside":
                from tokenreduction_tpu.ops.fused_block_train import (
                    attend_branch_train)
                br, row0 = attend_branch_train(
                    c, w["ls"], w["lb"], w["wqkv"], w["bqkv"],
                    w["wproj"], w["bproj"], H, hd ** -0.5, EPS)
                out = c + s[:, None, None] * br
            else:
                out, row0 = attend_block_res(
                    c, w["ls"], w["lb"], w["wqkv"], w["bqkv"],
                    w["wproj"], w["bproj"], s, H, hd ** -0.5, EPS)
            return (out * (1.0 / (1 + 1e-6))).astype(jnp.bfloat16), None
        y, _ = jax.lax.scan(body, x, None, length=ITERS)
        return jnp.mean(y)

    g = jax.jit(jax.value_and_grad(loss))
    return (lambda: g(w, x0)), w, x0


def timeit(fn):
    r = fn()
    float(jax.tree_util.tree_leaves(r)[0].reshape(-1)[0])
    best = 1e9
    for _ in range(5):
        t0 = time.time()
        r = fn()
        float(jax.tree_util.tree_leaves(r)[0].reshape(-1)[0])
        best = min(best, time.time() - t0 - OVERHEAD)
    return best / ITERS * 1e3


if __name__ == "__main__":
    import numpy as np
    for n in (197, 138, 97):
        grads = {}
        for variant in ("outside", "fused"):
            try:
                fn, w, x0 = chain(variant, n)
                ms = timeit(fn)
                grads[variant] = fn()[1]
                print(f"N={n} {variant}: {ms:.3f} ms", flush=True)
            except Exception as e:
                print(f"N={n} {variant}: FAIL {str(e)[:200]}", flush=True)
        if len(grads) == 2:
            for key in grads["outside"]:
                a = np.asarray(grads["outside"][key], np.float32)
                b = np.asarray(grads["fused"][key], np.float32)
                rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
                if rel > 1e-5:
                    print(f"  N={n} {key} rel|d|={rel:.2e}", flush=True)
            print(f"  N={n} grads match (rel|d| <= 1e-5 where not "
                  f"printed)", flush=True)

"""Round-5 adversarial re-test of the attention-backward ceiling
(BASELINE.md "Training throughput ceiling"; round-4 verdict #8).

Variant under test: fuse the four contract-over-N per-head backward
matmuls (dq = ds@k, recompute p@v, dk = ds^T@q, dv = p^T@do — each
[N,·]x[·,64], half-filling the 128-lane MXU output) into TWO
full-128-lane packed contractions per head:

    M1 = [ds; p] [2N,N] @ [k|v] [N,128]   -> dq = M1[:N,:64],
                                             merged = M1[N:,64:]
    M2 = ([ds|p])^T-contraction @ [q|do]  -> dk = M2[:N,:64],
                                             dv = M2[N:,64:]

(distinct from the round-2 block-diagonal head packing, which padded
the contraction dim with zero blocks; here the contraction stays N and
only rows/lanes pack). MXU block-pass math says this is neutral when
the hardware pads 64-lane outputs to 128 anyway — the hypothesis being
re-tested is whether halving the matmul op count (and letting Mosaic
schedule two big dots instead of four small ones) buys real time at
the current Mosaic version.

Measures the pure backward kernel (scan-chained, dispatch-corrected)
for loop (production ops/fused_block_train.py structure) vs pack2 at
DeiT-S dims, plus a numerical cross-check. Result recorded in
BASELINE.md either way.

FINDINGS (v5e, 2026-08-20, round 5): NEGATIVE — keep the loop.
- pack2 only compiles when N is a multiple of 8: the dk/dv/merged
  quadrant slices carry Mosaic vpad offsets ({N mod 8, 64}) and
  tpu.concatenate rejects nonzero offsets on the non-concat (sublane)
  dimension ("result/input offset mismatch on non-concat dimension").
  Production widths (197/138/97/50) all fail; padding the stacked dim
  to 8-rows would fix legality but adds copies on top of the below.
- At 8-aligned widths (bit-exact vs loop, rel|d| = 0.0):
    N=56:  loop 0.966 ms  pack2 0.928 ms  (pack2 −4%)
    N=200: loop 2.242 ms  pack2 2.530 ms  (pack2 +13% SLOWER)
  The [ds;p] / [ds|p] / [k|v] / [q|do] concats are O(n^2) VPU copies
  while the op-count saving is constant — so the variant loses exactly
  where the backward spends its time (the wide early blocks), and the
  small-N win (~0.04 ms/call, blocks at width <= 68) is < 0.2% of the
  56.7 ms train step before padding costs. Consistent with the MXU
  block-pass math: 64-lane outputs already pad to 128 lanes, so
  packing rows doubles rows and saves no passes.
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
from tokenreduction_tpu.ops.fused_block_train import _ln  # noqa: E402

B, D, H = 256, 384, 6
hd = D // H
SCALE = hd ** -0.5
EPS = 1e-6
ITERS = 20
OVERHEAD = 0.027


def make_bwd_kernel(variant, n, G):
    @pin_default_matmul_precision
    def kern(x_ref, ls_ref, lb_ref, wqkv_ref, bqkv_ref, wproj_ref,
             dy_ref, drow0_ref, dx_ref, dwqkv_ref, dwproj_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            dwqkv_ref[...] = jnp.zeros_like(dwqkv_ref)
            dwproj_ref[...] = jnp.zeros_like(dwproj_ref)

        ls = ls_ref[...].astype(jnp.float32)
        x32 = _flatten_rows(x_ref[...]).astype(jnp.float32)
        ln32, x_hat, rstd = _ln(x32, ls, lb_ref[...].astype(jnp.float32),
                                EPS)
        cdt = x_ref.dtype
        ln = ln32.astype(cdt)
        qkv = jax.lax.dot_general(
            ln, wqkv_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bqkv_ref[...].astype(jnp.float32)
        qkv = qkv.astype(cdt)
        dy = _flatten_rows(dy_ref[...])
        dattn = jax.lax.dot_general(
            dy, wproj_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(cdt)

        attn_chunks = []
        dqkv_chunks = []
        for g in range(G):
            merged = []
            dq_h, dk_h, dv_h = [], [], []
            for h in range(H):
                q = qkv[g * n:(g + 1) * n, h * hd:(h + 1) * hd]
                k = qkv[g * n:(g + 1) * n,
                        (H + h) * hd:(H + h + 1) * hd]
                v = qkv[g * n:(g + 1) * n,
                        (2 * H + h) * hd:(2 * H + h + 1) * hd]
                s = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * SCALE
                m_ = jnp.max(s, axis=-1, keepdims=True)
                e = jnp.exp(s - m_)
                p = e / jnp.sum(e, axis=-1, keepdims=True)
                pc = p.astype(cdt)
                do = dattn[g * n:(g + 1) * n, h * hd:(h + 1) * hd]
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
                ds = (ds * SCALE).astype(cdt)
                if variant == "loop":
                    merged.append(jax.lax.dot_general(
                        pc, v, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32).astype(cdt))
                    dv = jax.lax.dot_general(
                        pc, do, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    dq = jax.lax.dot_general(
                        ds, k, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    dk = jax.lax.dot_general(
                        ds, q, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                else:  # pack2
                    l_rows = jnp.concatenate([ds, pc], axis=0)  # [2n, n]
                    r_kv = jnp.concatenate([k, v], axis=1)      # [n, 128]
                    m1 = jax.lax.dot_general(
                        l_rows, r_kv, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)     # [2n,128]
                    dq = m1[:n, :hd]
                    merged.append(m1[n:, hd:].astype(cdt))
                    l_cols = jnp.concatenate([ds, pc], axis=1)  # [n, 2n]
                    r_qdo = jnp.concatenate([q, do], axis=1)    # [n, 128]
                    m2 = jax.lax.dot_general(
                        l_cols, r_qdo, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)     # [2n,128]
                    dk = m2[:n, :hd]
                    dv = m2[n:, hd:]
                dq_h.append(dq.astype(cdt))
                dk_h.append(dk.astype(cdt))
                dv_h.append(dv.astype(cdt))
            attn_chunks.append(jnp.concatenate(merged, axis=-1))
            dqkv_chunks.append(
                jnp.concatenate(dq_h + dk_h + dv_h, axis=-1))
        attn_out = jnp.concatenate(attn_chunks, axis=0)
        dqkv = jnp.concatenate(dqkv_chunks, axis=0)

        dwproj_ref[...] += jax.lax.dot_general(
            attn_out, dy, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dwqkv_ref[...] += jax.lax.dot_general(
            ln, dqkv, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dln = jax.lax.dot_general(
            dqkv, wqkv_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dxhat = dln * ls
        m1_ = jnp.mean(dxhat, -1, keepdims=True)
        m2_ = jnp.mean(dxhat * x_hat, -1, keepdims=True)
        dx = rstd * (dxhat - m1_ - x_hat * m2_)
        _write_rows(dx_ref, dx.astype(dx_ref.dtype), G, n)

    return kern


def build(variant, n, G):
    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        make_bwd_kernel(variant, n, G),
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((G, n, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            const((1, D)), const((1, D)), const((D, 3 * D)),
            const((1, 3 * D)), const((D, D)),
            pl.BlockSpec((G, n, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, H, 1, n), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((G, n, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            const((D, 3 * D)), const((D, D)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, n, D), jnp.bfloat16),
            jax.ShapeDtypeStruct((D, 3 * D), jnp.float32),
            jax.ShapeDtypeStruct((D, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=24 * 1024 * 1024),
    )

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    w = dict(
        ls=jnp.ones((1, D), jnp.bfloat16),
        lb=jnp.zeros((1, D), jnp.bfloat16),
        wqkv=jax.random.normal(ks[0], (D, 3 * D), jnp.bfloat16) * 0.02,
        bqkv=jnp.zeros((1, 3 * D), jnp.bfloat16),
        wproj=jax.random.normal(ks[1], (D, D), jnp.bfloat16) * 0.02,
    )
    x0 = jax.random.normal(ks[2], (B, n, D), jnp.bfloat16)
    dy0 = jax.random.normal(ks[3], (B, n, D), jnp.bfloat16)
    dr0 = jax.random.normal(ks[4], (B, H, 1, n), jnp.float32) * 0.1

    def once(dy):
        return f(x0, w["ls"], w["lb"], w["wqkv"], w["bqkv"], w["wproj"],
                 dy, dr0)

    @jax.jit
    def run(dy):
        def step(c, _):
            dx, dwqkv, dwproj = once(c)
            return (dy0 + dx * 1e-3).astype(jnp.bfloat16), None
        y, _ = jax.lax.scan(step, dy, None, length=ITERS)
        return jnp.mean(y)

    return run, jax.jit(once), dy0


def timeit(fn, *a):
    float(jnp.asarray(fn(*a)).mean())
    best = 1e9
    for _ in range(5):
        t0 = time.time()
        float(jnp.asarray(fn(*a)).mean())
        best = min(best, time.time() - t0 - OVERHEAD)
    return best / ITERS * 1e3


if __name__ == "__main__":
    for n in (197, 138, 97, 50):
        outs = {}
        for variant in ("loop", "pack2"):
            G = 2
            try:
                run, once, dy0 = build(variant, n, G)
                ms = timeit(run, dy0)
                outs[variant] = once(dy0)
                print(f"N={n} {variant} G={G}: {ms:.3f} ms", flush=True)
            except Exception as e:
                print(f"N={n} {variant} G={G}: FAIL {str(e)[:140]}",
                      flush=True)
        if len(outs) == 2:
            import numpy as np
            for i, name in enumerate(("dx", "dwqkv", "dwproj")):
                a = np.asarray(outs["loop"][i], np.float32)
                b = np.asarray(outs["pack2"][i], np.float32)
                rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
                print(f"  N={n} {name} rel|d|={rel:.2e}", flush=True)

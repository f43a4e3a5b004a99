"""Training-path fused attention block (LN1 + qkv + softmax attention +
out projection) as a custom_vjp pair of Pallas kernels.

v2 of the training kernels (v1, ops/flash_attention_train.py, fused only
the attention core on pre-split heads and measured neutral: the layout
transposes and the unfused LN/qkv/proj ate the gains). This variant
mirrors the eval kernel's shape -- whole branch per grid cell, joint
LN+qkv and proj matmuls over G grouped images -- and hand-writes the
backward:

  forward : branch = proj(attn(qkv(LN(x)))), row0 = probs[:, :, 0, :]
            saves ONLY x (+params): no probs/qkv/hidden ever hit HBM
  backward: recomputes LN/qkv/probs in VMEM, emits dx and all parameter
            grads; weight grads accumulate across the sequential grid in
            f32 VMEM accumulators (constant index maps)

The branch EXCLUDES the residual: stochastic depth / dropout / residual
compose outside, so autodiff around the primitive stays exact. row0's
cotangent is threaded into the softmax backward (EViT uses the CLS
attention row differentiably for token fusion, reference evit.py:116-121).

Enabled with the other training kernels via TOKENREDUCTION_USE_PALLAS_TRAIN
(core/layers.py gate).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tokenreduction_tpu.ops.flash_attention import (
    _flatten_rows,
    _write_rows,
    pin_default_matmul_precision,
)


def _ln(x32, ls, lb, eps):
    mu = jnp.mean(x32, -1, keepdims=True)
    xc = x32 - mu
    var = jnp.mean(xc * xc, -1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    x_hat = xc * rstd
    return x_hat * ls + lb, x_hat, rstd


@pin_default_matmul_precision
def _fwd_kernel(x_ref, ls_ref, lb_ref, wqkv_ref, bqkv_ref, wproj_ref,
                bproj_ref, o_ref, row0_ref, *, scale, num_heads, eps,
                group, n):
    G = group
    D = x_ref.shape[2]
    x32 = _flatten_rows(x_ref[...]).astype(jnp.float32)
    ln, _, _ = _ln(x32, ls_ref[...].astype(jnp.float32),
                   lb_ref[...].astype(jnp.float32), eps)
    qkv = jax.lax.dot_general(
        ln.astype(o_ref.dtype), wqkv_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bqkv_ref[...].astype(jnp.float32)
    qkv = qkv.astype(o_ref.dtype)
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
    _write_rows(o_ref, proj.astype(o_ref.dtype), G, n)


@pin_default_matmul_precision
def _bwd_kernel(x_ref, ls_ref, lb_ref, wqkv_ref, bqkv_ref, wproj_ref,
                dy_ref, drow0_ref, dx_ref, dls_ref, dlb_ref, dwqkv_ref,
                dbqkv_ref, dwproj_ref, dbproj_ref, *, scale, num_heads,
                eps, group, n):
    G = group
    D = x_ref.shape[2]
    cdt = x_ref.dtype  # compute dtype for MXU passes

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
    ln32, x_hat, rstd = _ln(x32, ls, lb_ref[...].astype(jnp.float32), eps)
    ln = ln32.astype(cdt)
    qkv = jax.lax.dot_general(
        ln, wqkv_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bqkv_ref[...].astype(jnp.float32)
    qkv = qkv.astype(cdt)
    dy = _flatten_rows(dy_ref[...])
    hd = D // num_heads

    # proj backward: dattn = dy @ Wproj^T  (contract over Wproj's cols)
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
            p = e / jnp.sum(e, axis=-1, keepdims=True)  # [n, n] f32
            pc = p.astype(cdt)
            merged.append(jax.lax.dot_general(
                pc, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(cdt))

            do = dattn[g * n:(g + 1) * n, h * hd:(h + 1) * hd]
            # dv = p^T @ do  (contract over rows)
            dv = jax.lax.dot_general(
                pc, do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            # dp = do @ v^T
            dp = jax.lax.dot_general(
                do, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            # row0 cotangent enters the probs grad at query row 0
            zero = jnp.zeros((n, n), jnp.float32)
            row_ids = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
            dp = dp + jnp.where(
                row_ids == 0,
                jnp.broadcast_to(drow0_ref[g, h].astype(jnp.float32),
                                 (n, n)),
                zero)
            # softmax backward
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
    attn_out = jnp.concatenate(attn_chunks, axis=0)  # [G*n, D]
    dqkv = jnp.concatenate(dqkv_chunks, axis=0)      # [G*n, 3D]

    # parameter grads (accumulated across grid cells)
    dwproj_ref[...] += jax.lax.dot_general(
        attn_out, dy, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbproj_ref[...] += jnp.sum(dy.astype(jnp.float32), 0, keepdims=True)
    dwqkv_ref[...] += jax.lax.dot_general(
        ln, dqkv, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbqkv_ref[...] += jnp.sum(dqkv.astype(jnp.float32), 0, keepdims=True)

    # qkv backward into LN: dln = dqkv @ Wqkv^T
    dln = jax.lax.dot_general(
        dqkv, wqkv_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dls_ref[...] += jnp.sum(dln * x_hat, 0, keepdims=True)
    dlb_ref[...] += jnp.sum(dln, 0, keepdims=True)
    dxhat = dln * ls
    m1 = jnp.mean(dxhat, -1, keepdims=True)
    m2 = jnp.mean(dxhat * x_hat, -1, keepdims=True)
    dx = rstd * (dxhat - m1 - x_hat * m2)
    _write_rows(dx_ref, dx.astype(dx_ref.dtype), G, n)


def _pick_group_train(B: int, N: int, D: int, bwd: bool = False) -> int:
    if bwd:
        # backward holds ~3.1 MB/image of f32 recompute state (measured
        # via the Mosaic scoped-vmem accountant at D=384) plus 4.7 MB of
        # f32 weight-grad accumulators -- stay at small groups. G=2 fits
        # and wins ~4% up to N~200 at DeiT dims (measured sweep; larger
        # G is flat or OOMs: the cost is the per-head matmuls, which are
        # intrinsically ~27% MXU-efficient at hd=64 -- block-diagonal
        # head packing trades lane padding for zero blocks 1:1 and does
        # not help, see tools/proto_attn.py findings)
        g = 2 if N <= 200 and D <= 512 else 1
        while g > 1 and B % g:
            g -= 1
        return g
    budget = 9 * 1024 * 1024
    g = 4 if N <= 160 else 2
    while g > 1:
        if B % g == 0:
            need = (6 * g * N * D * 2      # x/dy/dx blocks double-buffered
                    + 2 * g * N * 3 * D * 2  # qkv + dqkv
                    + 4 * N * N * 4          # probs/softmax scratch
                    + 4 * D * (3 * D + D))   # f32 wgrad accumulators
            if need <= budget:
                return g
        g -= 1
    return 1


def _run_fwd(x, ls, lb, wqkv, bqkv, wproj, bproj, num_heads, scale, eps,
             interpret):
    B, N, D = x.shape
    G = _pick_group_train(B, N, D)
    kern = functools.partial(
        _fwd_kernel, scale=scale, num_heads=num_heads, eps=eps, group=G,
        n=N)
    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM)
    branch, row0 = pl.pallas_call(
        kern,
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((G, N, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            const((1, D)), const((1, D)), const((D, 3 * D)),
            const((1, 3 * D)), const((D, D)), const((1, D)),
        ],
        out_specs=[
            pl.BlockSpec((G, N, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, num_heads, 1, N), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, N, D), x.dtype),
            jax.ShapeDtypeStruct((B, num_heads, 1, N), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * (4 * D * D + 2 * N * D),
            bytes_accessed=2 * B * N * D * x.dtype.itemsize,
            transcendentals=B * num_heads * N * N,
        ),
        interpret=interpret,
    )(x, ls.reshape(1, D), lb.reshape(1, D), wqkv,
      bqkv.reshape(1, 3 * D), wproj, bproj.reshape(1, D))
    return branch, row0[:, :, 0]


def _run_bwd(x, ls, lb, wqkv, bqkv, wproj, dy, drow0, num_heads, scale,
             eps, interpret):
    B, N, D = x.shape
    G = _pick_group_train(B, N, D, bwd=True)
    kern = functools.partial(
        _bwd_kernel, scale=scale, num_heads=num_heads, eps=eps, group=G,
        n=N)
    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM)
    # At the default kernel precision the G=2 backward sits just under
    # Mosaic's scoped-VMEM cap; the fp32/highest parity configuration
    # (TOKENREDUCTION_KERNEL_MATMUL_PRECISION=highest) splits each f32
    # dot operand into bf16 hi/lo passes whose extra temps push it to
    # ~18.8 MB. Raise the cap rather than dropping to G=1 (which would
    # double the grid); v5e physical VMEM is far larger.
    compiler_params = None
    if not interpret:
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=24 * 1024 * 1024)
    outs = pl.pallas_call(
        kern,
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((G, N, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            const((1, D)), const((1, D)), const((D, 3 * D)),
            const((1, 3 * D)), const((D, D)),
            pl.BlockSpec((G, N, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, num_heads, 1, N), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((G, N, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            const((1, D)), const((1, D)), const((D, 3 * D)),
            const((1, 3 * D)), const((D, D)), const((1, D)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, N, D), x.dtype),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((D, 3 * D), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * D), jnp.float32),
            jax.ShapeDtypeStruct((D, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * B * N * (4 * D * D + 2 * N * D),
            bytes_accessed=4 * B * N * D * x.dtype.itemsize,
            transcendentals=B * num_heads * N * N,
        ),
        compiler_params=compiler_params,
        interpret=interpret,
    )(x, ls.reshape(1, D), lb.reshape(1, D), wqkv,
      bqkv.reshape(1, 3 * D), wproj, dy,
      drow0.reshape(B, num_heads, 1, N))
    dx, dls, dlb, dwqkv, dbqkv, dwproj, dbproj = outs
    return (dx, dls.reshape(ls.shape).astype(ls.dtype),
            dlb.reshape(lb.shape).astype(lb.dtype),
            dwqkv.astype(wqkv.dtype),
            dbqkv.reshape(bqkv.shape).astype(bqkv.dtype),
            dwproj.astype(wproj.dtype),
            dbproj.reshape((D,)).astype(ls.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def attend_branch_train(x, ls, lb, wqkv, bqkv, wproj, bproj,
                        num_heads, scale, eps=1e-6, interpret=False):
    """(branch, cls_row) = (proj(attn(qkv(LN(x)))), probs[:, :, 0, :]).

    Differentiable in both outputs; residual/droppath compose outside."""
    return _run_fwd(x, ls, lb, wqkv, bqkv, wproj, bproj, num_heads,
                    scale, eps, interpret)


def _attend_fwd(x, ls, lb, wqkv, bqkv, wproj, bproj, num_heads, scale,
                eps, interpret):
    out = _run_fwd(x, ls, lb, wqkv, bqkv, wproj, bproj, num_heads, scale,
                   eps, interpret)
    return out, (x, ls, lb, wqkv, bqkv, wproj)


def _attend_bwd(num_heads, scale, eps, interpret, res, cts):
    x, ls, lb, wqkv, bqkv, wproj = res
    dy, drow0 = cts
    dy = dy.astype(x.dtype)
    drow0 = drow0.astype(jnp.float32)
    dx, dls, dlb, dwqkv, dbqkv, dwproj, dbproj = _run_bwd(
        x, ls, lb, wqkv, bqkv, wproj, dy, drow0, num_heads, scale, eps,
        interpret)
    return dx, dls, dlb, dwqkv, dbqkv, dwproj, dbproj


attend_branch_train.defvjp(_attend_fwd, _attend_bwd)

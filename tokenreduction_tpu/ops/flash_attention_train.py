"""Training-path fused attention core with a hand-written backward.

custom_vjp over softmax(QK^T * scale [+bias] [masked]) @ V returning
(out, cls_row, colsum). The probability matrix never exists in HBM in
either direction: the backward kernel recomputes P from Q/K in VMEM and
produces dQ/dK/dV (plus per-head bias cotangents, reduced outside).

Unlike the fused-MLP training attempt (neutral: weight-grad accumulation
serialized the grid), attention grads are purely per-(batch, head), so
every grid cell is independent.

Backward math (per head):
  dV = P^T dO
  dP = dO V^T (+ d_row0 added to row 0, + d_colsum broadcast to columns)
  dS = P * (dP - rowsum(dP * P))
  dQ = scale * dS K ; dK = scale * dS^T Q ; dbias_h = colsum... rowsum(dS)
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tokenreduction_tpu.ops.flash_attention import (
    _pick_group,
    _round_up,
    fused_attention,
    pin_default_matmul_precision,
)


@pin_default_matmul_precision
def _bwd_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, do_ref, dr0_ref,
                dcs_ref, dq_ref, dk_ref, dv_ref, dbias_ref, *,
                scale: float, n: int, group: int, has_bias: bool,
                has_mask: bool):
    np_ = q_ref.shape[2]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), 1)
    valid = col_ids < n
    row_valid = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), 0) < n
    for h in range(group):
        q = q_ref[0, h]
        k = k_ref[0, h]
        v = v_ref[0, h]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        if has_bias:
            logits = logits + bias_ref[0, h].astype(jnp.float32)
        if has_mask:
            mf = (mask_ref[0, h] != 0).astype(jnp.float32)
            pair = (jnp.transpose(mf) * mf) > 0
            logits = jnp.where(pair, logits,
                               -jnp.finfo(jnp.float32).max)
        logits = jnp.where(valid, logits, -jnp.inf)
        m_ = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m_)
        p = e / jnp.sum(e, axis=-1, keepdims=True)

        do = do_ref[0, h].astype(jnp.float32)
        dp = jax.lax.dot_general(  # dO V^T
            do.astype(v.dtype), v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        # cotangents of the score outputs feed P directly
        dp = dp + jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (np_, np_), 0) == 0,
            dr0_ref[0, h].astype(jnp.float32), 0.0)
        dp = dp + jnp.where(row_valid,
                            dcs_ref[0, h].astype(jnp.float32), 0.0)

        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        # pad rows produce garbage ds; zero them so dK/dV stay clean
        ds = jnp.where(row_valid, ds, 0.0)
        if has_mask:
            # autodiff of the masked_fill `where` blocks gradient at
            # masked pairs; fully-masked rows have uniform nonzero P, so
            # ds must be zeroed there explicitly
            ds = jnp.where(pair, ds, 0.0)
        dv = jax.lax.dot_general(  # P^T dO (pad-row P zeroed via ds? no:
            # P itself has uniform pad rows; mask them explicitly)
            jnp.where(row_valid, p, 0.0).astype(v.dtype),
            do.astype(v.dtype),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        dq = jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        dk = jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        dq_ref[0, h] = dq.astype(dq_ref.dtype)
        dk_ref[0, h] = dk.astype(dk_ref.dtype)
        dv_ref[0, h] = dv.astype(dv_ref.dtype)
        dbias_ref[0, h] = jnp.sum(ds, axis=0, keepdims=True)


def _run_bwd(q, k, v, bias, mask, do, dr0, dcs, scale, interpret):
    B, H, N, hd = q.shape
    Np = _round_up(N, 16)
    pad = Np - N
    BH = B * H
    # bwd footprint measured via the Mosaic scoped-vmem accountant:
    # ~54 bytes per (Np x hd) slot per head-slice (7 qkv-sized blocks,
    # double-buffered, + f32 p/dp/ds scratch). Keep under ~14MB of the
    # 16MB scoped limit.
    G = _pick_group(BH, Np, hd, q.dtype.itemsize)
    g_max = max(1, int(14e6 / (54 * Np * hd)))
    while G > 1 and (G > g_max or BH % G):
        G -= 1
    C = BH // G

    def pad4(x):
        x = x.reshape(BH, N, hd)
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        return x.reshape(C, G, Np, hd)

    def pad_row(x):  # [B, H, N] -> [C, G, 1, Np]
        if pad:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, pad)))
        return x.reshape(C, G, 1, Np)

    has_bias = bias is not None
    has_mask = mask is not None
    b = pad_row(jnp.broadcast_to(bias.reshape(B, 1, -1), (B, H, N))) \
        if has_bias else jnp.zeros((C, 1, 1, Np), jnp.float32)
    m = pad_row(jnp.broadcast_to(
        mask.astype(jnp.int32).reshape(B, 1, -1), (B, H, N))) \
        if has_mask else jnp.zeros((C, 1, 1, Np), jnp.int32)

    kern = functools.partial(
        _bwd_kernel, scale=scale, n=N, group=G,
        has_bias=has_bias, has_mask=has_mask)
    qkv_spec = pl.BlockSpec((1, G, Np, hd), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, G, 1, Np), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    bG = G if has_bias else 1
    mG = G if has_mask else 1
    dq, dk, dv, dbias = pl.pallas_call(
        kern,
        grid=(C,),
        in_specs=[qkv_spec, qkv_spec, qkv_spec,
                  pl.BlockSpec((1, bG, 1, Np), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, mG, 1, Np), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  qkv_spec, row_spec, row_spec],
        out_specs=[qkv_spec, qkv_spec, qkv_spec, row_spec],
        out_shape=[
            jax.ShapeDtypeStruct((C, G, Np, hd), q.dtype),
            jax.ShapeDtypeStruct((C, G, Np, hd), q.dtype),
            jax.ShapeDtypeStruct((C, G, Np, hd), q.dtype),
            jax.ShapeDtypeStruct((C, G, 1, Np), jnp.float32),
        ],
        interpret=interpret,
    )(pad4(q), pad4(k), pad4(v), b, m, pad4(do), pad_row(dr0),
      pad_row(dcs))
    dq = dq.reshape(B, H, Np, hd)[:, :, :N]
    dk = dk.reshape(B, H, Np, hd)[:, :, :N]
    dv = dv.reshape(B, H, Np, hd)[:, :, :N]
    dbias = dbias.reshape(B, H, Np)[:, :, :N]
    return dq, dk, dv, dbias


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 6))
def attention_core_train(q, k, v, scale, bias, mask,
                         interpret=False):
    """Differentiable fused attention core.

    q/k/v: [B, H, N, hd]; bias: [B, N] or None; mask: bool [B, N] or
    None (non-differentiable). Returns (out [B,H,N,hd],
    cls_row [B,H,N] fp32, colsum [B,H,N] fp32)."""
    return fused_attention(q, k, v, scale, bias=bias, mask=mask,
                           interpret=interpret)


def _act_fwd(q, k, v, scale, bias, mask, interpret):
    out = fused_attention(q, k, v, scale, bias=bias, mask=mask,
                          interpret=interpret)
    return out, (q, k, v, bias, mask)


def _act_bwd(scale, interpret, res, cts):
    q, k, v, bias, mask = res
    do, dr0, dcs = cts
    dq, dk, dv, dbias_h = _run_bwd(
        q, k, v, bias, mask, do.astype(q.dtype), dr0, dcs, scale,
        interpret)
    dbias = None
    if bias is not None:
        # bias broadcasts over heads; reduce the per-head cotangent
        dbias = dbias_h.sum(axis=1).astype(bias.dtype)
    return dq, dk, dv, dbias, None


attention_core_train.defvjp(_act_fwd, _act_bwd)

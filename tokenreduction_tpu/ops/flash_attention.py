"""Pallas fused attention for short token sequences (TPU).

The reduction models' hot loop is 12 blocks of O(N^2 * hd) attention with
N in [50, 197]. The XLA path materializes the [B, H, N, N] probability
tensor in HBM whenever a score hook needs it (CLS column for topk/evit,
column mass for kmedoids) -- at DeiT-S/b256 that is hundreds of MB of
fp32 HBM round-trip per layer, and the measured XLA throughput is within
a few percent of that bandwidth bound. This kernel computes QK^T, the
(optionally biased / masked) softmax, probs @ V, and the score reductions
in one VMEM-resident pass: the probability matrix never leaves VMEM.

Tuning (measured on v5e, DeiT-S N=197 b256):
- bf16 MXU matmuls with fp32 accumulation (matches the XLA numerics)
- rows padded to 16 (sublane), not 128 -- keys/lanes pad internally
- GROUP (~24) head-slices processed per grid cell: amortizes grid/DMA
  overhead (1 head/cell: 2.06ms, 6: 1.51ms, 24: 1.30ms vs XLA-with-probs
  2.66ms and XLA-no-probs 1.53ms per attention call)

Eval/inference path; training uses the XLA path (same math) so autodiff
stays untouched. Falls back to XLA off-TPU automatically.

Score outputs:
- row0: CLS query row of probs per head [B, H, N] (topk/evit score after
  a head-mean outside, reference models/topk.py:60-61)
- colsum: per-head column mass [B, H, N] (kmedoids token weights after a
  head+query sum outside, reference models/kmedoids.py:240)
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TARGET_GROUP = 24  # head-slices per grid cell (VMEM-bounded)


def pin_default_matmul_precision(kernel_fn):
    """Trace kernel bodies under matmul precision 'default'.

    The kernels manage their own numerics (explicit bf16 operand casts,
    f32 preferred_element_type accumulation); an ambient
    jax_default_matmul_precision=highest -- which the extraction CLIs
    set globally, and users may too -- must not leak into the Mosaic
    trace: Mosaic rejects bf16 dots at HIGHEST ('Bad lhs type'). At the
    pinned DEFAULT, Mosaic f32 dots run the fast multi-pass form with
    ~1e-2 logit drift vs fp32 XLA (BASELINE.md; bf16 dots, the serving
    config, are exact-rate either way).

    TOKENREDUCTION_KERNEL_MATMUL_PRECISION=highest overrides the pin
    (read at trace time) for fp32 models only -- tools/tpu_parity.py
    uses it for a strict compiled-Mosaic-vs-XLA gate: measured 2e-6
    full-model logit agreement, zero kept-token flips, all methods."""

    @functools.wraps(kernel_fn)
    def wrapped(*args, **kwargs):
        import os

        prec = os.environ.get("TOKENREDUCTION_KERNEL_MATMUL_PRECISION",
                              "default")
        with jax.default_matmul_precision(prec):
            return kernel_fn(*args, **kwargs)

    return wrapped


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _flatten_rows(x3):
    """[G, n, D] -> [G*n, D] Mosaic-safe: the reshape is an unsupported
    shape cast when the lane dim D is not 128-aligned (e.g. DeiT-tiny
    D=192); fall back to a sublane concat of the per-image slices."""
    G, n, D = x3.shape
    if G == 1:
        return x3[0]
    if D % 128 == 0:
        return x3.reshape(G * n, D)
    return jnp.concatenate([x3[g] for g in range(G)], axis=0)


def _write_rows(o_ref, y, G: int, n: int):
    """o_ref [G, n, D] = y [G*n, D], Mosaic-safe (see _flatten_rows)."""
    D = y.shape[1]
    if G == 1:
        o_ref[0] = y
    elif D % 128 == 0:
        o_ref[...] = y.reshape(G, n, D)
    else:
        for g in range(G):
            o_ref[g] = y[g * n:(g + 1) * n]


def _ln_qkv_rows(x32, dtype, ls_ref, lb_ref, wqkv_ref, bqkv_ref,
                 eps: float):
    """fp32 LayerNorm over flattened rows + qkv projection (+bias),
    result cast back to the compute dtype. Shared prologue of the
    block-attention kernel and the whole-block kernel
    (ops/fused_full_block.py) so the LN/precision recipe cannot
    diverge between them."""
    mu = jnp.mean(x32, -1, keepdims=True)
    xc = x32 - mu
    var = jnp.mean(xc * xc, -1, keepdims=True)
    ln = xc * jax.lax.rsqrt(var + eps) \
        * ls_ref[...].astype(jnp.float32) + lb_ref[...].astype(jnp.float32)
    qkv = jax.lax.dot_general(
        ln.astype(dtype), wqkv_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bqkv_ref[...].astype(jnp.float32)
    return qkv.astype(dtype)


def _pick_group(total: int, np_pad: int, hd: int, itemsize: int) -> int:
    """Largest divisor of `total` <= TARGET_GROUP that fits VMEM."""
    # rough budget: 3 inputs + 1 output [G, Np, hd] + logits scratch
    budget = 12 * 1024 * 1024
    g = min(TARGET_GROUP, total)
    while g > 1:
        if total % g == 0:
            need = 4 * g * np_pad * hd * itemsize + 2 * np_pad * np_pad * 4
            if need <= budget:
                return g
        g -= 1
    return 1


@pin_default_matmul_precision
def _kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, o_ref, row0_ref,
            colsum_ref, *, scale: float, n: int, group: int,
            has_bias: bool, has_mask: bool):
    np_ = q_ref.shape[2]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), 1)
    valid = col_ids < n
    row_valid = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), 0) < n
    for h in range(group):
        q = q_ref[0, h]  # [Np, hd] native dtype -> bf16 MXU rate
        k = k_ref[0, h]
        v = v_ref[0, h]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [Np, Np] fp32 accumulators
        if has_bias:
            logits = logits + bias_ref[0, h].astype(jnp.float32)
        if has_mask:
            # Mosaic cannot transpose i1 vectors; go through f32
            mf = (mask_ref[0, h] != 0).astype(jnp.float32)  # [1, Np]
            pair = (jnp.transpose(mf) * mf) > 0
            # mirror the XLA path: -finfo.max on masked pairs
            logits = jnp.where(pair, logits,
                               -jnp.finfo(jnp.float32).max)
        # pad columns rank strictly below pair-masked columns so a fully
        # masked row softmaxes uniformly over the n REAL columns,
        # matching the XLA path exactly on masked rows
        logits = jnp.where(valid, logits, -jnp.inf)

        m_ = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m_)
        # softmax(x) @ v == (e @ v) * (1/sum): the [Np, Np] elementwise
        # divide becomes an [Np, hd] scale (pad rows excluded from the
        # colsum by zeroing their 1/sum)
        rinv = 1.0 / jnp.sum(e, axis=-1, keepdims=True)

        o_ref[0, h] = (jax.lax.dot_general(
            e.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * rinv).astype(o_ref.dtype)
        row0_ref[0, h] = e[0:1, :] * rinv[0:1]
        rv = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (np_, 1), 0) < n,
            rinv, 0.0)
        # fused multiply-reduce on the VPU; the [Np,1]->[1,Np] transpose
        # + MXU matvec form costs a fixed ~70us/call relayout
        # (see _perhead_attention)
        colsum_ref[0, h] = jnp.sum(e * rv, axis=0, keepdims=True)


def fused_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    *,
    bias: Optional[jnp.ndarray] = None,   # [B, N] per-key additive
    mask: Optional[jnp.ndarray] = None,   # [B, N] bool validity
    interpret: bool = False,
):
    """q, k, v: [B, H, N, hd]. Returns (out [B, H, N, hd],
    cls_row [B, H, N] fp32, colsum [B, H, N] fp32)."""
    B, H, N, hd = q.shape
    Np = _round_up(N, 16)
    pad = Np - N
    BH = B * H
    G = _pick_group(BH, Np, hd, q.dtype.itemsize)
    C = BH // G  # grid cells

    def pad_qkv(x):
        x = x.reshape(BH, N, hd)
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        return x.reshape(C, G, Np, hd)

    qf, kf, vf = pad_qkv(q), pad_qkv(k), pad_qkv(v)

    has_bias = bias is not None
    has_mask = mask is not None
    if has_bias:
        b = jnp.pad(bias, ((0, 0), (0, pad))) if pad else bias
        b = jnp.broadcast_to(b.reshape(B, 1, Np),
                             (B, H, Np)).reshape(C, G, 1, Np)
    else:
        b = jnp.zeros((C, 1, 1, Np), jnp.float32)
    if has_mask:
        m = mask.astype(jnp.int32)
        m = jnp.pad(m, ((0, 0), (0, pad))) if pad else m
        m = jnp.broadcast_to(m.reshape(B, 1, Np),
                             (B, H, Np)).reshape(C, G, 1, Np)
    else:
        m = jnp.zeros((C, 1, 1, Np), jnp.int32)
    bG = G if has_bias else 1
    mG = G if has_mask else 1

    kern = functools.partial(
        _kernel, scale=scale, n=N, group=G,
        has_bias=has_bias, has_mask=has_mask)
    out, row0, colsum = pl.pallas_call(
        kern,
        grid=(C,),
        in_specs=[
            pl.BlockSpec((1, G, Np, hd), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, Np, hd), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, Np, hd), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bG, 1, Np), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mG, 1, Np), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, G, Np, hd), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, 1, Np), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, 1, Np), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((C, G, Np, hd), q.dtype),
            jax.ShapeDtypeStruct((C, G, 1, Np), jnp.float32),
            jax.ShapeDtypeStruct((C, G, 1, Np), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * BH * Np * Np * hd,
            bytes_accessed=4 * BH * Np * hd * q.dtype.itemsize,
            transcendentals=BH * Np * Np,
        ),
        interpret=interpret,
    )(qf, kf, vf, b, m)

    out = out.reshape(B, H, Np, hd)[:, :, :N]
    row0 = row0.reshape(B, H, Np)[:, :, :N]
    colsum = colsum.reshape(B, H, Np)[:, :, :N]
    return out, row0, colsum


@pin_default_matmul_precision
def _qkv_kernel(qkv_ref, bias_ref, mask_ref, o_ref, row0_ref, colsum_ref,
                *, scale: float, num_heads: int, has_bias: bool,
                has_mask: bool):
    """One batch item per grid cell, heads looped in-kernel.

    qkv_ref: [1, N, 3, H, hd] -- the raw Dense(3D) output reshaped (a
    free view), so no transpose/pad ever materializes in HBM.
    o_ref: [1, N, H*hd] -- merged-head layout, feeds the out projection
    directly. N stays unpadded: Mosaic tiles internally.
    """
    n = qkv_ref.shape[1]
    hd = qkv_ref.shape[4]
    if has_mask:
        mf = (mask_ref[0] != 0).astype(jnp.float32)  # [1, N]
        pair = (jnp.transpose(mf) * mf) > 0
    for h in range(num_heads):
        q = qkv_ref[0, :, 0, h, :]  # [N, hd]
        k = qkv_ref[0, :, 1, h, :]
        v = qkv_ref[0, :, 2, h, :]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        if has_bias:
            logits = logits + bias_ref[0].astype(jnp.float32)
        if has_mask:
            logits = jnp.where(pair, logits,
                               -jnp.finfo(jnp.float32).max)
        m_ = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m_)
        probs = e / jnp.sum(e, axis=-1, keepdims=True)
        o_ref[0, :, h * hd:(h + 1) * hd] = jax.lax.dot_general(
            probs.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)
        row0_ref[0, h] = probs[0:1, :]
        colsum_ref[0, h] = jnp.sum(probs, axis=0, keepdims=True)


def fused_attention_qkv(
    qkv: jnp.ndarray,
    num_heads: int,
    scale: float,
    *,
    bias: Optional[jnp.ndarray] = None,   # [B, N] per-key additive
    mask: Optional[jnp.ndarray] = None,   # [B, N] bool validity
    interpret: bool = False,
):
    """qkv: [B, N, 3*D] raw projection output. Returns
    (out [B, N, D] merged-head, cls_row [B, H, N] fp32,
    colsum [B, H, N] fp32). Zero layout copies outside the kernel."""
    B, N, C3 = qkv.shape
    D = C3 // 3
    hd = D // num_heads
    qkv5 = qkv.reshape(B, N, 3, num_heads, hd)

    has_bias = bias is not None
    has_mask = mask is not None
    b = bias.reshape(B, 1, N) if has_bias else jnp.zeros((B, 1, N),
                                                         jnp.float32)
    m = mask.astype(jnp.int32).reshape(B, 1, N) if has_mask else \
        jnp.zeros((B, 1, N), jnp.int32)

    kern = functools.partial(
        _qkv_kernel, scale=scale, num_heads=num_heads,
        has_bias=has_bias, has_mask=has_mask)
    out, row0, colsum = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, N, 3, num_heads, hd),
                         lambda i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, N, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, num_heads, 1, N), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, num_heads, 1, N), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, N, D), qkv.dtype),
            jax.ShapeDtypeStruct((B, num_heads, 1, N), jnp.float32),
            jax.ShapeDtypeStruct((B, num_heads, 1, N), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * num_heads * N * N * hd,
            bytes_accessed=2 * B * N * (3 * D + D) * qkv.dtype.itemsize,
            transcendentals=B * num_heads * N * N,
        ),
        interpret=interpret,
    )(qkv5, b, m)
    return out, row0[:, :, 0], colsum[:, :, 0]


STACK_MAX_N = 24  # head-stacked path for widths at/below this: the
# R^2 logits over-compute is free only while n^2 terms are negligible
# (measured v5e: N=13 103 -> 70us, N=4 83 -> 21us; N=50 REGRESSES
# 230 -> 327us, so mid-small widths keep the per-head path with a
# larger image group instead)
STACK_ROWS = 512  # target stacked-row count per matmul


def _stacked_eligible(n: int, D: int, num_heads: int,
                      has_mask: bool) -> bool:
    hd = D // num_heads
    # num_heads*n <= STACK_ROWS: one image's stacked rows must fit the
    # [R, R] tile budget (R <= STACK_ROWS) that _pick_images_group /
    # _plan_group reserve; otherwise S = max(1, ...) over-commits VMEM
    # for wide-head configs (e.g. 32 heads x 24 tokens = 768 rows).
    return (not has_mask and n <= STACK_MAX_N and hd == 64
            and num_heads % 2 == 0 and D % 128 == 0
            and num_heads * n <= STACK_ROWS)


def _stacked_attention_proj(qkv, wproj_ref, bias_ref, row0_ref,
                            colsum_ref, *, scale: float, n: int,
                            num_heads: int, group: int, has_bias: bool):
    """Block-diagonal head-stacked attention + out projection for small
    widths.

    At n <= 64 the per-head [n, hd] matmuls under-fill the 128-lane MXU
    and the unrolled group*num_heads loop is instruction-issue-bound
    (measured ~1.5us per grid cell of pure overhead at N=13). Instead,
    the (q, k, v) rows of S images x H heads are stacked into [R, 128]
    (R = S*H*n <= STACK_ROWS) and attention runs as ONE [R, 128] @
    [128, R] logits matmul + ONE [R, R] @ [R, 128] value matmul, with a
    block-diagonal mask (-inf off-block) making the full-row softmax
    exactly the per-block softmax. The R^2/(S*H*n^2) FLOP overfactor is
    irrelevant at these widths (the qkv projection dominates).

    Mosaic cannot concatenate lane-offset-64 slices, so head slices are
    taken as 128-lane-aligned HEAD-PAIR slices with the other head's
    lanes zeroed (parity mask): zero lanes contribute nothing to the
    contraction, so per-head logits are exact. The out projection runs
    per pair on the stacked rows (parity blocks hit disjoint weight
    rows), which also keeps every matmul 128-lane aligned.

    qkv: [G*n, 3D] (requires hd == 64, D %% 128 == 0, even num_heads --
    see _stacked_eligible). Returns proj(attn(qkv)) [G*n, D] fp32
    (bproj not added) and writes row0/colsum per (image, head)."""
    G = group
    D3 = qkv.shape[1]
    D = D3 // 3
    hd = D // num_heads
    npairs = num_heads // 2
    S = max(1, min(G, STACK_ROWS // (num_heads * n)))
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    mlo = (lane < hd).astype(qkv.dtype)
    mhi = (lane >= hd).astype(qkv.dtype)
    proj_rows = [None] * G
    for s0 in range(0, G, S):
        sub = min(S, G - s0)
        R = sub * num_heads * n
        qs, ks, vs, bs = [], [], [], []
        for si in range(sub):
            g = s0 + si
            for h in range(num_heads):
                p = h // 2
                m = mlo if h % 2 == 0 else mhi
                qs.append(qkv[g * n:(g + 1) * n,
                              p * 128:(p + 1) * 128] * m)
                ks.append(qkv[g * n:(g + 1) * n,
                              D + p * 128:D + (p + 1) * 128] * m)
                vs.append(qkv[g * n:(g + 1) * n,
                              2 * D + p * 128:2 * D + (p + 1) * 128] * m)
                if has_bias:
                    bs.append(bias_ref[g])
        q_st = jnp.concatenate(qs, 0) if len(qs) > 1 else qs[0]
        k_st = jnp.concatenate(ks, 0) if len(ks) > 1 else ks[0]
        v_st = jnp.concatenate(vs, 0) if len(vs) > 1 else vs[0]
        logits = jax.lax.dot_general(
            q_st, k_st, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [R, R] fp32
        if has_bias:
            brow = jnp.concatenate(bs, -1) if len(bs) > 1 else bs[0]
            logits = logits + brow.astype(jnp.float32)  # [1, R] bcast
        blk_r = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0) // n
        blk_c = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1) // n
        logits = jnp.where(blk_r == blk_c, logits, -jnp.inf)
        m_ = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m_)
        # (e @ v) * (1/sum) == softmax @ v: [R, R] divide -> [R, 128]
        # scale (see _perhead_attention)
        rinv = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
        out_st = (jax.lax.dot_general(
            e.astype(v_st.dtype), v_st, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * rinv).astype(qkv.dtype)  # [R, 128]; parity lanes = heads
        if row0_ref is not None:
            for si in range(sub):
                g = s0 + si
                for h in range(num_heads):
                    off = (si * num_heads + h) * n
                    row0_ref[g, h] = (e[off:off + 1, off:off + n]
                                      * rinv[off:off + 1])
                    colsum_ref[g, h] = jnp.sum(
                        e[off:off + n, off:off + n]
                        * rinv[off:off + n], axis=0, keepdims=True)
        # out projection per head pair: parity blocks have disjoint
        # nonzero lanes, so both multiply the pair's weight rows exactly
        proj_sub = None
        for p in range(npairs):
            blocks = [out_st[(si * num_heads + 2 * p) * n:
                             (si * num_heads + 2 * p + 2) * n]
                      for si in range(sub)]
            zp = jnp.concatenate(blocks, 0) if sub > 1 else blocks[0]
            yp = jax.lax.dot_general(  # [sub*2n, D] fp32
                zp, wproj_ref[p * 128:(p + 1) * 128, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            contrib = [yp[si * 2 * n:si * 2 * n + n]
                       + yp[si * 2 * n + n:(si + 1) * 2 * n]
                       for si in range(sub)]
            cat = jnp.concatenate(contrib, 0) if sub > 1 else contrib[0]
            proj_sub = cat if proj_sub is None else proj_sub + cat
        for si in range(sub):
            proj_rows[s0 + si] = proj_sub[si * n:(si + 1) * n]
    return jnp.concatenate(proj_rows, 0) if G > 1 else proj_rows[0]


@pin_default_matmul_precision
def _block_attn_kernel(x_ref, idx_ref, ls_ref, lb_ref, wqkv_ref, bqkv_ref,
                       wproj_ref, bproj_ref, bias_ref, mask_ref,
                       o_ref, row0_ref, colsum_ref, keys_ref=None,
                       *, scale: float,
                       num_heads: int, eps: float, has_bias: bool,
                       has_mask: bool, has_idx: bool, group: int):
    """Whole attention half-block for `group` images per grid cell:
    LN1 -> qkv projection -> per-head softmax attention -> out projection
    -> residual. Only x enters/leaves HBM; qkv, probs, and per-head
    outputs stay in VMEM. Weight blocks have constant index maps, so
    Mosaic DMAs them once.

    The LN + qkv projection and the out projection run JOINTLY over the
    G*N rows of all grouped images (one big matmul instead of G small
    ones): at the reduced widths the per-image row counts (68..138) waste
    MXU sublanes, and the joint form measured 0.470 -> 0.369 ms at N=97
    and 0.653 -> 0.614 ms at N=138 (v5e, DeiT-S b256). Only the O(N^2)
    attention matmuls stay per-image/per-head."""
    G = group
    D = x_ref.shape[2]
    if has_idx:
        # row-select prologue (DyViT eval gather, topk-family fusions):
        # per-image one-hot matmul in VMEM, then the block runs at the
        # reduced width -- the gathered tokens never round-trip HBM
        n_in = x_ref.shape[1]
        n = idx_ref.shape[2]
        rows = []
        for g in range(G):
            iota = jax.lax.broadcasted_iota(jnp.int32, (n, n_in), 1)
            oh = (iota == idx_ref[g, 0][:, None]).astype(x_ref.dtype)
            rows.append(jax.lax.dot_general(
                oh, x_ref[g], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
        x32 = jnp.concatenate(rows, 0) if G > 1 else rows[0]  # [G*n, D]
        x = x32.astype(x_ref.dtype)
    else:
        n = x_ref.shape[1]
        x = _flatten_rows(x_ref[...])
        x32 = x.astype(jnp.float32)
    qkv = _ln_qkv_rows(x32, x.dtype, ls_ref, lb_ref, wqkv_ref, bqkv_ref,
                       eps)  # [G*N, 3D], columns = (3, H, hd) blocks

    hd = D // num_heads
    if keys_ref is not None:
        # head-mean keys (ToMe merge metric, reference tome.py:58) as a
        # kernel by-product: saves the XLA path's full LN+qkv recompute
        ksum = qkv[:, num_heads * hd:(num_heads + 1) * hd].astype(
            jnp.float32)
        for h in range(1, num_heads):
            ksum = ksum + qkv[:, (num_heads + h) * hd:
                              (num_heads + h + 1) * hd].astype(jnp.float32)
        _write_rows(keys_ref, (ksum / num_heads).astype(keys_ref.dtype),
                    G, n)
    if _stacked_eligible(n, D, num_heads, has_mask):
        # small-width path: head-stacked block-diagonal attention (see
        # _stacked_attention_proj) -- one MXU matmul pair per image
        # subgroup instead of num_heads tiny ones per image
        proj = _stacked_attention_proj(
            qkv, wproj_ref, bias_ref, row0_ref, colsum_ref, scale=scale,
            n=n, num_heads=num_heads, group=G, has_bias=has_bias)
        proj = proj + bproj_ref[...].astype(jnp.float32)
        _write_rows(o_ref, (x32 + proj).astype(o_ref.dtype), G, n)
        return
    attn_out = _perhead_attention(
        qkv, bias_ref, mask_ref, row0_ref, colsum_ref, scale=scale, n=n,
        num_heads=num_heads, group=G, has_bias=has_bias,
        has_mask=has_mask)
    proj = jax.lax.dot_general(
        attn_out, wproj_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bproj_ref[...].astype(jnp.float32)
    _write_rows(o_ref, (x32 + proj).astype(o_ref.dtype), G, n)


def _perhead_attention(qkv, bias_ref, mask_ref, row0_ref, colsum_ref, *,
                       scale: float, n: int, num_heads: int, group: int,
                       has_bias: bool, has_mask: bool):
    """Per-image per-head attention on a joint qkv matrix [G*n, 3D].
    Returns merged attention output [G*n, D] (compute dtype). row0_ref /
    colsum_ref may be None when no score by-product is needed."""
    G = group
    D = qkv.shape[1] // 3
    hd = D // num_heads
    outs = []
    for _g in range(G):
        if has_mask:
            mf = (mask_ref[_g] != 0).astype(jnp.float32)  # [1, N]
            pair = (jnp.transpose(mf) * mf) > 0
        merged = []
        for h in range(num_heads):
            q = qkv[_g * n:(_g + 1) * n, h * hd:(h + 1) * hd]
            k = qkv[_g * n:(_g + 1) * n,
                    (num_heads + h) * hd:(num_heads + h + 1) * hd]
            v = qkv[_g * n:(_g + 1) * n,
                    (2 * num_heads + h) * hd:(2 * num_heads + h + 1) * hd]
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            if has_bias:
                logits = logits + bias_ref[_g].astype(jnp.float32)
            if has_mask:
                logits = jnp.where(pair, logits,
                                   -jnp.finfo(jnp.float32).max)
            m_ = jnp.max(logits, axis=-1, keepdims=True)
            e = jnp.exp(logits - m_)
            # softmax(x) @ v == (e @ v) * (1/sum): the [n, n] elementwise
            # divide becomes an [n, hd] scale (3x less VPU work at
            # n=197/hd=64)
            rinv = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
            merged.append((jax.lax.dot_general(
                e.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * rinv).astype(qkv.dtype))
            if row0_ref is not None:
                row0_ref[_g, h] = e[0:1, :] * rinv[0:1]
                # fused multiply-reduce on the VPU: a [n,1]->[1,n]
                # transpose + MXU matvec here costs a fixed ~70us/call
                # relayout at every width (measured: attn@138 regressed
                # to ~= attn@197); sum(e * rinv) streams per-vreg instead
                colsum_ref[_g, h] = jnp.sum(e * rinv, axis=0,
                                            keepdims=True)
        outs.append(jnp.concatenate(merged, axis=-1))
    return jnp.concatenate(outs, axis=0) if G > 1 else outs[0]


def _pick_images_group(B: int, N: int, D: int, itemsize: int,
                       stacked: bool = False) -> int:
    """Images per grid cell, shrunk to fit the VMEM budget and to divide
    the batch. Mid widths prefer 8, large 4 (measured, v5e DeiT-S); on
    the head-stacked path the per-grid-cell fixed cost dominates
    (~1.5us/cell measured at N=13 with 64 cells), so the group grows
    until the cell count is small."""
    if stacked:
        prefer = 64
    elif N <= STACK_ROWS // 8:  # mid-small widths (25..64)
        prefer = 16  # 230 -> 218us at N=50 (fewer grid cells)
    elif 97 < N <= 160:
        prefer = 8
    else:
        prefer = 4
    budget = 10 * 1024 * 1024
    g = prefer
    while g > 1:
        if B % g == 0:
            # in+out double-buffered x blocks + fp32 qkv scratch + probs
            # (+ the stacked [R, R] fp32 tile at small N)
            need = (4 * g * N * D * itemsize + g * N * 3 * D * 4
                    + 2 * N * N * 4)
            if stacked:
                need += 2 * STACK_ROWS * STACK_ROWS * 4
            if need <= budget:
                return g
        g -= 1
    return 1


def fused_block_attention(
    x: jnp.ndarray,
    ln_scale, ln_bias, wqkv, bqkv, wproj, bproj,
    num_heads: int,
    scale: float,
    *,
    eps: float = 1e-6,
    bias: Optional[jnp.ndarray] = None,   # [B, N] per-key additive
    mask: Optional[jnp.ndarray] = None,   # [B, N] bool validity
    idx: Optional[jnp.ndarray] = None,    # [B, K] row-select prologue
    want_keys: bool = False,
    interpret: bool = False,
):
    """x: [B, N, D]. Returns (x + proj(attn(LN(x))), cls_row [B, H, N],
    colsum [B, H, N]) plus, with want_keys, the head-mean keys
    [B, N, hd] (ToMe metric) as a fourth output. With idx [B, K]
    (absolute token ids incl. CLS), the block first row-selects in VMEM
    and runs at width K (equivalent to take_tokens then the block)."""
    B, N, D = x.shape
    has_bias = bias is not None
    has_mask = mask is not None
    has_idx = idx is not None
    K = idx.shape[1] if has_idx else N
    assert not (has_idx and (has_bias or has_mask)), \
        "idx prologue not supported with bias/mask"
    b = bias.reshape(B, 1, K) if has_bias else jnp.zeros((B, 1, K),
                                                         jnp.float32)
    m = mask.astype(jnp.int32).reshape(B, 1, K) if has_mask else \
        jnp.zeros((B, 1, K), jnp.int32)
    ix = (idx.astype(jnp.int32).reshape(B, 1, K) if has_idx
          else jnp.zeros((B, 1, 1), jnp.int32))
    iK = K if has_idx else 1

    G = _pick_images_group(
        B, max(N, K), D, x.dtype.itemsize,
        stacked=_stacked_eligible(K, D, num_heads, has_mask))

    kern = functools.partial(
        _block_attn_kernel, scale=scale, num_heads=num_heads, eps=eps,
        has_bias=has_bias, has_mask=has_mask, has_idx=has_idx, group=G)
    hd = D // num_heads
    # At D=768 with f32 inputs at highest precision (the strict parity
    # gate's configuration) the per-cell temps exceed Mosaic's default
    # 16 MB scoped-VMEM cap (18.57 MB at N=50, G=8 -- caught on-chip by
    # tools/tpu_parity.py topk-base@0.25; bf16 serving fits). Raise the
    # cap like both training backwards do: it is a validation limit,
    # not an allocation-strategy knob, and v5e physical VMEM is 128 MB.
    compiler_params = None
    if not interpret:
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=24 * 1024 * 1024)
    out_specs = [
        pl.BlockSpec((G, K, D), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((G, num_heads, 1, K), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((G, num_heads, 1, K), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((B, K, D), x.dtype),
        jax.ShapeDtypeStruct((B, num_heads, 1, K), jnp.float32),
        jax.ShapeDtypeStruct((B, num_heads, 1, K), jnp.float32),
    ]
    if want_keys:
        out_specs.append(pl.BlockSpec((G, K, hd), lambda i: (i, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct((B, K, hd), x.dtype))
    results = pl.pallas_call(
        kern,
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((G, N, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 1, iK), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 3 * D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 1, K), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 1, K), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * K * (4 * D * D + 2 * K * D),
            bytes_accessed=B * (N + K) * D * x.dtype.itemsize
            + 4 * D * D * wqkv.dtype.itemsize,
            transcendentals=B * num_heads * K * K,
        ),
        compiler_params=compiler_params,
        interpret=interpret,
    )(x, ix, ln_scale.reshape(1, D), ln_bias.reshape(1, D),
      wqkv, bqkv.reshape(1, 3 * D), wproj, bproj.reshape(1, D), b, m)
    out, row0, colsum = results[:3]
    if want_keys:
        return out, row0[:, :, 0], colsum[:, :, 0], results[3]
    return out, row0[:, :, 0], colsum[:, :, 0]


@pin_default_matmul_precision
def _rect_kernel(qkv_ref, oh_ref, mask_ref, o_ref, *, scale: float,
                 num_heads: int, group: int):
    """Rectangular attention for ATS sampling blocks: per image, gather
    the kept query rows with a one-hot matmul (MXU) and attend them over
    ALL keys/values, masked by key validity. The [M, N] probability
    tile never leaves VMEM (the XLA path materialized a [B, H, M, N]
    fp32 tensor in HBM)."""
    G = group
    n = qkv_ref.shape[1]
    D3 = qkv_ref.shape[2]
    D = D3 // 3
    hd = D // num_heads
    for g in range(G):
        oh = oh_ref[g]  # [M, N]
        mf = (mask_ref[g] != 0).astype(jnp.float32)  # [1, N]
        # query-side validity of the GATHERED rows (reference pair mask,
        # ats.py:117-120): a re-sampled DEAD slot's whole logits row is
        # masked, so its softmax is uniform over all N keys
        qv = jnp.sum(oh.astype(jnp.float32) * mf, axis=1,
                     keepdims=True)  # [M, 1] in {0, 1}
        merged = []
        for h in range(num_heads):
            q = qkv_ref[g, :, h * hd:(h + 1) * hd]
            k = qkv_ref[g, :, (num_heads + h) * hd:
                        (num_heads + h + 1) * hd]
            v = qkv_ref[g, :, (2 * num_heads + h) * hd:
                        (2 * num_heads + h + 1) * hd]
            qs = jax.lax.dot_general(  # [M, hd] kept query rows
                oh, q, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(q.dtype)
            logits = jax.lax.dot_general(
                qs, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            logits = jnp.where((qv > 0) & (mf > 0), logits,
                               -jnp.finfo(jnp.float32).max)
            m_ = jnp.max(logits, axis=-1, keepdims=True)
            e = jnp.exp(logits - m_)
            # (e @ v) * (1/sum) == softmax @ v (see _perhead_attention)
            rinv = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
            merged.append((jax.lax.dot_general(
                e.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * rinv).astype(o_ref.dtype))
        o_ref[g] = jnp.concatenate(merged, axis=-1)


def fused_rect_attention(
    qkv: jnp.ndarray,      # [B, N, 3D] raw projection output
    onehot: jnp.ndarray,   # [B, M, N] kept-row selectors
    mask: jnp.ndarray,     # [B, N] bool key validity
    num_heads: int,
    scale: float,
    *,
    interpret: bool = False,
):
    """Returns merged-head attention outputs [B, M, D] for the kept
    query rows (reference models/ats.py:117-120 masked attention with
    row gathering)."""
    B, N, C3 = qkv.shape
    D = C3 // 3
    M = onehot.shape[1]
    m = mask.astype(jnp.int32).reshape(B, 1, N)
    need_g4 = 4 * (N * C3 * 2 + M * N * 2 + M * N * 4 + M * D * 2)
    if B % 4 == 0 and need_g4 < 8 * 1024 * 1024:
        G = 4
    elif B % 2 == 0:
        G = 2
    else:
        G = 1
    kern = functools.partial(
        _rect_kernel, scale=scale, num_heads=num_heads, group=G)
    out = pl.pallas_call(
        kern,
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((G, N, C3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, M, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 1, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, M, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, M, D), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * num_heads * M * N * (D // num_heads) * 2,
            bytes_accessed=B * N * C3 * qkv.dtype.itemsize,
            transcendentals=B * num_heads * M * N,
        ),
        interpret=interpret,
    )(qkv, onehot.astype(qkv.dtype), m)
    return out


@pin_default_matmul_precision
def _rect_block_kernel(qkv_ref, x_ref, idx_ref, mask_ref, wproj_ref,
                       bproj_ref, o_ref, *, scale: float, num_heads: int,
                       group: int):
    """ATS sampling block tail: kept-row rectangular attention + out
    projection + gathered residual in one pass. o[g] = onehot@x +
    proj(rect_attn(qkv)); the [M, N] probability tile, the merged heads,
    and the gathered residual rows never touch HBM."""
    G = group
    n = qkv_ref.shape[1]
    D3 = qkv_ref.shape[2]
    D = D3 // 3
    hd = D // num_heads
    M = idx_ref.shape[2]
    outs = []
    res = []
    for g in range(G):
        iota = jax.lax.broadcasted_iota(jnp.int32, (M, n), 1)
        oh = (iota == idx_ref[g, 0][:, None]).astype(qkv_ref.dtype)
        mf = (mask_ref[g] != 0).astype(jnp.float32)  # [1, N]
        # reference pair mask for gathered rows (see _rect_kernel)
        qv = jnp.sum(oh.astype(jnp.float32) * mf, axis=1,
                     keepdims=True)  # [M, 1] in {0, 1}
        merged = []
        for h in range(num_heads):
            q = qkv_ref[g, :, h * hd:(h + 1) * hd]
            k = qkv_ref[g, :, (num_heads + h) * hd:
                        (num_heads + h + 1) * hd]
            v = qkv_ref[g, :, (2 * num_heads + h) * hd:
                        (2 * num_heads + h + 1) * hd]
            qs = jax.lax.dot_general(
                oh, q, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(q.dtype)
            logits = jax.lax.dot_general(
                qs, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            logits = jnp.where((qv > 0) & (mf > 0), logits,
                               -jnp.finfo(jnp.float32).max)
            m_ = jnp.max(logits, axis=-1, keepdims=True)
            e = jnp.exp(logits - m_)
            # (e @ v) * (1/sum) == softmax @ v (see _perhead_attention)
            rinv = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
            merged.append((jax.lax.dot_general(
                e.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * rinv).astype(qkv_ref.dtype))
        outs.append(jnp.concatenate(merged, axis=-1))
        res.append(jax.lax.dot_general(
            oh, x_ref[g], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
    attn = jnp.concatenate(outs, axis=0)  # [G*M, D]
    proj = jax.lax.dot_general(
        attn, wproj_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bproj_ref[...].astype(jnp.float32)
    out2 = ((jnp.concatenate(res, axis=0) if G > 1 else res[0])
            + proj).astype(o_ref.dtype)
    _write_rows(o_ref, out2, G, M)


def fused_rect_block(
    qkv: jnp.ndarray,      # [B, N, 3D] raw projection output
    x: jnp.ndarray,        # [B, N, D] block input (residual source)
    idx: jnp.ndarray,      # [B, M] kept absolute row ids
    mask: jnp.ndarray,     # [B, N] bool key validity
    wproj, bproj,
    num_heads: int,
    scale: float,
    *,
    interpret: bool = False,
):
    """take_tokens(x, idx) + proj(masked rect attention over the kept
    query rows) in one kernel: [B, M, D]."""
    B, N, C3 = qkv.shape
    D = C3 // 3
    M = idx.shape[1]
    m = mask.astype(jnp.int32).reshape(B, 1, N)
    ix = idx.astype(jnp.int32).reshape(B, 1, M)
    need_g4 = 4 * (N * C3 * 2 + N * D * 2 + 2 * M * N * 4 + 2 * M * D * 4) \
        + 2 * D * D * 2
    G = 4 if (B % 4 == 0 and need_g4 < 9 * 1024 * 1024) else \
        (2 if B % 2 == 0 else 1)
    kern = functools.partial(
        _rect_block_kernel, scale=scale, num_heads=num_heads, group=G)
    out = pl.pallas_call(
        kern,
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((G, N, C3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, N, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 1, M), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 1, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, M, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, M, D), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * M * (2 * N * D + D * D),
            bytes_accessed=B * N * (C3 + D) * qkv.dtype.itemsize,
            transcendentals=B * num_heads * M * N,
        ),
        interpret=interpret,
    )(qkv, x, ix, m, wproj, bproj.reshape(1, D))
    return out


def supports_pallas() -> bool:
    try:
        d = jax.devices()[0]
        return d.platform in ("tpu", "axon") or \
            "tpu" in d.device_kind.lower()
    except Exception:
        return False

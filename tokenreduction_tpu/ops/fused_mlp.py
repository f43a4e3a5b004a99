"""Fused transformer-MLP Pallas kernel: residual + LN + fc1 + GELU + fc2.

Per-block accounting at DeiT-S b256 (measured, dispatch-overhead
corrected): the two MLP matmuls run at MXU peak (~0.6ms) but the exact-erf
GELU adds ~0.83ms of VPU time and the [B*N, 4D] hidden tensor costs an HBM
round-trip. Fusing the whole chain keeps the hidden layer in VMEM, fuses
the LayerNorm reads, and lets Mosaic overlap the VPU (erf) of one row-tile
with the MXU (matmuls) of the next.

Row-parallel (no cross-token deps), so one kernel serves every model and
any token count. Eval path; training uses the XLA composition.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tokenreduction_tpu.ops.flash_attention import (
    _write_rows,
    pin_default_matmul_precision,
)


def _erf(x):
    """Abramowitz & Stegun 7.1.26 rational erf approximation (max abs
    error 1.5e-7, i.e. fp32-exact for our purposes). Mosaic has no native
    erf/erfc lowering; exp is supported."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return sign * y


def _gelu(h32, dtype):
    """erf-GELU on fp32 rows, keyed on the kernel's COMPUTE dtype.

    bf16 path: tanh-form GELU. Its max deviation from exact erf-GELU
    (4.7e-4 at |h| ~ 2.7) is ~22x below the bf16 output quantum there,
    so the swap is invisible after the h.astype(bf16) cast that feeds
    fc2 -- and it measures -24% on the whole MLP kernel (tools/
    proto_gelu.py, v5e N=197 b256: erf 1160us, tanh 887us ~= identity
    905us; the tanh hides behind the chunked matmuls while the A&S
    erf's divide+exp+poly5 does not).

    fp32 path (interpret-mode tests, fp32 serving) keeps the A&S erf
    (max err 1.5e-7) so kernel-vs-XLA comparisons hold at 1e-6.
    """
    if dtype == jnp.bfloat16:
        return 0.5 * h32 * (1.0 + jnp.tanh(
            0.7978845608028654 * (h32 + 0.044715 * h32 * h32 * h32)))
    return 0.5 * h32 * (1.0 + _erf(h32 * (2.0 ** -0.5)))


def _mlp_rows(x32, dtype, ls_ref, lb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
              eps: float, chunks: int):
    """Shared body: rows [M, D] f32 -> x + fc2(gelu(fc1(LN(x)))) + b2,
    f32. The hidden dim is processed in `chunks` independent column
    slices (fc1-slice -> GELU -> fc2-slice accumulate) so Mosaic can
    overlap one chunk's erf (VPU) with the next chunk's matmuls (MXU):
    measured 1.276 -> 1.214 ms at N=197 and 0.445 -> 0.389 ms at N=68
    (v5e, DeiT-S b256)."""
    mu = jnp.mean(x32, -1, keepdims=True)
    xc = x32 - mu
    var = jnp.mean(xc * xc, -1, keepdims=True)
    ln = (xc * jax.lax.rsqrt(var + eps)
          * ls_ref[...].astype(jnp.float32)
          + lb_ref[...].astype(jnp.float32)).astype(dtype)
    Dh = w1_ref.shape[1]
    D = w2_ref.shape[1]
    cs = Dh // chunks
    acc = jnp.zeros((x32.shape[0], D), jnp.float32)
    for c in range(chunks):
        h = jax.lax.dot_general(
            ln, w1_ref[:, c * cs:(c + 1) * cs], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1_ref[0, c * cs:(c + 1) * cs].astype(jnp.float32)
        h = _gelu(h, dtype)
        acc = acc + jax.lax.dot_general(
            h.astype(dtype), w2_ref[c * cs:(c + 1) * cs, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    return x32 + acc + b2_ref[...].astype(jnp.float32)


@pin_default_matmul_precision
def _kernel(x_ref, ls_ref, lb_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
            *, eps: float, chunks: int = 2):
    x = x_ref[...]
    out = _mlp_rows(x.astype(jnp.float32), x.dtype, ls_ref, lb_ref,
                    w1_ref, b1_ref, w2_ref, b2_ref, eps, chunks)
    o_ref[...] = out.astype(o_ref.dtype)


@pin_default_matmul_precision
def _gather_kernel(x_ref, idx_ref, ls_ref, lb_ref, w1_ref, b1_ref, w2_ref,
                   b2_ref, o_ref, *, eps: float, chunks: int, group: int):
    """Row-select + MLP in one pass: x_ref [G, N, D], idx_ref [G, K]
    absolute token ids (CLS included). The gather is a per-image one-hot
    matmul built from an iota compare in VMEM -- the selected rows, the
    residual, and the hidden tensor never touch HBM (saves the XLA
    take_tokens round-trip at every reduction stage, ~0.15ms/model)."""
    N = x_ref.shape[1]
    K = idx_ref.shape[2]
    rows = []
    for g in range(group):
        iota = jax.lax.broadcasted_iota(jnp.int32, (K, N), 1)
        oh = (iota == idx_ref[g, 0][:, None]).astype(x_ref.dtype)
        rows.append(jax.lax.dot_general(
            oh, x_ref[g], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
    x32 = jnp.concatenate(rows, 0) if group > 1 else rows[0]  # [G*K, D]
    out = _mlp_rows(x32, x_ref.dtype, ls_ref, lb_ref, w1_ref, b1_ref,
                    w2_ref, b2_ref, eps, chunks)
    _write_rows(o_ref, out.astype(o_ref.dtype), group, K)


def _pick_tile(m: int) -> int:
    for t in (512, 256, 128, 64, 32, 16, 8):
        if m % t == 0:
            return t
    return m


_PAD_TILE = 256


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def fused_mlp_residual(x, ln_scale, ln_bias, w1, b1, w2, b2,
                       eps: float = 1e-6, interpret: bool = False):
    """x: [..., N, D] -> x + fc2(gelu(fc1(LN(x)))). Weights: w1 [D, H],
    w2 [H, D]."""
    orig_shape = x.shape
    D = x.shape[-1]
    H = w1.shape[1]
    xf = x.reshape(-1, D)
    M0 = xf.shape[0]
    TM = _pick_tile(M0)
    if TM == M0 and M0 > _PAD_TILE:
        # no usable divisor (e.g. 7 images x 197 tokens = 1379 rows):
        # pad to a tile multiple instead of taking the whole array as one
        # VMEM block; padded rows are sliced off below
        pad = (-M0) % _PAD_TILE
        xf = jnp.pad(xf, ((0, pad), (0, 0)))
        TM = _PAD_TILE
    M = xf.shape[0]

    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps,
                          chunks=2 if H % 2 == 0 else 1),
        grid=(M // TM,),
        in_specs=[
            pl.BlockSpec((TM, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, H), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, D), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * M * D * H,
            bytes_accessed=2 * M * D * x.dtype.itemsize
            + 2 * D * H * w1.dtype.itemsize,
            transcendentals=M * H,
        ),
        interpret=interpret,
    )(xf, ln_scale.reshape(1, D), ln_bias.reshape(1, D),
      w1, b1.reshape(1, H), w2, b2.reshape(1, D))
    return out[:M0].reshape(orig_shape)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def fused_mlp_gather_residual(x, idx, ln_scale, ln_bias, w1, b1, w2, b2,
                              eps: float = 1e-6, interpret: bool = False):
    """Gathered-MLP: rows x[b, idx[b]] -> g + fc2(gelu(fc1(LN(g)))).

    x: [B, N, D]; idx: [B, K] int32 absolute token ids (include 0 for
    CLS). Equivalent to take_tokens(x, idx) followed by
    fused_mlp_residual, with the gather done in VMEM."""
    B, N, D = x.shape
    K = idx.shape[1]
    H = w1.shape[1]
    isize = x.dtype.itemsize
    chunks = 2 if H % 2 == 0 else 1
    # scoped VMEM is ~16MB: x block + onehot + 3 f32 row copies
    # (gathered/LN stats/out) + weights + hidden chunk, with slack
    budget = 12 * 2 ** 20
    fixed = 2 * D * H * w1.dtype.itemsize
    G = 1
    for g in (8, 4, 2, 1):
        per = (N * D * isize + K * N * isize + 3 * K * D * 4
               + K * (H // chunks) * 4)
        if B % g == 0 and fixed + g * per <= budget:
            G = g
            break

    out = pl.pallas_call(
        functools.partial(_gather_kernel, eps=eps, chunks=chunks,
                          group=G),
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((G, N, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 1, K), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, H), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, K, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, K, D), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * K * (N * D + 2 * D * H),
            bytes_accessed=B * (N + K) * D * x.dtype.itemsize
            + 2 * D * H * w1.dtype.itemsize,
            transcendentals=B * K * H,
        ),
        interpret=interpret,
    )(x, idx.astype(jnp.int32).reshape(B, 1, K), ln_scale.reshape(1, D),
      ln_bias.reshape(1, D), w1, b1.reshape(1, H), w2, b2.reshape(1, D))
    return out

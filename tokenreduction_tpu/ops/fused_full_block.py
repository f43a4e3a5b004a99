"""Whole-transformer-block Pallas kernel (eval path):

    x -> x + proj(attn(qkv(LN1(x))))  ->  y + fc2(gelu(fc1(LN2(y))))

in ONE kernel launch. Used for the score-less blocks (no reduction
by-products needed): between the attention half and the MLP half the
activations previously made an HBM round-trip plus a second kernel
launch; at the reduced widths (keep 0.25 schedule: 50/13/4 tokens) those
fixed costs are a large fraction of the block time. The attention core
reuses the head-stacked block-diagonal path at tiny widths and the
per-head path otherwise (ops/flash_attention.py).

Numerics identical to fused_block_attention + fused_mlp_residual
composed (same fp32 LN/softmax/accumulation, same A&S erf GELU).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tokenreduction_tpu.ops.flash_attention import (
    STACK_ROWS,
    _flatten_rows,
    _ln_qkv_rows,
    _perhead_attention,
    _pick_images_group,
    _stacked_attention_proj,
    _stacked_eligible,
    _write_rows,
    pin_default_matmul_precision,
)
from tokenreduction_tpu.ops.fused_mlp import _mlp_rows


def _plan_group(B: int, N: int, D: int, H4: int, x_itemsize: int,
                w_itemsize: int, stacked: bool):
    """Pick images-per-grid-cell so weights + double-buffered x/o + f32
    qkv + one hidden chunk fit the scoped-VMEM budget. Returns
    (group, chunks, vmem_limit_bytes): vmem_limit_bytes is None under
    the default 16 MB Mosaic cap, or 24 MB when the plan only fits the
    raised cap (DeiT-base: the two halves' weights alone are ~14.2 MB
    bf16, over the default budget at any group — round 4 established
    Mosaic accepts vmem_limit_bytes=24 MB on v5e, so base runs the
    whole-block fusion at G=1 instead of falling back to the split
    path). group=None when even the raised cap does not fit."""
    chunks = 2 if H4 % 2 == 0 else 1
    wbytes = (4 * D * D + 2 * D * H4) * w_itemsize
    plans = [(11 * 1024 * 1024, None)]
    if os.environ.get("TOKENREDUCTION_FULLBLOCK_24MB", "1") != "0":
        plans.append((20 * 1024 * 1024, 24 * 1024 * 1024))
    for budget, vmem_limit in plans:
        G = _pick_images_group(B, N, D, x_itemsize, stacked=stacked)
        while G >= 1:
            need = (wbytes + 4 * G * N * D * x_itemsize
                    + G * N * 3 * D * 4 + G * N * (H4 // chunks) * 4
                    + (2 * STACK_ROWS * STACK_ROWS * 4 if stacked
                       else 2 * N * N * 4))
            if need <= budget and B % G == 0:
                return G, chunks, vmem_limit
            G -= 1
            while G > 1 and B % G:
                G -= 1
    return None, chunks, None


def full_block_supported(B: int, N: int, D: int, H4: int, num_heads: int,
                         x_itemsize: int = 2,
                         w_itemsize: int = 2) -> bool:
    """The whole-block kernel holds BOTH halves' weights in VMEM
    (qkv + proj + fc1 + fc2 = 4D^2 + 2*D*H4 elements). At DeiT-base
    (D=768, H4=3072) that alone is ~14.2 MB bf16 -- over the default
    plan budget at any group, so base runs under the raised 24 MB
    Mosaic cap at G=1 (round-5 extension; previously base fell back to
    the two-kernel split path). Uses the same VMEM plan as the launcher
    (actual dtypes, group search down to one image per cell)."""
    stacked = _stacked_eligible(N, D, num_heads, False)
    group, _, _ = _plan_group(B, N, D, H4, x_itemsize, w_itemsize,
                              stacked)
    return group is not None


@pin_default_matmul_precision
def _full_block_kernel(x_ref, ls1_ref, lb1_ref, wqkv_ref, bqkv_ref,
                       wproj_ref, bproj_ref, ls2_ref, lb2_ref, w1_ref,
                       b1_ref, w2_ref, b2_ref, o_ref, *, scale: float,
                       num_heads: int, eps: float, group: int,
                       chunks: int, stacked: bool):
    G = group
    n = x_ref.shape[1]
    D = x_ref.shape[2]
    x = _flatten_rows(x_ref[...])
    x32 = x.astype(jnp.float32)
    qkv = _ln_qkv_rows(x32, x.dtype, ls1_ref, lb1_ref, wqkv_ref,
                       bqkv_ref, eps)
    if stacked:
        proj = _stacked_attention_proj(
            qkv, wproj_ref, None, None, None, scale=scale, n=n,
            num_heads=num_heads, group=G, has_bias=False)
    else:
        attn_out = _perhead_attention(
            qkv, None, None, None, None, scale=scale, n=n,
            num_heads=num_heads, group=G, has_bias=False, has_mask=False)
        proj = jax.lax.dot_general(
            attn_out, wproj_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    y32 = x32 + proj + bproj_ref[...].astype(jnp.float32)
    out = _mlp_rows(y32, x.dtype, ls2_ref, lb2_ref, w1_ref, b1_ref,
                    w2_ref, b2_ref, eps, chunks)
    _write_rows(o_ref, out.astype(o_ref.dtype), G, n)


def fused_full_block(
    x: jnp.ndarray,
    ls1, lb1, wqkv, bqkv, wproj, bproj,
    ls2, lb2, w1, b1, w2, b2,
    num_heads: int,
    scale: float,
    *,
    eps: float = 1e-6,
    interpret: bool = False,
):
    """x: [B, N, D] -> full pre-norm transformer block output [B, N, D]."""
    B, N, D = x.shape
    H4 = w1.shape[1]
    stacked = _stacked_eligible(N, D, num_heads, False)
    G, chunks, vmem_limit = _plan_group(B, N, D, H4, x.dtype.itemsize,
                                        wqkv.dtype.itemsize, stacked)
    if G is None:
        raise ValueError(
            f"fused_full_block: no VMEM-feasible group at B={B} N={N} "
            f"D={D} H4={H4} (gate with full_block_supported first)")

    kern = functools.partial(
        _full_block_kernel, scale=scale, num_heads=num_heads, eps=eps,
        group=G, chunks=chunks, stacked=stacked)
    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((G, N, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            const((1, D)), const((1, D)), const((D, 3 * D)),
            const((1, 3 * D)), const((D, D)), const((1, D)),
            const((1, D)), const((1, D)), const((D, H4)),
            const((1, H4)), const((H4, D)), const((1, D)),
        ],
        out_specs=pl.BlockSpec((G, N, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, D), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * (4 * D * D + 2 * N * D + 2 * D * H4),
            bytes_accessed=2 * B * N * D * x.dtype.itemsize
            + (4 * D * D + 2 * D * H4) * wqkv.dtype.itemsize,
            transcendentals=B * (num_heads * N * N + N * H4),
        ),
        compiler_params=(None if vmem_limit is None or interpret
                         else pltpu.CompilerParams(
                             vmem_limit_bytes=vmem_limit)),
        interpret=interpret,
    )(x, ls1.reshape(1, D), lb1.reshape(1, D), wqkv,
      bqkv.reshape(1, 3 * D), wproj, bproj.reshape(1, D),
      ls2.reshape(1, D), lb2.reshape(1, D), w1, b1.reshape(1, H4),
      w2, b2.reshape(1, D))
    return out

"""Training-path fused MLP (LN + fc1 + erf-GELU + fc2) with a
hand-written Pallas backward.

Unlike ops/fused_mlp.py (eval path, residual fused), this variant returns
the BRANCH output only, so stochastic depth / residual composition stays
outside and autodiff sees a custom_vjp primitive:

  branch = fc2(gelu(fc1(LN(x))))

Forward saves only x (plus the params); the backward kernel recomputes
LN/h in VMEM and produces dx plus all weight grads. Weight-gradient
accumulation exploits the sequential TPU grid: accumulator outputs use
constant index maps (they stay VMEM-resident across row tiles) and are
initialized at step 0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tokenreduction_tpu.ops.flash_attention import pin_default_matmul_precision
from tokenreduction_tpu.ops.fused_mlp import _erf, _gelu, _pick_tile

_INV_SQRT2 = 2.0 ** -0.5
_INV_SQRT2PI = 0.3989422804014327


def _ln_stats(x32, eps):
    mu = jnp.mean(x32, -1, keepdims=True)
    xc = x32 - mu
    var = jnp.mean(xc * xc, -1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    return xc * rstd, rstd  # x_hat, 1/sigma


def _gelu_and_prime(h, dtype):
    """(gelu(h), gelu'(h)) on fp32 rows, keyed on the compute dtype like
    fused_mlp._gelu: bf16 uses the tanh form and its exact derivative
    (activation deviation <= 4.7e-4, far below the documented bf16
    grad-noise envelope of ~1.8e-2 rel vs the XLA erf path); fp32
    (interpret-mode tests) keeps the near-exact A&S erf so the
    custom_vjp-vs-autodiff comparisons hold at 1e-6."""
    if dtype == jnp.bfloat16:
        u = 0.7978845608028654 * (h + 0.044715 * h * h * h)
        t = jnp.tanh(u)
        a = 0.5 * h * (1.0 + t)
        du = 0.7978845608028654 * (1.0 + 0.134145 * h * h)
        prime = 0.5 * (1.0 + t) + 0.5 * h * (1.0 - t * t) * du
        return a, prime
    erf_t = _erf(h * _INV_SQRT2)
    a = 0.5 * h * (1.0 + erf_t)
    prime = 0.5 * (1.0 + erf_t) + h * _INV_SQRT2PI * jnp.exp(-0.5 * h * h)
    return a, prime


@pin_default_matmul_precision
def _fwd_kernel(x_ref, ls_ref, lb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                o_ref, *, eps: float):
    x32 = x_ref[...].astype(jnp.float32)
    x_hat, _ = _ln_stats(x32, eps)
    ln = x_hat * ls_ref[...].astype(jnp.float32) + \
        lb_ref[...].astype(jnp.float32)
    h = jax.lax.dot_general(
        ln.astype(x_ref.dtype), w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[...].astype(jnp.float32)
    a = _gelu(h, x_ref.dtype)
    y = jax.lax.dot_general(
        a.astype(x_ref.dtype), w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[...].astype(jnp.float32)
    o_ref[...] = y.astype(o_ref.dtype)


@pin_default_matmul_precision
def _bwd_kernel(x_ref, ls_ref, lb_ref, w1_ref, b1_ref, w2_ref, g_ref,
                dx_ref, dls_ref, dlb_ref, dw1_ref, db1_ref, dw2_ref,
                db2_ref, *, eps: float):
    D = x_ref.shape[1]
    x32 = x_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)
    ls = ls_ref[...].astype(jnp.float32)

    # recompute forward intermediates in VMEM
    x_hat, rstd = _ln_stats(x32, eps)
    ln = x_hat * ls + lb_ref[...].astype(jnp.float32)
    ln_c = ln.astype(x_ref.dtype)
    h = jax.lax.dot_general(
        ln_c, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[...].astype(jnp.float32)
    a, gelu_prime = _gelu_and_prime(h, x_ref.dtype)

    # branch backward (contraction dims picked so no operand transposes
    # ever materialize in VMEM)
    gc = g.astype(x_ref.dtype)
    da = jax.lax.dot_general(  # g @ W2^T
        gc, w2_ref[...],
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    dh = da * gelu_prime
    dh_c = dh.astype(x_ref.dtype)
    dln = jax.lax.dot_general(  # dh @ W1^T
        dh_c, w1_ref[...],
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)

    # LayerNorm backward
    dxhat = dln * ls
    m1 = jnp.mean(dxhat, -1, keepdims=True)
    m2 = jnp.mean(dxhat * x_hat, -1, keepdims=True)
    dx = rstd * (dxhat - m1 - x_hat * m2)
    dx_ref[...] = dx.astype(dx_ref.dtype)

    # parameter grads accumulated across the (sequential) row-tile grid
    @pl.when(pl.program_id(0) == 0)
    def _():
        dls_ref[...] = jnp.zeros_like(dls_ref)
        dlb_ref[...] = jnp.zeros_like(dlb_ref)
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    dls_ref[...] += jnp.sum(dln * x_hat, 0, keepdims=True)
    dlb_ref[...] += jnp.sum(dln, 0, keepdims=True)
    db1_ref[...] += jnp.sum(dh, 0, keepdims=True)
    db2_ref[...] += jnp.sum(g, 0, keepdims=True)
    dw1_ref[...] += jax.lax.dot_general(  # ln^T @ dh (contract rows)
        ln_c, dh_c,
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dw2_ref[...] += jax.lax.dot_general(  # a^T @ g (contract rows)
        a.astype(x_ref.dtype), gc,
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)


def _pad_rows(M, TM, *arrays):
    """Pad row-flattened [M, D] operands to a 256-row tile multiple when
    M has no usable multiple-of-8 divisor (Mosaic requires the second-
    minor block dim be 8-aligned unless the block spans the whole array;
    e.g. M = 2 images x 138 tokens = 276 rows). Zero rows are exact:
    fwd outputs for them are sliced off, and in the backward a zero
    cotangent row zeroes every parameter-grad contribution (dln, dh, a
    terms all carry a factor of g or dh = 0)."""
    if M % TM == 0 and (TM % 8 == 0 or TM == M):
        return M, TM, arrays
    pad = (-M) % 256
    return (M + pad, 256,
            tuple(jnp.pad(a, ((0, pad), (0, 0))) for a in arrays))


def _run_fwd(x, ls, lb, w1, b1, w2, b2, eps, interpret):
    D = x.shape[-1]
    H = w1.shape[1]
    xf = x.reshape(-1, D)
    M0 = xf.shape[0]
    TM = min(_pick_tile(M0), 512)
    M, TM, (xf,) = _pad_rows(M0, TM, xf)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
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
        interpret=interpret,
    )(xf, ls.reshape(1, D), lb.reshape(1, D), w1, b1.reshape(1, H),
      w2, b2.reshape(1, D))
    return out[:M0].reshape(x.shape)


def _run_bwd(x, ls, lb, w1, b1, w2, g, eps, interpret):
    D = x.shape[-1]
    H = w1.shape[1]
    xf = x.reshape(-1, D)
    gf = g.reshape(-1, D)
    M0 = M = xf.shape[0]
    # f32 weight-grad accumulators (D*H + H*D = 4.7 MB at DeiT-S) live in
    # VMEM across the grid; bf16 matmul operands keep the [TM, H]
    # intermediates small enough for 256-row tiles (the v1 128-row tiles
    # quadrupled the grid length and serialized the backward)
    TM = min(_pick_tile(M), 256)
    if M % TM:
        TM = 256  # no divisor <= 256: _pad_rows pads to a 256 multiple
    M, TM, (xf, gf) = _pad_rows(M, TM, xf, gf)
    # The bf16 tanh-GELU derivative holds one more [TM, H] f32 temp live
    # than the erf form did, putting the 256-row tile at ~16.7 MB of
    # scoped VMEM -- just over Mosaic's default 16 MB cap (v5e physical
    # VMEM is far larger). Raise the cap instead of shrinking TM: the
    # 128-row tile doubles the grid and serializes the backward (v1).
    compiler_params = None
    if not interpret:
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=24 * 1024 * 1024)
    row_spec = pl.BlockSpec((TM, D), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps),
        grid=(M // TM,),
        in_specs=[
            row_spec,
            const((1, D)), const((1, D)), const((D, H)), const((1, H)),
            const((H, D)),
            pl.BlockSpec((TM, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TM, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            const((1, D)), const((1, D)), const((D, H)), const((1, H)),
            const((H, D)), const((1, D)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, D), x.dtype),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((D, H), jnp.float32),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
            jax.ShapeDtypeStruct((H, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
        ],
        compiler_params=compiler_params,
        interpret=interpret,
    )(xf, ls.reshape(1, D), lb.reshape(1, D), w1, b1.reshape(1, H),
      w2, gf)
    dx, dls, dlb, dw1, db1, dw2, db2 = outs
    dx = dx[:M0]
    return (dx.reshape(x.shape),
            dls.reshape(ls.shape).astype(ls.dtype),
            dlb.reshape(lb.shape).astype(lb.dtype),
            dw1.astype(w1.dtype), db1.reshape(b1.shape).astype(b1.dtype),
            dw2.astype(w2.dtype), db2.reshape((D,)).astype(b1.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def mlp_branch(x, ls, lb, w1, b1, w2, b2, eps=1e-6, interpret=False):
    """fc2(gelu(fc1(LN(x)))) -- differentiable fused branch."""
    return _run_fwd(x, ls, lb, w1, b1, w2, b2, eps, interpret)


def _mlp_branch_fwd(x, ls, lb, w1, b1, w2, b2, eps, interpret):
    y = _run_fwd(x, ls, lb, w1, b1, w2, b2, eps, interpret)
    return y, (x, ls, lb, w1, b1, w2)


def _mlp_branch_bwd(eps, interpret, res, g):
    x, ls, lb, w1, b1, w2 = res
    dx, dls, dlb, dw1, db1, dw2, db2 = _run_bwd(
        x, ls, lb, w1, b1, w2, g, eps, interpret)
    return dx, dls, dlb, dw1, db1, dw2, db2


mlp_branch.defvjp(_mlp_branch_fwd, _mlp_branch_bwd)

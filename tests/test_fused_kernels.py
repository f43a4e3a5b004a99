"""Pallas kernel numerics in interpreter mode (CPU): eval-path fused
attention/MLP vs the XLA composition, and the training custom_vjp's
hand-written backward vs autodiff."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tokenreduction_tpu.core.layers import (
    attention_core,
    merge_heads,
    split_heads,
)
from tokenreduction_tpu.ops.flash_attention import (
    fused_attention_qkv,
    fused_block_attention,
)
from tokenreduction_tpu.ops.fused_mlp import fused_mlp_residual
from tokenreduction_tpu.ops.fused_mlp_train import mlp_branch

KEY = jax.random.PRNGKey(0)


def k(i):
    return jax.random.fold_in(KEY, i)


def test_fused_block_attention_matches_xla():
    B, H, N, hd = 2, 6, 138, 64
    D = H * hd
    x = jax.random.normal(k(0), (B, N, D))
    ls = jax.random.normal(k(1), (D,)) * 0.1 + 1
    lb = jax.random.normal(k(2), (D,)) * 0.1
    wqkv = jax.random.normal(k(3), (D, 3 * D)) * 0.05
    bqkv = jax.random.normal(k(4), (3 * D,)) * 0.05
    wproj = jax.random.normal(k(5), (D, D)) * 0.05
    bproj = jax.random.normal(k(6), (D,)) * 0.05
    bias = jax.random.normal(k(7), (B, N))
    mask = jax.random.bernoulli(k(8), 0.8, (B, N)).at[:, 0].set(True)

    def ref(x, bias=None, mask=None):
        mu = x.mean(-1, keepdims=True)
        xc = x - mu
        ln = xc * jax.lax.rsqrt(
            (xc * xc).mean(-1, keepdims=True) + 1e-6) * ls + lb
        qkv = ln @ wqkv + bqkv
        q, kk, v = split_heads(qkv, H)
        o, p = attention_core(
            q, kk, v, hd ** -0.5,
            bias=None if bias is None else bias[:, None, None, :],
            mask=mask, return_probs=True)
        return x + (merge_heads(o) @ wproj + bproj), p

    r, p = ref(x)
    o, r0, cs = fused_block_attention(
        x, ls, lb, wqkv, bqkv, wproj, bproj, H, hd ** -0.5,
        interpret=True)
    np.testing.assert_allclose(np.asarray(o), np.asarray(r), atol=3e-5)
    np.testing.assert_allclose(np.asarray(r0), np.asarray(p[:, :, 0]),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(cs), np.asarray(p.sum(2)),
                               atol=1e-5)
    r2, p2 = ref(x, bias, mask)
    o2, r02, _ = fused_block_attention(
        x, ls, lb, wqkv, bqkv, wproj, bproj, H, hd ** -0.5,
        bias=bias, mask=mask, interpret=True)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(r2), atol=3e-5)
    np.testing.assert_allclose(np.asarray(r02), np.asarray(p2[:, :, 0]),
                               atol=1e-6)


def test_fused_block_attention_stacked_small_n_matches_xla():
    """Head-stacked block-diagonal path (N <= STACK_MAX_N): exact same
    math as the per-head path, incl. the per-key bias (ToMe) and the
    row0/colsum score by-products. B=3 exercises a partial final image
    subgroup; N=4 exercises the deep-stacking (many images per matmul)
    regime."""
    import pytest

    for N in (50, 13, 4):
        B, H, hd = 3, 6, 64
        D = H * hd
        x = jax.random.normal(k(10 + N), (B, N, D))
        ls = jax.random.normal(k(1), (D,)) * 0.1 + 1
        lb = jax.random.normal(k(2), (D,)) * 0.1
        wqkv = jax.random.normal(k(3), (D, 3 * D)) * 0.05
        bqkv = jax.random.normal(k(4), (3 * D,)) * 0.05
        wproj = jax.random.normal(k(5), (D, D)) * 0.05
        bproj = jax.random.normal(k(6), (D,)) * 0.05
        bias = jax.random.normal(k(7), (B, N))

        def ref(x, bias=None):
            mu = x.mean(-1, keepdims=True)
            xc = x - mu
            ln = xc * jax.lax.rsqrt(
                (xc * xc).mean(-1, keepdims=True) + 1e-6) * ls + lb
            qkv = ln @ wqkv + bqkv
            q, kk, v = split_heads(qkv, H)
            o, p = attention_core(
                q, kk, v, hd ** -0.5,
                bias=None if bias is None else bias[:, None, None, :],
                return_probs=True)
            return x + (merge_heads(o) @ wproj + bproj), p

        r, p = ref(x)
        o, r0, cs = fused_block_attention(
            x, ls, lb, wqkv, bqkv, wproj, bproj, H, hd ** -0.5,
            interpret=True)
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   atol=3e-5)
        np.testing.assert_allclose(np.asarray(r0),
                                   np.asarray(p[:, :, 0]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(cs), np.asarray(p.sum(2)),
                                   atol=1e-5)
        rb, pb = ref(x, bias)
        ob, r0b, _ = fused_block_attention(
            x, ls, lb, wqkv, bqkv, wproj, bproj, H, hd ** -0.5,
            bias=bias, interpret=True)
        np.testing.assert_allclose(np.asarray(ob), np.asarray(rb),
                                   atol=3e-5)
        np.testing.assert_allclose(np.asarray(r0b),
                                   np.asarray(pb[:, :, 0]), atol=1e-6)


def test_stacked_eligibility_rejects_overwide_head_configs():
    """One image's stacked rows (num_heads * n) must fit the [R, R]
    tile budget (STACK_ROWS) that the group planners reserve; otherwise
    S = max(1, ...) over-commits scoped VMEM for wide-head configs."""
    from tokenreduction_tpu.ops.flash_attention import (
        STACK_ROWS, _stacked_eligible)

    assert _stacked_eligible(13, 384, 6, False)
    assert _stacked_eligible(24, 1280, 20, False)  # 480 rows: fits
    assert not _stacked_eligible(24, 1408, 22, False)  # 528 rows
    assert not _stacked_eligible(24, 2048, 32, False)  # 768 rows
    assert 22 * 24 > STACK_ROWS >= 20 * 24


def test_fused_full_block_matches_xla():
    """Single-kernel whole block (attn + MLP halves) == the XLA
    composition, across stacked (N<=24) and per-head widths, including
    the DeiT-tiny lane-unaligned dims (D=192)."""
    from tokenreduction_tpu.ops.fused_full_block import fused_full_block

    for N, H in ((197, 6), (50, 6), (13, 6), (4, 6), (138, 3), (13, 3)):
        B, hd = 2, 64
        D = H * hd
        x = jax.random.normal(k(20 + N), (B, N, D))
        ls1 = jax.random.normal(k(1), (D,)) * 0.1 + 1
        lb1 = jax.random.normal(k(2), (D,)) * 0.1
        wqkv = jax.random.normal(k(3), (D, 3 * D)) * 0.05
        bqkv = jax.random.normal(k(4), (3 * D,)) * 0.05
        wproj = jax.random.normal(k(5), (D, D)) * 0.05
        bproj = jax.random.normal(k(6), (D,)) * 0.05
        ls2 = jax.random.normal(k(7), (D,)) * 0.1 + 1
        lb2 = jax.random.normal(k(8), (D,)) * 0.1
        w1 = jax.random.normal(k(9), (D, 4 * D)) * 0.05
        b1 = jax.random.normal(k(10), (4 * D,)) * 0.05
        w2 = jax.random.normal(k(11), (4 * D, D)) * 0.05
        b2 = jax.random.normal(k(12), (D,)) * 0.05

        def ln(v, s, b):
            mu = v.mean(-1, keepdims=True)
            vc = v - mu
            return vc * jax.lax.rsqrt(
                (vc * vc).mean(-1, keepdims=True) + 1e-6) * s + b

        qkv = ln(x, ls1, lb1) @ wqkv + bqkv
        q, kk, v = split_heads(qkv, H)
        o, _ = attention_core(q, kk, v, hd ** -0.5)
        y = x + (merge_heads(o) @ wproj + bproj)
        h = jax.nn.gelu(ln(y, ls2, lb2) @ w1 + b1, approximate=False)
        ref = y + (h @ w2 + b2)

        out = fused_full_block(
            x, ls1, lb1, wqkv, bqkv, wproj, bproj, ls2, lb2, w1, b1,
            w2, b2, H, hd ** -0.5, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=5e-5)


def test_fused_attention_qkv_matches_xla():
    B, H, N, hd = 2, 6, 197, 64
    D = H * hd
    qkv = jax.random.normal(k(10), (B, N, 3 * D))
    q, kk, v = split_heads(qkv, H)
    o_ref, p_ref = attention_core(q, kk, v, hd ** -0.5, return_probs=True)
    o, r0, cs = fused_attention_qkv(qkv, H, hd ** -0.5, interpret=True)
    np.testing.assert_allclose(np.asarray(o),
                               np.asarray(merge_heads(o_ref)), atol=1e-6)
    np.testing.assert_allclose(np.asarray(r0), np.asarray(p_ref[:, :, 0]),
                               atol=1e-6)


def _mlp_params(D=32, H=128):
    return (jax.random.normal(k(20), (D,)) * 0.1 + 1,
            jax.random.normal(k(21), (D,)) * 0.1,
            jax.random.normal(k(22), (D, H)) * 0.1,
            jax.random.normal(k(23), (H,)) * 0.05,
            jax.random.normal(k(24), (H, D)) * 0.1,
            jax.random.normal(k(25), (D,)) * 0.05)


def _xla_mlp_branch(x, ls, lb, w1, b1, w2, b2):
    mu = x.mean(-1, keepdims=True)
    xc = x - mu
    h = xc * jax.lax.rsqrt((xc * xc).mean(-1, keepdims=True) + 1e-6) \
        * ls + lb
    h = jax.nn.gelu(h @ w1 + b1, approximate=False)
    return h @ w2 + b2


def test_fused_mlp_residual_matches_xla():
    x = jax.random.normal(k(26), (2, 64, 32))
    ps = _mlp_params()
    ref = x + _xla_mlp_branch(x, *ps)
    out = fused_mlp_residual(x, *ps, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6)


def test_mlp_branch_custom_vjp_matches_autodiff():
    x = jax.random.normal(k(27), (2, 64, 32))
    ps = _mlp_params()

    def loss_ref(x, *ps):
        return jnp.sum(jnp.sin(_xla_mlp_branch(x, *ps)))

    def loss_kernel(x, *ps):
        return jnp.sum(jnp.sin(mlp_branch(x, *ps, 1e-6, True)))

    g_ref = jax.grad(loss_ref, argnums=tuple(range(7)))(x, *ps)
    g_k = jax.grad(loss_kernel, argnums=tuple(range(7)))(x, *ps)
    for a, b in zip(g_k, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("B,N", [(2, 138), (4, 139)])
def test_mlp_branch_pad_rows_shapes(B, N):
    """Row counts with no multiple-of-8 tile divisor (e.g. 2x138=276,
    the b2 DeiT-S post-reduction width that crashed the compiled Mosaic
    backward before _pad_rows): the train wrappers must zero-pad to a
    tile multiple, and the padded rows must contribute exactly nothing
    to any gradient."""
    x = jax.random.normal(k(28), (B, N, 32))
    ps = _mlp_params()
    np.testing.assert_allclose(
        np.asarray(mlp_branch(x, *ps, 1e-6, True)),
        np.asarray(_xla_mlp_branch(x, *ps)), atol=1e-5, rtol=1e-5)

    def loss_ref(x, *ps):
        return jnp.sum(jnp.sin(_xla_mlp_branch(x, *ps)))

    def loss_kernel(x, *ps):
        return jnp.sum(jnp.sin(mlp_branch(x, *ps, 1e-6, True)))

    g_ref = jax.grad(loss_ref, argnums=tuple(range(7)))(x, *ps)
    g_k = jax.grad(loss_kernel, argnums=tuple(range(7)))(x, *ps)
    for a, b in zip(g_k, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_attention_core_train_custom_vjp_matches_autodiff():
    from tokenreduction_tpu.ops.flash_attention_train import (
        attention_core_train,
    )

    B, H, N, hd = 2, 3, 37, 16
    q = jax.random.normal(k(30), (B, H, N, hd))
    kk = jax.random.normal(k(31), (B, H, N, hd))
    v = jax.random.normal(k(32), (B, H, N, hd))
    bias = jax.random.normal(k(33), (B, N))
    mask = jax.random.bernoulli(k(34), 0.85, (B, N)).at[:, 0].set(True)
    scale = hd ** -0.5

    def ref(q, kk, v, bias):
        out, p = attention_core(
            q, kk, v, scale, bias=bias[:, None, None, :], mask=mask,
            return_probs=True)
        return out, p[:, :, 0, :], p.sum(2)

    def kern(q, kk, v, bias):
        return attention_core_train(q, kk, v, scale, bias, mask, True)

    def loss(f):
        def inner(q, kk, v, bias):
            out, r0, cs = f(q, kk, v, bias)
            return (jnp.sum(jnp.sin(out)) + 0.3 * jnp.sum(jnp.cos(r0))
                    + 0.1 * jnp.sum(jnp.tanh(cs)))
        return inner

    g_ref = jax.grad(loss(ref), argnums=(0, 1, 2, 3))(q, kk, v, bias)
    g_k = jax.grad(loss(kern), argnums=(0, 1, 2, 3))(q, kk, v, bias)
    for a, b in zip(g_k, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_attend_branch_train_custom_vjp_matches_autodiff():
    """v2 block-level training kernel: fwd + all grads (incl. the row0
    cotangent EViT uses) vs autodiff of the XLA composition."""
    from tokenreduction_tpu.ops.fused_block_train import (
        attend_branch_train,
    )

    B, N, D, H = 3, 12, 16, 2
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    x = jax.random.normal(ks[0], (B, N, D))
    ls = jax.random.normal(ks[1], (D,)) * 0.1 + 1.0
    lb = jax.random.normal(ks[2], (D,)) * 0.1
    wqkv = jax.random.normal(ks[3], (D, 3 * D)) * 0.1
    bqkv = jax.random.normal(ks[4], (3 * D,)) * 0.1
    wproj = jax.random.normal(ks[5], (D, D)) * 0.1
    bproj = jax.random.normal(ks[6], (D,)) * 0.1
    w0 = jax.random.normal(ks[7], (H, N))
    scale = (D // H) ** -0.5

    def ref(x, ls, lb, wqkv, bqkv, wproj, bproj):
        mu = x.mean(-1, keepdims=True)
        xc = x - mu
        ln = xc * jax.lax.rsqrt(
            (xc * xc).mean(-1, keepdims=True) + 1e-6) * ls + lb
        qkv = ln @ wqkv + bqkv
        q, k, v = [
            qkv.reshape(B, N, 3, H, D // H)[:, :, i].transpose(0, 2, 1, 3)
            for i in range(3)]
        p = jax.nn.softmax(
            jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale, -1)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v)
        o = o.transpose(0, 2, 1, 3).reshape(B, N, D)
        return o @ wproj + bproj, p[:, :, 0, :]

    def loss_ref(*args):
        br, r0 = ref(*args)
        return jnp.sum(br ** 2) + jnp.sum(r0 * w0)

    def loss_ker(*args):
        br, r0 = attend_branch_train(*args, H, scale, 1e-6, True)
        return jnp.sum(br ** 2) + jnp.sum(r0 * w0)

    args = (x, ls, lb, wqkv, bqkv, wproj, bproj)
    br_a, r0_a = ref(*args)
    br_b, r0_b = attend_branch_train(*args, H, scale, 1e-6, True)
    np.testing.assert_allclose(np.asarray(br_b), np.asarray(br_a),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(r0_b), np.asarray(r0_a),
                               atol=1e-6)
    ga = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    gb = jax.grad(loss_ker, argnums=tuple(range(7)))(*args)
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-4, rtol=1e-4)


def test_fused_rect_attention_matches_xla():
    from tokenreduction_tpu.ops.flash_attention import fused_rect_attention

    B, N, M, D, H = 2, 14, 9, 16, 2
    hd = D // H
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    qkv = jax.random.normal(ks[0], (B, N, 3 * D))
    ids = jax.random.randint(ks[1], (B, M), 0, N)
    mask = jax.random.uniform(ks[2], (B, N)) > 0.3
    mask = mask.at[:, 0].set(True)
    # force one gathered row to be a DEAD token: the reference pair mask
    # (ats.py:117-120) makes its whole logits row -max -> softmax uniform
    # over ALL N keys; the kernel must reproduce that, not a key-masked
    # softmax of the dead row's real logits
    mask = mask.at[:, 5].set(False)
    ids = ids.at[:, 3].set(5)
    scale = hd ** -0.5

    q, k, v = [qkv.reshape(B, N, 3, H, hd)[:, :, i].transpose(0, 2, 1, 3)
               for i in range(3)]
    q_kept = jnp.take_along_axis(q, ids[:, None, :, None], axis=2)
    q_valid = jnp.take_along_axis(mask, ids, axis=1)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q_kept, k) * scale
    logits = jnp.where(q_valid[:, None, :, None] & mask[:, None, None, :],
                       logits, -jnp.finfo(jnp.float32).max)
    probs = jax.nn.softmax(logits, axis=-1)
    ref = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    ref = ref.transpose(0, 2, 1, 3).reshape(B, M, D)

    onehot = jax.nn.one_hot(ids, N, dtype=qkv.dtype)
    out = fused_rect_attention(qkv, onehot, mask, H, scale,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6)


def test_fused_mlp_gather_residual_matches_take_tokens():
    from tokenreduction_tpu.ops.fused_mlp import fused_mlp_gather_residual
    from tokenreduction_tpu.ops.gather import take_tokens

    x = jax.random.normal(k(40), (4, 24, 32))
    ps = _mlp_params()
    # absolute ids incl. CLS row 0, unsorted + duplicates allowed
    idx = jnp.stack([
        jax.random.permutation(k(41 + b), 24)[:9] for b in range(4)])
    idx = idx.at[:, 0].set(0)
    g = take_tokens(x, idx)
    ref = g + _xla_mlp_branch(g, *ps)
    out = fused_mlp_gather_residual(x, idx, *ps, interpret=True)
    assert out.shape == (4, 9, 32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6)


def test_fused_block_attention_want_keys_matches_xla():
    from tokenreduction_tpu.ops.flash_attention import fused_block_attention

    D, H = 32, 4
    x = jax.random.normal(k(50), (2, 24, D))
    ls = jax.random.normal(k(51), (D,)) * 0.1 + 1
    lb = jax.random.normal(k(52), (D,)) * 0.1
    wqkv = jax.random.normal(k(53), (D, 3 * D)) * 0.1
    bqkv = jax.random.normal(k(54), (3 * D,)) * 0.05
    wproj = jax.random.normal(k(55), (D, D)) * 0.1
    bproj = jax.random.normal(k(56), (D,)) * 0.05
    out, r0, cs, keys = fused_block_attention(
        x, ls, lb, wqkv, bqkv, wproj, bproj, H, (D // H) ** -0.5,
        want_keys=True, interpret=True)
    mu = x.mean(-1, keepdims=True)
    xc = x - mu
    ln = xc * jax.lax.rsqrt((xc * xc).mean(-1, keepdims=True) + 1e-6) \
        * ls + lb
    qkv = ln @ wqkv + bqkv
    ref = qkv.reshape(2, 24, 3, H, D // H)[:, :, 1].mean(axis=2)
    np.testing.assert_allclose(np.asarray(keys), np.asarray(ref),
                               atol=2e-6)
    # the other outputs are unchanged by want_keys
    out2, r02, cs2 = fused_block_attention(
        x, ls, lb, wqkv, bqkv, wproj, bproj, H, (D // H) ** -0.5,
        interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2),
                               atol=1e-6)


def test_fused_block_attention_idx_prologue_matches_take_tokens():
    from tokenreduction_tpu.ops.flash_attention import fused_block_attention
    from tokenreduction_tpu.ops.gather import take_tokens

    D, H = 32, 4
    x = jax.random.normal(k(60), (2, 24, D))
    ls = jax.random.normal(k(61), (D,)) * 0.1 + 1
    lb = jax.random.normal(k(62), (D,)) * 0.1
    wqkv = jax.random.normal(k(63), (D, 3 * D)) * 0.1
    bqkv = jax.random.normal(k(64), (3 * D,)) * 0.05
    wproj = jax.random.normal(k(65), (D, D)) * 0.1
    bproj = jax.random.normal(k(66), (D,)) * 0.05
    idx = jnp.stack([
        jax.random.permutation(k(67 + b), 24)[:10] for b in range(2)])
    idx = idx.at[:, 0].set(0)
    args = (ls, lb, wqkv, bqkv, wproj, bproj, H, (D // H) ** -0.5)
    out, r0, cs = fused_block_attention(
        x, *args, idx=idx, interpret=True)
    ref, r0_ref, cs_ref = fused_block_attention(
        take_tokens(x, idx), *args, interpret=True)
    assert out.shape == (2, 10, D)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6)
    np.testing.assert_allclose(np.asarray(r0), np.asarray(r0_ref),
                               atol=2e-6)


def test_onehot_gather_scatter_paths_match_xla(monkeypatch):
    """The TPU-gated one-hot matmul forms of take_tokens/take_rows/
    scatter_add_tokens are numerically identical to the gather/scatter
    forms (single-term f32 products); force the TPU path on CPU."""
    from tokenreduction_tpu.ops import gather as G

    x = jax.random.normal(k(70), (3, 12, 8))
    idx = jnp.stack([jax.random.permutation(k(71 + b), 12)[:5]
                     for b in range(3)])
    dist = jax.random.normal(k(74), (3, 12, 12))
    src = jax.random.normal(k(75), (3, 5, 8))
    ref_tok = jnp.take_along_axis(x, idx[..., None], axis=1)
    ref_rows1 = jnp.take_along_axis(
        dist, idx.reshape(3, 5, 1), axis=1)
    ref_rows2 = jnp.take_along_axis(
        dist, idx.reshape(3, 1, 5), axis=2)
    bidx = jnp.arange(3)[:, None]
    ref_scat = x.at[bidx, idx].add(src)

    monkeypatch.setattr(G, "_on_tpu", lambda: True)
    np.testing.assert_allclose(
        np.asarray(G.take_tokens(x, idx)), np.asarray(ref_tok), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(G.take_rows(dist, idx, axis=1)), np.asarray(ref_rows1),
        atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(G.take_rows(dist, idx, axis=2)), np.asarray(ref_rows2),
        atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(G.scatter_add_tokens(x, idx, src)),
        np.asarray(ref_scat), atol=1e-6)
    # colliding destinations must sum (ToMe merges several src -> 1 dst)
    dup = idx.at[:, 1].set(idx[:, 0])
    ref_dup = x.at[bidx, dup].add(src)
    np.testing.assert_allclose(
        np.asarray(G.scatter_add_tokens(x, dup, src)),
        np.asarray(ref_dup), atol=1e-6)
    # integer inputs keep the gather path (one-hot is float-only)
    xi = jnp.arange(3 * 12).reshape(3, 12, 1)
    np.testing.assert_array_equal(
        np.asarray(G.take_tokens(xi, idx)),
        np.asarray(jnp.take_along_axis(xi, idx[..., None], axis=1)))


def test_fused_rect_block_matches_composition():
    from tokenreduction_tpu.ops.flash_attention import (
        fused_rect_attention, fused_rect_block)
    from tokenreduction_tpu.ops.gather import take_tokens

    B, N, D, H = 2, 16, 32, 4
    qkv = jax.random.normal(k(90), (B, N, 3 * D))
    x = jax.random.normal(k(91), (B, N, D))
    wproj = jax.random.normal(k(92), (D, D)) * 0.1
    bproj = jax.random.normal(k(93), (D,)) * 0.05
    idx = jnp.stack([jax.random.permutation(k(94 + b), N)[:7]
                     for b in range(B)])
    idx = idx.at[:, 0].set(0)
    mask = jnp.ones((B, N), bool).at[:, -3:].set(False)
    scale = (D // H) ** -0.5
    out = fused_rect_block(qkv, x, idx, mask, wproj, bproj, H, scale,
                           interpret=True)
    onehot = jax.nn.one_hot(idx, N, dtype=qkv.dtype)
    merged = fused_rect_attention(qkv, onehot, mask, H, scale,
                                  interpret=True)
    ref = take_tokens(x, idx) + (merged @ wproj + bproj)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5)


def test_full_block_supported_accounts_for_dtype_and_batch(monkeypatch):
    """The whole-block VMEM gate uses the ACTUAL weight/activation
    itemsizes and the same group search as the launcher (down to one
    image per grid cell): DeiT-S bf16 fits the default plan; DeiT-B
    bf16 (weights alone ~14.2 MB) fits ONLY via the extended 24 MB-cap
    plan (round 5) and reverts to unsupported when that plan is opted
    out; DeiT-B at fp32 (28.3 MB weights) fits neither -- an
    itemsize=2 assumption would wrongly admit it and crash Mosaic's
    scoped-VMEM compile. fused_full_block itself raises instead of
    launching unfittable work."""
    import pytest

    from tokenreduction_tpu.ops.fused_full_block import (
        full_block_supported,
        fused_full_block,
    )

    assert full_block_supported(256, 197, 384, 1536, 6)       # DeiT-S bf16
    assert full_block_supported(256, 197, 768, 3072, 12)      # DeiT-B bf16
    assert not full_block_supported(256, 197, 768, 3072, 12,
                                    x_itemsize=4, w_itemsize=4)  # B fp32

    # plan-level contract: small fits the default (16 MB-cap) plan with
    # a multi-image group; base only fits the extended plan — G=1 under
    # the raised 24 MB cap
    from tokenreduction_tpu.ops.fused_full_block import _plan_group
    g_s, _, lim_s = _plan_group(256, 197, 384, 1536, 2, 2, False)
    assert lim_s is None and g_s >= 2
    g_b, _, lim_b = _plan_group(256, 197, 768, 3072, 2, 2, False)
    assert (g_b, lim_b) == (1, 24 * 1024 * 1024)
    monkeypatch.setenv("TOKENREDUCTION_FULLBLOCK_24MB", "0")
    assert not full_block_supported(256, 197, 768, 3072, 12)  # opt-out
    assert not full_block_supported(8, 197, 512, 2048, 8,
                                    x_itemsize=4, w_itemsize=4)  # fp32
    monkeypatch.delenv("TOKENREDUCTION_FULLBLOCK_24MB")

    D, H4, N, B = 768, 3072, 197, 2
    z = jnp.zeros
    with pytest.raises(ValueError, match="no VMEM-feasible group"):
        fused_full_block(
            z((B, N, D)), z((D,)), z((D,)), z((D, 3 * D)), z((3 * D,)),
            z((D, D)), z((D,)), z((D,)), z((D,)), z((D, H4)), z((H4,)),
            z((H4, D)), z((D,)), 12, (D // 12) ** -0.5, interpret=True)


def test_tome_matching_protects_distill_token():
    """DeiT-distilled ToMe: the dist token (index 1 = dst column 0) must
    never be a merge destination and counts as protected (reference
    tome.py:245-266)."""
    from tokenreduction_tpu.ops.tome import bipartite_soft_matching

    metric = jax.random.normal(k(70), (2, 12, 8))
    # make src token 2 nearly identical to the dist token (index 1) so
    # dst column 0 WOULD win the match without protection
    metric = metric.at[:, 2].set(metric[:, 1] + 1e-3)
    info_unprot = bipartite_soft_matching(metric, 3, class_token=True,
                                          distill_token=False)
    assert int(jnp.sum(info_unprot.dst_idx == 0)) > 0  # test has teeth
    info = bipartite_soft_matching(metric, 3, class_token=True,
                                   distill_token=True)
    assert int(jnp.sum(info.dst_idx == 0)) == 0
    # protected=2 caps r at (t - 2) // 2
    info2 = bipartite_soft_matching(metric, 100, class_token=True,
                                    distill_token=True)
    assert info2.r == (12 - 2) // 2


def test_bf16_tanh_gelu_bound_and_derivative():
    """The bf16 kernel path swaps the A&S erf GELU for the tanh form:
    its deviation from exact erf-GELU must stay below the bf16 output
    quantum (|d| <= 5e-4 while bf16 eps at |h|~2.7 is ~1e-2), and
    _gelu_and_prime's derivative must match autodiff of _gelu exactly."""
    from tokenreduction_tpu.ops.fused_mlp import _gelu
    from tokenreduction_tpu.ops.fused_mlp_train import _gelu_and_prime

    h = jnp.linspace(-8.0, 8.0, 4001)
    exact = 0.5 * h * (1.0 + jax.scipy.special.erf(h * 2.0 ** -0.5))
    tanh_form = _gelu(h, jnp.bfloat16)
    assert float(jnp.max(jnp.abs(tanh_form - exact))) < 5e-4

    a, prime = _gelu_and_prime(h, jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(a), np.asarray(tanh_form),
                               atol=1e-7)
    auto = jax.vmap(jax.grad(lambda z: _gelu(z, jnp.bfloat16)))(h)
    np.testing.assert_allclose(np.asarray(prime), np.asarray(auto),
                               atol=1e-5)

    # fp32 path keeps the near-exact erf
    a32, p32 = _gelu_and_prime(h, jnp.float32)
    assert float(jnp.max(jnp.abs(a32 - exact))) < 2e-6


def test_pallas_train_resident_budget(monkeypatch):
    """The whole-branch training kernels keep weights + f32 grad
    accumulators VMEM-resident; _pallas_train_eligible must reject any
    branch whose resident footprint (8 bytes/elem fp32 worst case)
    exceeds the 12 MB budget -- DeiT-B's branches do (37.7 / 18.9 MB),
    DeiT-S's fit (9.4 / 4.7 MB). Caught on-chip at base capacity:
    Mosaic asked for 71.75 MB of scoped VMEM at blocks_11.ffn."""
    from tokenreduction_tpu.core import layers
    from tokenreduction_tpu.ops import flash_attention

    monkeypatch.setattr(flash_attention, "supports_pallas", lambda: True)
    monkeypatch.delenv("TOKENREDUCTION_USE_PALLAS", raising=False)
    monkeypatch.delenv("TOKENREDUCTION_USE_PALLAS_TRAIN", raising=False)

    def mlp_elems(d):
        return 2 * d * 4 * d

    def attn_elems(d):
        return 4 * d * d

    for d in (192, 384):  # tiny, small: both branches eligible
        assert layers._pallas_train_eligible(mlp_elems(d))
        assert layers._pallas_train_eligible(attn_elems(d))
    # base: both branches over budget regardless of env flags
    assert not layers._pallas_train_eligible(mlp_elems(768))
    assert not layers._pallas_train_eligible(attn_elems(768))
    # the q/k/v attention core carries no weights -> always eligible
    assert layers._pallas_train_eligible()
    # env opt-out still wins for eligible dims
    monkeypatch.setenv("TOKENREDUCTION_USE_PALLAS_TRAIN", "0")
    assert not layers._pallas_train_eligible(mlp_elems(384))

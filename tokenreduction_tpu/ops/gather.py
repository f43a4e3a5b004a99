"""Static-shape batched gather/scatter primitives.

The reference's dynamic-shape `torch.gather`/`index_select` calls become
`take_along_axis` into statically-sized outputs -- the key XLA constraint.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _on_tpu() -> bool:
    # single source of truth for platform detection (the gather routing
    # and the Pallas kernels must agree about being on TPU)
    from tokenreduction_tpu.ops.flash_attention import supports_pallas

    return supports_pallas()


def take_tokens(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather tokens: x [B, N, C], idx [B, K] -> [B, K, C].

    Equivalent of the reference's batched gathers
    (models/topk.py:92, models/dyvit.py:340-347, models/ats.py:27-41).

    On TPU, floating-point gathers run as a one-hot batched matmul on the
    MXU: XLA's row gather is DMA-bound on v5e (measured 0.26 ms per
    [256,197,384]-bf16 stage vs 0.13 ms as a matmul). Bit-exact: each
    output element is a single-term fp32-accumulated product. The
    autodiff transpose is the matching scatter-add, same as
    take_along_axis. Integer inputs keep the gather path.
    """
    if (x.ndim == 3 and jnp.issubdtype(x.dtype, jnp.floating)
            and x.shape[1] > 1 and _on_tpu()):
        onehot = jax.nn.one_hot(idx, x.shape[1], dtype=x.dtype)  # [B,K,N]
        return jax.lax.dot_general(
            onehot, x, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
    return jnp.take_along_axis(x, idx[..., None], axis=1)


def take_rows(x: jnp.ndarray, idx: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Gather along `axis` of x with batched idx [B, K].

    On TPU, floating 3-D gathers run as one-hot batched matmuls (MXU)
    like take_tokens -- XLA's general gather from [B,N,N] distance
    matrices is DMA-bound. Bit-exact (single-term f32 products)."""
    if (x.ndim == 3 and jnp.issubdtype(x.dtype, jnp.floating)
            and axis in (1, 2) and _on_tpu()):
        onehot = jax.nn.one_hot(idx, x.shape[axis], dtype=x.dtype)
        if axis == 1:  # out[b, k, m] = x[b, idx[k], m]
            return jax.lax.dot_general(
                onehot, x, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32).astype(x.dtype)
        # axis == 2: out[b, n, k] = x[b, n, idx[k]]
        return jax.lax.dot_general(
            x, onehot, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(x.dtype)
    shape = [1] * x.ndim
    shape[0] = idx.shape[0]
    shape[axis] = idx.shape[1]
    return jnp.take_along_axis(x, idx.reshape(shape), axis=axis)


def scatter_add_tokens(dst: jnp.ndarray, idx: jnp.ndarray, src: jnp.ndarray,
                       force_xla: bool = False):
    """dst [B, T, C] += src [B, K, C] at token positions idx [B, K].

    On TPU, floating scatter-adds run as a transposed one-hot matmul
    (XLA's scatter serializes; the matmul sums colliding rows in one
    f32-accumulated MXU pass). When 3+ sources collide on one destination
    the MXU reduction order can differ from the sequential ``.at[].add``
    order in the last ulp, so ``force_xla`` (set from cfg.viz_mode via the
    ToMe merge path) pins the sequential scatter so CPU/TPU extraction
    artifacts stay bit-identical."""
    if (dst.ndim == 3 and jnp.issubdtype(dst.dtype, jnp.floating)
            and not force_xla and _on_tpu()):
        onehot = jax.nn.one_hot(idx, dst.shape[1], dtype=src.dtype)
        return dst + jax.lax.dot_general(
            onehot, src, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(dst.dtype)
    bidx = jnp.arange(dst.shape[0])[:, None]
    return dst.at[bidx, idx].add(src)


def complement_idx(idx: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Sorted complement of idx within range(dim): [B, K] -> [B, dim-K].

    Mirrors reference models/evit.py:25-46: scatter zeros at the selected
    positions into an arange, sort ascending, and drop the first K entries.
    (If 0 is selected the scatter collides and exactly K zeros sort to the
    front; if not, the legitimate 0 plus K scattered zeros sort to the front
    and one 0 survives into the complement -- both correct.)
    """
    B, K = idx.shape
    a = jnp.broadcast_to(jnp.arange(dim, dtype=idx.dtype), (B, dim))
    masked = jnp.put_along_axis(
        a, idx, jnp.zeros((B, K), dtype=idx.dtype), axis=-1, inplace=False
    )
    return jnp.sort(masked, axis=-1)[:, K:]

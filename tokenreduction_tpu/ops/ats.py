"""Adaptive Token Sampling under static shapes (reference models/ats.py).

The reference produces a ragged per-image token count via
`torch.unique` + `pad_sequence` (ats.py:77-83). Here the output width is
always the static `sample_count` (1 CLS + sample_count-1 sample slots);
duplicate samples become CLS-index (0) padding with mask=False -- exactly
the reference's padding convention, just at a fixed width. Masked attention
makes the pad rows inert, so logits match the ragged computation.
"""

from __future__ import annotations

import jax.numpy as jnp


def num_sample_steps(sample_count: int) -> int:
    """Exact torch.arange length semantics for the reference's step grid
    (ats.py:48): ceil((stop-start)/step) in float64. Due to fp rounding
    this is K-1 for most K but K for some (e.g. K=12, where
    (stop-start)/step = 11.000000000000002) -- a reference quirk that
    changes the sampled-token count and must be replicated for
    assignment fidelity."""
    import numpy as np

    K = sample_count
    start, stop, step = 1 / (2 * K), (2 * K - 1) / (2 * K), 2 / (2 * K)
    return int(np.ceil((stop - start) / step))


def sample_steps(sample_count: int, dtype=jnp.float32) -> jnp.ndarray:
    """torch.arange(1/(2K), (2K-1)/(2K), 2/(2K)) CDF midpoints
    (reference ats.py:48), with exact arange length/values."""
    import numpy as np

    K = sample_count
    n = num_sample_steps(K)
    vals = 1 / (2 * K) + np.arange(n) * (2 / (2 * K))
    return jnp.asarray(vals, dtype=dtype)


def unique_pad_sorted(ids: jnp.ndarray, big: int) -> jnp.ndarray:
    """Static-shape torch.unique(sorted=True) + zero padding at the end.

    ids: [B, M] integer sample ids (>= 1). Returns [B, M] with the unique
    values sorted ascending at the front and 0s padding the tail.
    """
    s = jnp.sort(ids, axis=-1)
    prev = jnp.concatenate([jnp.full_like(s[:, :1], -1), s[:, :-1]], axis=-1)
    dup = s == prev
    vals = jnp.where(dup, big, s)
    vals = jnp.sort(vals, axis=-1)
    return jnp.where(vals == big, 0, vals)


def sample_ids_from_scores(cls_attn, value_norms, mask,
                           sample_count: int, eps: float = 1e-6):
    """Sampling decision from the CLS attention row and value norms.

    cls_attn: [B, H, N-1] (CLS->patch probabilities); value_norms:
    [B, H, N-1]; mask: bool [B, N]. Returns (unique_ids [B, K],
    new_mask [B, K]) -- identical ids to the full-probs path, computed
    without materializing the [B, H, N, N] tensor."""
    B = cls_attn.shape[0]
    N = cls_attn.shape[-1] + 1
    sig = jnp.sum(cls_attn * value_norms, axis=1)  # [B, N-1]
    normed = sig / (sig.sum(axis=-1, keepdims=True) + eps)
    cdf = jnp.cumsum(normed, axis=1)
    cdf = jnp.where(mask[:, 1:], cdf, cdf + 0.1)

    steps = sample_steps(sample_count, dtype=cdf.dtype)
    dist = jnp.abs(steps[None, :, None] - cdf[:, None, :])
    sampled = dist.argmin(axis=-1) + 1

    unique_ids = unique_pad_sorted(sampled, big=N)
    new_mask = unique_ids != 0
    new_mask = jnp.concatenate(
        [jnp.ones((B, 1), dtype=bool), new_mask], axis=-1
    )
    unique_ids = jnp.concatenate(
        [jnp.zeros((B, 1), dtype=unique_ids.dtype), unique_ids], axis=-1
    )
    return unique_ids, new_mask


def adaptive_token_sampling(attn, v, mask, sample_count: int,
                            eps: float = 1e-6):
    """Inverse-transform sampling of tokens by CLS-attention significance.

    attn: [B, H, N, N] probabilities; v: [B, H, N, hd]; mask: bool [B, N].
    Returns (new_attn [B, H, K, N], new_mask [B, K],
    unique_sampled_token_ids [B, K]) with K = sample_count
    (reference ats.py:52-89).
    """
    B, H, N = attn.shape[:3]
    cls_attn = attn[:, :, 0, 1:]  # [B, H, N-1]
    value_norms = jnp.linalg.norm(v[:, :, 1:, :], axis=-1)  # [B, H, N-1]
    sig = jnp.sum(cls_attn * value_norms, axis=1)  # [B, N-1]
    normed = sig / (sig.sum(axis=-1, keepdims=True) + eps)

    cdf = jnp.cumsum(normed, axis=1)
    cdf = jnp.where(mask[:, 1:], cdf, cdf + 0.1)  # bump dead tokens

    steps = sample_steps(sample_count, dtype=cdf.dtype)  # [n_steps]
    dist = jnp.abs(steps[None, :, None] - cdf[:, None, :])
    sampled = dist.argmin(axis=-1) + 1  # ids in [1, N-1]

    unique_ids = unique_pad_sorted(sampled, big=N)  # [B, n_steps]
    new_mask = unique_ids != 0
    new_mask = jnp.concatenate(
        [jnp.ones((B, 1), dtype=bool), new_mask], axis=-1
    )
    unique_ids = jnp.concatenate(
        [jnp.zeros((B, 1), dtype=unique_ids.dtype), unique_ids], axis=-1
    )  # [B, K], CLS first; 0-pads gather the CLS row (inert under mask)

    new_attn = jnp.take_along_axis(
        attn, unique_ids[:, None, :, None], axis=2
    )  # [B, H, K, N]
    return new_attn, new_mask, unique_ids

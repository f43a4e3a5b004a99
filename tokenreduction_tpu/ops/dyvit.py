"""DyViT policy softmax and Gumbel-softmax (reference models/dyvit.py:39-51,
torch.nn.functional.gumbel_softmax with hard=True).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def softmax_with_policy(attn, policy, eps: float = 1e-6):
    """Masked softmax that keeps gradients flowing through the policy.

    attn: [B, H, N, N] logits; policy: [B, N, 1] in {0, 1} soft mask.
    Identical formula to reference dyvit.py:39-51 (key-side policy with an
    identity escape so every query attends at least to itself).
    """
    B, N, _ = policy.shape
    attn_policy = policy.reshape(B, 1, 1, N)
    eye = jnp.eye(N, dtype=attn_policy.dtype).reshape(1, 1, N, N)
    attn_policy = attn_policy + (1.0 - attn_policy) * eye
    max_att = jnp.max(attn, axis=-1, keepdims=True)
    attn = attn - max_att
    attn = jnp.exp(attn.astype(jnp.float32)) * attn_policy.astype(jnp.float32)
    attn = (attn + eps / N) / (attn.sum(axis=-1, keepdims=True) + eps)
    return attn.astype(max_att.dtype)


def gumbel_softmax_hard(key, logits, tau: float = 1.0):
    """Straight-through hard Gumbel-softmax over the last axis
    (torch F.gumbel_softmax(hard=True) semantics)."""
    gumbels = -jnp.log(-jnp.log(
        jax.random.uniform(key, logits.shape, dtype=logits.dtype,
                           minval=jnp.finfo(logits.dtype).tiny, maxval=1.0)
    ))
    y_soft = jax.nn.softmax((logits + gumbels) / tau, axis=-1)
    index = y_soft.argmax(axis=-1, keepdims=True)
    y_hard = (jnp.arange(logits.shape[-1]) == index).astype(logits.dtype)
    return y_hard + y_soft - jax.lax.stop_gradient(y_soft)

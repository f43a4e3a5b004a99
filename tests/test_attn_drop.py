"""attn_drop > 0 semantics (round-5 verdict item 6).

The reference applies dropout to the attention *probabilities* between
the softmax and the value matmul (models/topk.py:48-49), and its
selection scores read the post-dropout tensor (models/topk.py:60-61).
Two deliberate reference quirks are pinned here too:

- DyViT's Policy_Attention constructs the dropout module but never
  calls it (models/dyvit.py:36,54-68) -- the policy path must NOT drop.
- ATS drops the full [B,H,N,N] tensor before sampling reads it
  (models/ats.py:122-127); our two-pass ATS never materializes that
  tensor, so attn_drop > 0 must refuse loudly instead of silently
  training different math.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tokenreduction_tpu.core.layers import Attention, attention_core

B, H, N, HD = 2, 3, 17, 8
DIM = H * HD
SCALE = HD ** -0.5


def _qkv(key):
    kq, kk, kv = jax.random.split(key, 3)
    shape = (B, H, N, HD)
    return (jax.random.normal(kq, shape, jnp.float32),
            jax.random.normal(kk, shape, jnp.float32),
            jax.random.normal(kv, shape, jnp.float32))


def test_attention_core_prob_dropout_matches_torch_oracle():
    """Exact fp32 parity given the same dropout mask: dropout is applied
    to the probabilities pre-matmul with inverted scaling, and the
    returned probs are the dropped ones (what reference scores read)."""
    q, k, v = _qkv(jax.random.PRNGKey(0))
    rate = 0.3
    drop_key = jax.random.PRNGKey(42)

    out, probs = attention_core(
        q, k, v, SCALE, return_probs=True,
        dropout_rate=rate, dropout_rng=drop_key)

    # the mask attention_core drew, regenerated bit-identically
    keep = jax.random.bernoulli(drop_key, 1.0 - rate, (B, H, N, N))

    tq, tk, tv = (torch.from_numpy(np.asarray(a)) for a in (q, k, v))
    t_probs = torch.softmax(tq @ tk.transpose(-2, -1) * SCALE, dim=-1)
    t_probs = torch.where(torch.from_numpy(np.asarray(keep)),
                          t_probs / (1.0 - rate),
                          torch.zeros_like(t_probs))
    t_out = t_probs @ tv

    np.testing.assert_allclose(np.asarray(probs), t_probs.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out), t_out.numpy(),
                               rtol=1e-5, atol=1e-5)


def _apply_attn(attn_drop, key, *, policy=None, deterministic=False,
                score=None):
    m = Attention(dim=DIM, num_heads=H, attn_drop=attn_drop,
                  force_xla=True)
    x = jax.random.normal(jax.random.PRNGKey(7), (B, N, DIM), jnp.float32)
    params = m.init({"params": jax.random.PRNGKey(1)}, x,
                    deterministic=True)
    out, (aux, _) = m.apply(
        params, x, policy=policy, score=score,
        deterministic=deterministic,
        rngs={"dropout": key})
    return out, aux


def test_attention_module_attn_drop_is_live_in_training():
    """Training with attn_drop > 0 must actually drop (reproducible per
    rng key, different across keys, different from the no-drop path)."""
    base, aux0 = _apply_attn(0.0, jax.random.PRNGKey(2), score="cls")
    a1, aux1 = _apply_attn(0.5, jax.random.PRNGKey(2), score="cls")
    a1b, _ = _apply_attn(0.5, jax.random.PRNGKey(2), score="cls")
    a2, _ = _apply_attn(0.5, jax.random.PRNGKey(3), score="cls")

    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a1b))
    assert not np.allclose(np.asarray(a1), np.asarray(base))
    assert not np.allclose(np.asarray(a1), np.asarray(a2))
    # the selection score reads the dropped tensor (models/topk.py:60-61)
    assert not np.allclose(np.asarray(aux1), np.asarray(aux0))


def test_attention_module_attn_drop_inert_at_eval():
    a, _ = _apply_attn(0.9, jax.random.PRNGKey(2), deterministic=True)
    b, _ = _apply_attn(0.0, jax.random.PRNGKey(5), deterministic=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_policy_path_never_drops():
    """Reference Policy_Attention never calls its dropout module
    (models/dyvit.py:54-68): with a policy, attn_drop must be inert even
    in training."""
    policy = jnp.ones((B, N, 1), jnp.float32)
    a, _ = _apply_attn(0.9, jax.random.PRNGKey(2), policy=policy)
    b, _ = _apply_attn(0.0, jax.random.PRNGKey(9), policy=policy)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ats_refuses_attn_drop():
    from tokenreduction_tpu import create_model

    m, cfg = create_model(
        "ats_tiny_patch16_224", reduction_loc=(1,), keep_rate=(8,),
        embed_dim=32, depth=2, num_heads=2, patch_size=56,
        attn_drop_rate=0.1)
    x = jnp.ones((1, 224, 224, 3), jnp.float32)
    with pytest.raises(NotImplementedError, match="attn_drop"):
        m.init({"params": jax.random.PRNGKey(0)}, x, train=False)

"""Gradient flow: every method's training forward is differentiable with
finite, nonzero grads in both backbone and method-specific params."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tokenreduction_tpu import create_model
from tokenreduction_tpu.train import losses as L

TINY = dict(embed_dim=32, num_heads=2, depth=4, patch_size=8)
LOC = (1, 2)

METHODS = ["topk", "evit", "tome", "sit", "patchmerger", "sinkhorn",
           "dpcknn", "kmedoids", "dyvit", "ats", "heuristic"]

NEW_PARAM_PREFIX = {
    "sit": "cluster_layers_0",
    "patchmerger": "cluster_layers_0",
    "sinkhorn": "cluster_layers_0",
    "dpcknn": "cluster_layers_0",
    "dyvit": "score_predictor_0",
}


@pytest.mark.parametrize("method", METHODS)
def test_grads_finite_and_nonzero(method):
    module, cfg = create_model(
        f"{method}_small_patch16_224", num_classes=5, img_size=32,
        reduction_loc=LOC, keep_rate=(0.7,), **TINY)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    labels = jnp.array([0, 1])
    rngs = {"params": jax.random.PRNGKey(1),
            "gumbel": jax.random.PRNGKey(2),
            "cluster": jax.random.PRNGKey(3)}
    params = module.init(rngs, x, train=True)["params"]
    run_rngs = {k: v for k, v in rngs.items() if k != "params"}

    def loss(p):
        out = module.apply({"params": p}, x, train=True, rngs=run_rngs)
        logits = out[0] if isinstance(out, tuple) else out
        return L.cross_entropy(logits, labels)

    val, grads = jax.jit(jax.value_and_grad(loss))(params)
    assert np.isfinite(float(val))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.isfinite(g).all()) for g in leaves)
    # backbone receives gradient
    g_qkv = grads["blocks_0"]["attn"]["qkv"]["kernel"]
    assert float(jnp.abs(g_qkv).sum()) > 0
    # method-specific new modules receive gradient
    prefix = NEW_PARAM_PREFIX.get(method)
    if prefix:
        g_new = jax.tree_util.tree_leaves(grads[prefix])
        assert sum(float(jnp.abs(g).sum()) for g in g_new) > 0, prefix

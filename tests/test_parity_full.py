"""Full-model fp32 parity for the remaining 8 reduction methods.

Backbone weights: random torch state converted via models/convert.py.
Method-specific weights (cluster layers, predictors): exported from the
flax init into the torch oracle, so both sides share parameters exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

import oracles as O
import oracles_models as OM
from tokenreduction_tpu import create_model
from tokenreduction_tpu.models.convert import (
    convert_torch_state_dict,
    merge_pretrained,
)

DEPTH, DIM, HEADS, PATCH, NCLS = 4, 32, 2, 8, 11
IMG = 32
NTOK = 16
LOC = (1, 2)
TOL = dict(rtol=3e-4, atol=3e-4)


def build(method, **kw):
    state = O.make_vit_state(DEPTH, DIM, HEADS, PATCH, NCLS, seed=2,
                             n_tokens=NTOK)
    module, cfg = create_model(
        f"{method}_small_patch16_224", num_classes=NCLS, img_size=IMG,
        embed_dim=DIM, num_heads=HEADS, depth=DEPTH, patch_size=PATCH,
        reduction_loc=LOC, keep_rate=(0.7,), **kw)
    x = jnp.ones((2, IMG, IMG, 3))
    variables = module.init({"params": jax.random.PRNGKey(5)}, x,
                            train=False)
    tree, _ = convert_torch_state_dict(
        {k: v.numpy() for k, v in state.items()})
    params, report = merge_pretrained(variables["params"], tree)
    assert not report["shape_mismatch"]
    return module, cfg, params, state


def images(seed=11, b=2):
    g = torch.Generator().manual_seed(seed)
    xt = torch.randn(b, 3, IMG, IMG, generator=g)
    return xt, jnp.asarray(xt.permute(0, 2, 3, 1).numpy())


def counts():
    return [int(0.7 ** (s + 1) * NTOK) for s in range(len(LOC))]


@pytest.mark.parametrize("method", ["sit", "patchmerger", "sinkhorn",
                                    "dpcknn", "kmedoids"])
def test_cluster_family_logits(method):
    module, cfg, params, state = build(method)
    xt, xj = images()
    ours = module.apply({"params": params}, xj, train=False)
    cw = [params[f"cluster_layers_{k}"] for k in range(len(LOC))] \
        if f"cluster_layers_0" in params else [{}] * len(LOC)
    kw = {}
    if method == "sinkhorn":
        kw = dict(eps=cfg.sinkhorn_eps, iters=cfg.cluster_iters)
    elif method == "dpcknn":
        kw = dict(k=cfg.k_neighbors)
    elif method == "kmedoids":
        kw = dict(iters=cfg.cluster_iters)
    ref, _ = OM.cluster_family_forward(
        state, xt, DEPTH, HEADS, DIM, PATCH, list(LOC), method, cw,
        counts(), **kw)
    np.testing.assert_allclose(np.asarray(ours), O.np32(ref), **TOL)


def test_tome_logits():
    module, cfg, params, state = build("tome")
    xt, xj = images()
    ours = module.apply({"params": params}, xj, train=False)
    from tokenreduction_tpu.reduction.tome import per_block_removals

    removals = per_block_removals(cfg)
    ref = OM.tome_forward(state, xt, DEPTH, HEADS, DIM, PATCH, removals)
    np.testing.assert_allclose(np.asarray(ours), O.np32(ref), **TOL)


def test_tome_distilled_logits():
    """DeiT-distilled ToMe: the dist token (index 1 = dst-set column 0)
    must never be a merge destination (reference tome.py:245-266,
    protected=2) and eval logits are the head/head_dist average."""
    state = O.make_vit_state(DEPTH, DIM, HEADS, PATCH, NCLS, seed=3,
                             num_prefix=2, n_tokens=NTOK)
    module, cfg = create_model(
        "tome_small_patch16_224", num_classes=NCLS, img_size=IMG,
        embed_dim=DIM, num_heads=HEADS, depth=DEPTH, patch_size=PATCH,
        reduction_loc=LOC, keep_rate=(0.7,), distilled=True)
    x = jnp.ones((2, IMG, IMG, 3))
    variables = module.init({"params": jax.random.PRNGKey(5)}, x,
                            train=False)
    tree, _ = convert_torch_state_dict(
        {k: v.numpy() for k, v in state.items()})
    params, report = merge_pretrained(variables["params"], tree)
    assert not report["shape_mismatch"]
    xt, xj = images()
    ours = module.apply({"params": params}, xj, train=False)
    from tokenreduction_tpu.reduction.tome import per_block_removals

    removals = per_block_removals(cfg)
    ref = OM.tome_forward(state, xt, DEPTH, HEADS, DIM, PATCH, removals,
                          distilled=True)
    np.testing.assert_allclose(np.asarray(ours), O.np32(ref), **TOL)


def test_ats_logits_and_ids():
    module, cfg, params, state = build("ats", viz_mode=True)
    xt, xj = images()
    ours, viz = module.apply({"params": params}, xj, train=False)
    from tokenreduction_tpu.core.config import reduction_schedule

    sched = reduction_schedule(cfg)
    per_block = [0] * DEPTH
    for s, l in enumerate(LOC):
        per_block[l] = sched[s]
    ref, ids = OM.ats_forward(state, xt, DEPTH, HEADS, DIM, PATCH,
                              per_block)
    np.testing.assert_allclose(np.asarray(ours), O.np32(ref), **TOL)
    for i in LOC:
        np.testing.assert_array_equal(
            np.asarray(viz["Kept_Tokens"][i]), ids[i].numpy()[:, 1:] - 1)


def test_ats_sample_width_matches_torch_arange_quirk():
    from tokenreduction_tpu.ops.ats import num_sample_steps

    for K in range(2, 40):
        steps = torch.arange(1 / (2 * K), (2 * K - 1) / (2 * K),
                             2 / (2 * K))
        assert num_sample_steps(K) == len(steps), K


def test_heuristic_logits():
    module, cfg, params, state = build(
        "heuristic", heuristic_pattern="l2", min_radius=0.8)
    xt, xj = images()
    ours = module.apply({"params": params}, xj, train=False)
    from tokenreduction_tpu.reduction.heuristic import heuristic_masks

    _, masks, _ = heuristic_masks(cfg.replace(viz_mode=False))
    ref = OM.heuristic_forward(state, xt, DEPTH, HEADS, DIM, PATCH, masks)
    np.testing.assert_allclose(np.asarray(ours), O.np32(ref), **TOL)


def test_dyvit_eval_logits_and_ids():
    module, cfg, params, state = build("dyvit", viz_mode=True)
    xt, xj = images()
    ours, viz = module.apply({"params": params}, xj, train=False)
    pw = [params[f"score_predictor_{k}"] for k in range(len(LOC))]
    ratios = [0.7 ** (s + 1) for s in range(len(LOC))]
    ref, kept = OM.dyvit_eval_forward(
        state, xt, DEPTH, HEADS, DIM, PATCH, list(LOC), ratios, pw)
    np.testing.assert_allclose(np.asarray(ours), O.np32(ref), **TOL)
    for i in LOC:
        np.testing.assert_array_equal(
            np.asarray(viz["Kept_Tokens"][i]), kept[i].numpy())

"""fp32 numerical parity against independent torch oracles.

BASELINE.json fidelity gate: logits and kept/merged token assignments must
match the (PyTorch) reference semantics within fp32 tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

import oracles as O
from tokenreduction_tpu import create_model
from tokenreduction_tpu.models.convert import (
    convert_torch_state_dict,
    merge_pretrained,
)

DEPTH, DIM, HEADS, PATCH, NCLS = 4, 32, 2, 8, 11
IMG = 32  # 4x4 = 16 patches
NTOK = 16
LOC = (1, 2)
TOL = dict(rtol=2e-4, atol=2e-4)


def build_pair(method, seed=1, num_prefix=1, **kw):
    """Random torch state -> converted flax params + our model."""
    state = O.make_vit_state(DEPTH, DIM, HEADS, PATCH, NCLS, seed=seed,
                             num_prefix=num_prefix, n_tokens=NTOK)
    name = f"{method}_small_patch16_224" if method else \
        "deit_small_patch16_224_local"
    module, cfg = create_model(
        name, num_classes=NCLS, img_size=IMG,
        embed_dim=DIM, num_heads=HEADS, depth=DEPTH, patch_size=PATCH,
        **kw,
    )
    x = jnp.ones((2, IMG, IMG, 3))
    variables = module.init({"params": jax.random.PRNGKey(0)}, x,
                            train=False)
    tree, _ = convert_torch_state_dict(
        {k: v.numpy() for k, v in state.items()})
    params, report = merge_pretrained(variables["params"], tree)
    assert not report["shape_mismatch"], report["shape_mismatch"]
    return module, cfg, {"params": params}, state


def rand_images(seed=7, b=2):
    g = torch.Generator().manual_seed(seed)
    xt = torch.randn(b, 3, IMG, IMG, generator=g)
    xj = jnp.asarray(xt.permute(0, 2, 3, 1).numpy())
    return xt, xj


def test_dense_logits_match():
    module, cfg, variables, state = build_pair("")
    xt, xj = rand_images()
    ours = module.apply(variables, xj, train=False)
    ref = O.dense_forward(state, xt, DEPTH, HEADS, DIM, PATCH)
    np.testing.assert_allclose(np.asarray(ours), O.np32(ref), **TOL)


def test_dense_distilled_logits_match():
    """DeiT-distilled backbone: dist token in the prefix, pos_embed
    len n+2, eval logits = (head + head_dist) / 2 (reference
    deit_viz.py distilled forward)."""
    module, cfg, variables, state = build_pair("", num_prefix=2,
                                               distilled=True)
    xt, xj = rand_images()
    ours = module.apply(variables, xj, train=False)
    ref = O.dense_forward(state, xt, DEPTH, HEADS, DIM, PATCH)
    np.testing.assert_allclose(np.asarray(ours), O.np32(ref), **TOL)


def test_topk_logits_and_indices_match():
    module, cfg, variables, state = build_pair(
        "topk", reduction_loc=LOC, keep_rate=(0.7,), viz_mode=True)
    xt, xj = rand_images()
    ours, viz = module.apply(variables, xj, train=False)
    counts = [int(0.7 ** (s + 1) * NTOK) for s in range(len(LOC))]
    ref, kept = O.topk_forward(state, xt, DEPTH, HEADS, DIM, PATCH,
                               list(LOC), counts)
    np.testing.assert_allclose(np.asarray(ours), O.np32(ref), **TOL)
    for i in LOC:
        np.testing.assert_array_equal(
            np.asarray(viz["Kept_Tokens"][i]), kept[i].numpy())


def test_evit_logits_indices_fusion_match():
    module, cfg, variables, state = build_pair(
        "evit", reduction_loc=LOC, keep_rate=(0.7,), viz_mode=True)
    xt, xj = rand_images()
    ours, viz = module.apply(variables, xj, train=False)
    counts = [int(0.7 ** (s + 1) * NTOK) for s in range(len(LOC))]
    ref, kept, compls = O.evit_forward(state, xt, DEPTH, HEADS, DIM, PATCH,
                                       list(LOC), counts)
    np.testing.assert_allclose(np.asarray(ours), O.np32(ref), **TOL)
    for i in LOC:
        np.testing.assert_array_equal(
            np.asarray(viz["Kept_Tokens"][i])[:, :-1], kept[i].numpy())
        assert (np.asarray(viz["Kept_Tokens"][i])[:, -1] == -1).all()
        np.testing.assert_array_equal(
            np.asarray(viz["Fusion_Assign"][i]), compls[i].numpy())


def test_tome_merge_op_matches():
    from tokenreduction_tpu.ops.tome import (
        bipartite_soft_matching, merge_wavg)
    g = torch.Generator().manual_seed(3)
    metric = torch.randn(2, 12, 8, generator=g)
    x = torch.randn(2, 12, 8, generator=g)
    r = 3
    ref_out, ref_size, _ = O.tome_merge(metric, x, None, r)
    info = bipartite_soft_matching(jnp.asarray(metric.numpy()), r,
                                   class_token=True)
    out, size = merge_wavg(info, jnp.asarray(x.numpy()), None)
    np.testing.assert_allclose(np.asarray(out), O.np32(ref_out), **TOL)
    np.testing.assert_allclose(np.asarray(size), O.np32(ref_size), **TOL)


def test_sinkhorn_ot_matches():
    from tokenreduction_tpu.ops.sinkhorn import log_optimal_transport
    g = torch.Generator().manual_seed(4)
    scores = torch.randn(2, 5, 9, generator=g)
    ref = O.sinkhorn_ot(scores, eps=1.0, iters=3)
    ours = log_optimal_transport(jnp.asarray(scores.numpy()), 1.0, 3)
    np.testing.assert_allclose(np.asarray(ours), O.np32(ref), **TOL)


def test_dpcknn_clusters_match():
    from tokenreduction_tpu.ops.dpc_knn import (
        cluster_dpc_knn, merge_clusters)
    g = torch.Generator().manual_seed(5)
    x = torch.randn(2, 16, 8, generator=g)
    ref_idx, ref_down = O.dpc_knn(x, cluster_num=6, k=5)
    idx, down = cluster_dpc_knn(jnp.asarray(x.numpy()), 6, 5, noise=None)
    np.testing.assert_array_equal(np.asarray(down), ref_down.numpy())
    np.testing.assert_array_equal(np.asarray(idx), ref_idx.numpy())
    w = torch.rand(2, 16, 1, generator=g)
    ref_merged = O.merge_weighted(x, ref_idx, 6, w)
    merged, _, _ = merge_clusters(
        jnp.asarray(x.numpy()), idx, 6, jnp.asarray(w.numpy()))
    np.testing.assert_allclose(np.asarray(merged), O.np32(ref_merged),
                               rtol=1e-3, atol=1e-4)


def test_kmedoids_matches():
    from tokenreduction_tpu.ops.kmedoids import k_medoids_fit
    g = torch.Generator().manual_seed(6)
    x = torch.randn(2, 16, 8, generator=g)
    w = torch.rand(2, 16, 1, generator=g) + 0.1
    ref_c, ref_idx, ref_a = O.kmedoids(x, 5, 3, w)
    c, idx, a = k_medoids_fit(jnp.asarray(x.numpy()), 5, 3,
                              jnp.asarray(w.numpy()))
    np.testing.assert_array_equal(np.asarray(idx), ref_idx.numpy())
    np.testing.assert_array_equal(np.asarray(a), ref_a.numpy())
    np.testing.assert_allclose(np.asarray(c), O.np32(ref_c), **TOL)


def test_ats_unique_pad_matches():
    from tokenreduction_tpu.ops.ats import adaptive_token_sampling
    g = torch.Generator().manual_seed(8)
    B, H, N, hd, K = 2, 2, 17, 4, 8
    logits = torch.randn(B, H, N, N, generator=g)
    attn = logits.softmax(-1)
    v = torch.randn(B, H, N, hd, generator=g)
    mask = torch.ones(B, N, dtype=torch.bool)
    ref_ids, ref_mask = O.ats_sample(attn, v, mask, K)
    _, new_mask, ids = adaptive_token_sampling(
        jnp.asarray(attn.numpy()), jnp.asarray(v.numpy()),
        jnp.asarray(mask.numpy()), K)
    # reference pads to max-in-batch; ours pads to K. Compare the K prefix.
    w = min(ids.shape[1], ref_ids.shape[1])
    np.testing.assert_array_equal(np.asarray(ids)[:, :w],
                                  ref_ids.numpy()[:, :w])
    assert (np.asarray(ids)[:, w:] == 0).all()
    np.testing.assert_array_equal(np.asarray(new_mask)[:, :w],
                                  ref_mask.numpy()[:, :w])


def test_dyvit_policy_softmax_matches():
    from tokenreduction_tpu.ops.dyvit import softmax_with_policy
    g = torch.Generator().manual_seed(9)
    attn = torch.randn(2, 2, 10, 10, generator=g)
    policy = (torch.rand(2, 10, 1, generator=g) > 0.4).float()
    ref = O.policy_softmax(attn, policy)
    ours = softmax_with_policy(jnp.asarray(attn.numpy()),
                               jnp.asarray(policy.numpy()))
    np.testing.assert_allclose(np.asarray(ours), O.np32(ref), **TOL)


def test_complement_idx_matches_reference_trick():
    from tokenreduction_tpu.ops.gather import complement_idx
    # includes the 0-selected and 0-unselected corner cases
    idx = jnp.asarray([[0, 3, 5], [1, 2, 7]])
    out = complement_idx(idx, 8)
    np.testing.assert_array_equal(
        np.asarray(out), [[1, 2, 4, 6, 7], [0, 3, 4, 5, 6]])

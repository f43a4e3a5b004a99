"""Full-model torch oracles for the remaining reduction methods.

Backbone weights come from oracles.make_vit_state (converted into flax by
the tests); method-specific weights (cluster layers, predictors) are
EXPORTED from the flax init so both sides share parameters exactly.
"""

import numpy as np
import torch
import torch.nn.functional as F

from oracles import attention, block, classify, embed, ln, mlp, policy_softmax


def t(arr):
    return torch.from_numpy(np.asarray(arr)).float()


# ---------------------------------------------------------------- cluster
def sit_cluster(x, w):
    h = F.layer_norm(x, (x.shape[-1],), t(w["weight_ln"]["scale"]),
                     t(w["weight_ln"]["bias"]), eps=1e-5)
    h = F.gelu(h @ t(w["weight_fc1"]["kernel"]) + t(w["weight_fc1"]["bias"]))
    logits = h @ t(w["weight_fc2"]["kernel"]) + t(w["weight_fc2"]["bias"])
    soft = torch.softmax(logits * t(w["scale"]), dim=1).transpose(2, 1)
    return soft @ x, soft


def patchmerger_cluster(x, w):
    xn = F.layer_norm(x, (x.shape[-1],), t(w["norm"]["scale"]),
                      t(w["norm"]["bias"]), eps=1e-5)
    sim = t(w["queries"]) @ xn.transpose(-1, -2)
    attn = sim.softmax(dim=-1)
    return attn @ xn, attn


def sinkhorn_cluster(x, w, eps, iters):
    from oracles import sinkhorn_ot

    x = F.normalize(x, p=2, dim=-1)
    v = F.normalize(t(w["v"]), p=2, dim=-1)
    scores = torch.einsum("bnd,kd->bnk", x, v)
    weights = sinkhorn_ot(scores.transpose(1, 2), eps, iters)  # [B,K,N]
    out = torch.einsum("bkn,bnd->bkd", weights, x)
    return out, weights


def dpcknn_cluster(x, w, cluster_num, k):
    from oracles import dpc_knn, merge_weighted

    score = x @ t(w["score"]["kernel"]) + t(w["score"]["bias"])
    weight = score.exp()
    idx_cluster, idx_down = dpc_knn(x, cluster_num, k)
    merged = merge_weighted(x, idx_cluster, cluster_num, weight)
    return merged, idx_cluster, idx_down


def cluster_family_forward(s, x, depth, heads, dim, patch, loc, method,
                           cluster_weights, counts, **kw):
    """Shared loop: stock blocks + cluster layer between blocks."""
    x = embed(s, x, dim, patch)
    records = {}
    cnt = 0
    attn_prev = None
    for i in range(depth):
        if i in loc:
            prefix = x[:, :1]
            rest = x[:, 1:]
            w = cluster_weights[cnt]
            if method == "sit":
                rest, soft = sit_cluster(rest, w)
                records[i] = soft
            elif method == "patchmerger":
                rest, soft = patchmerger_cluster(rest, w)
                records[i] = soft
            elif method == "sinkhorn":
                rest, soft = sinkhorn_cluster(
                    rest, w, kw["eps"], kw["iters"])
                records[i] = soft
            elif method == "dpcknn":
                rest, idx_cluster, idx_down = dpcknn_cluster(
                    rest, w, counts[cnt], kw["k"])
                records[i] = (idx_cluster, idx_down)
            elif method == "kmedoids":
                from oracles import kmedoids

                tw = attn_prev.sum(dim=1).sum(dim=1)[:, 1:, None]
                rest, c_idx, assign = kmedoids(
                    rest, counts[cnt], kw["iters"], tw)
                records[i] = (c_idx, assign)
            x = torch.cat([prefix, rest], dim=1)
            cnt += 1
        x, attn_prev, _, _ = block(s, i, x, heads)
    return classify(s, x), records


# ------------------------------------------------------------------ tome
def tome_forward(s, x, depth, heads, dim, patch, removals,
                 distilled=False):
    from oracles import tome_merge

    x = embed(s, x, dim, patch)
    size = None
    for i in range(depth):
        bias = None
        if size is not None:
            bias = size.log()[:, None, None, :, 0]
        h, attn, k, _ = attention(
            s, i, ln(x, s[f"blocks.{i}.norm1.weight"],
                     s[f"blocks.{i}.norm1.bias"]), heads, bias=bias)
        x = x + h
        metric = k.mean(1)
        if removals[i] > 0:
            x, size, _ = tome_merge(metric, x, size, removals[i],
                                    distilled=distilled)
        x = x + mlp(s, i, ln(x, s[f"blocks.{i}.norm2.weight"],
                             s[f"blocks.{i}.norm2.bias"]))
    return classify(s, x)


# ------------------------------------------------------------------- ats
def ats_forward(s, x, depth, heads, dim, patch, counts):
    from oracles import ats_sample

    x = embed(s, x, dim, patch)
    B, N = x.shape[:2]
    mask = torch.ones(B, N, dtype=torch.bool)
    ids_per_stage = {}
    for i in range(depth):
        h_in = ln(x, s[f"blocks.{i}.norm1.weight"],
                  s[f"blocks.{i}.norm1.bias"])
        _, attn, _, v = attention(s, i, h_in, heads, mask=mask)
        if counts[i]:
            # ats_sample pads to the torch.arange step count, which is
            # exactly the jax side's static width
            ids, new_mask = ats_sample(attn, v, mask, counts[i])
            attn = torch.gather(
                attn, 2,
                ids[:, None, :, None].expand(-1, attn.shape[1], -1,
                                             attn.shape[-1]))
            x = torch.gather(x, 1, ids[..., None].expand(-1, -1, dim))
            mask = new_mask
            ids_per_stage[i] = ids
        B2, H, Nq, _ = attn.shape
        out = (attn @ v).transpose(1, 2).reshape(B2, Nq, dim)
        p = f"blocks.{i}.attn."
        out = out @ s[p + "proj.weight"].T + s[p + "proj.bias"]
        x = x + out
        x = x + mlp(s, i, ln(x, s[f"blocks.{i}.norm2.weight"],
                             s[f"blocks.{i}.norm2.bias"]))
    return classify(s, x), ids_per_stage


# ------------------------------------------------------------- heuristic
def heuristic_forward(s, x, depth, heads, dim, patch, masks):
    x = embed(s, x, dim, patch)
    B = x.shape[0]
    mask = None
    for i in range(depth):
        if i in masks:
            mask = torch.from_numpy(
                np.asarray(masks[i]))[None].expand(B, -1)
        x, _, _, _ = block(s, i, x, heads, mask=mask)
    return classify(s, x)


# ----------------------------------------------------------- dyvit eval
def predictor_forward(x, policy, w):
    h = F.layer_norm(x, (x.shape[-1],), t(w["in_ln"]["scale"]),
                     t(w["in_ln"]["bias"]), eps=1e-5)
    h = F.gelu(h @ t(w["in_fc"]["kernel"]) + t(w["in_fc"]["bias"]))
    C = h.shape[-1]
    local = h[:, :, : C // 2]
    glob = (h[:, :, C // 2:] * policy).sum(dim=1, keepdim=True) / \
        policy.sum(dim=1, keepdim=True) + 1e-6
    h = torch.cat([local, glob.expand(-1, h.shape[1], -1)], dim=-1)
    h = F.gelu(h @ t(w["out_fc1"]["kernel"]) + t(w["out_fc1"]["bias"]))
    h = F.gelu(h @ t(w["out_fc2"]["kernel"]) + t(w["out_fc2"]["bias"]))
    h = h @ t(w["out_fc3"]["kernel"]) + t(w["out_fc3"]["bias"])
    return F.log_softmax(h, dim=-1)


def dyvit_eval_forward(s, x, depth, heads, dim, patch, loc, ratios,
                       predictor_weights):
    x = embed(s, x, dim, patch)
    B = x.shape[0]
    init_n = x.shape[1] - 1
    prev_decision = torch.ones(B, init_n, 1)
    kept = {}
    p_count = 0
    for i in range(depth):
        if i in loc:
            spatial = x[:, 1:]
            score = predictor_forward(
                spatial, prev_decision, predictor_weights[p_count])[:, :, 0]
            num_keep = int(init_n * ratios[p_count])
            keep = torch.argsort(score, dim=1, descending=True)[:, :num_keep]
            kept[i] = keep
            now = torch.cat(
                [torch.zeros(B, 1, dtype=keep.dtype), keep + 1], dim=1)
            x = torch.gather(x, 1, now[..., None].expand(-1, -1, dim))
            prev_decision = torch.gather(
                prev_decision, 1, keep[..., None])
            p_count += 1
        x, _, _, _ = block(s, i, x, heads)
    return classify(s, x), kept

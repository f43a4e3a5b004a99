"""Independent PyTorch oracles for parity testing.

Hand-written from the published math of each method (ViT blocks, CLS-attn
pruning, EViT fusion, ToMe matching, Sinkhorn OT, DPC-KNN, k-medoids, ATS
inverse-transform sampling, DyViT policy softmax). These are test fixtures,
deliberately simple eager torch code, used as the ground truth the JAX
implementation must match in fp32.
"""

import math

import numpy as np
import torch
import torch.nn.functional as F


def make_vit_state(depth, dim, heads, patch, num_classes, seed=0,
                   num_prefix=1, n_tokens=None):
    g = torch.Generator().manual_seed(seed)

    def r(*shape, scale=0.05):
        return (torch.randn(*shape, generator=g) * scale).float()

    s = {
        "cls_token": r(1, 1, dim),
        "pos_embed": r(1, n_tokens + num_prefix, dim),
        "patch_embed.proj.weight": r(dim, 3, patch, patch),
        "patch_embed.proj.bias": r(dim),
        "norm.weight": 1 + 0.1 * r(dim),
        "norm.bias": r(dim),
        "head.weight": r(num_classes, dim),
        "head.bias": r(num_classes),
    }
    if num_prefix == 2:  # DeiT-distilled: dist token + second head
        s["dist_token"] = r(1, 1, dim)
        s["head_dist.weight"] = r(num_classes, dim)
        s["head_dist.bias"] = r(num_classes)
    for i in range(depth):
        p = f"blocks.{i}."
        s[p + "norm1.weight"] = 1 + 0.1 * r(dim)
        s[p + "norm1.bias"] = r(dim)
        s[p + "attn.qkv.weight"] = r(3 * dim, dim)
        s[p + "attn.qkv.bias"] = r(3 * dim)
        s[p + "attn.proj.weight"] = r(dim, dim)
        s[p + "attn.proj.bias"] = r(dim)
        s[p + "norm2.weight"] = 1 + 0.1 * r(dim)
        s[p + "norm2.bias"] = r(dim)
        s[p + "mlp.fc1.weight"] = r(4 * dim, dim)
        s[p + "mlp.fc1.bias"] = r(4 * dim)
        s[p + "mlp.fc2.weight"] = r(dim, 4 * dim)
        s[p + "mlp.fc2.bias"] = r(dim)
    return s


def embed(s, x, dim, patch):
    # x: [B, 3, H, W]
    x = F.conv2d(x, s["patch_embed.proj.weight"],
                 s["patch_embed.proj.bias"], stride=patch)
    B, D, H, W = x.shape
    x = x.reshape(B, D, H * W).transpose(1, 2)
    cls = s["cls_token"].expand(B, -1, -1)
    if "dist_token" in s:
        dist = s["dist_token"].expand(B, -1, -1)
        x = torch.cat([cls, dist, x], dim=1)
    else:
        x = torch.cat([cls, x], dim=1)
    return x + s["pos_embed"]


def ln(x, w, b):
    return F.layer_norm(x, (x.shape[-1],), w, b, eps=1e-6)


def attention(s, i, x, heads, bias=None, mask=None, policy=None):
    p = f"blocks.{i}.attn."
    B, N, D = x.shape
    hd = D // heads
    qkv = x @ s[p + "qkv.weight"].T + s[p + "qkv.bias"]
    qkv = qkv.reshape(B, N, 3, heads, hd).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    dots = (q @ k.transpose(-2, -1)) * hd ** -0.5
    if bias is not None:
        dots = dots + bias
    if mask is not None:
        pair = mask[:, None, :, None] & mask[:, None, None, :]
        dots = dots.masked_fill(~pair, -torch.finfo(dots.dtype).max)
    if policy is not None:
        attn = policy_softmax(dots, policy)
    else:
        attn = dots.softmax(dim=-1)
    out = (attn @ v).transpose(1, 2).reshape(B, N, D)
    out = out @ s[p + "proj.weight"].T + s[p + "proj.bias"]
    return out, attn, k, v


def mlp(s, i, x):
    p = f"blocks.{i}.mlp."
    x = F.gelu(x @ s[p + "fc1.weight"].T + s[p + "fc1.bias"])
    return x @ s[p + "fc2.weight"].T + s[p + "fc2.bias"]


def block(s, i, x, heads, bias=None, mask=None, policy=None):
    h, attn, k, v = attention(
        s, i, ln(x, s[f"blocks.{i}.norm1.weight"],
                 s[f"blocks.{i}.norm1.bias"]),
        heads, bias=bias, mask=mask, policy=policy,
    )
    x = x + h
    x = x + mlp(s, i, ln(x, s[f"blocks.{i}.norm2.weight"],
                         s[f"blocks.{i}.norm2.bias"]))
    return x, attn, k, v


def classify(s, x):
    x = ln(x, s["norm.weight"], s["norm.bias"])
    logits = x[:, 0] @ s["head.weight"].T + s["head.bias"]
    if "dist_token" in s:  # DeiT eval: average of both heads
        logits_d = x[:, 1] @ s["head_dist.weight"].T + s["head_dist.bias"]
        return (logits + logits_d) / 2
    return logits


def dense_forward(s, x, depth, heads, dim, patch):
    x = embed(s, x, dim, patch)
    for i in range(depth):
        x, _, _, _ = block(s, i, x, heads)
    return classify(s, x)


def topk_forward(s, x, depth, heads, dim, patch, loc, keep_counts):
    x = embed(s, x, dim, patch)
    kept = {}
    for i in range(depth):
        if i in loc:
            h, attn, _, _ = attention(
                s, i, ln(x, s[f"blocks.{i}.norm1.weight"],
                         s[f"blocks.{i}.norm1.bias"]), heads)
            x = x + h
            cls_attn = attn[:, :, 0, 1:].mean(dim=1)
            k = keep_counts[loc.index(i)]
            _, idx = torch.topk(cls_attn, k, dim=1, largest=True, sorted=True)
            kept[i] = idx
            x = torch.cat(
                [x[:, :1],
                 torch.gather(x[:, 1:], 1,
                              idx[..., None].expand(-1, -1, dim))], dim=1)
            x = x + mlp(s, i, ln(x, s[f"blocks.{i}.norm2.weight"],
                                 s[f"blocks.{i}.norm2.bias"]))
        else:
            x, _, _, _ = block(s, i, x, heads)
    return classify(s, x), kept


def evit_forward(s, x, depth, heads, dim, patch, loc, keep_counts):
    x = embed(s, x, dim, patch)
    kept, compls = {}, {}
    for i in range(depth):
        if i in loc:
            h, attn, _, _ = attention(
                s, i, ln(x, s[f"blocks.{i}.norm1.weight"],
                         s[f"blocks.{i}.norm1.bias"]), heads)
            x = x + h
            N = x.shape[1]
            cls_attn = attn[:, :, 0, 1:].mean(dim=1)
            k = keep_counts[loc.index(i)]
            _, idx = torch.topk(cls_attn, k, dim=1, largest=True, sorted=True)
            # complement = everything not selected, ascending
            all_ids = torch.arange(N - 1)[None].expand(idx.shape[0], -1)
            sel = torch.zeros_like(all_ids, dtype=torch.bool)
            sel.scatter_(1, idx, True)
            compl = all_ids[~sel].reshape(idx.shape[0], N - 1 - k)
            non_cls = x[:, 1:]
            x_top = torch.gather(non_cls, 1,
                                 idx[..., None].expand(-1, -1, dim))
            x_non = torch.gather(non_cls, 1,
                                 compl[..., None].expand(-1, -1, dim))
            a_non = torch.gather(cls_attn, 1, compl)
            extra = (x_non * a_non[..., None]).sum(dim=1, keepdim=True)
            x = torch.cat([x[:, :1], x_top, extra], dim=1)
            kept[i], compls[i] = idx, compl
            x = x + mlp(s, i, ln(x, s[f"blocks.{i}.norm2.weight"],
                                 s[f"blocks.{i}.norm2.bias"]))
        else:
            x, _, _, _ = block(s, i, x, heads)
    return classify(s, x), kept, compls


def tome_merge(metric, x, size, r, distilled=False):
    """One ToMe merge step (balanced matching, protected CLS; with
    `distilled` also the dist token at dst column 0, tome.py:245-266)."""
    t = metric.shape[1]
    r = min(r, (t - (2 if distilled else 1)) // 2)
    m = metric / metric.norm(dim=-1, keepdim=True)
    a, b = m[:, ::2], m[:, 1::2]
    scores = a @ b.transpose(-1, -2)
    scores[:, 0, :] = -math.inf
    if distilled:
        scores[:, :, 0] = -math.inf
    node_max, node_idx = scores.max(dim=-1)
    edge_idx = (-node_max).argsort(dim=-1)  # descending by score
    unm_idx = edge_idx[:, r:].sort(dim=1)[0]
    src_idx = edge_idx[:, :r]
    dst_idx = torch.gather(node_idx, 1, src_idx)

    def merge(t_in):
        src, dst = t_in[:, ::2], t_in[:, 1::2]
        n, _, c = src.shape
        unm = torch.gather(src, 1, unm_idx[..., None].expand(n, -1, c))
        s_sel = torch.gather(src, 1, src_idx[..., None].expand(n, r, c))
        dst = dst.scatter_add(1, dst_idx[..., None].expand(n, r, c), s_sel)
        return torch.cat([unm, dst], dim=1)

    if size is None:
        size = torch.ones_like(x[..., :1])
    out = merge(x * size)
    new_size = merge(size)
    return out / new_size, new_size, merge


def sinkhorn_ot(scores, eps, iters):
    b, m, n = scores.shape
    norm = -torch.tensor(float(m + n)).log()
    log_mu = norm.expand(b, m)
    log_nu = norm.expand(b, n)
    Z = scores / eps
    u = torch.zeros_like(log_mu)
    v = torch.zeros_like(log_nu)
    for _ in range(iters):
        u = log_mu - torch.logsumexp(Z + v[:, None, :], dim=2)
        v = log_nu - torch.logsumexp(Z + u[:, :, None], dim=1)
    return (Z + u[:, :, None] + v[:, None, :] - norm).exp()


def dpc_knn(x, cluster_num, k):
    """Noise-free DPC-KNN (the injected 1e-6 noise set to zero)."""
    B, N, C = x.shape
    dist = torch.cdist(x, x) / (C ** 0.5)
    dist_nearest, _ = torch.topk(dist, k=k, dim=-1, largest=False)
    density = (-(dist_nearest ** 2).mean(dim=-1)).exp()
    mask = (density[:, None, :] > density[:, :, None]).float()
    dist_max = dist.flatten(1).max(dim=-1)[0][:, None, None]
    d_ind, _ = (dist * mask + dist_max * (1 - mask)).min(dim=-1)
    score = d_ind * density
    _, index_down = torch.topk(score, k=cluster_num, dim=-1)
    rows = torch.gather(
        dist, 1, index_down[..., None].expand(-1, -1, N))
    idx_cluster = rows.argmin(dim=1)
    bi = torch.arange(B)[:, None].expand(B, cluster_num)
    ki = torch.arange(cluster_num)[None].expand(B, cluster_num)
    idx_cluster[bi.reshape(-1), index_down.reshape(-1)] = ki.reshape(-1)
    return idx_cluster, index_down


def merge_weighted(x, idx_cluster, cluster_num, w):
    B, N, C = x.shape
    out = torch.zeros(B, cluster_num, C)
    tot = torch.zeros(B, cluster_num, 1)
    for b in range(B):
        for n in range(N):
            tot[b, idx_cluster[b, n]] += w[b, n]
    tot = tot + 1e-6
    for b in range(B):
        for n in range(N):
            out[b, idx_cluster[b, n]] += (
                x[b, n] * w[b, n] / tot[b, idx_cluster[b, n]]
            )
    return out


def kmedoids(x, cluster_num, iters, w):
    """Weighted k-medoids, attention-mass init (w: [B, N, 1])."""
    B, N, C = x.shape
    _, cluster_idx = torch.topk(w[..., 0], k=cluster_num, dim=1)
    dist = torch.cdist(x, x)
    wdist = dist * w  # row i scaled by w_i
    for _ in range(iters):
        cols = torch.gather(
            dist, 2, cluster_idx[:, None, :].expand(-1, N, -1))
        assign = cols.argmin(dim=-1)
        for k in range(cluster_num):
            m = wdist.clone()
            m[assign != k] = 1e6
            tot = m.sum(dim=-1)
            cluster_idx[:, k] = tot.argmin(dim=1)
    cols = torch.gather(dist, 2, cluster_idx[:, None, :].expand(-1, N, -1))
    assign = cols.argmin(dim=-1)
    centers = torch.gather(
        x, 1, cluster_idx[..., None].expand(-1, -1, C))
    return centers, cluster_idx, assign


def ats_sample(attn, v, mask, K, eps=1e-6):
    """Ragged reference semantics with pad_sequence-style zero padding."""
    B, H, N = attn.shape[:3]
    cls_attn = attn[:, :, 0, 1:]
    norms = v[:, :, 1:, :].norm(dim=-1)
    sig = (cls_attn * norms).sum(dim=1)
    normed = sig / (sig.sum(dim=-1, keepdim=True) + eps)
    cdf = normed.cumsum(dim=1)
    cdf[~mask[:, 1:]] += 0.1
    steps = torch.arange(1 / (2 * K), (2 * K - 1) / (2 * K), 2 / (2 * K))
    d = torch.cdist(steps[None, :, None].expand(B, -1, -1).float(),
                    cdf[..., None])
    ids = d.argmin(dim=-1) + 1
    uniq = [torch.unique(t, sorted=True) for t in torch.unbind(ids)]
    out = torch.zeros(B, len(steps), dtype=torch.long)
    for b, u in enumerate(uniq):
        out[b, : len(u)] = u
    new_mask = out != 0
    new_mask = F.pad(new_mask, (1, 0), value=True)
    out = F.pad(out, (1, 0), value=0)
    return out, new_mask


def policy_softmax(attn, policy, eps=1e-6):
    B, N, _ = policy.size()
    ap = policy.reshape(B, 1, 1, N)
    eye = torch.eye(N).view(1, 1, N, N)
    ap = ap + (1.0 - ap) * eye
    mx = attn.max(dim=-1, keepdim=True)[0]
    a = (attn - mx).float().exp() * ap.float()
    return ((a + eps / N) / (a.sum(dim=-1, keepdim=True) + eps)).to(mx.dtype)


def np32(t):
    return np.asarray(t.detach().numpy(), dtype=np.float32)

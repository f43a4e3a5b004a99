"""DPC-KNN token clustering (reference models/dpcknn.py:44-140).

TPU-first changes vs the reference:
- the reference's hidden `torch.rand` density noise (dpcknn.py:73-74)
  becomes an explicit `noise` argument threaded from the model PRNG
- `index_add_` scatter merges become one-hot matmuls, which map onto the
  MXU instead of serialized scatters
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax



def pairwise_dist(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Euclidean cdist via the matmul identity (MXU-friendly)."""
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)
    y2 = jnp.sum(y * y, axis=-1, keepdims=True)
    xy = jnp.einsum(
        "bnc,bmc->bnm", x, y, preferred_element_type=jnp.float32
    )
    d2 = x2 + jnp.swapaxes(y2, -1, -2) - 2.0 * xy
    return jnp.sqrt(jnp.maximum(d2, 0.0))


def cluster_dpc_knn(x, cluster_num: int, k: int, noise=None):
    """Density-peak clustering with kNN density.

    x: [B, N, C]; noise: optional [B, N] uniform(0,1) draws (the reference's
    eval-time nondeterminism made explicit). Returns
    (idx_cluster [B, N] in [0, cluster_num), index_down [B, cluster_num]).
    """
    B, N, C = x.shape
    dist_matrix = pairwise_dist(x, x) / (C ** 0.5)

    # local density from k nearest neighbours (incl. self-distance 0).
    # lax.top_k sorts the whole row (2.36ms at b256/N196 on v5e);
    # approx_min_k lowers to the TPU PartialReduce op (0.70ms) and is
    # exact at these shapes (verified against top_k; on CPU it lowers to
    # an exact sort, so the fp32 parity tests are unaffected -- and the
    # reference itself perturbs densities with random noise each forward,
    # dpcknn.py:73-74).
    dist_nearest, _ = lax.approx_min_k(dist_matrix, k,
                                       recall_target=0.99)
    density = jnp.exp(-jnp.mean(dist_nearest ** 2, axis=-1))
    if noise is not None:
        density = density + noise * 1e-6

    # distance to the nearest higher-density token
    mask = (density[:, None, :] > density[:, :, None]).astype(x.dtype)
    dist_max = dist_matrix.reshape(B, -1).max(axis=-1)[:, None, None]
    dist_ind = dist_matrix * mask + dist_max * (1.0 - mask)
    dist = dist_ind.min(axis=-1)

    score = dist * density
    _, index_down = lax.top_k(score, cluster_num)

    # assign every token to its nearest selected center. The center-row
    # gather runs as a one-hot matmul (XLA's row gather from [B,N,N]
    # costs ~0.5ms/b256 on v5e; the matmul ~0.05ms)
    oh_centers = (index_down[..., None]
                  == jnp.arange(N)).astype(dist_matrix.dtype)  # [B,K,N]
    center_rows = jnp.einsum(
        "bkn,bnm->bkm", oh_centers, dist_matrix,
        preferred_element_type=jnp.float32)  # [B, K, N]
    idx_cluster = center_rows.argmin(axis=1)

    # centers always belong to their own cluster (dpcknn.py:96-98) --
    # scatter-free: where token n is the k-th center, its label is k
    match = (index_down[:, None, :]
             == jnp.arange(N)[None, :, None])  # [B, N, K]
    center_id = (match * jnp.arange(cluster_num)).sum(-1)
    idx_cluster = jnp.where(match.any(-1), center_id, idx_cluster)
    return idx_cluster, index_down


def merge_clusters(x, idx_cluster, cluster_num: int, token_weight=None,
                   idx_token=None, agg_weight=None):
    """Weighted average of tokens per cluster (reference dpcknn.py:103-140).

    One-hot matmul segment-sums; returns (x_merged [B, K, C],
    idx_token_new, agg_weight_new).
    """
    B, N, C = x.shape
    if token_weight is None:
        token_weight = jnp.ones((B, N, 1), dtype=x.dtype)

    onehot = (idx_cluster[..., None] == jnp.arange(cluster_num)).astype(x.dtype)
    # [B, N, K]
    all_weight = jnp.einsum(
        "bnk,bn->bk", onehot, token_weight[..., 0],
        preferred_element_type=jnp.float32,
    ).astype(x.dtype) + 1e-6
    # per-token cluster weight via the same one-hot (gather-free)
    w_of_token = jnp.einsum("bnk,bk->bn", onehot, all_weight)
    norm_weight = token_weight / w_of_token[..., None]
    x_merged = jnp.einsum(
        "bnk,bnc->bkc", onehot, x * norm_weight,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)

    idx_token_new = None
    agg_weight_new = None
    if idx_token is not None:
        idx_token_new = jnp.take_along_axis(idx_cluster, idx_token, axis=1)
        weight_t = jnp.take_along_axis(norm_weight[..., 0], idx_token, axis=1)
        agg_weight_new = agg_weight * weight_t[..., None]
    return x_merged, idx_token_new, agg_weight_new

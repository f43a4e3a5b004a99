"""Weighted k-medoids token clustering (reference models/kmedoids.py:40-85).

The reference runs O(iters * K) Python loops with 1e6 sentinel masking; here
the per-cluster medoid update is one vectorized masked argmin over a
[B, N, K] score tensor. Masked entries use the exact sentinel sum (1e6 * N)
the reference produces, so argmin results are identical.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tokenreduction_tpu.ops.dpc_knn import pairwise_dist
from tokenreduction_tpu.ops.gather import take_rows, take_tokens


def farthest_point_init(x, cluster_num: int, key) -> jnp.ndarray:
    """Equal-weight init: random first medoid, then farthest-point.

    Mirrors reference kmedoids.py:44-59 (np.random.choice init made an
    explicit PRNG draw; the reference shares one draw across the batch).
    """
    B, N, _ = x.shape
    first = jax.random.randint(key, (), 0, N)
    cluster_idx = jnp.broadcast_to(first, (B, 1)).astype(jnp.int32)
    for _ in range(1, cluster_num):
        centers = take_tokens(x, cluster_idx)
        inter = pairwise_dist(x, centers)  # [B, N, k]
        # zero the rows of already-chosen tokens so they are never re-picked
        chosen = jnp.zeros((B, N), dtype=bool)
        bidx = jnp.arange(B)[:, None]
        chosen = chosen.at[bidx, cluster_idx].set(True)
        inter = jnp.where(chosen[..., None], 0.0, inter)
        max_dist = inter.max(axis=-1)
        new_idx = max_dist.argmax(axis=-1).astype(jnp.int32)
        cluster_idx = jnp.concatenate([cluster_idx, new_idx[:, None]], axis=-1)
    return cluster_idx


def k_medoids_fit(x, cluster_num: int, iterations: int = 5,
                  token_weight=None, key=None):
    """Returns (centers [B,K,C], cluster_idx [B,K], assignment [B,N])."""
    B, N, C = x.shape

    if token_weight is None:
        assert key is not None, "equal-weight k-medoids needs a PRNG key"
        cluster_idx = farthest_point_init(x, cluster_num, key)
        token_weight = jnp.ones((B, N, 1), dtype=x.dtype)
    else:
        # init = attention-mass top-k (reference kmedoids.py:63-64)
        _, cluster_idx = jax.lax.top_k(token_weight[..., 0], cluster_num)

    dist_matrix = pairwise_dist(x, x)
    # row i scaled by weight_i; per-row total distance to ALL tokens
    row_total = dist_matrix.sum(axis=-1) * token_weight[..., 0]  # [B, N]
    masked_total = jnp.asarray(1e6 * N, dtype=x.dtype)

    def one_iter(cluster_idx):
        center_cols = take_rows(dist_matrix, cluster_idx, axis=2)  # [B,N,K]
        assignment = center_cols.argmin(axis=-1)  # [B, N]
        onehot = assignment[..., None] == jnp.arange(cluster_num)  # [B,N,K]
        scores = jnp.where(onehot, row_total[..., None], masked_total)
        return scores.argmin(axis=1).astype(cluster_idx.dtype)  # [B, K]

    for _ in range(iterations):
        cluster_idx = one_iter(cluster_idx)

    center_cols = take_rows(dist_matrix, cluster_idx, axis=2)
    assignment = center_cols.argmin(axis=-1)
    centers = take_tokens(x, cluster_idx)
    return centers, cluster_idx, assignment

"""ToMe bipartite soft matching and merge ops (static-shape JAX).

Semantics match reference models/tome.py:230-338, expressed as index
tensors + gathers instead of returned closures:
- tokens split into even (src/a) and odd (dst/b) sets
- cosine similarity a @ b^T on L2-normed head-mean keys
- the r highest-scoring src tokens merge into their best dst token
- merged output is cat([unmerged_src, dst]) -- token ORDER changes, which
  matters for feature parity; unmerged indices are sorted when a class
  token is present so CLS stays first (reference tome.py:276-277).
- reference quirk preserved: `merge(..., mode=...)` always scatter-ADDS
  regardless of mode (tome.py:279-289), so source tracking sums too.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from tokenreduction_tpu.ops.gather import scatter_add_tokens, take_tokens


class MergeInfo(NamedTuple):
    unm_idx: jnp.ndarray  # [B, Ta - r] indices into the src (even) set
    src_idx: jnp.ndarray  # [B, r] indices into the src set
    dst_idx: jnp.ndarray  # [B, r] destination indices into the dst (odd) set
    r: int
    t: int  # token count before merging


def bipartite_soft_matching(
    metric: jnp.ndarray, r: int, class_token: bool = True,
    distill_token: bool = False
) -> MergeInfo:
    """metric: [B, T, C] head-mean keys. Returns static merge indices.

    `distill_token`: DeiT-distilled backbones carry the dist token at
    index 1 = dst-set column 0; like the CLS row it must never merge
    (reference tome.py:245-266 sets scores[..., :, 0] = -inf and counts
    it in `protected`)."""
    t = metric.shape[1]
    protected = (1 if class_token else 0) + (1 if distill_token else 0)
    r = min(r, (t - protected) // 2)
    if r <= 0:
        return MergeInfo(None, None, None, 0, t)

    metric = metric / jnp.linalg.norm(metric, axis=-1, keepdims=True)
    a, b = metric[:, ::2, :], metric[:, 1::2, :]
    scores = jnp.einsum(
        "bic,bjc->bij", a, b, preferred_element_type=jnp.float32
    )
    if class_token:
        scores = scores.at[:, 0, :].set(-jnp.inf)
    if distill_token:
        scores = scores.at[:, :, 0].set(-jnp.inf)

    node_max = scores.max(axis=-1)
    node_idx = scores.argmax(axis=-1)
    edge_idx = jnp.argsort(-node_max, axis=-1)  # descending
    unm_idx = edge_idx[:, r:]
    src_idx = edge_idx[:, :r]
    dst_idx = jnp.take_along_axis(node_idx, src_idx, axis=-1)
    if class_token:
        unm_idx = jnp.sort(unm_idx, axis=1)
    return MergeInfo(unm_idx, src_idx, dst_idx, r, t)


def merge_tokens_tome(info: MergeInfo, x: jnp.ndarray,
                      force_xla: bool = False) -> jnp.ndarray:
    """Apply the merge to x [B, T, C] -> [B, T - r, C] (sum semantics).

    ``force_xla`` pins the sequential scatter-add (viz extraction:
    3+-way merge collisions must sum in the same order on CPU and TPU)."""
    if info.r <= 0:
        return x
    src, dst = x[:, ::2, :], x[:, 1::2, :]
    unm = take_tokens(src, info.unm_idx)
    src_sel = take_tokens(src, info.src_idx)
    dst = scatter_add_tokens(dst, info.dst_idx, src_sel, force_xla=force_xla)
    return jnp.concatenate([unm, dst], axis=1)


def merge_wavg(info: MergeInfo, x: jnp.ndarray, size: jnp.ndarray,
               force_xla: bool = False):
    """Size-weighted average merge (reference tome.py:309-323)."""
    if size is None:
        size = jnp.ones_like(x[..., :1])
    x = merge_tokens_tome(info, x * size, force_xla=force_xla)
    size = merge_tokens_tome(info, size, force_xla=force_xla)
    return x / size, size


def merge_source_assignment(info: MergeInfo, class_token: bool = True):
    """Per-block cluster assignment of each pre-merge token.

    Reproduces reference models/tome.py:91-99: merge an identity source
    matrix, multiply each row by (row_index + 1), take the column-wise amax,
    then shift (-2 and drop CLS column when class_token) so ids index the
    merged non-CLS tokens.  Returns [B, T - (1 if cls)] int32 (batch size
    comes from info index arrays).
    """
    B = info.unm_idx.shape[0]
    t = info.t
    eye = jnp.broadcast_to(jnp.eye(t, dtype=jnp.float32), (B, t, t))
    # only called in viz_mode: pin the sequential scatter so assignment
    # artifacts are bit-identical across CPU/TPU
    source = merge_tokens_tome(info, eye, force_xla=True)  # [B, t - r, t]
    row_ids = jnp.arange(1, source.shape[1] + 1, dtype=jnp.float32)
    labeled = source * row_ids[None, :, None]
    assign = jnp.max(labeled, axis=-2)
    if class_token:
        assign = assign - 2.0
        assign = assign[:, 1:]
    else:
        assign = assign - 1.0
    return assign.astype(jnp.int32)

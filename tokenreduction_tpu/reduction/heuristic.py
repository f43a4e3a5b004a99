"""Heuristic static pruning: fixed center-distance attention masks
(reference models/heuristic.py). Tokens are never physically removed; the
masks are compile-time constants.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from tokenreduction_tpu.core.config import reduction_schedule
from tokenreduction_tpu.models.deit import ViTBase
from tokenreduction_tpu.ops.heuristic import (
    contiguous_thresholds,
    masks_per_block,
    subset_thresholds,
)


def heuristic_masks(cfg):
    """(active_loc, {block: attention mask}, {block: kept patch ids}) --
    pure config-time computation shared by the model and by tooling."""
    c = cfg
    if c.not_contiguous:
        num_tokens = list(reduction_schedule(c))
        z, thr = subset_thresholds(
            c.num_patches, c.heuristic_pattern, num_tokens,
            list(c.reduction_loc), c.depth,
        )
        active_loc = list(c.reduction_loc)
    else:
        start = int(min(c.reduction_loc))
        end = int(max(c.reduction_loc))
        z, thr, active_loc = contiguous_thresholds(
            c.num_patches, c.heuristic_pattern, c.min_radius,
            start, end, c.depth,
        )
    masks, kept = masks_per_block(
        z, thr, active_loc, c.depth, c.num_prefix_tokens
    )
    return active_loc, {i: np.asarray(m) for i, m in masks.items()}, kept


class HeuristicVisionTransformer(ViTBase):
    def setup(self):
        self.setup_common()
        self.blocks = self.make_blocks()
        self.active_loc, self.block_masks, self.kept_indices = \
            heuristic_masks(self.cfg)

    @staticmethod
    def new_module_names():
        return []

    def reduction_count(self):
        return list(self.active_loc)

    def __call__(self, x, train: bool = False):
        c = self.cfg
        det = not train
        x = self.embed(x, deterministic=det)
        B = x.shape[0]
        decisions = {}
        features = {}
        mask = None
        for i, blk in enumerate(self.blocks):
            if i in self.active_loc:
                mask = jnp.broadcast_to(
                    jnp.asarray(self.block_masks[i])[None, :],
                    (B, x.shape[1]),
                )
                if c.viz_mode:
                    decisions[i] = jnp.broadcast_to(
                        jnp.asarray(self.kept_indices[i])[None, :],
                        (B, len(self.kept_indices[i])),
                    )
            x, _ = blk(x, mask=mask, deterministic=det)
            if c.viz_mode and i in self.active_loc:
                features[i] = x
        if c.viz_mode and (c.depth - 1) not in features:
            features[c.depth - 1] = x
        out = self.classify(x, train)
        if not train and c.viz_mode:
            return out, {"Kept_Tokens_Abs": decisions, "Features": features}
        return out

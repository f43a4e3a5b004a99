"""ToMe: bipartite soft-matching token merging (reference models/tome.py).

Per block: proportional-attention bias `attn += size.log()` (tome.py:48-49),
metric = head-mean keys (tome.py:58), then size-weighted average merge.
The per-stage removal counts r_i are derived from cumulative keep targets
exactly as in the reference constructor (tome.py:145-156); all shapes are
static per block.
"""

from __future__ import annotations

import jax.numpy as jnp

from tokenreduction_tpu.core.config import reduction_schedule
from tokenreduction_tpu.models.deit import ViTBase
from tokenreduction_tpu.ops.tome import (
    bipartite_soft_matching,
    merge_source_assignment,
    merge_wavg,
)


def per_block_removals(cfg):
    """cumulative keep counts -> tokens removed at each reduction block."""
    sched = reduction_schedule(cfg)
    removals = [0] * cfg.depth
    prev = cfg.num_patches
    for stage, loc in enumerate(cfg.reduction_loc):
        removals[loc] = prev - sched[stage]
        prev = sched[stage]
    return removals


class ToMeVisionTransformer(ViTBase):
    def setup(self):
        self.setup_common()
        self.blocks = self.make_blocks()
        self.removals = per_block_removals(self.cfg)

    @staticmethod
    def new_module_names():
        return []

    def reduction_count(self):
        return list(self.cfg.reduction_loc)

    def __call__(self, x, train: bool = False):
        c = self.cfg
        det = not train
        x = self.embed(x, deterministic=det)
        size = None
        assignments = {}
        features = {}
        for i, blk in enumerate(self.blocks):
            bias = None
            if size is not None:
                # proportional attention: + log(size) on key columns
                bias = jnp.log(size)[:, None, None, :, 0]
            r = self.removals[i]
            # the head-mean-keys metric is only consumed when this block
            # merges; requesting it elsewhere would rematerialize the qkv
            # projection on the fused path
            x, (metric, _) = blk.attend(
                x, bias=bias, score="keys" if r > 0 else None,
                deterministic=det
            )
            if r > 0:
                info = bipartite_soft_matching(
                    metric, r, class_token=True,
                    distill_token=c.distilled)
                if c.viz_mode:
                    assignments[i] = merge_source_assignment(
                        info, class_token=True
                    )
                x, size = merge_wavg(info, x, size, force_xla=c.viz_mode)
            x = blk.ffn(x, det)
            if c.viz_mode and i in c.reduction_loc:
                features[i] = x
        if c.viz_mode and (c.depth - 1) not in features:
            features[c.depth - 1] = x
        out = self.classify(x, train)
        if not train and c.viz_mode:
            return out, {"Assignment_Maps": assignments, "Features": features}
        return out

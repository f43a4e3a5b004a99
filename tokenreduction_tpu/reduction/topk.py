"""Top-K CLS-attention pruning (reference models/topk.py).

Score = head-mean CLS->patch attention column, computed as a by-product of
the attention pass (no re-read of the probability tensor from HBM); the
top-k survivors are gathered after the attention residual, before the MLP.
All per-stage token counts are static, so XLA compiles one program whose
intermediate widths shrink (197 -> k1+1 -> k2+1 -> ...).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from tokenreduction_tpu.core.config import reduction_schedule
from tokenreduction_tpu.models.deit import ViTBase


class TopKVisionTransformer(ViTBase):
    def setup(self):
        self.setup_common()
        self.blocks = self.make_blocks()
        self.schedule = reduction_schedule(self.cfg)

    @staticmethod
    def new_module_names():
        return []  # reference models/topk.py:173-174

    def reduction_count(self):
        return list(self.cfg.reduction_loc)

    def __call__(self, x, train: bool = False):
        c = self.cfg
        det = not train
        x = self.embed(x, deterministic=det)
        decisions = {}
        features = {}
        for i, blk in enumerate(self.blocks):
            if i in c.reduction_loc:
                stage = c.reduction_loc.index(i)
                left = self.schedule[stage]
                x, (cls_attn, _) = blk.attend(
                    x, score="cls", deterministic=det
                )
                if left < x.shape[1] - 1:
                    _, idx = lax.top_k(cls_attn, left)  # sorted desc by score
                    # single gather with CLS folded in (idx is over patch
                    # tokens; +1 shifts past CLS at position 0), fused
                    # into the MLP kernel on the TPU eval path
                    full = jnp.concatenate(
                        [jnp.zeros((idx.shape[0], 1), idx.dtype), idx + 1],
                        axis=1)
                    if c.viz_mode:
                        decisions[i] = idx
                    x = blk.ffn_gather(x, full, det)
                else:
                    x = blk.ffn(x, det)
            else:
                x, _ = blk(x, deterministic=det)
            if c.viz_mode and i in decisions:
                features[i] = x
        if c.viz_mode and (c.depth - 1) not in features:
            features[c.depth - 1] = x
        out = self.classify(x, train)
        if not train and c.viz_mode:
            return out, {"Kept_Tokens": decisions, "Features": features}
        return out

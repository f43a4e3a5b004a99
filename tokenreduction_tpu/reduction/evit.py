"""EViT: CLS-attention top-k pruning + fused "inattentive" token
(reference models/evit.py).

Like Top-K, but the complement set is fused into one extra token weighted by
its CLS attention (evit.py:116-121), and the kept-index list is extended
with a -1 sentinel marking the fused slot (evit.py:123) -- the viz pipeline
depends on that sentinel (reference validate.py:213-216).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from tokenreduction_tpu.core.config import reduction_schedule
from tokenreduction_tpu.models.deit import ViTBase
from tokenreduction_tpu.ops.gather import complement_idx, take_tokens


class EViTVisionTransformer(ViTBase):
    def setup(self):
        self.setup_common()
        self.blocks = self.make_blocks()
        self.schedule = reduction_schedule(self.cfg)

    @staticmethod
    def new_module_names():
        return []

    def reduction_count(self):
        return list(self.cfg.reduction_loc)

    def __call__(self, x, train: bool = False):
        c = self.cfg
        det = not train
        x = self.embed(x, deterministic=det)
        decisions = {}
        fusion_decisions = {}
        features = {}
        for i, blk in enumerate(self.blocks):
            if i in c.reduction_loc:
                stage = c.reduction_loc.index(i)
                left = self.schedule[stage]
                x, (cls_attn, _) = blk.attend(
                    x, score="cls", deterministic=det
                )
                N = x.shape[1]
                if left < N - 1:
                    _, idx = lax.top_k(cls_attn, left)
                    non_cls = x[:, 1:]
                    x_others = take_tokens(non_cls, idx)
                    compl = complement_idx(idx, N - 1)  # [B, N-1-left]
                    non_topk = take_tokens(non_cls, compl)
                    non_topk_attn = jnp.take_along_axis(
                        cls_attn, compl, axis=1
                    )
                    extra = jnp.sum(
                        non_topk * non_topk_attn[..., None],
                        axis=1,
                        keepdims=True,
                    )
                    x = jnp.concatenate([x[:, :1], x_others, extra], axis=1)
                    if c.viz_mode:
                        B = idx.shape[0]
                        idx_s = jnp.concatenate(
                            [idx, jnp.full((B, 1), -1, dtype=idx.dtype)],
                            axis=1,
                        )
                        decisions[i] = idx_s
                        fusion_decisions[i] = compl
                x = blk.ffn(x, det)
            else:
                x, _ = blk(x, deterministic=det)
            if c.viz_mode and i in decisions:
                features[i] = x
        if c.viz_mode and (c.depth - 1) not in features:
            features[c.depth - 1] = x
        out = self.classify(x, train)
        if not train and c.viz_mode:
            return out, {
                "Kept_Tokens": decisions,
                "Fusion_Assign": fusion_decisions,
                "Features": features,
            }
        return out

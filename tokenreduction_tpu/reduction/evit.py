"""EViT: CLS-attention top-k pruning + fused "inattentive" token
(reference models/evit.py).

Like Top-K, but the complement set is fused into one extra token weighted by
its CLS attention (evit.py:116-121), and the kept-index list is extended
with a -1 sentinel marking the fused slot (evit.py:123) -- the viz pipeline
depends on that sentinel (reference validate.py:213-216).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from tokenreduction_tpu.core.config import reduction_schedule
from tokenreduction_tpu.models.deit import ViTBase
from tokenreduction_tpu.ops.gather import complement_idx


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
                    # fused "inattentive" token as a masked weighted sum
                    # (same value as gathering the complement, reference
                    # evit.py:116-121, without the two token gathers)
                    keep_mask = jax.nn.one_hot(
                        idx, N - 1, dtype=cls_attn.dtype).sum(axis=1)
                    weights = cls_attn * (1.0 - keep_mask)
                    extra = jnp.einsum(
                        "bn,bnd->bd", weights,
                        x[:, 1:].astype(weights.dtype))
                    # append the fused token as row N; the row-select
                    # (CLS + kept + fused) fuses into the MLP kernel
                    x_ext = jnp.concatenate(
                        [x, extra[:, None].astype(x.dtype)], axis=1)
                    B = idx.shape[0]
                    full = jnp.concatenate(
                        [jnp.zeros((B, 1), idx.dtype), idx + 1,
                         jnp.full((B, 1), N, idx.dtype)], axis=1)
                    if c.viz_mode:
                        idx_s = jnp.concatenate(
                            [idx, jnp.full((B, 1), -1, dtype=idx.dtype)],
                            axis=1,
                        )
                        decisions[i] = idx_s
                        fusion_decisions[i] = complement_idx(idx, N - 1)
                    x = blk.ffn_gather(x_ext, full, det)
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
            return out, {
                "Kept_Tokens": decisions,
                "Fusion_Assign": fusion_decisions,
                "Features": features,
            }
        return out

"""DynamicViT: learned token pruning (reference models/dyvit.py).

Train: Gumbel-softmax hard keep mask x previous decision; attention uses the
differentiable policy softmax -- shapes stay static (197 tokens) and the
mask does the pruning, which is already the XLA-friendly formulation.
Eval: hard top-k gather by predictor score (static per-stage widths).
The Gumbel draw is an explicit `gumbel` PRNG stream.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from tokenreduction_tpu.core.config import expand_keep_rate
from tokenreduction_tpu.models.deit import TRUNC02, ViTBase
from tokenreduction_tpu.ops.dyvit import gumbel_softmax_hard
from tokenreduction_tpu.ops.gather import take_tokens


class PredictorLG(nn.Module):
    """Local/global score predictor (reference dyvit.py:91-119).

    Returns [B, N, 2] log-probabilities. Note the reference's operator
    precedence quirk at dyvit.py:117: eps is added to the *quotient*, kept
    as-is for parity.
    """

    embed_dim: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x, policy):
        C = self.embed_dim
        x = nn.LayerNorm(epsilon=1e-5, name="in_ln")(x)
        x = nn.Dense(C, kernel_init=TRUNC02, name="in_fc")(x)
        x = nn.gelu(x, approximate=False)
        local_x = x[:, :, : C // 2]
        global_x = (x[:, :, C // 2:] * policy).sum(
            axis=1, keepdims=True
        ) / jnp.sum(policy, axis=1, keepdims=True) + self.eps
        B, N = x.shape[:2]
        x = jnp.concatenate(
            [local_x, jnp.broadcast_to(global_x, (B, N, C // 2))], axis=-1
        )
        x = nn.Dense(C // 2, kernel_init=TRUNC02, name="out_fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(C // 4, kernel_init=TRUNC02, name="out_fc2")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(2, kernel_init=TRUNC02, name="out_fc3")(x)
        return jax.nn.log_softmax(x, axis=-1)


class DynamicVisionTransformer(ViTBase):
    dyvit_distillation: bool = False

    def setup(self):
        self.setup_common()
        self.blocks = self.make_blocks()
        self.token_ratio = expand_keep_rate(self.cfg)
        self.score_predictor = [
            PredictorLG(self.cfg.embed_dim)
            for _ in range(len(self.cfg.reduction_loc))
        ]

    @staticmethod
    def new_module_names():
        return ["score_predictor"]  # reference dyvit.py:194-195

    def reduction_count(self):
        return list(self.cfg.reduction_loc)

    def __call__(self, x, train: bool = False):
        c = self.cfg
        det = not train
        x = self.embed(x, deterministic=det)
        B = x.shape[0]
        init_n = c.num_patches
        p_count = 0
        out_pred_prob = []
        prev_decision = jnp.ones((B, init_n, 1), dtype=x.dtype)
        policy = jnp.ones((B, init_n + 1, 1), dtype=x.dtype)
        decisions = {}
        features_viz = {}
        for i, blk in enumerate(self.blocks):
            if i in c.reduction_loc:
                spatial_x = x[:, 1:]
                pred_score = self.score_predictor[p_count](
                    spatial_x, prev_decision
                )
                if train:
                    key = self.make_rng("gumbel")
                    hard = gumbel_softmax_hard(key, pred_score)[:, :, 0:1]
                    hard_keep_decision = hard * prev_decision
                    out_pred_prob.append(
                        hard_keep_decision.reshape(B, -1)
                    )
                    cls_policy = jnp.ones((B, 1, 1), dtype=x.dtype)
                    policy = jnp.concatenate(
                        [cls_policy, hard_keep_decision], axis=1
                    )
                    x, _ = blk(x, policy=policy, deterministic=det)
                    prev_decision = hard_keep_decision
                else:
                    score = pred_score[:, :, 0]
                    num_keep = int(init_n * self.token_ratio[p_count])
                    keep_policy = jnp.argsort(-score, axis=1)[:, :num_keep]
                    now_policy = jnp.concatenate(
                        [
                            jnp.zeros((B, 1), dtype=keep_policy.dtype),
                            keep_policy + 1,
                        ],
                        axis=1,
                    )
                    # the token gather fuses into the next block's
                    # attention kernel on the TPU eval path
                    prev_decision = take_tokens(prev_decision, keep_policy)
                    x, _ = blk.attend(x, idx=now_policy,
                                      deterministic=det)
                    x = blk.ffn(x, det)
                    if c.viz_mode:
                        decisions[i] = keep_policy
                        features_viz[i] = x
                p_count += 1
            else:
                x, _ = blk(
                    x, policy=policy if train else None, deterministic=det
                )
        if c.viz_mode and (c.depth - 1) not in features_viz:
            features_viz[c.depth - 1] = x
        x = self.norm(x)
        features = x[:, 1:]
        logits = self.head(x[:, 0])
        if train:
            if self.dyvit_distillation:
                return (
                    logits,
                    features,
                    jax.lax.stop_gradient(prev_decision),
                    out_pred_prob,
                )
            return logits, out_pred_prob
        if c.viz_mode:
            return logits, {
                "Kept_Tokens": decisions, "Features": features_viz
            }
        return logits

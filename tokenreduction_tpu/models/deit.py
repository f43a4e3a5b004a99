"""Dense DeiT backbone (timm VisionTransformer equivalent), viz variant, and
the DyViT teacher.

Reference parity:
- architecture/init: timm VisionTransformer as configured by
  reference models_act.py:76-78 (patch16, depth 12, LN eps 1e-6, qkv bias)
- viz feature capture per block: reference models/deit_viz.py:193-210
- teacher returning (cls_logits, normed patch tokens):
  reference models/dyvit.py:319-336
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from tokenreduction_tpu.core.config import ViTConfig, drop_path_rates
from tokenreduction_tpu.core.layers import (  # noqa: F401
    TRUNC02,
    Block,
    Mlp,
    PatchEmbed,
)


class ViTBase(nn.Module):
    """Shared embedding / norm / head scaffolding for every model family."""

    cfg: ViTConfig

    def setup_common(self):
        c = self.cfg
        self.patch_embed = PatchEmbed(
            patch_size=c.patch_size, embed_dim=c.embed_dim, name="patch_embed"
        )
        self.cls_token = self.param(
            "cls_token", TRUNC02, (1, 1, c.embed_dim)
        )
        if c.distilled:
            self.dist_token = self.param(
                "dist_token", TRUNC02, (1, 1, c.embed_dim)
            )
        self.pos_embed = self.param(
            "pos_embed",
            TRUNC02,
            (1, c.num_patches + c.num_prefix_tokens, c.embed_dim),
        )
        self.pos_drop = nn.Dropout(c.drop_rate)
        self.norm = nn.LayerNorm(epsilon=c.layer_norm_eps, name="norm")
        if c.num_classes > 0:
            self.head = nn.Dense(
                c.num_classes, kernel_init=TRUNC02, name="head"
            )
            if c.distilled:
                self.head_dist = nn.Dense(
                    c.num_classes, kernel_init=TRUNC02, name="head_dist"
                )

    def make_blocks(self, block_cls=Block, **extra):
        c = self.cfg
        dpr = drop_path_rates(c)
        return [
            block_cls(
                dim=c.embed_dim,
                num_heads=c.num_heads,
                mlp_ratio=c.mlp_ratio,
                qkv_bias=c.qkv_bias,
                drop=c.drop_rate,
                attn_drop=c.attn_drop_rate,
                drop_path=dpr[i],
                layer_norm_eps=c.layer_norm_eps,
                # viz extraction stays on the XLA composition so analysis
                # artifacts are bit-stable across CPU/TPU (the fused
                # kernels' ~1e-2 fp32 logit drift can flip boundary
                # kept-tokens for near-tied scores)
                force_xla=c.viz_mode,
                **{k: (v[i] if isinstance(v, (list, tuple)) else v)
                   for k, v in extra.items()},
            )
            for i in range(c.depth)
        ]

    def embed(self, x, deterministic: bool = True):
        """Patchify + prepend prefix tokens + positional embedding."""
        c = self.cfg
        x = self.patch_embed(x)
        B = x.shape[0]
        cls = jnp.broadcast_to(self.cls_token, (B, 1, c.embed_dim))
        if c.distilled:
            dist = jnp.broadcast_to(self.dist_token, (B, 1, c.embed_dim))
            x = jnp.concatenate([cls, dist, x], axis=1)
        else:
            x = jnp.concatenate([cls, x], axis=1)
        x = x + self.pos_embed
        return self.pos_drop(x, deterministic=deterministic)

    def classify(self, x, train: bool):
        """Final norm -> head (DeiT dist-token averaging at eval)."""
        c = self.cfg
        x = self.norm(x)
        if c.num_classes <= 0:
            return x[:, 0]
        logits = self.head(x[:, 0])
        if c.distilled:
            logits_dist = self.head_dist(x[:, 1])
            if train:
                return logits, logits_dist
            return (logits + logits_dist) / 2
        return logits


class VisionTransformer(ViTBase):
    """Dense DeiT; ``cfg.viz_mode`` captures per-block features
    (the `deit_*_local_viz` registry entries, reference deit_viz.py)."""

    capture_features: bool = False

    def setup(self):
        self.setup_common()
        self.blocks = self.make_blocks()

    def __call__(self, x, train: bool = False):
        c = self.cfg
        x = self.embed(x, deterministic=not train)
        features = {}
        for i, blk in enumerate(self.blocks):
            x, _ = blk(x, deterministic=not train)
            if c.viz_mode and self.capture_features:
                features[i] = x
        out = self.classify(x, train)
        if not train and c.viz_mode and self.capture_features:
            return out, {"Features": features}
        return out


class VisionTransformerTeacher(ViTBase):
    """Dense teacher for DyViT distillation: returns (cls_logits, tokens)
    where tokens are the post-norm patch tokens (reference dyvit.py:331-336).
    """

    def setup(self):
        self.setup_common()
        self.blocks = self.make_blocks()

    def __call__(self, x, train: bool = False):
        x = self.embed(x, deterministic=True)
        for blk in self.blocks:
            x, _ = blk(x, deterministic=True)
        feature = self.norm(x)
        cls = self.head(feature[:, 0])
        return cls, feature[:, 1:]

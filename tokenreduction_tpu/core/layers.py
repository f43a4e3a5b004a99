"""Core ViT building blocks (Flax linen), shared by all reduction models.

Parameter naming deliberately mirrors the timm VisionTransformer tree
(patch_embed.proj, blocks.N.{norm1,attn.qkv,attn.proj,norm2,mlp.fc1,mlp.fc2},
norm, head) so that DeiT checkpoints convert 1:1
(see tokenreduction_tpu/models/convert.py and reference models_act.py:54-60).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

# timm VisionTransformer applies trunc_normal(std=0.02) to every Linear
# weight (reference deit_viz.py:215-247 _init_weights); flax's default
# lecun_normal is ~7x wider at D=384 and would diverge scratch-training
TRUNC02 = nn.initializers.truncated_normal(stddev=0.02)


def split_heads(qkv: jnp.ndarray, num_heads: int):
    """[B, N, 3*D] -> three [B, H, N, D/H] arrays (torch qkv layout)."""
    B, N, C3 = qkv.shape
    C = C3 // 3
    qkv = qkv.reshape(B, N, 3, num_heads, C // num_heads)
    qkv = jnp.transpose(qkv, (2, 0, 3, 1, 4))
    return qkv[0], qkv[1], qkv[2]


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, N, hd] -> [B, N, D]."""
    B, H, N, hd = x.shape
    return jnp.transpose(x, (0, 2, 1, 3)).reshape(B, N, H * hd)


def attention_core(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    *,
    bias: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
    return_probs: bool = False,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jnp.ndarray] = None,
):
    """softmax(q @ k^T * scale [+ bias] [masked]) @ v.

    q, k, v: [B, H, N, hd].  bias broadcastable to [B, H, N, N].
    mask: bool [B, N] token-validity mask; invalid key/query pairs get
    -finfo.max before softmax (reference models/ats.py:117-120,
    models/heuristic.py:48-51).
    dropout_rate/dropout_rng: attention-probability dropout applied
    between the softmax and the value matmul, exactly where the
    reference puts it (models/topk.py:48-49 `attn = self.attn_drop(attn)`
    before `attn @ v`); inverted-dropout scaling matches torch
    nn.Dropout. The dropped probabilities are also what `return_probs`
    returns, because the reference computes its selection scores from
    the post-dropout tensor (models/topk.py:60-61).
    Returns (out [B,H,N,hd], probs [B,H,N,N] or None).
    """
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if bias is not None:
        logits = logits + bias
    if mask is not None:
        pair = mask[:, None, :, None] & mask[:, None, None, :]
        mask_value = -jnp.finfo(logits.dtype).max
        logits = jnp.where(pair, logits, mask_value)
    probs = jax.nn.softmax(logits, axis=-1)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = 1.0 - dropout_rate
        keep_mask = jax.random.bernoulli(dropout_rng, keep, probs.shape)
        probs = jnp.where(keep_mask, probs / keep, 0.0)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(v.dtype)
    return out, (probs if return_probs else None)


# Resident-footprint budget for the whole-branch training backwards:
# they keep the branch weight matrices AND their f32 grad accumulators
# in VMEM across the row grid (constant-index-map outputs, see
# fused_mlp_train._run_bwd / fused_block_train). Budgeted at the fp32
# worst case (4+4 bytes/element) ON PURPOSE: eligibility must not
# depend on the input dtype, or the fp32 parity gate
# (tools/tpu_parity.py train phase) would test a different kernel
# composition than bf16 amp production. 12 MB leaves the measured
# ~10-15 MB of row-tile temps inside the 24 MB scoped-VMEM cap. DeiT-S
# (D=384): MLP pair 9.4 MB OK, attention 4.7 MB OK. DeiT-B (D=768):
# MLP pair 37.7 MB, attention 18.9 MB -- both fall back to XLA
# autodiff (caught on-chip by tpu_parity topk-base@0.7/train: 71.75 MB
# scoped ask at blocks_11.ffn).
_TRAIN_RESIDENT_BUDGET = 12 * 1024 * 1024


def _pallas_train_eligible(weight_elems: int = 0) -> bool:
    """Fused training kernels with hand-written Pallas backwards
    (ops/fused_block_train.py whole-branch attention,
    ops/fused_mlp_train.py MLP branch; v1 attention core for the
    masked/biased cases).

    `weight_elems` is the number of weight-matrix elements the kernel
    holds VMEM-resident (0 for the q/k/v attention core, which carries
    no weights); gated against _TRAIN_RESIDENT_BUDGET above.

    ON by default on TPU: measured 2,882 -> 4,340 img/s for the full
    topk@0.7 b256 amp train step on v5e (fwd 32.7 -> 16.6 ms, bwd 54.5
    -> 41.5 ms); grads match the XLA path to bf16-compute noise
    (<=1.8e-2 relative on-chip, <=1e-4 in fp32 interpret tests). Opt out
    with TOKENREDUCTION_USE_PALLAS_TRAIN=0."""
    import os

    if weight_elems * 8 > _TRAIN_RESIDENT_BUDGET:
        return False
    if os.environ.get("TOKENREDUCTION_USE_PALLAS", "1") == "0":
        return False
    if os.environ.get("TOKENREDUCTION_USE_PALLAS_TRAIN", "1") == "0":
        return False
    from tokenreduction_tpu.ops.flash_attention import supports_pallas

    return supports_pallas()


def _pallas_eligible(deterministic: bool, score,
                     force_xla: bool = False) -> bool:
    """Fused Pallas attention is used on the eval/inference path on TPU.
    Training keeps the XLA path so autodiff is untouched; "full" score
    (ATS) needs the whole probability tensor. `force_xla` pins the XLA
    composition regardless of platform -- set from cfg.viz_mode so
    extraction artifacts are bit-stable across CPU/TPU by default (the
    fused kernels' fp32 drift of ~1e-2 on logits can flip boundary
    kept-tokens for near-tied scores). Opt out globally with
    TOKENREDUCTION_USE_PALLAS=0."""
    import os

    if force_xla:
        return False
    if os.environ.get("TOKENREDUCTION_USE_PALLAS", "1") == "0":
        return False
    if not deterministic or score == "full":
        return False
    from tokenreduction_tpu.ops.flash_attention import supports_pallas

    return supports_pallas()


# widths at/below this run score-less blocks as ONE fused kernel (attn +
# MLP halves, ops/fused_full_block.py); measured on v5e vs the two-kernel
# split -- see the tuning table in that module's docstring
FULL_BLOCK_MAX_N = 256


class DropPath(nn.Module):
    """Stochastic depth per sample (timm drop_path semantics)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("droppath")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


class Mlp(nn.Module):
    hidden_features: int
    out_features: int
    drop: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.hidden_features, kernel_init=TRUNC02, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = nn.Dense(self.out_features, kernel_init=TRUNC02, name="fc2")(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        return x


class PatchEmbed(nn.Module):
    """Image to patch embedding (conv16x16 stride16 -> [B, N, D])."""

    patch_size: int
    embed_dim: int

    @nn.compact
    def __call__(self, x):
        # NHWC input
        x = nn.Conv(
            self.embed_dim,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            name="proj",
        )(x)
        B, H, W, C = x.shape
        return x.reshape(B, H * W, C)


class Attention(nn.Module):
    """Multi-head self-attention with score/mask/bias extension points.

    ``score`` selects an auxiliary output computed from the attention
    probabilities without a second pass over HBM:
      - "cls": head-mean CLS->patch attention column [B, N-1]
        (topk/evit score, reference models/topk.py:60-61)
      - "colsum": sum over heads+queries of attn columns [B, N]
        (kmedoids token weights, reference models/kmedoids.py:240)
      - "full": the full probability tensor (ATS needs row gathering)
      - "keys": head-mean keys [B, N, hd] (ToMe metric, models/tome.py:58)
    """

    dim: int
    num_heads: int
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    force_xla: bool = False

    @nn.compact
    def __call__(
        self,
        x,
        *,
        bias=None,
        mask=None,
        policy=None,
        score: Optional[str] = None,
        deterministic: bool = True,
    ):
        qkv = nn.Dense(self.dim * 3, use_bias=self.qkv_bias,
                       kernel_init=TRUNC02, name="qkv")(x)
        scale = (self.dim // self.num_heads) ** -0.5
        need_probs = score in ("cls", "colsum", "full")
        if policy is None and _pallas_eligible(deterministic, score,
                                               self.force_xla):
            # fused VMEM-resident attention straight off the qkv
            # projection -- no head transpose / padding ever hits HBM
            from tokenreduction_tpu.ops.flash_attention import (
                fused_attention_qkv,
            )

            bias2d = None
            if bias is not None:
                # ToMe size bias arrives as [B, 1, 1, N] per-key
                bias2d = bias.reshape(bias.shape[0], bias.shape[-1])
            merged, row0, colsum = fused_attention_qkv(
                qkv, self.num_heads, scale, bias=bias2d, mask=mask)
            x = nn.Dense(self.dim, kernel_init=TRUNC02, name="proj")(merged)
            x = nn.Dropout(self.proj_drop)(x, deterministic=deterministic)
            aux = None
            if score == "cls":
                aux = row0[:, :, 1:].mean(axis=1)
            elif score == "colsum":
                aux = colsum.sum(axis=1)
            elif score == "keys":
                B, N, _ = qkv.shape
                aux = qkv.reshape(
                    B, N, 3, self.num_heads, -1)[:, :, 1].mean(axis=2)
            return x, (aux, None)
        q, k, v = split_heads(qkv, self.num_heads)
        if (
            policy is None
            and not deterministic
            and score != "full"
            and self.attn_drop == 0.0
            and not self.force_xla
            and _pallas_train_eligible()
        ):
            # training: fused attention core with a hand-written Pallas
            # backward (custom_vjp, grads verified vs autodiff)
            from tokenreduction_tpu.ops.flash_attention_train import (
                attention_core_train,
            )

            bias2d = None
            if bias is not None:
                bias2d = bias.reshape(bias.shape[0], bias.shape[-1])
            out, row0, colsum = attention_core_train(
                q, k, v, scale, bias2d, mask)
            x = merge_heads(out)
            x = nn.Dense(self.dim, kernel_init=TRUNC02, name="proj")(x)
            x = nn.Dropout(self.proj_drop)(x, deterministic=deterministic)
            aux = None
            if score == "cls":
                aux = row0[:, :, 1:].mean(axis=1)
            elif score == "colsum":
                aux = colsum.sum(axis=1)
            elif score == "keys":
                aux = k.mean(axis=1)
            return x, (aux, None)
        if policy is not None:
            # DyViT training: differentiable policy-masked softmax
            from tokenreduction_tpu.ops.dyvit import softmax_with_policy

            logits = jnp.einsum(
                "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
            ) * scale
            probs = softmax_with_policy(logits, policy)
            out = jnp.einsum(
                "bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
                preferred_element_type=jnp.float32,
            ).astype(v.dtype)
            if not need_probs:
                probs = None
        else:
            # attn_drop > 0 disqualifies the fused kernels above (the
            # training core requires attn_drop == 0, the eval kernels
            # require deterministic), so this XLA path is the only one
            # that can see live attention dropout -- applied to the
            # probabilities pre-matmul exactly like the reference
            # (models/topk.py:48-49), with scores reading the dropped
            # tensor. The policy branch above deliberately has no
            # attn_drop: the reference's Policy_Attention constructs the
            # dropout module but never calls it (models/dyvit.py:36,54-68).
            drop_live = self.attn_drop > 0.0 and not deterministic
            out, probs = attention_core(
                q, k, v, scale, bias=bias, mask=mask, return_probs=need_probs,
                dropout_rate=self.attn_drop if drop_live else 0.0,
                dropout_rng=self.make_rng("dropout") if drop_live else None,
            )
        x = merge_heads(out)
        x = nn.Dense(self.dim, kernel_init=TRUNC02, name="proj")(x)
        x = nn.Dropout(self.proj_drop)(x, deterministic=deterministic)

        aux = None
        if score == "cls":
            aux = probs[:, :, 0, 1:].mean(axis=1)
        elif score == "colsum":
            aux = probs.sum(axis=1).sum(axis=1)
        elif score == "full":
            aux = probs
        elif score == "keys":
            aux = k.mean(axis=1)
        # aux contract (all attend/__call__ paths, every platform):
        # a (score_aux, None) 2-tuple -- the second slot is reserved
        # (a v payload historically; nothing ever consumed it, and
        # keeping it XLA-path-only made the contract platform-dependent)
        return x, (aux, None)


class Block(nn.Module):
    """Standard pre-norm transformer block with the same extension points."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    layer_norm_eps: float = 1e-6
    force_xla: bool = False  # viz extraction: bit-stable XLA composition

    def setup(self):
        self.norm1 = nn.LayerNorm(epsilon=self.layer_norm_eps)
        self.attn = Attention(
            dim=self.dim,
            num_heads=self.num_heads,
            qkv_bias=self.qkv_bias,
            attn_drop=self.attn_drop,
            proj_drop=self.drop,
            force_xla=self.force_xla,
        )
        self.drop_path1 = DropPath(self.drop_path)
        self.norm2 = nn.LayerNorm(epsilon=self.layer_norm_eps)
        self.mlp = Mlp(
            hidden_features=int(self.dim * self.mlp_ratio),
            out_features=self.dim,
            drop=self.drop,
        )
        self.drop_path2 = DropPath(self.drop_path)

    def attend(self, x, *, bias=None, mask=None, policy=None, idx=None,
               score: Optional[str] = None, deterministic: bool = True):
        """norm1 -> attention -> droppath -> residual, returning
        (x, (aux, None)) -- see the aux-contract note in Attention.
        On the TPU eval path the whole chain (LN + qkv
        projection + per-head attention + out projection + residual) is
        one VMEM-resident Pallas kernel. idx [B, K] (absolute token ids)
        row-selects before the block -- equivalent to take_tokens(x, idx)
        then attend, with the gather fused into the kernel."""
        if idx is not None:
            fuse = (policy is None and bias is None and mask is None
                    and score != "full" and deterministic
                    and not self.is_initializing()
                    and _pallas_eligible(deterministic, score,
                                         self.force_xla))
            if not fuse:
                from tokenreduction_tpu.ops.gather import take_tokens

                x = take_tokens(x, idx)
                idx = None
        if (
            policy is None
            and bias is None
            and mask is None
            and not deterministic
            and score in (None, "cls", "keys")
            and self.attn_drop == 0.0
            and self.drop == 0.0
            and not self.force_xla
            and not self.is_initializing()
            # resident: qkv [D, 3D] + proj [D, D] weights + f32 accums
            and _pallas_train_eligible(4 * self.dim * self.dim)
        ):
            # training: whole fused branch with a hand-written Pallas
            # backward (custom_vjp; ops/fused_block_train.py). Residual +
            # droppath compose outside the primitive.
            from tokenreduction_tpu.ops.fused_block_train import (
                attend_branch_train,
            )

            n1 = self.norm1.variables["params"]
            ap = self.attn.variables["params"]
            bqkv = ap["qkv"].get("bias")
            if bqkv is None:
                bqkv = jnp.zeros((3 * self.dim,), x.dtype)
            branch, row0 = attend_branch_train(
                x, n1["scale"], n1["bias"], ap["qkv"]["kernel"], bqkv,
                ap["proj"]["kernel"], ap["proj"]["bias"],
                self.num_heads, (self.dim // self.num_heads) ** -0.5,
                self.layer_norm_eps,
            )
            aux = None
            if score == "cls":
                aux = row0[:, :, 1:].mean(axis=1)
            elif score == "keys":
                # differentiable XLA recompute of the head-mean keys
                # (ToMe metric): its grads add to the kernel's dx
                ln = self.norm1(x)
                qkv = ln @ ap["qkv"]["kernel"] + bqkv
                B, N = qkv.shape[:2]
                aux = qkv.reshape(
                    B, N, 3, self.num_heads, -1)[:, :, 1].mean(axis=2)
            out = x + self.drop_path1(branch, deterministic=False)
            return out, (aux, None)
        if (
            policy is None
            and score != "full"
            and deterministic
            and not self.is_initializing()
            and _pallas_eligible(deterministic, score, self.force_xla)
        ):
            from tokenreduction_tpu.ops.flash_attention import (
                fused_block_attention,
            )

            n1 = self.norm1.variables["params"]
            ap = self.attn.variables["params"]
            bqkv = ap["qkv"].get("bias")
            if bqkv is None:
                bqkv = jnp.zeros((3 * self.dim,), x.dtype)
            bias2d = None
            if bias is not None:
                bias2d = bias.reshape(bias.shape[0], bias.shape[-1])
            res = fused_block_attention(
                x, n1["scale"], n1["bias"],
                ap["qkv"]["kernel"], bqkv,
                ap["proj"]["kernel"], ap["proj"]["bias"],
                self.num_heads, (self.dim // self.num_heads) ** -0.5,
                eps=self.layer_norm_eps, bias=bias2d, mask=mask,
                idx=idx, want_keys=(score == "keys"),
            )
            out, row0, colsum = res[:3]
            aux = None
            if score == "cls":
                aux = row0[:, :, 1:].mean(axis=1)
            elif score == "colsum":
                aux = colsum.sum(axis=1)
            elif score == "keys":
                # head-mean keys (ToMe metric) come straight out of the
                # kernel -- no LN+qkv recompute
                aux = res[3]
            return out, (aux, None)
        y, aux = self.attn(
            self.norm1(x), bias=bias, mask=mask, policy=policy,
            score=score, deterministic=deterministic,
        )
        return x + self.drop_path1(y, deterministic=deterministic), aux

    def ffn(self, x, deterministic: bool = True):
        """norm2 -> mlp -> droppath -> residual; on the TPU eval path the
        whole chain runs as one VMEM-resident Pallas kernel (the hidden
        [*, 4D] tensor never hits HBM and the erf GELU overlaps the
        matmuls)."""
        if (
            deterministic
            and not self.is_initializing()
            and _pallas_eligible(deterministic, None, self.force_xla)
        ):
            from tokenreduction_tpu.ops.fused_mlp import fused_mlp_residual

            n2 = self.norm2.variables["params"]
            mp = self.mlp.variables["params"]
            return fused_mlp_residual(
                x, n2["scale"], n2["bias"],
                mp["fc1"]["kernel"], mp["fc1"]["bias"],
                mp["fc2"]["kernel"], mp["fc2"]["bias"],
                eps=self.layer_norm_eps,
            )
        if (
            not deterministic
            and self.drop == 0.0
            and not self.force_xla
            and not self.is_initializing()
            # resident: fc1 [D, H] + fc2 [H, D] weights + f32 accums
            and _pallas_train_eligible(
                2 * self.dim * int(self.dim * self.mlp_ratio))
        ):
            # training: fused MLP branch with a hand-written Pallas
            # backward (custom_vjp; ops/fused_mlp_train.py)
            from tokenreduction_tpu.ops.fused_mlp_train import mlp_branch

            n2 = self.norm2.variables["params"]
            mp = self.mlp.variables["params"]
            branch = mlp_branch(
                x, n2["scale"], n2["bias"],
                mp["fc1"]["kernel"], mp["fc1"]["bias"],
                mp["fc2"]["kernel"], mp["fc2"]["bias"],
                self.layer_norm_eps,
            )
            return x + self.drop_path2(branch, deterministic=False)
        return x + self.drop_path2(
            self.mlp(self.norm2(x), deterministic=deterministic),
            deterministic=deterministic,
        )

    def ffn_gather(self, x, idx, deterministic: bool = True):
        """take_tokens(x, idx) -> ffn, with the row-select fused into the
        MLP kernel on the TPU eval path (the gathered rows never round-
        trip HBM). idx: [B, K] absolute token ids incl. CLS."""
        if (
            deterministic
            and not self.is_initializing()
            and _pallas_eligible(deterministic, None, self.force_xla)
        ):
            from tokenreduction_tpu.ops.fused_mlp import (
                fused_mlp_gather_residual,
            )

            n2 = self.norm2.variables["params"]
            mp = self.mlp.variables["params"]
            return fused_mlp_gather_residual(
                x, idx, n2["scale"], n2["bias"],
                mp["fc1"]["kernel"], mp["fc1"]["bias"],
                mp["fc2"]["kernel"], mp["fc2"]["bias"],
                eps=self.layer_norm_eps,
            )
        from tokenreduction_tpu.ops.gather import take_tokens

        return self.ffn(take_tokens(x, idx), deterministic)

    def __call__(
        self,
        x,
        *,
        bias=None,
        mask=None,
        policy=None,
        score: Optional[str] = None,
        deterministic: bool = True,
    ):
        if (
            policy is None
            and bias is None
            and mask is None
            and score is None
            and deterministic
            and x.shape[1] <= FULL_BLOCK_MAX_N
            and not self.is_initializing()
            and _pallas_eligible(deterministic, None, self.force_xla)
        ):
            # score-less block on the TPU eval path: both halves (attn +
            # MLP) run as ONE kernel -- no inter-half HBM round-trip or
            # second launch (ops/fused_full_block.py)
            from tokenreduction_tpu.ops.fused_full_block import (
                full_block_supported,
                fused_full_block,
            )

            wdtype = (self.attn.variables["params"]["qkv"]["kernel"]
                      .dtype.itemsize)
            if not full_block_supported(
                    x.shape[0], x.shape[1], self.dim,
                    int(self.dim * self.mlp_ratio), self.num_heads,
                    x_itemsize=x.dtype.itemsize, w_itemsize=wdtype):
                x, aux = self.attend(x, deterministic=deterministic)
                return self.ffn(x, deterministic), aux

            n1 = self.norm1.variables["params"]
            ap = self.attn.variables["params"]
            n2 = self.norm2.variables["params"]
            mp = self.mlp.variables["params"]
            bqkv = ap["qkv"].get("bias")
            if bqkv is None:
                bqkv = jnp.zeros((3 * self.dim,), x.dtype)
            out = fused_full_block(
                x, n1["scale"], n1["bias"], ap["qkv"]["kernel"], bqkv,
                ap["proj"]["kernel"], ap["proj"]["bias"],
                n2["scale"], n2["bias"],
                mp["fc1"]["kernel"], mp["fc1"]["bias"],
                mp["fc2"]["kernel"], mp["fc2"]["bias"],
                self.num_heads, (self.dim // self.num_heads) ** -0.5,
                eps=self.layer_norm_eps)
            return out, (None, None)
        x, aux = self.attend(
            x, bias=bias, mask=mask, policy=policy, score=score,
            deterministic=deterministic,
        )
        return self.ffn(x, deterministic), aux

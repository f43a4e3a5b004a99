"""Training losses.

Reference parity:
- label-smoothing / soft-target CE (timm defaults used by train.py:433-447)
- AsymmetricLossMultiLabel for COCO/NUS-WIDE (gamma-=4, gamma+=0, clip .05)
- DeiT DistillationLoss (reference losses.py:4-69)
- DynamicViT distillation loss (reference losses.py:72-158)
All are pure functions of (logits, targets, ...) -> scalar, jit-safe.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def cross_entropy(logits, labels):
    """Plain CE with integer labels."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None], axis=-1).mean()


def label_smoothing_ce(logits, labels, smoothing: float = 0.1):
    n = logits.shape[-1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    smooth = -logp.mean(axis=-1)
    return ((1.0 - smoothing) * nll + smoothing * smooth).mean()


def soft_target_ce(logits, target_probs):
    logp = jax.nn.log_softmax(logits, axis=-1)
    return (-(target_probs * logp).sum(axis=-1)).mean()


def bce_with_logits(logits, targets):
    return jnp.mean(
        jnp.maximum(logits, 0) - logits * targets
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def asymmetric_multilabel_loss(
    logits, targets, gamma_neg: float = 4.0, gamma_pos: float = 0.0,
    clip: float = 0.05, eps: float = 1e-8,
):
    """ASL (Ben-Baruch et al.) as used for COCO/NUS (train.py:433-440)."""
    xs_pos = jax.nn.sigmoid(logits)
    xs_neg = 1.0 - xs_pos
    if clip and clip > 0:
        xs_neg = jnp.clip(xs_neg + clip, max=1.0)
    los_pos = targets * jnp.log(jnp.clip(xs_pos, min=eps))
    los_neg = (1.0 - targets) * jnp.log(jnp.clip(xs_neg, min=eps))
    loss = los_pos + los_neg
    pt = xs_pos * targets + xs_neg * (1.0 - targets)
    gamma = gamma_pos * targets + gamma_neg * (1.0 - targets)
    w = jax.lax.stop_gradient((1.0 - pt) ** gamma)
    return -(loss * w).sum()


def kl_div_log_target(student_logp, teacher_logp, avg: str = "batchmean"):
    """F.kl_div(student_logp, teacher_logp, log_target=True) semantics."""
    t = jnp.exp(teacher_logp)
    pointwise = t * (teacher_logp - student_logp)
    if avg == "batchmean":
        return pointwise.sum() / student_logp.shape[0]
    return pointwise.mean()


def deit_distillation_loss(
    base_loss, student_kd_logits, teacher_logits,
    distillation_type: str, alpha: float, tau: float,
):
    """reference losses.py:21-69 (teacher forward happens outside)."""
    if distillation_type == "none":
        return base_loss
    if distillation_type == "soft":
        T = tau
        d = kl_div_log_target(
            jax.nn.log_softmax(student_kd_logits / T, axis=1),
            jax.nn.log_softmax(teacher_logits / T, axis=1),
        ) * (T * T)
    elif distillation_type == "hard":
        d = cross_entropy(student_kd_logits,
                          teacher_logits.argmax(axis=1))
    else:
        raise ValueError(distillation_type)
    return base_loss * (1.0 - alpha) + d * alpha


def dyvit_distillation_loss(
    base_loss,
    pred,
    token_pred,
    mask,
    out_pred_score,
    keep_rate,
    teacher_cls: Optional[jnp.ndarray],
    teacher_tokens: Optional[jnp.ndarray],
    *,
    ratio_weight: float = 2.0,
    cls_distill_weight: float = 0.5,
    token_distill_weight: float = 0.5,
    cls_weight: float = 1.0,
    mse_token: bool = False,
):
    """reference losses.py:90-158. mask: [B, N, 1] final keep decision."""
    loss = base_loss * cls_weight

    pred_loss = 0.0
    for i, score in enumerate(out_pred_score):
        pred_loss = pred_loss + jnp.mean(
            (score.mean(axis=1) - keep_rate[i]) ** 2
        )
    pred_loss = pred_loss / len(out_pred_score)
    loss = loss + pred_loss * ratio_weight

    if teacher_cls is not None:
        cls_kl = kl_div_log_target(
            jax.nn.log_softmax(pred, axis=-1),
            jax.nn.log_softmax(teacher_cls, axis=-1),
        )
        loss = loss + cls_distill_weight * cls_kl

        B, N, C = token_pred.shape
        m = mask.reshape(B * N) > 0.5
        tp = token_pred.reshape(B * N, C)
        tt = teacher_tokens.reshape(B * N, C)
        denom = jnp.maximum(m.sum(), 1)
        if mse_token:
            token_loss = (
                ((tp - tt) ** 2).mean(axis=-1) * m
            ).sum() / denom
        else:
            t_logp = jax.nn.log_softmax(tt, axis=-1)
            s_logp = jax.nn.log_softmax(tp, axis=-1)
            pointwise = (jnp.exp(t_logp) * (t_logp - s_logp)).sum(axis=-1)
            token_loss = (pointwise * m).sum() / denom
        # reference guards mask.sum() < 0.1 -> zero loss
        token_loss = jnp.where(mask.sum() < 0.1, 0.0, token_loss)
        loss = loss + token_distill_weight * token_loss
    return loss

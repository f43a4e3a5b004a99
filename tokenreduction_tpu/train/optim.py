"""Optimizer factory with the reference's 4-way param grouping
(reference optim.py:39-100, 123-227), built on optax.

Groups:
  new_param / new_param_no_decay : head, pos_embed, patch_embed + the
      model's `new_module_names()` -- full LR, never frozen
  decay / no_decay               : backbone -- LR x backbone_lr_scale,
      LR forced to 0 while epoch < backbone_freeze_steps
      (reference engine.py:35-37)
constant_cls / constant_pos freeze cls_token / pos_embed entirely
(reference optim.py:51-56 skips them from every group).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import optax
from flax import traverse_util


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    opt: str = "adamw"
    lr: float = 5e-4
    weight_decay: float = 0.05
    momentum: float = 0.9
    opt_eps: float = 1e-8
    opt_betas: Optional[tuple] = None
    clip_grad: Optional[float] = None
    backbone_lr_scale: float = 1.0
    backbone_freeze_steps: int = 0  # epochs, despite the name (reference)
    constant_cls: bool = False
    constant_pos: bool = False


BASE_NEW_NAMES = ["head", "head_dist", "pos_embed", "patch_embed"]


def label_for_path(path: Sequence[str], param, new_names: List[str],
                   cfg: OptimConfig) -> str:
    name = ".".join(path)
    if cfg.constant_cls and ("cls_token" in name or "dist_token" in name):
        return "frozen"
    if cfg.constant_pos and "pos_embed" in name:
        return "frozen"
    is_new = any(n in name for n in new_names)
    no_decay = param.ndim <= 1 or path[-1] == "bias"
    if is_new:
        return "new_param_no_decay" if no_decay else "new_param"
    return "no_decay" if no_decay else "decay"


def param_labels(params, new_module_names: List[str], cfg: OptimConfig):
    new_names = BASE_NEW_NAMES + list(new_module_names)
    flat = traverse_util.flatten_dict(params)
    labels = {
        path: label_for_path(path, p, new_names, cfg)
        for path, p in flat.items()
    }
    return traverse_util.unflatten_dict(labels)


def _base_opt(cfg: OptimConfig, lr_fn, weight_decay: float):
    betas = cfg.opt_betas or (0.9, 0.999)
    name = cfg.opt.lower()
    wrap_lookahead = False
    if name.startswith("lookahead_"):
        wrap_lookahead = True
        name = name.split("_", 1)[1]
    if name in ("sgd", "nesterov"):
        tx = optax.sgd(lr_fn, momentum=cfg.momentum, nesterov=True)
        if weight_decay:
            tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    elif name == "momentum":
        tx = optax.sgd(lr_fn, momentum=cfg.momentum, nesterov=False)
        if weight_decay:
            tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    elif name == "adam":
        tx = optax.adam(lr_fn, b1=betas[0], b2=betas[1], eps=cfg.opt_eps)
        if weight_decay:
            tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    elif name == "adamw":
        tx = optax.adamw(lr_fn, b1=betas[0], b2=betas[1], eps=cfg.opt_eps,
                         weight_decay=weight_decay)
    elif name == "adabelief":
        tx = optax.adabelief(lr_fn, b1=betas[0], b2=betas[1],
                             eps=cfg.opt_eps)
        if weight_decay:
            tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    elif name == "nadam":
        tx = optax.nadam(lr_fn, b1=betas[0], b2=betas[1], eps=cfg.opt_eps)
        if weight_decay:
            tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    elif name == "radam":
        tx = optax.radam(lr_fn, b1=betas[0], b2=betas[1], eps=cfg.opt_eps)
        if weight_decay:
            tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    elif name == "adadelta":
        tx = optax.adadelta(lr_fn)
    elif name == "adafactor":
        tx = optax.adafactor(lr_fn)
    elif name in ("rmsprop", "rmsproptf"):
        tx = optax.rmsprop(lr_fn, decay=0.9, momentum=cfg.momentum,
                           eps=cfg.opt_eps)
    elif name == "novograd":
        tx = optax.novograd(lr_fn, b1=betas[0], b2=betas[1],
                            eps=cfg.opt_eps, weight_decay=weight_decay)
    else:
        raise ValueError(f"unsupported optimizer {cfg.opt!r}")
    if wrap_lookahead:
        tx = optax.lookahead(tx, sync_period=5, slow_step_size=0.5)
    return tx


def group_lr_fn(base_schedule: Callable[[int], float], scale: float,
                freeze_epochs: int, steps_per_epoch: int):
    """Per-group LR as a jit-traceable function of the step counter."""

    def lr(step):
        t = base_schedule(step)
        if freeze_epochs > 0:
            epoch = step // max(steps_per_epoch, 1)
            t = jnp.where(epoch < freeze_epochs, 0.0, t)
        return t * scale

    return lr


def create_optimizer(
    params,
    cfg: OptimConfig,
    base_schedule: Callable[[int], float],
    new_module_names: List[str],
    steps_per_epoch: int = 1,
):
    """Build the grouped optax transform. `base_schedule` maps optimizer
    step -> lr (see train/scheduler.py)."""
    labels = param_labels(params, new_module_names, cfg)
    groups = {
        "new_param": _base_opt(
            cfg, group_lr_fn(base_schedule, 1.0, 0, steps_per_epoch),
            cfg.weight_decay),
        "new_param_no_decay": _base_opt(
            cfg, group_lr_fn(base_schedule, 1.0, 0, steps_per_epoch), 0.0),
        "decay": _base_opt(
            cfg, group_lr_fn(base_schedule, cfg.backbone_lr_scale,
                             cfg.backbone_freeze_steps, steps_per_epoch),
            cfg.weight_decay),
        "no_decay": _base_opt(
            cfg, group_lr_fn(base_schedule, cfg.backbone_lr_scale,
                             cfg.backbone_freeze_steps, steps_per_epoch),
            0.0),
        "frozen": optax.set_to_zero(),
    }
    tx = optax.multi_transform(groups, labels)
    if cfg.clip_grad is not None and cfg.clip_grad > 0:
        tx = optax.chain(optax.clip_by_global_norm(cfg.clip_grad), tx)
    return tx, labels


def project_params(params):
    """Post-update projections the reference does inside forward passes:
    Sinkhorn cluster vectors renormalized to the unit sphere
    (reference models/sinkhorn.py:73-76)."""
    flat = traverse_util.flatten_dict(params)
    out = {}
    for path, p in flat.items():
        if len(path) >= 2 and path[-1] == "v" and \
                any("cluster_layers" in seg for seg in path):
            p = p / jnp.linalg.norm(p, axis=-1, keepdims=True)
        out[path] = p
    return traverse_util.unflatten_dict(out)


def ema_update(ema_params, params, decay: float):
    """ModelEmaV2 semantics (timm): ema = decay*ema + (1-decay)*param."""
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p * (1.0 - decay), ema_params, params
    )

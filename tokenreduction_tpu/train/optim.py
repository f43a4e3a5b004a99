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
    # reference train.py:372-392 --attn-only: freeze every param except
    # the blocks' attention modules, the classifier head (head.weight /
    # head.bias only -- head_dist stays frozen), and pos_embed;
    # patch_embed, cls_token, MLPs, norms, and method-added modules
    # (score_predictor, cluster_layers) all freeze, exactly like the
    # requires_grad sweep there.
    attn_only: bool = False


BASE_NEW_NAMES = ["head", "head_dist", "pos_embed", "patch_embed"]


def label_for_path(path: Sequence[str], param, new_names: List[str],
                   cfg: OptimConfig) -> str:
    name = ".".join(path)
    if cfg.constant_cls and ("cls_token" in name or "dist_token" in name):
        return "frozen"
    if cfg.constant_pos and "pos_embed" in name:
        return "frozen"
    if cfg.attn_only and ".attn." not in name \
            and not name.startswith("head.") and "pos_embed" not in name:
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


def _channel_cosine(p, g):
    """Row-wise |cos| stats for the AdamP/SGDP projection test.

    torch weights are [out, ...] with channel rows = dim 0; flax kernels
    are [..., out], so the channel view groups by the LAST axis.
    Returns (max |cosine| over channels, elems per channel) -- timm
    AdamP/SGDP take .abs_() before the max, so an anti-parallel
    weight/grad pair (cos ~ -1) must NOT trigger the projection."""
    pv = p.reshape(-1, p.shape[-1]).T  # [out, rest]
    gv = g.reshape(-1, g.shape[-1]).T
    eps = 1e-8
    cos = jnp.sum(pv * gv, axis=1) / (
        jnp.linalg.norm(pv, axis=1) * jnp.linalg.norm(gv, axis=1) + eps)
    return jnp.max(jnp.abs(cos)), pv.shape[1]


def _project_perturb(p, g, perturb, delta: float, wd_ratio: float):
    """AdamP tangent-space projection (Heo et al. 2021): if the gradient
    is near-orthogonal to a scale-invariant weight (channel- or
    layer-wise), remove the radial component of the update and shrink
    weight decay by wd_ratio. Data-dependent branch -> jnp.where."""
    if p.ndim <= 1:
        return perturb, jnp.asarray(1.0, p.dtype)

    def proj(view_p, view_perturb):
        pn = view_p / (jnp.linalg.norm(view_p, axis=1, keepdims=True)
                       + 1e-8)
        return view_perturb - pn * jnp.sum(pn * view_perturb, axis=1,
                                           keepdims=True)

    # channel view: rows = output units (flax last axis)
    cos_ch, n_ch = _channel_cosine(p, g)
    pv = p.reshape(-1, p.shape[-1]).T
    uv = perturb.reshape(-1, perturb.shape[-1]).T
    ch_proj = proj(pv, uv).T.reshape(p.shape)
    ch_hit = cos_ch < delta / jnp.sqrt(jnp.asarray(n_ch, jnp.float32))

    # layer view: one row = the whole tensor
    pl_ = p.reshape(1, -1)
    gl = g.reshape(1, -1)
    cos_ly = jnp.abs(jnp.sum(pl_ * gl)) / (
        jnp.linalg.norm(pl_) * jnp.linalg.norm(gl) + 1e-8)
    ly_proj = proj(pl_, perturb.reshape(1, -1)).reshape(p.shape)
    ly_hit = cos_ly < delta / jnp.sqrt(jnp.asarray(p.size, jnp.float32))

    out = jnp.where(ch_hit, ch_proj, jnp.where(ly_hit, ly_proj, perturb))
    wd = jnp.where(ch_hit | ly_hit, wd_ratio, 1.0).astype(p.dtype)
    return out, wd


def _adamp(lr_fn, b1: float, b2: float, eps: float, weight_decay: float,
           delta: float = 0.1, wd_ratio: float = 0.01,
           nesterov: bool = True):
    """AdamP (reference optim.py:200-201, timm AdamP w/ wd_ratio=0.01,
    nesterov=True) as an optax transformation."""

    def init(params):
        z = jax.tree_util.tree_map(jnp.zeros_like, params)
        return {"mu": z,
                "nu": jax.tree_util.tree_map(jnp.zeros_like, params),
                "count": jnp.zeros((), jnp.int32)}

    def update(grads, state, params):
        count = state["count"] + 1
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1 - b1) * g, state["mu"], grads)
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1 - b2) * g * g, state["nu"], grads)
        bc1 = 1 - b1 ** count.astype(jnp.float32)
        bc2 = 1 - b2 ** count.astype(jnp.float32)
        lr = lr_fn(state["count"])

        def leaf(p, g, m, v):
            denom = jnp.sqrt(v / bc2) + eps
            if nesterov:
                perturb = (b1 * m + (1 - b1) * g) / denom
            else:
                perturb = m / denom
            perturb, wd = _project_perturb(p, g, perturb, delta, wd_ratio)
            upd = -(lr / bc1) * perturb
            if weight_decay:
                upd = upd - lr * weight_decay * wd * p
            return upd.astype(p.dtype)

        updates = jax.tree_util.tree_map(leaf, params, grads, mu, nu)
        return updates, {"mu": mu, "nu": nu, "count": count}

    return optax.GradientTransformation(init, update)


def _sgdp(lr_fn, momentum: float, weight_decay: float,
          delta: float = 0.1, wd_ratio: float = 0.01,
          nesterov: bool = True):
    """SGDP (reference optim.py:202-203, timm SGDP)."""

    def init(params):
        return {"buf": jax.tree_util.tree_map(jnp.zeros_like, params),
                "count": jnp.zeros((), jnp.int32)}

    def update(grads, state, params):
        buf = jax.tree_util.tree_map(
            lambda b, g: momentum * b + g, state["buf"], grads)
        step_lr = lr_fn(state["count"])

        def leaf(p, g, b):
            d_p = g + momentum * b if nesterov else b
            d_p, wd = _project_perturb(p, g, d_p, delta, wd_ratio)
            upd = -step_lr * d_p
            if weight_decay:
                # timm SGDP: p *= 1 - lr*wd*ratio/(1-momentum)
                upd = upd - step_lr * weight_decay * wd * p / (
                    1.0 - momentum)
            return upd.astype(p.dtype)

        updates = jax.tree_util.tree_map(leaf, params, grads, buf)
        return updates, {"buf": buf, "count": state["count"] + 1}

    return optax.GradientTransformation(init, update)


def _adahessian_grouped(cfg: OptimConfig, base_schedule, labels,
                        steps_per_epoch: int,
                        hessian_power: float = 1.0):
    """AdaHessian (Yao et al., AAAI 2021; reference optim.py:209-210 via
    timm's Adahessian) as one grouped GradientTransformationExtraArgs.

    Adam-shaped update whose second moment tracks the squared Hutchinson
    estimate of the Hessian diagonal, z * (H @ z) with Rademacher z. The
    estimate arrives as the update-time extra arg `hessian_diag` (a
    pytree aligned with params), produced inside the train step by one
    forward-over-reverse jvp of the gradient function
    (train/step.py::hutchinson_grads_and_diag) -- the JAX-native
    equivalent of timm's create_graph backward + autograd.grad(grads,
    params, grad_outputs=z).

    Not wrapped in optax.multi_transform: partition would mask the
    updates tree but pass the extra-arg tree through whole, so the leaf
    structures would disagree. The reference's 4-way grouping (per-group
    lr scale / backbone freeze, decay vs no_decay, frozen) is applied
    per leaf from the same `labels` tree instead."""
    b1, b2 = cfg.opt_betas or (0.9, 0.999)
    eps = cfg.opt_eps
    k = hessian_power
    lr_full = group_lr_fn(base_schedule, 1.0, 0, steps_per_epoch)
    lr_backbone = group_lr_fn(
        base_schedule, cfg.backbone_lr_scale, cfg.backbone_freeze_steps,
        steps_per_epoch)

    def init(params):
        z = jax.tree_util.tree_map(jnp.zeros_like, params)
        return {"mu": z,
                "nu": jax.tree_util.tree_map(jnp.zeros_like, params),
                "count": jnp.zeros((), jnp.int32)}

    def update(grads, state, params=None, *, hessian_diag=None, **_):
        if hessian_diag is None:
            raise ValueError(
                "adahessian needs the Hutchinson diagonal: call "
                "tx.update(..., hessian_diag=diag) (the train step does "
                "this when StepConfig.hutchinson is set)")
        count = state["count"] + 1
        cf = count.astype(jnp.float32)
        bc1 = 1 - b1 ** cf
        bc2 = 1 - b2 ** cf
        lr_f = lr_full(state["count"])
        lr_b = lr_backbone(state["count"])
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1 - b1) * g, state["mu"], grads)
        nu = jax.tree_util.tree_map(
            lambda v, h: b2 * v + (1 - b2) * h * h, state["nu"],
            hessian_diag)

        def leaf(p, m, v, lab):
            if lab == "frozen":
                return jnp.zeros_like(p)
            lr = lr_f if lab.startswith("new_param") else lr_b
            wd = cfg.weight_decay if lab in ("new_param", "decay") else 0.0
            denom = (v / bc2) ** (k / 2.0) + eps
            upd = -(lr / bc1) * (m / denom)
            if wd:
                # decoupled decay, timm Adahessian: p *= 1 - lr*wd
                upd = upd - lr * wd * p
            return upd.astype(p.dtype)

        updates = jax.tree_util.tree_map(leaf, params, mu, nu, labels)
        return updates, {"mu": mu, "nu": nu, "count": count}

    return optax.GradientTransformationExtraArgs(init, update)


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
    elif name in ("novograd", "nvnovograd"):
        # optax.novograd implements the NovoGrad paper (Ginsburg et al.),
        # i.e. NVIDIA's layer-wise-second-moment variant; it serves both
        # the reference's "novograd" and "nvnovograd" names
        # (reference optim.py:215-217)
        tx = optax.novograd(lr_fn, b1=betas[0], b2=betas[1],
                            eps=cfg.opt_eps, weight_decay=weight_decay)
    elif name == "adamp":
        tx = _adamp(lr_fn, betas[0], betas[1], cfg.opt_eps, weight_decay)
    elif name == "sgdp":
        tx = _sgdp(lr_fn, cfg.momentum, weight_decay)
    elif name == "adahessian":
        # handled by _adahessian_grouped in create_optimizer (needs the
        # update-time hessian_diag extra arg, incompatible with
        # multi_transform partitioning); reaching this dispatch means a
        # lookahead_ wrapper was requested, which optax.lookahead cannot
        # wrap around an extra-args transform
        raise ValueError(
            "lookahead_adahessian is unsupported; use plain adahessian")
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
    if cfg.opt.lower() == "adahessian":
        tx = _adahessian_grouped(cfg, base_schedule, labels,
                                 steps_per_epoch)
        if cfg.clip_grad is not None and cfg.clip_grad > 0:
            # clip applies to the first-order grads only; the Hutchinson
            # extra arg passes through unclipped (matches timm, where
            # clip_grad_norm_ edits p.grad but not the stored hut trace)
            tx = optax.chain(
                optax.clip_by_global_norm(cfg.clip_grad), tx)
        return tx, labels
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

"""Jitted train/eval steps.

Replaces the reference hot loop (engine.py:33-109): one `train_step` call
covers mixup, `grad_accum_steps` microbatch forwards/backwards via
`lax.scan`, global-norm clipping, the grouped optimizer update, the EMA
update, and Sinkhorn's param projection -- a single XLA program per step
with zero host sync (vs the reference's per-step `loss.item()` +
`torch.cuda.synchronize()`).

AMP: instead of GradScaler (mp_scaler.py), the forward runs in bfloat16
with fp32 master params -- the TPU-native mixed-precision recipe; no loss
scaling needed because bf16 has fp32's exponent range.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import struct

from tokenreduction_tpu.train.optim import ema_update, project_params


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Optional[Any] = None


@dataclasses.dataclass(frozen=True)
class StepConfig:
    grad_accum_steps: int = 1
    ema_decay: float = 0.0  # 0 = disabled
    amp: bool = False  # bf16 forward
    # reference --no-train-mode (train.py:111-113, engine.py
    # set_training_mode): run the training forward with the model in
    # eval mode -- dropout/droppath off and the eval-time reduction
    # branch (hard selection instead of masking) -- "keep in eval mode
    # for deit finetuning" (train.py:599)
    train_mode: bool = True
    project_sinkhorn: bool = False
    rng_streams: tuple = ("dropout", "droppath")
    # wandb.watch equivalent (reference train.py:561): per-top-level-
    # module param/grad L2 norms in the step metrics
    watch_norms: bool = False
    # adahessian: estimate the Hessian diagonal per microbatch via a
    # Hutchinson probe and pass it to tx.update as `hessian_diag`.
    # Requires the XLA train path (forward-mode jvp cannot cross the
    # Pallas custom_vjp kernels) -- train/loop.py forces it.
    hutchinson: bool = False


def _cast_tree(tree, dtype):
    return jax.tree_util.tree_map(
        lambda p: p.astype(dtype)
        if jnp.issubdtype(p.dtype, jnp.floating) else p,
        tree,
    )


def rademacher_like(key, tree):
    """One +-1 fp32 probe per leaf of `tree` (independent keys)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    keys = jax.random.split(key, len(leaves))
    return jax.tree_util.tree_unflatten(
        treedef,
        [jax.random.rademacher(k, l.shape, jnp.float32)
         for k, l in zip(keys, leaves)])


def hutchinson_grads_and_diag(vg_fn, params, z):
    """(loss, grads, z * (H @ z)) in ONE forward-over-reverse jvp of the
    gradient function -- the JAX-native form of timm Adahessian's
    create_graph backward + autograd.grad(grads, params, grad_outputs=z)
    (reference optim.py:209-210). The jvp tangent of grad(loss) along z
    is exactly H @ z; elementwise-multiplying by the Rademacher probe z
    gives the Hutchinson estimate of the Hessian diagonal.

    vg_fn: params -> (loss, grads), e.g. jax.value_and_grad(loss_fn)."""
    (loss, grads), (_, hz) = jax.jvp(vg_fn, (params,), (z,))
    diag = jax.tree_util.tree_map(lambda a, b: a * b, z, hz)
    return loss, grads, diag


def make_train_step(
    apply_fn: Callable,
    loss_fn: Callable,
    tx,
    cfg: StepConfig,
    mixup_fn: Optional[Callable] = None,
    aug_fn: Optional[Callable] = None,
):
    """Build the jittable step.

    apply_fn(params, images, train, rngs) -> model output
    loss_fn(output, targets, images, params) -> scalar loss
    mixup_fn(key, images, labels) -> (images, soft targets) or None
    aug_fn(key, uint8 images) -> float images; device-side augmentation
      (data/device_aug.py), fused into the step ahead of mixup
    Batch: dict(image=[A*M, H, W, C], label=[A*M, ...]) where A =
    grad_accum_steps; microbatches are the leading-axis splits.
    """
    accum = cfg.grad_accum_steps

    def compute_loss(params, images, targets, rng):
        rngs = {}
        keys = jax.random.split(rng, len(cfg.rng_streams))
        for name, k in zip(cfg.rng_streams, keys):
            rngs[name] = k
        p = _cast_tree(params, jnp.bfloat16) if cfg.amp else params
        x = images.astype(jnp.bfloat16) if cfg.amp else images
        out = apply_fn(p, x, cfg.train_mode, rngs)
        loss = loss_fn(out, targets, images, params)
        return loss.astype(jnp.float32)

    def train_step(state: TrainState, batch, rng):
        images, labels = batch["image"], batch["label"]
        if aug_fn is not None:
            rng, ka = jax.random.split(rng)
            images = aug_fn(ka, images)
        if mixup_fn is not None:
            rng, k = jax.random.split(rng)
            images, labels = mixup_fn(k, images, labels)

        B = images.shape[0]
        micro = B // accum
        im = images.reshape((accum, micro) + images.shape[1:])
        lb = labels.reshape((accum, micro) + labels.shape[1:])
        step_rngs = jax.random.split(rng, accum)

        grad_fn = jax.value_and_grad(compute_loss)
        zero_g = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, jnp.float32), state.params)

        if cfg.hutchinson:
            def micro_step(carry, inp):
                g_acc, h_acc, l_acc = carry
                mb_im, mb_lb, mb_rng = inp
                zk, mb_rng = jax.random.split(mb_rng)
                z = rademacher_like(zk, state.params)
                loss, grads, diag = hutchinson_grads_and_diag(
                    lambda p: grad_fn(p, mb_im, mb_lb, mb_rng),
                    state.params, z)
                g_acc = jax.tree_util.tree_map(jnp.add, g_acc, grads)
                h_acc = jax.tree_util.tree_map(jnp.add, h_acc, diag)
                return (g_acc, h_acc, l_acc + loss), None

            (grads, hdiag, loss_sum), _ = jax.lax.scan(
                micro_step,
                (zero_g, zero_g, jnp.zeros((), jnp.float32)),
                (im, lb, step_rngs),
            )
            hdiag = jax.tree_util.tree_map(lambda h: h / accum, hdiag)
            extra = {"hessian_diag": hdiag}
        else:
            def micro_step(carry, inp):
                g_acc, l_acc = carry
                mb_im, mb_lb, mb_rng = inp
                loss, grads = grad_fn(state.params, mb_im, mb_lb, mb_rng)
                g_acc = jax.tree_util.tree_map(jnp.add, g_acc, grads)
                return (g_acc, l_acc + loss), None

            (grads, loss_sum), _ = jax.lax.scan(
                micro_step, (zero_g, jnp.zeros((), jnp.float32)),
                (im, lb, step_rngs),
            )
            extra = {}
        grads = jax.tree_util.tree_map(lambda g: g / accum, grads)
        loss = loss_sum / accum

        updates, opt_state = tx.update(grads, state.opt_state,
                                       state.params, **extra)
        params = jax.tree_util.tree_map(
            lambda p, u: p + u.astype(p.dtype), state.params, updates)
        if cfg.project_sinkhorn:
            params = project_params(params)
        ema_params = state.ema_params
        if cfg.ema_decay > 0 and ema_params is not None:
            ema_params = ema_update(ema_params, params, cfg.ema_decay)
        new_state = TrainState(
            step=state.step + 1, params=params,
            opt_state=opt_state, ema_params=ema_params,
        )
        metrics = {"loss": loss,
                   "grad_norm": optax_global_norm(grads)}
        if cfg.watch_norms:
            for key, sub in params.items():
                metrics[f"param_norm/{key}"] = optax_global_norm(sub)
                metrics[f"grad_norm/{key}"] = optax_global_norm(grads[key])
        return new_state, metrics

    return train_step


def make_multi_train_step(train_step):
    """Scan `train_step` over a leading steps axis of stacked batches.

    Amortizes per-dispatch host/runtime overhead (the TPU relay used for
    development adds ~27ms per call; real pods also benefit from fewer
    host round-trips). batch leaves: [S, B, ...]; returns per-step
    metrics stacked on axis 0."""

    def multi_step(state, batches, rng):
        S = jax.tree_util.tree_leaves(batches)[0].shape[0]
        rngs = jax.random.split(rng, S)

        def body(st, inp):
            b, r = inp
            st, metrics = train_step(st, b, r)
            return st, metrics

        state, metrics = jax.lax.scan(body, state, (batches, rngs))
        return state, metrics

    return multi_step


def optax_global_norm(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x)) for x in leaves))


def make_eval_step(apply_fn: Callable, multilabel: bool = False,
                   transform_fn: Optional[Callable] = None):
    """Returns per-batch eval metrics.

    Multiclass: (top1 correct, top5 correct, loss sum, count) -- summable
    across batches/devices, mirroring engine.py:119-151.
    Multilabel: (sigmoid probs, targets) for host-side mAP
    (engine.py:156-205).
    transform_fn: optional device-side eval transform (uint8 batch ->
    normalized float; data/device_aug.py::make_device_eval_transform)."""

    def eval_step(params, batch):
        images = batch["image"]
        if transform_fn is not None:
            images = transform_fn(images)
        out = apply_fn(params, images, False, None)
        logits = out[0] if isinstance(out, tuple) else out
        if multilabel:
            return jax.nn.sigmoid(logits), batch["label"]
        labels = batch["label"]
        # "weight" (1 = real row, 0 = loader pad) keeps the metric math
        # fully sharded -- padded tails are masked inside the jitted
        # program instead of trimming to a host-divergent shape
        w = batch.get("weight")
        if w is None:
            w = jnp.ones(labels.shape, jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        loss = -(jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
                 * w).sum()
        top5 = jax.lax.top_k(logits, min(5, logits.shape[-1]))[1]
        correct1 = ((top5[:, 0] == labels) * w).sum()
        correct5 = ((top5 == labels[:, None]).any(axis=-1) * w).sum()
        return {
            "correct1": correct1,
            "correct5": correct5,
            "loss_sum": loss,
            "count": w.sum(),
        }

    return eval_step

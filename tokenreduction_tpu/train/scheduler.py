"""LR schedules (reference scheduler_factory.py:10-97, timm semantics).

Pure functions step -> lr factor, usable both inside optax (on-device) and
host-side for logging. `sched_in_steps` switches the time base from epochs
to optimizer steps exactly like the reference flag.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional, Tuple


@dataclasses.dataclass(frozen=True)
class SchedConfig:
    sched: str = "cosine"
    lr: float = 5e-4
    min_lr: float = 1e-5
    warmup_lr: float = 1e-6
    warmup_epochs: int = 5
    epochs: int = 300
    cooldown_epochs: int = 0
    decay_epochs: float = 30
    decay_rate: float = 0.1
    sched_in_steps: bool = False
    steps_per_epoch: int = 1
    # lr noise (reference scheduler_factory.py:13-22, 46-48): fractions of
    # the run at which multiplicative noise turns on ([start] or
    # [start, end)); noise ~ truncated normal, |noise| < lr_noise_pct
    lr_noise: Optional[Tuple[float, ...]] = None
    lr_noise_pct: float = 0.67
    lr_noise_std: float = 1.0
    seed: int = 42


def lr_noise_factor(cfg: SchedConfig, t):
    """Multiplicative (1 + noise) LR factor at schedule time t.

    timm rejection-samples a normal until |noise| < noise_pct; the
    equivalent distribution is a truncated normal, which is what
    jax.random provides natively -- deterministic per (seed, floor(t)),
    usable both host-side (concrete t) and inside jit (traced t).
    Matches the reference's range semantics: scalar/1-list -> active for
    t >= frac*T; 2-list -> active for start <= t < end.
    """
    if cfg.lr_noise is None:
        return 1.0
    import jax
    import jax.numpy as jnp

    mult = cfg.steps_per_epoch if cfg.sched_in_steps else 1
    rng = [float(n) * cfg.epochs * mult for n in cfg.lr_noise]
    ti = jnp.floor(jnp.asarray(t, jnp.float32)).astype(jnp.int32)
    if len(rng) >= 2:
        active = (ti >= rng[0]) & (ti < rng[1])
    else:
        active = ti >= rng[0]
    std = max(cfg.lr_noise_std, 1e-12)
    bound = cfg.lr_noise_pct / std
    key = jax.random.fold_in(jax.random.PRNGKey(cfg.seed), ti)
    noise = jax.random.truncated_normal(key, -bound, bound) * std
    return jnp.where(active, 1.0 + noise, 1.0)


def make_schedule(cfg: SchedConfig) -> Callable[[float], float]:
    """Returns lr(t) where t is the epoch (or step if sched_in_steps,
    pre-scaled by the caller via `t_of_step`)."""
    mult = cfg.steps_per_epoch if cfg.sched_in_steps else 1
    t_initial = (cfg.epochs - cfg.cooldown_epochs) * mult
    warmup_t = cfg.warmup_epochs * mult
    decay_t = cfg.decay_epochs * mult

    def cosine(t):
        if warmup_t and t < warmup_t:
            return cfg.warmup_lr + (cfg.lr - cfg.warmup_lr) * t / warmup_t
        tt = min(t - warmup_t, t_initial - warmup_t)
        span = max(t_initial - warmup_t, 1)
        return cfg.min_lr + 0.5 * (cfg.lr - cfg.min_lr) * (
            1 + math.cos(math.pi * tt / span)
        )

    def tanh(t):
        if warmup_t and t < warmup_t:
            return cfg.warmup_lr + (cfg.lr - cfg.warmup_lr) * t / warmup_t
        tt = min(t - warmup_t, t_initial - warmup_t)
        span = max(t_initial - warmup_t, 1)
        # timm TanhLRScheduler default bounds [-7, 3] -> [lb, ub]
        lb, ub = -7.0, 3.0
        frac = tt / span
        return cfg.min_lr + (cfg.lr - cfg.min_lr) * 0.5 * (
            1 - math.tanh(lb + (ub - lb) * frac)
        ) / (0.5 * (1 - math.tanh(lb)))

    def step(t):
        if warmup_t and t < warmup_t:
            return cfg.warmup_lr + (cfg.lr - cfg.warmup_lr) * t / warmup_t
        return cfg.lr * cfg.decay_rate ** ((t - warmup_t) // max(decay_t, 1))

    table = {"cosine": cosine, "tanh": tanh, "step": step,
             "constant": lambda t: cfg.lr,
             # plateau: constant base; the metric-driven decay is applied
             # host-side by the train loop (rebuilds the optimizer)
             "plateau": lambda t: cfg.lr}
    if cfg.sched not in table:
        raise ValueError(f"unknown sched {cfg.sched}")
    base = table[cfg.sched]
    if cfg.lr_noise is None:
        return base
    return lambda t: float(base(t) * lr_noise_factor(cfg, t))


def t_of_step(cfg: SchedConfig, total_step: int, epoch: int) -> float:
    """Reference behavior: per-step `step_update(total_step)` when
    sched_in_steps, else per-epoch `step(epoch)` (engine.py:108-109,
    train.py:606)."""
    return float(total_step) if cfg.sched_in_steps else float(epoch)

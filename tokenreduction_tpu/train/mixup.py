"""Batch-mode Mixup/CutMix with label smoothing (timm semantics, as wired
in reference train.py:313-319). Runs on-device inside the jitted train step
instead of in the host input pipeline.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class MixupConfig:
    mixup_alpha: float = 0.8
    cutmix_alpha: float = 1.0
    prob: float = 1.0
    switch_prob: float = 0.5
    label_smoothing: float = 0.1
    num_classes: int = 1000
    mode: str = "batch"  # batch | pair | elem (timm Mixup modes)
    # timm cutmix ratio bounds (reference train.py:134 --cutmix-minmax):
    # when set, the cut box side is drawn uniformly in
    # [H*min, H*max) x [W*min, W*max) and placed fully inside the image
    # (timm rand_bbox_minmax), with lambda taken from the exact box area;
    # timm forces cutmix_alpha = 1.0 in this mode.
    cutmix_minmax: Optional[tuple] = None

    def __post_init__(self):
        if self.mode not in ("batch", "pair", "elem"):
            raise ValueError(f"unknown mixup mode {self.mode!r}; "
                             "expected batch, pair, or elem")
        if self.cutmix_minmax is not None:
            mm = tuple(float(v) for v in self.cutmix_minmax)
            if len(mm) != 2:
                raise ValueError("cutmix_minmax expects exactly two "
                                 f"floats, got {self.cutmix_minmax!r}")
            object.__setattr__(self, "cutmix_minmax", mm)
            # timm Mixup.__init__: "force cutmix alpha == 1.0 when minmax
            # active to mimic original paper"
            object.__setattr__(self, "cutmix_alpha", 1.0)

    @property
    def enabled(self) -> bool:
        return (self.mixup_alpha > 0 or self.cutmix_alpha > 0
                or self.cutmix_minmax is not None)


def one_hot_smooth(labels, num_classes: int, smoothing: float):
    off = smoothing / num_classes
    on = 1.0 - smoothing + off
    return jax.nn.one_hot(labels, num_classes) * (on - off) + off


def _rand_bbox(key, H, W, lam):
    """timm rand_bbox: cut ratio sqrt(1-lam), uniform center, clipped."""
    ratio = jnp.sqrt(1.0 - lam)
    cut_h = (H * ratio).astype(jnp.int32)
    cut_w = (W * ratio).astype(jnp.int32)
    ky, kx = jax.random.split(key)
    cy = jax.random.randint(ky, (), 0, H)
    cx = jax.random.randint(kx, (), 0, W)
    y1 = jnp.clip(cy - cut_h // 2, 0, H)
    y2 = jnp.clip(cy + cut_h // 2, 0, H)
    x1 = jnp.clip(cx - cut_w // 2, 0, W)
    x2 = jnp.clip(cx + cut_w // 2, 0, W)
    return y1, y2, x1, x2


def _rand_bbox_minmax(key, H, W, minmax):
    """timm rand_bbox_minmax: side lengths uniform in [dim*min, dim*max),
    box placed fully inside the image (never clipped)."""
    lo, hi = minmax
    kh, kw, ky, kx = jax.random.split(key, 4)
    cut_h = jax.random.randint(kh, (), int(H * lo), int(H * hi))
    cut_w = jax.random.randint(kw, (), int(W * lo), int(W * hi))
    y1 = jax.random.randint(ky, (), 0, H - cut_h)
    x1 = jax.random.randint(kx, (), 0, W - cut_w)
    return y1, y1 + cut_h, x1, x1 + cut_w


def apply_mixup(key, images, labels, cfg: MixupConfig):
    """images [B, H, W, C] NHWC, labels int [B].
    Returns (mixed images, soft targets [B, num_classes])."""
    y1h = one_hot_smooth(labels, cfg.num_classes, cfg.label_smoothing)
    if not cfg.enabled:
        return images, y1h
    if cfg.mode != "batch":
        return _apply_mixup_per_elem(key, images, y1h, cfg)
    B, H, W, _ = images.shape
    k_apply, k_switch, k_lam_m, k_lam_c, k_box = jax.random.split(key, 5)
    flipped = images[::-1]
    y2h = y1h[::-1]

    use_cutmix = jnp.logical_and(
        jax.random.uniform(k_switch) < cfg.switch_prob,
        cfg.cutmix_alpha > 0,
    )
    if cfg.mixup_alpha <= 0:
        use_cutmix = jnp.asarray(True)

    lam_mix = jax.random.beta(
        k_lam_m, cfg.mixup_alpha or 1.0, cfg.mixup_alpha or 1.0)
    lam_cut = jax.random.beta(
        k_lam_c, cfg.cutmix_alpha or 1.0, cfg.cutmix_alpha or 1.0)

    # --- mixup branch
    mixed_m = images * lam_mix + flipped * (1.0 - lam_mix)

    # --- cutmix branch (minmax mode draws the box, not the lambda)
    if cfg.cutmix_minmax is not None:
        yy1, yy2, xx1, xx2 = _rand_bbox_minmax(k_box, H, W,
                                               cfg.cutmix_minmax)
    else:
        yy1, yy2, xx1, xx2 = _rand_bbox(k_box, H, W, lam_cut)
    ys = jnp.arange(H)[None, :, None, None]
    xs = jnp.arange(W)[None, None, :, None]
    in_box = (ys >= yy1) & (ys < yy2) & (xs >= xx1) & (xs < xx2)
    mixed_c = jnp.where(in_box, flipped, images)
    lam_cut_adj = 1.0 - ((yy2 - yy1) * (xx2 - xx1)) / (H * W)

    mixed = jnp.where(use_cutmix, mixed_c, mixed_m)
    lam = jnp.where(use_cutmix, lam_cut_adj, lam_mix).astype(images.dtype)
    targets = y1h * lam + y2h * (1.0 - lam)

    apply = jax.random.uniform(k_apply) < cfg.prob
    mixed = jnp.where(apply, mixed, images)
    targets = jnp.where(apply, targets, y1h)
    return mixed, targets


def _apply_mixup_per_elem(key, images, y1h, cfg: MixupConfig):
    """timm Mixup 'elem'/'pair' modes (timm/data/mixup.py _mix_elem /
    _mix_pair, as selectable via reference train.py:124 --mixup-mode).

    Each element i mixes with the ORIGINAL of its mirror j = B-1-i, with a
    per-element lambda / cutmix switch / apply decision. 'pair' symmetrizes
    the draws so i and j share one lambda and one cut box (and, for odd B,
    leaves the self-paired middle element unmixed, like timm's
    range(B // 2) loop)."""
    B, H, W, _ = images.shape
    k_apply, k_switch, k_lam_m, k_lam_c, k_box = jax.random.split(key, 5)
    flipped = images[::-1]
    y2h = y1h[::-1]

    use_cutmix = jnp.logical_and(
        jax.random.uniform(k_switch, (B,)) < cfg.switch_prob,
        cfg.cutmix_alpha > 0)
    if cfg.mixup_alpha <= 0:
        use_cutmix = jnp.ones((B,), bool)
    lam_mix = jax.random.beta(
        k_lam_m, cfg.mixup_alpha or 1.0, cfg.mixup_alpha or 1.0, (B,))
    lam_cut = jax.random.beta(
        k_lam_c, cfg.cutmix_alpha or 1.0, cfg.cutmix_alpha or 1.0, (B,))
    if cfg.cutmix_minmax is not None:
        boxes = jax.vmap(
            lambda k: _rand_bbox_minmax(k, H, W, cfg.cutmix_minmax))(
                jax.random.split(k_box, B))
    else:
        boxes = jax.vmap(lambda k, lam: _rand_bbox(k, H, W, lam))(
            jax.random.split(k_box, B), lam_cut)
    apply = jax.random.uniform(k_apply, (B,)) < cfg.prob

    if cfg.mode == "pair":
        idx = jnp.arange(B)
        first = idx < (B - 1 - idx)  # first half of each pair

        def sym(v):
            return jnp.where(first, v, v[::-1])

        use_cutmix = sym(use_cutmix)
        lam_mix = sym(lam_mix)
        boxes = tuple(sym(b) for b in boxes)
        # odd B: the middle element pairs with itself -> never mixed
        apply = sym(apply) & (idx != (B - 1 - idx))

    lam_mix = lam_mix[:, None, None, None].astype(images.dtype)
    mixed_m = images * lam_mix + flipped * (1.0 - lam_mix)

    yy1, yy2, xx1, xx2 = (b[:, None, None, None] for b in boxes)
    ys = jnp.arange(H)[None, :, None, None]
    xs = jnp.arange(W)[None, None, :, None]
    in_box = (ys >= yy1) & (ys < yy2) & (xs >= xx1) & (xs < xx2)
    mixed_c = jnp.where(in_box, flipped, images)
    lam_cut_adj = (1.0 - ((yy2 - yy1) * (xx2 - xx1)) / (H * W)).astype(
        images.dtype)

    cut4 = use_cutmix[:, None, None, None]
    mixed = jnp.where(cut4, mixed_c, mixed_m)
    lam = jnp.where(cut4, lam_cut_adj, lam_mix)
    apply4 = apply[:, None, None, None]
    mixed = jnp.where(apply4, mixed, images)
    lam2 = jnp.where(apply, lam[:, 0, 0, 0], 1.0)[:, None]
    targets = y1h * lam2 + y2h * (1.0 - lam2)
    return mixed, targets

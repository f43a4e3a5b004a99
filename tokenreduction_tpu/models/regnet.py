"""RegNetY (inference-only, Flax) — the DeiT distillation teacher.

The reference's DeiT-distillation protocol builds a timm convnet teacher
(`--teacher-model regnety_160` default, reference train.py:178, teacher
constructed at train.py:455-478). This is a TPU-native re-implementation
of that architecture (pycls "Designing Network Design Spaces" RegNetY:
bottleneck blocks with grouped 3x3 conv + squeeze-excitation), with the
parameter tree named to mirror the timm RegNet checkpoint layout
(stem.conv / s{i}.b{j}.{conv1,conv2,se,conv3,downsample} / head.fc) so
the released weights convert 1:1 (models/convert.py
convert_regnet_state_dict).

Inference-only by design: the teacher runs under stop_gradient with
frozen statistics, so BatchNorm is a pure affine using the checkpoint's
running mean/var (kept in "params" — no mutable batch_stats collection,
which keeps the teacher wiring identical to the ViT teachers').

RegNetY-160 (16GF) instance: stem 32, depths (2,4,11,1), widths
(224,448,1232,3024), group width 112, SE ratio 0.25 of each block's
input width (verified against the design-space quantization with
w0=200, wa=106.23, wm=2.48, depth=18, q=8).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class RegNetConfig:
    depths: Tuple[int, ...] = (2, 4, 11, 1)
    widths: Tuple[int, ...] = (224, 448, 1232, 3024)
    group_width: int = 112
    stem_width: int = 32
    se_ratio: float = 0.25
    num_classes: int = 1000
    img_size: int = 224
    bn_eps: float = 1e-5
    method: str = "regnety"  # registry/bookkeeping tag


class FrozenBatchNorm(nn.Module):
    """Inference BatchNorm: (x - mean) / sqrt(var + eps) * scale + bias.

    All four tensors live in "params" (converted from the torch
    checkpoint's weight/bias/running_mean/running_var)."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        inv = scale / jnp.sqrt(var + self.eps)
        return x * inv + (bias - mean * inv)


class ConvBn(nn.Module):
    """conv -> frozen BN (-> relu), named conv/bn like timm ConvBnAct."""

    features: int
    kernel: int
    stride: int = 1
    groups: int = 1
    act: bool = True
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            # explicit symmetric padding: torch pads (1,1) for 3x3 while
            # flax "SAME" at stride 2 would pad (0,1)
            padding=((pad, pad), (pad, pad)),
            feature_group_count=self.groups, use_bias=False,
            name="conv")(x)
        x = FrozenBatchNorm(self.features, eps=self.eps, name="bn")(x)
        return nn.relu(x) if self.act else x


class SqueezeExcite(nn.Module):
    """Global-pool -> fc1 1x1 -> relu -> fc2 1x1 -> sigmoid gate."""

    features: int  # gated (block bottleneck) width
    rd_channels: int  # reduction width = round(block input * se_ratio)

    @nn.compact
    def __call__(self, x):
        s = x.mean(axis=(1, 2), keepdims=True)
        s = nn.Conv(self.rd_channels, (1, 1), name="fc1")(s)
        s = nn.relu(s)
        s = nn.Conv(self.features, (1, 1), name="fc2")(s)
        return x * nn.sigmoid(s)


class Bottleneck(nn.Module):
    """RegNetY bottleneck (ratio 1): 1x1 -> grouped 3x3 (stride) -> SE ->
    1x1, residual through an optional 1x1-stride downsample, final relu."""

    w_in: int
    w_out: int
    stride: int
    group_width: int
    se_ratio: float
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        w_b = self.w_out  # bottleneck_ratio = 1 for RegNetY
        groups = w_b // self.group_width
        shortcut = x
        if self.stride != 1 or self.w_in != self.w_out:
            shortcut = ConvBn(self.w_out, 1, self.stride, act=False,
                              eps=self.eps, name="downsample")(x)
        y = ConvBn(w_b, 1, eps=self.eps, name="conv1")(x)
        y = ConvBn(w_b, 3, self.stride, groups=max(groups, 1),
                   eps=self.eps, name="conv2")(y)
        y = SqueezeExcite(w_b, int(round(self.w_in * self.se_ratio)),
                          name="se")(y)
        y = ConvBn(self.w_out, 1, act=False, eps=self.eps, name="conv3")(y)
        return nn.relu(shortcut + y)


class RegNet(nn.Module):
    """RegNetY classifier. __call__(x NHWC, train=False) -> logits."""

    cfg: RegNetConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.cfg
        x = ConvBn(c.stem_width, 3, 2, eps=c.bn_eps, name="stem")(x)
        w_in = c.stem_width
        for si, (depth, w_out) in enumerate(zip(c.depths, c.widths)):
            for bi in range(depth):
                x = Bottleneck(
                    w_in=w_in, w_out=w_out,
                    stride=2 if bi == 0 else 1,
                    group_width=c.group_width, se_ratio=c.se_ratio,
                    eps=c.bn_eps, name=f"s{si + 1}_b{bi + 1}")(x)
                w_in = w_out
        x = x.mean(axis=(1, 2))
        return nn.Dense(c.num_classes, name="head_fc")(x)

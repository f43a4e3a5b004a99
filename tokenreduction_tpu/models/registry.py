"""Model registry: reference-compatible names -> (flax module, config).

Names mirror reference models_act.py exactly:
  {deit_local(+_viz), dyvit(+_teacher), patchmerger, sinkhorn, ats,
   heuristic, dpcknn, kmedoids, topk, evit, tome, sit}
  x {tiny(192d/3h), small(384d/6h), base(768d/12h)}, patch16/224/depth12.
"""

from __future__ import annotations

from typing import Tuple

from flax import linen as nn

from tokenreduction_tpu.core.config import SIZE_PRESETS, ViTConfig
from tokenreduction_tpu.models.deit import (
    VisionTransformer,
    VisionTransformerTeacher,
)
from tokenreduction_tpu.reduction.ats import ATSVisionTransformer
from tokenreduction_tpu.reduction.cluster import (
    DPCKNNVisionTransformer,
    KMedoidsVisionTransformer,
    PatchMergerVisionTransformer,
    SinkhornVisionTransformer,
    SiTVisionTransformer,
)
from tokenreduction_tpu.reduction.dyvit import DynamicVisionTransformer
from tokenreduction_tpu.reduction.evit import EViTVisionTransformer
from tokenreduction_tpu.reduction.heuristic import HeuristicVisionTransformer
from tokenreduction_tpu.reduction.tome import ToMeVisionTransformer
from tokenreduction_tpu.reduction.topk import TopKVisionTransformer

_METHODS = {
    "topk": ("topk", TopKVisionTransformer),
    "evit": ("evit", EViTVisionTransformer),
    "tome": ("tome", ToMeVisionTransformer),
    "sit": ("sit", SiTVisionTransformer),
    "patchmerger": ("patchmerger", PatchMergerVisionTransformer),
    "sinkhorn": ("sinkhorn", SinkhornVisionTransformer),
    "dpcknn": ("dpcknn", DPCKNNVisionTransformer),
    "kmedoids": ("kmedoids", KMedoidsVisionTransformer),
    "dyvit": ("dyvit", DynamicVisionTransformer),
    "ats": ("ats", ATSVisionTransformer),
    "heuristic": ("heuristic", HeuristicVisionTransformer),
}

_REGISTRY = {}


def _register(name, method_key, size, cls, **extra):
    def build(num_classes=1000, img_size=224, distilled=False,
              dyvit_distillation=False, **overrides):
        cfg_kw = dict(SIZE_PRESETS[size])
        cfg_kw.update(
            img_size=img_size,
            num_classes=num_classes,
            method=method_key,
            distilled=distilled,
        )
        cfg_kw.update(overrides)
        cfg = ViTConfig(**cfg_kw)
        mod_kw = {}
        if cls is DynamicVisionTransformer:
            if distilled:
                # the reference's own DyViT forward never concatenates
                # the dist token (dyvit.py:205-214 cats only CLS while
                # the distilled parent allocates pos_embed n+2), so
                # dyvit + DeiT-distilled backbone is unusable there
                # too -- fail loudly instead of with a shape error
                raise ValueError(
                    "dyvit does not support the DeiT-distilled "
                    "backbone (the reference's forward never handles "
                    "the dist token, models/dyvit.py:205-214)")
            mod_kw["dyvit_distillation"] = dyvit_distillation
        mod_kw.update(extra)
        return cls(cfg=cfg, **mod_kw), cfg

    _REGISTRY[name] = build


def _register_regnet(name, **preset):
    """Convnet teacher factories (reference `--teacher-model regnety_160`
    default, train.py:178/455-478). Accepts RegNetConfig overrides
    (depths/widths/group_width/stem_width) for tiny test configs; ViT
    dims do not apply and raise."""
    from tokenreduction_tpu.models.regnet import RegNet, RegNetConfig

    def build(num_classes=1000, img_size=224, **overrides):
        bad = set(overrides) & {"embed_dim", "depth", "num_heads",
                                "patch_size", "reduction_loc", "keep_rate"}
        if bad:
            raise ValueError(
                f"{name} is a convnet teacher; ViT options {sorted(bad)} "
                "do not apply")
        cfg_kw = dict(preset)
        cfg_kw.update(num_classes=num_classes, img_size=img_size)
        for k in ("depths", "widths"):
            if k in overrides:
                overrides[k] = tuple(overrides[k])
        cfg_kw.update(overrides)
        cfg = RegNetConfig(**cfg_kw)
        return RegNet(cfg=cfg), cfg

    _REGISTRY[name] = build


_register_regnet("regnety_160", depths=(2, 4, 11, 1),
                 widths=(224, 448, 1232, 3024), group_width=112)


for _size in ("tiny", "small", "base"):
    _register(f"deit_{_size}_patch16_224_local", "", _size,
              VisionTransformer)
    _register(f"deit_{_size}_patch16_224_local_viz", "", _size,
              VisionTransformer, capture_features=True)
    _register(f"dyvit_{_size}_patch16_224_teacher", "", _size,
              VisionTransformerTeacher)
    for _m, (_key, _cls) in _METHODS.items():
        if _cls is VisionTransformerTeacher:
            continue
        _register(f"{_m}_{_size}_patch16_224", _key, _size, _cls)


def list_models():
    return sorted(_REGISTRY)


def create_model(
    name: str,
    *,
    num_classes: int = 1000,
    img_size: int = 224,
    **kwargs,
) -> Tuple[nn.Module, ViTConfig]:
    """Build (module, cfg). kwargs carry the reference's per-method flags:
    reduction_loc, keep_rate, k_neighbors, cluster_iters, equal_weight,
    sinkhorn_eps, heuristic_pattern, min_radius, not_contiguous, viz_mode,
    drop_rate, drop_path_rate, distilled, dyvit_distillation."""
    if name not in _REGISTRY:
        raise KeyError(
            f"Unknown model {name!r}; available: {list_models()}"
        )
    # tuple-ify list-valued flags so the config stays hashable
    for key in ("reduction_loc", "keep_rate"):
        if key in kwargs and kwargs[key] is not None:
            kwargs[key] = tuple(kwargs[key])
    return _REGISTRY[name](
        num_classes=num_classes, img_size=img_size, **kwargs
    )


def model_for_config(cfg: ViTConfig, **mod_kw) -> nn.Module:
    """Rebuild the module class for a (checkpoint-stored) config."""
    mapping = {key: cls for key, cls in _METHODS.values()}
    cls = mapping.get(cfg.method, VisionTransformer)
    return cls(cfg=cfg, **mod_kw)

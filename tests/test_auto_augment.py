"""--aa grammar coverage: timm RandAugment token parsing (incl. the
inc0 quirk and the per-op prob gate), the AutoAugment 'original'/'v0'
policies, AugMix, and the loud-failure contract for unknown grammars
(reference datasets.py:84-110 passes --aa verbatim into timm
create_transform, so the full grammar is CLI surface)."""

import math

import numpy as np
import pytest
from PIL import Image, ImageOps

import jax
import jax.numpy as jnp

from tokenreduction_tpu.data import device_aug as DA
from tokenreduction_tpu.data import pipeline as P
from tokenreduction_tpu.data import transforms as T


def _img(seed=0, size=48):
    rng = np.random.default_rng(seed)
    return Image.fromarray(
        rng.integers(0, 256, (size, size, 3), dtype=np.uint8))


# --------------------------------------------------------------------------
# parse_rand_augment
# --------------------------------------------------------------------------
def test_parse_defaults_match_timm():
    # timm rand_augment_transform: m=10, n=2, mstd=0, plain ops, p=0.5
    assert T.parse_rand_augment("rand") == (2, 10.0, 0.0, False, 0.5)


def test_parse_full_token_set():
    n, m, mstd, inc, p = T.parse_rand_augment("rand-m9-n3-mstd0.5-inc1-p0.3")
    assert (n, m, mstd, inc, p) == (3, 9.0, 0.5, True, 0.3)


def test_parse_inc0_quirk():
    # timm evaluates bool("0") -> True, so inc0 selects the increasing
    # op set too; replicated deliberately
    assert T.parse_rand_augment("rand-m9-inc0")[3] is True
    assert T.parse_rand_augment("rand-m9-inc1")[3] is True
    assert T.parse_rand_augment("rand-m9")[3] is False


def test_parse_mstd_over_100_is_uniform():
    assert math.isinf(T.parse_rand_augment("rand-m9-mstd101")[2])


@pytest.mark.parametrize("bad", ["rand-m9-q5", "rand-w0", "rand-xyz"])
def test_parse_unknown_token_raises(bad):
    with pytest.raises(ValueError):
        T.parse_rand_augment(bad)


def test_rand_augment_rejects_non_rand_config():
    with pytest.raises(ValueError):
        T.rand_augment(_img(), np.random.default_rng(0), "original", 48)


# --------------------------------------------------------------------------
# level maps (identity endpoints pin the direction of each variant)
# --------------------------------------------------------------------------
def test_posterize_variant_endpoints():
    im = _img(1)
    # plain: severity decreases with magnitude; m=10 -> 4 bits
    assert T._posterize_plain(im, 10.0, None) == ImageOps.posterize(im, 4)
    # original: m=10 -> 8 bits == identity
    assert T._posterize_original(im, 10.0, None) == im
    # increasing: m=0 -> 4 bits, m=10 -> 0 bits (black, the PIL quirk)
    assert T._posterize_increasing(im, 0.0, None) == ImageOps.posterize(im, 4)
    assert np.asarray(T._posterize_increasing(im, 10.0, None)).max() == 0


def test_solarize_variant_endpoints():
    im = _img(2)
    assert T._solarize_plain(im, 10.0, None) == im        # thresh 256
    assert T._solarize_increasing(im, 0.0, None) == im    # thresh 256
    # full-strength increasing == full inversion of pixels >= 0
    assert np.array_equal(
        np.asarray(T._solarize_increasing(im, 10.0, None)),
        255 - np.asarray(im))


def test_rand_prob_zero_is_identity():
    im = _img(3)
    out = T.rand_augment(im, np.random.default_rng(0), "rand-m9-n4-p0", 48)
    assert out == im


# --------------------------------------------------------------------------
# AutoAugment policies
# --------------------------------------------------------------------------
@pytest.mark.parametrize("name", ["original", "originalr", "v0", "v0r"])
def test_policy_tables_are_well_formed(name):
    policy = T.auto_augment_policy(name)
    table = T._op_table(10)
    assert len(policy) == 25
    for sub in policy:
        assert len(sub) == 2
        for op, prob, mag in sub:
            assert op in table
            assert 0.0 <= prob <= 1.0
            assert 0 <= mag <= 10


def test_policy_r_variants_swap_posterize():
    ops = {op for sub in T.auto_augment_policy("originalr") for op, _, _ in sub}
    assert "PosterizeIncreasing" in ops and "PosterizeOriginal" not in ops
    ops_v0r = {op for sub in T.auto_augment_policy("v0r") for op, _, _ in sub}
    assert "PosterizeIncreasing" in ops_v0r and "Posterize" not in ops_v0r


def test_auto_augment_policy_unknown_raises():
    with pytest.raises(ValueError):
        T.auto_augment_policy("3a")


@pytest.mark.parametrize("cfg", ["original", "v0-mstd0.5", "originalr",
                                 "v0r", "augmix-m5-w3-d2",
                                 "rand-m9-mstd0.5-inc1"])
def test_make_aa_transform_runs_and_is_seeded(cfg):
    fn = T.make_aa_transform(cfg, 48)
    im = _img(4)
    outs = [fn(im.copy(), np.random.default_rng(7)) for _ in range(2)]
    assert outs[0].size == im.size
    assert np.array_equal(np.asarray(outs[0]), np.asarray(outs[1]))
    # over a few seeds the transform must actually do something
    changed = any(
        not np.array_equal(
            np.asarray(fn(im.copy(), np.random.default_rng(s))),
            np.asarray(im))
        for s in range(8))
    assert changed


def test_make_aa_transform_empty_is_none():
    assert T.make_aa_transform("", 48) is None


@pytest.mark.parametrize("bad", ["autoaug-original", "3a", "original-n2",
                                 "augmix-b1", "augmix-q3", "rand-z1"])
def test_make_aa_transform_unknown_raises(bad):
    with pytest.raises(ValueError):
        T.make_aa_transform(bad, 48)


def test_pipeline_rejects_bad_aa_at_construction():
    cfg = P.TransformConfig(aa="not-a-policy")
    with pytest.raises(ValueError):
        P.make_transform("imagenet", True, cfg)


def test_pipeline_runs_autoaugment_policy():
    cfg = P.TransformConfig(input_size=32, aa="v0")
    fn = P.make_transform("imagenet", True, cfg)
    out = fn(_img(5, 64), np.random.default_rng(3))
    assert out.shape == (32, 32, 3) and out.dtype == np.float32


# --------------------------------------------------------------------------
# device path
# --------------------------------------------------------------------------
def test_device_parse_rejects_non_rand():
    with pytest.raises(ValueError):
        DA.parse_ra("original")
    with pytest.raises(ValueError):
        DA.make_device_augment(DA.DeviceAugConfig(input_size=32, aa="v0"))


def test_device_ra_prob_zero_is_identity():
    imgs = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (4, 32, 32, 3)),
        jnp.float32)
    out = DA._rand_augment_batch(imgs, jax.random.PRNGKey(0), 2, 9.0,
                                 0.5, 2, inc=True, prob=0.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(imgs))


@pytest.mark.parametrize("aa", ["rand-m9-n2", "rand-m9-mstd101-inc1"])
def test_device_plain_and_uniform_magnitude_paths_run(aa):
    """Non-inc op table and the mstd=inf (uniform magnitude) sampler both
    compile and execute."""
    cfg = DA.DeviceAugConfig(input_size=32, aa=aa, ra_group_size=2)
    aug = jax.jit(DA.make_device_augment(cfg))
    batch = np.random.default_rng(1).integers(
        0, 256, (4, 40, 40, 3), dtype=np.uint8)
    out = np.asarray(aug(jax.random.PRNGKey(3), jnp.asarray(batch)))
    assert out.shape == (4, 32, 32, 3)
    assert np.isfinite(out).all()

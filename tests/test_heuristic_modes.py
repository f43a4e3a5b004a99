"""Heuristic pattern modes: contiguous threshold shrink and
not_contiguous count fitting (reference heuristic.py:157-222)."""

import numpy as np

from tokenreduction_tpu.core.config import ViTConfig
from tokenreduction_tpu.reduction.heuristic import heuristic_masks


def cfg(**kw):
    base = dict(img_size=224, patch_size=16, depth=12, embed_dim=32,
                num_heads=2, method="heuristic")
    base.update(kw)
    return ViTConfig(**base)


def test_contiguous_range_expands_and_shrinks():
    c = cfg(reduction_loc=(3, 9), keep_rate=(0.7,), min_radius=1.0)
    loc, masks, kept = heuristic_masks(c)
    # contiguous mode activates every block in [min, max]
    assert loc == list(range(3, 10))
    counts = [len(kept[i]) for i in loc]
    # radius shrinks monotonically -> kept counts non-increasing
    assert all(a >= b for a, b in zip(counts, counts[1:]))
    assert counts[-1] < 196
    # CLS always allowed
    for i in loc:
        assert masks[i][0]
        assert masks[i].shape == (197,)


def test_patterns_differ():
    kept_sets = {}
    for pattern in ("l1", "l2", "linf"):
        c = cfg(reduction_loc=(3, 9), keep_rate=(0.7,), min_radius=2.0,
                heuristic_pattern=pattern)
        _, _, kept = heuristic_masks(c)
        kept_sets[pattern] = set(kept[9].tolist())
    # thresholds are fitted per pattern (linspace from each grid's max),
    # so the kept sets differ in shape; all retain the center patch
    assert kept_sets["l1"] != kept_sets["linf"]
    center = 7 * 14 + 7
    for s in kept_sets.values():
        assert center in s


def test_not_contiguous_fits_token_counts():
    c = cfg(reduction_loc=(3, 6, 9), keep_rate=(0.7,),
            not_contiguous=True)
    loc, masks, kept = heuristic_masks(c)
    assert loc == [3, 6, 9]
    targets = [int(196 * 0.7 ** (s + 1)) for s in range(3)]
    for i, t in zip(loc, targets):
        # fitted to the closest achievable threshold count
        assert abs(len(kept[i]) - t) <= 30  # grid-quantized radii
    counts = [len(kept[i]) for i in loc]
    assert counts[0] >= counts[1] >= counts[2]

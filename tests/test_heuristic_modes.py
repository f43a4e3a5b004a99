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


def test_distance_grid_matches_torch_for_odd_patch_grid():
    """torch.linspace(-P//2, P//2, P): python parses -P//2 as (-P)//2,
    so odd P gives an ASYMMETRIC grid (P=15 -> linspace(-8, 7, 15)).
    The numpy port must replicate that exactly or every threshold mask
    diverges for odd patch grids (e.g. img 240 / patch 16)."""
    import torch

    from tokenreduction_tpu.ops.heuristic import _distance_grid

    for P in (14, 15, 7):
        xs_t = torch.linspace(-P // 2, P // 2, steps=P)
        x_t, y_t = torch.meshgrid(xs_t, xs_t, indexing="ij")
        for pattern, fn in (
                ("l1", lambda a, b: torch.abs(a) + torch.abs(b)),
                ("l2", lambda a, b: torch.sqrt(a * a + b * b)),
                ("linf", lambda a, b: torch.max(torch.abs(a),
                                                torch.abs(b)))):
            z_t = fn(x_t, y_t).numpy()
            z, p_out = _distance_grid(P * P, pattern)
            assert p_out == P
            np.testing.assert_allclose(z, z_t, atol=1e-6)

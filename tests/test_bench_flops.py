"""bench.py's analytic FLOP model (the MFU denominator) pinned against
known DeiT numbers: DeiT-S dense is 4.6 GMACs = 9.2 GFLOPs (paper /
timm's `fvcore` count), and the keep-0.7 @ (3,6,9) schedule removes
~35% of the transformer FLOPs (BASELINE.md block-FLOP ratio 0.644,
slightly higher here because the fixed patch-embed/head prefix is
included)."""

from bench import model_flops


def test_dense_deit_s_flops():
    f = model_flops("deit_small_patch16_224_local")
    assert abs(f / 1e9 - 9.2) < 0.1, f


def test_keep_rate_flop_ratios():
    fd = model_flops("deit_small_patch16_224_local")
    f7 = model_flops("topk_small_patch16_224", reduction_loc=(3, 6, 9),
                     keep_rate=(0.7,))
    f25 = model_flops("topk_small_patch16_224", reduction_loc=(3, 6, 9),
                      keep_rate=(0.25,))
    assert 0.63 < f7 / fd < 0.66, f7 / fd
    assert 0.35 < f25 / fd < 0.39, f25 / fd
    # capacity scaling: base is ~4x small at fixed depth/tokens
    fb = model_flops("deit_base_patch16_224_local")
    assert 3.5 < fb / fd < 4.2, fb / fd


def test_reduction_block_widths_used():
    """The attention term must run at the block's INPUT width and the
    MLP at the OUTPUT width: a one-stage schedule at block 0 with keep
    0.5 must cost strictly more than a hypothetical all-reduced model
    (attention at 197 in block 0) and strictly less than dense."""
    fd = model_flops("deit_small_patch16_224_local")
    f0 = model_flops("topk_small_patch16_224", reduction_loc=(0,),
                     keep_rate=(0.5,))
    assert f0 < fd
    # 11.x of 12 blocks at half width -> well under 60% of dense
    assert f0 / fd < 0.6

"""Brain-Flax `.npz` ViT loader (reference deit_viz.py:252-327).

Round-trips a fresh flax param tree through the Google Brain checkpoint
naming/layout (built by an independent inverse mapping here) and asserts
the converter restores every leaf bit-exactly — including the q/k/v
per-head split re-fusion, the `out/kernel` flatten, and the
`opt/target/` prefix autodetection."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tokenreduction_tpu.models.registry import create_model
from tokenreduction_tpu.models.convert import (
    convert_jax_npz,
    load_pretrained_deit,
)

TINY = dict(embed_dim=32, num_heads=2, depth=4, patch_size=8)


def _params_to_brain_npz(params, num_heads, prefix=""):
    """Inverse mapping: our flax tree -> Brain-Flax checkpoint dict."""
    out = {}
    p = lambda s: prefix + s  # noqa: E731
    out[p("embedding/kernel")] = np.asarray(
        params["patch_embed"]["proj"]["kernel"])
    out[p("embedding/bias")] = np.asarray(
        params["patch_embed"]["proj"]["bias"])
    out[p("cls")] = np.asarray(params["cls_token"])
    out[p("Transformer/posembed_input/pos_embedding")] = np.asarray(
        params["pos_embed"])
    out[p("Transformer/encoder_norm/scale")] = np.asarray(
        params["norm"]["scale"])
    out[p("Transformer/encoder_norm/bias")] = np.asarray(
        params["norm"]["bias"])
    out[p("head/kernel")] = np.asarray(params["head"]["kernel"])
    out[p("head/bias")] = np.asarray(params["head"]["bias"])
    i = 0
    while f"blocks_{i}" in params:
        b = params[f"blocks_{i}"]
        bp = p(f"Transformer/encoderblock_{i}/")
        mha = bp + "MultiHeadDotProductAttention_1/"
        for ln, ours in (("LayerNorm_0", "norm1"), ("LayerNorm_2", "norm2")):
            out[f"{bp}{ln}/scale"] = np.asarray(b[ours]["scale"])
            out[f"{bp}{ln}/bias"] = np.asarray(b[ours]["bias"])
        qkv_k = np.asarray(b["attn"]["qkv"]["kernel"])  # [D, 3D]
        d = qkv_k.shape[0]
        hd = d // num_heads
        # [D, 3, H, hd] split — the layout core/layers.py::split_heads reads
        split = qkv_k.reshape(d, 3, num_heads, hd)
        qkv_b = np.asarray(b["attn"]["qkv"]["bias"]).reshape(
            3, num_heads, hd)
        for j, n in enumerate(("query", "key", "value")):
            out[f"{mha}{n}/kernel"] = split[:, j]          # [D, H, hd]
            out[f"{mha}{n}/bias"] = qkv_b[j]               # [H, hd]
        out[f"{mha}out/kernel"] = np.asarray(
            b["attn"]["proj"]["kernel"]).reshape(num_heads, hd, d)
        out[f"{mha}out/bias"] = np.asarray(b["attn"]["proj"]["bias"])
        for r, fc in ((0, "fc1"), (1, "fc2")):
            out[f"{bp}MlpBlock_3/Dense_{r}/kernel"] = np.asarray(
                b["mlp"][fc]["kernel"])
            out[f"{bp}MlpBlock_3/Dense_{r}/bias"] = np.asarray(
                b["mlp"][fc]["bias"])
        i += 1
    return out


def _leaf_paths(tree, prefix=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _leaf_paths(v, prefix + (k,))
        else:
            yield prefix + (k,), v


def test_npz_roundtrip_exact(tmp_path):
    module, cfg = create_model("deit_small_patch16_224_local", num_classes=5,
                               img_size=32, **TINY)
    x = jnp.ones((1, 32, 32, 3))
    params = module.init({"params": jax.random.PRNGKey(0)}, x,
                         train=False)["params"]
    npz = _params_to_brain_npz(params, cfg.num_heads, prefix="opt/target/")
    # optimizer-state keys must be reported skipped, not crash the parse
    npz["opt/state/step"] = np.zeros((), np.int32)
    fname = tmp_path / "vit.npz"
    np.savez(str(fname), **npz)

    merged, report = load_pretrained_deit(params, cfg,
                                          checkpoint_path=str(fname))
    assert not report["shape_mismatch"] and not report["missing_in_ckpt"]
    for path, leaf in _leaf_paths(params):
        node = merged
        for k in path:
            node = node[k]
        np.testing.assert_array_equal(
            np.asarray(node), np.asarray(leaf),
            err_msg=".".join(path))

    tree, skipped = convert_jax_npz(
        {k: np.asarray(v) for k, v in npz.items()})
    assert skipped == ["opt/state/step"]


def test_npz_qkv_fusion_order():
    """q/k/v concat order must match split_heads' (3, H, hd) read."""
    D, H = 4, 2
    hd = D // H
    state = {
        "embedding/kernel": np.zeros((2, 2, 3, D), np.float32),
        "embedding/bias": np.zeros((D,), np.float32),
        "cls": np.zeros((1, 1, D), np.float32),
        "Transformer/posembed_input/pos_embedding":
            np.zeros((1, 5, D), np.float32),
        "Transformer/encoder_norm/scale": np.ones((D,), np.float32),
        "Transformer/encoder_norm/bias": np.zeros((D,), np.float32),
        "Transformer/encoderblock_0/LayerNorm_0/scale":
            np.ones((D,), np.float32),
        "Transformer/encoderblock_0/LayerNorm_0/bias":
            np.zeros((D,), np.float32),
        "Transformer/encoderblock_0/LayerNorm_2/scale":
            np.ones((D,), np.float32),
        "Transformer/encoderblock_0/LayerNorm_2/bias":
            np.zeros((D,), np.float32),
    }
    mha = "Transformer/encoderblock_0/MultiHeadDotProductAttention_1/"
    for j, n in enumerate(("query", "key", "value")):
        state[f"{mha}{n}/kernel"] = np.full((D, H, hd), j, np.float32)
        state[f"{mha}{n}/bias"] = np.full((H, hd), 10 + j, np.float32)
    state[f"{mha}out/kernel"] = (
        np.arange(D * D, dtype=np.float32).reshape(H, hd, D))
    state[f"{mha}out/bias"] = np.zeros((D,), np.float32)
    for r in (0, 1):
        state[f"Transformer/encoderblock_0/MlpBlock_3/Dense_{r}/kernel"] = (
            np.zeros((D, D), np.float32))
        state[f"Transformer/encoderblock_0/MlpBlock_3/Dense_{r}/bias"] = (
            np.zeros((D,), np.float32))

    tree, _ = convert_jax_npz(state)
    qkv_k = tree["blocks_0"]["attn"]["qkv"]["kernel"]
    assert qkv_k.shape == (D, 3 * D)
    # column blocks are all-q, all-k, all-v in (3, H, hd) order
    np.testing.assert_array_equal(
        qkv_k.reshape(D, 3, H, hd)[:, 0], np.zeros((D, H, hd)))
    np.testing.assert_array_equal(
        qkv_k.reshape(D, 3, H, hd)[:, 2], np.full((D, H, hd), 2.0))
    qkv_b = tree["blocks_0"]["attn"]["qkv"]["bias"]
    np.testing.assert_array_equal(
        qkv_b.reshape(3, H, hd)[1], np.full((H, hd), 11.0))
    np.testing.assert_array_equal(
        tree["blocks_0"]["attn"]["proj"]["kernel"],
        np.arange(D * D, dtype=np.float32).reshape(D, D))


def test_finetune_npz_cli(tmp_path, capsys):
    """--finetune with a Brain-Flax .npz dispatches to the npz loader
    (train/loop.py finetune branch), including pos-embed grid resize
    (source 4x4 grid -> target 8x8)."""
    module, cfg = create_model("deit_small_patch16_224_local",
                               num_classes=5, img_size=32, **TINY)
    x = jnp.ones((1, 32, 32, 3))
    params = module.init({"params": jax.random.PRNGKey(1)}, x,
                         train=False)["params"]
    npz = _params_to_brain_npz(params, cfg.num_heads)
    fname = tmp_path / "src.npz"
    np.savez(str(fname), **npz)

    from tokenreduction_tpu.train.train_cli import main
    out = str(tmp_path / "run")
    main([
        "--model", "topk_tiny_patch16_224", "--dataset", "synthetic",
        "--synthetic-n", "16", "--synthetic-classes", "5",
        "--embed-dim", "32", "--num-heads", "2", "--depth", "4",
        "--patch-size", "8", "--input-size", "64", "--batch-size", "8",
        "--epochs", "1", "--reduction_loc", "2", "--keep_rate", "0.7",
        "--warmup-epochs", "0", "--no-repeated-aug",
        "--finetune", str(fname), "--output_dir", out,
    ])
    stdout = capsys.readouterr().out
    line = [l for l in stdout.splitlines() if "finetune load:" in l]
    assert line, stdout[-2000:]
    loaded = int(line[0].split("finetune load:")[1].split()[0])
    assert loaded > 30, line  # blocks + embed + norms all merged


def test_npz_rejects_non_vit():
    with pytest.raises(ValueError, match="encoderblock"):
        convert_jax_npz({
            "embedding/kernel": np.zeros((2, 2, 3, 4), np.float32),
            "embedding/bias": np.zeros((4,), np.float32),
            "cls": np.zeros((1, 1, 4), np.float32),
            "Transformer/posembed_input/pos_embedding":
                np.zeros((1, 5, 4), np.float32),
            "Transformer/encoder_norm/scale": np.ones((4,), np.float32),
            "Transformer/encoder_norm/bias": np.zeros((4,), np.float32),
        })

"""Torch (timm/DeiT) state-dict -> Flax param tree conversion.

Replaces the reference's `load_state_dict(..., strict=False)` pretrained
bootstrap (models_act.py:54-60): DeiT .pth checkpoints (or any timm ViT
state dict) convert into our param naming. Works from a plain
{name: numpy array} mapping, so torch is only needed to *read* .pth files.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _set(tree: dict, path: Tuple[str, ...], value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def torch_name_to_flax_path(name: str):
    """Map a timm VisionTransformer param name to (flax path, transform).

    transform: "linear" (transpose), "conv" (OIHW->HWIO), or None.
    Returns None for names we do not load (e.g. running stats)."""
    parts = name.split(".")
    if name in ("cls_token", "pos_embed", "dist_token"):
        return (name,), None
    if parts[0] == "patch_embed" and parts[1] == "proj":
        kind = "conv" if parts[2] == "weight" else None
        leaf = "kernel" if parts[2] == "weight" else "bias"
        return ("patch_embed", "proj", leaf), kind
    if parts[0] == "blocks":
        i = parts[1]
        rest = parts[2:]
        base = (f"blocks_{i}",)
        if rest[0] in ("norm1", "norm2"):
            leaf = "scale" if rest[1] == "weight" else "bias"
            return base + (rest[0], leaf), None
        if rest[0] == "attn":
            leaf = "kernel" if rest[2] == "weight" else "bias"
            kind = "linear" if rest[2] == "weight" else None
            return base + ("attn", rest[1], leaf), kind
        if rest[0] == "mlp":
            leaf = "kernel" if rest[2] == "weight" else "bias"
            kind = "linear" if rest[2] == "weight" else None
            return base + ("mlp", rest[1], leaf), kind
        return None
    if parts[0] == "norm":
        leaf = "scale" if parts[1] == "weight" else "bias"
        return ("norm", leaf), None
    if parts[0] in ("head", "head_dist"):
        leaf = "kernel" if parts[1] == "weight" else "bias"
        kind = "linear" if parts[1] == "weight" else None
        return (parts[0], leaf), kind
    if parts[0] == "pre_logits":
        return None  # representation head unused (Identity in DeiT)
    return None


def convert_torch_state_dict(
    state: Dict[str, np.ndarray]
) -> Tuple[dict, list]:
    """Convert {torch name: array} -> nested flax params subtree.

    Returns (tree, skipped_names)."""
    tree: dict = {}
    skipped = []
    for name, arr in state.items():
        mapped = torch_name_to_flax_path(name)
        if mapped is None:
            skipped.append(name)
            continue
        path, kind = mapped
        arr = np.asarray(arr)
        if kind == "linear":
            arr = arr.T
        elif kind == "conv":
            arr = arr.transpose(2, 3, 1, 0)
        _set(tree, path, arr)
    return tree, skipped


def regnet_name_to_flax_path(name: str):
    """Map a timm RegNet param name to (flax path, transform).

    The released regnety_160 teacher checkpoints (DeiT's
    regnety_160-a5fe301d.pth, reference train.py:455-478 via
    `--teacher-path`) use stem.conv / s{i}.b{j}.{conv1,conv2,se,conv3,
    downsample} / head.fc naming; models/regnet.py mirrors it with
    s{i}_b{j} flattened module names."""
    if name.endswith("num_batches_tracked"):
        return None
    parts = name.split(".")
    bn_leaf = {"weight": "scale", "bias": "bias",
               "running_mean": "mean", "running_var": "var"}
    if parts[0] == "stem":
        if parts[1] == "conv":
            return ("stem", "conv", "kernel"), "conv"
        return ("stem", "bn", bn_leaf[parts[2]]), None
    if parts[0] == "head":
        kind = "linear" if parts[2] == "weight" else None
        leaf = "kernel" if parts[2] == "weight" else "bias"
        return ("head_fc", leaf), kind
    if parts[0].startswith("s") and parts[1].startswith("b"):
        base = (f"{parts[0]}_{parts[1]}",)
        sub = parts[2]
        if sub in ("conv1", "conv2", "conv3", "downsample"):
            if parts[3] == "conv":
                return base + (sub, "conv", "kernel"), "conv"
            return base + (sub, "bn", bn_leaf[parts[4]]), None
        if sub == "se":
            leaf = "kernel" if parts[4] == "weight" else "bias"
            kind = "conv" if parts[4] == "weight" else None
            return base + ("se", parts[3], leaf), kind
    return None


def convert_regnet_state_dict(
    state: Dict[str, np.ndarray]
) -> Tuple[dict, list]:
    """Convert a timm RegNet {torch name: array} -> flax params subtree
    for models/regnet.py. Returns (tree, skipped_names)."""
    tree: dict = {}
    skipped = []
    for name, arr in state.items():
        mapped = regnet_name_to_flax_path(name)
        if mapped is None:
            skipped.append(name)
            continue
        path, kind = mapped
        arr = np.asarray(arr)
        if kind == "linear":
            arr = arr.T
        elif kind == "conv":
            arr = arr.transpose(2, 3, 1, 0)
        _set(tree, path, arr)
    return tree, skipped


def merge_pretrained(params: dict, pretrained: dict, strict: bool = False):
    """strict=False state-dict merge: copy matching-shape leaves of
    `pretrained` into (a copy of) `params`; everything else keeps its fresh
    init (mirrors reference models_act.py:96). Returns (params, report)."""
    import jax

    report = {"loaded": [], "shape_mismatch": [], "missing_in_ckpt": []}

    def walk(dst, src, prefix=()):
        out = {}
        for k, v in dst.items():
            if isinstance(v, dict):
                out[k] = walk(v, src.get(k, {}), prefix + (k,))
            else:
                if k in src and not isinstance(src[k], dict):
                    sv = np.asarray(src[k])
                    if tuple(sv.shape) == tuple(v.shape):
                        out[k] = jax.numpy.asarray(sv, dtype=v.dtype)
                        report["loaded"].append(".".join(prefix + (k,)))
                        continue
                    report["shape_mismatch"].append(".".join(prefix + (k,)))
                else:
                    report["missing_in_ckpt"].append(".".join(prefix + (k,)))
                out[k] = v
        return out

    merged = walk(params, pretrained)
    if strict and (report["shape_mismatch"] or report["missing_in_ckpt"]):
        raise ValueError(f"strict load failed: {report}")
    return merged, report


def resize_pos_embed(pos_embed: np.ndarray, new_tokens: int,
                     num_prefix: int = 1) -> np.ndarray:
    """Bicubic grid interpolation of position embeddings for a different
    input resolution (reference train.py:336-370 / deit_viz.py:330-349)."""
    from PIL import Image

    pe = np.asarray(pos_embed)
    prefix = pe[:, :num_prefix]
    grid = pe[0, num_prefix:]
    old_n = grid.shape[0]
    new_n = new_tokens
    if old_n == new_n:
        return pe
    old_s = int(round(old_n ** 0.5))
    new_s = int(round(new_n ** 0.5))
    d = grid.shape[-1]
    out = np.zeros((new_s * new_s, d), dtype=np.float32)
    img = grid.reshape(old_s, old_s, d).astype(np.float32)
    # channel-wise bicubic resize via PIL (F mode)
    for c in range(d):
        ch = Image.fromarray(img[..., c], mode="F")
        ch = ch.resize((new_s, new_s), Image.BICUBIC)
        out[:, c] = np.asarray(ch, dtype=np.float32).reshape(-1)
    return np.concatenate(
        [prefix, out[None]], axis=1).astype(pe.dtype)


def load_torch_checkpoint(path: str):
    """Read a .pth file into {name: numpy}. Uses torch-cpu only for IO."""
    import torch

    ckpt = torch.load(path, map_location="cpu")
    if isinstance(ckpt, dict) and "model" in ckpt:
        ckpt = ckpt["model"]
    return {k: v.numpy() for k, v in ckpt.items()}


def load_jax_npz_state(path: str) -> Dict[str, np.ndarray]:
    """Read a Google Brain Flax ViT `.npz` checkpoint into {name: numpy}."""
    with np.load(path) as w:
        return {k: np.asarray(w[k]) for k in w.files}


def convert_jax_npz(state: Dict[str, np.ndarray]) -> Tuple[dict, list]:
    """Convert a Google Brain Flax ViT `.npz` checkpoint mapping into our
    flax param subtree.

    Covers the reference's timm-inherited JAX loader
    (deit_viz.py:252-327 `_load_weights`) for the plain-ViT case it is
    reachable with there (DeiT has no hybrid backbone or pre_logits head).
    Brain-Flax layouts are already flax-native for us — conv kernels HWIO,
    dense kernels [in, out] — so unlike `_load_weights` no transposes are
    needed; only the per-head q/k/v split [D, H, hd] is re-fused into our
    single [D, 3D] qkv kernel (the (3, H, hd) factorization matches
    core/layers.py::split_heads) and `out/kernel` [H, hd, D] flattens to
    the [D, D] proj kernel. Returns (tree, skipped_names)."""
    prefix = "opt/target/" if "opt/target/embedding/kernel" in state else ""

    def squash(a: np.ndarray) -> np.ndarray:
        # 1x1x1xN "conv" biases in some Brain checkpoints (deit_viz.py:257)
        if a.ndim == 4 and a.shape[0] == a.shape[1] == a.shape[2] == 1:
            return a.reshape(-1)
        return a

    used = set()

    def get(name: str) -> np.ndarray:
        used.add(prefix + name)
        return squash(np.asarray(state[prefix + name]))

    def has(name: str) -> bool:
        return prefix + name in state

    tree: dict = {}
    _set(tree, ("patch_embed", "proj", "kernel"), get("embedding/kernel"))
    _set(tree, ("patch_embed", "proj", "bias"), get("embedding/bias"))
    _set(tree, ("cls_token",), get("cls"))
    _set(tree, ("pos_embed",),
         get("Transformer/posembed_input/pos_embedding"))
    _set(tree, ("norm", "scale"), get("Transformer/encoder_norm/scale"))
    _set(tree, ("norm", "bias"), get("Transformer/encoder_norm/bias"))
    if has("head/kernel"):
        # wrong-class-count heads are dropped at merge time (strict=False),
        # mirroring the reference's bias-shape check (deit_viz.py:310-312)
        _set(tree, ("head", "kernel"), get("head/kernel"))
        _set(tree, ("head", "bias"), get("head/bias"))

    i = 0
    while has(f"Transformer/encoderblock_{i}/LayerNorm_0/scale"):
        bp = f"Transformer/encoderblock_{i}/"
        mha = bp + "MultiHeadDotProductAttention_1/"
        base = (f"blocks_{i}",)
        for ln, ours in (("LayerNorm_0", "norm1"), ("LayerNorm_2", "norm2")):
            _set(tree, base + (ours, "scale"), get(f"{bp}{ln}/scale"))
            _set(tree, base + (ours, "bias"), get(f"{bp}{ln}/bias"))
        d = state[prefix + f"{mha}query/kernel"].shape[0]
        _set(tree, base + ("attn", "qkv", "kernel"), np.concatenate(
            [get(f"{mha}{n}/kernel").reshape(d, -1)
             for n in ("query", "key", "value")], axis=1))
        _set(tree, base + ("attn", "qkv", "bias"), np.concatenate(
            [get(f"{mha}{n}/bias").reshape(-1)
             for n in ("query", "key", "value")]))
        _set(tree, base + ("attn", "proj", "kernel"),
             get(f"{mha}out/kernel").reshape(-1, d))
        _set(tree, base + ("attn", "proj", "bias"), get(f"{mha}out/bias"))
        for r, fc in ((0, "fc1"), (1, "fc2")):
            _set(tree, base + ("mlp", fc, "kernel"),
                 get(f"{bp}MlpBlock_3/Dense_{r}/kernel"))
            _set(tree, base + ("mlp", fc, "bias"),
                 get(f"{bp}MlpBlock_3/Dense_{r}/bias"))
        i += 1
    if i == 0:
        raise ValueError(
            "no Transformer/encoderblock_* entries — not a Brain-Flax ViT "
            "checkpoint (hybrid-backbone .npz files are not supported)")

    skipped = sorted(set(state) - used)
    return tree, skipped


# -------------------------------------------------------- pretrained fetch
# DeiT release checkpoints (reference models_act.py:54-60); every registry
# factory's pretrained=True bootstraps from these with strict=False.
DEIT_URLS = {
    "deit_tiny_patch16_224":
        "https://dl.fbaipublicfiles.com/deit/"
        "deit_tiny_patch16_224-a1311bcf.pth",
    "deit_tiny_distilled_patch16_224":
        "https://dl.fbaipublicfiles.com/deit/"
        "deit_tiny_distilled_patch16_224-b40b3cf7.pth",
    "deit_small_patch16_224":
        "https://dl.fbaipublicfiles.com/deit/"
        "deit_small_patch16_224-cd65a155.pth",
    "deit_small_distilled_patch16_224":
        "https://dl.fbaipublicfiles.com/deit/"
        "deit_small_distilled_patch16_224-649709d9.pth",
    "deit_base_patch16_224":
        "https://dl.fbaipublicfiles.com/deit/"
        "deit_base_patch16_224-b5f2ef4d.pth",
    "deit_base_distilled_patch16_224":
        "https://dl.fbaipublicfiles.com/deit/"
        "deit_base_distilled_patch16_224-df68dfff.pth",
}

_EMBED_TO_SIZE = {192: "tiny", 384: "small", 768: "base"}


def deit_checkpoint_key(embed_dim: int, distilled: bool) -> str:
    size = _EMBED_TO_SIZE.get(embed_dim)
    if size is None:
        raise ValueError(
            f"no DeiT release checkpoint for embed_dim={embed_dim}")
    return (f"deit_{size}_distilled_patch16_224" if distilled
            else f"deit_{size}_patch16_224")


def fetch_checkpoint_url(url: str, cache_dir: str = None) -> str:
    """Return a local path for a checkpoint URL, downloading into the
    cache on first use (reference torch.hub.load_state_dict_from_url).
    Offline boxes can pre-place the file in the cache dir
    (TOKENREDUCTION_WEIGHTS_DIR or ~/.cache/tokenreduction_tpu)."""
    import os
    import urllib.request

    cache_dir = cache_dir or os.environ.get(
        "TOKENREDUCTION_WEIGHTS_DIR",
        os.path.expanduser("~/.cache/tokenreduction_tpu"))
    os.makedirs(cache_dir, exist_ok=True)
    fname = os.path.join(cache_dir, url.rsplit("/", 1)[-1])
    if os.path.exists(fname):
        return fname
    tmp = fname + ".part"
    try:
        urllib.request.urlretrieve(url, tmp)
        os.replace(tmp, fname)
    except Exception as e:
        if os.path.exists(tmp):
            os.remove(tmp)
        raise RuntimeError(
            f"could not download {url}: {e}. On an offline machine, place "
            f"the file at {fname} (or set TOKENREDUCTION_WEIGHTS_DIR)."
        ) from e
    return fname


def fetch_deit_checkpoint(key: str, cache_dir: str = None) -> str:
    """Return a local path to the DeiT release .pth for a registry key
    (reference models_act.py:89-92), via the shared cached fetch."""
    return fetch_checkpoint_url(DEIT_URLS[key], cache_dir)


def load_pretrained_deit(params: dict, cfg, cache_dir: str = None,
                         checkpoint_path: str = None):
    """pretrained=True semantics of the reference factories
    (models_act.py:88-96): fetch the DeiT weights matching cfg's capacity
    (distilled variant when cfg.distilled), convert, resize pos_embed for
    non-224 inputs, and merge strict=False so method-specific modules and
    differently-shaped heads keep their fresh init.

    A `.npz` checkpoint_path takes the Brain-Flax loader path instead
    (reference deit_viz.py:252-327 via timm load_custom_pretrained).

    Returns (merged params, report)."""
    if checkpoint_path is None:
        key = deit_checkpoint_key(cfg.embed_dim, cfg.distilled)
        checkpoint_path = fetch_deit_checkpoint(key, cache_dir)
    if checkpoint_path.endswith(".npz"):
        tree, _ = convert_jax_npz(load_jax_npz_state(checkpoint_path))
    else:
        state = load_torch_checkpoint(checkpoint_path)
        tree, _ = convert_torch_state_dict(state)
    if "pos_embed" in tree and "pos_embed" in params:
        want = params["pos_embed"].shape[1]
        have = tree["pos_embed"].shape[1]
        if want != have:
            prefix = getattr(cfg, "num_prefix_tokens", 1)
            tree["pos_embed"] = resize_pos_embed(
                tree["pos_embed"], want - prefix, num_prefix=prefix)
    return merge_pretrained(params, tree, strict=False)

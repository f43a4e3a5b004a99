"""CLS-feature extraction at fixed blocks (reference
extract_cls_features.py): stacks the CLS token of the viz features at
blocks {3, 6, 9, 11} across the val set and writes one transposed
(D, n_images) .npy per block.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from tokenreduction_tpu.data import (
    Loader,
    ShardedSampler,
    TransformConfig,
    build_dataset,
    make_transform,
)
from tokenreduction_tpu.evaluation.validate import (
    add_eval_compat_args,
    check_eval_compat_args,
)
from tokenreduction_tpu.models.registry import model_for_config
from tokenreduction_tpu.utils.checkpoint import (
    config_from_meta,
    load_checkpoint,
)

EXTRACT_BLOCKS = (3, 6, 9, 11)


def get_parser():
    p = argparse.ArgumentParser("TPU CLS feature extraction")
    p.add_argument("--data", type=str, default="")
    p.add_argument("--dataset", "-d", default="imagenet")
    p.add_argument("--checkpoint", default="", type=str)
    p.add_argument("-b", "--batch-size", default=64, type=int)
    p.add_argument("--input-size", default=224, type=int)
    p.add_argument("--output_dir", default="")
    p.add_argument("--feature_output_name", default="cls_features")
    p.add_argument("--split", default="val",
                   help="dataset split; for --dataset cached also the "
                        "cache subdir (the reference flag exists but is "
                        "hardcoded to val, extract_cls_features.py:57)")
    p.add_argument("--use_amp", action="store_true",
                   help="bf16 extraction forward; default is the "
                        "bit-stable fp32 XLA composition")
    p.add_argument("--synthetic-n", default=64, type=int)
    p.add_argument("--platform", default="", type=str)
    p.add_argument("--viz_mode", action="store_true",
                   help="no-op: extraction always runs the viz forward "
                        "(reference compat, extract_cls_features.py:28)")
    add_eval_compat_args(p)
    return p


def extract(args):
    ckpt_dir = args.checkpoint
    if os.path.isdir(os.path.join(ckpt_dir, "best_checkpoint")):
        ckpt_dir = os.path.join(ckpt_dir, "best_checkpoint")
    tree, meta = load_checkpoint(ckpt_dir)
    model_cfg = config_from_meta(meta).replace(viz_mode=True)

    # dense deit models swap to the feature-capturing viz variant
    # (reference extract_cls_features.py:74-75)
    mod_kw = {}
    if model_cfg.method == "":
        mod_kw["capture_features"] = True
    module = model_for_config(model_cfg, **mod_kw)
    params = tree["ema_params"] if meta.get("ema_best") and \
        tree.get("ema_params") is not None else tree["params"]
    params = jax.tree_util.tree_map(jnp.asarray, params)

    if getattr(args, "use_amp", False):
        params = jax.tree_util.tree_map(
            lambda p: p.astype(jnp.bfloat16)
            if jnp.issubdtype(p.dtype, jnp.floating) else p, params)

    ds, _ = build_dataset(
        args.data, args.dataset, getattr(args, "split", "val"),
        num_classes=model_cfg.num_classes,
        img_size=args.input_size, synthetic_n=args.synthetic_n)
    tcfg = TransformConfig(input_size=args.input_size)
    loader = Loader(ds, ShardedSampler(len(ds), 1, 0, shuffle=False),
                    args.batch_size, make_transform(args.dataset, False,
                                                    tcfg),
                    num_workers=getattr(args, "num_workers", 0))

    @jax.jit
    def fwd(params, images):
        if getattr(args, "use_amp", False):
            images = images.astype(jnp.bfloat16)
        return module.apply({"params": params}, images, train=False)

    feats = {b: [] for b in EXTRACT_BLOCKS}
    for batch in loader:
        valid = batch.pop("valid", len(batch["image"]))
        _, viz = fwd(params, jnp.asarray(batch["image"]))
        features = viz["Features"]
        for b in EXTRACT_BLOCKS:
            blk = features.get(b)
            if blk is None:  # features recorded only at reduction blocks
                blk = features[max(features.keys())]
            feats[b].append(
                np.asarray(blk[:valid, 0].astype(jnp.float32)))
    out = {}
    for b in EXTRACT_BLOCKS:
        mat = np.vstack(feats[b]).T  # (D, n_images)
        out[b] = mat
        if args.output_dir:
            os.makedirs(args.output_dir, exist_ok=True)
            np.save(os.path.join(
                args.output_dir,
                f"{args.feature_output_name}_{b}.npy"), mat)
    return out


def main(argv=None):
    args = get_parser().parse_args(argv)
    check_eval_compat_args(args)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from tokenreduction_tpu.utils.compile_cache import (
        enable_persistent_compile_cache,
    )

    enable_persistent_compile_cache()
    # bit-stable extraction (see validate.py main): XLA composition via
    # force_xla + full fp32 matmuls so TPU features match CPU exactly;
    # --use_amp opts out into the bf16 serving configuration
    if not args.use_amp:
        jax.config.update("jax_default_matmul_precision", "highest")
    return extract(args)


if __name__ == "__main__":
    main()

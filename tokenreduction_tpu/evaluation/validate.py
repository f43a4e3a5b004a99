"""Validation + reduction-pattern extraction (reference validate.py).

Writes the per-image viz JSON the offline analysis suite consumes; the
schema and the local->absolute token-id chaining are byte-compatible with
reference validate.py:199-229 so `analysis/` scripts run unchanged.
"""

from __future__ import annotations

import argparse
import json
import os
from json import JSONEncoder

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
from tokenreduction_tpu.models.registry import model_for_config
from tokenreduction_tpu.utils.checkpoint import (
    config_from_meta,
    load_checkpoint,
)
from tokenreduction_tpu.utils.metrics import mAP


class NumpyArrayEncoder(JSONEncoder):
    def default(self, obj):
        if isinstance(obj, np.ndarray):
            return obj.tolist()
        if isinstance(obj, (np.integer,)):
            return int(obj)
        if isinstance(obj, (np.floating,)):
            return float(obj)
        return JSONEncoder.default(self, obj)


def get_parser():
    p = argparse.ArgumentParser("TPU validation")
    p.add_argument("--data", type=str, default="")
    p.add_argument("--dataset", "-d", default="imagenet",
                   choices=["imagenet", "nabirds", "coco", "nuswide",
                            "cached", "synthetic",
                            "synthetic_multilabel"])
    p.add_argument("--split", default="val",
                   help="dataset split; for --dataset cached also the "
                        "cache subdirectory (falls back to --data root)")
    p.add_argument("--checkpoint", default="", type=str,
                   help="dir containing best_checkpoint")
    p.add_argument("-b", "--batch-size", default=64, type=int)
    p.add_argument("--input-size", default=224, type=int)
    p.add_argument("--output_dir", default="")
    p.add_argument("--viz_mode", action="store_true")
    p.add_argument("--viz_output_name", default="viz_results.json")
    p.add_argument("--use_amp", action="store_true")
    p.add_argument("--synthetic-n", default=64, type=int)
    p.add_argument("--platform", default="", type=str)
    p.add_argument("--synthetic-classes", default=10, type=int)
    add_eval_compat_args(p)
    return p


def add_eval_compat_args(p):
    """Reference eval-CLI flags (validate.py:18-33). -j/--num_workers is
    wired for real (Loader's fork process pool); --pin-mem/--device are
    CUDA DataLoader / torch plumbing with no TPU meaning, accepted so
    verbatim reference commands parse -- but never silently (a notice
    prints, mirroring the train CLI's compat flags)."""
    p.add_argument("-j", "--num_workers", dest="num_workers",
                   default=0, type=int,
                   help="host decode worker processes (0 = prefetch "
                        "thread; reference default 4)")
    p.add_argument("--pin-mem", action="store_true", default=None,
                   dest="pin_mem",
                   help="no-op (reference compat; warns if set)")
    p.add_argument("--no-pin-mem", action="store_false", dest="pin_mem",
                   help="no-op (reference compat)")
    p.add_argument("--device", default=None,
                   help="no-op (reference compat; use --platform)")


def check_eval_compat_args(args):
    if getattr(args, "pin_mem", None) is not None:
        print("NOTE: --pin-mem/--no-pin-mem is a CUDA DataLoader knob "
              "with no TPU meaning; ignored")
    if getattr(args, "device", None) is not None:
        print("NOTE: --device is ignored; the JAX platform is "
              "auto-detected (use --platform to override)")


def add_dirs_driver_args(p):
    """Flags shared by the two batch drivers (validate_dirs /
    extract_cls_features_dirs), mirroring the reference drivers' common
    surface (validate_dirs.py:16-33 == extract_cls_features_dirs.py).
    Kept in one place so a wording/behavior fix cannot drift between
    the two."""
    p.add_argument("--dataset_csv", "--csv", dest="csv", required=True)
    p.add_argument("--parent_dir", default=".")
    p.add_argument("--data", default="")
    p.add_argument("--dataset", "-d", default="imagenet")
    p.add_argument("-b", "--batch-size", default=64, type=int)
    p.add_argument("--input-size", default=224, type=int)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--overwrite_existing", action="store_true")
    p.add_argument("--use_amp", action="store_true")
    p.add_argument("--synthetic-n", default=64, type=int)
    p.add_argument("--platform", default="", type=str,
                   help="forwarded to the per-run CLI (e.g. cpu)")
    p.add_argument("--checkpoint", default=None,
                   help="no-op: the checkpoint path comes from each CSV "
                        "row (reference compat, validate_dirs.py:18)")
    add_eval_compat_args(p)


def check_dirs_driver_args(args):
    check_eval_compat_args(args)
    if args.checkpoint:
        print("NOTE: --checkpoint is ignored; run dirs come from the "
              "CSV's output_dir/Name columns")


def count_params(tree) -> int:
    return sum(int(np.prod(x.shape))
               for x in jax.tree_util.tree_leaves(tree))


def chain_stage_tokens(model_name, reduction_count, viz_np, img_i,
                       data_dict):
    """Per-image Stage-{i} dicts with local->absolute id chaining
    (reference validate.py:205-229)."""
    viz_keys = list(viz_np.keys())
    kept_tokens = "Kept_Tokens" in viz_keys
    kept_tokens_abs = "Kept_Tokens_Abs" in viz_keys
    assign_maps = "Assignment_Maps" in viz_keys
    prev_stage_name = None
    for stage_idx, stage in enumerate(reduction_count):
        stage_name = f"Stage-{stage}"
        data_dict[stage_name] = {}
        if kept_tokens:
            if stage_idx == 0:
                data_dict[stage_name]["Kept_Token"] = \
                    viz_np["Kept_Tokens"][stage][img_i]
            else:
                rel_idx = viz_np["Kept_Tokens"][stage][img_i]
                if "evit" not in model_name:
                    rel_idx = rel_idx[rel_idx >= 0]
                data_dict[stage_name]["Kept_Token"] = \
                    data_dict[prev_stage_name]["Kept_Token"][rel_idx]
        if kept_tokens_abs:
            data_dict[stage_name]["Kept_Token"] = \
                viz_np["Kept_Tokens_Abs"][stage][img_i]
        if assign_maps:
            data_dict[stage_name]["Assignment_Maps"] = \
                viz_np["Assignment_Maps"][stage][img_i]
        prev_stage_name = stage_name
    return data_dict


def validate(args):
    assert args.checkpoint, "Empty checkpoint path, not usable"
    ckpt_dir = args.checkpoint
    if os.path.isdir(os.path.join(ckpt_dir, "best_checkpoint")):
        ckpt_dir = os.path.join(ckpt_dir, "best_checkpoint")
    tree, meta = load_checkpoint(ckpt_dir)
    model_cfg = config_from_meta(meta).replace(viz_mode=args.viz_mode)
    run_args = meta.get("run_args") or {}

    module = model_for_config(model_cfg)
    params = tree["ema_params"] if meta.get("ema_best") and \
        tree.get("ema_params") is not None else tree["params"]
    params = jax.tree_util.tree_map(jnp.asarray, params)
    use_amp = getattr(args, "use_amp", False)
    if use_amp:
        # reference validate.py:36-37 amp autocast -> the TPU serving
        # configuration: bf16 params + inputs (viz extraction should
        # stay at the fp32 default for bit-stable artifacts)
        params = jax.tree_util.tree_map(
            lambda p: p.astype(jnp.bfloat16)
            if jnp.issubdtype(p.dtype, jnp.floating) else p, params)

    ds, num_classes = build_dataset(
        args.data, args.dataset, args.split,
        num_classes=model_cfg.num_classes, img_size=args.input_size,
        synthetic_n=args.synthetic_n)
    multilabel = getattr(ds, "multilabel", False)
    tcfg = TransformConfig(input_size=args.input_size)
    loader = Loader(ds, ShardedSampler(len(ds), 1, 0, shuffle=False),
                    args.batch_size, make_transform(args.dataset, False,
                                                    tcfg),
                    num_workers=getattr(args, "num_workers", 0))

    @jax.jit
    def fwd(params, images):
        if use_amp:
            images = images.astype(jnp.bfloat16)
        out = module.apply({"params": params}, images, train=False)
        if use_amp:  # metrics/viz math downstream expects f32
            out = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.float32)
                if jnp.issubdtype(a.dtype, jnp.bfloat16) else a, out)
        return out

    param_count = count_params(params)
    model_name = meta["model_cfg"].get("method") or "deit"
    full_model_name = run_args.get("model", model_name)
    model_data_dict = {
        "Model": full_model_name,
        "Ratio": list(model_cfg.keep_rate),
        "Location": list(model_cfg.reduction_loc),
    }
    reduction_count = (
        list(module.active_loc) if hasattr(module, "active_loc")
        else list(model_cfg.reduction_loc))
    # heuristic contiguous mode expands the loc range only after setup;
    # rebuild from config the same way the model does
    if model_cfg.method == "heuristic" and not model_cfg.not_contiguous:
        reduction_count = list(range(min(model_cfg.reduction_loc),
                                     max(model_cfg.reduction_loc) + 1))

    top1 = top5 = seen = 0
    loss_total = 0.0
    preds_all, targs_all = [], []
    img_count = 0
    for batch in loader:
        valid = batch.pop("valid", len(batch["image"]))
        images = jnp.asarray(batch["image"])
        out = fwd(params, images)
        viz_np = None
        if args.viz_mode:
            out, viz_data = out
            viz_np = {
                k: {blk: np.asarray(v) for blk, v in d.items()}
                for k, d in viz_data.items()
            }
        logits = np.asarray(out, dtype=np.float32)[:valid]
        target = batch["label"][:valid]

        if multilabel:
            if target.ndim == 3:
                target = target.max(axis=1)
            probs = 1.0 / (1.0 + np.exp(-logits))
            preds_all.append(probs)
            targs_all.append(target)
            loss = float(np.mean(
                np.maximum(logits, 0) - logits * target
                + np.log1p(np.exp(-np.abs(logits)))))
            pred_out = probs
        else:
            logp = logits - logits.max(-1, keepdims=True)
            logp = logp - np.log(np.exp(logp).sum(-1, keepdims=True))
            loss = float(np.mean(
                -logp[np.arange(len(target)), target]))
            order = np.argsort(-logits, axis=-1)[:, :5]
            top1 += int((order[:, 0] == target).sum())
            top5 += int((order == target[:, None]).any(-1).sum())
            pred_out = order
        loss_total += loss * valid
        seen += valid

        for i in range(valid):
            image_name = ds.image_name(img_count + i)
            data_dict = {"Predictions": pred_out[i],
                         "Target": np.asarray(target[i]),
                         "Loss": loss}
            if args.viz_mode:
                chain_stage_tokens(full_model_name, reduction_count,
                                   viz_np, i, data_dict)
            model_data_dict[image_name] = data_dict
        img_count += valid

    if multilabel:
        score = mAP(np.concatenate(targs_all), np.concatenate(preds_all))
        top1a = top5a = score
    else:
        top1a = 100.0 * top1 / max(seen, 1)
        top5a = 100.0 * top5 / max(seen, 1)

    model_data_dict["Top1-Acc"] = round(top1a, 4)
    model_data_dict["Top5-Acc"] = round(top5a, 4)
    model_data_dict["Params"] = round(param_count / 1e6, 2)
    print(f" * Acc@1 {top1a:.3f} Acc@5 {top5a:.3f} "
          f"loss {loss_total / max(seen, 1):.4f} params {param_count / 1e6:.2f}M")
    return model_data_dict


def write_viz(viz_file, viz_data):
    with open(viz_file, "w") as f:
        json.dump(viz_data, f, cls=NumpyArrayEncoder, indent=4)


def main(argv=None):
    args = get_parser().parse_args(argv)
    check_eval_compat_args(args)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from tokenreduction_tpu.utils.compile_cache import (
        enable_persistent_compile_cache,
    )

    enable_persistent_compile_cache()
    if args.viz_mode and not args.use_amp:
        # bit-stable extraction: viz models already pin the XLA
        # composition (core/layers.py force_xla); full fp32 matmuls make
        # on-TPU kept-token sets match CPU extraction exactly (TPU's
        # default fp32 matmul precision is bf16-based and can flip
        # near-tied rankings)
        jax.config.update("jax_default_matmul_precision", "highest")
    elif args.viz_mode and args.use_amp:
        print("NOTE: --use_amp viz extraction is NOT bit-stable across "
              "platforms; drop --use_amp for analysis-grade artifacts")
    data = validate(args)
    if args.output_dir:
        os.makedirs(args.output_dir, exist_ok=True)
        write_viz(os.path.join(args.output_dir, args.viz_output_name), data)
    return data


if __name__ == "__main__":
    main()

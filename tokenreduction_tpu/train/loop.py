"""End-to-end training orchestration (reference train.py:240-719 +
engine.py), rebuilt around jitted steps and a data-parallel mesh."""

from __future__ import annotations

import json
import math
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from tokenreduction_tpu.core.config import expand_keep_rate
from tokenreduction_tpu.data import (
    Loader,
    RASampler,
    ShardedSampler,
    TransformConfig,
    build_dataset,
    make_transform,
)
from tokenreduction_tpu.data.sampler import DistributedEvalSampler
from tokenreduction_tpu.models.registry import create_model
from tokenreduction_tpu.parallel.mesh import (
    data_parallel_mesh,
    init_distributed,
    replicate,
    shard_batch,
)
from tokenreduction_tpu.train import losses as L
from tokenreduction_tpu.train.mixup import MixupConfig, apply_mixup
from tokenreduction_tpu.train.optim import OptimConfig, create_optimizer
from tokenreduction_tpu.train.scheduler import SchedConfig, make_schedule
from tokenreduction_tpu.train.step import (
    StepConfig,
    TrainState,
    make_eval_step,
    make_multi_train_step,
    make_train_step,
)
from tokenreduction_tpu.utils.checkpoint import AsyncCheckpointer
from tokenreduction_tpu.utils.metrics import JSONLLogger, MetricLogger, mAP


def rng_streams_for(method: str, train: bool):
    streams = ["dropout", "droppath"]
    if method == "dyvit" and train:
        streams.append("gumbel")
    if method in ("dpcknn",):
        streams.append("cluster")
    return tuple(streams)


def reshard_restored_opt_state(restored_tree, live_tree):
    """Re-place a checkpoint-restored optimizer state on the live state's
    mesh shardings.

    Restored leaves arrive as host (effectively replicated) arrays; FSDP
    moments must get their ZeRO-3 partitioning back or a resumed run
    replicates every Adam moment on every device -- defeating exactly the
    memory scaling FSDP exists for. Leaves whose live counterpart is an
    uncommitted single-device array (e.g. step counts) stay as-is: jit
    places them, and committing them to one device would conflict with
    the mesh-committed arrays."""
    def _reshard(restored, live):
        s = getattr(live, "sharding", None)
        if isinstance(s, jax.sharding.NamedSharding):
            return jax.device_put(jnp.asarray(restored), s)
        return restored

    return jax.tree_util.tree_map(_reshard, restored_tree, live_tree)


def build_base_criterion(args, multilabel: bool, mixup_on: bool):
    if multilabel:
        def crit(logits, targets):
            return L.asymmetric_multilabel_loss(logits.astype(jnp.float32),
                                                targets)
        return crit
    if mixup_on:
        return L.soft_target_ce
    if getattr(args, "bce_loss", False):
        def bce(logits, targets):
            onehot = jax.nn.one_hot(targets, logits.shape[-1])
            return L.bce_with_logits(logits, onehot)
        return bce
    if getattr(args, "smoothing", 0.0):
        def smooth(logits, targets):
            return L.label_smoothing_ce(logits, targets, args.smoothing)
        return smooth
    return L.cross_entropy


def build_loss_fn(args, model_cfg, base_crit, teacher_apply=None):
    """Final loss(out, targets, images, params), including distillation
    wrappers (reference train.py:507-513)."""
    method = model_cfg.method
    dyvit_distill = bool(getattr(args, "dyvit_distill", False)) and \
        method == "dyvit"
    deit_type = getattr(args, "distillation_type", "none")

    if method == "dyvit":
        keep_rate = expand_keep_rate(model_cfg)

        def loss_fn(out, targets, images, params):
            if dyvit_distill:
                logits, feats, mask, scores = out
                tcls, ttok = (teacher_apply(images)
                              if teacher_apply else (None, None))
                base = base_crit(logits, targets)
                return L.dyvit_distillation_loss(
                    base, logits, feats, mask, scores, keep_rate,
                    tcls, ttok,
                    ratio_weight=args.ratio_weight,
                    cls_distill_weight=args.cls_distill_weight,
                    token_distill_weight=args.token_distill_weight,
                    cls_weight=args.cls_weight,
                    mse_token=args.mse_token,
                )
            logits, scores = out
            base = base_crit(logits, targets)
            ratio = 0.0
            for i, s in enumerate(scores):
                ratio = ratio + jnp.mean((s.mean(axis=1) - keep_rate[i]) ** 2)
            return base + (ratio / max(len(scores), 1)) * args.ratio_weight

        return loss_fn

    if deit_type != "none" and teacher_apply is not None:

        def loss_fn(out, targets, images, params):
            if isinstance(out, tuple):
                logits, logits_kd = out
            else:
                logits, logits_kd = out, out
            base = base_crit(logits, targets)
            tlogits = teacher_apply(images)
            if isinstance(tlogits, tuple):
                tlogits = tlogits[0]
            return L.deit_distillation_loss(
                base, logits_kd, tlogits, deit_type,
                args.distillation_alpha, args.distillation_tau)

        return loss_fn

    def loss_fn(out, targets, images, params):
        logits = out[0] if isinstance(out, tuple) else out
        return base_crit(logits, targets)

    return loss_fn


def _local_rows(arr):
    """Rows of a batch-sharded global array that live on THIS process's
    devices, in global order (multi-process multilabel eval: each host
    fetches only its shard; the full set is process_allgather'ed once at
    the end)."""
    shards = sorted(arr.addressable_shards,
                    key=lambda s: s.index[0].start or 0)
    return np.concatenate([np.asarray(s.data) for s in shards])


def evaluate(eval_step, params, loader, mesh, multilabel: bool,
             dist_eval: bool = False):
    """engine.py:119-205 equivalent.

    `dist_eval`: the loader's sampler is process-split
    (DistributedEvalSampler), so multilabel prediction shards must be
    allgathered before mAP. When it is False in a multi-process run,
    every process already iterates the FULL val set -- gathering would
    feed mAP `world` duplicate copies, which is NOT mAP-invariant
    (duplicate positives land at adjacent ranks with lower precision)."""
    multiproc = jax.process_count() > 1
    if multilabel:
        preds, targs = [], []
        for batch in loader:
            valid = batch.pop("valid", len(batch["image"]))
            batch.pop("index", None)
            t = batch["label"]
            if t.ndim == 3:
                t = t.max(axis=1)
            b = shard_batch({"image": batch["image"], "label": t}, mesh)
            p, tt = eval_step(params, b)
            if multiproc:
                p, tt = _local_rows(p), _local_rows(tt)
            preds.append(np.asarray(p)[:valid])
            targs.append(np.asarray(tt)[:valid])
        P, T = np.concatenate(preds), np.concatenate(targs)
        if multiproc and dist_eval:
            # dist_eval: every process holds its sampler shard; gather
            # the full prediction set so mAP sees all images (sampler
            # duplicate-padding included, reference train.py:284-290
            # caveat)
            from jax.experimental import multihost_utils

            P = np.asarray(multihost_utils.process_allgather(P,
                                                             tiled=True))
            T = np.asarray(multihost_utils.process_allgather(T,
                                                             tiled=True))
        score = mAP(T, P)
        return {"acc1": score, "acc5": score, "loss": 0.0}
    tot = {"correct1": 0, "correct5": 0, "loss_sum": 0.0, "count": 0}
    for batch in loader:
        valid = batch.pop("valid", len(batch["image"]))
        batch.pop("index", None)
        # mask loader pads inside the jitted step (weight=0 rows) so the
        # whole eval stays sharded; in multi-process runs every host
        # executes the same program on its shard and the returned scalars
        # are already globally reduced
        w = np.zeros((len(batch["image"]),), np.float32)
        w[:valid] = 1.0
        batch["weight"] = w
        b = shard_batch(batch, mesh)
        m = eval_step(params, b)
        for k in tot:
            tot[k] += float(m[k])
    n = max(tot["count"], 1)
    return {"acc1": 100.0 * tot["correct1"] / n,
            "acc5": 100.0 * tot["correct5"] / n,
            "loss": tot["loss_sum"] / n}


def run_training(args):
    # adahessian sets TOKENREDUCTION_USE_PALLAS_TRAIN=0 and --no-train-mode
    # sets TOKENREDUCTION_USE_PALLAS=0 for the whole run (the flags are
    # re-read at every trace, incl. plateau optimizer rebuilds); restore
    # the caller's values on exit so later runs in the same process get
    # the Pallas kernels back.
    _flags = ("TOKENREDUCTION_USE_PALLAS_TRAIN", "TOKENREDUCTION_USE_PALLAS")
    prior = {k: os.environ.get(k) for k in _flags}
    try:
        return _run_training(args)
    finally:
        for k, v in prior.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def _run_training(args):
    dist = init_distributed()
    mesh = data_parallel_mesh()
    n_dev = len(mesh.devices.reshape(-1))
    world = dist["process_count"]
    is_main = dist["process_index"] == 0

    # ----- data
    tcfg = TransformConfig(
        input_size=args.input_size, color_jitter=args.color_jitter,
        aa=args.aa, train_interpolation=args.train_interpolation,
        reprob=args.reprob, remode=args.remode, recount=args.recount,
        three_augment=getattr(args, "ThreeAugment", False),
        src_crop=getattr(args, "src", False))
    ds_train, num_classes = build_dataset(
        args.data, args.dataset, "train", num_classes=args.synthetic_classes,
        img_size=args.input_size, synthetic_n=args.synthetic_n)
    ds_val, _ = build_dataset(
        args.data, args.dataset, "val", num_classes=args.synthetic_classes,
        img_size=args.input_size, synthetic_n=args.synthetic_n)
    multilabel = getattr(ds_train, "multilabel", False)

    # per-host device batch: the host feeds all its local devices
    host_batch = args.batch_size * args.grad_accum_steps
    if args.repeated_aug:
        sampler = RASampler(len(ds_train), world, dist["process_index"],
                            seed=args.seed)
    else:
        sampler = ShardedSampler(len(ds_train), world,
                                 dist["process_index"], seed=args.seed)
    device_aug = bool(getattr(args, "device_aug", False))
    if device_aug and (tcfg.three_augment or tcfg.src_crop):
        print("device_aug: unsupported recipe (ThreeAugment/src); "
              "falling back to host transforms")
        device_aug = False
    if device_aug:
        from tokenreduction_tpu.data.device_aug import (
            DeviceAugConfig, make_device_augment)
        from tokenreduction_tpu.data.pipeline import make_raw_transform
        aug_cfg = DeviceAugConfig(
            input_size=args.input_size,
            recipe="asl" if multilabel else "imagenet",
            aa=tcfg.aa if args.dataset != "nabirds" else "",
            # host recipe parity: color-jitter substitutes when
            # auto-augment is disabled (pipeline.py train_fn)
            color_jitter=tcfg.color_jitter,
            reprob=tcfg.reprob, recount=tcfg.recount)
        device_aug_fn = make_device_augment(aug_cfg)
        # cached datasets already store squares; otherwise the host
        # square-resizes to the eval scale size (cheap vs full aug)
        raw_size = getattr(ds_train, "images", None)
        raw_size = (int(raw_size.shape[1]) if raw_size is not None
                    else int(args.input_size / tcfg.crop_pct + 0.5))
        train_transform = make_raw_transform(raw_size)
    else:
        device_aug_fn = None
        train_transform = make_transform(args.dataset, True, tcfg)
    train_loader = Loader(
        ds_train, sampler, host_batch, train_transform,
        drop_last=True, seed=args.seed,
        num_workers=getattr(args, "num_workers", 0))
    if len(train_loader) == 0 and dist["process_index"] == 0:
        # reference-faithful but easy to hit on tiny datasets: RASampler
        # truncates the epoch to floor(n//256*256/world) samples
        # (reference samplers.py:40), so n < 256 with repeated aug (or
        # n < batch with drop_last) trains ZERO steps per epoch.
        print(f"WARNING: train loader is empty (dataset {len(ds_train)}, "
              f"host batch {host_batch}, "
              f"repeated_aug={bool(args.repeated_aug)}); every epoch "
              "will train 0 steps. Use --no-repeated-aug and/or a "
              "smaller --batch-size for tiny datasets.")
    eval_transform_fn = None
    if device_aug and getattr(ds_val, "images", None) is not None:
        # cached squares: eval resize/center-crop/normalize on-device too
        from tokenreduction_tpu.data.device_aug import (
            make_device_eval_transform)
        eval_transform_fn = make_device_eval_transform(aug_cfg)
        val_transform = make_raw_transform(int(ds_val.images.shape[1]))
    else:
        val_transform = make_transform(args.dataset, False, tcfg)
    dist_eval = bool(getattr(args, "dist_eval", False)) and world > 1
    if dist_eval:
        # reference train.py:284-290 semantics, including the caveat
        if len(ds_val) % world != 0:
            print("Warning: Enabling distributed evaluation with an eval "
                  "dataset not divisible by process number. This will "
                  "slightly alter validation results as extra duplicate "
                  "entries are added to achieve equal num of samples "
                  "per-process.")
        val_sampler = DistributedEvalSampler(
            len(ds_val), world, dist["process_index"])
    else:
        val_sampler = ShardedSampler(len(ds_val), 1, 0, shuffle=False)
    val_loader = Loader(
        ds_val, val_sampler,
        args.batch_size, val_transform,
        seed=args.seed, pad_partial=True)
    steps_per_epoch = max(len(train_loader), 1)

    # ----- model
    model_kw = {}
    for k in ("k_neighbors", "cluster_iters", "equal_weight", "sinkhorn_eps",
              "heuristic_pattern", "min_radius", "not_contiguous"):
        if hasattr(args, k):
            model_kw[k] = getattr(args, k)
    dim_kw = {}
    for k in ("embed_dim", "depth", "num_heads", "patch_size"):
        if getattr(args, k, None) is not None:
            dim_kw[k] = getattr(args, k)
    model_kw.update(dim_kw)
    deit_distillation = getattr(args, "distillation_type", "none") != \
        "none"
    module, model_cfg = create_model(
        args.model, num_classes=num_classes, img_size=args.input_size,
        reduction_loc=tuple(args.reduction_loc),
        keep_rate=tuple(args.keep_rate),
        drop_rate=args.drop, drop_path_rate=args.drop_path,
        dyvit_distillation=bool(getattr(args, "dyvit_distill", False)),
        # DeiT distillation token only exists on the dense backbone
        # (reference models_act.py:69-78; reduction models ignore it)
        distilled=deit_distillation and "deit" in args.model,
        **model_kw)

    example = jnp.zeros((2, args.input_size, args.input_size, 3),
                        jnp.float32)
    init_rngs = {"params": jax.random.PRNGKey(args.seed)}
    for s in rng_streams_for(model_cfg.method, True):
        init_rngs[s] = jax.random.PRNGKey(args.seed + 1)
    params = jax.jit(
        lambda: module.init(init_rngs, example, train=False)["params"]
    )()

    if getattr(args, "pretrained", False) and not args.finetune:
        # reference factories' pretrained=True (models_act.py:88-96):
        # fetch/cache the FB DeiT release weights and merge strict=False
        from tokenreduction_tpu.models.convert import load_pretrained_deit
        params, report = load_pretrained_deit(params, model_cfg)
        if is_main:
            print(f"pretrained load: {len(report['loaded'])} loaded, "
                  f"{len(report['shape_mismatch'])} mismatched")

    if args.finetune:
        from tokenreduction_tpu.models.convert import (
            convert_jax_npz, convert_torch_state_dict, load_jax_npz_state,
            load_torch_checkpoint, merge_pretrained, resize_pos_embed)
        if args.finetune.endswith(".npz"):
            # Brain-Flax ViT checkpoint (reference deit_viz.py:252-327)
            tree, _ = convert_jax_npz(load_jax_npz_state(args.finetune))
        else:
            state = load_torch_checkpoint(args.finetune)
            tree, _ = convert_torch_state_dict(state)
        if "pos_embed" in tree:
            # interpolate to the target grid (reference train.py:336-370)
            tree["pos_embed"] = resize_pos_embed(
                tree["pos_embed"], model_cfg.num_patches,
                model_cfg.num_prefix_tokens)
        params, report = merge_pretrained(params, tree)
        if is_main:
            print(f"finetune load: {len(report['loaded'])} loaded, "
                  f"{len(report['shape_mismatch'])} mismatched")

    # ----- teacher
    teacher_apply = None
    if deit_distillation:
        # reference train.py:455-478 builds a timm teacher from
        # --teacher-model (default regnety_160) and loads --teacher-path.
        # Here the teacher comes from our registry (incl. the Flax
        # RegNetY, models/regnet.py); --teacher-path may be an Orbax
        # checkpoint dir or a torch .pth (the released teacher weights).
        is_convnet_teacher = args.teacher_model.startswith("regnet")
        teacher_kw = dim_kw
        if is_convnet_teacher:
            teacher_kw = {}
            for k in ("depths", "widths", "group_width", "stem_width"):
                v = getattr(args, f"teacher_regnet_{k}", None)
                if v is not None:
                    teacher_kw[k] = v
        tmodule, _ = create_model(
            args.teacher_model, num_classes=num_classes,
            img_size=args.input_size, **teacher_kw)
        tparams = jax.jit(
            lambda: tmodule.init({"params": jax.random.PRNGKey(0)},
                                 example, train=False)["params"])()
        torch_suffixes = (".pth", ".pt", ".bin", ".tar")
        if args.teacher_path and (
                args.teacher_path.endswith(torch_suffixes)
                or args.teacher_path.startswith("http")):
            from tokenreduction_tpu.models.convert import (
                convert_regnet_state_dict, convert_torch_state_dict,
                fetch_checkpoint_url, load_torch_checkpoint,
                merge_pretrained)
            tpath = args.teacher_path
            if tpath.startswith("http"):
                # reference train.py:464-466 URL teacher-path (the DeiT
                # release hosts regnety_160-a5fe301d.pth)
                tpath = fetch_checkpoint_url(tpath)
            state = load_torch_checkpoint(tpath)
            conv = (convert_regnet_state_dict if is_convnet_teacher
                    else convert_torch_state_dict)
            tree, _skipped = conv(state)
            tparams, report = merge_pretrained(tparams, tree)
            if is_main:
                print(f"teacher load ({args.teacher_path}): "
                      f"{len(report['loaded'])} loaded, "
                      f"{len(report['shape_mismatch'])} mismatched")
        elif args.teacher_path:
            if os.path.isfile(args.teacher_path):
                raise ValueError(
                    f"--teacher-path {args.teacher_path}: single files "
                    f"must be torch checkpoints ({'/'.join(torch_suffixes)}"
                    "); directories are read as Orbax checkpoints")
            from tokenreduction_tpu.utils.checkpoint import load_checkpoint
            tree, tmeta = load_checkpoint(args.teacher_path)
            tparams = tree["ema_params"] if tmeta.get("ema_best") and \
                tree.get("ema_params") is not None else tree["params"]
        tparams = replicate(
            jax.tree_util.tree_map(jnp.asarray, tparams), mesh)

        def teacher_apply(images):
            return jax.lax.stop_gradient(
                tmodule.apply({"params": tparams}, images, train=False))

    if model_cfg.method == "dyvit" and getattr(args, "dyvit_distill", False) \
            and not getattr(args, "no_dyvit_teacher", False):
        tmodule, _ = create_model(
            args.model + "_teacher", num_classes=num_classes,
            img_size=args.input_size, **dim_kw)
        tparams = jax.jit(
            lambda: tmodule.init({"params": jax.random.PRNGKey(0)},
                                 example, train=False)["params"])()
        if getattr(args, "dyvit_teacher_weights", ""):
            from tokenreduction_tpu.utils.checkpoint import load_checkpoint
            tree, _ = load_checkpoint(args.dyvit_teacher_weights)
            tparams = tree["params"]
        tparams = replicate(tparams, mesh)

        def teacher_apply(images):
            return jax.lax.stop_gradient(
                tmodule.apply({"params": tparams}, images, train=False))

    # ----- optimizer (linear LR scaling, reference train.py:416-419)
    total_batch = args.batch_size * args.grad_accum_steps * world
    if not args.unscale_lr:
        args.lr = args.lr * total_batch / args.lr_batch_normalizer
    scfg = SchedConfig(
        sched=args.sched, lr=args.lr, min_lr=args.min_lr,
        warmup_lr=args.warmup_lr, warmup_epochs=args.warmup_epochs,
        epochs=args.epochs, cooldown_epochs=args.cooldown_epochs,
        decay_epochs=args.decay_epochs, decay_rate=args.decay_rate,
        sched_in_steps=args.sched_in_steps,
        steps_per_epoch=steps_per_epoch,
        lr_noise=(tuple(args.lr_noise)
                  if getattr(args, "lr_noise", None) else None),
        lr_noise_pct=getattr(args, "lr_noise_pct", 0.67),
        lr_noise_std=getattr(args, "lr_noise_std", 1.0),
        seed=args.seed)
    sched_host = make_schedule(scfg)

    def base_schedule(step):
        # trace-friendly piecewise version evaluated per optimizer step
        if scfg.sched_in_steps:
            t = step
        else:
            t = step // steps_per_epoch
        # host schedule is pure python; wrap pointwise for tracing
        return _traced_schedule(sched_host, scfg, t)

    ocfg = OptimConfig(
        opt=args.opt, lr=args.lr, weight_decay=args.weight_decay,
        momentum=args.momentum, opt_eps=args.opt_eps,
        opt_betas=tuple(args.opt_betas) if args.opt_betas else None,
        clip_grad=args.clip_grad,
        backbone_lr_scale=args.backbone_lr_scale,
        backbone_freeze_steps=args.backbone_freeze_steps,
        constant_cls=args.constant_cls, constant_pos=args.constant_cls,
        attn_only=getattr(args, "attn_only", False))
    new_names = getattr(type(module), "new_module_names", lambda: [])()
    tx, labels = create_optimizer(params, ocfg, base_schedule, new_names,
                                  steps_per_epoch)

    # ----- loss + steps
    mixup_on = (not multilabel) and (
        args.mixup > 0 or args.cutmix > 0
        or getattr(args, "cutmix_minmax", None) is not None)
    base_crit = build_base_criterion(args, multilabel, mixup_on)
    loss_fn = build_loss_fn(args, model_cfg, base_crit, teacher_apply)

    def apply_fn(p, im, train, rngs):
        return module.apply({"params": p}, im, train=train, rngs=rngs)

    mixup_fn = None
    if mixup_on:
        mcfg = MixupConfig(
            mixup_alpha=args.mixup, cutmix_alpha=args.cutmix,
            prob=args.mixup_prob, switch_prob=args.mixup_switch_prob,
            label_smoothing=args.smoothing, num_classes=num_classes,
            mode=getattr(args, "mixup_mode", "batch"),
            cutmix_minmax=(tuple(args.cutmix_minmax)
                           if getattr(args, "cutmix_minmax", None)
                           else None))
        mixup_fn = lambda k, im, lb: apply_mixup(k, im, lb, mcfg)  # noqa

    def multilabel_prep(fn):
        if not multilabel:
            return fn
        def wrapped(k, im, lb):
            return im, (lb.max(axis=1) if lb.ndim == 3 else lb)
        return wrapped
    if multilabel:
        mixup_fn = multilabel_prep(None)

    use_adahessian = args.opt.lower() == "adahessian"
    if use_adahessian:
        # forward-mode jvp (the Hutchinson probe) cannot cross the
        # custom_vjp Pallas train kernels; force the XLA train path
        # (read at trace time by core/layers.py::_pallas_train_eligible)
        os.environ["TOKENREDUCTION_USE_PALLAS_TRAIN"] = "0"
        if jax.process_index() == 0:
            print("adahessian: XLA train path forced "
                  "(TOKENREDUCTION_USE_PALLAS_TRAIN=0)")
    train_mode = getattr(args, "train_mode", True)
    if not train_mode and (
            model_cfg.method == "dyvit"
            or getattr(args, "distillation_type", "none") != "none"):
        # the eval-mode forward returns bare (or dist-averaged) logits,
        # but these losses need the train-time extras -- the reference
        # fails the same way (train.py:599 set_training_mode=False with
        # losses.py:90 DynamicViT extras / losses.py:31 outputs_kd)
        raise ValueError("--no-train-mode is incompatible with dyvit "
                         "and with --distillation-type != none")
    if not train_mode:
        # the eval-path Pallas kernels have no custom_vjp; grad through
        # the eval forward needs the XLA composition
        os.environ["TOKENREDUCTION_USE_PALLAS"] = "0"
        if jax.process_index() == 0:
            print("--no-train-mode: XLA composition forced for "
                  "differentiability (TOKENREDUCTION_USE_PALLAS=0)")
    step_cfg = StepConfig(
        grad_accum_steps=args.grad_accum_steps,
        ema_decay=args.model_ema_decay if args.model_ema else 0.0,
        amp=args.use_amp,
        train_mode=train_mode,
        project_sinkhorn=model_cfg.method == "sinkhorn",
        rng_streams=rng_streams_for(model_cfg.method, True),
        watch_norms=getattr(args, "wandb_watch", False),
        hutchinson=use_adahessian)

    steps_per_call = max(int(getattr(args, "steps_per_call", 1)), 1)
    metrics = {}

    def build_train_step(transform):
        base = make_train_step(apply_fn, loss_fn, transform, step_cfg,
                               mixup_fn, aug_fn=device_aug_fn)
        if steps_per_call > 1:
            base = make_multi_train_step(base)
        return jax.jit(base, donate_argnums=(0,))

    def build_tail_step(transform):
        # single-step flush for multi-call tails: must carry the SAME
        # aug_fn and the CURRENT optimizer transform as the fused step
        return jax.jit(
            make_train_step(apply_fn, loss_fn, transform, step_cfg,
                            mixup_fn, aug_fn=device_aug_fn),
            donate_argnums=(0,))

    current_tx = tx
    train_step = build_train_step(tx)
    tail_step = None  # lazily jitted single-step for multi-call tails
    eval_step = jax.jit(make_eval_step(apply_fn, multilabel,
                                       transform_fn=eval_transform_fn))

    from tokenreduction_tpu.parallel.mesh import shard_params
    use_fsdp = bool(getattr(args, "fsdp", False))
    params = shard_params(params, mesh, fsdp=use_fsdp)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        # distinct buffers: params are donated to the jitted step and a
        # shared buffer would be donated twice
        ema_params=jax.tree_util.tree_map(jnp.copy, params)
        if args.model_ema else None)

    start_epoch = args.start_epoch
    if args.resume:
        from tokenreduction_tpu.utils.checkpoint import load_checkpoint
        # Orbax round-trips optax NamedTuple states as plain containers;
        # restore against the live state as the structure template.
        template = {"params": state.params, "opt_state": state.opt_state}
        if state.ema_params is not None:
            template["ema_params"] = state.ema_params
        try:
            tree, meta = load_checkpoint(args.resume, item=template)
            opt_state = reshard_restored_opt_state(
                tree["opt_state"], state.opt_state)
        except Exception as e:
            print(f"resume: typed restore failed ({e}); restoring params "
                  f"only with a fresh optimizer state")
            tree, meta = load_checkpoint(args.resume)
            opt_state = state.opt_state
        state = TrainState(
            # replicate over the mesh: opt_state is committed to the mesh
            # sharding above, and a committed single-device step would
            # make the jitted step's inputs device-incompatible
            step=replicate(jnp.asarray(meta["step"], jnp.int32), mesh),
            params=shard_params(tree["params"], mesh, fsdp=use_fsdp),
            opt_state=opt_state,
            ema_params=shard_params(tree["ema_params"], mesh,
                                    fsdp=use_fsdp)
            if tree.get("ema_params") is not None else None)
        start_epoch = meta["epoch"] + 1

    logger = JSONLLogger(
        os.path.join(args.output_dir, "log.txt")
        if args.output_dir and is_main else None,
        use_wandb=args.wandb and is_main,
        wandb_kwargs=dict(project=args.wandb_project,
                          group=args.wandb_group))

    if args.output_dir:
        os.makedirs(args.output_dir, exist_ok=True)

    # -1 so the first epoch always produces a best checkpoint, even at
    # 0.0 accuracy (the reference's `0.0 > 0.0` gate would save nothing)
    max_accuracy = -1.0
    ema_best = False
    # Single-controller SPMD: replicated jit inputs (the step key) must be
    # IDENTICAL on every process; per-device randomness comes from the
    # batch-sharded in-jit draws. (The reference's torch seed+rank trick,
    # train.py:261, would diverge the replicated key across hosts.)
    rng = jax.random.PRNGKey(args.seed)

    if args.eval:
        stats = evaluate(eval_step, state.params, val_loader, mesh,
                         multilabel, dist_eval=dist_eval)
        print(f"Eval: {stats}")
        return stats

    total_step = int(state.step)
    # host-side ReduceLROnPlateau (reference scheduler_factory plateau
    # mode): on decay the optimizer transform is rebuilt with the scaled
    # schedule; adam moments carry over (same state structure)
    plateau_scale = 1.0
    plateau_best = -1.0
    plateau_wait = 0
    ckptr = AsyncCheckpointer()
    for epoch in range(start_epoch, args.epochs):
        train_loader.set_epoch(epoch)
        meter = MetricLogger()
        t_ep = time.time()
        n_img = 0
        profiling = bool(getattr(args, "profile_dir", "")) and \
            epoch == start_epoch
        if profiling:
            try:
                jax.profiler.start_trace(args.profile_dir)
            except Exception as e:
                print(f"profiler unavailable: {e}")
                profiling = False
        pending = []
        for batch in meter.log_every(train_loader, args.print_freq,
                                     f"Epoch [{epoch}]"):
            batch.pop("valid", None)
            batch.pop("index", None)
            if steps_per_call > 1:
                pending.append(batch)
                if len(pending) < steps_per_call:
                    continue
                stacked = {
                    k2: np.stack([p[k2] for p in pending])
                    for k2 in pending[0]
                }
                pending = []
                rng, k = jax.random.split(rng)
                b = shard_batch(stacked, mesh, batch_axis=1)
                state, metrics = train_step(state, b, k)
                total_step += steps_per_call
                n_img += stacked["image"].shape[0] * \
                    stacked["image"].shape[1] * world
                meter.update(loss=float(metrics["loss"][-1]))
                continue
            rng, k = jax.random.split(rng)
            b = shard_batch(batch, mesh)
            state, metrics = train_step(state, b, k)
            total_step += 1
            n_img += batch["image"].shape[0] * world
            meter.update(loss=float(metrics["loss"]))
        # flush a short tail group one step at a time
        if pending:
            if tail_step is None:
                tail_step = build_tail_step(current_tx)
            for batch in pending:
                rng, k = jax.random.split(rng)
                state, metrics = tail_step(state, shard_batch(batch, mesh),
                                           k)
                total_step += 1
                n_img += batch["image"].shape[0] * world
                meter.update(loss=float(metrics["loss"]))
        if profiling:
            try:
                jax.block_until_ready(state.params)
                jax.profiler.stop_trace()
                print(f"profiler trace written to {args.profile_dir}")
            except Exception as e:
                print(f"profiler stop failed: {e}")
        epoch_time = time.time() - t_ep
        ips = n_img / epoch_time

        test_stats = evaluate(eval_step, state.params, val_loader, mesh,
                              multilabel, dist_eval=dist_eval)
        cur = test_stats["acc1"]
        cur_is_ema = False
        if state.ema_params is not None:
            ema_stats = evaluate(eval_step, state.ema_params, val_loader,
                                 mesh, multilabel, dist_eval=dist_eval)
            if ema_stats["acc1"] > cur:
                cur, cur_is_ema = ema_stats["acc1"], True
        if cur > max_accuracy:
            max_accuracy = max(cur, 0.0)
            ema_best = cur_is_ema
            # checkpoint saves run on EVERY process: orbax synchronizes
            # internally (a rank-0-only save deadlocks the multi-host
            # shutdown barrier); eval metrics are globally reduced, so
            # the save condition agrees across processes
            if args.output_dir:
                ckptr.save(
                    os.path.join(args.output_dir, "best_checkpoint"),
                    params=state.params, ema_params=state.ema_params,
                    opt_state=state.opt_state, epoch=epoch,
                    step=total_step, model_cfg=model_cfg,
                    run_args={k: v for k, v in vars(args).items()
                              if not callable(v)},
                    ema_best=ema_best, max_accuracy=max_accuracy)
        if args.save_more_than_best and args.output_dir:
            ckptr.save(
                os.path.join(args.output_dir, "checkpoint"),
                params=state.params, ema_params=state.ema_params,
                opt_state=state.opt_state, epoch=epoch, step=total_step,
                model_cfg=model_cfg,
                run_args={k: v for k, v in vars(args).items()
                          if not callable(v)},
                ema_best=ema_best, max_accuracy=max_accuracy)

        if args.sched == "plateau":
            if cur > plateau_best + 1e-9:
                plateau_best = cur
                plateau_wait = 0
            else:
                plateau_wait += 1
                if plateau_wait >= args.patience_epochs:
                    plateau_wait = 0
                    plateau_scale *= args.decay_rate
                    tx2, _ = create_optimizer(
                        state.params, ocfg,
                        lambda s: base_schedule(s) * plateau_scale,
                        new_names, steps_per_epoch)
                    current_tx = tx2
                    train_step = build_train_step(tx2)
                    tail_step = None  # rebuild from tx2 on next flush
                    if is_main:
                        print(f"plateau: lr scale -> {plateau_scale}")
        lr_now = plateau_scale * sched_host(
            total_step if scfg.sched_in_steps else epoch + 1)
        watch_stats = {}
        if getattr(args, "wandb_watch", False) and metrics:
            # wandb.watch(model) equivalent (reference train.py:561):
            # per-module param/grad norms from the last step's metrics
            watch_stats = {
                k: float(np.asarray(v).reshape(-1)[-1])
                for k, v in metrics.items() if "/" in k}
        log_stats = {
            "epoch": epoch, "train_loss": meter.meters["loss"].global_avg,
            "test_acc1": test_stats["acc1"], "test_acc5": test_stats["acc5"],
            "test_loss": test_stats["loss"],
            "max_accuracy": max_accuracy,
            **watch_stats, "lr": lr_now,
            "images_per_sec": ips, "epoch_time": epoch_time,
        }
        if is_main:
            print(json.dumps(log_stats))
            logger.log(log_stats, step=total_step)
    ckptr.wait()  # flush any in-flight checkpoint write
    return {"max_accuracy": max_accuracy}


def _traced_schedule(sched_host, scfg: SchedConfig, t):
    """Evaluate the host schedule symbolically: rebuild the same piecewise
    math with jnp so it can run inside the optimizer."""
    import jax.numpy as jnp

    from tokenreduction_tpu.train.scheduler import lr_noise_factor

    mult = scfg.steps_per_epoch if scfg.sched_in_steps else 1
    t_initial = (scfg.epochs - scfg.cooldown_epochs) * mult
    warmup_t = scfg.warmup_epochs * mult
    t = jnp.asarray(t, jnp.float32)
    noise = lr_noise_factor(scfg, t)
    if scfg.sched == "cosine":
        warm = scfg.warmup_lr + (scfg.lr - scfg.warmup_lr) * t / max(
            warmup_t, 1)
        tt = jnp.clip(t - warmup_t, 0, max(t_initial - warmup_t, 1))
        span = max(t_initial - warmup_t, 1)
        cos = scfg.min_lr + 0.5 * (scfg.lr - scfg.min_lr) * (
            1 + jnp.cos(jnp.pi * tt / span))
        return jnp.where(t < warmup_t, warm, cos) * noise
    if scfg.sched == "step":
        warm = scfg.warmup_lr + (scfg.lr - scfg.warmup_lr) * t / max(
            warmup_t, 1)
        decay_t = max(scfg.decay_epochs * mult, 1)
        dec = scfg.lr * scfg.decay_rate ** jnp.floor(
            (t - warmup_t) / decay_t)
        return jnp.where(t < warmup_t, warm, dec) * noise
    if scfg.sched == "tanh":
        warm = scfg.warmup_lr + (scfg.lr - scfg.warmup_lr) * t / max(
            warmup_t, 1)
        tt = jnp.clip(t - warmup_t, 0, max(t_initial - warmup_t, 1))
        span = max(t_initial - warmup_t, 1)
        lb, ub = -7.0, 3.0
        val = scfg.min_lr + (scfg.lr - scfg.min_lr) * 0.5 * (
            1 - jnp.tanh(lb + (ub - lb) * tt / span)
        ) / (0.5 * (1 - math.tanh(lb)))
        return jnp.where(t < warmup_t, warm, val) * noise
    return jnp.full_like(t, scfg.lr) * noise

"""Training engine: losses vs torch oracles, param grouping, a real
train_step that reduces loss, EMA, mixup, sinkhorn projection."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from tokenreduction_tpu import create_model
from tokenreduction_tpu.train import losses as L
from tokenreduction_tpu.train.mixup import MixupConfig, apply_mixup
from tokenreduction_tpu.train.optim import (
    OptimConfig,
    create_optimizer,
    ema_update,
    param_labels,
    project_params,
)
from tokenreduction_tpu.train.scheduler import SchedConfig, make_schedule
from tokenreduction_tpu.train.step import (
    StepConfig,
    TrainState,
    make_eval_step,
    make_train_step,
)

TINY = dict(embed_dim=32, num_heads=2, depth=4, patch_size=8)


def small_model(method="topk", **kw):
    return create_model(
        f"{method}_small_patch16_224", num_classes=5, img_size=32,
        reduction_loc=(1, 2), keep_rate=(0.7,), **TINY, **kw,
    )


# ---------------------------------------------------------------- losses
def test_label_smoothing_matches_torch():
    g = torch.Generator().manual_seed(0)
    logits = torch.randn(8, 10, generator=g)
    labels = torch.randint(0, 10, (8,), generator=g)
    ref = F.cross_entropy(logits, labels, label_smoothing=0.1)
    ours = L.label_smoothing_ce(
        jnp.asarray(logits.numpy()), jnp.asarray(labels.numpy()), 0.1)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_bce_matches_torch():
    g = torch.Generator().manual_seed(1)
    logits = torch.randn(6, 7, generator=g)
    targets = (torch.rand(6, 7, generator=g) > 0.5).float()
    ref = F.binary_cross_entropy_with_logits(logits, targets)
    ours = L.bce_with_logits(jnp.asarray(logits.numpy()),
                             jnp.asarray(targets.numpy()))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_asl_matches_torch_oracle():
    g = torch.Generator().manual_seed(2)
    x = torch.randn(4, 9, generator=g)
    y = (torch.rand(4, 9, generator=g) > 0.7).float()
    # oracle per ASL paper / timm AsymmetricLossMultiLabel
    xs_pos = torch.sigmoid(x)
    xs_neg = (1 - xs_pos + 0.05).clamp(max=1)
    los = y * torch.log(xs_pos.clamp(min=1e-8)) + \
        (1 - y) * torch.log(xs_neg.clamp(min=1e-8))
    pt = xs_pos * y + xs_neg * (1 - y)
    w = (1 - pt) ** (0 * y + 4 * (1 - y))
    ref = -(los * w).sum()
    ours = L.asymmetric_multilabel_loss(
        jnp.asarray(x.numpy()), jnp.asarray(y.numpy()))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-4)


def test_soft_distillation_matches_torch():
    g = torch.Generator().manual_seed(3)
    s = torch.randn(4, 10, generator=g)
    t = torch.randn(4, 10, generator=g)
    T = 2.0
    ref = F.kl_div(
        F.log_softmax(s / T, dim=1), F.log_softmax(t / T, dim=1),
        reduction="batchmean", log_target=True,
    ) * T * T
    base = jnp.asarray(1.5)
    ours = L.deit_distillation_loss(
        base, jnp.asarray(s.numpy()), jnp.asarray(t.numpy()),
        "soft", alpha=0.5, tau=T)
    np.testing.assert_allclose(
        float(ours), 1.5 * 0.5 + float(ref) * 0.5, rtol=1e-5)


# ------------------------------------------------------------- grouping
def test_param_groups_follow_reference_rules():
    module, cfg = small_model("dyvit")
    x = jnp.ones((1, 32, 32, 3))
    v = module.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    labels = param_labels(
        v["params"], ["score_predictor"], OptimConfig())
    from flax import traverse_util

    flat = traverse_util.flatten_dict(labels)
    by_name = {".".join(k): lab for k, lab in flat.items()}
    assert by_name["head.kernel"] == "new_param"
    assert by_name["head.bias"] == "new_param_no_decay"
    assert by_name["pos_embed"] == "new_param"
    assert by_name["patch_embed.proj.kernel"] == "new_param"
    assert by_name["cls_token"] == "decay"
    assert by_name["blocks_0.attn.qkv.kernel"] == "decay"
    assert by_name["blocks_0.norm1.scale"] == "no_decay"
    assert by_name["score_predictor_0.in_fc.kernel"] == "new_param"
    assert by_name["score_predictor_0.in_fc.bias"] == "new_param_no_decay"
    # constant_cls freezes the cls token
    labels2 = param_labels(
        v["params"], [], OptimConfig(constant_cls=True))
    flat2 = traverse_util.flatten_dict(labels2)
    assert flat2[("cls_token",)] == "frozen"


# ------------------------------------------------------------ schedule
def test_cosine_schedule_shape():
    sc = SchedConfig(sched="cosine", lr=1e-3, min_lr=1e-5,
                     warmup_lr=1e-6, warmup_epochs=2, epochs=10)
    f = make_schedule(sc)
    assert abs(f(0) - 1e-6) < 1e-9
    assert abs(f(2) - 1e-3) < 1e-9  # end of warmup
    assert f(10) <= f(5) <= f(2)
    assert abs(f(10) - 1e-5) < 1e-8


# ----------------------------------------------------------- train step
def test_train_step_reduces_loss_and_updates_groups():
    module, cfg = small_model("topk")
    x = jnp.ones((4, 32, 32, 3))
    v = module.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    params = v["params"]

    sched = make_schedule(SchedConfig(
        sched="constant", lr=5e-3, warmup_epochs=0, epochs=10))
    ocfg = OptimConfig(lr=5e-3, backbone_lr_scale=0.5, clip_grad=1.0)
    tx, labels = create_optimizer(params, ocfg, lambda s: sched(s),
                                  [], steps_per_epoch=2)

    def apply_fn(p, im, train, rngs):
        return module.apply({"params": p}, im, train=train, rngs=rngs)

    def loss_fn(out, targets, images, params):
        return L.soft_target_ce(out, targets)

    mix = MixupConfig(num_classes=5, mixup_alpha=0.2, cutmix_alpha=0.0)
    step = jax.jit(make_train_step(
        apply_fn, loss_fn, tx,
        StepConfig(grad_accum_steps=2, ema_decay=0.9),
        mixup_fn=lambda k, im, lb: apply_mixup(k, im, lb, mix),
    ))

    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        opt_state=tx.init(params), ema_params=params)
    key = jax.random.PRNGKey(1)
    imgs = jax.random.normal(key, (8, 32, 32, 3))
    lbls = jnp.array([0, 1, 2, 3, 4, 0, 1, 2])
    batch = {"image": imgs, "label": lbls}
    losses_seen = []
    for i in range(8):
        state, metrics = step(state, batch, jax.random.PRNGKey(i + 10))
        losses_seen.append(float(metrics["loss"]))
    assert losses_seen[-1] < losses_seen[0], losses_seen
    assert int(state.step) == 8
    # EMA moved away from init but not equal to params
    d_ema = float(jnp.abs(
        state.ema_params["head"]["kernel"] - params["head"]["kernel"]).max())
    d_par = float(jnp.abs(
        state.params["head"]["kernel"] - params["head"]["kernel"]).max())
    assert 0 < d_ema < d_par


def test_backbone_freeze_zeroes_backbone_update():
    module, cfg = small_model("topk")
    x = jnp.ones((2, 32, 32, 3))
    params = module.init({"params": jax.random.PRNGKey(0)}, x,
                         train=False)["params"]
    ocfg = OptimConfig(lr=1e-2, backbone_freeze_steps=100)
    tx, _ = create_optimizer(params, ocfg, lambda s: 1e-2 * jnp.ones(()),
                             [], steps_per_epoch=10)

    def apply_fn(p, im, train, rngs):
        return module.apply({"params": p}, im, train=train, rngs=rngs)

    step = jax.jit(make_train_step(
        apply_fn, lambda o, t, i, p: L.cross_entropy(o, t), tx,
        StepConfig()))
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=tx.init(params))
    batch = {"image": jax.random.normal(jax.random.PRNGKey(2),
                                        (2, 32, 32, 3)),
             "label": jnp.array([0, 1])}
    state, _ = step(state, batch, jax.random.PRNGKey(3))
    # backbone (blocks) unchanged while frozen; head moved
    same = jnp.allclose(state.params["blocks_0"]["attn"]["qkv"]["kernel"],
                        params["blocks_0"]["attn"]["qkv"]["kernel"])
    moved = not jnp.allclose(state.params["head"]["kernel"],
                             params["head"]["kernel"])
    assert bool(same) and bool(moved)


def test_attn_only_step_updates_only_attention_head_pos():
    """One real optimizer step under --attn-only: MLP / patch_embed /
    cls_token stay bitwise-frozen while attention, head, and pos_embed
    move (reference train.py:372-392)."""
    module, cfg = small_model("topk")
    x = jnp.ones((2, 32, 32, 3))
    params = module.init({"params": jax.random.PRNGKey(0)}, x,
                         train=False)["params"]
    ocfg = OptimConfig(lr=1e-2, attn_only=True)
    tx, _ = create_optimizer(params, ocfg, lambda s: 1e-2 * jnp.ones(()),
                             [], steps_per_epoch=10)

    def apply_fn(p, im, train, rngs):
        return module.apply({"params": p}, im, train=train, rngs=rngs)

    step = jax.jit(make_train_step(
        apply_fn, lambda o, t, i, p: L.cross_entropy(o, t), tx,
        StepConfig()))
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=tx.init(params))
    batch = {"image": jax.random.normal(jax.random.PRNGKey(2),
                                        (2, 32, 32, 3)),
             "label": jnp.array([0, 1])}
    state, _ = step(state, batch, jax.random.PRNGKey(3))
    p0, p1 = params, state.params
    np.testing.assert_array_equal(
        np.asarray(p1["blocks_0"]["mlp"]["fc1"]["kernel"]),
        np.asarray(p0["blocks_0"]["mlp"]["fc1"]["kernel"]))
    np.testing.assert_array_equal(
        np.asarray(p1["patch_embed"]["proj"]["kernel"]),
        np.asarray(p0["patch_embed"]["proj"]["kernel"]))
    np.testing.assert_array_equal(np.asarray(p1["cls_token"]),
                                  np.asarray(p0["cls_token"]))
    assert not np.allclose(p1["blocks_0"]["attn"]["qkv"]["kernel"],
                           p0["blocks_0"]["attn"]["qkv"]["kernel"])
    assert not np.allclose(p1["head"]["kernel"], p0["head"]["kernel"])
    assert not np.allclose(p1["pos_embed"], p0["pos_embed"])


def test_sinkhorn_projection():
    module, cfg = small_model("sinkhorn")
    x = jnp.ones((1, 32, 32, 3))
    params = module.init({"params": jax.random.PRNGKey(0)}, x,
                         train=False)["params"]
    proj = project_params(params)
    v = proj["cluster_layers_0"]["v"]
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(v), axis=-1), 1.0, rtol=1e-5)


def test_mixup_targets_sum_to_one():
    mix = MixupConfig(num_classes=7, label_smoothing=0.1, prob=1.0)
    im = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 16, 3))
    lb = jnp.array([0, 1, 2, 3])
    out_im, out_t = apply_mixup(jax.random.PRNGKey(5), im, lb, mix)
    assert out_im.shape == im.shape
    np.testing.assert_allclose(np.asarray(out_t.sum(-1)), 1.0, rtol=1e-5)


def test_mixup_elem_and_pair_modes():
    """timm elem/pair semantics: targets sum to 1; elem mixes each image
    with the original of its mirror under a per-element lambda; pair
    shares one lambda per (i, B-1-i) pair and leaves an odd middle
    element unmixed."""
    im = jax.random.normal(jax.random.PRNGKey(0), (6, 16, 16, 3))
    lb = jnp.array([0, 1, 2, 3, 4, 5])
    for mode in ("elem", "pair"):
        mix = MixupConfig(num_classes=7, label_smoothing=0.0, prob=1.0,
                          mixup_alpha=0.8, cutmix_alpha=0.0, mode=mode)
        out_im, out_t = apply_mixup(jax.random.PRNGKey(3), im, lb, mix)
        t = np.asarray(out_t)
        np.testing.assert_allclose(t.sum(-1), 1.0, rtol=1e-5)
        # with cutmix off, out[i] = lam_i*im[i] + (1-lam_i)*im[B-1-i] where
        # lam_i is recoverable from the target row
        lam = t[np.arange(6), np.asarray(lb)]
        expect = (lam[:, None, None, None] * np.asarray(im)
                  + (1 - lam[:, None, None, None]) * np.asarray(im[::-1]))
        np.testing.assert_allclose(np.asarray(out_im), expect, atol=1e-5)
        if mode == "pair":
            np.testing.assert_allclose(lam, lam[::-1], rtol=1e-6)
        else:
            assert not np.allclose(lam, lam[::-1])
    # pair with odd batch: middle element must be untouched
    mix = MixupConfig(num_classes=7, label_smoothing=0.0, prob=1.0,
                      mixup_alpha=0.8, cutmix_alpha=1.0, mode="pair")
    im5, lb5 = im[:5], lb[:5]
    out_im, out_t = apply_mixup(jax.random.PRNGKey(4), im5, lb5, mix)
    np.testing.assert_allclose(np.asarray(out_im[2]), np.asarray(im5[2]),
                               atol=1e-6)
    assert float(out_t[2, 2]) == 1.0
    # unknown mode raises loudly (no silent ignore)
    import pytest
    with pytest.raises(ValueError):
        MixupConfig(mode="bogus")


def test_cutmix_minmax_batch_semantics():
    """timm rand_bbox_minmax (reference train.py:134 --cutmix-minmax):
    box side uniform in [dim*min, dim*max), never clipped, lambda taken
    from the exact box area; setting minmax enables cutmix even with
    both alphas at 0 (train.py:314) and forces cutmix_alpha = 1.0."""
    import pytest
    mix = MixupConfig(mixup_alpha=0.0, cutmix_alpha=0.0,
                      cutmix_minmax=(0.25, 0.5), prob=1.0,
                      label_smoothing=0.0, num_classes=4)
    assert mix.enabled and mix.cutmix_alpha == 1.0
    with pytest.raises(ValueError):
        MixupConfig(cutmix_minmax=(0.25,))
    B, H, W = 4, 32, 32
    # distinct constant images so the pasted box is recoverable
    im = jnp.broadcast_to(
        jnp.arange(1.0, B + 1)[:, None, None, None], (B, H, W, 3))
    lb = jnp.array([0, 1, 2, 3])
    for seed in range(4):
        out_im, out_t = apply_mixup(jax.random.PRNGKey(seed), im, lb, mix)
        changed = np.asarray(out_im[0] != im[0])[:, :, 0]
        ys, xs = np.nonzero(changed)
        cut_h = ys.max() - ys.min() + 1
        cut_w = xs.max() - xs.min() + 1
        # exact (unclipped) rectangle with sides in [8, 16)
        assert changed.sum() == cut_h * cut_w
        assert 8 <= cut_h < 16 and 8 <= cut_w < 16
        # pasted content is the mirrored image
        np.testing.assert_array_equal(
            np.asarray(out_im[0])[changed], np.asarray(im[B - 1])[changed])
        # lambda comes from the exact box area
        lam = 1.0 - cut_h * cut_w / (H * W)
        t = np.asarray(out_t)
        np.testing.assert_allclose(t[0, 0], lam, atol=1e-6)
        np.testing.assert_allclose(t[0, B - 1], 1.0 - lam, atol=1e-6)


def test_cutmix_minmax_elem_draws_per_element_boxes():
    mix = MixupConfig(mixup_alpha=0.0, cutmix_alpha=0.0,
                      cutmix_minmax=(0.25, 0.75), prob=1.0,
                      label_smoothing=0.0, num_classes=4, mode="elem")
    B, H, W = 4, 32, 32
    im = jnp.broadcast_to(
        jnp.arange(1.0, B + 1)[:, None, None, None], (B, H, W, 3))
    lb = jnp.array([0, 1, 2, 3])
    out_im, out_t = apply_mixup(jax.random.PRNGKey(7), im, lb, mix)
    t = np.asarray(out_t)
    areas = []
    for i in range(B):
        changed = np.asarray(out_im[i] != im[i])[:, :, 0]
        ys, xs = np.nonzero(changed)
        cut_h = ys.max() - ys.min() + 1
        cut_w = xs.max() - xs.min() + 1
        assert changed.sum() == cut_h * cut_w  # unclipped rectangle
        lam = 1.0 - cut_h * cut_w / (H * W)
        np.testing.assert_allclose(t[i, i], lam, atol=1e-6)
        areas.append(int(changed.sum()))
    assert len(set(areas)) > 1  # per-element boxes, not one shared box


def test_attn_only_freezes_everything_but_attention():
    """--attn-only (reference train.py:372-392): only .attn., head
    (weight/bias), and pos_embed train; patch_embed, cls_token, MLPs,
    norms, and method-added modules freeze."""
    module, cfg = small_model("dyvit")
    x = jnp.ones((1, 32, 32, 3))
    v = module.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    labels = param_labels(v["params"], ["score_predictor"],
                          OptimConfig(attn_only=True))
    from flax import traverse_util
    by_name = {".".join(k): lab
               for k, lab in traverse_util.flatten_dict(labels).items()}
    unfrozen = {n for n, lab in by_name.items() if lab != "frozen"}
    for name in unfrozen:
        assert (".attn." in name or name.startswith("head.")
                or "pos_embed" in name), name
    assert "blocks_0.attn.qkv.kernel" in unfrozen
    assert "blocks_0.attn.proj.bias" in unfrozen
    assert "head.kernel" in unfrozen and "head.bias" in unfrozen
    assert "pos_embed" in unfrozen
    for name in ("cls_token", "patch_embed.proj.kernel",
                 "blocks_0.mlp.fc1.kernel", "blocks_0.norm1.scale",
                 "score_predictor_0.in_fc.kernel"):
        assert by_name[name] == "frozen", name


def test_reference_compat_flags_parse_never_silently(capsys):
    """Verbatim reference command lines parse; platform-only flags are
    accepted with a printed notice (never silently), and the one real
    capability difference raises."""
    import pytest

    from tokenreduction_tpu.train.train_cli import parse_args

    a = parse_args(["--model", "topk_small_patch16_224",
                    "--device", "cuda", "--pin-mem", "--world_size", "4",
                    "--dist_url", "env://", "--resplit"])
    notes = capsys.readouterr().out
    # notices must name the REGISTERED spellings (argparse does not
    # normalize dash/underscore, so --world-size would be a lie)
    for flag in ("--device", "--pin-mem", "--world_size", "--dist_url",
                 "--resplit"):
        assert flag in notes
    assert "--world-size" not in notes and "--dist-url" not in notes
    assert a.train_mode is True and a.attn_only is False
    a2 = parse_args(["--model", "topk_small_patch16_224",
                     "--no-train-mode", "--attn-only",
                     "--cutmix-minmax", "0.2", "0.8"])
    assert a2.train_mode is False and a2.attn_only is True
    assert a2.cutmix_minmax == [0.2, 0.8]
    with pytest.raises(ValueError):
        parse_args(["--model", "topk_small_patch16_224",
                    "--model-ema-force-cpu"])


def test_no_train_mode_uses_eval_forward():
    """StepConfig.train_mode=False (reference --no-train-mode,
    train.py:111-113 + engine set_training_mode) must call the model
    with train=False inside the training step."""
    import optax
    seen = {}

    def apply_fn(p, x, train, rngs):
        seen["train"] = train
        return x.sum() * p["w"]

    def loss_fn(out, targets, images, params):
        return out

    params = {"w": jnp.ones(())}
    tx = optax.sgd(0.1)
    step = make_train_step(apply_fn, loss_fn, tx,
                           StepConfig(grad_accum_steps=1,
                                      train_mode=False))
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=tx.init(params))
    batch = {"image": jnp.ones((2, 4, 4, 3)), "label": jnp.zeros((2,),
                                                                 jnp.int32)}
    step(state, batch, jax.random.PRNGKey(0))
    assert seen["train"] is False


def test_eval_step_counts():
    module, cfg = small_model("topk")
    x = jnp.ones((4, 32, 32, 3))
    params = module.init({"params": jax.random.PRNGKey(0)}, x,
                         train=False)["params"]

    def apply_fn(p, im, train, rngs):
        return module.apply({"params": p}, im, train=train)

    estep = jax.jit(make_eval_step(apply_fn))
    m = estep(params, {"image": x, "label": jnp.array([0, 1, 2, 3])})
    assert int(m["count"]) == 4
    assert 0 <= int(m["correct1"]) <= int(m["correct5"]) <= 4


def test_dyvit_train_loss_runs():
    module, cfg = small_model("dyvit", dyvit_distillation=True)
    tmodule, tcfg = create_model(
        "dyvit_small_patch16_224_teacher", num_classes=5, img_size=32,
        **TINY)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    params = module.init(
        {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)},
        x, train=True)["params"]
    tparams = tmodule.init({"params": jax.random.PRNGKey(2)}, x,
                           train=False)["params"]

    def loss(params):
        out = module.apply({"params": params}, x, train=True,
                           rngs={"gumbel": jax.random.PRNGKey(3)})
        logits, feats, mask, scores = out
        tcls, ttok = tmodule.apply({"params": tparams}, x, train=False)
        base = L.cross_entropy(logits, jnp.array([0, 1]))
        return L.dyvit_distillation_loss(
            base, logits, feats, mask, scores,
            keep_rate=(0.7, 0.49), teacher_cls=tcls, teacher_tokens=ttok,
            mse_token=True)

    val, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val))
    gnorm = sum(float(jnp.abs(g).sum())
                for g in jax.tree_util.tree_leaves(grads))
    assert gnorm > 0


# ------------------------------------------- lr noise + extra optimizers
def test_lr_noise_deterministic_and_bounded():
    from tokenreduction_tpu.train.scheduler import lr_noise_factor

    base = SchedConfig(sched="cosine", lr=1e-3, epochs=10,
                       warmup_epochs=0)
    noisy = SchedConfig(sched="cosine", lr=1e-3, epochs=10,
                        warmup_epochs=0, lr_noise=(0.5,),
                        lr_noise_pct=0.67, lr_noise_std=1.0, seed=3)
    f0, f1 = make_schedule(base), make_schedule(noisy)
    # inactive before 50% of the run
    for t in range(0, 5):
        np.testing.assert_allclose(f1(t), f0(t), rtol=1e-6)
    # active, deterministic per t, multiplicative, |noise| < pct
    hit = False
    for t in range(5, 10):
        a, b = f1(t), f1(t)
        assert a == b
        ratio = a / f0(t)
        assert abs(ratio - 1.0) < 0.67 + 1e-6
        hit = hit or abs(ratio - 1.0) > 1e-4
    assert hit  # noise actually fires somewhere in range
    # two-element range: [start, end)
    win = SchedConfig(sched="constant", lr=1.0, epochs=10,
                      lr_noise=(0.2, 0.5), seed=3)
    fw = make_schedule(win)
    assert fw(1) == 1.0 and fw(7) == 1.0
    assert float(lr_noise_factor(win, 3)) != 1.0


def _run_opt_steps(opt_name, steps=5):
    """Minimize a tiny convex objective with the grouped optimizer."""
    params = {"head": {"kernel": jnp.ones((3, 4)) * 2.0,
                       "bias": jnp.zeros((4,))},
              "blocks_0": {"attn": {"qkv": {
                  "kernel": jnp.ones((3, 9)) * -1.5}}}}
    tx, _ = create_optimizer(
        params, OptimConfig(opt=opt_name, lr=0.05, momentum=0.9),
        lambda s: 0.05, [], steps_per_epoch=1)
    state = tx.init(params)

    def loss(p):
        return sum(jnp.sum(x ** 2)
                   for x in jax.tree_util.tree_leaves(p))

    @jax.jit
    def step(p, s):
        g = jax.grad(loss)(p)
        u, s = tx.update(g, s, p)
        return jax.tree_util.tree_map(lambda a, b: a + b, p, u), s

    l0 = float(loss(params))
    for _ in range(steps):
        params, state = step(params, state)
    return l0, float(loss(params))


def test_adamp_sgdp_nvnovograd_descend():
    for name in ("adamp", "sgdp", "nvnovograd"):
        l0, l1 = _run_opt_steps(name)
        assert np.isfinite(l1) and l1 < l0, (name, l0, l1)


def test_adamp_projection_removes_radial_component():
    from tokenreduction_tpu.train.optim import _project_perturb

    # gradient orthogonal to every channel row -> projection engages and
    # the projected update has no radial (along-p) component
    p = jnp.stack([jnp.array([1.0, 0.0]), jnp.array([0.0, 2.0])], axis=1)
    g = jnp.stack([jnp.array([0.0, 3.0]), jnp.array([4.0, 0.0])], axis=1)
    out, wd = _project_perturb(p, g, g, delta=0.1, wd_ratio=0.01)
    radial = jnp.sum(out.T * (p.T / jnp.linalg.norm(p.T, axis=1,
                                                    keepdims=True)),
                     axis=1)
    np.testing.assert_allclose(np.asarray(radial), 0.0, atol=1e-6)
    np.testing.assert_allclose(float(wd), 0.01, rtol=1e-6)
    # gradient parallel to p -> no projection, wd stays 1
    out2, wd2 = _project_perturb(p, p, p, delta=0.1, wd_ratio=0.01)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(p), atol=1e-6)
    assert float(wd2) == 1.0
    # gradient ANTI-parallel to p (cos ~ -1): timm takes |cos| before the
    # threshold test, so this must NOT trigger the projection either
    out3, wd3 = _project_perturb(p, -p, -p, delta=0.1, wd_ratio=0.01)
    np.testing.assert_allclose(np.asarray(out3), np.asarray(-p),
                               atol=1e-6)
    assert float(wd3) == 1.0


def test_hutchinson_diag_exact_for_diagonal_hessian():
    """For a loss whose Hessian is diagonal, z * (H @ z) == diag(H)
    exactly for any Rademacher z (z^2 == 1) -- the probe is unbiased
    with zero variance, so the estimator must be exact."""
    from tokenreduction_tpu.train.step import (
        hutchinson_grads_and_diag, rademacher_like)

    params = {"a": jnp.array([1.0, -2.0, 0.5]),
              "b": jnp.array([[3.0, -1.0], [0.25, 2.0]])}
    coef = {"a": jnp.array([2.0, 5.0, 0.1]),
            "b": jnp.array([[1.0, 4.0], [0.5, 3.0]])}

    def loss(p):
        # sum_i 0.5 * c_i * p_i^2  ->  H = diag(c)
        return sum(jnp.sum(0.5 * c * x ** 2)
                   for c, x in zip(jax.tree_util.tree_leaves(coef),
                                   jax.tree_util.tree_leaves(p)))

    vg = jax.value_and_grad(loss)
    for seed in (0, 1, 2):
        z = rademacher_like(jax.random.PRNGKey(seed), params)
        lval, grads, diag = hutchinson_grads_and_diag(vg, params, z)
        np.testing.assert_allclose(float(lval), float(loss(params)),
                                   rtol=1e-6)
        for g, c, p in zip(jax.tree_util.tree_leaves(grads),
                           jax.tree_util.tree_leaves(coef),
                           jax.tree_util.tree_leaves(params)):
            np.testing.assert_allclose(np.asarray(g), np.asarray(c * p),
                                       rtol=1e-6)
        for d, c in zip(jax.tree_util.tree_leaves(diag),
                        jax.tree_util.tree_leaves(coef)):
            np.testing.assert_allclose(np.asarray(d), np.asarray(c),
                                       rtol=1e-6)


def test_adahessian_matches_hand_oracle():
    """Grouped adahessian update vs a hand-rolled numpy oracle of the
    timm Adahessian rule (Adam over the squared Hutchinson diagonal,
    decoupled decay p *= 1 - lr*wd; reference optim.py:209-210)."""
    lr, wd, b1, b2, eps = 0.05, 0.1, 0.9, 0.999, 1e-8
    # 2-D backbone kernel -> label "decay" (lr_backbone, wd on)
    params = {"blocks_0": {"mlp": {"kernel": jnp.array(
        [[1.0, -2.0], [0.5, 3.0]])}}}
    tx, labels = create_optimizer(
        params,
        OptimConfig(opt="adahessian", lr=lr, weight_decay=wd,
                    opt_eps=eps),
        lambda s: lr, [], steps_per_epoch=1)
    assert labels["blocks_0"]["mlp"]["kernel"] == "decay"
    state = tx.init(params)

    rng = np.random.RandomState(0)
    p_ref = np.asarray(params["blocks_0"]["mlp"]["kernel"])
    m = np.zeros_like(p_ref)
    v = np.zeros_like(p_ref)
    p = params
    for t in range(1, 4):
        g = rng.randn(2, 2).astype(np.float32)
        h = np.abs(rng.randn(2, 2)).astype(np.float32)
        upd, state = tx.update(
            {"blocks_0": {"mlp": {"kernel": jnp.asarray(g)}}}, state, p,
            hessian_diag={"blocks_0": {"mlp": {"kernel":
                                               jnp.asarray(h)}}})
        p = jax.tree_util.tree_map(lambda a, b: a + b, p, upd)
        # oracle
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * h * h
        bc1, bc2 = 1 - b1 ** t, 1 - b2 ** t
        denom = np.sqrt(v / bc2) + eps
        p_ref = p_ref * (1 - lr * wd) - lr * (m / bc1) / denom
        np.testing.assert_allclose(
            np.asarray(p["blocks_0"]["mlp"]["kernel"]), p_ref,
            rtol=2e-5, atol=1e-7)


def test_adahessian_requires_diag_and_rejects_lookahead():
    import pytest

    params = {"w": jnp.ones((2, 2))}
    tx, _ = create_optimizer(
        params, OptimConfig(opt="adahessian", lr=0.1), lambda s: 0.1,
        [], steps_per_epoch=1)
    state = tx.init(params)
    with pytest.raises(ValueError, match="hessian_diag"):
        tx.update({"w": jnp.ones((2, 2))}, state, params)
    with pytest.raises(ValueError, match="lookahead_adahessian"):
        create_optimizer(params,
                         OptimConfig(opt="lookahead_adahessian", lr=0.1),
                         lambda s: 0.1, [], steps_per_epoch=1)


def test_adahessian_full_train_step_descends():
    """End-to-end: jvp-of-grad Hutchinson through a real reduction model
    (XLA path) + grouped adahessian update + grad accumulation."""
    module, cfg = small_model("topk")
    x = jnp.ones((2, 32, 32, 3))
    params = module.init({"params": jax.random.PRNGKey(0)}, x,
                         train=False)["params"]
    tx, _ = create_optimizer(
        params, OptimConfig(opt="adahessian", lr=2e-3, clip_grad=1.0),
        lambda s: 2e-3, [], steps_per_epoch=2)

    def apply_fn(p, im, train, rngs):
        return module.apply({"params": p}, im, train=train, rngs=rngs)

    step = jax.jit(make_train_step(
        apply_fn, lambda o, t, i, p: L.cross_entropy(o, t), tx,
        StepConfig(grad_accum_steps=2, hutchinson=True,
                   ema_decay=0.9)))
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=tx.init(params), ema_params=params)
    batch = {"image": jax.random.normal(jax.random.PRNGKey(2),
                                        (4, 32, 32, 3)),
             "label": jnp.array([0, 1, 2, 3])}
    losses_seen = []
    for i in range(6):
        state, metrics = step(state, batch, jax.random.PRNGKey(i + 7))
        losses_seen.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses_seen), losses_seen
    assert losses_seen[-1] < losses_seen[0], losses_seen
    assert int(state.step) == 6
    moved = not jnp.allclose(state.params["head"]["kernel"],
                             params["head"]["kernel"])
    assert bool(moved)


def test_pretrained_fetch_uses_cache_and_loads(tmp_path):
    """pretrained=True path: cached-file short-circuit + strict=False
    merge with pos-embed resize through load_pretrained_deit."""
    import torch

    from tokenreduction_tpu.models.convert import (
        fetch_deit_checkpoint,
        load_pretrained_deit,
    )

    # pre-placed file short-circuits the (offline-blocked) download
    fname = tmp_path / "deit_small_patch16_224-cd65a155.pth"
    fname.write_bytes(b"x")
    got = fetch_deit_checkpoint("deit_small_patch16_224",
                                cache_dir=str(tmp_path))
    assert got == str(fname)

    # end-to-end merge from a .pth with torch layouts (local path)
    module, cfg = small_model("topk")
    x = jnp.ones((1, 32, 32, 3))
    params = module.init({"params": jax.random.PRNGKey(0)}, x,
                         train=False)["params"]
    g = torch.Generator().manual_seed(0)
    state = {
        "cls_token": torch.randn(1, 1, 32, generator=g),
        # 7x7 source grid -> resized to our 4x4 (16 tokens @ 32px/8)
        "pos_embed": torch.randn(1, 50, 32, generator=g),
        "blocks.0.attn.qkv.weight": torch.randn(96, 32, generator=g),
        "blocks.0.attn.qkv.bias": torch.randn(96, generator=g),
        "head.weight": torch.randn(9, 32, generator=g),  # wrong classes
    }
    pth = tmp_path / "ckpt.pth"
    torch.save({"model": state}, str(pth))
    merged, report = load_pretrained_deit(params, cfg,
                                          checkpoint_path=str(pth))
    assert "cls_token" in report["loaded"]
    assert "pos_embed" in report["loaded"]
    assert "blocks_0.attn.qkv.kernel" in report["loaded"]
    assert "head.kernel" in report["shape_mismatch"]  # strict=False kept
    np.testing.assert_allclose(
        np.asarray(merged["blocks_0"]["attn"]["qkv"]["kernel"]),
        state["blocks.0.attn.qkv.weight"].numpy().T, rtol=1e-6)
    assert merged["pos_embed"].shape == params["pos_embed"].shape

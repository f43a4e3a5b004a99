"""Checkpoint resume, DeiT distillation training, and DyViT distillation
training through the CLI (reference train.py:516-531, 479-513)."""

import json
import os

COMMON = [
    "--embed-dim", "32", "--num-heads", "2", "--depth", "6",
    "--patch-size", "16",
    "--dataset", "synthetic", "--synthetic-n", "16",
    "--synthetic-classes", "5", "--input-size", "64", "--batch-size", "8",
    "--warmup-epochs", "0", "--no-repeated-aug", "--print-freq", "100",
    "--save_more_than_best",
]


def read_log(out):
    with open(os.path.join(out, "log.txt")) as f:
        return [json.loads(line) for line in f]


def test_resume_continues_epochs(tmp_path):
    from tokenreduction_tpu.train.train_cli import main

    out = str(tmp_path / "run")
    main(["--model", "topk_tiny_patch16_224", "--output_dir", out,
          "--epochs", "1", "--reduction_loc", "1", "3",
          "--keep_rate", "0.7"] + COMMON)
    log1 = read_log(out)
    assert log1[-1]["epoch"] == 0
    ckpt = os.path.join(out, "checkpoint")
    assert os.path.isdir(ckpt)

    main(["--model", "topk_tiny_patch16_224", "--output_dir", out,
          "--epochs", "2", "--reduction_loc", "1", "3",
          "--keep_rate", "0.7", "--resume", ckpt] + COMMON)
    log2 = read_log(out)
    # resumed run starts at epoch 1, not 0
    assert log2[-1]["epoch"] == 1
    epochs_logged = [r["epoch"] for r in log2]
    assert epochs_logged.count(1) == 1


def test_deit_distillation_trains(tmp_path):
    from tokenreduction_tpu.train.train_cli import main

    # teacher: an (untrained) dense deit checkpoint
    teacher_out = str(tmp_path / "teacher")
    main(["--model", "deit_tiny_patch16_224_local",
          "--output_dir", teacher_out, "--epochs", "1"] + COMMON)

    out = str(tmp_path / "student")
    main(["--model", "deit_tiny_patch16_224_local", "--output_dir", out,
          "--epochs", "1", "--distillation-type", "soft",
          "--distillation-tau", "2.0",
          "--teacher-model", "deit_tiny_patch16_224_local",
          "--teacher-path", os.path.join(teacher_out, "best_checkpoint"),
          ] + COMMON)
    log = read_log(out)
    assert log[-1]["train_loss"] > 0
    # distilled student stored the dist token
    meta = json.load(open(os.path.join(out, "best_checkpoint",
                                       "meta.json")))
    assert meta["model_cfg"]["distilled"] is True


def test_deit_distillation_regnety_teacher(tmp_path):
    """The reference's default distillation recipe: a RegNetY convnet
    teacher loaded from a torch .pth (train.py:178 `--teacher-model
    regnety_160`, train.py:455-478 teacher-path load). Tiny capacity via
    the --teacher-regnet-* overrides; same architecture family."""
    import torch

    from oracles_regnet import make_regnet_state
    from tokenreduction_tpu.train.train_cli import main

    tiny = dict(depths=(1, 1), widths=(16, 32), group_width=8,
                stem_width=8)
    state = make_regnet_state(num_classes=5, **tiny)
    pth = str(tmp_path / "regnety_tiny.pth")
    torch.save({"model": state}, pth)

    out = str(tmp_path / "student")
    main(["--model", "deit_tiny_patch16_224_local", "--output_dir", out,
          "--epochs", "1", "--distillation-type", "hard",
          "--teacher-model", "regnety_160",
          "--teacher-path", pth,
          "--teacher-regnet-depths", "1", "1",
          "--teacher-regnet-widths", "16", "32",
          "--teacher-regnet-group-width", "8",
          "--teacher-regnet-stem-width", "8",
          ] + COMMON)
    log = read_log(out)
    assert log[-1]["train_loss"] > 0
    meta = json.load(open(os.path.join(out, "best_checkpoint",
                                       "meta.json")))
    assert meta["model_cfg"]["distilled"] is True


def test_plateau_scheduler_decays(tmp_path):
    """--sched plateau: with a stagnating metric the host rebuilds the
    optimizer with the scaled schedule after patience_epochs, the logged
    LR decays by decay_rate each trigger, and training continues
    (reference scheduler_factory.py:55-69 ReduceLROnPlateau)."""
    from tokenreduction_tpu.train.train_cli import main

    out = str(tmp_path / "plateau")
    # lr tiny but nonzero: params barely move, eval is deterministic, so
    # accuracy stagnates from epoch 1 onward
    main(["--model", "topk_tiny_patch16_224", "--output_dir", out,
          "--epochs", "4", "--reduction_loc", "1", "3",
          "--keep_rate", "0.7", "--sched", "plateau", "--lr", "1e-8",
          "--unscale-lr", "--patience-epochs", "1", "--decay-rate", "0.5",
          "--mixup", "0", "--cutmix", "0", "--opt", "adamw",
          ] + COMMON)
    log = read_log(out)
    lrs = [r["lr"] for r in log]
    accs = [r["test_acc1"] for r in log]
    assert len(lrs) == 4
    # metric stagnated (that is the premise of the decay assertions)
    assert accs[1] == accs[2] == accs[3]
    # epoch 0 sets the plateau baseline; epochs 1.. each trigger a decay
    assert lrs[0] == 1e-8
    assert abs(lrs[1] / lrs[0] - 0.5) < 1e-6
    assert abs(lrs[2] / lrs[1] - 0.5) < 1e-6
    # training continued through the rebuilds
    assert all("train_loss" in r for r in log)


def test_plateau_rebuild_preserves_moments():
    """The optimizer transform rebuilt with a scaled schedule accepts the
    previous opt_state (same structure) and carries the adam moments."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tokenreduction_tpu.train.optim import OptimConfig, create_optimizer

    params = {"head": {"kernel": jnp.ones((4, 4)),
                       "bias": jnp.zeros((4,))}}
    cfg = OptimConfig(opt="adamw", lr=1e-3)
    tx1, _ = create_optimizer(params, cfg, lambda s: 1e-3, [], 1)
    state = tx1.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    _, state = tx1.update(grads, state, params)

    tx2, _ = create_optimizer(params, cfg, lambda s: 0.5e-3, [], 1)
    # same structure: the old state drops straight into the new transform
    updates, state2 = tx2.update(grads, state, params)
    leaves1 = jax.tree_util.tree_leaves(state)
    leaves2 = jax.tree_util.tree_leaves(state2)
    assert len(leaves1) == len(leaves2)
    # second-moment accumulators grew from the carried first-step values,
    # not from zero: nu after two identical unit-grad steps is
    # 1-b2^2 (carried) vs 1-b2 (fresh)
    flat = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(np.asarray, state2))
    b2 = 0.999
    carried = any(np.allclose(leaf, 1 - b2 ** 2)
                  for leaf in flat if np.asarray(leaf).size > 1)
    assert carried


def test_dyvit_distillation_trains(tmp_path):
    from tokenreduction_tpu.train.train_cli import main

    out = str(tmp_path / "dyvit")
    main(["--model", "dyvit_tiny_patch16_224", "--output_dir", out,
          "--epochs", "1", "--reduction_loc", "1", "3",
          "--keep_rate", "0.7", "--dyvit_distill", "--mse_token",
          ] + COMMON)
    log = read_log(out)
    assert log[-1]["train_loss"] > 0
    assert log[-1]["test_acc1"] >= 0


def test_adahessian_cli_restores_pallas_train_env(tmp_path, monkeypatch):
    """adahessian forces the XLA train path for its own run (the
    Hutchinson jvp cannot cross the custom_vjp Pallas kernels) by
    setting TOKENREDUCTION_USE_PALLAS_TRAIN=0; run_training must restore
    the caller's value on exit, or every later first-order run in the
    same process silently loses the Pallas train kernels (~2.9k vs
    ~4.4k img/s)."""
    import os

    from tokenreduction_tpu.train.train_cli import main

    monkeypatch.delenv("TOKENREDUCTION_USE_PALLAS_TRAIN", raising=False)
    out = str(tmp_path / "adahess")
    main(["--model", "topk_tiny_patch16_224", "--output_dir", out,
          "--epochs", "1", "--reduction_loc", "1", "3",
          "--keep_rate", "0.7", "--opt", "adahessian", "--lr", "1e-4",
          "--unscale-lr", "--mixup", "0", "--cutmix", "0"] + COMMON)
    assert "TOKENREDUCTION_USE_PALLAS_TRAIN" not in os.environ
    log = read_log(out)
    assert any("train_loss" in r for r in log)

    monkeypatch.setenv("TOKENREDUCTION_USE_PALLAS_TRAIN", "1")
    main(["--model", "topk_tiny_patch16_224",
          "--output_dir", str(tmp_path / "adahess2"),
          "--epochs", "1", "--reduction_loc", "1", "3",
          "--keep_rate", "0.7", "--opt", "adahessian", "--lr", "1e-4",
          "--unscale-lr", "--mixup", "0", "--cutmix", "0"] + COMMON)
    assert os.environ["TOKENREDUCTION_USE_PALLAS_TRAIN"] == "1"


def test_no_train_mode_restores_pallas_env(tmp_path, monkeypatch):
    """--no-train-mode forces the XLA eval composition for its own run
    (the eval Pallas kernels have no custom_vjp) by setting
    TOKENREDUCTION_USE_PALLAS=0; run_training must restore the caller's
    value on exit, or every later eval/validate in the same process
    silently loses the fused eval kernels."""
    import os

    from tokenreduction_tpu.train.train_cli import main

    monkeypatch.setenv("TOKENREDUCTION_USE_PALLAS", "1")
    out = str(tmp_path / "ntm")
    main(["--model", "topk_tiny_patch16_224", "--output_dir", out,
          "--epochs", "1", "--reduction_loc", "1", "3",
          "--keep_rate", "0.7", "--no-train-mode",
          "--mixup", "0", "--cutmix", "0"] + COMMON)
    assert os.environ["TOKENREDUCTION_USE_PALLAS"] == "1"
    log = read_log(out)
    assert any("train_loss" in r for r in log)

    monkeypatch.delenv("TOKENREDUCTION_USE_PALLAS", raising=False)
    main(["--model", "topk_tiny_patch16_224",
          "--output_dir", str(tmp_path / "ntm2"),
          "--epochs", "1", "--reduction_loc", "1", "3",
          "--keep_rate", "0.7", "--no-train-mode",
          "--mixup", "0", "--cutmix", "0"] + COMMON)
    assert "TOKENREDUCTION_USE_PALLAS" not in os.environ

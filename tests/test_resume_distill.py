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

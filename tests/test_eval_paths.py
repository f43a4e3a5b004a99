"""Eval-only CLI path (reference train.py:532-541 had a latent NameError
here) and multilabel validate CLI."""

import json
import os

import numpy as np

TINY = ["--embed-dim", "32", "--num-heads", "2", "--depth", "6",
        "--patch-size", "16"]


def test_eval_only_cli(tmp_path):
    from tokenreduction_tpu.train.train_cli import main

    stats = main([
        "--model", "topk_tiny_patch16_224", "--dataset", "synthetic",
        "--synthetic-n", "16", "--synthetic-classes", "5",
        "--input-size", "64", "--batch-size", "8", "--epochs", "1",
        "--reduction_loc", "1", "3", "--keep_rate", "0.7",
        "--no-repeated-aug", "--eval"] + TINY)
    assert set(stats) >= {"acc1", "acc5", "loss"}
    assert 0 <= stats["acc1"] <= 100


def test_multilabel_validate_cli(tmp_path):
    from tokenreduction_tpu.evaluation.validate import main as val_main
    from tokenreduction_tpu.train.train_cli import main as train_main

    out = str(tmp_path / "mlrun")
    train_main([
        "--model", "sit_tiny_patch16_224", "--dataset",
        "synthetic_multilabel", "--synthetic-n", "16",
        "--synthetic-classes", "9", "--input-size", "64",
        "--batch-size", "8", "--epochs", "1", "--reduction_loc", "1", "3",
        "--keep_rate", "0.7", "--warmup-epochs", "0", "--no-repeated-aug",
        "--print-freq", "100", "--output_dir", out] + TINY)
    data = val_main([
        "--dataset", "synthetic_multilabel", "--synthetic-n", "16",
        "--input-size", "64", "-b", "8", "--checkpoint", out,
        "--viz_mode", "--output_dir", str(tmp_path),
        "--viz_output_name", "ml.json"])
    # multilabel: Top1/Top5 both carry mAP (reference validate.py:257-260)
    assert data["Top1-Acc"] == data["Top5-Acc"]
    assert 0 <= data["Top1-Acc"] <= 100
    js = json.load(open(os.path.join(str(tmp_path), "ml.json")))
    rec = js[[k for k in js if k.startswith("synthetic_")][0]]
    # multilabel predictions are the sigmoid vector, not top-5 ids
    assert len(rec["Predictions"]) == 9
    assert all(0 <= p <= 1 for p in rec["Predictions"])
    assert "Stage-1" in rec and "Assignment_Maps" in rec["Stage-1"]
    assert np.asarray(rec["Target"]).shape == (9,)


def test_viz_mode_pins_xla_composition():
    """viz extraction must default to the XLA path (bit-stable across
    CPU/TPU); throughput models keep the fused-kernel path eligible."""
    import jax
    import jax.numpy as jnp

    from tokenreduction_tpu import create_model
    from tokenreduction_tpu.core.layers import _pallas_eligible

    assert _pallas_eligible(True, None, force_xla=True) is False

    tiny = dict(num_classes=5, img_size=32, embed_dim=32, num_heads=2,
                depth=2, patch_size=8, reduction_loc=(1,),
                keep_rate=(0.7,))
    x = jnp.ones((1, 32, 32, 3))
    for name in ("topk_small_patch16_224", "ats_small_patch16_224"):
        for viz in (True, False):
            m, _ = create_model(name, viz_mode=viz, **tiny)
            v = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
            bound = m.bind(v)
            assert all(b.force_xla == viz for b in bound.blocks), name


def test_run_table_wandb_api_mode(tmp_path, monkeypatch):
    """from_wandb row rules vs a stubbed wandb.Api (reference
    get_wandb_tables.py:28-66): skip 'Not Best'/'hidden'-tagged,
    running, and no-max_accuracy runs; heuristic_pattern defaults to '';
    epoch defaults to 0; rows sorted by created_at; reference column
    set including epoch/epochs/Created."""
    import sys
    import types

    from tokenreduction_tpu.evaluation import run_table

    class Run:
        def __init__(self, name, tags=(), state="finished",
                     summary=None, config=None, created="2024-01-02"):
            self.name = name
            self.tags = list(tags)
            self.state = state
            self.summary = dict(summary or {})
            self.config = dict(config or {})
            self.created_at = created

    cfg = {"keep_rate": [0.7], "reduction_loc": [3, 6, 9],
           "model": "topk_small_patch16_224", "output_dir": "/o",
           "epochs": 300}
    runs = [
        Run("keep", summary={"max_accuracy": 79.1, "epoch": 299},
            config={**cfg, "heuristic_pattern": "alt"},
            created="2024-01-03"),
        Run("not-best", tags=["Not Best"],
            summary={"max_accuracy": 70.0}, config=cfg),
        Run("hidden", tags=["hidden"],
            summary={"max_accuracy": 71.0}, config=cfg),
        Run("running", state="running",
            summary={"max_accuracy": 72.0}, config=cfg),
        Run("no-acc", summary={"epoch": 3}, config=cfg),
        Run("earlier", tags=["best"],
            summary={"max_accuracy": 78.0},  # no epoch -> 0
            config=cfg,  # no heuristic_pattern -> ''
            created="2024-01-01"),
    ]

    class Api:
        def runs(self, path):
            assert path == "ent/proj"
            return runs

    fake = types.ModuleType("wandb")
    fake.Api = Api
    monkeypatch.setitem(sys.modules, "wandb", fake)

    df = run_table.from_wandb("proj", "ent")
    assert list(df.columns) == run_table.WANDB_COLUMNS
    assert list(df["Name"]) == ["earlier", "keep"]  # created_at order
    row = df[df["Name"] == "earlier"].iloc[0]
    assert row["epoch"] == 0 and row["heuristic_pattern"] == ""
    assert row["epochs"] == 300 and row["Tags"] == "best"
    row = df[df["Name"] == "keep"].iloc[0]
    assert row["max_accuracy"] == 79.1 and row["epoch"] == 299
    assert row["heuristic_pattern"] == "alt"

    # main() in API mode writes the CSV through the same path
    out = str(tmp_path / "table.csv")
    run_table.main(["--wandb_project", "proj", "--wandb_entity", "ent",
                    "--output", out])
    import pandas as pd

    assert list(pd.read_csv(out)["Name"]) == ["earlier", "keep"]

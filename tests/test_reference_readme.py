"""The reference README's literal example commands must work here.

The reference publishes exactly three example command lines
(/root/reference/README.md:28-45: train.py, get_wandb_tables.py,
validate_dirs.py). A user switching frameworks pastes these verbatim,
so each is reproduced below character-for-character with only the
``<angle-bracket>`` placeholders substituted, and must parse (train) or
run (the two drivers, against offline stand-ins for W&B / the run CSV).
"""

import shlex

import pandas as pd


# README.md:31 -- the published training command, verbatim.
REF_TRAIN = (
    "--dataset imagenet --data {data} --batch-size 256 --lr 0.001 "
    "--epochs 30 --warmup-epochs 20 --lr_batch_normalizer 1024 "
    "--sched_in_steps --use_amp --grad_accum_steps 2 "
    "--wandb_project proj --wandb_group grp --output_dir {out} "
    "--model topk_small_patch16_224 --reduction_loc 3 6 9 "
    "--keep_rate 0.9"
)


def test_reference_train_command_parses(tmp_path):
    from tokenreduction_tpu.train.train_cli import parse_args

    args = parse_args(shlex.split(
        REF_TRAIN.format(data=str(tmp_path), out=str(tmp_path))))
    assert args.batch_size == 256
    assert args.epochs == 30 and args.warmup_epochs == 20
    assert args.lr == 0.001 and args.lr_batch_normalizer == 1024
    assert args.sched_in_steps and args.use_amp
    assert args.grad_accum_steps == 2
    assert args.model == "topk_small_patch16_224"
    assert args.reduction_loc == [3, 6, 9]
    assert args.keep_rate == [0.9]


def test_reference_get_wandb_tables_command(tmp_path, monkeypatch):
    """README.md:37 -- the W&B overview export, reference flag
    spellings (--entity/--project/--output_path). The W&B API itself is
    stubbed (zero egress); the assertion is that the verbatim command
    routes to the API path with the right project/entity and writes the
    CSV where asked."""
    from tokenreduction_tpu.evaluation import run_table

    calls = {}

    def fake_from_wandb(project, entity=""):
        calls["project"], calls["entity"] = project, entity
        return pd.DataFrame(columns=["Name", "model", "output_dir"])

    monkeypatch.setattr(run_table, "from_wandb", fake_from_wandb)
    out = tmp_path / "overview.csv"
    run_table.main(shlex.split(
        f"--entity ent --project proj --output_path {out}"))
    assert calls == {"project": "proj", "entity": "ent"}
    assert out.exists()


def test_reference_validate_dirs_command_runs(tmp_path):
    """README.md:43 -- the batch viz-extraction command. Driven against
    an overview CSV with one unreachable row: the command must parse,
    accept --viz_mode/--use_amp, and skip the missing run dir the way
    the reference's path checks do (not crash)."""
    from tokenreduction_tpu.evaluation import validate_dirs

    csv = tmp_path / "overview.csv"
    pd.DataFrame([{"Name": "gone", "model": "topk_small_patch16_224",
                   "output_dir": str(tmp_path / "nonexistent")}]
                 ).to_csv(csv, index=False)
    out = tmp_path / "eval_out"
    validate_dirs.main(shlex.split(
        f"--dataset imagenet --data {tmp_path} --output_dir {out} "
        f"--dataset_csv {csv} --viz_mode --use_amp"))
    assert not (out / "gone_viz_results.json").exists()

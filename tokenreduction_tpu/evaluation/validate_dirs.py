"""Batch validation driver (reference validate_dirs.py): iterate the
run-overview CSV, validate each run's best checkpoint in viz mode, and
write `{Name}_viz_results.json` under --output_dir.

Reference semantics mirrored (validate_dirs.py:16-77): `--dataset_csv`
(`--csv` kept as an alias), `--parent_dir` re-roots the CSV's run paths,
`--overwrite_existing` re-runs rows whose viz JSON already exists, and
plain-deit rows are validated with viz_mode off (accuracy only, no JSON)
instead of being skipped.
"""

from __future__ import annotations

import argparse
import os

import pandas as pd

from tokenreduction_tpu.evaluation import validate as V
from tokenreduction_tpu.evaluation.validate import (
    add_eval_compat_args,
    check_eval_compat_args,
)


def resolve_run_dir(row, parent_dir: str) -> str:
    """The CSV's output_dir points at the run directory (run_table.py
    scan mode) -- or, for W&B exports where output_dir is the parent,
    at output_dir/Name (reference validate_dirs.py:46). Try both,
    re-rooted under --parent_dir."""
    base = str(row["output_dir"])
    if parent_dir and parent_dir != ".":
        # reference: parent_dir + path[1:] (strip the leading "." of
        # relative "./runs/..." paths). Strip exactly the "./" prefix --
        # lstrip("./") would eat "../" and the root of absolute paths.
        if base.startswith("./"):
            base = base[2:]
        # os.path.join keeps absolute output_dir paths absolute.
        base = os.path.join(parent_dir, base)
    joined = os.path.join(base, str(row["Name"]))
    if os.path.basename(os.path.normpath(base)) != str(row["Name"]) \
            and os.path.isdir(joined):
        return joined
    return base


def main(argv=None):
    p = argparse.ArgumentParser("batch validate")
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
    # on by default (this driver exists to produce the viz JSONs); the
    # reference requires the explicit flag (validate_dirs.py:28) --
    # accept it, and offer --no-viz_mode for accuracy-only batch runs
    p.add_argument("--viz_mode", action="store_true", default=True)
    p.add_argument("--no-viz_mode", dest="viz_mode", action="store_false",
                   help="accuracy-only pass for every row (no viz JSON)")
    p.add_argument("--checkpoint", default=None,
                   help="no-op: the checkpoint path comes from each CSV "
                        "row (reference compat, validate_dirs.py:18)")
    add_eval_compat_args(p)
    args = p.parse_args(argv)
    check_eval_compat_args(args)
    if args.checkpoint:
        print("NOTE: --checkpoint is ignored; run dirs come from the "
              "CSV's output_dir/Name columns")

    df = pd.read_csv(args.csv)
    os.makedirs(args.output_dir, exist_ok=True)
    for _, row in df.iterrows():
        model = str(row["model"])
        # plain deit has no reduction stages: accuracy-only pass,
        # no viz JSON (reference validate_dirs.py:57-60)
        viz = args.viz_mode and not (
            model.startswith("deit") and "viz" not in model)
        out_name = f"{row['Name']}_viz_results.json"
        if viz and not args.overwrite_existing and \
                os.path.exists(os.path.join(args.output_dir, out_name)):
            print(f"skip existing {out_name}")
            continue
        run_dir = resolve_run_dir(row, args.parent_dir)
        if not os.path.isdir(run_dir):
            print(f"skip {row['Name']}: no run dir at {run_dir}")
            continue
        print(f"validating {row['Name']}")
        argv_v = [
            "--data", args.data, "--dataset", args.dataset,
            "--checkpoint", run_dir,
            "-b", str(args.batch_size),
            "--input-size", str(args.input_size),
            "--output_dir", args.output_dir,
            "--synthetic-n", str(args.synthetic_n),
        ]
        if viz:
            argv_v += ["--viz_mode", "--viz_output_name", out_name]
        if args.use_amp:
            argv_v += ["--use_amp"]
        if args.num_workers:
            argv_v += ["-j", str(args.num_workers)]
        V.main(argv_v)


if __name__ == "__main__":
    main()

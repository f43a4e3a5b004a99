"""Batch CLS-feature extraction (reference extract_cls_features_dirs.py):
iterate the run-overview CSV and write `{Name}_cls_features_{block}.npy`.

Reference driver flags mirrored (extract_cls_features_dirs.py:30-69):
`--dataset_csv` (`--csv` kept as an alias), `--parent_dir` re-roots the
CSV's run paths, `--overwrite_existing` re-runs rows whose feature files
already exist.
"""

from __future__ import annotations

import argparse
import os

import pandas as pd

from tokenreduction_tpu.evaluation import extract_cls_features as E
from tokenreduction_tpu.evaluation.validate import (
    add_eval_compat_args,
    check_eval_compat_args,
)
from tokenreduction_tpu.evaluation.validate_dirs import resolve_run_dir


def main(argv=None):
    p = argparse.ArgumentParser("batch cls features")
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
    p.add_argument("--viz_mode", action="store_true",
                   help="no-op: extraction always runs the viz forward "
                        "(reference compat)")
    p.add_argument("--checkpoint", default=None,
                   help="no-op: the checkpoint path comes from each CSV "
                        "row (reference compat)")
    add_eval_compat_args(p)
    args = p.parse_args(argv)
    check_eval_compat_args(args)
    if args.checkpoint:
        print("NOTE: --checkpoint is ignored; run dirs come from the "
              "CSV's output_dir/Name columns")

    df = pd.read_csv(args.csv)
    os.makedirs(args.output_dir, exist_ok=True)
    for _, row in df.iterrows():
        name = row["Name"]
        if not args.overwrite_existing and all(
                os.path.exists(os.path.join(
                    args.output_dir, f"{name}_cls_features_{b}.npy"))
                for b in E.EXTRACT_BLOCKS):
            print(f"skip existing {name}")
            continue
        run_dir = resolve_run_dir(row, args.parent_dir)
        if not os.path.isdir(run_dir):
            print(f"skip {name}: no run dir at {run_dir}")
            continue
        print(f"extracting {name}")
        argv_e = [
            "--data", args.data, "--dataset", args.dataset,
            "--checkpoint", run_dir,
            "-b", str(args.batch_size),
            "--input-size", str(args.input_size),
            "--output_dir", args.output_dir,
            "--feature_output_name", f"{name}_cls_features",
            "--synthetic-n", str(args.synthetic_n),
        ]
        if args.use_amp:
            argv_e += ["--use_amp"]
        if args.num_workers:
            argv_e += ["-j", str(args.num_workers)]
        E.main(argv_e)


if __name__ == "__main__":
    main()

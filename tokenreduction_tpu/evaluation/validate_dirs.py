"""Batch validation driver (reference validate_dirs.py): iterate the
run-overview CSV, validate each run's best checkpoint in viz mode, and
write `{Name}_viz_results.json` next to --output_dir."""

from __future__ import annotations

import argparse
import os

import pandas as pd

from tokenreduction_tpu.evaluation import validate as V


def main(argv=None):
    p = argparse.ArgumentParser("batch validate")
    p.add_argument("--csv", required=True)
    p.add_argument("--data", default="")
    p.add_argument("--dataset", "-d", default="imagenet")
    p.add_argument("-b", "--batch-size", default=64, type=int)
    p.add_argument("--input-size", default=224, type=int)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--synthetic-n", default=64, type=int)
    args = p.parse_args(argv)

    df = pd.read_csv(args.csv)
    os.makedirs(args.output_dir, exist_ok=True)
    for _, row in df.iterrows():
        model = str(row["model"])
        if model.startswith("deit") and "viz" not in model:
            continue  # reference validate_dirs.py skips plain deit
        out_name = f"{row['Name']}_viz_results.json"
        if os.path.exists(os.path.join(args.output_dir, out_name)):
            print(f"skip existing {out_name}")
            continue
        print(f"validating {row['Name']}")
        V.main([
            "--data", args.data, "--dataset", args.dataset,
            "--checkpoint", str(row["output_dir"]),
            "-b", str(args.batch_size),
            "--input-size", str(args.input_size),
            "--output_dir", args.output_dir,
            "--viz_mode", "--viz_output_name", out_name,
            "--synthetic-n", str(args.synthetic_n),
        ])


if __name__ == "__main__":
    main()

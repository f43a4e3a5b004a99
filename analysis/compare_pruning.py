"""Pairwise per-image IoU (and IoA in rates mode) of kept-token sets per
reduction stage (reference compare_pruning_{models,rates,capacity}.py).

Usage:
  python -m analysis.compare_pruning --mode models --parent_dir VIZ_DIR \\
      --dataset_csv overview.csv --capacity small \\
      --output_dir OUT --output_file pruning_comparison_models_small_IM.csv
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pandas as pd

from .pairing import iter_pairs
from .utils import (
    get_model_pair,
    image_keys,
    load_overview,
    load_viz,
    stage_tasks_of,
    stages_of,
)


def get_parser():
    p = argparse.ArgumentParser("pruning-pattern comparison")
    p.add_argument("--mode", choices=["models", "rates", "capacity"],
                   default="models")
    p.add_argument("--parent_dir", default="", type=str)
    p.add_argument("--dataset_csv", default="", type=str)
    p.add_argument("--capacity", nargs="+", type=str, default=["small"])
    p.add_argument("--output_file", default="", type=str)
    p.add_argument("--output_dir", default="", type=str)
    return p


def kept_sets(data, img, stage):
    token = set(data[img][stage]["Kept_Token"])
    token.discard(-1)
    return token


def main(argv=None):
    args = get_parser().parse_args(argv)
    os.makedirs(args.output_dir, exist_ok=True)
    caps = None if args.mode == "capacity" else args.capacity
    df = load_overview(args.dataset_csv, capacities=caps)

    rows = []
    cache = {}

    def viz(name):
        if name not in cache:
            cache[name] = load_viz(args.parent_dir, name)
        return cache[name]

    for row1, r1, l1, row2, r2, l2, sym in iter_pairs(df, args.mode):
        d1, d2 = viz(row1["Name"]), viz(row2["Name"])
        if d1 is None or d2 is None:
            continue
        keys1 = image_keys(d1)
        stages1 = stages_of(d1, keys1)
        stages2 = stages_of(d2, image_keys(d2))
        if "Kept_Token" not in stage_tasks_of(d1, keys1, stages1):
            continue
        if "Kept_Token" not in stage_tasks_of(d2, image_keys(d2), stages2):
            continue
        common = [s for s in stages1 if s in stages2]
        ious = {s: [] for s in common}
        ioas = {s: [] for s in common}
        for img in keys1:
            for s in common:
                t1 = kept_sets(d1, img, s)
                t2 = kept_sets(d2, img, s)
                inter = len(t1 & t2)
                union = len(t1 | t2)
                ious[s].append(inter / union if inter and union else 0)
                ioas[s].append(inter / len(t2) if inter and len(t2) else 0)
        m1 = get_model_pair(row1["model"], l1, r1)
        m2 = get_model_pair(row2["model"], l2, r2)
        base = {"Ratio A": r1, "Loc A": l1, "Ratio B": r2, "Loc B": l2}
        iou_ioa = {
            **{f"{s}-Mean-IoA": np.mean(ioas[s]) for s in common},
            **{f"{s}-std-IoA": np.std(ioas[s]) for s in common},
            **{f"{s}-Mean-IoU": np.mean(ious[s]) for s in common},
            **{f"{s}-std-IoU": np.std(ious[s]) for s in common},
        }
        if args.mode == "rates":
            rows.append({"Model A": m1, "Model B": m2, **base, **iou_ioa})
        elif args.mode == "capacity":
            # reference compare_pruning_capacity.py:206-214: single
            # Ratio/Loc (the pair shares them), one row per pair
            rows.append({"Model A": m1, "Model B": m2,
                         "Ratio": r1, "Loc": l1, **iou_ioa})
        else:
            stat = {
                **{f"{s}-Mean": np.mean(ious[s]) for s in common},
                **{f"{s}-std": np.std(ious[s]) for s in common},
            }
            rows.append({"Model A": m1, "Model B": m2, **base, **stat})
            rows.append({"Model A": m2, "Model B": m1,
                         "Ratio A": r2, "Loc A": l2,
                         "Ratio B": r1, "Loc B": l1, **stat})
        print(f"{m1} vs {m2}: {len(common)} stages")

    out = pd.DataFrame(rows)
    out.to_csv(os.path.join(args.output_dir, args.output_file), sep=";",
               index=False)
    print(f"wrote {len(out)} rows")
    return out


if __name__ == "__main__":
    main()

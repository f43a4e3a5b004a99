"""Spearman + Kendall correlation between Acc-Diff and every similarity
metric, grouped per Model A (reference
calculate_correlation_{models,rates,capacity}.py, including the
deit/ratio special-casing)."""

from __future__ import annotations

import argparse
import os

import numpy as np
import pandas as pd
from scipy import stats

META_COLS = ("Model A", "Model B", "Ratio A", "Ratio B", "Acc A", "Acc B",
             "Acc Diff", "Model Reduced A", "Model Reduced B")
RATIOS = ("0.25", "0.5", "0.7", "0.9")


def get_parser():
    p = argparse.ArgumentParser("metric/accuracy correlations")
    p.add_argument("--parent_dir", default="", type=str)
    p.add_argument("--mode", choices=["models", "rates", "capacity"],
                   default="models")
    p.add_argument("--datasets", nargs="+", type=str,
                   default=["IM", "NAB", "COCO", "NUS"])
    p.add_argument("--capacities", nargs="+", type=str,
                   default=["base", "small", "tiny"])
    p.add_argument("--output_dir", default="", type=str)
    return p


def _correlations(model_df, columns, label):
    acc_diff = np.asarray(model_df["Acc Diff"].values, dtype=float)
    results = {"Model": label}
    for col in columns:
        vals = np.asarray(model_df[col].values, dtype=float)
        keep = ~np.isnan(vals)
        if keep.sum() >= 2:
            results[col + "-Spearman"] = stats.spearmanr(
                acc_diff[keep], vals[keep]).correlation
            results[col + "-Kendall"] = stats.kendalltau(
                acc_diff[keep], vals[keep]).correlation
        else:
            results[col + "-Spearman"] = np.nan
            results[col + "-Kendall"] = np.nan
    return results


def _reduced_label(model: str, mode: str) -> str:
    """Group label for the rates/capacity correlation tables.

    rates: the reference strips the trailing '_<ratio>' with a blind
    [:-5] slice (calculate_correlation_rates.py:23) — e.g.
    'topk_..._[3, 6, 9]_0.7' -> 'topk_..._[3, 6, 9' (the bracket goes
    with it); preserved verbatim for CSV equality.
    capacity: method name, with the reference's heuristic-pattern
    special case (calculate_correlation_capacity.py:23)."""
    m = str(model)
    if mode == "rates":
        return m[:-5]
    if "heuristic" in m:
        return m.split("_")[0] + "-" + m.split("_")[3][4:-2]
    return m.split("_")[0]


def _grouped_correlations(df, mode):
    """Reference correlate_{rates,capacity}_data: group rows by the
    reduced model label and correlate Acc Diff against every metric
    column."""
    meta = {"Model A", "Model B", "Acc A", "Acc B", "Acc Diff",
            "Model Reduced"}
    meta |= {"Ratio"} if mode == "capacity" else {"Ratio A", "Ratio B"}
    df = df.copy()
    df["Model Reduced"] = df["Model A"].apply(
        lambda m: _reduced_label(m, mode))
    columns = [c for c in df.columns if c not in meta]
    rows = []
    for model in df["Model Reduced"].unique():
        rows.append(_correlations(df[df["Model Reduced"] == model],
                                  columns, model))
    return pd.DataFrame(rows)


def main(argv=None):
    args = get_parser().parse_args(argv)
    os.makedirs(args.output_dir, exist_ok=True)
    # rates/capacity tables are not per-capacity (reference
    # correlate_{rates,capacity}_data read/write ..._{mode}_{dataset}.csv)
    capacities = args.capacities if args.mode == "models" else [None]
    for dataset in args.datasets:
        for capacity in capacities:
            seg = "" if capacity is None else f"{capacity}_"
            path = os.path.join(
                args.parent_dir,
                f"collated_comparison_{args.mode}_{seg}{dataset}.csv")
            if not os.path.isfile(path):
                continue
            df = pd.read_csv(path, sep=";")
            if not len(df):
                continue
            if args.mode in ("rates", "capacity"):
                out = _grouped_correlations(df, args.mode)
                name = (f"correlations_comparison_{args.mode}_"
                        f"{dataset}.csv")
                out.to_csv(os.path.join(args.output_dir, name), sep=";",
                           index=False)
                print(f"{name}: {len(out)} rows")
                continue
            df["Model Reduced A"] = df["Model A"].apply(
                lambda m: str(m).split("_")[0])
            df["Model Reduced B"] = df["Model B"].apply(
                lambda m: str(m).split("_")[0])
            df["Ratio B"] = df["Ratio B"].replace(np.nan, "1.0").astype(str)
            columns = [c for c in df.columns if c not in META_COLS]

            rows = []
            for model in df["Model A"].unique():
                model_df = df[df["Model A"] == model]
                if "deit" in str(model).lower():
                    for ratio in RATIOS:
                        ratios = [ratio] + (["1.0"] if ratio == "0.9"
                                            else [])
                        sub = model_df[model_df["Ratio B"].isin(ratios)]
                        if len(sub):
                            rows.append(_correlations(
                                sub, columns, str(model) + ratio))
                else:
                    sub = model_df[
                        ~model_df["Model Reduced B"].isin(["deit"])]
                    ratios = None
                    for r in ("0.9", "1.0", "0.7", "0.5", "0.25"):
                        if r in str(model):
                            # keep-1.0 groups with the 0.9 bucket
                            # (reference calculate_correlation_models.py
                            # :70-71 maps '0.9' OR '1.0' -> both)
                            ratios = (["0.9", "1.0"] if r in ("0.9", "1.0")
                                      else [r])
                            break
                    if ratios:
                        sub = sub[sub["Ratio B"].isin(ratios)]
                    if len(sub):
                        rows.append(_correlations(sub, columns, model))
            out = pd.DataFrame(rows)
            name = (f"correlations_comparison_{args.mode}_{capacity}_"
                    f"{dataset}.csv")
            out.to_csv(os.path.join(args.output_dir, name), sep=";",
                       index=False)
            print(f"{name}: {len(out)} rows")


if __name__ == "__main__":
    main()

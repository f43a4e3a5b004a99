"""Join pruning/cluster/cls-feature comparison CSVs with token-stats
accuracies into one table per (capacity, dataset), adding the Acc-Diff
column (reference collate_{models,rates,capacity}_data.py -- note the
reference's collate scripts reference an undefined `tags_dict`
(collate_models_data.py:63); the column set is constructed explicitly
here)."""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pandas as pd

STAGES = [3, 6, 9, 11]
CORR_TAGS = ["CKA", "PWCCA", "Procrustes", "mean_cca_corr",
             "mean_sq_cca_corr"]
CLUSTER_TAGS = ["Completeness", "Homogeneity", "NMI"]


def get_parser():
    p = argparse.ArgumentParser("collate comparison data")
    p.add_argument("--parent_dir", default="", type=str)
    p.add_argument("--mode", choices=["models", "rates", "capacity"],
                   default="models")
    p.add_argument("--datasets", nargs="+", type=str,
                   default=["IM", "NAB", "COCO", "NUS"])
    p.add_argument("--capacities", nargs="+", type=str,
                   default=["base", "small", "tiny"])
    p.add_argument("--output_dir", default="", type=str)
    return p


def main(argv=None):
    args = get_parser().parse_args(argv)
    os.makedirs(args.output_dir, exist_ok=True)
    mode = args.mode

    corr_cols = [f"{s}-{t}" for s in STAGES for t in CORR_TAGS]
    cluster_cols = [f"{t}-Stage-{s}-Mean" for s in STAGES[:3]
                    for t in CLUSTER_TAGS]
    if mode == "models":
        # models: the pruning CSV carries plain Stage-{s}-Mean columns,
        # stored with an -IoU suffix (reference collate_models_data.py:38)
        pruning_cols = [f"Stage-{s}-Mean" for s in STAGES[:3]]
    else:
        # rates/capacity: the pruning CSVs carry explicit IoA/IoU
        # columns, stored verbatim (collate_{rates,capacity}_data.py:38)
        pruning_cols = [f"Stage-{s}-Mean-{t}" for s in STAGES[:3]
                        for t in ("IoA", "IoU")]

    # rates/capacity artifacts are not per-capacity: the reference's
    # collate_{rates,capacity}_data.py read/write
    # {kind}_comparison_{mode}_{dataset}.csv with no capacity segment
    capacities = args.capacities if mode == "models" else [None]

    def fname(kind, capacity, dataset):
        if capacity is None:
            return f"{kind}_comparison_{mode}_{dataset}.csv"
        return f"{kind}_comparison_{mode}_{capacity}_{dataset}.csv"

    results = {}
    for capacity in capacities:
        for dataset in args.datasets:
            base = args.parent_dir
            token_path = os.path.join(base, f"token_stats_{dataset}.json")
            paths = {
                "pruning": os.path.join(
                    base, fname("pruning", capacity, dataset)),
                "cluster": os.path.join(
                    base, fname("cluster", capacity, dataset)),
                "corr": os.path.join(
                    base, fname("cls_features", capacity, dataset)),
            }
            if not os.path.isfile(token_path) or \
                    not os.path.isfile(paths["corr"]):
                continue
            with open(token_path) as f:
                token_stats = json.load(f)
            tables = {}
            for k, p in paths.items():
                tables[k] = pd.read_csv(p, sep=";") if os.path.isfile(p) \
                    else pd.DataFrame(columns=["Model A", "Model B"])

            rows = []
            for _, row in tables["corr"].iterrows():
                ma, mb = row["Model A"], row["Model B"]
                if ma not in token_stats or mb not in token_stats:
                    continue
                rec = {"Model A": ma, "Model B": mb}
                if mode == "capacity":
                    rec["Ratio"] = row.get("Ratio")
                else:
                    rec["Ratio A"] = row.get("Ratio A")
                    rec["Ratio B"] = row.get("Ratio B")
                rec.update({
                    "Acc A": token_stats[ma]["Acc-Top1"],
                    "Acc B": token_stats[mb]["Acc-Top1"],
                    "Acc Diff": token_stats[ma]["Acc-Top1"]
                    - token_stats[mb]["Acc-Top1"],
                })

                def lookup(table, col):
                    sel = table[(table["Model A"] == ma)
                                & (table["Model B"] == mb)]
                    if col in table.columns and len(sel):
                        return sel[col].values[0]
                    return np.nan

                for col in pruning_cols:
                    out_col = col + "-IoU" if mode == "models" else col
                    rec[out_col] = lookup(tables["pruning"], col)
                for col in cluster_cols:
                    rec[col] = lookup(tables["cluster"], col)
                for col in corr_cols:
                    rec[col] = lookup(tables["corr"], col)
                rows.append(rec)

            out = pd.DataFrame(rows)
            if len(out):
                out = out.sort_values(by=["Model A", "Model B"])
            name = fname("collated", capacity, dataset)
            out.to_csv(os.path.join(args.output_dir, name), sep=";",
                       index=False)
            results[(capacity, dataset)] = out
            print(f"{name}: {len(out)} rows")
    return results


if __name__ == "__main__":
    main()

"""Cross-dataset comparison of 14x14 Mean-Token-Depth-Spatial maps with
KL/JS/PCC/SCC/EMD/SIM (reference compare_heatmaps.py). Soft/merging
methods and deit are excluded (their depth maps are undefined)."""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pandas as pd

from . import heatmap_metrics as hm

EXCLUDE = ("sinkhorn", "patchmerger", "heuristic", "sit", "tome", "deit")
DATASET_TAGS = ("IM", "NAB", "COCO", "NUS")


def tag_of(path: str) -> str:
    for t in DATASET_TAGS:
        if t in os.path.basename(path):
            return t
    return os.path.basename(path)


def get_parser():
    p = argparse.ArgumentParser("heatmap comparison")
    for t in DATASET_TAGS:
        p.add_argument(f"--dataset_{t}", default="", type=str)
    p.add_argument("--input_path", default="", type=str)
    p.add_argument("--output_path", default=".", type=str)
    p.add_argument("--compare_within_dataset", action="store_true")
    p.add_argument("--compare_across_rates", action="store_true")
    p.add_argument("--compare_across_capacities", action="store_true")
    p.add_argument("--compare_across_models", action="store_true")
    return p


def main(argv=None):
    args = get_parser().parse_args(argv)
    datasets = [getattr(args, f"dataset_{t}") for t in DATASET_TAGS]
    datasets = [d for d in datasets if d]
    emd_dist = hm.create_emd_dist(14, 14)

    loaded = {}
    for d in datasets:
        with open(os.path.join(args.input_path, d)) as f:
            loaded[d] = json.load(f)

    rows = []
    seen_ds = set()
    for d1 in datasets:
        for d2 in datasets:
            if tuple(sorted((d1, d2))) in seen_ds:
                continue
            seen_ds.add(tuple(sorted((d1, d2))))
            if not args.compare_within_dataset and d1 == d2:
                continue
            data1, data2 = loaded[d1], loaded[d2]
            models = sorted(set(data1) & set(data2))
            models = [m for m in models
                      if not any(x in m for x in EXCLUDE)]
            seen_pair = set()
            for m1 in models:
                if "Mean-Token-Depth-Spatial" not in data1[m1]:
                    continue
                p1 = np.reshape(
                    data1[m1]["Mean-Token-Depth-Spatial"], (14, 14))
                s1 = m1.split("_")
                for m2 in models:
                    if "Mean-Token-Depth-Spatial" not in data2[m2]:
                        continue
                    if tuple(sorted((m1, m2))) in seen_pair:
                        continue
                    s2 = m2.split("_")
                    if not args.compare_across_models and s1[0] != s2[0]:
                        continue
                    if not args.compare_across_capacities and \
                            s1[1] != s2[1]:
                        continue
                    if not args.compare_across_rates and \
                            data1[m1]["Ratio"] != data2[m2]["Ratio"]:
                        continue
                    seen_pair.add(tuple(sorted((m1, m2))))
                    p2 = np.reshape(
                        data2[m2]["Mean-Token-Depth-Spatial"], (14, 14))
                    rows.append({
                        "Dataset1": tag_of(d1), "Dataset2": tag_of(d2),
                        "Model1": m1, "Model2": m2,
                        "KLD12": hm.KL(p1, p2), "KLD21": hm.KL(p2, p1),
                        "JSD": hm.JS(p1, p2), "PCC": hm.PCC(p1, p2),
                        "SCC": hm.SCC(p1, p2),
                        "EMD": hm.EMD(p1, p2, emd_dist),
                        "SIM": hm.SIM(p1, p2),
                    })
    out = pd.DataFrame(rows)
    if len(out):
        out = out.sort_values(
            by=["Dataset1", "Dataset2", "Model1", "Model2"])
    out.to_csv(os.path.join(args.output_path, "heatmap_comparison.csv"),
               sep=";", index=False)
    print(f"wrote {len(out)} rows")
    return out


if __name__ == "__main__":
    main()

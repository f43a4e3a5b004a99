"""Per-model mean reduction rate per stage and per-token mean depth
(reference compute_token_statistics.py): for every model run, the fraction
of tokens surviving each stage and, for pruning models, the stage at which
each of the 196 spatial tokens is dropped (survivors get depth 12). Output
token_stats JSON keyed by model-pair name, including the spatial
Mean-Token-Depth map consumed by compare_heatmaps.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from .utils import (
    get_model_pair,
    image_keys,
    load_overview,
    load_viz,
    parse_ratio_loc,
    stage_tasks_of,
    stages_of,
)

MAX_DEPTH = 12
BASE_PATCH_COUNT = 14 * 14


def get_parser():
    p = argparse.ArgumentParser("token statistics")
    p.add_argument("--parent_dir", default="", type=str)
    p.add_argument("--dataset_csv", default="", type=str)
    p.add_argument("--output_file", default="", type=str)
    p.add_argument("--output_dir", default="", type=str)
    return p


def main(argv=None):
    args = get_parser().parse_args(argv)
    os.makedirs(args.output_dir, exist_ok=True)
    df = load_overview(args.dataset_csv)
    df = df.sort_values(by=["model", "keep_rate"],
                        ascending=[True, False])

    model_dict = {}
    for _, row in df.iterrows():
        name = row["Name"]
        model = row["model"]
        if "deit" not in str(model):
            ratio, loc = parse_ratio_loc(row)
        else:
            ratio, loc = "", ""
        data = load_viz(args.parent_dir, name)
        if data is None:
            continue
        keys = image_keys(data)
        acc1, acc5 = data["Top1-Acc"], data["Top5-Acc"]

        if "deit" in str(model):
            stages = list(range(MAX_DEPTH))
            tasks = []
        else:
            stages = stages_of(data, keys)
            tasks = stage_tasks_of(data, keys, stages)
        kept_tokens = "Kept_Token" in tasks
        assign_maps = "Assignment_Maps" in tasks

        if "deit" in str(model):
            stage_red = {s: [1.0] for s in stages}
            depth_lists = [[MAX_DEPTH] for _ in range(BASE_PATCH_COUNT)]
        else:
            stage_red = {s: [] for s in stages}
            depth_lists = [[] for _ in range(BASE_PATCH_COUNT)]
            for img in keys:
                rec = data[img]
                prev = set(range(BASE_PATCH_COUNT))
                for s in stages:
                    if kept_tokens:
                        tok = set(rec[s]["Kept_Token"])
                        tok.discard(-1)
                    elif assign_maps:
                        tok = set(rec[s]["Assignment_Maps"])
                    else:
                        continue
                    dropped = prev.difference(tok)
                    prev = tok
                    stage_red[s].append(len(tok) / BASE_PATCH_COUNT)
                    if kept_tokens:
                        depth = int(s[6:])
                        for idx in dropped:
                            if idx < BASE_PATCH_COUNT:
                                depth_lists[idx].append(depth)
                if kept_tokens:
                    for idx in prev:
                        if isinstance(idx, (int, np.integer)) and \
                                idx < BASE_PATCH_COUNT:
                            depth_lists[idx].append(MAX_DEPTH)

        res = {
            "Model": model,
            "Acc-Top1": acc1,
            "Acc-Top5": acc5,
            "Ratio": ratio,
            "Loc": loc,
            "Stages": list(stages),
            "Mean-Reduction": [float(np.mean(stage_red[s]))
                               for s in stages],
            "Std-Reduction": [float(np.std(stage_red[s]))
                              for s in stages],
        }
        if kept_tokens or "deit" in str(model):
            spatial_mean = [float(np.mean(d)) if d else 0.0
                            for d in depth_lists]
            spatial_std = [float(np.std(d)) if d else 0.0
                           for d in depth_lists]
            global_list = [v for d in depth_lists for v in d]
            res.update({
                "Mean-Token-Depth": float(np.mean(global_list)),
                "Std-Token-Depth": float(np.std(global_list)),
                "Mean-Token-Depth-Spatial": spatial_mean,
                "Std-Token-Depth-Spatial": spatial_std,
            })
        key = get_model_pair(model, loc, ratio)
        model_dict[key] = res
        print(key, list(stages))

    with open(os.path.join(args.output_dir, args.output_file), "w") as f:
        json.dump(model_dict, f, indent=4)
    return model_dict


if __name__ == "__main__":
    main()

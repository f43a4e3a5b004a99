"""Shared helpers for the offline analysis suite.

Consumes the artifacts written by tokenreduction_tpu.evaluation:
`{Name}_viz_results.json`, `{Name}_cls_features_{block}.npy`, and the
run-overview CSV. Formats/semantics follow the reference
reduction_methods_analysis/ so downstream tooling is interchangeable.
"""

from __future__ import annotations

import json
import os
from typing import List, Tuple

import numpy as np
import pandas as pd

HEADER_KEYS = ("Model", "Ratio", "Location", "Top1-Acc", "Top5-Acc",
               "Params")


def get_model_pair(model, loc, ratio) -> str:
    """Canonical run key (reference analysis_utils.py:3-4)."""
    return model + "-" + "_".join(str(x) for x in loc) + "-" + "_" + \
        str(ratio)


def map_cluster_centers(stage1, stage2, cluster1=None, cluster2=None,
                        first_stage=True):
    """Chain per-stage cluster assignments into absolute-token labels
    (reference analysis_utils.py:6-28): relabel each token's current
    cluster id by that cluster's id in the new stage's assignment."""
    s1 = np.asarray(stage1)
    s2 = np.asarray(stage2)
    if first_stage:
        return s1.copy(), s2.copy()
    out1 = cluster1.copy()
    for idx in range(len(s1)):
        out1[cluster1 == idx] = s1[idx]
    out2 = cluster2.copy()
    for idx in range(len(s2)):
        out2[cluster2 == idx] = s2[idx]
    return out1, out2


def load_overview(path: str, capacities=None) -> pd.DataFrame:
    df = pd.read_csv(path, sep=",")
    df["heuristic_pattern"] = df.get(
        "heuristic_pattern", pd.Series([""] * len(df))).fillna("")
    df["model"] = df.apply(
        lambda r: (r["model"] + "-" + str(r["heuristic_pattern"]))
        if "heuristic" in str(r["model"]) else r["model"], axis=1)
    if capacities:
        df = df[df["model"].apply(
            lambda m: any(c in str(m) for c in capacities))]
    return df


def parse_ratio_loc(row) -> Tuple[object, List[int]]:
    ratio = str(row["keep_rate"]).replace("[", "").replace("]", "")
    ratio = float(ratio.split(",")[0]) if ratio.strip() else ""
    loc_s = str(row["reduction_loc"]).replace("[", "").replace("]", "")
    loc = [int(x) for x in loc_s.split(",")] if loc_s.strip() else ""
    return ratio, loc


def load_viz(parent_dir: str, name: str):
    path = os.path.join(parent_dir, f"{name}_viz_results.json")
    if not os.path.isfile(path):
        return None
    with open(path) as f:
        return json.load(f)


def image_keys(data: dict) -> List[str]:
    return [k for k in data if k not in HEADER_KEYS]


def stages_of(data: dict, keys: List[str]) -> List[str]:
    return [s for s in data[keys[0]] if s.startswith("Stage")]


def stage_tasks_of(data: dict, keys: List[str], stages) -> List[str]:
    return list(data[keys[0]][stages[0]].keys())


def is_continuous(model: str) -> bool:
    """Heuristic/ATS reduce at every block in a range / variable counts
    (reference compare_pruning_models.py:68-71)."""
    return "heuristic" in model or "ats" in model

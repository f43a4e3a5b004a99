"""Pairwise per-image homogeneity / completeness / NMI on chained cluster
assignments (reference compare_merging_{models,rates,capacity}.py).
homogeneity(a,b) == completeness(b,a), so the reversed row swaps them.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pandas as pd
from sklearn.metrics import homogeneity_completeness_v_measure

from .pairing import iter_pairs
from .utils import (
    get_model_pair,
    image_keys,
    load_overview,
    load_viz,
    map_cluster_centers,
    stage_tasks_of,
    stages_of,
)


def get_parser():
    p = argparse.ArgumentParser("merging-pattern comparison")
    p.add_argument("--mode", choices=["models", "rates", "capacity"],
                   default="models")
    p.add_argument("--parent_dir", default="", type=str)
    p.add_argument("--dataset_csv", default="", type=str)
    p.add_argument("--capacity", nargs="+", type=str, default=["small"])
    p.add_argument("--output_file", default="", type=str)
    p.add_argument("--output_dir", default="", type=str)
    return p


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
        if "Assignment_Maps" not in stage_tasks_of(d1, keys1, stages1):
            continue
        if "Assignment_Maps" not in stage_tasks_of(
                d2, image_keys(d2), stages2):
            continue
        common = [s for s in stages1 if s in stages2]
        homo = {s: [] for s in common}
        comp = {s: [] for s in common}
        nmi = {s: [] for s in common}
        for img in keys1:
            c1 = c2 = None
            for s in stages1:
                if s not in stages2:
                    continue
                a1 = d1[img][s]["Assignment_Maps"]
                a2 = d2[img][s]["Assignment_Maps"]
                c1, c2 = map_cluster_centers(
                    a1, a2, c1, c2, first_stage=(s == stages1[0]))
                if args.mode == "rates":
                    # the reference's rates variant alone swaps the
                    # argument order (compare_merging_rates.py:177 vs
                    # _models/_capacity:209) — quirk preserved verbatim
                    h, c, v = homogeneity_completeness_v_measure(c2, c1)
                else:
                    h, c, v = homogeneity_completeness_v_measure(c1, c2)
                homo[s].append(h)
                comp[s].append(c)
                nmi[s].append(v)
        m1 = get_model_pair(row1["model"], l1, r1)
        m2 = get_model_pair(row2["model"], l2, r2)

        def stats(hd, cd):
            return {
                **{f"Homogeneity-{s}-Mean": np.mean(hd[s]) for s in common},
                **{f"Homogeneity-{s}-std": np.std(hd[s]) for s in common},
                **{f"Completeness-{s}-Mean": np.mean(cd[s])
                   for s in common},
                **{f"Completeness-{s}-std": np.std(cd[s]) for s in common},
                **{f"NMI-{s}-Mean": np.mean(nmi[s]) for s in common},
                **{f"NMI-{s}-std": np.std(nmi[s]) for s in common},
            }

        if args.mode == "capacity":
            # reference compare_merging_capacity.py:214-223: single
            # Ratio/Loc, one row per pair
            rows.append({"Model A": m1, "Model B": m2, "Ratio": r1,
                         "Loc": l1, **stats(homo, comp)})
        else:
            rows.append({"Model A": m1, "Model B": m2, "Ratio A": r1,
                         "Loc A": l1, "Ratio B": r2, "Loc B": l2,
                         **stats(homo, comp)})
            if sym:
                rows.append({"Model A": m2, "Model B": m1, "Ratio A": r2,
                             "Loc A": l2, "Ratio B": r1, "Loc B": l1,
                             **stats(comp, homo)})
        print(f"{m1} vs {m2}: {len(common)} stages")

    out = pd.DataFrame(rows)
    out.to_csv(os.path.join(args.output_dir, args.output_file), sep=";",
               index=False)
    print(f"wrote {len(out)} rows")
    return out


if __name__ == "__main__":
    main()

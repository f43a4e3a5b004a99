"""Pairwise CLS-feature similarity at blocks {3, 6, 9, 11}
(reference compare_cls_features_{models,rates,capacity}.py):
PWCCA / mean(-sq) CCA corr / linear CKA / Procrustes on mean-centered,
Frobenius-normalized (D, n_images) matrices.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pandas as pd

from . import feature_metrics as fm
from .pairing import iter_pairs
from .utils import get_model_pair, load_overview

COMP_LOCS = (3, 6, 9, 11)


def get_parser():
    p = argparse.ArgumentParser("cls-feature comparison")
    p.add_argument("--mode", choices=["models", "rates", "capacity"],
                   default="models")
    p.add_argument("--parent_dir", default="", type=str)
    p.add_argument("--dataset_csv", default="", type=str)
    p.add_argument("--capacity", nargs="+", type=str, default=["small"])
    p.add_argument("--output_file", default="", type=str)
    p.add_argument("--output_dir", default="", type=str)
    p.add_argument("--include_deit", action="store_true",
                   help="models mode in the reference also compares "
                   "against the dense deit run")
    return p


def main(argv=None):
    args = get_parser().parse_args(argv)
    os.makedirs(args.output_dir, exist_ok=True)
    caps = None if args.mode == "capacity" else args.capacity
    df = load_overview(args.dataset_csv, capacities=caps)

    def feat(name, loc):
        path = os.path.join(args.parent_dir,
                            f"{name}_cls_features_{loc}.npy")
        if not os.path.isfile(path):
            return None
        return fm.preprocess(np.load(path))

    rows = []
    for row1, r1, l1, row2, r2, l2, sym in iter_pairs(df, args.mode):
        m1 = get_model_pair(row1["model"], l1, r1)
        m2 = get_model_pair(row2["model"], l2, r2)
        if args.mode == "capacity":
            # reference compare_cls_features_capacity.py:115-118:
            # single Ratio/Loc, one row per pair
            res1 = {"Model A": m1, "Model B": m2, "Ratio": r1, "Loc": l1}
        else:
            res1 = {"Model A": m1, "Model B": m2, "Ratio A": r1,
                    "Loc A": l1, "Ratio B": r2, "Loc B": l2}
        res2 = {"Model A": m2, "Model B": m1, "Ratio A": r2, "Loc A": l2,
                "Ratio B": r1, "Loc B": l1}
        ok = True
        for loc in COMP_LOCS:
            a = feat(row1["Name"], loc)
            b = feat(row2["Name"], loc)
            if a is None or b is None:
                ok = False
                break
            _, rho, _, ta, _ = fm.cca_decomp(a, b)
            metrics = {
                f"{loc}-PWCCA": fm.pwcca_dist(a, rho, ta),
                f"{loc}-mean_sq_cca_corr": fm.mean_sq_cca_corr(rho),
                f"{loc}-mean_cca_corr": fm.mean_cca_corr(rho),
                f"{loc}-CKA": fm.lin_cka_dist(a, b),
                f"{loc}-Procrustes": fm.procrustes(a, b),
            }
            res1.update(metrics)
            res2.update(metrics)
        if not ok:
            continue
        rows.append(res1)
        if sym:
            rows.append(res2)
        print(f"{m1} vs {m2}")

    out = pd.DataFrame(rows)
    out.to_csv(os.path.join(args.output_dir, args.output_file), sep=";",
               index=False)
    print(f"wrote {len(out)} rows")
    return out


if __name__ == "__main__":
    main()

"""Run-pair enumeration shared by the compare_* scripts.

Three pairing modes, mirroring the reference's *_models / *_rates /
*_capacity script triplets:
- models:   different methods, same ratio+loc (continuous methods --
            heuristic/ats -- pair by multi-location-ness instead)
- rates:    same method, ratio1 > ratio2, same loc
- capacity: same method across capacities (base > small > tiny), same
            ratio+loc
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from .utils import is_continuous, parse_ratio_loc


def _capacity_of(model: str) -> str:
    parts = str(model).split("_")
    return parts[1] if len(parts) > 1 else ""


def _reduced_name(model: str) -> str:
    cap = _capacity_of(model)
    return str(model).replace(f"_{cap}_", "_", 1)


def iter_pairs(df: pd.DataFrame, mode: str) -> Iterator[Tuple]:
    """Yields (row1, ratio1, loc1, row2, ratio2, loc2, symmetric) with
    symmetric=True when the metric should be emitted in both orders."""
    seen = set()
    for _, row1 in df.iterrows():
        model1 = row1["model"]
        if "deit" in str(model1):
            continue
        if mode == "capacity" and _capacity_of(model1) == "tiny":
            continue
        ratio1, loc1 = parse_ratio_loc(row1)
        for _, row2 in df.iterrows():
            model2 = row2["model"]
            if "deit" in str(model2):
                continue
            if row1["Name"] == row2["Name"]:
                continue
            ratio2, loc2 = parse_ratio_loc(row2)

            if mode == "models":
                if model1 == model2:
                    continue
                if not is_continuous(model1) and not is_continuous(model2):
                    if ratio1 != ratio2 or loc1 != loc2:
                        continue
                else:
                    if (len(loc1) != 1) != (len(loc2) != 1):
                        continue
                symmetric = True
            elif mode == "rates":
                if model1 != model2:
                    continue
                if ratio1 == "" or ratio2 == "" or ratio1 <= ratio2:
                    continue
                if loc1 != loc2:
                    continue
                symmetric = False
            elif mode == "capacity":
                if _reduced_name(model1) != _reduced_name(model2):
                    continue
                c1, c2 = _capacity_of(model1), _capacity_of(model2)
                order = {"base": 2, "small": 1, "tiny": 0}
                if order.get(c1, -1) <= order.get(c2, -1):
                    continue
                if ratio1 != ratio2 or loc1 != loc2:
                    continue
                # single direction, Model A = higher capacity — the
                # reference capacity scripts skip tiny as model1 and
                # never append a reverse row
                # (compare_pruning_capacity.py:53-54, 214)
                symmetric = False
            else:
                raise ValueError(mode)

            key = tuple(sorted((row1["Name"], row2["Name"])))
            if symmetric:
                if key in seen:
                    continue
                seen.add(key)
            yield row1, ratio1, loc1, row2, ratio2, loc2, symmetric

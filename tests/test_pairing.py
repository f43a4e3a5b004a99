"""Unit tests for analysis/pairing.py — the run-pair enumeration shared
by the compare_* scripts (reference compare_pruning_models.py:120-141 /
_rates.py:98-105 / _capacity.py pairing loops). The e2e analysis tests
exercise it through full artifact runs; these pin the pairing rules
themselves on a hand-built overview table.
"""

import pandas as pd

from analysis.pairing import iter_pairs


def _row(name, model, rate="[0.7]", loc="[3, 6, 9]"):
    return {"Name": name, "model": model, "keep_rate": rate,
            "reduction_loc": loc}


def _names(df, mode):
    return sorted(tuple(sorted((r1["Name"], r2["Name"])))
                  for r1, _, _, r2, _, _, _ in iter_pairs(df, mode))


def test_models_mode_pairs_methods_at_same_rate_and_loc():
    df = pd.DataFrame([
        _row("topk07", "topk_small_patch16_224"),
        _row("evit07", "evit_small_patch16_224"),
        _row("evit05", "evit_small_patch16_224", rate="[0.5]"),
        _row("deit", "deit_small_patch16_224_local", rate="", loc=""),
    ])
    pairs = _names(df, "models")
    # only the same-(rate, loc) cross-method pair; deit never pairs;
    # symmetric pairs are emitted once
    assert pairs == [("evit07", "topk07")]


def test_models_mode_pairs_continuous_methods_by_multi_location():
    """Heuristic/ATS have no comparable keep_rate semantics: the
    reference pairs them with discrete methods by single- vs
    multi-location agreement instead (compare_pruning_models.py:68-71)."""
    df = pd.DataFrame([
        _row("topk", "topk_small_patch16_224"),
        _row("heur_multi", "heuristic_small_patch16_224", rate="[0.9]"),
        _row("heur_single", "heuristic_small_patch16_224",
             rate="[0.9]", loc="[3]"),
    ])
    pairs = _names(df, "models")
    assert ("heur_multi", "topk") in pairs
    assert ("heur_single", "topk") not in pairs


def test_rates_mode_orders_high_to_low_within_a_method():
    df = pd.DataFrame([
        _row("topk09", "topk_small_patch16_224", rate="[0.9]"),
        _row("topk05", "topk_small_patch16_224", rate="[0.5]"),
        _row("evit07", "evit_small_patch16_224"),
    ])
    got = [(r1["Name"], r2["Name"], sym)
           for r1, _, _, r2, _, _, sym in iter_pairs(df, "rates")]
    # exactly one ordered (ratio1 > ratio2), asymmetric pair
    assert got == [("topk09", "topk05", False)]


def test_capacity_mode_orders_base_over_small_and_skips_tiny_lhs():
    df = pd.DataFrame([
        _row("t", "topk_tiny_patch16_224"),
        _row("s", "topk_small_patch16_224"),
        _row("b", "topk_base_patch16_224"),
    ])
    got = {(r1["Name"], r2["Name"])
           for r1, _, _, r2, _, _, _ in iter_pairs(df, "capacity")}
    # larger capacity always on the left; tiny never leads a pair
    assert got == {("b", "s"), ("b", "t"), ("s", "t")}


def test_capacity_mode_requires_same_method_rate_and_loc():
    df = pd.DataFrame([
        _row("s", "topk_small_patch16_224"),
        _row("b_other_rate", "topk_base_patch16_224", rate="[0.5]"),
        _row("b_other_method", "evit_base_patch16_224"),
    ])
    assert _names(df, "capacity") == []

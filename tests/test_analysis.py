"""Analysis suite: metric unit tests + the full artifact chain
(train -> validate viz -> extract -> token stats -> compare ->
collate -> correlate), mirroring SURVEY.md section 3.5."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

TINY = ["--embed-dim", "32", "--num-heads", "2", "--depth", "12",
        "--patch-size", "16"]
TRAIN_ARGS = [
    "--dataset", "synthetic", "--synthetic-n", "24",
    "--synthetic-classes", "7", "--input-size", "64", "--batch-size", "8",
    "--epochs", "1", "--reduction_loc", "3", "6", "9",
    "--keep_rate", "0.7", "--warmup-epochs", "0", "--no-repeated-aug",
    "--print-freq", "100",
] + TINY


@pytest.fixture(scope="module")
def artifact_dir(tmp_path_factory):
    """Two pruning + two merging tiny runs with viz + features + CSVs."""
    root = tmp_path_factory.mktemp("runs")
    from tokenreduction_tpu.evaluation.extract_cls_features import (
        main as extract_main)
    from tokenreduction_tpu.evaluation.run_table import scan_output_dirs
    from tokenreduction_tpu.evaluation.validate import main as val_main
    from tokenreduction_tpu.train.train_cli import main as train_main

    viz_dir = str(root / "viz")
    os.makedirs(viz_dir, exist_ok=True)
    for method in ("topk", "evit", "sit", "sinkhorn"):
        out = str(root / f"{method}_small_run")
        train_main(["--model", f"{method}_small_patch16_224",
                    "--output_dir", out] + TRAIN_ARGS)
        val_main(["--dataset", "synthetic", "--synthetic-n", "24",
                  "--input-size", "64", "-b", "8", "--checkpoint", out,
                  "--viz_mode", "--output_dir", viz_dir,
                  "--viz_output_name",
                  f"{method}_small_run_viz_results.json"])
        # CCA needs n_images > feature dim (32 with the tiny override)
        extract_main(["--dataset", "synthetic", "--synthetic-n", "48",
                      "--input-size", "64", "-b", "8",
                      "--checkpoint", out, "--output_dir", viz_dir,
                      "--feature_output_name",
                      f"{method}_small_run_cls_features"])
    df = scan_output_dirs(str(root))
    csv = str(root / "overview.csv")
    df.to_csv(csv, index=False)
    return {"root": str(root), "viz": viz_dir, "csv": csv}


def test_token_statistics(artifact_dir):
    from analysis.compute_token_statistics import main

    stats = main(["--parent_dir", artifact_dir["viz"],
                  "--dataset_csv", artifact_dir["csv"],
                  "--output_dir", artifact_dir["viz"],
                  "--output_file", "token_stats_IM.json"])
    assert len(stats) == 4
    topk_key = [k for k in stats if "topk" in k][0]
    rec = stats[topk_key]
    # reduction schedule 0.7^(s+1) on 16 patches: 11, 7, 4 kept tokens;
    # the analysis normalizes by the paper's 196-patch grid (reference
    # compute_token_statistics.py:95 hardcodes 14*14)
    np.testing.assert_allclose(
        rec["Mean-Reduction"], [11 / 196, 7 / 196, 5 / 196], atol=1e-6)
    assert "Mean-Token-Depth-Spatial" in rec
    assert 3 <= rec["Mean-Token-Depth"] <= 12
    # merging model has reductions but no depth map
    sit_key = [k for k in stats if "sit" in k][0]
    assert "Mean-Token-Depth" not in stats[sit_key]


def test_compare_pruning_models(artifact_dir):
    from analysis.compare_pruning import main

    out = main(["--mode", "models",
                "--parent_dir", artifact_dir["viz"],
                "--dataset_csv", artifact_dir["csv"],
                "--capacity", "small",
                "--output_dir", artifact_dir["viz"],
                "--output_file",
                "pruning_comparison_models_small_IM.csv"])
    # topk vs evit pair in both orders
    assert len(out) == 2
    for s in ("Stage-3", "Stage-6", "Stage-9"):
        v = out.iloc[0][f"{s}-Mean"]
        assert 0 <= v <= 1


def test_compare_merging_models(artifact_dir):
    from analysis.compare_merging import main

    out = main(["--mode", "models",
                "--parent_dir", artifact_dir["viz"],
                "--dataset_csv", artifact_dir["csv"],
                "--capacity", "small",
                "--output_dir", artifact_dir["viz"],
                "--output_file",
                "cluster_comparison_models_small_IM.csv"])
    # sit vs sinkhorn in both orders
    assert len(out) == 2
    r0, r1 = out.iloc[0], out.iloc[1]
    # homogeneity(a,b) == completeness(b,a) swap
    np.testing.assert_allclose(r0["Homogeneity-Stage-3-Mean"],
                               r1["Completeness-Stage-3-Mean"])
    assert 0 <= r0["NMI-Stage-3-Mean"] <= 1


def test_compare_cls_features_and_collate(artifact_dir):
    from analysis.calculate_correlation import main as corr_main
    from analysis.collate_data import main as collate_main
    from analysis.compare_cls_features import main as cls_main

    out = cls_main(["--mode", "models",
                    "--parent_dir", artifact_dir["viz"],
                    "--dataset_csv", artifact_dir["csv"],
                    "--capacity", "small",
                    "--output_dir", artifact_dir["viz"],
                    "--output_file",
                    "cls_features_comparison_models_small_IM.csv"])
    assert len(out) > 0
    for col in ("3-PWCCA", "11-CKA", "9-Procrustes", "6-mean_cca_corr"):
        assert col in out.columns
        assert np.isfinite(out.iloc[0][col])

    collated = collate_main(["--parent_dir", artifact_dir["viz"],
                             "--mode", "models",
                             "--datasets", "IM",
                             "--capacities", "small",
                             "--output_dir", artifact_dir["viz"]])
    table = collated[("small", "IM")]
    assert "Acc Diff" in table.columns and len(table) > 0

    corr_main(["--parent_dir", artifact_dir["viz"], "--mode", "models",
               "--datasets", "IM", "--capacities", "small",
               "--output_dir", artifact_dir["viz"]])
    path = os.path.join(artifact_dir["viz"],
                        "correlations_comparison_models_small_IM.csv")
    assert os.path.exists(path)


def test_compare_heatmaps(artifact_dir):
    # token stats written by test_token_statistics (module-ordered)
    from analysis.compare_heatmaps import main

    ts = os.path.join(artifact_dir["viz"], "token_stats_IM.json")
    if not os.path.exists(ts):
        from analysis.compute_token_statistics import main as t_main

        t_main(["--parent_dir", artifact_dir["viz"],
                "--dataset_csv", artifact_dir["csv"],
                "--output_dir", artifact_dir["viz"],
                "--output_file", "token_stats_IM.json"])
    # fake a second dataset by symlinking the same stats
    ts2 = os.path.join(artifact_dir["viz"], "token_stats_NAB.json")
    if not os.path.exists(ts2):
        with open(ts) as f:
            json.dump(json.load(f), open(ts2, "w"))
    out = main(["--dataset_IM", "token_stats_IM.json",
                "--dataset_NAB", "token_stats_NAB.json",
                "--input_path", artifact_dir["viz"],
                "--output_path", artifact_dir["viz"],
                "--compare_across_models"])
    # topk vs evit (cross-dataset IM vs NAB), depth maps are 14x14-padded?
    # our tiny runs are 4x4=16 patches -> reshape(14,14) impossible, so
    # rows may be empty; the contract check is: runs without error and
    # writes the CSV
    assert os.path.exists(os.path.join(artifact_dir["viz"],
                                       "heatmap_comparison.csv"))


# ----------------------------------------------------------- unit metrics
def test_feature_metrics_properties():
    from analysis import feature_metrics as fm

    rng = np.random.default_rng(0)
    A = rng.normal(size=(8, 64))
    # identical reps: CCA corr 1, CKA dist 0, PWCCA dist 0
    _, rho, _, ta, _ = fm.cca_decomp(A, A)
    np.testing.assert_allclose(rho, 1.0, atol=1e-6)
    assert fm.lin_cka_dist(A, A) < 1e-10
    assert abs(fm.pwcca_dist(A, rho, ta)) < 1e-6
    # independent reps: lower correlation
    B = rng.normal(size=(8, 64))
    _, rho2, _, _, _ = fm.cca_decomp(A, B)
    assert rho2.mean() < 0.999
    assert fm.procrustes(fm.preprocess(A), fm.preprocess(A)) < 1e-10


def test_heatmap_metrics_properties():
    from analysis import heatmap_metrics as hm

    rng = np.random.default_rng(1)
    m1 = rng.random((14, 14)) + 0.1
    assert abs(hm.KL(m1, m1)) < 1e-10
    assert abs(hm.JS(m1, m1)) < 1e-10
    assert abs(hm.PCC(m1, m1) - 1.0) < 1e-10
    assert abs(hm.SIM(m1, m1) - 1.0) < 1e-10
    assert abs(hm.SCC(m1, m1) - 1.0) < 1e-10


def test_emd_exact_on_shifted_delta():
    from analysis import heatmap_metrics as hm

    # all mass moved one cell to the right -> EMD == 1.0 exactly
    m1 = np.full((4, 4), 1e-9)
    m2 = np.full((4, 4), 1e-9)
    m1[1, 1] = 1.0
    m2[1, 2] = 1.0
    d = hm.EMD(m1, m2)
    assert abs(d - 1.0) < 1e-3
    assert abs(hm.EMD(m1, m1)) < 1e-6


def test_map_cluster_centers_chains():
    from analysis.utils import map_cluster_centers

    # stage 1: tokens 0..5 -> clusters; stage 2 relabels cluster ids
    s1a = [0, 0, 1, 1, 2, 2]
    s1b = [0, 1, 1, 2, 2, 0]
    c1, c2 = map_cluster_centers(s1a, s1b, first_stage=True)
    s2a = [5, 6, 7]  # cluster k -> new label
    s2b = [8, 9, 7]
    c1, c2 = map_cluster_centers(s2a, s2b, c1, c2, first_stage=False)
    np.testing.assert_array_equal(c1, [5, 5, 6, 6, 7, 7])
    np.testing.assert_array_equal(c2, [8, 9, 9, 7, 7, 8])

"""End-to-end: train CLI -> checkpoint -> validate (viz JSON contract) ->
cls-feature extraction -> run table. Exercises the full artifact chain the
analysis suite depends on (SURVEY.md section 3.5)."""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.filterwarnings("ignore")


@pytest.fixture(scope="module")
def trained_run(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("run") / "topk_run")
    from tokenreduction_tpu.train.train_cli import main

    main([
        "--model", "topk_tiny_patch16_224", "--dataset", "synthetic",
        "--synthetic-n", "32", "--synthetic-classes", "7",
        "--input-size", "64", "--batch-size", "8", "--epochs", "1",
        "--reduction_loc", "3", "6", "9", "--keep_rate", "0.7",
        "--warmup-epochs", "0", "--no-repeated-aug",
        "--print-freq", "100", "--output_dir", out,
    ])
    return out


def test_checkpoint_written(trained_run):
    assert os.path.isdir(os.path.join(trained_run, "best_checkpoint"))
    with open(os.path.join(trained_run, "best_checkpoint",
                           "meta.json")) as f:
        meta = json.load(f)
    assert meta["model_cfg"]["method"] == "topk"
    assert meta["run_args"]["model"] == "topk_tiny_patch16_224"
    assert os.path.exists(os.path.join(trained_run, "log.txt"))


def test_validate_viz_json_contract(trained_run, tmp_path):
    from tokenreduction_tpu.evaluation.validate import main

    out = str(tmp_path)
    data = main([
        "--dataset", "synthetic", "--synthetic-n", "32",
        "--input-size", "64", "-b", "8",
        "--checkpoint", trained_run, "--viz_mode",
        "--output_dir", out, "--viz_output_name", "v.json",
    ])
    # header keys (reference validate.py:132-134, 270-272)
    for k in ("Model", "Ratio", "Location", "Top1-Acc", "Top5-Acc",
              "Params"):
        assert k in data
    with open(os.path.join(out, "v.json")) as f:
        js = json.load(f)
    img_keys = [k for k in js if k.startswith("synthetic_")]
    assert len(img_keys) == 32
    rec = js[img_keys[0]]
    assert set(rec) >= {"Predictions", "Target", "Loss",
                        "Stage-3", "Stage-6", "Stage-9"}
    # chaining invariant: each stage's absolute kept ids are a subset of
    # the previous stage's, and counts match the static schedule
    n = 16  # 64/16 squared
    k1, k2, k3 = (int(0.7 ** (i + 1) * n) for i in range(3))
    s3 = np.asarray(js[img_keys[0]]["Stage-3"]["Kept_Token"])
    s6 = np.asarray(js[img_keys[0]]["Stage-6"]["Kept_Token"])
    s9 = np.asarray(js[img_keys[0]]["Stage-9"]["Kept_Token"])
    assert (len(s3), len(s6), len(s9)) == (k1, k2, k3)
    assert set(s6) <= set(s3) and set(s9) <= set(s6)
    assert s3.max() < n


def test_extract_and_run_table(trained_run, tmp_path):
    from tokenreduction_tpu.evaluation.extract_cls_features import main

    out = str(tmp_path / "feats")
    feats = main([
        "--dataset", "synthetic", "--synthetic-n", "32",
        "--input-size", "64", "-b", "8",
        "--checkpoint", trained_run, "--output_dir", out,
        "--feature_output_name", "run_cls_features",
    ])
    for b in (3, 6, 9, 11):
        mat = np.load(os.path.join(out, f"run_cls_features_{b}.npy"))
        assert mat.shape == (192, 32)  # (D, n_images) transposed
        assert np.isfinite(mat).all()

    from tokenreduction_tpu.evaluation.run_table import scan_output_dirs

    df = scan_output_dirs(os.path.dirname(trained_run))
    assert len(df) == 1
    assert df.iloc[0]["model"] == "topk_tiny_patch16_224"
    assert df.iloc[0]["max_accuracy"] > 0


def test_validate_and_extract_use_amp(trained_run, tmp_path):
    """--use_amp (reference validate.py:36-37 autocast): bf16 eval
    forward; metrics stay close to the fp32 run and extracted features
    come back finite f32."""
    from tokenreduction_tpu.evaluation.extract_cls_features import (
        main as extract_main)
    from tokenreduction_tpu.evaluation.validate import main as val_main

    common = ["--dataset", "synthetic", "--synthetic-n", "16",
              "--input-size", "64", "-b", "8",
              "--checkpoint", trained_run]
    full = val_main(common + ["--output_dir", str(tmp_path)])
    amp = val_main(common + ["--output_dir", str(tmp_path), "--use_amp"])
    assert abs(amp["Top1-Acc"] - full["Top1-Acc"]) <= 25.0  # tiny set
    assert np.isfinite(amp["Top5-Acc"])

    out = str(tmp_path / "amp_feats")
    feats = extract_main(common + [
        "--output_dir", out, "--use_amp",
        "--feature_output_name", "amp_cls_features"])
    for b in (3, 6, 9, 11):
        mat = np.load(os.path.join(out, f"amp_cls_features_{b}.npy"))
        assert mat.dtype == np.float32 and np.isfinite(mat).all()
        assert mat.shape == (192, 16)


def test_dirs_drivers_batch_over_run_csv(trained_run, tmp_path):
    """validate_dirs / extract_cls_features_dirs: CSV-driven batch
    drivers (reference validate_dirs.py:32-77) -- run-dir resolution,
    skip-existing, and --overwrite_existing semantics."""
    import pandas as pd

    from tokenreduction_tpu.evaluation import extract_cls_features_dirs
    from tokenreduction_tpu.evaluation import validate_dirs
    from tokenreduction_tpu.evaluation.run_table import scan_output_dirs

    csv = str(tmp_path / "overview.csv")
    scan_output_dirs(os.path.dirname(trained_run)).to_csv(csv, index=False)
    name = pd.read_csv(csv).iloc[0]["Name"]

    out = str(tmp_path / "viz")
    common = ["--dataset_csv", csv, "--dataset", "synthetic",
              "--synthetic-n", "8", "-b", "8", "--input-size", "64",
              "--output_dir", out]
    validate_dirs.main(common)
    viz_path = os.path.join(out, f"{name}_viz_results.json")
    assert os.path.exists(viz_path)
    with open(viz_path) as f:
        assert len([k for k in json.load(f)
                    if k.startswith("synthetic_")]) == 8
    # second run skips (file untouched), --overwrite_existing re-runs
    mtime = os.path.getmtime(viz_path)
    validate_dirs.main(common)
    assert os.path.getmtime(viz_path) == mtime
    # --no-viz_mode: reference semantics (validate_dirs.py:57-66) --
    # the per-row predictions/accuracy JSON is still written under the
    # row's name, just without any Stage-* reduction entries
    noviz = str(tmp_path / "noviz")
    validate_dirs.main(["--dataset_csv", csv, "--dataset", "synthetic",
                        "--synthetic-n", "8", "-b", "8",
                        "--input-size", "64", "--output_dir", noviz,
                        "--no-viz_mode"])
    noviz_path = os.path.join(noviz, f"{name}_viz_results.json")
    assert os.path.exists(noviz_path)
    with open(noviz_path) as f:
        noviz_data = json.load(f)
    assert "Top1-Acc" in noviz_data
    per_image = [v for k, v in noviz_data.items()
                 if k.startswith("synthetic_")]
    assert len(per_image) == 8
    assert not any(k.startswith("Stage-") for d in per_image for k in d)

    feat_out = str(tmp_path / "feats")
    fcommon = ["--dataset_csv", csv, "--dataset", "synthetic",
               "--synthetic-n", "8", "-b", "8", "--input-size", "64",
               "--output_dir", feat_out]
    extract_cls_features_dirs.main(fcommon)
    for b in (3, 6, 9, 11):
        mat = np.load(os.path.join(feat_out,
                                   f"{name}_cls_features_{b}.npy"))
        assert mat.shape == (192, 8)
    first = np.load(os.path.join(feat_out, f"{name}_cls_features_3.npy"))
    extract_cls_features_dirs.main(fcommon)  # skips: files unchanged
    np.testing.assert_array_equal(
        first, np.load(os.path.join(feat_out,
                                    f"{name}_cls_features_3.npy")))


def test_eval_clis_accept_reference_compat_flags(trained_run, tmp_path,
                                                 capsys):
    """Verbatim reference eval commands must parse: -j/--num_workers is
    wired into the Loader's process pool (same batches, worker-invariant
    RNG), --pin-mem/--device are accepted with a printed notice
    (reference validate.py:18-33), and run_table keeps the reference's
    --project/--entity/--output_path names as aliases."""
    from tokenreduction_tpu.evaluation.run_table import scan_output_dirs
    from tokenreduction_tpu.evaluation.validate import main as val_main
    from tokenreduction_tpu.evaluation import run_table

    common = ["--dataset", "synthetic", "--synthetic-n", "16",
              "--input-size", "64", "-b", "8",
              "--checkpoint", trained_run]
    base = val_main(common + ["--output_dir", str(tmp_path)])
    compat = val_main(common + ["--output_dir", str(tmp_path),
                                "-j", "1", "--pin-mem",
                                "--device", "cuda"])
    notes = capsys.readouterr().out
    assert "--pin-mem" in notes and "--device" in notes
    assert compat["Top1-Acc"] == base["Top1-Acc"]

    csv = str(tmp_path / "alias.csv")
    run_table.main(["--scan_root", os.path.dirname(trained_run),
                    "--output_path", csv])
    assert len(scan_output_dirs(os.path.dirname(trained_run))) == \
        len(__import__("pandas").read_csv(csv))


def test_resolve_run_dir_preserves_parent_and_absolute_paths(tmp_path):
    """--parent_dir re-rooting must strip exactly a leading './' (the
    reference's path[1:], validate_dirs.py:46) -- lstrip('./') would eat
    '../' prefixes and the root of absolute paths, silently skipping
    those CSV rows as 'no run dir'."""
    from tokenreduction_tpu.evaluation.validate_dirs import resolve_run_dir

    parent = tmp_path / "parent"
    sib = tmp_path / "runs" / "r1"
    sib.mkdir(parents=True)
    parent.mkdir()
    row = {"output_dir": "../runs/r1", "Name": "r1"}
    assert resolve_run_dir(row, str(parent)) == os.path.join(
        str(parent), "..", "runs", "r1")

    absrun = tmp_path / "abs" / "r2"
    absrun.mkdir(parents=True)
    row = {"output_dir": str(absrun), "Name": "r2"}
    assert resolve_run_dir(row, str(parent)) == str(absrun)

    (parent / "runs2" / "r3").mkdir(parents=True)
    row = {"output_dir": "./runs2/r3", "Name": "r3"}
    assert resolve_run_dir(row, str(parent)) == os.path.join(
        str(parent), "runs2", "r3")


def test_transforms_produce_valid_arrays():
    from PIL import Image

    from tokenreduction_tpu.data.pipeline import (
        TransformConfig, make_transform)

    rng = np.random.default_rng(0)
    img = Image.fromarray(
        rng.integers(0, 256, (80, 100, 3), dtype=np.uint8), "RGB")
    cfg = TransformConfig(input_size=64)
    for ds in ("imagenet", "nabirds", "coco"):
        for train in (True, False):
            fn = make_transform(ds, train, cfg)
            arr = fn(img.copy(), np.random.default_rng(1))
            assert arr.shape == (64, 64, 3), (ds, train)
            assert arr.dtype == np.float32
            assert np.isfinite(arr).all()


def test_ra_sampler_matches_reference_semantics():
    from tokenreduction_tpu.data.sampler import RASampler

    n, world = 1024, 4
    samplers = [RASampler(n, world, r, seed=0) for r in range(world)]
    all_idx = [list(iter(s)) for s in samplers]
    # truncated epoch length floor(n//256*256/world)
    assert all(len(a) == 1024 // 4 for a in all_idx)
    # each replica sees different augmentation copies; union covers subset
    # of dataset with each index appearing <= num_repeats times overall
    from collections import Counter

    c = Counter(i for a in all_idx for i in a)
    assert max(c.values()) <= 3


def test_three_augment_and_src_crop():
    from PIL import Image

    from tokenreduction_tpu.data.pipeline import (
        TransformConfig, make_transform)

    rng = np.random.default_rng(0)
    img = Image.fromarray(
        rng.integers(0, 256, (96, 80, 3), dtype=np.uint8), "RGB")
    cfg = TransformConfig(input_size=64, three_augment=True, src_crop=True)
    fn = make_transform("imagenet", True, cfg)
    for seed in range(4):  # hits all three aug branches
        arr = fn(img.copy(), np.random.default_rng(seed))
        assert arr.shape == (64, 64, 3) and np.isfinite(arr).all()


def test_multilabel_training_cli(tmp_path):
    from tokenreduction_tpu.train.train_cli import main

    out = str(tmp_path / "ml")
    main([
        "--model", "topk_tiny_patch16_224", "--embed-dim", "32",
        "--num-heads", "2", "--depth", "6", "--patch-size", "16",
        "--dataset", "synthetic_multilabel", "--synthetic-n", "16",
        "--synthetic-classes", "9", "--input-size", "64",
        "--batch-size", "8", "--epochs", "1", "--reduction_loc", "1", "3",
        "--keep_rate", "0.7", "--warmup-epochs", "0", "--no-repeated-aug",
        "--print-freq", "100", "--output_dir", out,
    ])
    log = [json.loads(line) for line in open(os.path.join(out, "log.txt"))]
    # multilabel eval reports mAP in acc1 (reference engine.py:196-198)
    assert 0 <= log[-1]["test_acc1"] <= 100
    assert np.isfinite(log[-1]["train_loss"])


def test_pos_embed_interpolation():
    from tokenreduction_tpu.models.convert import resize_pos_embed

    pe = np.random.default_rng(0).normal(size=(1, 1 + 16, 8)).astype(
        np.float32)
    out = resize_pos_embed(pe, 49, 1)
    assert out.shape == (1, 50, 8)
    np.testing.assert_allclose(out[:, 0], pe[:, 0])  # prefix untouched
    same = resize_pos_embed(pe, 16, 1)
    np.testing.assert_allclose(same, pe)


def test_process_pool_loader_matches_inprocess():
    """num_workers>0 must yield bitwise-identical batches to the
    in-process path (per-sample RNG is position/index-seeded, never
    worker-seeded)."""
    from tokenreduction_tpu.data import (
        Loader,
        ShardedSampler,
        TransformConfig,
        build_dataset,
        make_transform,
    )

    ds, _ = build_dataset("", "synthetic", "train", num_classes=7,
                          img_size=32, synthetic_n=20)
    tf = make_transform("imagenet", True, TransformConfig(input_size=32))

    def batches(num_workers):
        loader = Loader(ds, ShardedSampler(len(ds), seed=3), 8, tf,
                        seed=5, num_workers=num_workers)
        loader.set_epoch(2)
        return list(loader)

    a, b = batches(0), batches(2)
    assert len(a) == len(b) == 3
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x["image"], y["image"])
        np.testing.assert_array_equal(x["label"], y["label"])
        np.testing.assert_array_equal(x["index"], y["index"])


def test_decoded_cache_roundtrip(tmp_path):
    from tokenreduction_tpu.data import (
        DecodedCacheDataset,
        build_decoded_cache,
        build_dataset,
    )

    ds, _ = build_dataset("", "synthetic", "train", num_classes=5,
                          img_size=32, synthetic_n=6)
    out = build_decoded_cache(ds, str(tmp_path / "cache"), cache_size=32)
    cds = DecodedCacheDataset(out)
    assert len(cds) == 6 and cds.num_classes == 5
    for i in range(6):
        img0, y0 = ds.load(i)
        img1, y1 = cds.load(i)
        # cache_size == source size -> bicubic resize is identity
        np.testing.assert_array_equal(np.asarray(img1), np.asarray(img0))
        assert y1 == y0
        assert cds.image_name(i) == ds.image_name(i)
    # cached dataset dispatch
    from tokenreduction_tpu.data import build_dataset as bd
    ds2, n = bd(out, "cached", "train")
    assert n == 5 and len(ds2) == 6


def test_validate_cached_dataset(trained_run, tmp_path):
    """--dataset cached: a checkpoint can be validated against the
    decoded uint8 cache (the recommended host recipe) -- validate.py
    accepts 'cached' in --dataset and --split selects the cache subdir,
    falling back to the --data root when absent."""
    from tokenreduction_tpu.data import build_dataset
    from tokenreduction_tpu.data.cache import build_decoded_cache
    from tokenreduction_tpu.evaluation.validate import main

    ds, _ = build_dataset("", "synthetic", "val", num_classes=7,
                          img_size=64, synthetic_n=16)
    cache = str(tmp_path / "cache")
    build_decoded_cache(ds, cache, cache_size=64)
    data = main([
        "--dataset", "cached", "--data", cache,
        "--input-size", "64", "-b", "8",
        "--checkpoint", trained_run,
        "--output_dir", str(tmp_path),
    ])
    for k in ("Top1-Acc", "Top5-Acc", "Params"):
        assert k in data

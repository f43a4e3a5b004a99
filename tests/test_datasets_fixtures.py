"""Fixture tests for the three real-dataset loaders (VERDICT item 6):
hand-written COCO/NABirds/NUS-WIDE fixtures with hand-computed truth --
especially COCO's (3,80) size bins and first-annotation image order
(reference dataloaders/coco.py:32-40, nabirds.py:48-66,
nus_wide.py:24-50)."""

import json
import os

import numpy as np
from PIL import Image

from tokenreduction_tpu.data.datasets import (
    CocoMultiLabelDataset,
    NABirdsDataset,
    NUSWideDataset,
    build_dataset,
)


def _write_img(path, color=(255, 0, 0), size=(8, 8)):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.new("RGB", size, color).save(path)


# ----------------------------------------------------------------- COCO
def _coco_fixture(root):
    """3 annotated images (+1 unannotated), areas straddling the 32^2 and
    96^2 bin edges, non-contiguous category ids, and an annotation order
    that differs from the images-list order."""
    ann = {
        # images list order: 200, 100, 300, 400 (400 has no annotations)
        "images": [
            {"id": 200, "file_name": "COCO_val2014_000000000200.jpg"},
            {"id": 100, "file_name": "COCO_val2014_000000000100.jpg"},
            {"id": 300, "file_name": "COCO_val2014_000000000300.jpg"},
            {"id": 400, "file_name": "COCO_val2014_000000000400.jpg"},
        ],
        # category ids non-contiguous: 1 -> 0, 18 -> 1, 90 -> 2
        "categories": [
            {"id": 1, "name": "person"},
            {"id": 18, "name": "dog"},
            {"id": 90, "name": "toothbrush"},
        ],
        # first-annotation order of image ids: 300, 100, 200
        "annotations": [
            {"image_id": 300, "category_id": 18, "area": 1023.9},  # <32^2
            {"image_id": 100, "category_id": 1, "area": 1024.0},   # mid bin
            {"image_id": 300, "category_id": 90, "area": 9216.0},  # large
            {"image_id": 200, "category_id": 18, "area": 9215.9},  # mid bin
            {"image_id": 100, "category_id": 1, "area": 50000.0},  # large
        ],
    }
    os.makedirs(os.path.join(root, "annotations"), exist_ok=True)
    with open(os.path.join(root, "annotations",
                           "instances_val2014.json"), "w") as f:
        json.dump(ann, f)
    for im in ann["images"]:
        _write_img(os.path.join(root, "val2014", im["file_name"]))
    return ann


def test_coco_first_annotation_order_and_size_bins(tmp_path):
    root = str(tmp_path)
    _coco_fixture(root)
    ds = CocoMultiLabelDataset(root, train=False)
    # pycocotools imgToAnns ordering = order of first annotation
    assert ds.ids == [300, 100, 200]
    # unannotated image 400 is excluded (imgToAnns only)
    assert len(ds) == 3
    assert ds.num_classes == 80
    # non-contiguous category ids remap by order of appearance
    assert ds.cat2cat == {1: 0, 18: 1, 90: 2}

    img, t300 = ds.load(0)
    assert img.size == (8, 8)
    expect = np.zeros((3, 80), np.float32)
    expect[0, 1] = 1   # dog, area 1023.9 < 32^2
    expect[2, 2] = 1   # toothbrush, 9216 >= 96^2
    np.testing.assert_array_equal(t300, expect)

    _, t100 = ds.load(1)
    expect = np.zeros((3, 80), np.float32)
    expect[1, 0] = 1   # person, 1024 >= 32^2 and < 96^2
    expect[2, 0] = 1   # person, 50000 -> large
    np.testing.assert_array_equal(t100, expect)

    _, t200 = ds.load(2)
    expect = np.zeros((3, 80), np.float32)
    expect[1, 1] = 1   # dog, 9215.9 < 96^2
    np.testing.assert_array_equal(t200, expect)

    # eval-time max-collapse over bins (reference engine.py:177)
    collapsed = t100.max(axis=0)
    assert collapsed[0] == 1 and collapsed.sum() == 1

    ds2, n = build_dataset(root, "coco", "val")
    assert n == 80 and len(ds2) == 3


# -------------------------------------------------------------- NABirds
def _nabirds_fixture(root):
    os.makedirs(root, exist_ok=True)
    rows = [
        # img_id filepath target is_training
        ("a1", "0295/one.jpg", 295, 1),
        ("a2", "0295/two.jpg", 295, 0),
        ("a3", "0600/three.jpg", 600, 1),
        ("a4", "0042/four.jpg", 42, 0),
    ]
    with open(os.path.join(root, "images.txt"), "w") as f:
        for r in rows:
            f.write(f"{r[0]} {r[1]}\n")
    with open(os.path.join(root, "image_class_labels.txt"), "w") as f:
        for r in rows:
            f.write(f"{r[0]} {r[2]}\n")
    with open(os.path.join(root, "train_test_split.txt"), "w") as f:
        for r in rows:
            f.write(f"{r[0]} {r[3]}\n")
    for r in rows:
        _write_img(os.path.join(root, "images", r[1]), color=(0, 255, 0))


def test_nabirds_joins_split_and_continuous_remap(tmp_path):
    root = str(tmp_path)
    _nabirds_fixture(root)
    tr = NABirdsDataset(root, train=True)
    va = NABirdsDataset(root, train=False)
    # non-contiguous raw labels {42, 295, 600} -> continuous {0, 1, 2}
    assert tr.label_map == {42: 0, 295: 1, 600: 2}
    assert tr.num_classes == 3
    assert len(tr) == 2 and len(va) == 2
    img, y = tr.load(0)          # a1: target 295 -> 1
    assert y == 1 and img.size == (8, 8)
    _, y3 = tr.load(1)           # a3: target 600 -> 2
    assert y3 == 2
    _, y4 = va.load(1)           # a4: target 42 -> 0
    assert y4 == 0
    assert tr.image_name(0) == "a1"

    ds, n = build_dataset(root, "nabirds", "train")
    assert n == 3


# ------------------------------------------------------------- NUS-WIDE
def _nuswide_fixture(root):
    os.makedirs(root, exist_ok=True)
    lines = [
        "img,label,split",
        "images/one.jpg,\"['clouds', 'sky']\",train",
        "images/two.jpg,\"['animal']\",val",
        "images/three.jpg,\"['sky', 'water']\",train",
    ]
    with open(os.path.join(root, "nus_wid_data.csv"), "w") as f:
        f.write("\n".join(lines) + "\n")
    for name in ("one", "two", "three"):
        _write_img(os.path.join(root, "images", f"{name}.jpg"),
                   color=(0, 0, 255))


def test_nuswide_multihot_and_split(tmp_path):
    root = str(tmp_path)
    _nuswide_fixture(root)
    tr = NUSWideDataset(root, train=True)
    va = NUSWideDataset(root, train=False)
    # label universe from the WHOLE csv, sorted:
    # animal=0, clouds=1, sky=2, water=3
    assert tr.num_classes == 4 and va.num_classes == 4
    assert len(tr) == 2 and len(va) == 1
    img, y = tr.load(0)
    np.testing.assert_array_equal(y, [0, 1, 1, 0])  # clouds+sky
    _, y3 = tr.load(1)
    np.testing.assert_array_equal(y3, [0, 0, 1, 1])  # sky+water
    _, y2 = va.load(0)
    np.testing.assert_array_equal(y2, [1, 0, 0, 0])  # animal
    assert img.size == (8, 8)
    assert tr.image_name(0) == "one"

    ds, n = build_dataset(root, "nuswide", "val")
    assert n == 4

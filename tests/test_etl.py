"""ETL converter tests on synthetic dataset trees."""
import json
import os

import numpy as np
import pandas as pd

from dgod_tpu.data.etl import convert as C


def test_encode_helpers():
    assert C.encode_boxes([]) == "no_box"
    assert C.encode_labels([]) == "no_label"
    assert C.encode_boxes([[1, 2, 3, 4]]) == "1.0 2.0 3.0 4.0"
    assert C.encode_labels([1, 8]) == "1;8"


def test_polygon_to_box():
    assert C.polygon_to_box([[10, 5], [2, 20], [15, 8]]) == [2, 5, 15, 20]


def test_acdc_coco_conversion(tmp_path):
    root = tmp_path
    gt = root / "ACDC" / "gt_detection"
    gt.mkdir(parents=True)
    coco = {
        "images": [{"id": 1, "file_name": "fog/img1.png"},
                   {"id": 2, "file_name": "fog/img2.png"}],
        "categories": [{"id": 10, "name": "car"}, {"id": 11, "name": "person"}],
        "annotations": [
            {"image_id": 1, "category_id": 10, "bbox": [10, 20, 30, 40]},
            {"image_id": 1, "category_id": 11, "bbox": [0, 0, 5, 5]},
        ],
    }
    (gt / "instancesonly_train_gt_detection.json").write_text(json.dumps(coco))
    out = C.convert("acdc", "train", str(root), str(root / "Annots"))
    df = pd.read_csv(out)
    assert len(df) == 2
    row1 = df[df.image_name == "fog/img1.png"].iloc[0]
    assert row1.BoxesString == "10.0 20.0 40.0 60.0;0.0 0.0 5.0 5.0"  # xywh->xyxy
    assert row1.LabelsString == "3;1"
    row2 = df[df.image_name == "fog/img2.png"].iloc[0]
    assert row2.BoxesString == "no_box" and row2.LabelsString == "no_label"


def test_cityscapes_polygon_conversion(tmp_path):
    root = tmp_path
    img_dir = root / "Cityscapes" / "leftImg8bit" / "train" / "aachen"
    gt_dir = root / "Cityscapes" / "gtFine" / "train" / "aachen"
    img_dir.mkdir(parents=True)
    gt_dir.mkdir(parents=True)
    (img_dir / "aachen_000000_000019_leftImg8bit.png").write_bytes(b"")
    ann = {"objects": [
        {"label": "car", "polygon": [[100, 200], [150, 180], [120, 260]]},
        {"label": "sky", "polygon": [[0, 0], [10, 10]]},
    ]}
    (gt_dir / "aachen_000000_000019_gtFine_polygons.json").write_text(json.dumps(ann))
    out = C.convert("cityscapes", "train", str(root), str(root / "Annots"))
    df = pd.read_csv(out)
    assert len(df) == 1
    assert df.iloc[0].image_name == "aachen/aachen_000000_000019_leftImg8bit.png"
    assert df.iloc[0].BoxesString == "100.0 180.0 150.0 260.0"
    assert str(df.iloc[0].LabelsString) == "3"


def test_cityscapes_foggy_weather_variant(tmp_path):
    """--weather foggy reads leftImg8bit_foggy/, shares the clear gtFine
    annotations via the city_seq_frame base name (suffix-agnostic, covering
    the beta-suffixed foggy renderings), and writes cityscapes_foggy_* CSVs
    (reference json2csv_cityscapes.py:19-21,52 declares the flag but never
    wires it)."""
    root = tmp_path
    img_dir = root / "Cityscapes" / "leftImg8bit_foggy" / "train" / "aachen"
    gt_dir = root / "Cityscapes" / "gtFine" / "train" / "aachen"
    img_dir.mkdir(parents=True)
    gt_dir.mkdir(parents=True)
    fname = "aachen_000000_000019_leftImg8bit_foggy_beta_0.01.png"
    (img_dir / fname).write_bytes(b"")
    ann = {"objects": [
        {"label": "person", "polygon": [[5, 6], [50, 60], [20, 90]]},
    ]}
    (gt_dir / "aachen_000000_000019_gtFine_polygons.json").write_text(json.dumps(ann))
    out = C.convert("cityscapes", "train", str(root), str(root / "Annots"),
                    weather="foggy")
    assert os.path.basename(out) == "cityscapes_foggy_train_all.csv"
    df = pd.read_csv(out)
    assert len(df) == 1
    assert df.iloc[0].image_name == f"aachen/{fname}"
    assert df.iloc[0].BoxesString == "5.0 6.0 50.0 90.0"
    assert str(df.iloc[0].LabelsString) == "1"


def test_weather_rejected_for_non_cityscapes(tmp_path):
    import pytest
    with pytest.raises(ValueError, match="cityscapes only"):
        C.convert("bdd10k", "val", str(tmp_path), str(tmp_path / "Annots"),
                  weather="foggy")


def test_bdd_conversion(tmp_path):
    root = tmp_path
    lab = root / "BDD100K" / "labels"
    lab.mkdir(parents=True)
    data = [{"name": "x.jpg", "labels": [
        {"category": "bus", "poly2d": [{"vertices": [[1, 2], [11, 22]]}]},
        {"category": "road", "poly2d": [{"vertices": [[0, 0]]}]},
    ]}]
    (lab / "ins_seg_val.json").write_text(json.dumps(data))
    out = C.convert("bdd10k", "val", str(root), str(root / "Annots"))
    df = pd.read_csv(out)
    assert df.iloc[0].BoxesString == "1.0 2.0 11.0 22.0"
    assert str(df.iloc[0].LabelsString) == "5"

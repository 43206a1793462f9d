"""CLI flag surface + dataset assembly parity with the reference
train_driving_dg.py:29-51 (flags and their defaults) and :54-107
(datasetsFromArguments: domain letters a/b/c/i in fixed order with
sequential domain indices)."""

import os

import pandas as pd
import pytest

from dgod_tpu.cli import DOMAIN_SPECS, datasets_from_arguments, parser_args


def test_flag_surface_defaults_match_reference():
    args = parser_args([])
    assert args.model == "FRCNN"
    assert args.exp == "non_dg"
    assert args.source_domains == "ABC"
    assert args.target_domains == "I"
    assert args.weights_folder == "ABC2I"
    assert args.weights_file == "single_source_acdc"
    assert args.reg_weights == [0.5, 0.5, 0.5, 0.05, 0.0001]
    # TPU extras keep reference-parity defaults
    assert args.batch_size == 8
    assert args.eval_batch_size == 1
    assert args.max_epochs == 100


def test_reg_weights_nargs5():
    args = parser_args(["--reg_weights", "1", "2", "3", "4", "5"])
    assert args.reg_weights == [1.0, 2.0, 3.0, 4.0, 5.0]
    with pytest.raises(SystemExit):
        parser_args(["--reg_weights", "1", "2"])


def _write_csvs(root):
    for letter, (name, csv_tpl, _) in DOMAIN_SPECS.items():
        for split in ("train", "val"):
            path = os.path.join(root, csv_tpl.format(split=split))
            os.makedirs(os.path.dirname(path), exist_ok=True)
            pd.DataFrame(
                {
                    "image_name": [f"{name}_{split}.png"],
                    "BoxesString": ["10 10 50 50"],
                    "LabelsString": ["1"],
                }
            ).to_csv(path, index=False)


def test_domain_letter_mapping_and_sequential_indices(tmp_path):
    _write_csvs(str(tmp_path))
    tr, tr_list, vl, test = datasets_from_arguments("abc", "i", str(tmp_path))
    assert [d.domain for d in tr_list] == [0, 1, 2]
    assert len(tr) == 3 and len(vl) == 3 and len(test) == 1

    # canonical a->b->c->i iteration regardless of the input letter order
    # (the reference walks its fixed letter sequence, not the input string)
    _, tr_list2, _, _ = datasets_from_arguments("cab", "i", str(tmp_path))
    assert [d.domain for d in tr_list2] == [0, 1, 2]
    assert [d.image_names[0] for d in tr_list2] == [
        "acdc_train.png", "bdd10k_train.png", "cityscapes_train.png"
    ]

    # target split uses val CSVs (the reference's test = val sweep over the
    # held-out domain, train_driving_dg.py:166-168)
    _, _, _, test_i = datasets_from_arguments("a", "i", str(tmp_path))
    assert len(test_i) == 1


@pytest.mark.parametrize("family", ["FCOS", "FRCNN"])
def test_cli_main_end_to_end(tmp_path, monkeypatch, family):
    """python train_driving_dg.py --model FCOS|FRCNN --exp non_dg ... on
    synthetic PNGs + CSVs: the FULL L6 path (arg parsing -> dataset
    assembly -> loaders -> Trainer.fit -> checkpoint -> test sweep),
    reduced canvas. FRCNN additionally drives the val_resize=False
    raw-size eval path (train_driving_dg.py:137-138)."""
    cv2 = pytest.importorskip("cv2")
    import numpy as np

    from dgod_tpu.data import transforms as T

    monkeypatch.setattr(T, "CANVAS", (128, 256))
    monkeypatch.setattr(T, "TRAIN_SIZE", (120, 240))
    monkeypatch.setattr(T, "MIN_SIZE", 120)
    monkeypatch.setattr(T, "MAX_SIZE", 240)
    monkeypatch.setattr(T, "MIN_AREA", 4.0)

    rng = np.random.RandomState(0)
    root = str(tmp_path)
    for letters, split in (("a", "train"), ("a", "val"), ("i", "val")):
        name, csv_tpl, root_tpl = DOMAIN_SPECS[letters]
        img_root = os.path.join(root, root_tpl.format(split=split))
        os.makedirs(img_root, exist_ok=True)
        names, bs, ls = [], [], []
        for i in range(4):
            fname = f"{name}_{split}_{i}.png"
            img = rng.randint(0, 255, (120, 240, 3), np.uint8)
            img[30:80, 40:120] = (250, 30, 30)  # a "car"
            assert cv2.imwrite(os.path.join(img_root, fname), img)
            names.append(fname)
            bs.append("40 30 120 80")
            ls.append("3")
        csv_path = os.path.join(root, csv_tpl.format(split=split))
        os.makedirs(os.path.dirname(csv_path), exist_ok=True)
        pd.DataFrame(
            {"image_name": names, "BoxesString": bs, "LabelsString": ls}
        ).to_csv(csv_path, index=False)

    from dgod_tpu import cli

    result = cli.main([
        "--model", family, "--exp", "non_dg",
        "--source_domains", "A", "--target_domains", "I",
        "--max_epochs", "1", "--batch_size", "2",
        "--data_root", root,
        "--weights_folder", os.path.join(root, "w"),
        "--weights_file", "t",
    ])
    assert "map_50" in result
    assert os.path.exists(os.path.join(root, "w", "t.ckpt"))


def test_cli_main_mesh_spmd(tmp_path, monkeypatch):
    """`--mesh data=2` end to end: flag parse -> parse_mesh_spec ->
    Trainer(mesh) -> spmd shard_map steps + mesh-placed eval, on 2 virtual
    CPU devices (VERDICT round-4 #2: the SPMD path must be launchable from
    the production CLI). Reduced-depth backbone + small canvas keep the
    1-core compile tractable; the plumbing under test is identical."""
    cv2 = pytest.importorskip("cv2")
    import numpy as np

    from dgod_tpu.data import transforms as T

    monkeypatch.setattr(T, "CANVAS", (64, 128))
    monkeypatch.setattr(T, "TRAIN_SIZE", (60, 120))
    monkeypatch.setattr(T, "MIN_SIZE", 60)
    monkeypatch.setattr(T, "MAX_SIZE", 120)
    monkeypatch.setattr(T, "MIN_AREA", 1.0)

    import dgod_tpu.models.dg_fcos as dg_fcos_mod

    orig_model = dg_fcos_mod.DGFCOSModel
    monkeypatch.setattr(
        dg_fcos_mod, "DGFCOSModel",
        lambda **kw: orig_model(backbone_block_counts=(1, 1, 1, 1), **kw))

    rng = np.random.RandomState(0)
    root = str(tmp_path)
    for letters, split in (("a", "train"), ("a", "val"), ("i", "val")):
        name, csv_tpl, root_tpl = DOMAIN_SPECS[letters]
        img_root = os.path.join(root, root_tpl.format(split=split))
        os.makedirs(img_root, exist_ok=True)
        names, bs, ls = [], [], []
        for i in range(4):
            fname = f"{name}_{split}_{i}.png"
            img = rng.randint(0, 255, (60, 120, 3), np.uint8)
            img[15:40, 20:60] = (250, 30, 30)
            assert cv2.imwrite(os.path.join(img_root, fname), img)
            names.append(fname)
            bs.append("20 15 60 40")
            ls.append("3")
        csv_path = os.path.join(root, csv_tpl.format(split=split))
        os.makedirs(os.path.dirname(csv_path), exist_ok=True)
        pd.DataFrame(
            {"image_name": names, "BoxesString": bs, "LabelsString": ls}
        ).to_csv(csv_path, index=False)

    from dgod_tpu import cli

    result = cli.main([
        "--model", "FCOS", "--exp", "dg",
        "--source_domains", "A", "--target_domains", "I",
        "--max_epochs", "1", "--batch_size", "2", "--eval_batch_size", "2",
        "--mesh", "data=2",
        "--data_root", root,
        "--weights_folder", os.path.join(root, "w"),
        "--weights_file", "mesh",
    ])
    assert "map_50" in result
    assert os.path.exists(os.path.join(root, "w", "mesh.ckpt"))


def test_cli_reference_quirks_flag(tmp_path, monkeypatch):
    """--reference_quirks must plumb end to end: FCOS loss config gets both
    quirk flags, the loader re-samples the dg replay, and the fused
    pair-step optimisation is disabled (its in-program replay cannot
    reproduce re-sampled augmentation)."""
    captured = {}

    class _StopTrainer:
        def __init__(self, model, train_loader, val_loader, **kw):
            captured["model"] = model
            captured["train_loader"] = train_loader
            captured["kw"] = kw
            raise RuntimeError("stop-before-compile")

    monkeypatch.setattr("dgod_tpu.cli.Trainer", _StopTrainer)
    _write_csvs(str(tmp_path))
    from dgod_tpu import cli

    with pytest.raises(RuntimeError, match="stop-before-compile"):
        cli.main([
            "--model", "FCOS", "--exp", "dg", "--reference_quirks",
            "--source_domains", "A", "--target_domains", "I",
            "--data_root", str(tmp_path),
            "--weights_folder", str(tmp_path / "w"), "--weights_file", "q",
        ])
    cfg = captured["model"].loss_config
    assert cfg.single_gt_quirk and cfg.exact_reference_area
    assert captured["train_loader"].resample_replay
    assert captured["kw"]["fused_pairs"] is False

    # default run keeps the corrected semantics and the fused pairs
    with pytest.raises(RuntimeError, match="stop-before-compile"):
        cli.main([
            "--model", "FCOS", "--exp", "dg",
            "--source_domains", "A", "--target_domains", "I",
            "--data_root", str(tmp_path),
            "--weights_folder", str(tmp_path / "w"), "--weights_file", "q",
        ])
    cfg = captured["model"].loss_config
    assert not cfg.single_gt_quirk and not cfg.exact_reference_area
    assert not captured["train_loader"].resample_replay
    assert captured["kw"]["fused_pairs"] is True

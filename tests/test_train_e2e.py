"""End-to-end harness smoke test: FCOS non_dg on synthetic data.

Exercises TrainLoader -> per-mode step -> validation mAP -> checkpoint ->
warm start, on a reduced canvas. (The full-scale equivalent is the
reference's `--model FCOS --exp non_dg` run, train_driving_dg.py.)
"""
import os

import numpy as np
import jax
import pytest

from dgod_tpu.data.dataset import ConcatDataset, SyntheticDataset
from dgod_tpu.data.loader import EvalLoader, TrainLoader
from dgod_tpu.models.dg_fcos import DGFCOSModel
from dgod_tpu.train.harness import Trainer

# keep geometry consistent with the tiny canvas
CANVAS = (128, 256)


@pytest.fixture()
def patched_canvas(monkeypatch):
    from dgod_tpu.data import transforms as T

    monkeypatch.setattr(T, "CANVAS", CANVAS)
    monkeypatch.setattr(T, "TRAIN_SIZE", (120, 240))
    monkeypatch.setattr(T, "MIN_SIZE", 120)
    monkeypatch.setattr(T, "MAX_SIZE", 240)
    monkeypatch.setattr(T, "MIN_AREA", 4.0)
    return T


def test_fit_and_test_sweep(tmp_path, patched_canvas):
    train_ds = ConcatDataset([
        SyntheticDataset(8, domain=0, image_hw=(120, 240)),
        SyntheticDataset(8, domain=1, image_hw=(120, 240)),
    ])
    val_ds = SyntheticDataset(4, domain=0, image_hw=(120, 240), seed=7)

    model = DGFCOSModel(num_classes=9, num_domains=2, canvas=CANVAS)
    ckpt = str(tmp_path / "m.ckpt")
    trainer = Trainer(
        model,
        TrainLoader(train_ds, 4, dg=False, num_workers=2, max_gt=16),
        EvalLoader(val_ds, 1, True, num_workers=2, max_gt=16),
        dg=False,
        max_epochs=1,
        ckpt_path=ckpt,
        log_every=2,
    )
    best = trainer.fit()
    assert os.path.exists(ckpt)
    assert np.isfinite(best)

    result = trainer.test(EvalLoader(val_ds, 1, True, num_workers=2, max_gt=16))
    assert "map_50" in result

    # warm start must load without error and keep best_val
    trainer2 = Trainer(
        model,
        TrainLoader(train_ds, 4, dg=False, num_workers=2, max_gt=16),
        EvalLoader(val_ds, 1, True, num_workers=2, max_gt=16),
        dg=False,
        max_epochs=1,
        ckpt_path=ckpt,
    )
    assert trainer2.best_val == best

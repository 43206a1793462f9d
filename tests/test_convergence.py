"""Learning smoke test: the full harness must LEARN, on CPU, in minutes.

The on-chip proof (both families x non_dg/dg to train mAP@0.5 >= 0.9) is
scripts/check_convergence.py; this is its tiny-canvas reduced-depth FCOS
variant, kept in the suite so a change that silently breaks learning
(matcher, loss, optimizer, loader geometry) fails CI even though every
unit test still passes (VERDICT round-4 #3)."""

import os
import sys


def test_fcos_learns_on_cpu(tmp_path, monkeypatch):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from scripts import check_convergence as cc

    # build_trainer overwrites the transforms module geometry in place
    # (script usage); register the current values for teardown restore so
    # the rest of the suite is unaffected
    from dgod_tpu.data import transforms as T

    for k in ("CANVAS", "TRAIN_SIZE", "MIN_SIZE", "MAX_SIZE", "MIN_AREA"):
        monkeypatch.setattr(T, k, getattr(T, k))

    trainer = cc.build_trainer(
        "FCOS", dg=False, image_hw=(120, 240), canvas=(128, 256),
        n_per_domain=8, batch_size=4, warmup_steps=0,
        block_counts=(1, 1, 1, 1), tmpdir=str(tmp_path))
    best = -1.0
    for _ in range(60):
        trainer.train_epoch()
        best = max(best, float(trainer.validate()["map_50"]))
        if best >= 0.6:
            break
    assert best >= 0.6, f"train mAP@0.5 stuck at {best}"

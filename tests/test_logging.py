"""MetricsLogger: JSONL records + optional TensorBoard mirror.

The reference relies on PL's default TensorBoard logger
(train_driving_dg.py:163); here JSONL is primary and TB is an opt-in
mirror (tb_dir arg / DGOD_TB_DIR).
"""
import json
import os

from dgod_tpu.utils.logging import MetricsLogger


def test_jsonl_records(tmp_path):
    p = str(tmp_path / "m.jsonl")
    m = MetricsLogger(p)
    m.log("train", 3, {"loss": 1.5, "note": "x"})
    m.close()
    rec = json.loads(open(p).read().strip())
    assert rec["scope"] == "train" and rec["step"] == 3
    assert rec["loss"] == 1.5 and rec["note"] == "x"


def test_tensorboard_mirror(tmp_path):
    try:
        from torch.utils.tensorboard import SummaryWriter  # noqa: F401
    except Exception:
        import pytest

        pytest.skip("tensorboard unavailable")
    tb = str(tmp_path / "tb")
    m = MetricsLogger(None, tb_dir=tb)
    m.log("val", 1, {"map_50": 0.5})
    m.close()
    files = [f for f in os.listdir(tb) if "tfevents" in f]
    assert files, "no TensorBoard event file written"


def test_disabled_logger_is_noop(tmp_path):
    m = MetricsLogger(None)
    m.log("train", 0, {"loss": 1.0})  # must not raise
    m.close()

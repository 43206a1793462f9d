import numpy as np

from dgod_tpu.eval import MeanAveragePrecision


def test_perfect_detection_ap1():
    m = MeanAveragePrecision()
    gt = np.array([[0, 0, 10, 10], [20, 20, 40, 40]], float)
    labels = np.array([1, 2])
    m.update(gt, np.array([0.9, 0.8]), labels, gt, labels)
    out = m.compute()
    assert np.isclose(out["map_50"], 1.0)
    assert np.allclose(out["map_per_class"], [1.0, 1.0])


def test_missed_gt_reduces_ap():
    m = MeanAveragePrecision()
    gt = np.array([[0, 0, 10, 10], [20, 20, 40, 40]], float)
    labels = np.array([1, 1])
    # only detect the first gt
    m.update(gt[:1], np.array([0.9]), labels[:1], gt, labels)
    out = m.compute()
    # recall caps at 0.5: 101-pt AP = 51/101
    assert np.isclose(out["map_50"], 51 / 101, atol=1e-6)


def test_false_positive_after_tp():
    m = MeanAveragePrecision()
    gt = np.array([[0, 0, 10, 10]], float)
    preds = np.array([[0, 0, 10, 10], [50, 50, 60, 60]], float)
    m.update(preds, np.array([0.9, 0.8]), np.array([1, 1]), gt, np.array([1]))
    out = m.compute()
    # TP at rank 1 -> precision 1 at recall 1; FP later doesn't hurt interp AP
    assert np.isclose(out["map_50"], 1.0)


def test_fp_before_tp_hurts():
    m = MeanAveragePrecision()
    gt = np.array([[0, 0, 10, 10]], float)
    preds = np.array([[50, 50, 60, 60], [0, 0, 10, 10]], float)
    m.update(preds, np.array([0.9, 0.8]), np.array([1, 1]), gt, np.array([1]))
    out = m.compute()
    # best precision at recall>=r is 0.5 for all r
    assert np.isclose(out["map_50"], 0.5)


def test_iou_below_threshold_is_fp():
    m = MeanAveragePrecision()
    gt = np.array([[0, 0, 10, 10]], float)
    pred = np.array([[6, 6, 16, 16]], float)  # IoU = 16/184 < 0.5
    m.update(pred, np.array([0.9]), np.array([1]), gt, np.array([1]))
    assert m.compute()["map_50"] == 0.0


def test_class_without_gt_excluded():
    m = MeanAveragePrecision()
    gt = np.array([[0, 0, 10, 10]], float)
    # detection of class 2 never appears in gt -> class 2 gets -1, excluded
    m.update(
        np.array([[0, 0, 10, 10], [0, 0, 10, 10]], float),
        np.array([0.9, 0.7]),
        np.array([1, 2]),
        gt,
        np.array([1]),
    )
    out = m.compute()
    assert np.isclose(out["map_50"], 1.0)
    assert out["map_per_class"][list(out["classes"]).index(2)] == -1


def test_each_gt_matched_once():
    m = MeanAveragePrecision()
    gt = np.array([[0, 0, 10, 10]], float)
    # two identical detections: second is a duplicate FP
    preds = np.array([[0, 0, 10, 10], [0, 0, 10, 10]], float)
    m.update(preds, np.array([0.9, 0.8]), np.array([1, 1]), gt, np.array([1]))
    out = m.compute()
    assert np.isclose(out["map_50"], 1.0)  # TP came first; dup FP after max recall


def test_padded_inputs_with_masks():
    m = MeanAveragePrecision()
    gt = np.zeros((5, 4))
    gt[0] = [0, 0, 10, 10]
    preds = np.zeros((3, 4))
    preds[0] = [0, 0, 10, 10]
    m.update(
        preds, np.array([0.9, 0, 0]), np.array([1, 0, 0]),
        gt, np.array([1, 0, 0, 0, 0]),
        pred_valid=np.array([True, False, False]),
        gt_valid=np.array([True, False, False, False, False]),
    )
    assert np.isclose(m.compute()["map_50"], 1.0)

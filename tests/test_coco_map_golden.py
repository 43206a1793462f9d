"""Cross-validation of the mAP evaluator against an independently written
COCOeval transcription + a frozen golden fixture.

Closes the "oracle is also ours" loop as far as this zero-egress
environment allows (pycocotools/torchmetrics are not installable): two
implementations with different structure (per-class streaming in
dgod_tpu/eval/coco_map.py vs per-image evaluateImg/accumulate in
tests/_cocoeval_indep.py) must agree exactly on fuzzed inputs, and both
must reproduce the values frozen in tests/fixtures/coco_map_golden.json.
Reference metric semantics: /root/reference/DGcommon.py:127 (torchmetrics
MeanAveragePrecision(iou_type="bbox", iou_thresholds=[0.5])).
"""
import json
import os

import numpy as np
import pytest

from dgod_tpu.eval import MeanAveragePrecision

from _cocoeval_indep import map_50 as indep_map50

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "coco_map_golden.json")


def random_scene(rng, n_images, n_classes=8, max_det=25, max_gt=12):
    images = []
    for _ in range(n_images):
        n_d = rng.randint(0, max_det + 1)
        n_g = rng.randint(0, max_gt + 1)
        def boxes(n):
            xy = rng.uniform(0, 500, (n, 2))
            wh = rng.uniform(1, 120, (n, 2))
            return np.concatenate([xy, xy + wh], 1)
        gt_b = boxes(n_g)
        det_b = boxes(n_d)
        # make many detections near-duplicates of GT so matching paths
        # (exact IoU ties, multi-det-per-gt) are exercised
        for i in range(n_d):
            if n_g and rng.rand() < 0.6:
                g = gt_b[rng.randint(n_g)]
                det_b[i] = g + rng.uniform(-8, 8, 4)
        det_s = np.round(rng.rand(n_d), 2)  # coarse scores -> score ties
        images.append({
            "det_boxes": det_b, "det_scores": det_s,
            "det_labels": rng.randint(1, n_classes + 1, n_d),
            "gt_boxes": gt_b,
            "gt_labels": rng.randint(1, n_classes + 1, n_g),
        })
    return images


def run_ours(images):
    metric = MeanAveragePrecision()
    for im in images:
        metric.update(im["det_boxes"], im["det_scores"], im["det_labels"],
                      im["gt_boxes"], im["gt_labels"])
    return metric.compute()


@pytest.mark.parametrize("seed", range(25))
def test_cross_impl_fuzz(seed):
    rng = np.random.RandomState(seed)
    images = random_scene(rng, n_images=rng.randint(1, 8))
    ours = run_ours(images)
    indep = indep_map50(images)
    np.testing.assert_array_equal(ours["classes"], indep["classes"])
    np.testing.assert_allclose(
        ours["map_per_class"], indep["map_per_class"], atol=1e-12)
    np.testing.assert_allclose(ours["map_50"], indep["map_50"], atol=1e-12)


def test_edge_cases_cross_impl():
    # empty dets, empty gts, class only in dets, class only in gt
    images = [
        {"det_boxes": np.zeros((0, 4)), "det_scores": np.zeros(0),
         "det_labels": np.zeros(0, int),
         "gt_boxes": np.array([[0., 0., 10., 10.]]),
         "gt_labels": np.array([1])},
        {"det_boxes": np.array([[0., 0., 10., 10.], [1., 1., 11., 11.]]),
         "det_scores": np.array([0.9, 0.8]),
         "det_labels": np.array([2, 3]),
         "gt_boxes": np.zeros((0, 4)), "gt_labels": np.zeros(0, int)},
    ]
    ours = run_ours(images)
    indep = indep_map50(images)
    np.testing.assert_allclose(
        ours["map_per_class"], indep["map_per_class"], atol=1e-12)
    # class 1: gt but no det -> AP 0; classes 2,3: det but no gt -> excluded
    assert ours["map_50"] == 0.0


def test_golden_fixture():
    with open(FIXTURE) as f:
        fx = json.load(f)
    images = [
        {k: np.asarray(v) for k, v in im.items()} for im in fx["images"]
    ]
    expected = np.asarray(fx["map_per_class"], np.float64)
    for result in (run_ours(images), indep_map50(images)):
        np.testing.assert_array_equal(result["classes"], fx["classes"])
        np.testing.assert_allclose(result["map_per_class"], expected,
                                   atol=1e-9)
        np.testing.assert_allclose(result["map_50"], fx["map_50"], atol=1e-9)

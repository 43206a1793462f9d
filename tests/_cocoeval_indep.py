"""Independent COCO mAP implementation, structured after pycocotools'
COCOeval (evaluateImg / accumulate split), for cross-validating
dgod_tpu.eval.coco_map.MeanAveragePrecision.

Why this exists: pycocotools / torchmetrics are not installable in this
environment (zero egress), so the evaluator cannot be diffed against the
reference metric directly (reference usage: /root/reference/DGcommon.py:127).
This module is a *second, independently written* transcription of the
published pycocotools algorithm — per-(image, category) greedy matching
with last-index tie-break, global mergesort score accumulation, 101-point
interpolated AP — organised the way COCOeval organises it (per-image eval
records, then a separate accumulate pass) rather than the way
coco_map.py organises it (per-class streaming). Divergence between the two
implementations on fuzzed inputs flags a bug in one of them; agreement with
the frozen golden fixture (tests/fixtures/coco_map_golden.json) flags
regressions in either.
"""

from __future__ import annotations

import numpy as np

REC_THRS = np.linspace(0.0, 1.0, 101)


def iou_xyxy(d, g):
    """COCOeval computeIoU (bbox branch, no crowd), xyxy inputs."""
    d = np.asarray(d, np.float64).reshape(-1, 4)
    g = np.asarray(g, np.float64).reshape(-1, 4)
    out = np.zeros((len(d), len(g)))
    for i, db in enumerate(d):
        da = max(db[2] - db[0], 0.0) * max(db[3] - db[1], 0.0)
        for j, gb in enumerate(g):
            ga = max(gb[2] - gb[0], 0.0) * max(gb[3] - gb[1], 0.0)
            iw = min(db[2], gb[2]) - max(db[0], gb[0])
            ih = min(db[3], gb[3]) - max(db[1], gb[1])
            if iw <= 0 or ih <= 0:
                continue
            inter = iw * ih
            union = da + ga - inter
            if union > 0:
                out[i, j] = inter / union
    return out


def evaluate_img(det_boxes, det_scores, gt_boxes, iou_thr, max_det):
    """COCOeval.evaluateImg for one (image, category) cell.

    Returns (dtScores_sorted, dtMatched_flags, nGT) with dets capped at
    max_det after the score sort (mergesort, like pycocotools).
    """
    order = np.argsort(-np.asarray(det_scores, np.float64), kind="mergesort")
    order = order[:max_det]
    db = np.asarray(det_boxes, np.float64).reshape(-1, 4)[order]
    ds = np.asarray(det_scores, np.float64)[order]
    gb = np.asarray(gt_boxes, np.float64).reshape(-1, 4)
    ious = iou_xyxy(db, gb)
    gtm = np.full(len(gb), -1)
    dtm = np.zeros(len(db), bool)
    for dind in range(len(db)):
        iou = min(iou_thr, 1 - 1e-10)
        m = -1
        for gind in range(len(gb)):
            if gtm[gind] >= 0:
                continue
            if ious[dind, gind] < iou:
                continue
            iou = ious[dind, gind]
            m = gind
        if m >= 0:
            gtm[m] = dind
            dtm[dind] = True
    return ds, dtm, len(gb)


def accumulate(per_image, rec_thrs=REC_THRS):
    """COCOeval.accumulate for one category over all images.

    per_image: list of (scores, matched, n_gt) from evaluate_img.
    Returns AP (mean of the 101 interpolated precisions), or None when the
    category has no ground truth anywhere (excluded from the mean, the
    precision=-1 convention).
    """
    n_gt = sum(n for _, _, n in per_image)
    if n_gt == 0:
        return None
    scores = np.concatenate([s for s, _, _ in per_image]) if per_image else np.zeros(0)
    matched = np.concatenate([m for _, m, _ in per_image]) if per_image else np.zeros(0, bool)
    if len(scores) == 0:
        return 0.0
    inds = np.argsort(-scores, kind="mergesort")
    matched = matched[inds]
    tps = np.cumsum(matched, dtype=np.float64)
    fps = np.cumsum(~matched, dtype=np.float64)
    rc = tps / n_gt
    pr = tps / (fps + tps + np.spacing(1))
    q = np.zeros(len(rec_thrs))
    # pycocotools: walk precision from the right making it monotone...
    pr = pr.tolist()
    for i in range(len(pr) - 1, 0, -1):
        if pr[i] > pr[i - 1]:
            pr[i - 1] = pr[i]
    # ...then read it off at the recall thresholds
    inds = np.searchsorted(rc, rec_thrs, side="left")
    for ri, pi in enumerate(inds):
        if pi < len(pr):
            q[ri] = pr[pi]
    return float(np.mean(q))


def map_50(images, iou_thr=0.5, max_det=100):
    """Full metric over a dataset.

    images: list of dicts with keys det_boxes, det_scores, det_labels,
    gt_boxes, gt_labels (unpadded numpy arrays).
    Returns {"map_50", "map_per_class", "classes"} with the same
    conventions as coco_map.MeanAveragePrecision.compute().
    """
    cats = set()
    for im in images:
        cats |= set(int(c) for c in np.unique(im["det_labels"]))
        cats |= set(int(c) for c in np.unique(im["gt_labels"]))
    cats = sorted(cats)
    per_class = []
    for cat in cats:
        cells = []
        for im in images:
            dm = np.asarray(im["det_labels"]) == cat
            gm = np.asarray(im["gt_labels"]) == cat
            cells.append(
                evaluate_img(
                    np.asarray(im["det_boxes"]).reshape(-1, 4)[dm],
                    np.asarray(im["det_scores"])[dm],
                    np.asarray(im["gt_boxes"]).reshape(-1, 4)[gm],
                    iou_thr, max_det,
                )
            )
        per_class.append(accumulate(cells))
    vals = np.asarray(
        [(-1.0 if ap is None else ap) for ap in per_class], np.float64
    )
    valid = vals > -1
    return {
        "map_50": float(vals[valid].mean()) if valid.any() else -1.0,
        "map_per_class": vals,
        "classes": np.asarray(cats),
    }

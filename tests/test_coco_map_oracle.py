"""Randomized cross-check of eval/coco_map.py against a brute-force oracle.

The oracle is an independent re-implementation of pycocotools semantics
(reference consumer: torchmetrics MeanAveragePrecision at
/root/reference/DGcommon.py:127,168-172):
- per image & class: detections sorted by score desc (stable), capped at
  maxDets, each greedily matched to the untaken GT with the highest IoU
  >= threshold, equal-IoU ties to the LAST GT index (pycocotools's
  `if ious[d,g] < iou: continue` loop),
- global score-desc stable accumulation,
- AP = mean over 101 recall thresholds of max precision at recall >= r,
  computed by direct scan (no searchsorted / monotonic-fix tricks),
- classes absent from GT excluded from the mean.

1000 fuzzed cases + directed edge cases; agreement to 1e-9.
"""

import numpy as np

from dgod_tpu.eval.coco_map import MeanAveragePrecision

REC_THRS = [i / 100.0 for i in range(101)]


def _iou(a, b):
    ix1, iy1 = max(a[0], b[0]), max(a[1], b[1])
    ix2, iy2 = min(a[2], b[2]), min(a[3], b[3])
    iw, ih = max(0.0, ix2 - ix1), max(0.0, iy2 - iy1)
    inter = iw * ih
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / ua if ua > 0 else 0.0


def oracle_map(preds, targets, thr=0.5, max_dets=100):
    """preds: per image (boxes, scores, labels); targets: (boxes, labels)."""
    classes = set()
    for _, _, dl in preds:
        classes.update(int(c) for c in dl)
    for _, gl in targets:
        classes.update(int(c) for c in gl)

    aps = []
    for cls in sorted(classes):
        n_gt = sum(int(np.sum(np.asarray(gl) == cls)) for _, gl in targets)
        if n_gt == 0:
            continue  # absent from GT -> excluded
        # (score, seq) records with matched flag, in image order for a
        # stable global sort
        records = []
        for (db, ds, dl), (gb, gl) in zip(preds, targets):
            d_idx = [i for i in range(len(dl)) if int(dl[i]) == cls]
            g_idx = [i for i in range(len(gl)) if int(gl[i]) == cls]
            # stable score-desc order, then cap
            d_idx = sorted(d_idx, key=lambda i: (-float(ds[i]), i))[:max_dets]
            taken = [False] * len(g_idx)
            for i in d_idx:
                best, best_iou = -1, thr if thr < 1.0 else 1.0 - 1e-10
                for jj, j in enumerate(g_idx):
                    if taken[jj]:
                        continue
                    iou = _iou(db[i], gb[j])
                    if iou >= best_iou:  # >= : later gt wins ties
                        best, best_iou = jj, iou
                records.append((float(ds[i]), best >= 0))
                if best >= 0:
                    taken[best] = True
        if not records:
            aps.append(0.0)
            continue
        # stable global sort by score desc (insertion order preserved)
        records = sorted(enumerate(records), key=lambda t: (-t[1][0], t[0]))
        tp = fp = 0
        pr = []  # (recall, precision) after each detection
        for _, (_, ok) in records:
            tp, fp = tp + ok, fp + (not ok)
            pr.append((tp / n_gt, tp / (tp + fp)))
        ap = 0.0
        for r in REC_THRS:
            best_p = 0.0
            for rec, p in pr:
                if rec >= r and p > best_p:
                    best_p = p
            ap += best_p
        aps.append(ap / len(REC_THRS))
    return float(np.mean(aps)) if aps else -1.0


def _run_both(preds, targets):
    metric = MeanAveragePrecision()
    for (db, ds, dl), (gb, gl) in zip(preds, targets):
        metric.update(db, ds, dl, gb, gl)
    ours = metric.compute()["map_50"]
    ref = oracle_map(preds, targets)
    return ours, ref


def _rand_case(rng, n_classes=4, max_imgs=5, max_dets=25, max_gts=12,
               coord_quant=None, score_quant=None):
    n_img = rng.randint(1, max_imgs + 1)
    preds, targets = [], []
    for _ in range(n_img):
        n_d = rng.randint(0, max_dets + 1)
        n_g = rng.randint(0, max_gts + 1)

        def boxes(n):
            xy = rng.uniform(0, 80, (n, 2))
            wh = rng.uniform(0, 40, (n, 2))  # zero-size boxes possible
            b = np.concatenate([xy, xy + wh], 1)
            if coord_quant:
                b = np.round(b / coord_quant) * coord_quant
            return b

        scores = rng.uniform(0, 1, n_d)
        if score_quant:
            scores = np.round(scores * score_quant) / score_quant  # many ties
        preds.append((boxes(n_d), scores, rng.randint(1, n_classes + 1, n_d)))
        targets.append((boxes(n_g), rng.randint(1, n_classes + 1, n_g)))
    return preds, targets


def test_fuzz_1000_cases_match_oracle():
    rng = np.random.RandomState(12345)
    for case in range(1000):
        # every 3rd case quantizes coords (IoU ties) and scores (score ties)
        preds, targets = _rand_case(
            rng,
            coord_quant=8.0 if case % 3 == 0 else None,
            score_quant=4 if case % 3 == 0 else None,
        )
        ours, ref = _run_both(preds, targets)
        assert abs(ours - ref) <= 1e-9, (
            f"case {case}: ours={ours!r} oracle={ref!r}"
        )


def test_duplicate_detections_same_box():
    # many detections on one gt: exactly one TP, rest FP
    gt = (np.array([[10.0, 10, 50, 50]]), np.array([1]))
    det = (np.tile([10.0, 10, 50, 50], (5, 1)),
           np.array([0.9, 0.8, 0.7, 0.6, 0.5]), np.ones(5, int))
    ours, ref = _run_both([det], [gt])
    assert abs(ours - ref) <= 1e-9
    assert abs(ours - 1.0) <= 1e-9  # recall 1 reached at precision 1


def test_empty_everything():
    ours, ref = _run_both(
        [(np.zeros((0, 4)), np.zeros(0), np.zeros(0, int))],
        [(np.zeros((0, 4)), np.zeros(0, int))],
    )
    assert ours == ref == -1.0


def test_gt_but_no_preds():
    ours, ref = _run_both(
        [(np.zeros((0, 4)), np.zeros(0), np.zeros(0, int))],
        [(np.array([[0.0, 0, 10, 10]]), np.array([3]))],
    )
    assert abs(ours - ref) <= 1e-9 and ours == 0.0


def test_preds_but_no_gt_class_excluded():
    # detections of class 2 with no class-2 gt anywhere: class 2 excluded,
    # class 1 perfect -> map 1.0
    preds = [(np.array([[0.0, 0, 10, 10], [20.0, 20, 30, 30]]),
              np.array([0.9, 0.8]), np.array([1, 2]))]
    targets = [(np.array([[0.0, 0, 10, 10]]), np.array([1]))]
    ours, ref = _run_both(preds, targets)
    assert abs(ours - ref) <= 1e-9 and abs(ours - 1.0) <= 1e-9


def test_max_detections_cap():
    # 150 perfect-ish detections, only the top-100 by score count
    rng = np.random.RandomState(0)
    n = 150
    gb = np.stack([np.arange(n) * 60.0, np.zeros(n),
                   np.arange(n) * 60.0 + 50, np.full(n, 50.0)], 1)
    det_order = rng.permutation(n)
    preds = [(gb[det_order], np.linspace(1, 0.01, n),
              np.ones(n, int))]
    targets = [(gb, np.ones(n, int))]
    ours, ref = _run_both(preds, targets)
    assert abs(ours - ref) <= 1e-9


def test_iou_exactly_at_threshold():
    # IoU == 0.5 exactly must count as a match (pycocotools >= semantics)
    gt = (np.array([[0.0, 0, 10, 10]]), np.array([1]))
    det = (np.array([[0.0, 0, 10, 5.0]]), np.array([0.9]), np.array([1]))
    # iou = 50/100 = 0.5
    ours, ref = _run_both([det], [gt])
    assert abs(ours - ref) <= 1e-9 and abs(ours - 1.0) <= 1e-9

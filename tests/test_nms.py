"""NMS correctness vs an independent numpy greedy reference."""
import numpy as np
import jax.numpy as jnp

from dgod_tpu.ops import nms as N


def greedy_nms_ref(boxes, scores, thr):
    """Straightforward numpy greedy NMS (torchvision semantics)."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        bi = boxes[i]
        for j in order:
            if suppressed[j] or j == i:
                continue
            xx1 = max(bi[0], boxes[j][0])
            yy1 = max(bi[1], boxes[j][1])
            xx2 = min(bi[2], boxes[j][2])
            yy2 = min(bi[3], boxes[j][3])
            inter = max(0, xx2 - xx1) * max(0, yy2 - yy1)
            a1 = (bi[2] - bi[0]) * (bi[3] - bi[1])
            a2 = (boxes[j][2] - boxes[j][0]) * (boxes[j][3] - boxes[j][1])
            iou = inter / (a1 + a2 - inter) if a1 + a2 - inter > 0 else 0
            if iou > thr:
                suppressed[j] = True
    return np.array(keep)


def random_boxes(rng, n, scale=100):
    xy = rng.uniform(0, scale, (n, 2))
    wh = rng.uniform(5, 30, (n, 2))
    return np.concatenate([xy, xy + wh], 1).astype(np.float32)


def test_nms_mask_matches_reference():
    rng = np.random.RandomState(0)
    for trial in range(5):
        n = 64
        boxes = random_boxes(rng, n)
        scores = rng.rand(n).astype(np.float32)
        ref = greedy_nms_ref(boxes, scores, 0.5)
        keep = np.asarray(
            N.nms_mask(jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(n, bool), 0.5)
        )
        assert set(np.where(keep)[0]) == set(ref)


def test_nms_mask_respects_valid():
    boxes = np.array([[0, 0, 10, 10], [0, 0, 10, 10]], np.float32)
    scores = np.array([0.9, 0.8], np.float32)
    keep = np.asarray(
        N.nms_mask(jnp.asarray(boxes), jnp.asarray(scores), jnp.array([False, True]), 0.5)
    )
    assert not keep[0] and keep[1]


def test_nms_topk_matches_truncated_reference():
    rng = np.random.RandomState(1)
    n, k = 80, 10
    boxes = random_boxes(rng, n)
    scores = rng.rand(n).astype(np.float32)
    ref = greedy_nms_ref(boxes, scores, 0.5)[:k]
    idx, ok, _ = N.nms_topk(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(n, bool), 0.5, k
    )
    idx, ok = np.asarray(idx), np.asarray(ok)
    assert np.array_equal(idx[ok], ref[: ok.sum()])
    assert ok.sum() == min(k, len(ref))


def test_batched_nms_keeps_classes_separate():
    boxes = np.array([[0, 0, 10, 10], [0, 0, 10, 10]], np.float32)
    scores = np.array([0.9, 0.8], np.float32)
    labels = np.array([1, 2])
    keep = np.asarray(
        N.batched_nms_mask(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(labels),
            jnp.ones(2, bool), 0.5,
        )
    )
    assert keep.all()  # same box, different class -> both survive

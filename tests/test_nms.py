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


def test_blocked_equals_fixed_point_random():
    rng = np.random.RandomState(7)
    for trial in range(6):
        K = [60, 256, 300, 511, 512, 900][trial]
        xy = rng.uniform(0, 400, (K, 2)).astype(np.float32)
        wh = rng.uniform(5, 120, (K, 2)).astype(np.float32)
        boxes = jnp.asarray(np.concatenate([xy, xy + wh], 1))
        scores = jnp.asarray(rng.uniform(0, 1, K).astype(np.float32))
        valid = jnp.asarray(rng.uniform(0, 1, K) > 0.1)
        a = np.asarray(N.nms_mask(boxes, scores, valid, 0.7))
        b = np.asarray(N.nms_mask_blocked(boxes, scores, valid, 0.7,
                                            block=128))
        np.testing.assert_array_equal(a, b)


def test_blocked_suppression_chain_across_blocks():
    # boxes in a line, each overlapping its neighbour at IoU 0.6 and its
    # next-next at 0.33: greedy keeps the evens; the chain spans many
    # blocks so cross-block suppression must propagate exactly
    K = 640
    x0 = np.arange(K, dtype=np.float32) * 25.0
    boxes = jnp.asarray(np.stack([x0, np.zeros(K, np.float32),
                                  x0 + 100, np.full(K, 50, np.float32)], 1))
    scores = jnp.asarray(np.linspace(1.0, 0.5, K).astype(np.float32))
    valid = jnp.ones(K, bool)
    keep = np.asarray(N.nms_mask_blocked(boxes, scores, valid, 0.5,
                                           block=64))
    expect = np.arange(K) % 2 == 0
    np.testing.assert_array_equal(keep, expect)
    np.testing.assert_array_equal(
        keep, np.asarray(N.nms_mask(boxes, scores, valid, 0.5)))

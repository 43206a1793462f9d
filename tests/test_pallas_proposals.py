"""Fused Pallas proposal kernel vs the XLA decode+NMS chain (exact)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dgod_tpu.ops import boxes as box_ops
from dgod_tpu.ops import nms as nms_ops
from dgod_tpu.ops.pallas_proposals import fused_decode_nms


def _inputs(rng, b, k, hw=(64.0, 128.0)):
    h, w = hw
    cx = rng.uniform(0, w, (b, k))
    cy = rng.uniform(0, h, (b, k))
    aw = rng.uniform(4, 40, (b, k))
    ah = rng.uniform(4, 40, (b, k))
    anchors = np.stack([cx - aw / 2, cy - ah / 2, cx + aw / 2, cy + ah / 2],
                       axis=-1).astype(np.float32)
    deltas = (0.2 * rng.randn(b, k, 4)).astype(np.float32)
    # a few extreme deltas exercise the log clip + the clip-to-image +
    # small-box paths
    deltas[:, ::17, 2:] = 8.0
    deltas[:, ::23, :2] = -5.0
    scores = -np.sort(-rng.randn(b, k).astype(np.float32), axis=1)  # desc
    sizes = np.tile(np.float32([h, w]), (b, 1))
    return deltas, anchors, scores, sizes


def _xla_reference(deltas, anchors, scores, sizes, thr):
    def per_image(dl, anc, sc, size):
        boxes = box_ops.delta_decode(dl, anc)
        boxes = box_ops.clip_boxes(boxes, size[0], size[1])
        ok = box_ops.small_box_mask(boxes, 1e-3)
        keep = nms_ops.nms_mask_blocked(boxes, sc, ok, thr)
        return boxes, keep

    return jax.vmap(per_image)(
        jnp.asarray(deltas), jnp.asarray(anchors), jnp.asarray(scores),
        jnp.asarray(sizes))


@pytest.mark.parametrize("k", [128, 570, 2000])
def test_fused_decode_nms_matches_xla(k):
    rng = np.random.RandomState(k)
    deltas, anchors, scores, sizes = _inputs(rng, 2, k)
    thr = 0.7
    boxes_ref, keep_ref = _xla_reference(deltas, anchors, scores, sizes, thr)
    boxes_p, keep_p = fused_decode_nms(
        jnp.asarray(deltas), jnp.asarray(anchors), jnp.asarray(scores),
        jnp.asarray(sizes), iou_threshold=thr, interpret=True)
    np.testing.assert_allclose(np.asarray(boxes_p), np.asarray(boxes_ref),
                               rtol=1e-5, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(keep_p), np.asarray(keep_ref))


def test_fused_decode_nms_all_invalid():
    """Degenerate boxes (below min_size) must yield an empty keep mask."""
    b, k = 1, 128
    anchors = np.tile(np.float32([10, 10, 10, 10]), (b, k, 1))  # zero-area
    deltas = np.zeros((b, k, 4), np.float32)
    scores = np.zeros((b, k), np.float32)
    sizes = np.float32([[64, 128]])
    _, keep = fused_decode_nms(
        jnp.asarray(deltas), jnp.asarray(anchors), jnp.asarray(scores),
        jnp.asarray(sizes), iou_threshold=0.7, interpret=True)
    assert not np.asarray(keep).any()

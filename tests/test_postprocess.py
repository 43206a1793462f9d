"""Semantic tests for detector postprocessing (not just shapes)."""
import numpy as np
import jax
import jax.numpy as jnp

from dgod_tpu.models.fcos import fcos_anchors_for, fcos_postprocess
from dgod_tpu.ops import anchors as A


def test_fcos_postprocess_recovers_planted_box():
    canvas = (64, 128)
    anchors, counts = fcos_anchors_for(canvas)
    anchors = jnp.asarray(anchors)
    R = int(sum(counts))
    C = 9

    # plant one confident detection at the level-0 anchor nearest (24, 40):
    # regression l=t=r=b=8/stride (normalized by anchor size == stride)
    ctrs = np.asarray(0.5 * (anchors[:, :2] + anchors[:, 2:]))
    target_idx = int(np.argmin(np.abs(ctrs - [40, 24]).sum(1)))
    cls_logits = np.full((1, R, C), -20.0, np.float32)
    cls_logits[0, target_idx, 3] = 8.0
    ctrness = np.full((1, R, 1), -20.0, np.float32)
    ctrness[0, target_idx, 0] = 8.0
    reg = np.zeros((1, R, 4), np.float32)
    reg[0, target_idx] = 1.0  # l=t=r=b = anchor_size -> box of side 2*stride

    dets = jax.jit(
        lambda o: fcos_postprocess(
            o, anchors, tuple(counts),
            jnp.asarray([[64.0, 128.0]]), jnp.asarray([[2.0, 2.0]]),
        )
    )({
        "cls_logits": jnp.asarray(cls_logits),
        "bbox_regression": jnp.asarray(reg),
        "bbox_ctrness": jnp.asarray(ctrness),
    })
    valid = np.asarray(dets["valid"][0])
    assert valid.sum() == 1
    i = int(np.argmax(valid))
    assert int(dets["labels"][0, i]) == 3
    # expected box: centre +/- stride (8), then scaled back by 2x
    cx, cy = ctrs[target_idx]
    exp = np.array([cx - 8, cy - 8, cx + 8, cy + 8]) * 2.0
    np.testing.assert_allclose(np.asarray(dets["boxes"][0, i]), exp, atol=1e-3)
    assert float(dets["scores"][0, i]) > 0.99


def test_fcos_postprocess_score_threshold():
    canvas = (64, 128)
    anchors, counts = fcos_anchors_for(canvas)
    anchors = jnp.asarray(anchors)
    R = int(sum(counts))
    # everything below the 0.2 score threshold -> no detections
    dets = jax.jit(
        lambda o: fcos_postprocess(
            o, anchors, tuple(counts),
            jnp.asarray([[64.0, 128.0]]), jnp.ones((1, 2)),
        )
    )({
        "cls_logits": jnp.full((1, R, 9), -5.0),
        "bbox_regression": jnp.ones((1, R, 4)),
        "bbox_ctrness": jnp.full((1, R, 1), -5.0),
    })
    assert np.asarray(dets["valid"]).sum() == 0


def test_schedulers_match_torch_semantics():
    from dgod_tpu.train.optim import EarlyStopping, ReduceLROnPlateau

    # plateau: patience 5 -> reduce on the 6th consecutive bad epoch
    p = ReduceLROnPlateau(factor=0.1, patience=5)
    p.step(0.5)
    scales = [p.step(0.4) for _ in range(6)]
    assert scales[-2] == 1.0 and scales[-1] == 0.1
    # improvement resets the counter
    p2 = ReduceLROnPlateau(factor=0.1, patience=2)
    p2.step(0.5)
    p2.step(0.4)
    p2.step(0.6)  # improvement
    assert p2.step(0.5) == 1.0

    es = EarlyStopping(patience=3)
    assert not es.step(0.5)
    assert not es.step(0.4)
    assert not es.step(0.4)
    assert es.step(0.4)  # 3rd bad epoch


def test_rpn_anchor_counts_for_reference_canvas():
    shapes = A.fpn_feat_shapes((608, 1216), (4, 8, 16, 32, 64))
    assert shapes == [(152, 304), (76, 152), (38, 76), (19, 38), (10, 19)]
    anchors, counts = A.rpn_anchors(shapes, (608, 1216))
    assert counts == [152 * 304 * 3, 76 * 152 * 3, 38 * 76 * 3, 19 * 38 * 3,
                      10 * 19 * 3]
    assert anchors.shape[0] == sum(counts)

"""FCOS loss golden-value tests on a tiny hand-checkable anchor grid."""
import numpy as np
import jax
import jax.numpy as jnp

from dgod_tpu.models.fcos import FCOSLossConfig, fcos_loss
from dgod_tpu.ops import anchors as A


def make_inputs(gt_boxes, gt_labels, image=(64, 64), shapes=((8, 8),), sizes=(8,)):
    anchors, counts = A.fcos_anchors(list(shapes), image, sizes=sizes)
    R = anchors.shape[0]
    B, G = 1, len(gt_boxes)
    boxes = np.zeros((B, max(G, 1), 4), np.float32)
    labels = np.zeros((B, max(G, 1)), np.int32)
    valid = np.zeros((B, max(G, 1)), bool)
    if G:
        boxes[0, :G] = gt_boxes
        labels[0, :G] = gt_labels
        valid[0, :G] = True
    outputs = {
        "cls_logits": jnp.zeros((B, R, 9)),
        "bbox_regression": jnp.ones((B, R, 4)),
        "bbox_ctrness": jnp.zeros((B, R, 1)),
    }
    return outputs, jnp.asarray(anchors), tuple(counts), (
        jnp.asarray(boxes), jnp.asarray(labels), jnp.asarray(valid)
    )


def test_no_gt_all_losses_from_background():
    outputs, anchors, counts, (b, l, v) = make_inputs([], [])
    losses, gt_classes = jax.jit(
        lambda o, bb, ll, vv: fcos_loss(o, anchors, counts, bb, ll, vv)
    )(outputs, b, l, v)
    # no foreground: reg and ctr losses must be exactly 0, cls = focal on all-bg
    assert float(losses["bbox_regression"]) == 0.0
    assert float(losses["bbox_ctrness"]) == 0.0
    assert float(losses["classification"]) > 0.0
    assert np.asarray(gt_classes).sum() == 0


def test_single_gt_centred_box():
    # 24x24 box centred at (32,32) on a stride-8 level
    gt = [[20.0, 20.0, 44.0, 44.0]]
    outputs, anchors, counts, (b, l, v) = make_inputs(gt, [3])
    losses, gt_classes = jax.jit(
        lambda o, bb, ll, vv: fcos_loss(o, anchors, counts, bb, ll, vv)
    )(outputs, b, l, v)
    gt_classes = np.asarray(gt_classes)
    n_fg = int(gt_classes.sum())
    assert n_fg > 0
    # all matched anchors carry class 3
    assert gt_classes[..., 3].sum() == n_fg
    for k in ("classification", "bbox_regression", "bbox_ctrness"):
        assert np.isfinite(float(losses[k]))
    # losses normalised by n_fg: scale check on classification
    # (focal of zeros-logits vs the dense one-hot target)
    from dgod_tpu.ops.losses import sigmoid_focal_loss

    expected_cls = float(
        jnp.sum(sigmoid_focal_loss(outputs["cls_logits"], jnp.asarray(gt_classes)))
        / n_fg
    )
    assert np.isclose(float(losses["classification"]), expected_cls, rtol=1e-5)


def test_centreness_target_formula():
    # anchor centred exactly at gt centre -> l=r, t=b -> ctr target 1.
    # torchvision grid anchors have centres at multiples of the stride
    # (shift grid starts at 0), so pick gt centred at (16, 16)
    gt = [[16.0 - 12, 16.0 - 12, 16.0 + 12, 16.0 + 12]]
    outputs, anchors, counts, (b, l, v) = make_inputs(gt, [1])
    ctr = 0.5 * (np.asarray(anchors)[:, :2] + np.asarray(anchors)[:, 2:])
    on_centre = np.where((ctr == [16, 16]).all(1))[0]
    assert len(on_centre) == 1
    # bce of logit 0 against target 1 at that anchor = log(2) contribution
    losses_perfect, _ = jax.jit(
        lambda o, bb, ll, vv: fcos_loss(o, anchors, counts, bb, ll, vv)
    )(outputs, b, l, v)
    assert np.isfinite(float(losses_perfect["bbox_ctrness"]))


def test_single_gt_quirk_flag():
    gt = [[20.0, 20.0, 44.0, 44.0]]
    outputs, anchors, counts, (b, l, v) = make_inputs(gt, [3])
    cfg = FCOSLossConfig(single_gt_quirk=True)
    _, gt_classes = jax.jit(
        lambda o, bb, ll, vv: fcos_loss(o, anchors, counts, bb, ll, vv, cfg)
    )(outputs, b, l, v)
    gt_classes = np.asarray(gt_classes)
    # reference branch: <=1 gt -> targets become class 0 at matched anchors
    assert gt_classes[..., 3].sum() == 0
    assert gt_classes[..., 0].sum() > 0

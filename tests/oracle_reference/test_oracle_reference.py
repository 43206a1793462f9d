"""Differential oracle: the reference's OWN loss/matcher code vs dgod_tpu.

VERDICT round-4 #1: with tvshim.py standing in for torchvision,
/root/reference/fasterrcnn.py and /root/reference/fcos.py import and run on
CPU torch. These tests feed IDENTICAL inputs to the reference code and to
dgod_tpu's JAX reimplementation and assert agreement:

- anchor generation parity (RPN 15-anchor FPN grid, FCOS unit boxes),
- RPN anchor matching (fg/bg/ignore assignment incl. the
  allow_low_quality tie path) vs RegionProposalNetwork.assign_targets_to_anchors,
- RPN sampled losses vs RegionProposalNetworkWILDS.compute_loss
  (fasterrcnn.py:105-140) — sampling made deterministic by quota >=
  available, under which both samplers select everything,
- RoI head losses vs fastrcnn_loss (fasterrcnn.py:198-236),
- RoI training-sample selection SETS vs RoIHeads.select_training_samples,
- the FCOS center-sampling matcher + 3-part loss vs
  FCOS.compute_loss/FCOSHead.compute_loss (fcos.py:503-550, 124-202),
  including the <=1-GT quirk branch (fcos.py:139-144) against
  FCOSLossConfig(single_gt_quirk=True).

Inputs use integer box coordinates so threshold/tie decisions are not
1-ulp-sensitive across frameworks.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from . import tvshim  # noqa: E402

CANVAS = (64, 128)
FEAT_SHAPES = [(16, 32), (8, 16), (4, 8), (2, 4), (1, 2)]


@pytest.fixture(scope="module")
def ref_frcnn():
    return tvshim.load_reference("fasterrcnn")


@pytest.fixture(scope="module")
def ref_fcos():
    return tvshim.load_reference("fcos")


def _image_list(batch: int):
    t = torch.zeros((batch, 3, *CANVAS))
    return tvshim.ImageList(t, [CANVAS] * batch)


def _features(batch: int):
    return [torch.zeros((batch, 4, h, w)) for h, w in FEAT_SHAPES]


def _random_gt(rng, batch, n_boxes):
    """Integer-coordinate gt boxes inside the canvas + labels 1..8."""
    h, w = CANVAS
    boxes = np.zeros((batch, n_boxes, 4), np.float32)
    x1 = rng.randint(0, w - 16, (batch, n_boxes))
    y1 = rng.randint(0, h - 16, (batch, n_boxes))
    bw = rng.randint(8, 48, (batch, n_boxes))
    bh = rng.randint(8, 32, (batch, n_boxes))
    boxes[..., 0] = x1
    boxes[..., 1] = y1
    boxes[..., 2] = np.minimum(x1 + bw, w)
    boxes[..., 3] = np.minimum(y1 + bh, h)
    labels = rng.randint(1, 9, (batch, n_boxes)).astype(np.int32)
    return boxes, labels


# ---------------------------------------------------------------------------
# anchors
# ---------------------------------------------------------------------------


def test_rpn_anchor_parity():
    from dgod_tpu.ops.anchors import rpn_anchors

    ag = tvshim.AnchorGenerator(
        ((32,), (64,), (128,), (256,), (512,)), ((0.5, 1.0, 2.0),) * 5)
    t_anchors = ag(_image_list(2), _features(2))[0].numpy()
    j_anchors, counts = rpn_anchors(FEAT_SHAPES, CANVAS)
    assert t_anchors.shape == j_anchors.shape == (sum(counts), 4)
    np.testing.assert_allclose(j_anchors, t_anchors, atol=1e-5)


def test_fcos_anchor_parity():
    from dgod_tpu.ops.anchors import fcos_anchors

    ag = tvshim.AnchorGenerator(
        ((8,), (16,), (32,), (64,), (128,)), ((1.0,),) * 5)
    t_anchors = ag(_image_list(1), _features(1))[0].numpy()
    j_anchors, counts = fcos_anchors(FEAT_SHAPES, CANVAS)
    np.testing.assert_allclose(j_anchors, t_anchors, atol=1e-5)


# ---------------------------------------------------------------------------
# RPN: matcher assignment + sampled losses (fasterrcnn.py:105-140)
# ---------------------------------------------------------------------------


def _build_ref_rpn(ref_frcnn, batch_per_image):
    ag = tvshim.AnchorGenerator(
        ((32,), (64,), (128,), (256,), (512,)), ((0.5, 1.0, 2.0),) * 5)
    head = tvshim.RPNHead(4, 3)
    rpn = ref_frcnn.RegionProposalNetworkWILDS(
        ag, head, 0.7, 0.3, batch_per_image, 0.5,
        dict(training=2000, testing=1000), dict(training=2000, testing=1000),
        0.7)
    rpn.train()
    return rpn, ag


def test_rpn_matcher_assignment_parity(ref_frcnn):
    from dgod_tpu.ops import matchers
    from dgod_tpu.ops.anchors import rpn_anchors

    rng = np.random.RandomState(7)
    B, G = 2, 4
    gt_boxes, _ = _random_gt(rng, B, G)
    anchors_np, _ = rpn_anchors(FEAT_SHAPES, CANVAS)

    rpn, ag = _build_ref_rpn(ref_frcnn, 4096)
    anchors_list = ag(_image_list(B), _features(B))
    targets = [{"boxes": torch.as_tensor(gt_boxes[i])} for i in range(B)]
    t_labels, t_matched_gt = rpn.assign_targets_to_anchors(
        anchors_list, targets)

    gt_valid = np.ones((B, G), bool)
    j_match = matchers.match_anchors_batched(
        jnp.asarray(gt_boxes), jnp.asarray(gt_valid), jnp.asarray(anchors_np),
        0.7, 0.3, True)
    j_match = np.asarray(j_match)
    for i in range(B):
        tl = t_labels[i].numpy()  # 1.0 fg / 0.0 bg / -1.0 ignore
        jl = np.where(j_match[i] >= 0, 1.0,
                      np.where(j_match[i] == matchers.BELOW_LOW, 0.0, -1.0))
        np.testing.assert_array_equal(jl, tl)
        # matched gt box parity at foreground anchors
        fg = tl == 1.0
        np.testing.assert_allclose(
            gt_boxes[i][np.clip(j_match[i], 0, None)][fg],
            t_matched_gt[i].numpy()[fg], atol=1e-5)


def test_rpn_sampled_loss_parity(ref_frcnn):
    """RegionProposalNetworkWILDS.compute_loss vs FRCNNDetector.rpn_loss on
    identical raw head outputs. Sampler quota (4096) >= anchors (2046) makes
    both samplers select every fg/bg anchor -> deterministic comparison; the
    losses are permutation-invariant (mean / sum-over-pos / count)."""
    from dgod_tpu.models.faster_rcnn import FRCNNConfig, FRCNNDetector

    rng = np.random.RandomState(3)
    B, G = 2, 4
    gt_boxes, _ = _random_gt(rng, B, G)

    raw_obj = [rng.randn(B, 3, h, w).astype(np.float32)
               for h, w in FEAT_SHAPES]
    raw_deltas = [0.1 * rng.randn(B, 12, h, w).astype(np.float32)
                  for h, w in FEAT_SHAPES]

    # ---- reference path ----
    rpn, ag = _build_ref_rpn(ref_frcnn, 4096)
    anchors_list = ag(_image_list(B), _features(B))
    targets = [{"boxes": torch.as_tensor(gt_boxes[i])} for i in range(B)]
    labels, matched_gt = rpn.assign_targets_to_anchors(anchors_list, targets)
    regression_targets = rpn.box_coder.encode(matched_gt, anchors_list)
    t_obj_loss, t_box_loss = rpn.compute_loss(
        [torch.as_tensor(o) for o in raw_obj],
        [torch.as_tensor(d) for d in raw_deltas],
        labels, regression_targets)
    t_obj_loss = float(t_obj_loss.sum())
    t_box_loss = float(t_box_loss.sum())

    # ---- dgod_tpu path ----
    cfg = FRCNNConfig(num_classes=9, rpn_batch_per_image=4096)
    det = FRCNNDetector(cfg, canvas=CANVAS)
    # torch [B,A,H,W] -> [B, H*W*A] (torchvision permute_and_flatten order)
    obj_j = [np.transpose(o, (0, 2, 3, 1)).reshape(B, -1) for o in raw_obj]
    deltas_j = [
        np.transpose(d.reshape(B, 3, 4, h, w), (0, 3, 4, 1, 2))
        .reshape(B, -1, 4)
        for d, (h, w) in zip(raw_deltas, FEAT_SHAPES)
    ]
    gt_valid = np.ones((B, G), bool)
    j_obj, j_box = jax.jit(det.rpn_loss)(
        [jnp.asarray(o) for o in obj_j], [jnp.asarray(d) for d in deltas_j],
        jnp.asarray(gt_boxes), jnp.asarray(gt_valid), jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(j_obj), t_obj_loss, rtol=2e-4)
    np.testing.assert_allclose(float(j_box), t_box_loss, rtol=2e-4)


# ---------------------------------------------------------------------------
# RoI head: fastrcnn_loss (fasterrcnn.py:198-236)
# ---------------------------------------------------------------------------


def test_fastrcnn_loss_parity(ref_frcnn):
    from dgod_tpu.models.faster_rcnn import FRCNNConfig, FRCNNDetector

    rng = np.random.RandomState(11)
    B, S, C1 = 2, 512, 10  # 9 classes + background
    logits = rng.randn(B, S, C1).astype(np.float32)
    regs = 0.1 * rng.randn(B, S, C1 * 4).astype(np.float32)
    labels = rng.randint(0, C1, (B, S)).astype(np.int32)
    labels[:, ::3] = 0  # plenty of background rows
    reg_targets = 0.1 * rng.randn(B, S, 4).astype(np.float32)

    t_cls, t_box = ref_frcnn.fastrcnn_loss(
        torch.as_tensor(logits.reshape(B * S, C1)),
        torch.as_tensor(regs.reshape(B * S, C1 * 4)),
        [torch.as_tensor(labels[i]).long() for i in range(B)],
        [torch.as_tensor(reg_targets[i]) for i in range(B)])
    t_cls, t_box = float(t_cls.sum()), float(t_box.sum())

    det = FRCNNDetector(FRCNNConfig(num_classes=9), canvas=CANVAS)
    j_cls, j_box = det.roi_loss(
        jnp.asarray(logits), jnp.asarray(regs), jnp.asarray(labels),
        jnp.asarray(reg_targets), jnp.ones((B, S), bool))
    np.testing.assert_allclose(float(j_cls), t_cls, rtol=2e-4)
    np.testing.assert_allclose(float(j_box), t_box, rtol=2e-4)


def test_roi_select_training_samples_set_parity(ref_frcnn):
    """RoIHeads.select_training_samples vs the static-shape JAX version:
    with quota >= candidates both select EVERY proposal, so the (roi,
    label, regression_target) multisets must match exactly (ordering is
    sampler-dependent on both sides)."""
    from dgod_tpu.models.faster_rcnn import FRCNNConfig, FRCNNDetector

    rng = np.random.RandomState(5)
    B, G, P = 2, 3, 40
    gt_boxes, gt_labels = _random_gt(rng, B, G)
    props, _ = _random_gt(rng, B, P)

    roi_heads = tvshim.RoIHeads(
        None, None, None, 0.5, 0.5, 512, 0.25, None, 0.05, 0.5, 100)
    targets = [
        {"boxes": torch.as_tensor(gt_boxes[i]),
         "labels": torch.as_tensor(gt_labels[i]).long()}
        for i in range(B)
    ]
    t_props, _, t_labels, t_regs = roi_heads.select_training_samples(
        [torch.as_tensor(props[i]) for i in range(B)], targets)

    cfg = FRCNNConfig(num_classes=9, box_batch_per_image=512)
    det = FRCNNDetector(cfg, canvas=CANVAS)
    j_rois, j_labels, j_regs, j_valid = det.select_training_samples(
        jnp.asarray(props), jnp.ones((B, P), bool), jnp.asarray(gt_boxes),
        jnp.asarray(gt_labels), jnp.ones((B, G), bool),
        jax.random.PRNGKey(1))
    j_rois, j_labels, j_regs, j_valid = map(
        np.asarray, (j_rois, j_labels, j_regs, j_valid))

    for i in range(B):
        t_rows = np.concatenate(
            [t_props[i].numpy(), t_labels[i].numpy()[:, None],
             t_regs[i].numpy()], axis=1)
        j_rows = np.concatenate(
            [j_rois[i][j_valid[i]], j_labels[i][j_valid[i]][:, None],
             j_regs[i][j_valid[i]]], axis=1)
        assert t_rows.shape == j_rows.shape
        # order-insensitive comparison via lexicographic sort
        t_sorted = t_rows[np.lexsort(t_rows.T)]
        j_sorted = j_rows[np.lexsort(j_rows.T)]
        np.testing.assert_allclose(j_sorted, t_sorted, atol=1e-4)


# ---------------------------------------------------------------------------
# FCOS: center-sampling matcher + 3-part loss (fcos.py:503-550, 124-202)
# ---------------------------------------------------------------------------


def _ref_fcos_loss(ref_fcos, head_outputs_np, gt_boxes, gt_labels,
                   anchors_np, counts):
    """Run the reference's FCOS.compute_loss verbatim (matcher + head loss)
    through a minimal stand-in self."""
    import types as _types

    head = ref_fcos.FCOSHead(256, 1, 9)
    dummy = _types.SimpleNamespace(center_sampling_radius=1.5, head=head)
    B = gt_boxes.shape[0]
    targets = [
        {"boxes": torch.as_tensor(gt_boxes[i]),
         "labels": torch.as_tensor(gt_labels[i]).long()}
        for i in range(B)
    ]
    head_outputs = {k: torch.as_tensor(v) for k, v in head_outputs_np.items()}
    anchors = [torch.as_tensor(anchors_np) for _ in range(B)]
    return ref_fcos.FCOS.compute_loss(
        dummy, targets, head_outputs, anchors, list(counts))


def test_fcos_matcher_and_loss_parity(ref_fcos):
    """>=2 GT per image (the quirk branch is dormant); overlapping boxes
    exercise the min-area tie-break incl. the reference's area formula
    (fcos.py:543) via exact_reference_area=True."""
    from dgod_tpu.models.fcos import FCOSLossConfig, fcos_loss
    from dgod_tpu.ops.anchors import fcos_anchors

    rng = np.random.RandomState(13)
    B, G = 2, 3
    gt_boxes, gt_labels = _random_gt(rng, B, G)
    # force overlap: box 1 nested inside an enlarged box 0
    gt_boxes[:, 0] = [8, 8, 80, 56]
    gt_boxes[:, 1] = [24, 16, 56, 40]

    anchors_np, counts = fcos_anchors(FEAT_SHAPES, CANVAS)
    R = anchors_np.shape[0]
    outputs = {
        "cls_logits": rng.randn(B, R, 9).astype(np.float32),
        "bbox_regression": np.abs(
            0.5 * rng.randn(B, R, 4)).astype(np.float32),
        "bbox_ctrness": rng.randn(B, R, 1).astype(np.float32),
    }

    t_losses = _ref_fcos_loss(ref_fcos, outputs, gt_boxes, gt_labels,
                              anchors_np, counts)

    cfg = FCOSLossConfig(exact_reference_area=True, single_gt_quirk=True)
    j_losses, j_gt_classes = fcos_loss(
        {k: jnp.asarray(v) for k, v in outputs.items()},
        jnp.asarray(anchors_np), tuple(counts), jnp.asarray(gt_boxes),
        jnp.asarray(gt_labels), jnp.ones((B, G), bool), cfg)

    # dense one-hot targets == matcher assignment parity
    np.testing.assert_array_equal(
        np.asarray(j_gt_classes), t_losses["gt_classes"].numpy())
    for k in ("classification", "bbox_regression", "bbox_ctrness"):
        np.testing.assert_allclose(
            float(j_losses[k]), float(t_losses[k]), rtol=5e-4,
            err_msg=k)


def test_fcos_single_gt_quirk_parity(ref_fcos):
    """1-GT images: the reference zeroes ALL targets (fcos.py:139-144).
    single_gt_quirk=True must reproduce it; the default must not."""
    from dgod_tpu.models.fcos import FCOSLossConfig, fcos_loss
    from dgod_tpu.ops.anchors import fcos_anchors

    rng = np.random.RandomState(17)
    B, G = 2, 1
    gt_boxes, gt_labels = _random_gt(rng, B, G)
    gt_boxes[:, 0] = [16, 16, 64, 48]

    anchors_np, counts = fcos_anchors(FEAT_SHAPES, CANVAS)
    R = anchors_np.shape[0]
    outputs = {
        "cls_logits": rng.randn(B, R, 9).astype(np.float32),
        "bbox_regression": np.abs(
            0.5 * rng.randn(B, R, 4)).astype(np.float32),
        "bbox_ctrness": rng.randn(B, R, 1).astype(np.float32),
    }

    t_losses = _ref_fcos_loss(ref_fcos, outputs, gt_boxes, gt_labels,
                              anchors_np, counts)

    args = (
        {k: jnp.asarray(v) for k, v in outputs.items()},
        jnp.asarray(anchors_np), tuple(counts), jnp.asarray(gt_boxes),
        jnp.asarray(gt_labels), jnp.ones((B, G), bool),
    )
    quirk_losses, quirk_classes = fcos_loss(
        *args, FCOSLossConfig(exact_reference_area=True,
                              single_gt_quirk=True))
    np.testing.assert_array_equal(
        np.asarray(quirk_classes), t_losses["gt_classes"].numpy())
    for k in ("classification", "bbox_regression", "bbox_ctrness"):
        np.testing.assert_allclose(
            float(quirk_losses[k]), float(t_losses[k]), rtol=5e-4,
            err_msg=k)

    # corrected default: 1-GT images train on their REAL box/label, so the
    # classification target must differ from the reference's zeroed one
    fixed_losses, fixed_classes = fcos_loss(*args, FCOSLossConfig())
    assert np.asarray(fixed_classes).sum() > 0
    assert not np.array_equal(
        np.asarray(fixed_classes), t_losses["gt_classes"].numpy())

"""FCOS detector — TPU-native, fully batched, static shapes.

Re-designs the reference FCOS (reference fcos.py, a torchvision-0.13 fork)
for XLA:
- heads run on all 5 pyramid levels, outputs flattened+concatenated once
  ([B, R, ...], R = sum of level sizes) — same tensor contract the reference
  builds per-level then concatenates (fcos.py:260-341);
- the centre-sampling matcher (fcos.py:503-550) is a vmapped static-shape
  kernel (ops/matchers.fcos_match);
- losses (focal / GIoU / centreness BCE, normalised by global foreground
  count; fcos.py:124-202) computed with masks, no per-image loops;
- postprocessing (fcos.py:552-619: score filter 0.2, top-1000/level, NMS 0.6,
  top-100) is static-shape: per-level top-k + first-k greedy NMS.

Instead of the reference's forward hooks (DGFCOS.py:129-138) the apply
function returns an `aux` dict with the C5 feature map and the flattened
per-location head-input features, plus the dense one-hot `gt_classes`
targets the DG modes consume (fcos.py:201).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops import anchors as anchor_ops
from ..ops import boxes as box_ops
from ..ops import losses as loss_ops
from ..ops import matchers
from ..ops import nms as nms_ops
from .backbone import FCOSBackbone

HEAD_INIT = nn.initializers.normal(0.01)


class FCOSHead(nn.Module):
    """Shared-weight classification + regression towers over all levels."""

    num_classes: int
    num_convs: int = 4
    prior_probability: float = 0.01
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray]):
        cls_tower = [
            (
                nn.Conv(256, (3, 3), padding=[(1, 1), (1, 1)], kernel_init=HEAD_INIT,
                        name=f"cls_conv{i}", dtype=self.dtype),
                nn.GroupNorm(num_groups=32, epsilon=1e-5,  # torch GN eps
                             name=f"cls_gn{i}", dtype=self.dtype),
            )
            for i in range(self.num_convs)
        ]
        reg_tower = [
            (
                nn.Conv(256, (3, 3), padding=[(1, 1), (1, 1)], kernel_init=HEAD_INIT,
                        name=f"reg_conv{i}", dtype=self.dtype),
                nn.GroupNorm(num_groups=32, epsilon=1e-5,  # torch GN eps
                             name=f"reg_gn{i}", dtype=self.dtype),
            )
            for i in range(self.num_convs)
        ]
        bias_init = nn.initializers.constant(
            -math.log((1 - self.prior_probability) / self.prior_probability)
        )
        # final prediction convs in f32: loss-facing outputs keep precision
        cls_logits_conv = nn.Conv(
            self.num_classes, (3, 3), padding=[(1, 1), (1, 1)],
            kernel_init=HEAD_INIT, bias_init=bias_init, name="cls_logits",
        )
        bbox_reg_conv = nn.Conv(
            4, (3, 3), padding=[(1, 1), (1, 1)], kernel_init=HEAD_INIT, name="bbox_reg"
        )
        ctrness_conv = nn.Conv(
            1, (3, 3), padding=[(1, 1), (1, 1)], kernel_init=HEAD_INIT, name="bbox_ctrness"
        )

        all_cls, all_reg, all_ctr = [], [], []
        for f in feats:
            c = f
            for conv, gn in cls_tower:
                c = nn.relu(gn(conv(c)))
            cls_logits = cls_logits_conv(c.astype(jnp.float32))  # [B,H,W,C]

            r = f
            for conv, gn in reg_tower:
                r = nn.relu(gn(conv(r)))
            r = r.astype(jnp.float32)
            bbox_reg = nn.relu(bbox_reg_conv(r))  # [B,H,W,4]
            ctrness = ctrness_conv(r)  # [B,H,W,1]

            B = f.shape[0]
            all_cls.append(cls_logits.reshape(B, -1, self.num_classes))
            all_reg.append(bbox_reg.reshape(B, -1, 4))
            all_ctr.append(ctrness.reshape(B, -1, 1))

        return (
            jnp.concatenate(all_cls, axis=1),
            jnp.concatenate(all_reg, axis=1),
            jnp.concatenate(all_ctr, axis=1),
        )


class FCOS(nn.Module):
    """Backbone + head; returns raw outputs and aux features.

    The flattened head-input features (`ins_feat`, [B, R, 256]) reproduce the
    reference's head-input hook (DGFCOS.py:132-138). NHWC flattening gives
    row-major (y, x) location order, identical to the reference's
    NCHW reshape over (H*W).
    """

    num_classes: int = 9
    dtype: Any = jnp.float32
    backbone_block_counts: Tuple[int, ...] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, images: jnp.ndarray):
        feats, c_feats = FCOSBackbone(
            name="backbone", dtype=self.dtype,
            block_counts=self.backbone_block_counts)(images)
        cls_logits, bbox_regression, bbox_ctrness = FCOSHead(
            self.num_classes, name="head", dtype=self.dtype
        )(feats)
        ins_feat = jnp.concatenate(
            [f.reshape(f.shape[0], -1, f.shape[-1]) for f in feats], axis=1
        )
        aux = {
            "c5": c_feats["c5"],  # image-level DG feature (DGFCOS.py:129-130)
            "ins_feat": ins_feat,  # instance-level DG feature (DGFCOS.py:132-138)
            "feat_shapes": tuple((f.shape[1], f.shape[2]) for f in feats),
        }
        return {
            "cls_logits": cls_logits,  # [B, R, C]
            "bbox_regression": bbox_regression,  # [B, R, 4]
            "bbox_ctrness": bbox_ctrness,  # [B, R, 1]
        }, aux


# ---------------------------------------------------------------------------
# Loss
# ---------------------------------------------------------------------------


class FCOSLossConfig(NamedTuple):
    center_sampling_radius: float = 1.5
    # reproduce the reference's exact-area quirk (fcos.py:543) if True
    exact_reference_area: bool = False
    # reproduce the reference's `len(labels) <= 1 -> all background-class`
    # branch (fcos.py:139-144) if True; default trains 1-GT images correctly
    single_gt_quirk: bool = False


def fcos_anchors_for(image_shape: Tuple[int, int]) -> Tuple[np.ndarray, tuple]:
    """Static anchors for a padded canvas; constant-folded under jit."""
    shapes = anchor_ops.fpn_feat_shapes(image_shape, (8, 16, 32, 64, 128))
    anchors, counts = anchor_ops.fcos_anchors(shapes, image_shape)
    return anchors, tuple(counts)


def fcos_loss(
    outputs: Dict[str, jnp.ndarray],
    anchors: jnp.ndarray,  # [R, 4]
    num_anchors_per_level: tuple,
    gt_boxes: jnp.ndarray,  # [B, G, 4]
    gt_labels: jnp.ndarray,  # [B, G] int32 (1..C-1 foreground ids)
    gt_valid: jnp.ndarray,  # [B, G] bool
    config: FCOSLossConfig = FCOSLossConfig(),
):
    """Batched FCOS loss. Returns (loss_dict, dense one-hot gt_classes).

    Semantics follow reference fcos.py:124-202: all three losses are summed
    then divided by the total number of foreground locations in the batch.
    """
    cls_logits = outputs["cls_logits"]  # [B, R, C]
    bbox_regression = outputs["bbox_regression"]
    bbox_ctrness = outputs["bbox_ctrness"]
    B, R, C = cls_logits.shape

    matched = matchers.fcos_match_batched(
        anchors, gt_boxes, gt_valid, num_anchors_per_level,
        center_sampling_radius=config.center_sampling_radius,
        exact_reference_area=config.exact_reference_area,
    )  # [B, R]

    if config.single_gt_quirk:
        # reference: images with <=1 labels use zero targets everywhere
        few = jnp.sum(gt_valid, axis=1) <= 1  # [B]
        matched = jnp.where(few[:, None], jnp.where(matched >= 0, 0, -1), matched)
        use_zero_targets = few
    else:
        use_zero_targets = jnp.zeros((B,), bool)

    fg_mask = matched >= 0  # [B, R]
    safe_idx = jnp.clip(matched, 0)
    gather = lambda arr: jnp.take_along_axis(arr, safe_idx[..., None], axis=1)
    gt_boxes_t = jnp.where(
        use_zero_targets[:, None, None],
        0.0,
        jnp.take_along_axis(gt_boxes, safe_idx[..., None].repeat(4, -1), axis=1),
    )  # [B, R, 4]
    labels_t = jnp.where(
        use_zero_targets[:, None],
        0,
        jnp.take_along_axis(gt_labels, safe_idx, axis=1),
    )  # [B, R]

    num_foreground = jnp.sum(fg_mask.astype(jnp.float32))
    denom = jnp.maximum(1.0, num_foreground)

    # classification: dense one-hot over C channels, focal loss summed
    gt_classes = (
        jax.nn.one_hot(labels_t, C, dtype=cls_logits.dtype)
        * fg_mask[..., None].astype(cls_logits.dtype)
    )  # [B, R, C]
    loss_cls = jnp.sum(loss_ops.sigmoid_focal_loss(cls_logits, gt_classes))

    # regression: GIoU on decoded boxes at foreground locations
    pred_boxes = box_ops.linear_decode(bbox_regression, anchors[None])  # [B,R,4]
    giou = loss_ops.giou_loss(pred_boxes, gt_boxes_t)  # [B, R]
    loss_reg = loss_ops.masked_sum(giou, fg_mask)

    # centreness BCE at foreground locations
    reg_targets = box_ops.linear_encode(anchors[None], gt_boxes_t)  # [B,R,4]
    lr = reg_targets[..., jnp.array([0, 2])]
    tb = reg_targets[..., jnp.array([1, 3])]
    ratio = (jnp.min(lr, -1) / jnp.maximum(jnp.max(lr, -1), 1e-12)) * (
        jnp.min(tb, -1) / jnp.maximum(jnp.max(tb, -1), 1e-12)
    )
    ctr_targets = jnp.sqrt(jnp.clip(ratio, 0.0))
    bce = loss_ops.bce_with_logits(bbox_ctrness[..., 0], ctr_targets)
    loss_ctr = loss_ops.masked_sum(bce, fg_mask)

    losses = {
        "classification": loss_cls / denom,
        "bbox_regression": loss_reg / denom,
        "bbox_ctrness": loss_ctr / denom,
    }
    return losses, gt_classes


# ---------------------------------------------------------------------------
# Postprocess (inference)
# ---------------------------------------------------------------------------


def fcos_postprocess(
    outputs: Dict[str, jnp.ndarray],
    anchors: jnp.ndarray,  # [R, 4]
    num_anchors_per_level: tuple,
    image_sizes: jnp.ndarray,  # [B, 2] (h, w) of the resized content
    scale_factors: jnp.ndarray,  # [B, 2] (sy, sx) back to original frame
    score_thresh: float = 0.2,
    nms_thresh: float = 0.6,
    detections_per_img: int = 100,
    topk_candidates: int = 1000,
):
    """Static-shape detection decoding. Returns dict of padded detections.

    boxes [B, D, 4] (original image frame), scores [B, D], labels [B, D],
    valid [B, D]. Mirrors reference fcos.py:552-619 + transform.postprocess.
    """
    cls_logits = outputs["cls_logits"]
    bbox_regression = outputs["bbox_regression"]
    bbox_ctrness = outputs["bbox_ctrness"]
    B, R, C = cls_logits.shape

    def per_image(cls_l, reg_l, ctr_l, img_size, scale):
        level_boxes, level_scores, level_labels, level_valid = [], [], [], []
        start = 0
        for count in num_anchors_per_level:
            sl = slice(start, start + count)
            start += count
            logits = cls_l[sl]  # [hw, C]
            scores = jnp.sqrt(
                jax.nn.sigmoid(logits) * jax.nn.sigmoid(ctr_l[sl])
            ).reshape(-1)  # [hw*C]
            keep = scores > score_thresh
            k = min(topk_candidates, count * C)
            masked = jnp.where(keep, scores, -jnp.inf)
            top_scores, top_idx = jax.lax.top_k(masked, k)
            valid = top_scores > -jnp.inf
            anchor_idx = top_idx // C
            labels = top_idx % C
            boxes = box_ops.linear_decode(
                reg_l[sl][anchor_idx], anchors[sl][anchor_idx]
            )
            boxes = box_ops.clip_boxes(boxes, img_size[0], img_size[1])
            level_boxes.append(boxes)
            level_scores.append(jnp.where(valid, top_scores, 0.0))
            level_labels.append(labels)
            level_valid.append(valid)

        boxes = jnp.concatenate(level_boxes)
        scores = jnp.concatenate(level_scores)
        labels = jnp.concatenate(level_labels)
        valid = jnp.concatenate(level_valid)

        idx, ok, kept_scores = nms_ops.batched_nms_topk(
            boxes, scores, labels, valid, nms_thresh, detections_per_img
        )
        out_boxes = boxes[idx] * jnp.tile(scale[::-1], 2)[None, :]  # (sx,sy,sx,sy)
        return (
            jnp.where(ok[:, None], out_boxes, 0.0),
            jnp.where(ok, scores[idx], 0.0),
            jnp.where(ok, labels[idx], 0),
            ok,
        )

    boxes, scores, labels, valid = jax.vmap(per_image)(
        cls_logits, bbox_regression, bbox_ctrness, image_sizes, scale_factors
    )
    return {"boxes": boxes, "scores": scores, "labels": labels, "valid": valid}

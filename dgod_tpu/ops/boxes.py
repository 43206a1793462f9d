"""Box geometry ops — pure JAX, fully vectorised, static shapes.

Semantics cite the reference implementation for parity:
- linear (FCOS) box coder: reference fcos.py:25-100 (BoxLinearCoder)
- R-CNN delta box coder: torchvision BoxCoder semantics used by the reference
  Faster R-CNN (reference fasterrcnn.py:179,188 via torchvision 0.8.2)
- pairwise IoU / clip / area / remove-small: torchvision box_ops semantics
  used throughout both detectors.

Boxes are `[..., 4]` in xyxy order. Padded/invalid boxes are handled by the
caller with masks; these functions are total (no data-dependent shapes).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

# Matches torch.log(torch.tensor(1000.0 / 16)) clamp used by torchvision's
# BoxCoder to bound decoded w/h deltas.
BBOX_XFORM_CLIP = math.log(1000.0 / 16)


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area of xyxy boxes. boxes [..., 4] -> [...]."""
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU. boxes1 [N,4], boxes2 [M,4] -> [N,M]."""
    area1 = box_area(boxes1)  # [N]
    area2 = box_area(boxes2)  # [M]
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])  # [N,M,2]
    rb = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])  # [N,M,2]
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]  # [N,M]
    union = area1[:, None] + area2[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def elementwise_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Elementwise IoU of aligned box arrays [..., 4] -> [...]."""
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(boxes1) + box_area(boxes2) - inter
    return jnp.where(union > 0, inter / union, 0.0)


def clip_boxes(boxes: jnp.ndarray, height, width) -> jnp.ndarray:
    """Clip xyxy boxes to [0, width] x [0, height].

    `height`/`width` may be scalars or arrays broadcastable against
    boxes[..., 0] (per-image sizes for a batched call).
    """
    h = jnp.asarray(height, boxes.dtype)
    w = jnp.asarray(width, boxes.dtype)
    x1 = jnp.clip(boxes[..., 0], 0.0, w)
    y1 = jnp.clip(boxes[..., 1], 0.0, h)
    x2 = jnp.clip(boxes[..., 2], 0.0, w)
    y2 = jnp.clip(boxes[..., 3], 0.0, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def small_box_mask(boxes: jnp.ndarray, min_size: float) -> jnp.ndarray:
    """True for boxes with both sides >= min_size (torchvision remove_small_boxes)."""
    ws = boxes[..., 2] - boxes[..., 0]
    hs = boxes[..., 3] - boxes[..., 1]
    return (ws >= min_size) & (hs >= min_size)


# ---------------------------------------------------------------------------
# Linear (FCOS) box coder — distance from anchor centre to 4 edges.
# Reference semantics: fcos.py:39-100 (normalize_by_size=True).
# ---------------------------------------------------------------------------


def linear_encode(reference_boxes: jnp.ndarray, proposals: jnp.ndarray) -> jnp.ndarray:
    """Encode target `proposals` w.r.t. anchor `reference_boxes`.

    Both [..., 4] xyxy; returns l/t/r/b offsets normalised by anchor size.
    """
    ctr_x = 0.5 * (reference_boxes[..., 0] + reference_boxes[..., 2])
    ctr_y = 0.5 * (reference_boxes[..., 1] + reference_boxes[..., 3])
    l = ctr_x - proposals[..., 0]
    t = ctr_y - proposals[..., 1]
    r = proposals[..., 2] - ctr_x
    b = proposals[..., 3] - ctr_y
    out = jnp.stack([l, t, r, b], axis=-1)
    w = reference_boxes[..., 2] - reference_boxes[..., 0]
    h = reference_boxes[..., 3] - reference_boxes[..., 1]
    size = jnp.stack([w, h, w, h], axis=-1)
    return out / size


def linear_decode(rel_codes: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """Decode l/t/r/b offsets back to xyxy boxes around anchors `boxes`."""
    ctr_x = 0.5 * (boxes[..., 0] + boxes[..., 2])
    ctr_y = 0.5 * (boxes[..., 1] + boxes[..., 3])
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    size = jnp.stack([w, h, w, h], axis=-1)
    rel = rel_codes * size
    x1 = ctr_x - rel[..., 0]
    y1 = ctr_y - rel[..., 1]
    x2 = ctr_x + rel[..., 2]
    y2 = ctr_y + rel[..., 3]
    return jnp.stack([x1, y1, x2, y2], axis=-1)


# ---------------------------------------------------------------------------
# R-CNN delta box coder (dx, dy, dw, dh) — torchvision BoxCoder semantics.
# Used by the RPN (weights 1,1,1,1) and RoI head (weights 10,10,5,5).
# ---------------------------------------------------------------------------


def delta_encode(
    reference_boxes: jnp.ndarray,
    proposals: jnp.ndarray,
    weights=(1.0, 1.0, 1.0, 1.0),
) -> jnp.ndarray:
    """Encode gt `reference_boxes` relative to anchor/proposal `proposals`."""
    wx, wy, ww, wh = weights
    ex_w = proposals[..., 2] - proposals[..., 0]
    ex_h = proposals[..., 3] - proposals[..., 1]
    ex_cx = proposals[..., 0] + 0.5 * ex_w
    ex_cy = proposals[..., 1] + 0.5 * ex_h

    gt_w = reference_boxes[..., 2] - reference_boxes[..., 0]
    gt_h = reference_boxes[..., 3] - reference_boxes[..., 1]
    gt_cx = reference_boxes[..., 0] + 0.5 * gt_w
    gt_cy = reference_boxes[..., 1] + 0.5 * gt_h

    # guard against degenerate (padded) proposals
    safe_w = jnp.where(ex_w > 0, ex_w, 1.0)
    safe_h = jnp.where(ex_h > 0, ex_h, 1.0)
    safe_gt_w = jnp.where(gt_w > 0, gt_w, 1.0)
    safe_gt_h = jnp.where(gt_h > 0, gt_h, 1.0)

    dx = wx * (gt_cx - ex_cx) / safe_w
    dy = wy * (gt_cy - ex_cy) / safe_h
    dw = ww * jnp.log(safe_gt_w / safe_w)
    dh = wh * jnp.log(safe_gt_h / safe_h)
    return jnp.stack([dx, dy, dw, dh], axis=-1)


def delta_decode(
    rel_codes: jnp.ndarray,
    boxes: jnp.ndarray,
    weights=(1.0, 1.0, 1.0, 1.0),
) -> jnp.ndarray:
    """Decode deltas on top of anchors/proposals `boxes` [..., 4]."""
    wx, wy, ww, wh = weights
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    cx = boxes[..., 0] + 0.5 * w
    cy = boxes[..., 1] + 0.5 * h

    dx = rel_codes[..., 0] / wx
    dy = rel_codes[..., 1] / wy
    dw = jnp.minimum(rel_codes[..., 2] / ww, BBOX_XFORM_CLIP)
    dh = jnp.minimum(rel_codes[..., 3] / wh, BBOX_XFORM_CLIP)

    pred_cx = dx * w + cx
    pred_cy = dy * h + cy
    pred_w = jnp.exp(dw) * w
    pred_h = jnp.exp(dh) * h

    x1 = pred_cx - 0.5 * pred_w
    y1 = pred_cy - 0.5 * pred_h
    x2 = pred_cx + 0.5 * pred_w
    y2 = pred_cy + 0.5 * pred_h
    return jnp.stack([x1, y1, x2, y2], axis=-1)

"""Faster R-CNN (per-image-loss variant) — TPU-native, static shapes.

Re-designs the reference's WILDS-forked torchvision Faster R-CNN
(reference fasterrcnn.py) for XLA:

- RPN head + anchors over P2..P6 (anchor sizes 32..512 x AR (0.5,1,2),
  fasterrcnn.py:393-397); per-level top-k -> clip -> small-box filter ->
  per-level greedy NMS (0.7) -> global top post_nms_top_n, all static-shape
  with validity masks (torchvision filter_proposals semantics,
  train 2000/2000, test 1000/1000 per fasterrcnn.py:361-362).
- target assignment: IoU matcher 0.7/0.3 with low-quality rescue; balanced
  sampler 256 @ 50% positives; per-image RPN losses (smooth-L1 beta=1/9
  summed over sampled positives / num_sampled + BCE objectness,
  fasterrcnn.py:105-140).
- RoI head: gt-augmented proposal matching (0.5/0.5), 512 @ 25% sampling,
  multi-scale RoIAlign 7x7 (ops/roi_align.py), TwoMLPHead 12544->1024->1024
  (fasterrcnn.py:331-352), class+box predictor (num_classes+1 outputs,
  fasterrcnn.py:327), per-image CE + smooth-L1/512 losses
  (fastrcnn_loss, fasterrcnn.py:198-236).
- inference postprocess: softmax scores, per-class decode (weights 10,10,5,5),
  clip, drop background, score>0.05, small-box filter 1e-2, class-aware NMS
  0.5, top 100 (torchvision RoIHeads.postprocess_detections semantics,
  config at fasterrcnn.py:368).

The reference's forward hooks (backbone -> base_feat, box_head ->
box_features/box_labels; DGFRCNN.py:82-94) become explicit aux outputs.
All per-image Python loops (fasterrcnn.py:122-138, 216-234) are vmapped.
"""

from __future__ import annotations

from functools import partial
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
from ..ops.roi_align import multiscale_roi_align
from ..ops.pallas_roi_align import batched_roi_align_tpu
from .backbone import FRCNNBackbone

RPN_INIT = nn.initializers.normal(0.01)
PREDICTOR_INIT = nn.initializers.normal(0.01)
BOX_REG_INIT = nn.initializers.normal(0.001)

STRIDES = (4, 8, 16, 32, 64)
ANCHOR_SIZES = ((32,), (64,), (128,), (256,), (512,))
ASPECT_RATIOS = (0.5, 1.0, 2.0)
A = len(ASPECT_RATIOS)


class RPNHeadModule(nn.Module):
    """Shared 3x3 conv + objectness/delta 1x1 convs (torchvision RPNHead)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray]):
        conv = nn.Conv(256, (3, 3), padding=[(1, 1), (1, 1)],
                       kernel_init=RPN_INIT, name="conv", dtype=self.dtype)
        # prediction convs compute in the model dtype (casting the
        # 256-channel map to f32 first costs ~380 MB of HBM traffic at P2
        # alone); only the tiny A/4A-channel OUTPUTS are cast to f32 for
        # the losses/decoding
        cls = nn.Conv(A, (1, 1), kernel_init=RPN_INIT, name="cls_logits",
                      dtype=self.dtype)
        reg = nn.Conv(4 * A, (1, 1), kernel_init=RPN_INIT, name="bbox_pred",
                      dtype=self.dtype)
        objectness, deltas = [], []
        for f in feats:
            t = nn.relu(conv(f))
            B, H, W, _ = t.shape
            objectness.append(
                cls(t).astype(jnp.float32).reshape(B, H * W * A))
            deltas.append(
                reg(t).astype(jnp.float32).reshape(B, H * W * A, 4))
        return objectness, deltas


class TwoMLPHead(nn.Module):
    """fc6/fc7 RoI feature head (fasterrcnn.py:331-352)."""

    representation_size: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # [..., 7,7,C] or [..., F]
        x = x.reshape(*x.shape[:-3], -1) if x.ndim > 2 else x
        x = nn.relu(nn.Dense(self.representation_size, name="fc6",
                             dtype=self.dtype)(x))
        x = nn.relu(nn.Dense(self.representation_size, name="fc7",
                             dtype=self.dtype)(x))
        return x.astype(jnp.float32)


class BoxPredictor(nn.Module):
    """FastRCNNPredictor: cls (C+1) + per-class box deltas."""

    num_classes_plus_bg: int

    @nn.compact
    def __call__(self, x):
        scores = nn.Dense(self.num_classes_plus_bg, kernel_init=PREDICTOR_INIT,
                          name="cls_score")(x)
        deltas = nn.Dense(self.num_classes_plus_bg * 4, kernel_init=BOX_REG_INIT,
                          name="bbox_pred")(x)
        return scores, deltas


class FRCNNConfig(NamedTuple):
    num_classes: int = 9  # foreground ids 1..8 + background 0 (predictor C+1)
    rpn_fg_iou: float = 0.7
    rpn_bg_iou: float = 0.3
    rpn_batch_per_image: int = 256
    rpn_positive_fraction: float = 0.5
    rpn_pre_nms_train: int = 2000
    rpn_pre_nms_test: int = 1000
    rpn_post_nms_train: int = 2000
    rpn_post_nms_test: int = 1000
    rpn_nms_thresh: float = 0.7
    box_fg_iou: float = 0.5
    box_bg_iou: float = 0.5
    box_batch_per_image: int = 512
    box_positive_fraction: float = 0.25
    box_score_thresh: float = 0.05
    box_nms_thresh: float = 0.5
    detections_per_img: int = 100
    box_reg_weights: Tuple[float, float, float, float] = (10.0, 10.0, 5.0, 5.0)


class FRCNNDetector:
    """Functional Faster R-CNN over a static canvas."""

    def __init__(self, config: FRCNNConfig = FRCNNConfig(), canvas=(608, 1216),
                 dtype=jnp.float32, backbone_block_counts=(3, 4, 6, 3)):
        self.config = config
        self.canvas = canvas
        self.dtype = dtype
        self.backbone = FRCNNBackbone(
            dtype=dtype, block_counts=tuple(backbone_block_counts))
        self.rpn_head = RPNHeadModule(dtype=dtype)
        self.box_head = TwoMLPHead(dtype=dtype)
        self.predictor = BoxPredictor(config.num_classes + 1)

        shapes = anchor_ops.fpn_feat_shapes(canvas, STRIDES)
        anchors, counts = anchor_ops.rpn_anchors(
            shapes, canvas, ANCHOR_SIZES, ASPECT_RATIOS
        )
        self.anchors = jnp.asarray(anchors)  # [R, 4]
        self.anchor_counts = tuple(counts)

    # -- init --------------------------------------------------------------

    def init(self, rng):
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        dummy = jnp.zeros((1, *self.canvas, 3), jnp.float32)
        bb = jax.jit(self.backbone.init)(k1, dummy)["params"]
        feats_shapes = anchor_ops.fpn_feat_shapes(self.canvas, STRIDES)
        dummy_feats = [jnp.zeros((1, h, w, 256)) for h, w in feats_shapes]
        rpn = jax.jit(self.rpn_head.init)(k2, dummy_feats)["params"]
        bh = jax.jit(self.box_head.init)(k3, jnp.zeros((1, 7, 7, 256)))["params"]
        pred = jax.jit(self.predictor.init)(k4, jnp.zeros((1, 1024)))["params"]
        return {"backbone": bb, "rpn_head": rpn, "box_head": bh, "predictor": pred}

    # -- forward pieces ----------------------------------------------------

    def features(self, params, images):
        feats, c = self.backbone.apply({"params": params["backbone"]}, images)
        return feats, c  # feats: [P2..P5, pool]

    def rpn_forward(self, params, feats):
        return self.rpn_head.apply({"params": params["rpn_head"]}, feats)

    def generate_proposals(self, objectness, deltas, image_sizes, training: bool):
        """torchvision filter_proposals, static-shape.

        objectness/deltas: per-level lists [B, R_l(,4)]. Returns
        (proposals [B, Npost, 4], valid [B, Npost], scores [B, Npost]).
        """
        cfg = self.config
        pre_n = cfg.rpn_pre_nms_train if training else cfg.rpn_pre_nms_test
        post_n = cfg.rpn_post_nms_train if training else cfg.rpn_post_nms_test

        # decode+clip+NMS impl. DGOD_PROPOSAL_NMS=pallas opts into the
        # fused VMEM kernel (ops/pallas_proposals.py, exact parity); the
        # recorded chip A/B kept XLA as default: in isolation both run
        # <1 ms at production shapes, and in the full generate_proposals
        # context the kernel LOSES (7.53 vs 5.98 ms/step, round-5 A/B,
        # scripts/check_pallas_proposals_tpu.py + BASELINE.md) — the
        # remaining cost here is the 185k-anchor top_k (1.66 ms; approx_max_k
        # saves only 0.5 ms and breaks reference-exactness) plus many small
        # serial gathers/selects, not the NMS math.
        import os as _os

        impl = _os.environ.get("DGOD_PROPOSAL_NMS", "xla").lower()

        level_boxes, level_scores, level_valid = [], [], []
        start = 0
        for lvl, count in enumerate(self.anchor_counts):
            anc = jax.lax.dynamic_slice_in_dim(self.anchors, start, count)
            start += count
            obj = objectness[lvl]  # [B, count]
            dl = jax.lax.stop_gradient(deltas[lvl])  # no grad through proposals
            k = min(pre_n, count)

            if impl == "pallas":
                from ..ops import pallas_proposals

                top_scores, top_idx = jax.vmap(
                    lambda o: jax.lax.top_k(o, k))(obj)
                dl_top = jnp.take_along_axis(dl, top_idx[..., None], axis=1)
                anc_top = anc[top_idx]  # [B, k, 4]
                b, keep = pallas_proposals.fused_decode_nms(
                    dl_top, anc_top, top_scores, image_sizes,
                    iou_threshold=cfg.rpn_nms_thresh)
                s = jnp.where(keep, top_scores, -jnp.inf)
                v = keep
            else:
                def per_image(obj_i, dl_i, size_i):
                    top_scores, top_idx = jax.lax.top_k(obj_i, k)
                    boxes = box_ops.delta_decode(dl_i[top_idx], anc[top_idx])
                    boxes = box_ops.clip_boxes(boxes, size_i[0], size_i[1])
                    ok = box_ops.small_box_mask(boxes, 1e-3)
                    keep = nms_ops.nms_mask_blocked(
                        boxes, top_scores, ok, cfg.rpn_nms_thresh)
                    return boxes, jnp.where(keep, top_scores, -jnp.inf), keep

                b, s, v = jax.vmap(per_image)(obj, dl, image_sizes)
            level_boxes.append(b)
            level_scores.append(s)
            level_valid.append(v)

        boxes = jnp.concatenate(level_boxes, axis=1)
        scores = jnp.concatenate(level_scores, axis=1)
        valid = jnp.concatenate(level_valid, axis=1)

        def top_post(b, s, v):
            kk = min(post_n, b.shape[0])
            top_s, top_i = jax.lax.top_k(s, kk)
            return b[top_i], v[top_i] & (top_s > -jnp.inf), top_s

        return jax.vmap(top_post)(boxes, scores, valid)

    # -- RPN loss ----------------------------------------------------------

    def rpn_loss(self, objectness, deltas, gt_boxes, gt_valid, rng):
        """Per-image sampled RPN losses, summed over the batch
        (the reference returns per-image then sums, DGFRCNN.py:127)."""
        cfg = self.config
        obj = jnp.concatenate(objectness, axis=1)  # [B, R]
        dl = jnp.concatenate(deltas, axis=1)  # [B, R, 4]
        B = obj.shape[0]
        keys = jax.random.split(rng, B)

        # fused batched matcher (Pallas on TPU) instead of per-image [G,R]
        # IoU planes
        match_b = matchers.match_anchors_batched(
            gt_boxes, gt_valid, self.anchors, cfg.rpn_fg_iou,
            cfg.rpn_bg_iou, True,
        )  # [B, R]

        def per_image(obj_i, dl_i, gt_b, match, key):
            fg = match >= 0
            bg = match == matchers.BELOW_LOW
            sample = matchers.balanced_sample(
                fg, bg, cfg.rpn_batch_per_image, cfg.rpn_positive_fraction, key
            )
            # gather + encode regression targets on the 256 sampled anchors
            # only (not all ~185k)
            matched_gt_s = gt_b[jnp.clip(match[sample.idx], 0)]
            reg_targets_s = box_ops.delta_encode(
                matched_gt_s, self.anchors[sample.idx]
            )
            n_sampled = jnp.maximum(jnp.sum(sample.valid), 1)
            box_l = loss_ops.smooth_l1(
                dl_i[sample.idx], reg_targets_s, beta=1 / 9
            ).sum(-1)
            box_loss = (
                jnp.sum(box_l * sample.is_pos.astype(box_l.dtype))
                / n_sampled.astype(box_l.dtype)
            )
            labels = fg.astype(jnp.float32)[sample.idx]
            obj_l = loss_ops.bce_with_logits(obj_i[sample.idx], labels)
            obj_loss = loss_ops.masked_mean(obj_l, sample.valid)
            return obj_loss, box_loss

        obj_losses, box_losses = jax.vmap(per_image)(
            obj, dl, gt_boxes, match_b, keys
        )
        return jnp.sum(obj_losses), jnp.sum(box_losses)

    # -- RoI sampling ------------------------------------------------------

    def select_training_samples(
        self, proposals, prop_valid, gt_boxes, gt_labels, gt_valid, rng
    ):
        """torchvision select_training_samples, static-shape & batched.

        Returns rois [B,S,4], labels [B,S] (0=bg), reg_targets [B,S,4],
        sample_valid [B,S].
        """
        cfg = self.config
        B = proposals.shape[0]
        keys = jax.random.split(rng, B)

        def per_image(props, pv, gt_b, gt_l, gt_v, key):
            # torchvision appends gt boxes to the proposal set
            all_props = jnp.concatenate([props, gt_b], axis=0)
            all_valid = jnp.concatenate([pv, gt_v], axis=0)
            iou = box_ops.box_iou(gt_b, all_props)
            iou = jnp.where(all_valid[None, :], iou, 0.0)
            match = matchers.iou_match(
                iou, gt_v, cfg.box_fg_iou, cfg.box_bg_iou, False
            )
            fg = (match >= 0) & all_valid
            bg = (match == matchers.BELOW_LOW) & all_valid
            labels = jnp.where(fg, gt_l[jnp.clip(match, 0)], 0)

            sample = matchers.balanced_sample(
                fg, bg, cfg.box_batch_per_image, cfg.box_positive_fraction, key
            )
            rois = all_props[sample.idx]
            s_labels = labels[sample.idx]
            matched_gt = gt_b[jnp.clip(match, 0)][sample.idx]
            reg_t = box_ops.delta_encode(matched_gt, rois, cfg.box_reg_weights)
            return rois, s_labels, reg_t, sample.valid

        return jax.vmap(per_image)(
            proposals, prop_valid, gt_boxes, gt_labels, gt_valid, keys
        )

    # -- box head ----------------------------------------------------------

    def box_features(self, params, feats, rois):
        """RoIAlign + TwoMLPHead -> [B, S, 1024] (the DG hook feature,
        DGFRCNN.py:89-91)."""
        # RoIAlign uses P2..P5 only (featmap_names '0'-'3', fasterrcnn.py:413)
        pooled = self.roi_align(feats, rois)  # [B,S,7,7,256]
        return self.box_head.apply({"params": params["box_head"]}, pooled)

    def roi_align(self, feats, rois):
        """Multi-scale RoIAlign: Pallas kernel on TPU backends, XLA gather
        elsewhere (CPU tests / virtual meshes). DGOD_ROI_ALIGN=pallas|xla
        overrides."""
        import os

        # == 'tpu' (not `!= 'cpu'`): Mosaic only lowers on TPU, and a GPU
        # backend must take the XLA path rather than crash
        choice = os.environ.get("DGOD_ROI_ALIGN", "")
        use_pallas = (
            choice == "pallas"
            or (choice != "xla" and jax.default_backend() == "tpu")
        )
        if use_pallas:
            return batched_roi_align_tpu(tuple(feats[:4]), rois, STRIDES[:4])

        def per_image(f2, f3, f4, f5, r):
            return multiscale_roi_align([f2, f3, f4, f5], r, STRIDES[:4])

        return jax.vmap(per_image)(*feats[:4], rois)

    def box_predictions(self, params, box_feats):
        return self.predictor.apply({"params": params["predictor"]}, box_feats)

    # -- RoI loss ----------------------------------------------------------

    def roi_loss(self, class_logits, box_regression, labels, reg_targets, valid):
        """fastrcnn_loss (fasterrcnn.py:198-236): per-image CE (mean over the
        512 samples) + smooth-L1 summed over positives / 512; summed over
        the batch."""
        S = class_logits.shape[1]

        ce = loss_ops.softmax_cross_entropy(class_logits, labels)  # [B,S]
        cls_loss_per_img = jnp.sum(ce * valid, axis=1) / jnp.maximum(
            jnp.sum(valid, axis=1), 1
        )

        Bc = box_regression.shape[-1] // 4
        box_reg = box_regression.reshape(*box_regression.shape[:-1], Bc, 4)
        per_label = jnp.take_along_axis(
            box_reg, labels[..., None, None].repeat(4, -1), axis=2
        )[..., 0, :]  # [B,S,4]
        sl1 = loss_ops.smooth_l1(per_label, reg_targets, beta=1 / 9).sum(-1)
        pos = (labels > 0) & valid
        box_loss_per_img = jnp.sum(sl1 * pos, axis=1) / S

        return jnp.sum(cls_loss_per_img), jnp.sum(box_loss_per_img)

    # -- inference postprocess ----------------------------------------------

    def postprocess(self, class_logits, box_regression, proposals, prop_valid,
                    image_sizes, scale_back):
        """RoIHeads.postprocess_detections, static-shape."""
        cfg = self.config
        Cp1 = cfg.num_classes + 1

        def per_image(logits, regs, props, pv, size, scale):
            scores = jax.nn.softmax(logits, -1)  # [N, C+1]
            regs = regs.reshape(-1, Cp1, 4)
            boxes = box_ops.delta_decode(
                regs, props[:, None, :], cfg.box_reg_weights
            )  # [N, C+1, 4]
            boxes = box_ops.clip_boxes(boxes, size[0], size[1])
            # drop background column
            boxes = boxes[:, 1:, :].reshape(-1, 4)
            cls_scores = scores[:, 1:].reshape(-1)
            labels = jnp.tile(jnp.arange(1, Cp1), (props.shape[0],))
            ok = (
                jnp.repeat(pv, Cp1 - 1)
                & (cls_scores > cfg.box_score_thresh)
                & box_ops.small_box_mask(boxes, 1e-2)
            )
            idx, keep_ok, _ = nms_ops.batched_nms_topk(
                boxes, cls_scores, labels, ok, cfg.box_nms_thresh,
                cfg.detections_per_img,
            )
            out_boxes = boxes[idx] * jnp.tile(scale[::-1], 2)[None, :]
            return (
                jnp.where(keep_ok[:, None], out_boxes, 0.0),
                jnp.where(keep_ok, cls_scores[idx], 0.0),
                jnp.where(keep_ok, labels[idx], 0),
                keep_ok,
            )

        boxes, scores, labels, valid = jax.vmap(per_image)(
            class_logits, box_regression, proposals, prop_valid,
            image_sizes, scale_back,
        )
        return {"boxes": boxes, "scores": scores, "labels": labels, "valid": valid}

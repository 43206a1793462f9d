"""DGFRCNN — domain-generalised Faster R-CNN, TPU-native.

Functional re-design of the reference DGFRCNN LightningModule
(DGFRCNN.py:73-201): explicit aux outputs instead of hooks, batched modes
2-4 instead of 8 sequential single-image forwards (DGFRCNN.py:165-199 — the
reference's dominant throughput sin), five pure per-mode loss functions.

reg_weights = [w_imgDA, w_insDA, w_consistency, w_clsPrime, w_cls]
(README.md:107-116).

Deliberate deviation (documented): the reference's mode-2/3/4 CE uses
`self.box_labels[0]` — the label state left by the most recent single-image
forward (DGFRCNN.py:169,180,195), which is that image's own labels only
because the loop runs one image at a time. We use each image's own sampled
labels directly (the intent), with no hidden-state staleness hazard.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import losses as loss_ops
from . import dg_heads
from .faster_rcnn import FRCNNConfig, FRCNNDetector


class DGFRCNNModel:
    """Flax-module bundle + pure loss/predict functions."""

    name = "FRCNN"

    def __init__(
        self,
        num_classes: int = 9,
        num_domains: int = 3,
        canvas: Tuple[int, int] = (608, 1216),
        config: FRCNNConfig = None,
        compute_dtype=jnp.bfloat16,
        backbone_block_counts=(3, 4, 6, 3),
    ):
        self.num_classes = num_classes
        self.num_domains = num_domains
        self.canvas = canvas
        self.compute_dtype = compute_dtype
        cfg = config or FRCNNConfig(num_classes=num_classes)
        self.detector = FRCNNDetector(
            cfg, canvas, dtype=compute_dtype,
            backbone_block_counts=tuple(backbone_block_counts))
        self.image_da = dg_heads.ImageDAFPN(num_domains)
        self.ins_da = dg_heads.frcnn_instance_da(num_domains)
        self.ins_cls = dg_heads.DomainBank(
            dg_heads.frcnn_ins_cls(num_classes, prime=False), num_domains
        )
        self.ins_cls_prime = dg_heads.DomainBank(
            dg_heads.frcnn_ins_cls(num_classes, prime=True), num_domains
        )

    def init(self, rng) -> Dict[str, Any]:
        k_det, k_ida, k_insda, k_cls, k_clsp = jax.random.split(rng, 5)
        det = self.detector.init(k_det)
        p2_hw = (self.canvas[0] // 4, self.canvas[1] // 4)
        ida = jax.jit(self.image_da.init)(
            k_ida, jnp.zeros((1, *p2_hw, 256))
        )["params"]
        insda = jax.jit(self.ins_da.init)(k_insda, jnp.zeros((1, 8, 1024)))["params"]
        cls = jax.jit(self.ins_cls.init)(
            k_cls, jnp.zeros((1, 8, 1024)), jnp.zeros((1,), jnp.int32)
        )["params"]
        clsp = jax.jit(self.ins_cls_prime.init)(
            k_clsp, jnp.zeros((1, 8, 1024)), jnp.zeros((1,), jnp.int32)
        )["params"]
        return {
            "detector": det,
            "image_da": ida,
            "ins_da": insda,
            "ins_cls": cls,
            "ins_cls_prime": clsp,
        }

    # -- forward -----------------------------------------------------------

    def normalize(self, images_uint8):
        """/255 only: the reference FRCNN uses identity transform stats
        'because images are already normalized' (fasterrcnn.py:439-440)."""
        return images_uint8.astype(jnp.float32) / 255.0

    def _train_forward(self, params, batch, rng, need_box_feats=True,
                       stop_box_grad=False):
        """Shared fwd producing proposals, sampled RoIs, box feats + aux."""
        det = self.detector
        k_rpn, k_roi = jax.random.split(rng)
        images = self.normalize(batch["image"])
        feats, _ = det.features(params["detector"], images)
        objectness, deltas = det.rpn_forward(params["detector"], feats)
        proposals, prop_valid, _ = det.generate_proposals(
            objectness, deltas, batch["image_size"], training=True
        )
        rois, roi_labels, reg_targets, roi_valid = det.select_training_samples(
            proposals, prop_valid, batch["boxes"], batch["labels"],
            batch["gt_valid"], k_roi,
        )
        out = {
            "feats": feats,
            "objectness": objectness,
            "deltas": deltas,
            "rois": rois,
            "roi_labels": roi_labels,
            "reg_targets": reg_targets,
            "roi_valid": roi_valid,
            "rpn_rng": k_rpn,
        }
        if need_box_feats:
            f_in = feats
            if stop_box_grad:
                f_in = [jax.lax.stop_gradient(f) for f in feats]
                rois = jax.lax.stop_gradient(rois)
            out["box_features"] = det.box_features(params["detector"], f_in, rois)
        return out

    # -- per-mode losses ----------------------------------------------------

    def loss_for_mode(self, params, batch, rng, mode: int, reg_weights):
        det = self.detector

        if mode == 0:
            fwd = self._train_forward(params, batch, rng)
            obj_loss, rpn_box_loss = det.rpn_loss(
                fwd["objectness"], fwd["deltas"], batch["boxes"],
                batch["gt_valid"], fwd["rpn_rng"],
            )
            logits, box_reg = det.box_predictions(
                params["detector"], fwd["box_features"]
            )
            cls_loss, box_loss = det.roi_loss(
                logits, box_reg, fwd["roi_labels"], fwd["reg_targets"],
                fwd["roi_valid"],
            )
            total = obj_loss + rpn_box_loss + cls_loss + box_loss
            return total, {
                "det/loss_objectness": obj_loss,
                "det/loss_rpn_box_reg": rpn_box_loss,
                "det/loss_classifier": cls_loss,
                "det/loss_box_reg": box_loss,
            }

        fwd = self._train_forward(params, batch, rng, stop_box_grad=(mode == 2))
        box_feats = fwd["box_features"]  # [B, S, 1024]
        B, S, _ = box_feats.shape
        domain = batch["domain"]

        if mode == 1:
            # DGFRCNN.py:145-158
            p2 = fwd["feats"][0].astype(jnp.float32)
            img_da = self.image_da.apply({"params": params["image_da"]}, p2)  # [B,D]
            flat = box_feats.reshape(B * S, -1)
            ins_da = self.ins_da.apply({"params": params["ins_da"]}, flat)  # [B*S,D]
            l_img = jnp.mean(loss_ops.softmax_cross_entropy(img_da, domain))
            ins_labels = jnp.repeat(domain, S)
            l_ins = jnp.mean(loss_ops.softmax_cross_entropy(ins_da, ins_labels))
            exp_img = jnp.repeat(img_da, S, axis=0)  # [B*S, D]
            l_cst = jnp.mean((ins_da - exp_img) ** 2)
            total = (
                reg_weights[0] * l_img
                + reg_weights[1] * l_ins
                + reg_weights[2] * l_cst
            )
            return total, {"dg/img_da": l_img, "dg/ins_da": l_ins, "dg/cst": l_cst}

        roi_labels = fwd["roi_labels"]  # [B, S] in 0..C-1 (0 = background)

        if mode == 2:
            # detector frozen (torch.no_grad, DGFRCNN.py:166-167)
            scores = self.ins_cls.apply(
                {"params": params["ins_cls"]}, box_feats, domain
            )  # [B,S,C]
            ce = loss_ops.softmax_cross_entropy(scores, roi_labels)  # [B,S]
            l = jnp.mean(jnp.mean(ce, axis=1))
            return reg_weights[4] * l, {"dg/ins_cls": l}

        if mode == 3:
            scores = self.ins_cls_prime.apply(
                {"params": params["ins_cls_prime"]}, box_feats, domain
            )
            ce = loss_ops.softmax_cross_entropy(scores, roi_labels)
            l = jnp.mean(jnp.mean(ce, axis=1))
            return reg_weights[3] * l, {"dg/ins_cls_prime": l}

        if mode == 4:
            frozen = jax.lax.stop_gradient(params["ins_cls"])
            all_scores = self.ins_cls.apply(
                {"params": frozen}, box_feats, mode="all"
            )  # [D,B,S,C]
            ce = loss_ops.softmax_cross_entropy(all_scores, roi_labels[None])  # [D,B,S]
            ce_img = jnp.mean(ce, axis=2)  # [D,B]
            other = jnp.arange(self.num_domains)[:, None] != domain[None, :]
            l = loss_ops.masked_mean(ce_img, other)
            return reg_weights[4] * l, {"dg/ins_cls_other": l}

        raise ValueError(f"unknown mode {mode}")

    # -- inference ----------------------------------------------------------

    def predict(self, params, batch):
        det = self.detector
        images = self.normalize(batch["image"])
        feats, _ = det.features(params["detector"], images)
        objectness, deltas = det.rpn_forward(params["detector"], feats)
        proposals, prop_valid, _ = det.generate_proposals(
            objectness, deltas, batch["image_size"], training=False
        )
        box_feats = det.box_features(params["detector"], feats, proposals)
        logits, box_reg = det.box_predictions(params["detector"], box_feats)
        return det.postprocess(
            logits, box_reg, proposals, prop_valid,
            batch["image_size"], batch["scale_back"],
        )

    # -- optimizer masks ------------------------------------------------------

    def param_group_labels(self, params):
        def detector_label(path, _):
            keys = [p.key for p in path if hasattr(p, "key")]
            if "body" in keys:
                i = keys.index("body")
                rest = keys[i + 1 :]
                if rest and (
                    rest[0] in ("conv1", "bn1") or rest[0].startswith("layer1_")
                ):
                    return "frozen"
                if any(k.startswith("bn") or k == "downsample_bn" for k in rest):
                    return "frozen"
            return "detector"

        return {
            "detector": jax.tree_util.tree_map_with_path(
                detector_label, params["detector"]
            ),
            "image_da": jax.tree.map(lambda _: "image_da", params["image_da"]),
            "ins_da": jax.tree.map(lambda _: "ins_da", params["ins_da"]),
            "ins_cls": jax.tree.map(lambda _: "ins_cls", params["ins_cls"]),
            "ins_cls_prime": jax.tree.map(
                lambda _: "ins_cls_prime", params["ins_cls_prime"]
            ),
        }

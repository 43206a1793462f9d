"""DGFCOS — domain-generalised FCOS, TPU-native.

Re-designs the reference DGFCOS LightningModule (DGFCOS.py:111-243) as a
functional bundle: explicit aux outputs replace forward hooks, the 5-mode
training-step state machine becomes five pure loss functions (each jitted
with a static optimizer participation mask — see train/steps.py), and the
reference's per-image Python loops in modes 2-4 (8 sequential single-image
detector forwards per step, DGFCOS.py:207-237) collapse into one batched
forward.

reg_weights = [w_imgDA, w_insDA, w_consistency, w_clsPrime, w_cls]
(README.md:107-116; canonical 0.5 0.5 0.5 0.05 0.0001).

Deliberate deviations from reference quirks (documented, all improving
correctness; toggle `FCOSLossConfig` for the matcher quirks):
- modes 2-4 cross-entropy: the reference passes [1, R, C] activations to
  torch F.cross_entropy, which softmaxes over the *location* axis R
  (DGFCOS.py:211,222,237). We softmax over the class axis C, the intended
  semantics. The terms carry weights 1e-4/0.05 so mAP impact is minimal.
- mode-1 losses are computed without re-running the (discarded) detection
  loss of the reference's `_ = self.detector(imgs, targets)` — gradients
  are identical, compute is not wasted.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import losses as loss_ops
from . import dg_heads
from .fcos import (FCOS, FCOSLossConfig, fcos_anchors_for, fcos_loss,
                   fcos_postprocess)

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class DGFCOSModel:
    """Flax-module bundle + pure loss/predict functions."""

    name = "FCOS"

    def __init__(
        self,
        num_classes: int = 9,
        num_domains: int = 3,
        canvas: Tuple[int, int] = (608, 1216),
        loss_config: FCOSLossConfig = FCOSLossConfig(),
        compute_dtype=jnp.bfloat16,
        backbone_block_counts=(3, 4, 6, 3),
    ):
        self.num_classes = num_classes
        self.num_domains = num_domains
        self.canvas = canvas
        self.loss_config = loss_config
        self.compute_dtype = compute_dtype
        self.detector = FCOS(
            num_classes, dtype=compute_dtype,
            backbone_block_counts=tuple(backbone_block_counts))
        self.image_da = dg_heads.ImageDA(num_domains)
        self.ins_da = dg_heads.fcos_instance_da(num_domains)
        self.ins_cls = dg_heads.DomainBank(
            dg_heads.fcos_ins_cls(num_classes, prime=False), num_domains
        )
        self.ins_cls_prime = dg_heads.DomainBank(
            dg_heads.fcos_ins_cls(num_classes, prime=True), num_domains
        )
        anchors, counts = fcos_anchors_for(canvas)
        self.anchors = jnp.asarray(anchors)
        self.counts = counts

    # -- init ---------------------------------------------------------------

    def init(self, rng) -> Dict[str, Any]:
        k_det, k_ida, k_insda, k_cls, k_clsp = jax.random.split(rng, 5)
        dummy = jnp.zeros((1, *self.canvas, 3), jnp.float32)
        # jit the inits: eager dispatch of hundreds of layer inits is slow
        det_params = jax.jit(self.detector.init)(k_det, dummy)["params"]
        # feature shapes for the DA heads
        c5_hw = (self.canvas[0] // 32 + (self.canvas[0] % 32 > 0),
                 self.canvas[1] // 32 + (self.canvas[1] % 32 > 0))
        r_total = int(sum(self.counts))
        ida_params = jax.jit(self.image_da.init)(
            k_ida, jnp.zeros((1, *c5_hw, 2048))
        )["params"]
        insda_params = jax.jit(self.ins_da.init)(k_insda, jnp.zeros((1, 8, 256)))["params"]
        cls_params = jax.jit(self.ins_cls.init)(
            k_cls, jnp.zeros((1, 8, 256)), jnp.zeros((1,), jnp.int32)
        )["params"]
        clsp_params = jax.jit(self.ins_cls_prime.init)(
            k_clsp, jnp.zeros((1, 8, 256)), jnp.zeros((1,), jnp.int32)
        )["params"]
        return {
            "detector": det_params,
            "image_da": ida_params,
            "ins_da": insda_params,
            "ins_cls": cls_params,
            "ins_cls_prime": clsp_params,
        }

    # -- forward helpers ------------------------------------------------------

    def normalize(self, images_uint8: jnp.ndarray) -> jnp.ndarray:
        """uint8 canvas -> normalised float (ImageNet stats, fcos.py:480-482).

        The /255 from the reference dataset (DrivingDataset.py:53) is fused
        here so the host->device transfer stays uint8.
        """
        x = images_uint8.astype(jnp.float32) / 255.0
        return (x - IMAGENET_MEAN) / IMAGENET_STD

    def forward(self, params, images_uint8):
        x = self.normalize(images_uint8)
        return self.detector.apply({"params": params["detector"]}, x)

    def _gt_classes(self, batch):
        """Dense one-hot matcher targets [B, R, C] (fcos.py:201 contract)."""
        from ..ops import matchers

        matched = matchers.fcos_match_batched(
            self.anchors, batch["boxes"], batch["gt_valid"], self.counts,
            center_sampling_radius=self.loss_config.center_sampling_radius,
            exact_reference_area=self.loss_config.exact_reference_area,
        )
        fg = matched >= 0
        labels = jnp.take_along_axis(batch["labels"], jnp.clip(matched, 0), axis=1)
        return jax.nn.one_hot(labels, self.num_classes) * fg[..., None]

    # -- per-mode losses ------------------------------------------------------

    def loss_for_mode(self, params, batch, rng, mode: int, reg_weights):
        """Returns (total_loss, metrics dict). Static `mode`."""
        del rng  # FCOS losses are deterministic (no sampling)
        if mode == 0:
            outputs, _ = self.forward(params, batch["image"])
            losses, _ = fcos_loss(
                outputs, self.anchors, self.counts,
                batch["boxes"], batch["labels"], batch["gt_valid"],
                self.loss_config,
            )
            total = losses["classification"] + losses["bbox_regression"] + losses["bbox_ctrness"]
            return total, {f"det/{k}": v for k, v in losses.items()}

        if mode == 1:
            # DGFCOS.py:188-200
            _, aux = self.forward(params, batch["image"])
            img_da = self.image_da.apply(
                {"params": params["image_da"]}, aux["c5"].astype(jnp.float32)
            )
            ins_da = self.ins_da.apply(
                {"params": params["ins_da"]}, aux["ins_feat"].astype(jnp.float32)
            )
            domain = batch["domain"]
            l_img = jnp.mean(loss_ops.softmax_cross_entropy(img_da, domain))
            dom_per_loc = jnp.broadcast_to(domain[:, None], ins_da.shape[:2])
            l_ins = jnp.mean(loss_ops.softmax_cross_entropy(ins_da, dom_per_loc))
            l_cst = jnp.mean((img_da[:, None, :] - ins_da) ** 2)
            total = (
                reg_weights[0] * l_img + reg_weights[1] * l_ins + reg_weights[2] * l_cst
            )
            return total, {"dg/img_da": l_img, "dg/ins_da": l_ins, "dg/cst": l_cst}

        # modes 2/3/4 need ins_feat + dense matcher targets
        _, aux = self.forward(params, batch["image"])
        aux["ins_feat"] = aux["ins_feat"].astype(jnp.float32)
        gt_classes = self._gt_classes(batch)  # [B, R, C]
        domain = batch["domain"]

        if mode == 2:
            # detector frozen (torch.no_grad, DGFCOS.py:208): only InsCls trains
            feat = jax.lax.stop_gradient(aux["ins_feat"])
            scores = self.ins_cls.apply({"params": params["ins_cls"]}, feat, domain)
            ce = loss_ops.softmax_cross_entropy_dense(scores, gt_classes)  # [B,R]
            l = jnp.mean(jnp.mean(ce, axis=1))
            total = reg_weights[4] * l
            return total, {"dg/ins_cls": l}

        if mode == 3:
            scores = self.ins_cls_prime.apply(
                {"params": params["ins_cls_prime"]}, aux["ins_feat"], domain
            )
            ce = loss_ops.softmax_cross_entropy_dense(scores, gt_classes)
            l = jnp.mean(jnp.mean(ce, axis=1))
            total = reg_weights[3] * l
            return total, {"dg/ins_cls_prime": l}

        if mode == 4:
            # InsCls params frozen (requires_grad=False, DGFCOS.py:230-231);
            # gradients flow only into the detector features
            frozen = jax.lax.stop_gradient(params["ins_cls"])
            all_scores = self.ins_cls.apply(
                {"params": frozen}, aux["ins_feat"], mode="all"
            )  # [D, B, R, C]
            ce = loss_ops.softmax_cross_entropy_dense(
                all_scores, gt_classes[None]
            )  # [D, B, R]
            ce_img = jnp.mean(ce, axis=2)  # [D, B]
            other = (
                jnp.arange(self.num_domains)[:, None] != domain[None, :]
            )  # [D, B]
            l = loss_ops.masked_mean(ce_img, other)
            total = reg_weights[4] * l
            return total, {"dg/ins_cls_other": l}

        raise ValueError(f"unknown mode {mode}")

    # -- inference ------------------------------------------------------------

    def predict(self, params, batch):
        outputs, _ = self.forward(params, batch["image"])
        return fcos_postprocess(
            outputs, self.anchors, self.counts,
            batch["image_size"], batch["scale_back"],
        )

    # -- optimizer masks --------------------------------------------------------

    def param_group_labels(self, params):
        """Pytree of group names aligned with params."""
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

        labels = {
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
        return labels


MODE_ACTIVE_GROUPS = {
    0: ("detector",),
    1: ("detector", "image_da", "ins_da"),
    2: ("ins_cls",),
    3: ("detector", "ins_cls_prime"),
    4: ("detector",),
}

"""Target assignment — FCOS centre-sampling matcher, IoU matcher, balanced
fg/bg sampler. All static-shape: GT comes in padded `[MAX_GT, 4]` + validity
mask, outputs are fixed-size index/mask arrays.

Parity:
- FCOS matcher: reference fcos.py:503-550 — centre-sampling radius, inside-box
  test, per-level scale ranges, min-area tie-break, and (optionally) the
  reference's exact area formula at fcos.py:543 which uses
  (y1-x1)*(y2-y1); default here is the true area (improves on the quirk).
- IoU matcher: torchvision Matcher semantics (thresholds + optional
  allow_low_quality_matches) as used by the RPN (0.7/0.3, allow=True,
  reference fasterrcnn.py:187 via torchvision) and RoI head (0.5/0.5,
  allow=False).
- balanced sampler: torchvision BalancedPositiveNegativeSampler semantics
  (RPN 256 @ 0.5 pos, RoI 512 @ 0.25 pos; reference fasterrcnn.py:365-370)
  but realised as fixed-size sampling with validity weights.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

BELOW_LOW = -1
BETWEEN = -2


def fcos_match(
    anchors: jnp.ndarray,  # [R, 4] unit boxes, all levels concatenated
    gt_boxes: jnp.ndarray,  # [G, 4] padded
    gt_valid: jnp.ndarray,  # [G] bool
    num_anchors_per_level: tuple[int, ...],
    center_sampling_radius: float = 1.5,
    exact_reference_area: bool = False,
) -> jnp.ndarray:
    """Match each anchor location to a GT index, or -1.

    Returns matched_idx [R] int32 in [-1, G).
    """
    R = anchors.shape[0]
    anchor_ctr = 0.5 * (anchors[:, :2] + anchors[:, 2:])  # [R,2]
    anchor_size = anchors[:, 2] - anchors[:, 0]  # [R]
    gt_ctr = 0.5 * (gt_boxes[:, :2] + gt_boxes[:, 2:])  # [G,2]

    # centre sampling: |anchor_ctr - gt_ctr|_inf < radius * anchor_size
    diff = jnp.abs(anchor_ctr[:, None, :] - gt_ctr[None, :, :])  # [R,G,2]
    match = jnp.max(diff, axis=2) < center_sampling_radius * anchor_size[:, None]

    # anchor centre strictly inside the gt box
    x = anchor_ctr[:, 0:1]  # [R,1]
    y = anchor_ctr[:, 1:2]
    x0, y0, x1, y1 = (gt_boxes[None, :, i] for i in range(4))  # each [1,G]
    dist = jnp.stack([x - x0, y - y0, x1 - x, y1 - y], axis=2)  # [R,G,4]
    match &= jnp.min(dist, axis=2) > 0

    # per-level scale range on the max regression distance
    lower = anchor_size * 4.0
    upper = anchor_size * 8.0
    level_start = jnp.zeros((R,), bool).at[: num_anchors_per_level[0]].set(True)
    level_end = jnp.zeros((R,), bool).at[R - num_anchors_per_level[-1] :].set(True)
    lower = jnp.where(level_start, 0.0, lower)
    upper = jnp.where(level_end, jnp.inf, upper)
    max_dist = jnp.max(dist, axis=2)  # [R,G]
    match &= (max_dist > lower[:, None]) & (max_dist < upper[:, None])

    match &= gt_valid[None, :]

    if exact_reference_area:
        # reproduces the reference's formula at fcos.py:543 verbatim
        gt_areas = (gt_boxes[:, 1] - gt_boxes[:, 0]) * (gt_boxes[:, 3] - gt_boxes[:, 1])
    else:
        gt_areas = (gt_boxes[:, 2] - gt_boxes[:, 0]) * (gt_boxes[:, 3] - gt_boxes[:, 1])

    # min-area tie-break: argmax of mask * (1e8 - area)
    quality = match.astype(jnp.float32) * (1e8 - gt_areas[None, :])  # [R,G]
    best = jnp.max(quality, axis=1)
    matched_idx = jnp.argmax(quality, axis=1).astype(jnp.int32)
    return jnp.where(best < 1e-5, -1, matched_idx)


def iou_match(
    iou: jnp.ndarray,  # [G, R] match-quality matrix (gt x predictions)
    gt_valid: jnp.ndarray,  # [G] bool
    high_threshold: float,
    low_threshold: float,
    allow_low_quality_matches: bool,
) -> jnp.ndarray:
    """torchvision Matcher. Returns matches [R] int32: gt idx, or
    BELOW_LOW (-1) / BETWEEN (-2).

    If no valid GT at all, every prediction gets BELOW_LOW (caller decides
    the all-background path, mirroring torchvision's empty-gt branch).
    """
    neg_inf = jnp.asarray(-jnp.inf, iou.dtype)
    masked = jnp.where(gt_valid[:, None], iou, neg_inf)  # [G,R]
    matched_vals = jnp.max(masked, axis=0)  # [R]
    matches = jnp.argmax(masked, axis=0).astype(jnp.int32)  # [R]

    out = jnp.where(matched_vals < low_threshold, BELOW_LOW, matches)
    out = jnp.where(
        (matched_vals >= low_threshold) & (matched_vals < high_threshold),
        BETWEEN,
        out,
    )

    if allow_low_quality_matches:
        # for each gt, predictions tying its best IoU are forced to match it
        best_per_gt = jnp.max(masked, axis=1, keepdims=True)  # [G,1]
        # only meaningful where gt is valid and best iou > 0 is not required
        # by torchvision (it uses equality incl. ties)
        is_best = (masked == best_per_gt) & gt_valid[:, None] & (best_per_gt > neg_inf)
        # torchvision restores the *original argmax* match index for those
        # predictions (which may point at a different gt sharing the value).
        any_best = jnp.any(is_best, axis=0)  # [R]
        out = jnp.where(any_best, matches, out)

    no_gt = ~jnp.any(gt_valid)
    return jnp.where(no_gt, jnp.full_like(out, BELOW_LOW), out)


def _use_pallas(default_on: bool) -> bool:
    """Per-kernel Pallas dispatch, gated on measurement and on TPU-only.

    A kernel is `default_on` only after winning a recorded end-to-end A/B
    (scripts/check_pallas_matchers_tpu.py + bench.py). Round-3 numbers on
    the real v5e at train shapes (B=8, 608x1216):
    - iou_match: Pallas 4.6 ms vs XLA 10.6 ms; bench FRCNN 92.1 img/s vs
      89.5 -> DEFAULT ON.
    - fcos_match: Pallas ~= XLA (4.6 vs 4.2 ms; bench FCOS 198.1 vs 197.5,
      within noise) -> stays opt-in.
    TPU-only via equality check: Mosaic doesn't lower on CPU/GPU, and on
    hosts with a TPU plugin `jax.default_backend()` is 'tpu' even under
    JAX_PLATFORMS=cpu — the conftest env pin (DGOD_MATCHER=xla) keeps CPU
    suites on the XLA path. DGOD_MATCHER=pallas|xla overrides both ways."""
    import os

    choice = os.environ.get("DGOD_MATCHER", "")
    if choice == "xla":
        return False
    if jax.default_backend() != "tpu":
        return False
    return choice == "pallas" or default_on


def match_anchors_batched(gt_boxes, gt_valid, anchors, high_threshold,
                          low_threshold, allow_low_quality_matches):
    """Fused box_iou + `iou_match` over the whole batch: gt [B,G,4]/[B,G]
    x anchors [R,4] -> matches [B,R]. Pallas kernel by default on TPU (won
    its A/B: 4.6 ms vs 10.6 ms XLA, bench FRCNN 92.1 vs 89.5 img/s — the
    XLA path materialises [G,R] planes per image); DGOD_MATCHER=pallas|xla
    overrides."""
    if _use_pallas(default_on=True):
        from .pallas_matchers import iou_match_tpu

        return iou_match_tpu(
            gt_boxes, gt_valid, anchors, high_threshold, low_threshold,
            allow_low_quality_matches,
        )
    from .boxes import box_iou

    def per_image(gt_b, gt_v):
        iou = box_iou(gt_b, anchors)
        return iou_match(
            iou, gt_v, high_threshold, low_threshold,
            allow_low_quality_matches,
        )

    return jax.vmap(per_image)(gt_boxes, gt_valid)


def fcos_match_batched(anchors, gt_boxes, gt_valid, num_anchors_per_level,
                       center_sampling_radius=1.5,
                       exact_reference_area=False):
    """Batched `fcos_match`: gt [B,G,4]/[B,G] -> matched idx [B,R].
    Pallas kernel is OPT-IN (DGOD_MATCHER=pallas): its A/B vs the XLA path
    was a wash (see _use_pallas), so XLA stays the default."""
    if _use_pallas(default_on=False):
        from .pallas_matchers import fcos_match_tpu

        return fcos_match_tpu(
            anchors, gt_boxes, gt_valid, tuple(num_anchors_per_level),
            center_sampling_radius, exact_reference_area,
        )
    return jax.vmap(
        lambda b, v: fcos_match(
            anchors, b, v, num_anchors_per_level,
            center_sampling_radius=center_sampling_radius,
            exact_reference_area=exact_reference_area,
        )
    )(gt_boxes, gt_valid)


class SampleResult(NamedTuple):
    idx: jnp.ndarray  # [num_samples] int32 indices into predictions
    is_pos: jnp.ndarray  # [num_samples] bool
    valid: jnp.ndarray  # [num_samples] bool (False for padding)


def balanced_sample(
    pos_mask: jnp.ndarray,  # [R] bool
    neg_mask: jnp.ndarray,  # [R] bool
    num_samples: int,
    positive_fraction: float,
    rng: jax.Array,
) -> SampleResult:
    """Fixed-size balanced positive/negative sampling.

    Picks min(num_pos_available, num_samples*positive_fraction) positives
    uniformly at random, fills the remainder with random negatives (up to
    availability). Output is always `num_samples` long; `valid` marks real
    samples. Positives come first (their count is data-dependent, encoded in
    `is_pos`).
    """
    R = pos_mask.shape[0]
    max_pos = int(num_samples * positive_fraction)
    k_pos, k_neg = jax.random.split(rng)

    # random priority, -inf for non-members; topk picks random members first
    pos_pri = jnp.where(pos_mask, jax.random.uniform(k_pos, (R,)), -jnp.inf)
    neg_pri = jnp.where(neg_mask, jax.random.uniform(k_neg, (R,)), -jnp.inf)

    n_pos_avail = jnp.sum(pos_mask.astype(jnp.int32))
    n_neg_avail = jnp.sum(neg_mask.astype(jnp.int32))
    n_pos = jnp.minimum(n_pos_avail, max_pos)
    n_neg = jnp.minimum(n_neg_avail, num_samples - n_pos)

    # over-take, mask later; quota can exceed the candidate pool (e.g. an
    # exhaustive-sampling parity run with batch_per_image > #anchors), so
    # cap k at R and pad the index list — `valid` masks the padding anyway
    k = min(num_samples, R)
    _, pos_idx = jax.lax.top_k(pos_pri, k)
    _, neg_idx = jax.lax.top_k(neg_pri, k)
    if k < num_samples:
        pad = jnp.zeros((num_samples - k,), pos_idx.dtype)
        pos_idx = jnp.concatenate([pos_idx, pad])
        neg_idx = jnp.concatenate([neg_idx, pad])

    rank = jnp.arange(num_samples)
    take_pos = rank < n_pos  # first n_pos slots are positives
    # negatives fill slots [n_pos, n_pos+n_neg); negative j goes to slot n_pos+j
    neg_slot_idx = jnp.clip(rank - n_pos, 0, num_samples - 1)
    idx = jnp.where(take_pos, pos_idx[rank], neg_idx[neg_slot_idx])
    valid = rank < (n_pos + n_neg)
    return SampleResult(idx.astype(jnp.int32), take_pos & valid, valid)

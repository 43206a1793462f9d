"""Static-shape NMS for TPU.

Exact greedy NMS (torchvision `nms`/`batched_nms` semantics, used at
reference fcos.py:608 and inside the reference RPN/RoI postprocessing via
torchvision) realised in two XLA-friendly forms:

1. `nms_mask` — full keep-mask via the self-suppression fixed-point
   iteration (the same scheme TF's TPU NMS uses): converges to the exact
   greedy solution, all shapes static, O(K^2) memory for the overlap matrix.
   Use when K is moderate (RPN per-level proposals <= ~2500).

2. `nms_topk` — returns only the first `k` kept boxes via k sequential
   argmax-and-suppress steps. Exactly equals greedy-NMS-then-`keep[:k]`
   (the detectors' `detections_per_img=100` truncation) at O(k*K) cost.

Class-aware (batched) variants use the coordinate-offset trick so boxes of
different categories never suppress each other.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import boxes as box_ops


def _sort_by_score(scores: jnp.ndarray, valid: jnp.ndarray):
    """Stable descending sort; invalid entries pushed to the end."""
    key = jnp.where(valid, scores, -jnp.inf)
    order = jnp.argsort(-key, stable=True)
    return order


def nms_mask(
    boxes: jnp.ndarray,  # [K, 4]
    scores: jnp.ndarray,  # [K]
    valid: jnp.ndarray,  # [K] bool
    iou_threshold: float,
) -> jnp.ndarray:
    """Exact greedy NMS keep-mask (original order). [K] bool."""
    K = boxes.shape[0]
    order = _sort_by_score(scores, valid)
    b = boxes[order]
    v = valid[order]

    iou = box_ops.box_iou(b, b)  # [K, K]
    rank = jnp.arange(K)
    overlap = (iou > iou_threshold) & (rank[:, None] < rank[None, :])  # j < r

    def cond(state):
        active, changed, it = state
        return changed & (it < K)

    def body(state):
        active, _, it = state
        suppressed = jnp.any(overlap & active[:, None], axis=0)  # [K]
        new_active = v & ~suppressed
        return new_active, jnp.any(new_active != active), it + 1

    active0 = v
    active, _, _ = jax.lax.while_loop(cond, body, (active0, jnp.bool_(True), 0))

    keep_sorted = active
    keep = jnp.zeros((K,), bool).at[order].set(keep_sorted)
    return keep


def nms_topk(
    boxes: jnp.ndarray,  # [K, 4]
    scores: jnp.ndarray,  # [K]
    valid: jnp.ndarray,  # [K] bool
    iou_threshold: float,
    k: int,
):
    """First-k greedy NMS picks.

    Returns (idx [k] int32 into the input arrays, keep_valid [k] bool,
    kept_scores [k]). Matches greedy NMS output order (descending score).
    """
    K = boxes.shape[0]
    neg_inf = jnp.float32(-jnp.inf)
    live_scores = jnp.where(valid, scores, neg_inf)

    def body(carry, _):
        live = carry
        pick = jnp.argmax(live)
        pick_score = live[pick]
        ok = pick_score > neg_inf
        pick_box = boxes[pick]
        iou = box_ops.elementwise_iou(pick_box[None, :], boxes)  # [K]
        suppress = iou > iou_threshold
        new_live = jnp.where(suppress | (jnp.arange(K) == pick), neg_inf, live)
        new_live = jnp.where(ok, new_live, live)
        return new_live, (pick.astype(jnp.int32), ok, pick_score)

    _, (idx, ok, kept_scores) = jax.lax.scan(body, live_scores, None, length=k)
    return idx, ok, kept_scores


def nms_mask_blocked(
    boxes: jnp.ndarray,  # [K, 4]
    scores: jnp.ndarray,  # [K]
    valid: jnp.ndarray,  # [K] bool
    iou_threshold: float,
    block: int = 256,
) -> jnp.ndarray:
    """Exact greedy NMS keep-mask via rank-ordered blocks.

    Same result as `nms_mask`, much cheaper at RPN sizes (K~2000): the
    global fixed point re-reads the full [K,K] overlap matrix every
    iteration; here blocks are decided in score order, so each outer step
    reads one [block,K] strip once (suppression by already-DECIDED earlier
    blocks is a single masked reduction) and the only iteration happens on
    a [block,block] tile. Total traffic ~= one IoU pass instead of
    iterations x [K,K].
    """
    K = boxes.shape[0]
    pad = (-K) % block
    order = _sort_by_score(scores, valid)
    b = boxes[order]
    v = valid[order]
    if pad:
        b = jnp.concatenate([b, jnp.zeros((pad, 4), b.dtype)])
        v = jnp.concatenate([v, jnp.zeros((pad,), bool)])
    Kp = K + pad
    n_blocks = Kp // block
    rank = jnp.arange(Kp)
    local = jnp.arange(block)

    def outer(i, active):
        start = i * block
        blk = jax.lax.dynamic_slice_in_dim(b, start, block)  # [block, 4]
        v_blk = jax.lax.dynamic_slice_in_dim(v, start, block)
        iou_row = box_ops.box_iou(blk, b)  # [block, Kp]
        over_row = iou_row > iou_threshold
        # suppression by kept boxes in earlier (already decided) blocks
        decided = (rank < start) & active
        supp_prev = jnp.any(over_row & decided[None, :], axis=1)  # [block]
        # intra-block fixed point on the [block, block] tile
        tile = jax.lax.dynamic_slice_in_dim(over_row, start, block, axis=1)
        tile = tile & (local[:, None] < local[None, :])  # j suppresses r>j
        base = v_blk & ~supp_prev

        def cond(state):
            act, changed, it = state
            return changed & (it < block)

        def body(state):
            act, _, it = state
            suppressed = jnp.any(tile & act[:, None], axis=0)
            new = base & ~suppressed
            return new, jnp.any(new != act), it + 1

        blk_active, _, _ = jax.lax.while_loop(
            cond, body, (base, jnp.bool_(True), 0))
        return jax.lax.dynamic_update_slice_in_dim(
            active, blk_active, start, axis=0)

    active = jax.lax.fori_loop(0, n_blocks, outer, v)
    keep = jnp.zeros((K,), bool).at[order].set(active[:K])
    return keep


def _class_offsets(boxes: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Offset boxes per label so different classes never overlap."""
    max_coord = jnp.max(jnp.where(jnp.isfinite(boxes), boxes, 0.0))
    offset = labels.astype(boxes.dtype) * (max_coord + 1.0)
    return boxes + offset[:, None]


def batched_nms_mask(boxes, scores, labels, valid, iou_threshold):
    """Class-aware greedy NMS keep-mask via the offset trick."""
    return nms_mask(_class_offsets(boxes, labels), scores, valid, iou_threshold)


def batched_nms_topk(boxes, scores, labels, valid, iou_threshold, k):
    """Class-aware first-k greedy NMS (offset trick). Same returns as nms_topk."""
    return nms_topk(_class_offsets(boxes, labels), scores, valid, iou_threshold, k)

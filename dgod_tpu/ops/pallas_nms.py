"""Pallas TPU kernel: greedy first-k NMS.

Replaces the host-scheduled `lax.scan` of ops/nms.nms_topk (k sequential
argmax+suppress XLA ops, each a separate HBM roundtrip) with ONE kernel
that keeps boxes/scores resident in VMEM for the whole greedy loop.

Layout: coordinates go in as [4, K] and scores as [1, K] so every
elementwise op runs lane-parallel on the VPU; dynamic indexing is avoided
entirely (Pallas TPU lowers no dynamic_slice) — the picked box's
coordinates are extracted with masked max-reductions and the output index
vectors are loop-carried `where` updates.

Exactly matches greedy NMS truncated to k picks (torchvision `nms` +
`keep[:k]`, the detectors' `detections_per_img` truncation — reference
fcos.py:608-609 and the RoI postprocess via torchvision). Falls back to
ops/nms.nms_topk off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import nms as nms_xla

NEG_INF = -1e30  # python float: jnp scalars become captured consts in Pallas


def _nms_kernel(coords_ref, scores_ref, valid_ref, idx_ref, ok_ref, *, k,
                iou_threshold):
    K = scores_ref.shape[1]
    x1 = coords_ref[0:1, :]  # [1, K]
    y1 = coords_ref[1:2, :]
    x2 = coords_ref[2:3, :]
    y2 = coords_ref[3:4, :]
    areas = (x2 - x1) * (y2 - y1)
    live0 = jnp.where(valid_ref[:] != 0, scores_ref[:], NEG_INF)  # [1, K]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
    out_lane = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)

    def body(i, carry):
        live, idx_vec, ok_vec = carry
        best = jnp.max(live)
        ok = best > NEG_INF
        # smallest lane index attaining the max (argmax tie rule)
        pick = jnp.min(jnp.where(live == best, lane, K)).astype(jnp.int32)
        pick_mask = lane == pick

        def take(row):
            return jnp.max(jnp.where(pick_mask, row, NEG_INF))

        px1, py1, px2, py2 = take(x1), take(y1), take(x2), take(y2)
        parea = (px2 - px1) * (py2 - py1)

        ix1 = jnp.maximum(x1, px1)
        iy1 = jnp.maximum(y1, py1)
        ix2 = jnp.minimum(x2, px2)
        iy2 = jnp.minimum(y2, py2)
        inter = jnp.maximum(ix2 - ix1, 0.0) * jnp.maximum(iy2 - iy1, 0.0)
        union = areas + parea - inter
        iou = jnp.where(union > 0, inter / union, 0.0)

        suppress = (iou > iou_threshold) | pick_mask
        new_live = jnp.where(ok, jnp.where(suppress, NEG_INF, live), live)

        write = out_lane == i
        idx_vec = jnp.where(write, jnp.where(ok, pick, 0), idx_vec)
        ok_vec = jnp.where(write, ok.astype(jnp.int32), ok_vec)
        return new_live, idx_vec, ok_vec

    _, idx_vec, ok_vec = jax.lax.fori_loop(
        0, k, body,
        (live0, jnp.zeros((1, k), jnp.int32), jnp.zeros((1, k), jnp.int32)),
    )
    idx_ref[:] = idx_vec
    ok_ref[:] = ok_vec


@functools.partial(jax.jit, static_argnames=("iou_threshold", "k"))
def nms_topk_pallas(boxes, scores, valid, iou_threshold: float, k: int):
    """First-k greedy NMS on TPU via Pallas. Same contract as nms.nms_topk:
    returns (idx [k] int32, ok [k] bool, kept_scores [k])."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K = boxes.shape[0]
    coords = boxes.astype(jnp.float32).T  # [4, K]
    idx, ok = pl.pallas_call(
        functools.partial(_nms_kernel, k=k, iou_threshold=float(iou_threshold)),
        out_shape=(
            jax.ShapeDtypeStruct((1, k), jnp.int32),
            jax.ShapeDtypeStruct((1, k), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
    )(
        coords,
        scores.astype(jnp.float32).reshape(1, K),
        valid.astype(jnp.int32).reshape(1, K),
    )
    idx = idx[0]
    ok = ok[0].astype(bool)
    return idx, ok, jnp.where(ok, scores[idx], 0.0)


def tpu_available() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def batched_nms_topk(boxes, scores, labels, valid, iou_threshold, k,
                     use_pallas: bool | None = None):
    """Class-aware first-k NMS.

    Measured on v5e (K=5000, k=100): the XLA scan variant runs ~2.2ms vs
    ~3.7ms for this kernel — the greedy loop is latency-bound on sequential
    scalar reductions either way, and XLA's scan pipelines slightly better.
    Default is therefore the XLA path; the kernel stays available for
    future fusion work (`use_pallas=True`).
    """
    if use_pallas is None:
        use_pallas = False
    offset_boxes = nms_xla._class_offsets(boxes, labels)
    if use_pallas:
        return nms_topk_pallas(offset_boxes, scores, valid, iou_threshold, k)
    return nms_xla.nms_topk(offset_boxes, scores, valid, iou_threshold, k)

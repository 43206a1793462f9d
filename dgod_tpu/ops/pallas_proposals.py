"""Pallas TPU kernel: fused RPN proposal decode + clip + greedy NMS.

Replaces the XLA chain in FRCNNDetector.generate_proposals per (image,
level): delta_decode -> clip -> small-box mask -> nms_mask_blocked. The XLA
version re-sorts already-sorted scores, gathers boxes twice, and walks the
blocked fixed point through HBM; here the top-k outputs (already in
descending score order — rank order IS score order) are decoded once into
VMEM scratch and the block-ordered greedy NMS runs entirely on-chip:

- suppression of block i by earlier DECIDED blocks j<i as [BLK, BLK] IoU
  tiles against the running keep mask (only j<i tiles are touched — half
  the traffic of the XLA strip version, which reads [BLK, K] per block);
- the intra-block dependency solved by the same self-suppression fixed
  point nms_mask_blocked uses, on a [BLK, BLK] VMEM tile.

Exactly equal to greedy NMS (torchvision semantics: suppress IoU > thr)
on the decoded boxes; tested against the XLA path in
tests/test_pallas_proposals.py and A/B-timed on the chip by
scripts/check_pallas_proposals_tpu.py. Selection between this kernel and
the XLA path: DGOD_PROPOSAL_NMS=pallas|xla (see
faster_rcnn.generate_proposals for the recorded-A/B default).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

BLK = 128
NEG_INF = -1e30
LOG_CLIP = math.log(1000.0 / 16)


def _kernel(d_ref, a_ref, s_ref, size_ref, boxes_ref, keep_ref,
            coords_ref, area_ref, active_ref, *, nb, iou_threshold,
            min_size, interpret=False):
    """One image per grid step. Ref layouts (leading 1 = the grid block):
    d_ref, a_ref: [1, 4, nb, BLK] (deltas / anchors, coord-major)
    s_ref: [1, nb, BLK], descending-score order (rank order = score order)
    size_ref: [1, 1, 2] (h, w)
    boxes_ref out: [1, 4, nb, BLK]; keep_ref out: [1, nb, BLK] int8
    scratch: coords_ref [4, nb, BLK], area_ref / active_ref [nb, BLK]
    """
    # ---- decode + clip + validity over all blocks at once ----
    w_a = a_ref[0, 2] - a_ref[0, 0]
    h_a = a_ref[0, 3] - a_ref[0, 1]
    cx_a = a_ref[0, 0] + 0.5 * w_a
    cy_a = a_ref[0, 1] + 0.5 * h_a
    dw = jnp.minimum(d_ref[0, 2], LOG_CLIP)
    dh = jnp.minimum(d_ref[0, 3], LOG_CLIP)
    pcx = d_ref[0, 0] * w_a + cx_a
    pcy = d_ref[0, 1] * h_a + cy_a
    pw = jnp.exp(dw) * w_a
    ph = jnp.exp(dh) * h_a
    hh = size_ref[0, 0, 0]
    ww = size_ref[0, 0, 1]
    x1 = jnp.clip(pcx - 0.5 * pw, 0.0, ww)
    y1 = jnp.clip(pcy - 0.5 * ph, 0.0, hh)
    x2 = jnp.clip(pcx + 0.5 * pw, 0.0, ww)
    y2 = jnp.clip(pcy + 0.5 * ph, 0.0, hh)
    boxes_ref[0, 0] = x1
    boxes_ref[0, 1] = y1
    boxes_ref[0, 2] = x2
    boxes_ref[0, 3] = y2
    coords_ref[0] = x1
    coords_ref[1] = y1
    coords_ref[2] = x2
    coords_ref[3] = y2
    bw = x2 - x1
    bh = y2 - y1
    area_ref[...] = bw * bh
    valid = (bw >= min_size) & (bh >= min_size) & (s_ref[0] > NEG_INF / 2)
    active_ref[...] = valid.astype(jnp.float32)

    local = jax.lax.broadcasted_iota(jnp.int32, (BLK, BLK), 0)
    localT = jax.lax.broadcasted_iota(jnp.int32, (BLK, BLK), 1)

    def tile_over(i, j):
        """[BLK, BLK] IoU>thr of block i's boxes (rows) vs block j's."""
        ix1 = coords_ref[0, i, :][:, None]
        iy1 = coords_ref[1, i, :][:, None]
        ix2 = coords_ref[2, i, :][:, None]
        iy2 = coords_ref[3, i, :][:, None]
        jx1 = coords_ref[0, j, :][None, :]
        jy1 = coords_ref[1, j, :][None, :]
        jx2 = coords_ref[2, j, :][None, :]
        jy2 = coords_ref[3, j, :][None, :]
        inter = (jnp.maximum(jnp.minimum(ix2, jx2)
                             - jnp.maximum(ix1, jx1), 0.0)
                 * jnp.maximum(jnp.minimum(iy2, jy2)
                               - jnp.maximum(iy1, jy1), 0.0))
        union = area_ref[i, :][:, None] + area_ref[j, :][None, :] - inter
        return inter > iou_threshold * union  # iou > thr, division-free

    # NOTE all block-level masks are f32 (0.0/1.0): Mosaic cannot insert a
    # minor dim on 1-D i1 vectors (act[:, None] on bool fails to lower), so
    # suppression is computed with multiply/max instead of and/any.
    def outer(i, carry):
        # suppression by kept boxes in earlier (decided) blocks. STATIC
        # trip count with a j<i result mask: a dynamic-trip fori (0..i)
        # lowers to scf.while, which Mosaic compiles pathologically slowly
        # at this nesting depth.
        def earlier(j, supp_f):
            over_f = tile_over(i, j).astype(jnp.float32)  # [BLK, BLK]
            act_j = active_ref[j, :][None, :]  # [1, BLK] f32
            use = (j < i).astype(jnp.float32)
            return jnp.maximum(
                supp_f, jnp.max(over_f * act_j, axis=1) * use)

        supp_f = jax.lax.fori_loop(
            0, nb, earlier, jnp.zeros((BLK,), jnp.float32))
        base_f = active_ref[i, :] * (1.0 - jnp.minimum(supp_f, 1.0))

        # intra-block greedy via the self-suppression fixed point
        tile_f = (tile_over(i, i) & (local < localT)).astype(jnp.float32)

        def cond(state):
            _, changed, it = state
            return changed & (it < BLK)

        def body(state):
            act_f, _, it = state
            suppressed = jnp.max(tile_f * act_f[:, None], axis=0)  # [BLK]
            new = base_f * (1.0 - jnp.minimum(suppressed, 1.0))
            return new, jnp.any(new != act_f), it + 1

        blk_active, _, _ = jax.lax.while_loop(
            cond, body, (base_f, jnp.bool_(True), jnp.int32(0)))
        active_ref[i, :] = blk_active
        return carry

    jax.lax.fori_loop(0, nb, outer, jnp.int32(0))
    keep_ref[0] = (active_ref[...] > 0.0).astype(jnp.int8)


@functools.partial(jax.jit,
                   static_argnames=("iou_threshold", "min_size", "interpret"))
def fused_decode_nms(deltas, anchors, scores, sizes, *,
                     iou_threshold: float, min_size: float = 1e-3,
                     interpret: bool = False):
    """deltas/anchors [B,K,4], scores [B,K] (descending per image — rank
    order is score order, e.g. straight out of top_k), sizes [B,2] (h,w).
    Returns (boxes [B,K,4] decoded+clipped, keep [B,K] bool greedy-NMS
    mask). `interpret=True` runs the kernel in Pallas interpret mode (CPU
    testing)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, K, _ = deltas.shape
    pad = (-K) % BLK
    kp = K + pad
    nb = kp // BLK

    def shape4(x):  # [B,K,4] -> [B,4,nb,BLK]
        x = jnp.pad(x.astype(jnp.float32), ((0, 0), (0, pad), (0, 0)))
        return x.transpose(0, 2, 1).reshape(B, 4, nb, BLK)

    d = shape4(deltas)
    a = shape4(anchors)
    s = jnp.pad(scores.astype(jnp.float32), ((0, 0), (0, pad)),
                constant_values=NEG_INF).reshape(B, nb, BLK)
    sz = sizes.astype(jnp.float32).reshape(B, 1, 2)

    kernel = functools.partial(
        _kernel, nb=nb, iou_threshold=float(iou_threshold),
        min_size=float(min_size))
    boxes4, keep = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 4, nb, BLK), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((1, 4, nb, BLK), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((1, nb, BLK), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, 1, 2), lambda b: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 4, nb, BLK), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((1, nb, BLK), lambda b: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 4, nb, BLK), jnp.float32),
            jax.ShapeDtypeStruct((B, nb, BLK), jnp.int8),
        ],
        scratch_shapes=[
            pltpu.VMEM((4, nb, BLK), jnp.float32),
            pltpu.VMEM((nb, BLK), jnp.float32),
            pltpu.VMEM((nb, BLK), jnp.float32),
        ],
        interpret=interpret,
    )(d, a, s, sz)

    boxes = boxes4.reshape(B, 4, kp).transpose(0, 2, 1)[:, :K]
    keep_mask = keep.reshape(B, kp)[:, :K].astype(bool)
    return boxes, keep_mask


def tpu_available() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False

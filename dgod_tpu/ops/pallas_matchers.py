"""Pallas TPU target-assignment kernels (anchor / point matching).

TPU-native equivalents of the matching stage of torchvision's Matcher and
FCOS center-sampling matcher (reference fasterrcnn.py:187 via torchvision,
fcos.py:503-550) — the last of the three kernel families the build targets
name (RoIAlign, anchor/point matching, NMS).

Why a kernel: the XLA formulation (ops/matchers.py) materialises [G, R]
f32 planes (G=128 padded GT x R~185k anchors ~= 95 MB each) and re-reads
them for every reduction (max, argmax, per-gt best, tie test) — ~7.6 ms
per FRCNN train step. These kernels stream anchor tiles through VMEM and
never materialise the match matrix in HBM: traffic is the anchor planes
(a few MB) and the [B, R] outputs.

- `iou_match_tpu`: grid (B, 2 phases, R tiles). Phase 0 accumulates the
  per-gt best IoU into a [G, 1] VMEM scratch (reset per image); phase 1
  recomputes each IoU tile (compute is cheap, ~20 VPU ops per pair) and
  emits thresholded matches with torchvision's allow_low_quality rescue
  (value ties against the per-gt best, original-argmax restore,
  BELOW_LOW/BETWEEN codes, empty-gt -> all BELOW_LOW).
- `fcos_match_tpu`: grid (B, R tiles), single pass. Per-point eligibility
  (center-sampling radius, strictly-inside test, per-level scale range,
  validity) -> min-area tie-break argmax, exactly `matchers.fcos_match`
  (including the optional reference area-formula quirk).

Both return the same codes as their ops/matchers.py counterparts and are
validated against them in tests/test_pallas_matchers.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import matchers as xla_matchers

BELOW_LOW = xla_matchers.BELOW_LOW
BETWEEN = xla_matchers.BETWEEN

TILE = 4096  # anchors per grid step ([G, TILE] f32 planes, ~2 MB each)


def _pad_to_tile(x, axis):
    r = x.shape[axis]
    pad = (-r) % TILE
    if pad:
        cfg = [(0, 0)] * x.ndim
        cfg[axis] = (0, pad)
        x = jnp.pad(x, cfg)
    return x


def _iou_tile(gt, anc):
    """IoU block [G, T] from gt planes [G, 4] and anchor planes [4, T]."""
    gx1 = gt[:, 0:1]
    gy1 = gt[:, 1:2]
    gx2 = gt[:, 2:3]
    gy2 = gt[:, 3:4]
    ax1 = anc[0:1, :]
    ay1 = anc[1:2, :]
    ax2 = anc[2:3, :]
    ay2 = anc[3:4, :]
    iw = jnp.maximum(jnp.minimum(gx2, ax2) - jnp.maximum(gx1, ax1), 0.0)
    ih = jnp.maximum(jnp.minimum(gy2, ay2) - jnp.maximum(gy1, ay1), 0.0)
    inter = iw * ih
    ga = (gx2 - gx1) * (gy2 - gy1)
    aa = (ax2 - ax1) * (ay2 - ay1)
    union = ga + aa - inter
    return jnp.where(union > 0.0, inter / union, 0.0)


def _iou_match_kernel(high, low, allow, n_tiles, gt_ref, valid_ref, anc_ref,
                      out_ref, best_ref):
    phase = pl.program_id(1)
    tile = pl.program_id(2)

    gt = gt_ref[0]  # [G, 4]
    valid = valid_ref[0] > 0  # [G, 1] bool
    neg_inf = jnp.float32(-jnp.inf)
    iou = _iou_tile(gt, anc_ref[...])  # [G, T]
    masked = jnp.where(valid, iou, neg_inf)

    @pl.when((phase == 0) & (tile == 0))
    def _():
        best_ref[...] = jnp.full_like(best_ref, neg_inf)

    @pl.when(phase == 0)
    def _():
        tile_best = jnp.max(masked, axis=1, keepdims=True)  # [G, 1]
        best_ref[...] = jnp.maximum(best_ref[...], tile_best)
        # phase-0 steps share the phase-1 out block mapping; write zeros so
        # every output element is defined even if phase 1 were skipped
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(phase == 1)
    def _():
        matched_vals = jnp.max(masked, axis=0)  # [T]
        matches = jnp.argmax(masked, axis=0).astype(jnp.int32)  # [T]
        out = jnp.where(matched_vals < low, BELOW_LOW, matches)
        out = jnp.where(
            (matched_vals >= low) & (matched_vals < high), BETWEEN, out
        )
        if allow:
            best = best_ref[...]  # [G, 1]
            is_best = (masked == best) & valid & (best > neg_inf)
            any_best = jnp.any(is_best, axis=0)  # [T]
            out = jnp.where(any_best, matches, out)
        no_gt = ~jnp.any(valid)
        out_ref[...] = jnp.where(no_gt, jnp.full_like(out, BELOW_LOW),
                                 out)[None]


@functools.partial(
    jax.jit,
    static_argnames=("high_threshold", "low_threshold",
                     "allow_low_quality_matches", "interpret"),
)
def iou_match_tpu(gt_boxes, gt_valid, anchors, high_threshold, low_threshold,
                  allow_low_quality_matches, interpret=False):
    """Fused box_iou + torchvision Matcher over a static anchor set.

    gt_boxes [B, G, 4], gt_valid [B, G] bool, anchors [R, 4]
    -> matches [B, R] int32 (gt idx, BELOW_LOW, or BETWEEN).
    """
    B, G = gt_boxes.shape[:2]
    R = anchors.shape[0]
    anc = _pad_to_tile(anchors.astype(jnp.float32).T, 1)  # [4, Rp]
    Rp = anc.shape[1]
    n_tiles = Rp // TILE

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(B, 2, n_tiles),
        in_specs=[
            pl.BlockSpec((1, G, 4), lambda b, p, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, 1), lambda b, p, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, TILE), lambda b, p, t: (0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE), lambda b, p, t: (b, t),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((G, 1), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(
            _iou_match_kernel, float(high_threshold), float(low_threshold),
            bool(allow_low_quality_matches), n_tiles,
        ),
        out_shape=jax.ShapeDtypeStruct((B, Rp), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
    )(
        gt_boxes.astype(jnp.float32),
        gt_valid.astype(jnp.float32)[..., None],
        anc,
    )
    return out[:, :R]


def _fcos_match_kernel(radius, exact_area, gt_ref, valid_ref, anc_ref,
                       out_ref):
    gt = gt_ref[0]  # [G, 4]
    valid = valid_ref[0] > 0  # [G, 1]
    # anchor planes [6, T]: cx, cy, rad (radius*size), lower, upper, (pad)
    cx = anc_ref[0:1, :]
    cy = anc_ref[1:2, :]
    rad = anc_ref[2:3, :]
    lower = anc_ref[3:4, :]
    upper = anc_ref[4:5, :]

    gx1 = gt[:, 0:1]
    gy1 = gt[:, 1:2]
    gx2 = gt[:, 2:3]
    gy2 = gt[:, 3:4]
    gcx = 0.5 * (gx1 + gx2)
    gcy = 0.5 * (gy1 + gy2)

    # centre sampling: |anchor_ctr - gt_ctr|_inf < radius * anchor_size
    m = jnp.maximum(jnp.abs(cx - gcx), jnp.abs(cy - gcy)) < rad
    # anchor centre strictly inside the gt box
    d1 = cx - gx1
    d2 = cy - gy1
    d3 = gx2 - cx
    d4 = gy2 - cy
    m &= jnp.minimum(jnp.minimum(d1, d2), jnp.minimum(d3, d4)) > 0
    # per-level scale range on the max regression distance
    maxd = jnp.maximum(jnp.maximum(d1, d2), jnp.maximum(d3, d4))
    m &= (maxd > lower) & (maxd < upper)
    m &= valid

    if exact_area:
        # reference quirk at fcos.py:543, verbatim
        area = (gy1 - gx1) * (gy2 - gy1)
    else:
        area = (gx2 - gx1) * (gy2 - gy1)
    quality = m.astype(jnp.float32) * (1e8 - area)  # [G, T]
    best = jnp.max(quality, axis=0)
    idx = jnp.argmax(quality, axis=0).astype(jnp.int32)
    out_ref[...] = jnp.where(best < 1e-5, -1, idx)[None]


@functools.partial(
    jax.jit,
    static_argnames=("num_anchors_per_level", "center_sampling_radius",
                     "exact_reference_area", "interpret"),
)
def fcos_match_tpu(anchors, gt_boxes, gt_valid, num_anchors_per_level,
                   center_sampling_radius=1.5, exact_reference_area=False,
                   interpret=False):
    """Batched FCOS centre-sampling matcher (matchers.fcos_match semantics).

    anchors [R, 4] unit boxes, gt_boxes [B, G, 4], gt_valid [B, G]
    -> matched idx [B, R] int32 in [-1, G).
    """
    B, G = gt_boxes.shape[:2]
    R = anchors.shape[0]
    anchors = anchors.astype(jnp.float32)
    ctr = 0.5 * (anchors[:, :2] + anchors[:, 2:])
    size = anchors[:, 2] - anchors[:, 0]
    lower = size * 4.0
    upper = size * 8.0
    level_start = np.zeros((R,), bool)
    level_start[: num_anchors_per_level[0]] = True
    level_end = np.zeros((R,), bool)
    level_end[R - num_anchors_per_level[-1]:] = True
    lower = jnp.where(jnp.asarray(level_start), 0.0, lower)
    upper = jnp.where(jnp.asarray(level_end), jnp.inf, upper)
    planes = jnp.stack(
        [ctr[:, 0], ctr[:, 1], center_sampling_radius * size, lower, upper,
         jnp.zeros((R,), jnp.float32)],
        axis=0,
    )  # [6, R]
    planes = _pad_to_tile(planes, 1)
    Rp = planes.shape[1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(B, Rp // TILE),
        in_specs=[
            pl.BlockSpec((1, G, 4), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, 1), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, TILE), lambda b, t: (0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE), lambda b, t: (b, t),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(
            _fcos_match_kernel, float(center_sampling_radius),
            bool(exact_reference_area),
        ),
        out_shape=jax.ShapeDtypeStruct((B, Rp), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(
        gt_boxes.astype(jnp.float32),
        gt_valid.astype(jnp.float32)[..., None],
        planes,
    )
    return out[:, :R]

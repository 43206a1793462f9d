"""Pallas TPU target-assignment kernels (anchor / point matching).

TPU-native equivalents of the matching stage of torchvision's Matcher and
FCOS center-sampling matcher (reference fasterrcnn.py:187 via torchvision,
fcos.py:503-550) — the last of the three kernel families the build targets
name (RoIAlign, anchor/point matching, NMS).

Why a kernel: the XLA formulation (ops/matchers.py) materialises [G, R]
f32 planes (G=128 padded GT x R~185k anchors ~= 95 MB each) and re-reads
them for every reduction (max, argmax, per-gt best, tie test). These
kernels stream anchor tiles through VMEM and never materialise the match
matrix in HBM: traffic is the anchor planes (a few MB) and the [B, R]
outputs.

Mosaic layout note (the round-2 lesson): an output block of (1, TILE) over
a [B, Rp] array violates the "second-to-minor block dim divisible by 8 or
equal to the array dim" rule for B > 1. Both kernels therefore process ALL
B images inside each tile step (a static python loop over B — same total
compute, B moved from the grid into the kernel) and write a full-height
(B, TILE) block, which is legal for any B. Lowering is exercised on the
real chip by scripts/check_pallas_matchers_tpu.py; keep that green before
touching dispatch defaults.

- `iou_match_tpu`: grid (2 phases, R tiles). Phase 0 accumulates the
  per-gt best IoU into a [B, G] VMEM scratch; phase 1 recomputes each IoU
  tile (compute is cheap, ~20 VPU ops per pair) and emits thresholded
  matches with torchvision's allow_low_quality rescue (value ties against
  the per-gt best, original-argmax restore, BELOW_LOW/BETWEEN codes,
  empty-gt -> all BELOW_LOW).
- `fcos_match_tpu`: grid (R tiles), single pass. Per-point eligibility
  (center-sampling radius, strictly-inside test, per-level scale range,
  validity) -> min-area tie-break argmax, exactly `matchers.fcos_match`
  (including the optional reference area-formula quirk).

Both return the same codes as their ops/matchers.py counterparts and are
validated against them in tests/test_pallas_matchers.py (semantics,
interpret mode) and scripts/check_pallas_matchers_tpu.py (Mosaic lowering
+ A/B timing at train shapes on the real chip).
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


def _load_row(ref, b):
    """ref[b] for traced b (fori_loop index): [1, ...] -> squeeze dim 0."""
    idx = (pl.ds(b, 1),) + (slice(None),) * (len(ref.shape) - 1)
    return ref[idx][0]


def _iou_match_kernel(high, low, allow, B, gt_ref, valid_ref, anc_ref,
                      out_ref, best_ref):
    # images iterate via fori_loop (NOT an unrolled python loop): Mosaic
    # allocates kernel stack for the whole unrolled body, and B live
    # [G, TILE] planes blow the 16 MB scoped-vmem limit (measured 25.4 MB
    # at B=8, TILE=4096); the loop keeps one iteration's transients live
    phase = pl.program_id(0)
    tile = pl.program_id(1)
    neg_inf = jnp.float32(-jnp.inf)
    anc = anc_ref[...]

    @pl.when((phase == 0) & (tile == 0))
    def _():
        best_ref[...] = jnp.full_like(best_ref, neg_inf)

    @pl.when(phase == 0)
    def _():
        def body(b, carry):
            valid = _load_row(valid_ref, b) > 0  # [G, 1]
            masked = jnp.where(valid, _iou_tile(_load_row(gt_ref, b), anc),
                               neg_inf)
            tile_best = jnp.max(masked, axis=1)  # [G]
            cur = _load_row(best_ref, b)
            best_ref[pl.ds(b, 1), :] = jnp.maximum(cur, tile_best)[None]
            return carry

        jax.lax.fori_loop(0, B, body, 0)
        # phase-0 steps share the phase-1 out block mapping; write zeros so
        # every output element is defined even if phase 1 were skipped
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(phase == 1)
    def _():
        def body(b, carry):
            valid = _load_row(valid_ref, b) > 0  # [G, 1]
            masked = jnp.where(valid, _iou_tile(_load_row(gt_ref, b), anc),
                               neg_inf)
            matched_vals = jnp.max(masked, axis=0)  # [T]
            matches = jnp.argmax(masked, axis=0).astype(jnp.int32)  # [T]
            out = jnp.where(matched_vals < low, BELOW_LOW, matches)
            out = jnp.where(
                (matched_vals >= low) & (matched_vals < high), BETWEEN, out
            )
            if allow:
                best = _load_row(best_ref, b)[:, None]  # [G, 1]
                is_best = (masked == best) & valid & (best > neg_inf)
                any_best = jnp.any(is_best, axis=0)  # [T]
                out = jnp.where(any_best, matches, out)
            no_gt = ~jnp.any(valid)
            out = jnp.where(no_gt, jnp.full_like(out, BELOW_LOW), out)
            out_ref[pl.ds(b, 1), :] = out[None]
            return carry

        jax.lax.fori_loop(0, B, body, 0)


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
        grid=(2, n_tiles),
        in_specs=[
            pl.BlockSpec((B, G, 4), lambda p, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, G, 1), lambda p, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, TILE), lambda p, t: (0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, TILE), lambda p, t: (0, t),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((B, G), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(
            _iou_match_kernel, float(high_threshold), float(low_threshold),
            bool(allow_low_quality_matches), B,
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
        anc,
    )
    return out[:, :R]


def _fcos_match_kernel(exact_area, B, gt_ref, valid_ref, anc_ref, out_ref):
    # anchor planes [6, T]: cx, cy, rad (radius*size), lower, upper, (pad)
    cx = anc_ref[0:1, :]
    cy = anc_ref[1:2, :]
    rad = anc_ref[2:3, :]
    lower = anc_ref[3:4, :]
    upper = anc_ref[4:5, :]

    # fori_loop (not unrolled) over images: see _iou_match_kernel vmem note
    def body(b, carry):
        gt = _load_row(gt_ref, b)  # [G, 4]
        valid = _load_row(valid_ref, b) > 0  # [G, 1]
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
        out = jnp.where(best < 1e-5, -1, idx)
        out_ref[pl.ds(b, 1), :] = out[None]
        return carry

    jax.lax.fori_loop(0, B, body, 0)


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
        grid=(Rp // TILE,),
        in_specs=[
            pl.BlockSpec((B, G, 4), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, G, 1), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, TILE), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, TILE), lambda t: (0, t),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(
            _fcos_match_kernel, bool(exact_reference_area), B,
        ),
        out_shape=jax.ShapeDtypeStruct((B, Rp), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(
        gt_boxes.astype(jnp.float32),
        gt_valid.astype(jnp.float32)[..., None],
        planes,
    )
    return out[:, :R]

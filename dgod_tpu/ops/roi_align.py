"""Multi-scale RoIAlign — XLA gather formulation, static shapes.

TPU-native replacement for torchvision's C++/CUDA `roi_align` +
MultiScaleRoIAlign (invoked at reference fasterrcnn.py:278, configured
7x7 / sampling_ratio 2 / levels '0'-'3' at :413-416). Exact torchvision
semantics (aligned=False):

- FPN level per RoI: floor(4 + log2(sqrt(area)/224 + 1e-6)) clamped to the
  available levels (torchvision LevelMapper, canonical scale 224 level 4).
- bin grid 7x7, 2x2 sample points per bin at (i+0.5)/2 fractions,
- bilinear interpolation with torchvision's border rules: sample points
  outside [-1, size] contribute 0, coordinates clamp at 0 and size-1.

Design: all pyramid levels are flattened and concatenated into one
[sum(HW), C] table per image so a *single* gather serves every RoI at its
assigned level (no per-level recompute + mask). RoIs are processed in
chunks (lax.map) to bound the transient gather buffer. A Pallas kernel with
per-RoI DMA is the planned upgrade for the hot path.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _bilinear_params(coord, size):
    """torchvision roi_align bilinear weights along one axis.

    `size` is an int array broadcastable to coord's shape.
    Returns (lo_idx, hi_idx, w_lo, w_hi, in_range_mask).
    """
    size_f = size.astype(coord.dtype)
    out_of_range = (coord < -1.0) | (coord > size_f)
    c = jnp.clip(coord, 0.0)
    lo = jnp.floor(c).astype(jnp.int32)
    at_edge = lo >= size - 1
    lo = jnp.minimum(lo, size - 1)
    hi = jnp.minimum(lo + 1, size - 1)
    frac = jnp.where(at_edge, 0.0, c - lo.astype(c.dtype))
    return lo, hi, 1.0 - frac, frac, ~out_of_range


def _pack_corners(f: jnp.ndarray) -> jnp.ndarray:
    """[H, W, C] -> [H, W, 4C]: each cell carries its 2x2 neighbourhood
    (self, right, down, down-right), edge-replicated.

    Edge replication reproduces torchvision's hi-index clamp
    (x_hi = min(x_lo+1, W-1)). One gathered row then serves all four
    bilinear corners — a 4x reduction in gather operations, which is what
    TPU row-gather throughput is bound by.
    """
    right = jnp.concatenate([f[:, 1:], f[:, -1:]], axis=1)
    down = jnp.concatenate([f[1:], f[-1:]], axis=0)
    down_right = jnp.concatenate([down[:, 1:], down[:, -1:]], axis=1)
    return jnp.concatenate([f, right, down, down_right], axis=-1)


def multiscale_roi_align(
    feats: List[jnp.ndarray],  # per level [H_l, W_l, C], finest first
    rois: jnp.ndarray,  # [N, 4] xyxy in image frame
    strides: Sequence[int],  # stride per level (e.g. 4, 8, 16, 32)
    output_size: int = 7,
    sampling_ratio: int = 2,
    canonical_scale: float = 224.0,
    canonical_level: int = 4,
    chunk: int = 256,
    packed_corners: bool = True,
) -> jnp.ndarray:
    """-> [N, output_size, output_size, C]."""
    C = feats[0].shape[-1]
    n_levels = len(feats)

    heights = jnp.asarray([f.shape[0] for f in feats])
    widths = jnp.asarray([f.shape[1] for f in feats])
    offsets_list = [0]
    for f in feats:
        offsets_list.append(offsets_list[-1] + f.shape[0] * f.shape[1])
    offsets = jnp.asarray(offsets_list[:-1])
    if packed_corners:
        table = jnp.concatenate(
            [_pack_corners(f).reshape(-1, 4 * C) for f in feats], axis=0
        )
    else:
        table = jnp.concatenate([f.reshape(-1, C) for f in feats], axis=0)
    scales = jnp.asarray([1.0 / s for s in strides], jnp.float32)

    # level assignment (LevelMapper semantics)
    area = jnp.clip(
        (rois[:, 2] - rois[:, 0]) * (rois[:, 3] - rois[:, 1]), 0.0
    )
    k = jnp.floor(
        canonical_level + jnp.log2(jnp.sqrt(area) / canonical_scale + 1e-6)
    )
    # torchvision LevelMapper: k_min = -log2(finest scale), e.g. stride 4 -> 2
    k_min = int(np.round(np.log2(strides[0])))
    lvl = jnp.clip(k - k_min, 0, n_levels - 1).astype(jnp.int32)  # [N]

    S = sampling_ratio
    P = output_size
    PS = P * S
    M = PS * PS  # total sample points per roi

    # static bin-average pooling matrix [P*P, M] (0.25 weights) — applied as
    # one MXU matmul instead of a tiny-trailing-dim reshape+mean (TPU pads
    # dims like 2 and 4 to full lanes, which dominates runtime otherwise)
    pool_np = np.zeros((P * P, M), np.float32)
    for py in range(P):
        for sy in range(S):
            for px in range(P):
                for sx in range(S):
                    s = (py * S + sy) * PS + (px * S + sx)
                    pool_np[py * P + px, s] = 1.0 / (S * S)
    pool = jnp.asarray(pool_np)

    def align_chunk(args):
        r, lv = args  # [chunk, 4], [chunk]
        scale = scales[lv]  # [chunk]
        h_l = heights[lv]
        w_l = widths[lv]
        off = offsets[lv]

        x1 = r[:, 0] * scale
        y1 = r[:, 1] * scale
        x2 = r[:, 2] * scale
        y2 = r[:, 3] * scale
        roi_w = jnp.maximum(x2 - x1, 1.0)
        roi_h = jnp.maximum(y2 - y1, 1.0)
        bin_w = roi_w / P
        bin_h = roi_h / P

        # sample coordinates along each axis [chunk, PS]
        steps = (
            jnp.arange(PS, dtype=jnp.float32) // S
            + (jnp.arange(PS, dtype=jnp.float32) % S + 0.5) / S
        )  # bin + centred sub-sample fraction
        ys = y1[:, None] + steps[None, :] * bin_h[:, None]  # [chunk, PS]
        xs = x1[:, None] + steps[None, :] * bin_w[:, None]

        y_lo, y_hi, wy_lo, wy_hi, y_ok = _bilinear_params(ys, h_l[:, None])
        x_lo, x_hi, wx_lo, wx_hi, x_ok = _bilinear_params(xs, w_l[:, None])

        def flat(yi, xi):
            # [chunk, PS] x [chunk, PS] -> [chunk, M] flat sample grid
            return (
                off[:, None, None]
                + yi[:, :, None] * w_l[:, None, None]
                + xi[:, None, :]
            ).reshape(-1, M)

        def w2(a, b):
            return (a[:, :, None] * b[:, None, :]).reshape(-1, M)

        ok = (y_ok[:, :, None] & x_ok[:, None, :]).reshape(-1, M).astype(jnp.float32)

        if packed_corners:
            # one gather per sample point: row carries all 4 corners
            idx = flat(y_lo, x_lo).reshape(-1)
            rows = table[idx].reshape(-1, M, 4 * C).astype(jnp.float32)
            w00 = (w2(wy_lo, wx_lo) * ok)[..., None]
            w01 = (w2(wy_lo, wx_hi) * ok)[..., None]
            w10 = (w2(wy_hi, wx_lo) * ok)[..., None]
            w11 = (w2(wy_hi, wx_hi) * ok)[..., None]
            acc = (
                w00 * rows[..., :C]
                + w01 * rows[..., C : 2 * C]
                + w10 * rows[..., 2 * C : 3 * C]
                + w11 * rows[..., 3 * C :]
            )  # [chunk, M, C]
        else:
            acc = 0.0
            for yi, wy in ((y_lo, wy_lo), (y_hi, wy_hi)):
                for xi, wx in ((x_lo, wx_lo), (x_hi, wx_hi)):
                    idx = flat(yi, xi).reshape(-1)
                    vals = table[idx].reshape(-1, M, C).astype(jnp.float32)
                    acc = acc + vals * (w2(wy, wx) * ok)[..., None]

        # bin average via MXU: [P*P, M] @ [chunk, M, C] -> [chunk, P*P, C]
        # highest precision: default TPU matmul rounds f32 inputs to bf16,
        # costing ~1e-3 relative error against torchvision's exact mean
        pooled = jnp.einsum(
            "bm,cmf->cbf", pool, acc,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return pooled.reshape(-1, P, P, C)

    N = rois.shape[0]
    if N % chunk == 0 and N > chunk:
        out = jax.lax.map(
            align_chunk,
            (rois.reshape(-1, chunk, 4), lvl.reshape(-1, chunk)),
        )
        return out.reshape(N, P, P, C)
    return align_chunk((rois, lvl))


def batched_multiscale_roi_align(feats_batched, rois_batched, strides, **kw):
    """vmap over the batch dim. feats: list of [B,H,W,C]; rois [B,N,4]."""
    def one(feats_and_rois):
        feats, rois = feats_and_rois
        return multiscale_roi_align(list(feats), rois, strides, **kw)

    return jax.vmap(lambda *fr: multiscale_roi_align(list(fr[:-1]), fr[-1], strides, **kw))(
        *feats_batched, rois_batched
    )

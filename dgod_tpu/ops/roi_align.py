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


def multiscale_roi_align(
    feats: List[jnp.ndarray],  # per level [H_l, W_l, C], finest first
    rois: jnp.ndarray,  # [N, 4] xyxy in image frame
    strides: Sequence[int],  # stride per level (e.g. 4, 8, 16, 32)
    output_size: int = 7,
    sampling_ratio: int = 2,
    canonical_scale: float = 224.0,
    canonical_level: int = 4,
    chunk: int = 256,
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

        # sample coordinates [chunk, P, S]
        bins = jnp.arange(P, dtype=jnp.float32)
        sub = (jnp.arange(S, dtype=jnp.float32) + 0.5) / S
        ys = (
            y1[:, None, None]
            + bins[None, :, None] * bin_h[:, None, None]
            + sub[None, None, :] * bin_h[:, None, None]
        )  # [chunk, P, S]
        xs = (
            x1[:, None, None]
            + bins[None, :, None] * bin_w[:, None, None]
            + sub[None, None, :] * bin_w[:, None, None]
        )

        y_lo, y_hi, wy_lo, wy_hi, y_ok = _bilinear_params(ys, h_l[:, None, None])
        x_lo, x_hi, wx_lo, wx_hi, x_ok = _bilinear_params(xs, w_l[:, None, None])

        def flat(yi, xi):
            # [chunk, P, S] x [chunk, P, S] -> [chunk, P, S, P, S]
            return (
                off[:, None, None, None, None]
                + yi[:, :, :, None, None] * w_l[:, None, None, None, None]
                + xi[:, None, None, :, :]
            )

        def w2(a, b):
            return a[:, :, :, None, None] * b[:, None, None, :, :]

        ok = (y_ok[:, :, :, None, None] & x_ok[:, None, None, :, :]).astype(
            jnp.float32
        )
        acc = 0.0
        for yi, wy in ((y_lo, wy_lo), (y_hi, wy_hi)):
            for xi, wx in ((x_lo, wx_lo), (x_hi, wx_hi)):
                idx = flat(yi, xi).reshape(-1)
                vals = table[idx].reshape(*ok.shape, C).astype(jnp.float32)
                acc = acc + vals * (w2(wy, wx) * ok)[..., None]
        # mean over the S x S samples -> [chunk, P, P, C]
        return jnp.mean(
            acc.reshape(acc.shape[0], P, S, P, S, C), axis=(2, 4)
        )

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

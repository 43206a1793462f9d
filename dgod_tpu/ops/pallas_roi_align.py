"""Pallas TPU multi-scale RoIAlign — per-RoI window DMA + one MXU matmul.

TPU-native kernel for torchvision's C++/CUDA `roi_align` + MultiScaleRoIAlign
(reference fasterrcnn.py:29,278,413-416; 7x7, sampling_ratio 2,
aligned=False). Replaces the XLA gather formulation in ops/roi_align.py on
the FRCNN hot path, where the gather (~45 ms fwd / ~108 ms bwd f32 at train
shapes) is gather-engine bound, not HBM-bandwidth bound.

Key idea: RoIAlign output is LINEAR in the features and fully separable —
    pooled[py,px,c] = sum_{y,x} Wy[py,y] * Wx[px,x] * F[y,x,c]
where Wy/Wx fold the 2x2 sub-sample average AND the bilinear weights
(at most 4 nonzero cells per output bin per axis). So for each RoI:

  1. DMA a [TH, TW, C] window of the RoI's FPN level from HBM into VMEM
     (double-buffered across grid steps: the next RoI's first window is
     in flight while the current one computes).
  2. Build the combined weight matrix W2 [49, TH*TW] ELEMENTWISE on the
     VPU directly in its final layout (no reshapes/transposes — each
     entry is a closed-form function of its (bin, cell) index).
  3. pooled = W2 @ window  — one [49, TH*TW] x [TH*TW, C] MXU matmul.

Elongated RoIs that exceed one window are handled exactly by tiling the
sample-point bounding box with [TH, TW] windows and accumulating; the
FPN LevelMapper area bound (cells_y * cells_x < ~850 at the assigned
level) keeps the tile count small (1 for typical RoIs, <= ~12 for
degenerate sliver proposals).

Semantics match ops/roi_align.py (and torchvision aligned=False) exactly:
sample points outside [-1, size] contribute 0, coordinates clamp at 0 and
size-1, hi-index clamps at size-1 with frac forced to 0 at the edge, and
the FPN level is floor(4 + log2(sqrt(area)/224 + 1e-6)) clamped.
"""

from __future__ import annotations

import functools
import os
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# window tile (cells of the assigned FPN level). Default 16x32 won the
# real-chip shape sweep at production shapes (B=8, N=512, C=256, fwd+bwd,
# v5e): 16x32 = 23.3/29.2/31.0 ms across runs vs 32x32 = 37.1/35.6/34.9 ms
# (back-to-back A/B recorded 2026-08-18; 8x32=26.5, 16x24=29.7, 24x32=32.4,
# 16x40+/16x48 lost). Taller RoIs just take more vertical tiles — exactness
# is unaffected (LevelMapper guarantees span_y*span_x < ~850 cells).
def _parse_tile(env_name: str, default: "tuple[int, int]"):
    """Window shape from env ('HxW'), validated for Mosaic: W a multiple
    of 8 (DMA offsets along the sublane dim must stay 8-aligned), H a
    multiple of 8 (conservative). Env-tunable so the real-chip A/B can
    sweep shapes without code edits; defaults are the shipped config."""
    s = os.environ.get(env_name, "")
    if not s:
        return default
    h, w = (int(v) for v in s.lower().split("x"))
    assert h % 8 == 0 and w % 8 == 0 and h > 0 and w > 0, (env_name, s)
    return h, w


TH, TW = _parse_tile("DGOD_ROI_TILE", (16, 32))


def _parse_ring(env_name: str, default: "tuple[int, int]"):
    """Deep-backward ring config 'SLOTSxLEAD'. SLOTS VMEM window buffers,
    reads issued LEAD chain-tiles ahead of the consuming body. SLOTS >
    LEAD so a slot's previous write has (SLOTS - LEAD) body-times to
    drain before the slot is re-read — the 2-slot kernel's per-body
    write-drain stall is the latency this removes."""
    s = os.environ.get(env_name, "")
    if not s:
        return default
    slots, lead = (int(v) for v in s.lower().split("x"))
    assert slots > lead >= 1, (env_name, s)
    return slots, lead


DEEP_SLOTS, DEEP_LEAD = _parse_ring("DGOD_ROI_BWD_RING", (6, 3))
# deep-pipelined backward (issue-pointer ring), default ON after the
# recorded chip A/B (2026-08-20, check_pallas_roi_tpu.py, B=8 N=512
# bwd-only, back-to-back in one process): 2-slot 31.97 ms -> deep 6x3
# ring 12.78 ms (2.50x), parity exact to the 2-slot kernel's rel err.
DEEP_BWD = bool(int(os.environ.get("DGOD_ROI_BWD_DEEP", "1")))

FWD_SLOTS, FWD_LEAD = _parse_ring("DGOD_ROI_FWD_RING", (4, 3))
# deep-pipelined forward ring (reads only, so slots need only exceed lead
# by one: the slot's previous occupant was consumed by an earlier body
# than any eager issue of its reuser), default ON after the recorded chip
# A/B (2026-08-20, check_pallas_roi_tpu.py, B=8 N=512 fwd-only,
# back-to-back): 2-slot 8.72 ms -> deep 4x3 ring 5.48 ms (1.59x), parity
# exact.
DEEP_FWD = bool(int(os.environ.get("DGOD_ROI_FWD_DEEP", "1")))
# NOTE: a dual window-class variant ("split" kernels: small [16,16]-ish
# windows for RoIs whose sample span fits, full tile otherwise) was built
# and measured on-chip in round 3 — its predicted HBM-traffic win did not
# materialize (A/B deltas 0.82x-1.17x, tunnel-noise level; the backward is
# latency-bound on RMW handoffs, not bandwidth-bound) — so it was removed
# rather than kept as a second copy of this file's subtlest machinery.
# Sweep table and analysis: ROUND3.md.
P = 7  # output bins per axis
S = 2  # sampling_ratio


# debug: marks every backward handoff unsafe, i.e. each window's read
# strictly follows the previous window's write (no DMA/compute overlap)
_FORCE_SERIAL_BWD = bool(int(os.environ.get(
    "DGOD_ROI_ALIGN_SERIAL_BWD", "0")))


def _level_meta(rois, strides, sizes, padded, n_levels, b_idx=None,
                canonical_scale=224.0, canonical_level=4):
    """Vectorised per-RoI metadata (XLA side). rois [R,4] -> [14,R]/[4,R].

    Rows 0-9 feed all kernels (level, window origins/counts, chain base,
    level sizes); rows 10-13 (safe_next, alias_intra, image index,
    deep_safe) schedule the backward's pipelined read-modify-write."""
    area = jnp.clip((rois[:, 2] - rois[:, 0]) * (rois[:, 3] - rois[:, 1]), 0.0)
    k = jnp.floor(
        canonical_level + jnp.log2(jnp.sqrt(area) / canonical_scale + 1e-6)
    )
    k_min = int(np.round(np.log2(strides[0])))
    lvl = jnp.clip(k - k_min, 0, n_levels - 1).astype(jnp.int32)  # [R]

    scales = jnp.asarray([1.0 / s for s in strides], jnp.float32)[lvl]
    hs = jnp.asarray([s[0] for s in sizes], jnp.int32)[lvl]
    ws = jnp.asarray([s[1] for s in sizes], jnp.int32)[lvl]
    hps = jnp.asarray([s[0] for s in padded], jnp.int32)[lvl]
    wps = jnp.asarray([s[1] for s in padded], jnp.int32)[lvl]

    x1 = rois[:, 0] * scales
    y1 = rois[:, 1] * scales
    x2 = rois[:, 2] * scales
    y2 = rois[:, 3] * scales
    bin_w = jnp.maximum(x2 - x1, 1.0) / P
    bin_h = jnp.maximum(y2 - y1, 1.0) / P

    def axis_window(c1, bin_sz, size, padded_sz, tile, align=1):
        # first/last sample coords (samples are monotonically increasing)
        first = c1 + 0.25 * bin_sz
        last = c1 + 6.75 * bin_sz
        lo_min = jnp.minimum(
            jnp.floor(jnp.clip(first, 0.0)).astype(jnp.int32), size - 1
        )
        lo_last = jnp.minimum(
            jnp.floor(jnp.clip(last, 0.0)).astype(jnp.int32), size - 1
        )
        hi_max = jnp.minimum(lo_last + 1, size - 1)
        o = jnp.clip(lo_min, 0, padded_sz - tile)
        # Mosaic requires dynamic DMA offsets along the sublane (W) dim to
        # be 8-aligned; aligning down only widens coverage, and the tile
        # count below absorbs it
        o = (o // align) * align
        n_t = (hi_max - o) // tile + 1  # cdiv(hi_max - o + 1, tile)
        return o, n_t

    y0, n_ty = axis_window(y1, bin_h, hs, hps, TH)
    x0, n_tx = axis_window(x1, bin_w, ws, wps, TW, align=8)
    th, tw = TH, TW
    n_t = n_ty * n_tx
    # absolute chain index of each RoI's first tile; every kernel derives
    # its DMA slot as (base + t) % n_slots, and the deep backward also
    # needs the absolute position for its issue-pointer lookahead bound
    base = jnp.cumsum(n_t) - n_t

    if b_idx is None:
        b_idx = jnp.zeros((rois.shape[0],), jnp.int32)

    # backward scheduling flags.
    # safe_next[r]: RoI r+1's full window span cannot alias RoI r's (other
    # image, other level, or disjoint rects) -> its read may overlap r's
    # in-flight write. alias_intra[r]: the edge clamp
    # (origin = min(o + t*tile, padded - tile)) folded consecutive tiles of
    # RoI r onto each other -> serialize its intra-RoI handoffs.
    rows_lo = y0
    rows_hi = jnp.minimum(y0 + (n_ty - 1) * th, hps - th) + th
    cols_lo = x0
    cols_hi = jnp.minimum(x0 + (n_tx - 1) * tw, wps - tw) + tw
    ovl = (
        (b_idx[:-1] == b_idx[1:]) & (lvl[:-1] == lvl[1:])
        & (rows_lo[:-1] < rows_hi[1:]) & (rows_lo[1:] < rows_hi[:-1])
        & (cols_lo[:-1] < cols_hi[1:]) & (cols_lo[1:] < cols_hi[:-1])
    )
    safe = jnp.concatenate([~ovl, jnp.ones((1,), bool)]).astype(jnp.int32)
    alias_intra = (
        ((n_ty > 1) & (y0 + (n_ty - 1) * th > hps - th))
        | ((n_tx > 1) & (x0 + (n_tx - 1) * tw > wps - tw))
    ).astype(jnp.int32)
    # deep-backward per-RoI safety (row 13): the issue-pointer ring may
    # issue this RoI's reads up to DEEP_LEAD chain-tiles early iff its
    # window rect cannot alias any of the previous DEEP_SLOTS-1 RoIs'
    # rects (the writes that may still be in flight at read time) and its
    # own tiles were not edge-clamp folded. The production caller
    # interleaves RoIs across images, so with B >= DEEP_SLOTS this is
    # almost always true; unsafe RoIs serialize exactly (full drain).
    n_r = rois.shape[0]
    ovl_any = jnp.zeros((n_r,), bool)
    for kk in range(1, DEEP_SLOTS):
        o = (
            (b_idx[:-kk] == b_idx[kk:]) & (lvl[:-kk] == lvl[kk:])
            & (rows_lo[:-kk] < rows_hi[kk:]) & (rows_lo[kk:] < rows_hi[:-kk])
            & (cols_lo[:-kk] < cols_hi[kk:]) & (cols_lo[kk:] < cols_hi[:-kk])
        )
        ovl_any = ovl_any.at[kk:].set(ovl_any[kk:] | o)
    deep_safe = ((~ovl_any) & (alias_intra == 0)).astype(jnp.int32)

    if _FORCE_SERIAL_BWD:
        safe = jnp.zeros_like(safe)
        alias_intra = jnp.ones_like(alias_intra)
        deep_safe = jnp.zeros_like(deep_safe)

    # stacked [field, R]: SMEM pads the minor dim to 128 lanes, so the
    # minor dim must be R (typically a multiple of 128), not the field count
    meta_i = jnp.stack(
        [lvl, y0, x0, n_tx, n_t, base, hs, ws, hps, wps,
         safe, alias_intra, b_idx, deep_safe], axis=0
    ).astype(jnp.int32)  # [14, R]
    meta_f = jnp.stack([y1, x1, bin_h, bin_w], axis=0)  # [4, R]
    return meta_i, meta_f


def _axis_weight(shape, bin_idx, cell_abs, nominal0, span,
                 c1, bin_sz, size):
    """Folded bilinear+pool weight, elementwise on a [rows, cols] grid.

    bin_idx: [rows, cols] int (output bin along this axis, 0..6)
    cell_abs: absolute cell coordinate of this grid entry along the axis
    nominal0: scalar, first cell this tile is responsible for (coverage)
    """
    size_f = size.astype(jnp.float32)
    cov = (cell_abs >= nominal0) & (cell_abs < nominal0 + span)
    total = jnp.zeros(shape, jnp.float32)
    for d in (0, 1):  # the two sub-samples folded into each bin
        step = bin_idx.astype(jnp.float32) + (d + 0.5) / S
        coord = c1 + step * bin_sz
        ok = (coord >= -1.0) & (coord <= size_f)
        c = jnp.clip(coord, 0.0)
        lo = jnp.minimum(jnp.floor(c).astype(jnp.int32), size - 1)
        at_edge = lo >= size - 1
        frac = jnp.where(at_edge, 0.0, c - lo.astype(jnp.float32))
        hi = jnp.minimum(lo + 1, size - 1)
        w = (
            jnp.where(cell_abs == lo, 1.0 - frac, 0.0)
            + jnp.where(cell_abs == hi, frac, 0.0)
        )
        total = total + jnp.where(ok & cov, w, 0.0)
    return total * (1.0 / S)


def _build_w2(mi, mf, i, ty, tx, y_orig, x_orig, transpose=False,
              th=TH, tw=TW):
    """W2 [49, th*tw] (or its transpose built directly) for RoI i, tile
    (ty, tx). Entry [r, k]: r = py*7+px, k = wy*tw+wx (window-local)."""
    h = mi[6, i]
    w = mi[7, i]
    y1 = mf[0, i]
    x1 = mf[1, i]
    bin_h = mf[2, i]
    bin_w = mf[3, i]
    nom_y = mi[1, i] + ty * th
    nom_x = mi[2, i] + tx * tw

    if transpose:
        shape = (th * tw, 56)
        kk = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        rr = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    else:
        shape = (56, th * tw)
        rr = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        kk = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    py = rr // P
    px = rr % P
    wy_cell = y_orig + kk // tw
    wx_cell = x_orig + kk % tw
    wy = _axis_weight(shape, py, wy_cell, nom_y, th, y1, bin_h, h)
    wx = _axis_weight(shape, px, wx_cell, nom_x, tw, x1, bin_w, w)
    w2 = wy * wx
    return jnp.where(rr < P * P, w2, 0.0)  # rows 49..55 are padding


def _fwd_kernel(n_levels, n_rois, mi, mf, *args):
    level_refs = args[:n_levels]
    out_ref = args[n_levels]
    win = args[n_levels + 1]
    sems = args[n_levels + 2]

    i = pl.program_id(0)
    nsteps = pl.num_programs(0)

    def tile_origin(roi, t):
        n_tx = mi[3, roi]
        ty = t // n_tx
        tx = t % n_tx
        y_orig = jnp.minimum(mi[1, roi] + ty * TH, mi[8, roi] - TH)
        # x0, TW, and the padded width are all multiples of 8 (sublane
        # tiling), so the clamped origin is too; hint it for Mosaic
        x_orig = pl.multiple_of(
            jnp.minimum(mi[2, roi] + tx * TW, mi[9, roi] - TW), 8
        )
        return ty, tx, y_orig, x_orig

    def dma(roi, t, slot):
        """Async copy descriptor for RoI `roi`, tile `t`, buffer `slot`."""
        lvl = mi[0, roi]
        b = roi // n_rois
        _, _, y_orig, x_orig = tile_origin(roi, t)
        copies = [
            pltpu.make_async_copy(
                ref.at[b, pl.ds(y_orig, TH), pl.ds(x_orig, TW), :],
                win.at[slot],
                sems.at[slot],
            )
            for ref in level_refs
        ]
        return lvl, copies

    def start(roi, t, slot):
        lvl, copies = dma(roi, t, slot)
        for li, cp in enumerate(copies):
            @pl.when(lvl == li)
            def _():
                cp.start()

    def wait(roi, t, slot):
        lvl, copies = dma(roi, t, slot)
        for li, cp in enumerate(copies):
            @pl.when(lvl == li)
            def _():
                cp.wait()

    @pl.when(i == 0)
    def _():
        start(0, 0, 0)

    n_t = mi[4, i]
    slot0 = mi[5, i]
    out_ref[0] = jnp.zeros_like(out_ref[0])

    def body(t, _):
        slot = (slot0 + t) % 2
        wait(i, t, slot)
        # keep the pipeline primed: next tile of this RoI, else the next
        # RoI's first tile (its slot0 equals (slot+1)%2 by the cumsum)
        @pl.when(t + 1 < n_t)
        def _():
            start(i, t + 1, (slot + 1) % 2)

        @pl.when((t + 1 >= n_t) & (i + 1 < nsteps))
        def _():
            start(i + 1, 0, (slot + 1) % 2)

        ty, tx, y_orig, x_orig = tile_origin(i, t)
        w2 = _build_w2(mi, mf, i, ty, tx, y_orig, x_orig)
        fwin = win[slot].astype(jnp.float32).reshape(TH * TW, -1)
        out_ref[0] += jax.lax.dot(
            w2, fwin,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return 0

    jax.lax.fori_loop(0, n_t, body, 0)


def _fwd_kernel_deep(n_levels, n_rois, slots, lead, mi, mf, *args):
    """Deep-pipelined forward: issue-pointer ring over `slots` VMEM
    windows, reads issued `lead` chain-tiles ahead (the 2-slot kernel
    runs one ahead, so each body eats most of a DMA round trip when the
    per-tile compute is shorter than the read latency). Reads only — no
    write-drain or aliasing concerns; the issue pointer lives in SMEM
    scratch, which persists across the serial grid."""
    level_refs = args[:n_levels]
    out_ref = args[n_levels]
    win = args[n_levels + 1]
    sems = args[n_levels + 2]
    st = args[n_levels + 3]  # SMEM [4] i32: issued chain / roi / tile

    i = pl.program_id(0)
    nchains = mi[5, pl.num_programs(0) - 1] + mi[4, pl.num_programs(0) - 1]

    def tile_origin(roi, t):
        n_tx = mi[3, roi]
        ty = t // n_tx
        tx = t % n_tx
        y_orig = jnp.minimum(mi[1, roi] + ty * TH, mi[8, roi] - TH)
        x_orig = pl.multiple_of(
            jnp.minimum(mi[2, roi] + tx * TW, mi[9, roi] - TW), 8
        )
        return ty, tx, y_orig, x_orig

    def dma(roi, t, slot):
        lvl = mi[0, roi]
        b = roi // n_rois
        _, _, y_orig, x_orig = tile_origin(roi, t)
        copies = [
            pltpu.make_async_copy(
                ref.at[b, pl.ds(y_orig, TH), pl.ds(x_orig, TW), :],
                win.at[slot],
                sems.at[slot],
            )
            for ref in level_refs
        ]
        return lvl, copies

    def start(roi, t, slot):
        lvl, copies = dma(roi, t, slot)
        for li, cp in enumerate(copies):
            @pl.when(lvl == li)
            def _():
                cp.start()

    def wait(roi, t, slot):
        lvl, copies = dma(roi, t, slot)
        for li, cp in enumerate(copies):
            @pl.when(lvl == li)
            def _():
                cp.wait()

    def advance(roi, tile):
        last = tile + 1 >= mi[4, roi]
        return (jnp.where(last, roi + 1, roi),
                jnp.where(last, 0, tile + 1))

    def issue_next():
        x = st[0]
        start(st[1], st[2], x % slots)
        r2, t2 = advance(st[1], st[2])
        st[0] = x + 1
        st[1] = r2
        st[2] = t2

    @pl.when(i == 0)
    def _():
        for k in range(4):
            st[k] = 0

    base_i = mi[5, i]
    n_t = mi[4, i]
    out_ref[0] = jnp.zeros_like(out_ref[0])

    def body(t, _):
        g = base_i + t

        @pl.when(st[0] == g)
        def _():
            issue_next()

        wait(i, t, g % slots)

        for _k in range(lead):
            @pl.when((st[0] <= g + lead) & (st[0] < nchains))
            def _():
                issue_next()

        ty, tx, y_orig, x_orig = tile_origin(i, t)
        w2 = _build_w2(mi, mf, i, ty, tx, y_orig, x_orig)
        slot = g % slots
        fwin = win[slot].astype(jnp.float32).reshape(TH * TW, -1)
        out_ref[0] += jax.lax.dot(
            w2, fwin,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return 0

    jax.lax.fori_loop(0, n_t, body, 0)


def _bwd_kernel(n_levels, n_rois, mi, mf, g_ref, *args):
    """Pipelined read-modify-write scatter: grid over RoIs, per tile
    DMA-in the f32 grad window, accumulate W2^T @ g, DMA-out.

    The serial version's per-tile round trip (read latency + compute +
    write latency, ~7.5 us) is latency-bound, so the next window's read is
    issued BEFORE the current compute whenever the two windows cannot
    alias: same-RoI tiles are disjoint (unless the edge clamp folded them,
    mi alias_intra), and across RoIs the precomputed safe_next rect test
    decides — the caller additionally interleaves RoIs across images so
    adjacent RoIs rarely share an image at all. Only genuinely aliasing
    neighbours serialize read-after-write exactly."""
    # args: [grad_in x n_levels] [grad_out x n_levels] [gout] [win]
    # [rsem] [wsem]; grad_in aliases grad_out — all RMW via the out refs
    grad_refs = args[n_levels : 2 * n_levels]
    gout = args[2 * n_levels]
    win = args[2 * n_levels + 1]
    rsem = args[2 * n_levels + 2]
    wsem = args[2 * n_levels + 3]

    i = pl.program_id(0)
    nsteps = pl.num_programs(0)

    def tile_origin(roi, t):
        n_tx = mi[3, roi]
        ty = t // n_tx
        tx = t % n_tx
        y_orig = jnp.minimum(mi[1, roi] + ty * TH, mi[8, roi] - TH)
        x_orig = pl.multiple_of(
            jnp.minimum(mi[2, roi] + tx * TW, mi[9, roi] - TW), 8
        )
        return ty, tx, y_orig, x_orig

    def dma(roi, t, slot, to_hbm):
        lvl = mi[0, roi]
        b = mi[12, roi]
        _, _, y_orig, x_orig = tile_origin(roi, t)
        copies = []
        for ref in grad_refs:
            window = ref.at[b, pl.ds(y_orig, TH), pl.ds(x_orig, TW), :]
            if to_hbm:
                copies.append(
                    pltpu.make_async_copy(win.at[slot], window, wsem.at[slot])
                )
            else:
                copies.append(
                    pltpu.make_async_copy(window, win.at[slot], rsem.at[slot])
                )
        return lvl, copies

    def start(roi, t, slot, to_hbm):
        lvl, copies = dma(roi, t, slot, to_hbm)
        for li, cp in enumerate(copies):
            @pl.when(lvl == li)
            def _():
                cp.start()

    def wait(roi, t, slot, to_hbm):
        lvl, copies = dma(roi, t, slot, to_hbm)
        for li, cp in enumerate(copies):
            @pl.when(lvl == li)
            def _():
                cp.wait()

    @pl.when(i == 0)
    def _():
        start(0, 0, 0, False)

    n_t = mi[4, i]
    slot0 = mi[5, i]
    g = g_ref[0]  # [56, C] f32 (rows 49..55 zero-padded by caller)
    alias_intra = mi[11, i] > 0

    def body(t, _):
        slot = (slot0 + t) % 2
        wait(i, t, slot, False)

        # drain the write that used the OTHER slot (the previous tile)
        # before the next read overwrites that slot — unless the previous
        # handoff already waited it on its serialized path (a second wait
        # on the same semaphore would hang)
        prev_in_roi = t > 0
        proi = jnp.where(prev_in_roi, i, i - 1)
        pt = jnp.where(prev_in_roi, t - 1, mi[4, jnp.maximum(i - 1, 0)] - 1)
        prev_serialized = jnp.where(
            prev_in_roi, alias_intra, mi[10, jnp.maximum(i - 1, 0)] == 0
        )

        @pl.when(((i > 0) | (t > 0)) & ~prev_serialized)
        def _():
            wait(proi, pt, (slot + 1) % 2, True)

        have_next_tile = t + 1 < n_t
        have_next_roi = (t + 1 >= n_t) & (i + 1 < nsteps)
        safe_cross = mi[10, i] > 0

        # prefetch the next read before compute when it cannot alias this
        # tile's pending write
        @pl.when(have_next_tile & ~alias_intra)
        def _():
            start(i, t + 1, (slot + 1) % 2, False)

        @pl.when(have_next_roi & safe_cross)
        def _():
            start(i + 1, 0, (slot + 1) % 2, False)

        ty, tx, y_orig, x_orig = tile_origin(i, t)
        w2t = _build_w2(mi, mf, i, ty, tx, y_orig, x_orig, transpose=True)
        upd = jax.lax.dot(
            w2t, g,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [TH*TW, C]
        new = win[slot] + upd.reshape(TH, TW, -1)

        @pl.when(slot == 0)
        def _():
            win[0] = new

        @pl.when(slot == 1)
        def _():
            win[1] = new

        start(i, t, slot, True)

        # aliasing handoffs: the next read strictly follows this write
        @pl.when(have_next_tile & alias_intra)
        def _():
            wait(i, t, slot, True)
            start(i, t + 1, (slot + 1) % 2, False)

        @pl.when(have_next_roi & ~safe_cross)
        def _():
            wait(i, t, slot, True)
            start(i + 1, 0, (slot + 1) % 2, False)

        return 0

    jax.lax.fori_loop(0, n_t, body, 0)

    # the very last write must drain before the kernel retires
    @pl.when(i + 1 >= nsteps)
    def _():
        wait(i, n_t - 1, (slot0 + n_t - 1) % 2, True)

    # dummy tiny output so the kernel has a pipelined result (the real
    # output is written in place via input_output_aliases)
    gout[0] = jnp.zeros_like(gout[0])


def _bwd_kernel_deep(n_levels, n_rois, slots, lead, mi, mf, g_ref, *args):
    """Deep-pipelined RMW scatter: issue-pointer ring over `slots` VMEM
    windows, reads issued `lead` chain-tiles ahead of the consuming body.

    The 2-slot kernel (_bwd_kernel) drains the PREVIOUS tile's write at
    the top of every body — a write issued one body earlier, so each body
    stalls ~one DMA round trip (the latency-bound regime ROUND3.md
    measured). Here a slot's write is drained only when the slot is
    reused, (slots - lead) bodies later, and reads run `lead` bodies
    ahead; with slots = 2*lead both latencies amortize over `lead` body
    times. Scheduling state (issue / drain chain pointers) lives in SMEM
    scratch, which persists across the serial grid.

    Safety: a read issued early may overtake up to slots-1 preceding
    windows' writes, so it is only issued early when its RoI's window
    rect cannot alias any of its slots-1 predecessors (mi row 13,
    precomputed; the caller's cross-image interleave makes this the
    common case). Unsafe RoIs drain ALL outstanding writes before each
    read — exact serialization, same as the 2-slot unsafe path."""
    # args: [grad_in x n_levels] [grad_out x n_levels] [gout] [win]
    # [rsem] [wsem] [st]
    grad_refs = args[n_levels : 2 * n_levels]
    gout = args[2 * n_levels]
    win = args[2 * n_levels + 1]
    rsem = args[2 * n_levels + 2]
    wsem = args[2 * n_levels + 3]
    st = args[2 * n_levels + 4]  # SMEM [8] i32: issued chain/roi/tile,
    #                              drained chain/roi/tile, -, -

    i = pl.program_id(0)
    nsteps = pl.num_programs(0)
    nchains = mi[5, nsteps - 1] + mi[4, nsteps - 1]

    def tile_origin(roi, t):
        n_tx = mi[3, roi]
        ty = t // n_tx
        tx = t % n_tx
        y_orig = jnp.minimum(mi[1, roi] + ty * TH, mi[8, roi] - TH)
        x_orig = pl.multiple_of(
            jnp.minimum(mi[2, roi] + tx * TW, mi[9, roi] - TW), 8
        )
        return ty, tx, y_orig, x_orig

    def dma(roi, t, slot, to_hbm):
        lvl = mi[0, roi]
        b = mi[12, roi]
        _, _, y_orig, x_orig = tile_origin(roi, t)
        copies = []
        for ref in grad_refs:
            window = ref.at[b, pl.ds(y_orig, TH), pl.ds(x_orig, TW), :]
            if to_hbm:
                copies.append(
                    pltpu.make_async_copy(win.at[slot], window, wsem.at[slot])
                )
            else:
                copies.append(
                    pltpu.make_async_copy(window, win.at[slot], rsem.at[slot])
                )
        return lvl, copies

    def start(roi, t, slot, to_hbm):
        lvl, copies = dma(roi, t, slot, to_hbm)
        for li, cp in enumerate(copies):
            @pl.when(lvl == li)
            def _():
                cp.start()

    def wait(roi, t, slot, to_hbm):
        lvl, copies = dma(roi, t, slot, to_hbm)
        for li, cp in enumerate(copies):
            @pl.when(lvl == li)
            def _():
                cp.wait()

    def advance(roi, tile):
        last = tile + 1 >= mi[4, roi]
        return (jnp.where(last, roi + 1, roi),
                jnp.where(last, 0, tile + 1))

    def drain_to(target):
        """Wait every un-drained write with chain index < target."""
        def cond(c):
            return c[0] < target

        def body_fn(c):
            ch, r, t = c
            wait(r, t, ch % slots, True)
            r2, t2 = advance(r, t)
            return (ch + 1, r2, t2)

        ch, r, t = jax.lax.while_loop(
            cond, body_fn, (st[3], st[4], st[5])
        )
        st[3] = ch
        st[4] = r
        st[5] = t

    def issue_next():
        """Issue the read for chain tile st[0] (slot st[0] % slots),
        draining exactly enough writes first."""
        x = st[0]
        r = st[1]
        t = st[2]
        safe = mi[13, r] > 0

        @pl.when(safe)
        def _():
            # only the slot's previous occupant must have drained
            drain_to(x - (slots - 1))

        @pl.when(~safe)
        def _():
            # read may alias an outstanding write: drain them all (writes
            # < x have all been started — x's own body has not run yet)
            drain_to(x)

        start(r, t, x % slots, False)
        r2, t2 = advance(r, t)
        st[0] = x + 1
        st[1] = r2
        st[2] = t2

    @pl.when(i == 0)
    def _():
        for k in range(6):
            st[k] = 0

    base_i = mi[5, i]
    n_t = mi[4, i]
    g_l = g_ref[0]  # [56, C] f32

    def body(t, _):
        g = base_i + t

        # serialized RoIs reach here with their read not yet issued
        @pl.when(st[0] == g)
        def _():
            issue_next()

        wait(i, t, g % slots, False)

        # run the issue pointer ahead — one issue per body in steady
        # state, up to `lead` after a serialized stretch
        for _k in range(lead):
            @pl.when(
                (st[0] <= g + lead) & (st[0] < nchains)
                & (mi[13, jnp.minimum(st[1], nsteps - 1)] > 0)
            )
            def _():
                issue_next()

        ty, tx, y_orig, x_orig = tile_origin(i, t)
        w2t = _build_w2(mi, mf, i, ty, tx, y_orig, x_orig, transpose=True)
        upd = jax.lax.dot(
            w2t, g_l,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [TH*TW, C]
        slot = g % slots
        new_w = win[slot] + upd.reshape(TH, TW, -1)
        for s in range(slots):
            @pl.when(slot == s)
            def _(s=s):
                win[s] = new_w

        start(i, t, slot, True)
        return 0

    jax.lax.fori_loop(0, n_t, body, 0)

    # every outstanding write must drain before the kernel retires
    @pl.when(i + 1 >= nsteps)
    def _():
        drain_to(nchains)

    # dummy tiny output so the kernel has a pipelined result (the real
    # output is written in place via input_output_aliases)
    gout[0] = jnp.zeros_like(gout[0])


def _padded_size(h, w):
    # width padded to a multiple of 8 so every window origin/clamp along W
    # stays 8-aligned (Mosaic sublane tiling); both dims at least one tile
    return max(h, TH), max(-(-w // 8) * 8, TW)


def _pad_levels(feats, sizes):
    padded = []
    shapes = []
    for f, (h, w) in zip(feats, sizes):
        hp, wp = _padded_size(h, w)
        shapes.append((hp, wp))
        if (hp, wp) != (h, w):
            f = jnp.pad(f, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))
        padded.append(f)
    return padded, shapes


# scalar-prefetch metadata lives in SMEM (~1 MB): mi [14,R] i32 + mf [4,R]
# f32 is 72 B/RoI, so cap the per-call RoI count and chunk above it
# (train path: 8x512 = 4096; eval: 8x1000 = 8000 — both single-chunk)
MAX_ROIS_PER_CALL = 8192


@functools.partial(
    jax.jit, static_argnames=("strides", "interpret", "deep"))
def _roi_align_fwd(feats, rois, strides, interpret=False, deep=None):
    """feats: tuple of [B,H,W,C] (finest first); rois [B,N,4] ->
    pooled [B,N,7,7,C] f32."""
    if deep is None:
        deep = DEEP_FWD
    n_levels = len(feats)
    B, N = rois.shape[:2]
    if B * N > MAX_ROIS_PER_CALL:
        nc = max(1, MAX_ROIS_PER_CALL // B)
        parts = [
            _roi_align_fwd(feats, rois[:, s : s + nc], strides, interpret,
                           deep)
            for s in range(0, N, nc)
        ]
        return jnp.concatenate(parts, axis=1)
    C = feats[0].shape[-1]
    sizes = [(f.shape[1], f.shape[2]) for f in feats]
    fpad, psizes = _pad_levels(feats, sizes)

    flat = rois.reshape(B * N, 4)
    mi, mf = _level_meta(flat, strides, sizes, psizes, n_levels)

    if deep:
        kernel = functools.partial(
            _fwd_kernel_deep, n_levels, N, FWD_SLOTS, FWD_LEAD
        )
        scratch = [pltpu.VMEM((FWD_SLOTS, TH, TW, C), feats[0].dtype),
                   pltpu.SemaphoreType.DMA((FWD_SLOTS,)),
                   pltpu.SMEM((4,), jnp.int32)]
    else:
        kernel = functools.partial(_fwd_kernel, n_levels, N)
        scratch = [pltpu.VMEM((2, TH, TW, C), feats[0].dtype),
                   pltpu.SemaphoreType.DMA((2,))]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B * N,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_levels,
        out_specs=pl.BlockSpec(
            (1, 56, C), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=scratch,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B * N, 56, C), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(mi, mf, *fpad)
    return out[:, : P * P].reshape(B, N, P, P, C)


@functools.partial(
    jax.jit, static_argnames=("strides", "interpret", "deep"))
def _roi_align_bwd(feats, rois, g, strides, interpret=False, deep=None):
    """g [B,N,7,7,C] f32 -> per-level grads matching feats shapes/dtypes."""
    if deep is None:
        deep = DEEP_BWD
    n_levels = len(feats)
    B, N = rois.shape[:2]
    if B * N > MAX_ROIS_PER_CALL:
        nc = max(1, MAX_ROIS_PER_CALL // B)
        total = None
        for s in range(0, N, nc):
            part = _roi_align_bwd(
                feats, rois[:, s : s + nc], g[:, s : s + nc], strides,
                interpret, deep,
            )
            total = part if total is None else tuple(
                a + b for a, b in zip(total, part)
            )
        return total
    C = feats[0].shape[-1]
    sizes = [(f.shape[1], f.shape[2]) for f in feats]
    psizes = [_padded_size(h, w) for h, w in sizes]

    # interleave RoIs across images: training RoIs cluster around objects,
    # so same-image neighbours often alias and would serialize the RMW
    # pipeline; after interleaving, adjacent RoIs come from different
    # images (B >= 2) and nearly every handoff is provably safe. The grad
    # output is accumulation-order invariant (up to f32 rounding).
    jj = jnp.arange(B * N)
    perm = (jj % B) * N + (jj // B)
    flat = rois.reshape(B * N, 4)[perm]
    b_idx = (jj % B).astype(jnp.int32)
    mi, mf = _level_meta(flat, strides, sizes, psizes, n_levels, b_idx)

    gflat = g.reshape(B * N, P * P, C).astype(jnp.float32)[perm]
    gflat = jnp.pad(gflat, ((0, 0), (0, 56 - P * P), (0, 0)))

    grad_init = [
        jnp.zeros((B, hp, wp, C), jnp.float32) for hp, wp in psizes
    ]

    if deep:
        n_slots = DEEP_SLOTS
        kernel = functools.partial(
            _bwd_kernel_deep, n_levels, N, DEEP_SLOTS, DEEP_LEAD
        )
        scratch = [
            pltpu.VMEM((n_slots, TH, TW, C), jnp.float32),
            pltpu.SemaphoreType.DMA((n_slots,)),
            pltpu.SemaphoreType.DMA((n_slots,)),
            pltpu.SMEM((8,), jnp.int32),
        ]
    else:
        kernel = functools.partial(_bwd_kernel, n_levels, N)
        scratch = [
            pltpu.VMEM((2, TH, TW, C), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B * N,),
        in_specs=[
            pl.BlockSpec(
                (1, 56, C), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            )
        ]
        + [pl.BlockSpec(memory_space=pl.ANY)] * n_levels,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_levels
        + [
            pl.BlockSpec(
                (1, 8, 128), lambda i, *_: (0, 0, 0), memory_space=pltpu.VMEM
            )
        ],
        scratch_shapes=scratch,
    )
    outs = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((B, hp, wp, C), jnp.float32)
            for hp, wp in psizes
        ]
        + [jax.ShapeDtypeStruct((1, 8, 128), jnp.float32)],
        grid_spec=grid_spec,
        input_output_aliases={3 + l: l for l in range(n_levels)},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(mi, mf, gflat, *grad_init)
    grads = outs[:n_levels]
    # un-pad and cast back to the feature dtype
    out = []
    for gr, f, (h, w) in zip(grads, feats, sizes):
        out.append(gr[:, :h, :w, :].astype(f.dtype))
    return tuple(out)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def batched_roi_align_tpu(feats, rois, strides, interpret=False):
    """Multi-scale RoIAlign, batched: feats tuple of [B,H,W,C] (finest
    first), rois [B,N,4] image-frame xyxy -> [B,N,7,7,C] f32.

    Exact torchvision MultiScaleRoIAlign semantics (aligned=False,
    sampling_ratio 2; reference fasterrcnn.py:413-416)."""
    return _roi_align_fwd(tuple(feats), rois, strides, interpret)


def _vjp_fwd(feats, rois, strides, interpret):
    out = _roi_align_fwd(tuple(feats), rois, strides, interpret)
    return out, (tuple(feats), rois)


def _vjp_bwd(strides, interpret, res, g):
    feats, rois = res
    df = _roi_align_bwd(feats, rois, g, strides, interpret)
    return df, jnp.zeros_like(rois)


batched_roi_align_tpu.defvjp(_vjp_fwd, _vjp_bwd)

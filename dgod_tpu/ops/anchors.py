"""Anchor / point grid generation — vectorised, computed once per image size.

TPU-first: grids are pure functions of *static* feature-map shapes, so they
are constant-folded by XLA inside the jitted step (no per-step host work,
unlike the reference's per-forward AnchorGenerator at fasterrcnn.py:166 and
fcos.py:682).

Parity:
- RPN anchors: sizes (32,64,128,256,512) x aspect (0.5,1,2) per FPN level
  (reference fasterrcnn.py:393-397), torchvision cell-anchor rounding.
- FCOS "anchors": one unit box of side == stride per location
  (reference fcos.py:467-471), centred at (stride/2 + x*stride, ...).
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import numpy as np

Shape2D = Tuple[int, int]


def cell_anchors(sizes: Sequence[float], aspect_ratios: Sequence[float]) -> np.ndarray:
    """Zero-centred anchors for one level (torchvision generate_anchors).

    Returns [len(sizes)*len(aspect_ratios), 4] xyxy, rounded like torchvision.
    """
    scales = np.asarray(sizes, dtype=np.float32)
    ratios = np.asarray(aspect_ratios, dtype=np.float32)
    h_ratios = np.sqrt(ratios)
    w_ratios = 1.0 / h_ratios
    ws = (w_ratios[:, None] * scales[None, :]).reshape(-1)
    hs = (h_ratios[:, None] * scales[None, :]).reshape(-1)
    base = np.stack([-ws, -hs, ws, hs], axis=1) / 2.0
    return np.round(base)


def grid_anchors(
    feat_shape: Shape2D, stride: Shape2D, cell: np.ndarray
) -> np.ndarray:
    """Anchors for one level. -> [H*W*A, 4] float32 (anchor-major per cell).

    Ordering matches torchvision: row-major over (y, x), A anchors per cell.
    """
    fh, fw = feat_shape
    sy, sx = stride
    shifts_x = np.arange(fw, dtype=np.float32) * sx
    shifts_y = np.arange(fh, dtype=np.float32) * sy
    sx_grid, sy_grid = np.meshgrid(shifts_x, shifts_y)  # [fh, fw]
    shifts = np.stack(
        [sx_grid.ravel(), sy_grid.ravel(), sx_grid.ravel(), sy_grid.ravel()], axis=1
    )  # [H*W, 4]
    anchors = shifts[:, None, :] + cell[None, :, :]  # [H*W, A, 4]
    return anchors.reshape(-1, 4).astype(np.float32)


def rpn_anchors(
    feat_shapes: Sequence[Shape2D],
    image_shape: Shape2D,
    sizes: Sequence[Sequence[float]] = ((32,), (64,), (128,), (256,), (512,)),
    aspect_ratios: Sequence[float] = (0.5, 1.0, 2.0),
) -> Tuple[np.ndarray, list[int]]:
    """All-level RPN anchors for one (padded) image.

    Returns (anchors [sum(H*W*A), 4], anchors_per_level list).
    Strides derived from image/feature sizes like torchvision AnchorGenerator.
    """
    ih, iw = image_shape
    all_anchors = []
    counts = []
    for (fh, fw), level_sizes in zip(feat_shapes, sizes):
        stride = (ih // fh, iw // fw)
        cell = cell_anchors(level_sizes, aspect_ratios)
        a = grid_anchors((fh, fw), stride, cell)
        all_anchors.append(a)
        counts.append(a.shape[0])
    return np.concatenate(all_anchors, axis=0), counts


def fcos_anchors(
    feat_shapes: Sequence[Shape2D],
    image_shape: Shape2D,
    sizes: Sequence[float] = (8, 16, 32, 64, 128),
) -> Tuple[np.ndarray, list[int]]:
    """FCOS per-location unit anchors over P3..P7.

    Each location gets one box of side `sizes[level]` (== the level stride),
    centred at the cell origin shift (torchvision places the box corners at
    shift +/- size/2 with zero-centred cell anchor [-s/2,-s/2,s/2,s/2],
    rounded). Returns (anchors [sum(HW), 4], per-level counts).
    """
    ih, iw = image_shape
    all_anchors = []
    counts = []
    for (fh, fw), size in zip(feat_shapes, sizes):
        stride = (ih // fh, iw // fw)
        cell = cell_anchors([size], [1.0])  # [1, 4]
        a = grid_anchors((fh, fw), stride, cell)
        all_anchors.append(a)
        counts.append(a.shape[0])
    return np.concatenate(all_anchors, axis=0), counts


def fpn_feat_shapes(
    image_shape: Shape2D, strides: Sequence[int]
) -> list[Shape2D]:
    """Feature shapes produced by a stride-2 conv pyramid on `image_shape`.

    Matches torch's conv arithmetic: each stride-2 stage maps H -> ceil(H/2),
    so at stride s the shape is ceil(H / s) elementwise.
    """
    ih, iw = image_shape
    return [
        (int(math.ceil(ih / s)), int(math.ceil(iw / s))) for s in strides
    ]

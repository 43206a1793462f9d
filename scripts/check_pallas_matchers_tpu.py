#!/usr/bin/env python3
"""Real-TPU check for the Pallas matcher kernels: Mosaic lowering, exact
agreement with the XLA matchers, and an A/B timing at train shapes.

This is the hardware gate the round-2 kernels shipped without (they passed
interpret-mode tests but failed Mosaic lowering for B > 1). Rules:
- run this BEFORE any commit that changes matcher dispatch defaults or the
  kernels themselves;
- the kernels stay opt-in (DGOD_MATCHER=pallas) unless the A/B printed
  here shows them beating the XLA path at these shapes.

Shapes = the FRCNN/FCOS train configuration: B=8, canvas 608x1216,
MAX_GT=128 -> FRCNN R=184,680 anchors (P2-P6 x3 aspects), FCOS R=15,402
points (P3-P7).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from dgod_tpu.ops import boxes as box_ops  # noqa: E402
from dgod_tpu.ops import matchers as M  # noqa: E402
from dgod_tpu.ops import pallas_matchers as PM  # noqa: E402
from dgod_tpu.utils.timing import (  # noqa: E402
    calibrate_roundtrip, time_scalar_fn)

B, G = 8, 128
CANVAS = (608, 1216)


def make_gt(rng, span=(1100, 500)):
    boxes = np.zeros((B, G, 4), np.float32)
    valid = np.zeros((B, G), bool)
    for b in range(B):
        n = 0 if b == 0 else rng.randint(1, G + 1)  # image 0: empty GT
        xy = rng.uniform([0, 0], span, (n, 2))
        wh = rng.uniform(5, 300, (n, 2))
        boxes[b, :n] = np.concatenate([xy, xy + wh], 1)
        valid[b, :n] = True
    # duplicate box -> IoU tie exercises the low-quality-rescue equality path
    boxes[1, 1] = boxes[1, 0]
    return jnp.asarray(boxes), jnp.asarray(valid)


_RT = None  # calibrated per-call tunnel round-trip (ms)


def timeit(fn, *args, n=20):
    # tunnel-safe sync per dgod_tpu/utils/timing.py: reduce to a scalar
    # inside jit, fetch it per call, subtract the calibrated round-trip
    global _RT
    if _RT is None:
        _RT = calibrate_roundtrip()
    wrapped = jax.jit(
        lambda *a: sum(
            v.astype(jnp.float32).sum()
            for v in jax.tree_util.tree_leaves(fn(*a))
        )
    )
    return time_scalar_fn(wrapped, *args, n=n, roundtrip_ms=_RT)


def xla_iou_match(gt_b, gt_v, anchors, hi, lo, allow):
    def per_image(b, v):
        return M.iou_match(box_ops.box_iou(b, anchors), v, hi, lo, allow)

    return jax.vmap(per_image)(gt_b, gt_v)


def main():
    assert jax.default_backend() == "tpu", "run on the real chip"
    rng = np.random.RandomState(0)

    # ---- FRCNN RPN anchors -------------------------------------------------
    from dgod_tpu.models.faster_rcnn import FRCNNDetector

    det = FRCNNDetector(canvas=CANVAS)
    anchors = jnp.asarray(det.anchors)
    R = anchors.shape[0]
    print(f"iou_match: B={B} G={G} R={R}")
    gt_b, gt_v = make_gt(rng)

    ref = np.asarray(jax.jit(
        lambda b, v: xla_iou_match(b, v, anchors, 0.7, 0.3, True)
    )(gt_b, gt_v))
    got = np.asarray(PM.iou_match_tpu(gt_b, gt_v, anchors, 0.7, 0.3, True))
    n_diff = int((ref != got).sum())
    print(f"iou_match mismatches: {n_diff} / {ref.size}")
    assert n_diff == 0, "iou_match_tpu disagrees with XLA matcher"

    t_pallas = timeit(
        lambda b, v: PM.iou_match_tpu(b, v, anchors, 0.7, 0.3, True),
        gt_b, gt_v)
    t_xla = timeit(
        jax.jit(lambda b, v: xla_iou_match(b, v, anchors, 0.7, 0.3, True)),
        gt_b, gt_v)
    print(f"iou_match A/B: pallas {t_pallas:.2f} ms vs xla {t_xla:.2f} ms")

    # ---- FCOS points -------------------------------------------------------
    from dgod_tpu.models.fcos import fcos_anchors_for

    pts, counts = fcos_anchors_for(CANVAS)
    pts = jnp.asarray(pts)
    print(f"fcos_match: B={B} G={G} R={pts.shape[0]}")
    gt_b2, gt_v2 = make_gt(rng)

    for exact in (False, True):
        ref = np.asarray(jax.jit(jax.vmap(
            lambda b, v: M.fcos_match(
                pts, b, v, counts, center_sampling_radius=1.5,
                exact_reference_area=exact)
        ))(gt_b2, gt_v2))
        got = np.asarray(
            PM.fcos_match_tpu(pts, gt_b2, gt_v2, counts, 1.5, exact))
        n_diff = int((ref != got).sum())
        print(f"fcos_match(exact_area={exact}) mismatches: {n_diff} / {ref.size}")
        assert n_diff == 0, "fcos_match_tpu disagrees with XLA matcher"

    t_pallas = timeit(
        lambda b, v: PM.fcos_match_tpu(pts, b, v, counts, 1.5, False),
        gt_b2, gt_v2)
    t_xla = timeit(
        jax.jit(jax.vmap(
            lambda b, v: M.fcos_match(pts, b, v, counts, 1.5))),
        gt_b2, gt_v2)
    print(f"fcos_match A/B: pallas {t_pallas:.2f} ms vs xla {t_xla:.2f} ms")
    print("PASS")


if __name__ == "__main__":
    main()

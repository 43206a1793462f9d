"""Real-chip parity + A/B timing for the fused Pallas proposal kernel.

Compares ops/pallas_proposals.fused_decode_nms against the XLA chain
(delta_decode -> clip -> small-mask -> nms_mask_blocked) at the production
RPN shapes: batch 8, the five FRCNN levels' top-k sizes at 608x1216
(K = 2000, 2000, 2000, 2000, 570), iou 0.7.

Run: python scripts/check_pallas_proposals_tpu.py
PASS = exact keep-mask parity on every level + the timing table; the
recorded winner decides generate_proposals' default (DGOD_PROPOSAL_NMS).
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dgod_tpu.ops import boxes as box_ops  # noqa: E402
from dgod_tpu.ops import nms as nms_ops  # noqa: E402
from dgod_tpu.ops.pallas_proposals import fused_decode_nms  # noqa: E402

B = 8
LEVEL_KS = [2000, 2000, 2000, 2000, 570]
THR = 0.7
HW = (608.0, 1216.0)


def make_inputs(rng, k):
    """Clustered proposals: top-k RPN candidates pile onto a few objects
    (high mutual overlap, ~80-95% suppression) — the regime real NMS work
    lives in; uniform random boxes barely overlap and make NMS trivially
    cheap for any implementation."""
    h, w = HW
    n_obj = 24
    ocx = rng.uniform(0, w, (B, 1, n_obj))
    ocy = rng.uniform(0, h, (B, 1, n_obj))
    which = rng.randint(0, n_obj, (B, k))
    take = np.take_along_axis
    cx = take(ocx[:, 0], which, 1) + rng.randn(B, k) * 20
    cy = take(ocy[:, 0], which, 1) + rng.randn(B, k) * 12
    aw = rng.uniform(40, 180, (B, k))
    ah = rng.uniform(30, 120, (B, k))
    anchors = np.stack([cx - aw / 2, cy - ah / 2, cx + aw / 2, cy + ah / 2],
                       axis=-1).astype(np.float32)
    deltas = (0.1 * rng.randn(B, k, 4)).astype(np.float32)
    scores = -np.sort(-rng.randn(B, k).astype(np.float32), axis=1)
    sizes = np.tile(np.float32(HW), (B, 1))
    return (jnp.asarray(deltas), jnp.asarray(anchors), jnp.asarray(scores),
            jnp.asarray(sizes))


@jax.jit
def xla_chain(deltas, anchors, scores, sizes):
    def per_image(dl, anc, sc, size):
        boxes = box_ops.delta_decode(dl, anc)
        boxes = box_ops.clip_boxes(boxes, size[0], size[1])
        ok = box_ops.small_box_mask(boxes, 1e-3)
        keep = nms_ops.nms_mask_blocked(boxes, sc, ok, THR)
        return boxes, keep

    return jax.vmap(per_image)(deltas, anchors, scores, sizes)


def main():
    from dgod_tpu.utils.timing import calibrate_roundtrip, time_scalar_fn

    assert jax.devices()[0].platform == "tpu", jax.devices()
    print(f"device: {jax.devices()[0]}", flush=True)
    rt = calibrate_roundtrip()
    print(f"tunnel roundtrip: {rt:.2f} ms (subtracted)", flush=True)

    @jax.jit
    def xla_scalar(*a):
        boxes, keep = xla_chain(*a)
        return jnp.sum(boxes) + jnp.sum(keep.astype(jnp.float32))

    @jax.jit
    def pal_scalar(*a):
        boxes, keep = fused_decode_nms(*a, iou_threshold=THR)
        return jnp.sum(boxes) + jnp.sum(keep.astype(jnp.float32))

    total_p = total_x = 0.0
    for k in LEVEL_KS:
        rng = np.random.RandomState(k)
        args = make_inputs(rng, k)
        boxes_x, keep_x = xla_chain(*args)
        boxes_p, keep_p = fused_decode_nms(*args, iou_threshold=THR)
        keep_x, keep_p = np.asarray(keep_x), np.asarray(keep_p)
        same = (keep_x == keep_p).all()
        np.testing.assert_allclose(np.asarray(boxes_p), np.asarray(boxes_x),
                                   rtol=1e-5, atol=1e-2)
        ms_x = time_scalar_fn(xla_scalar, *args, n=30, roundtrip_ms=rt)
        ms_p = time_scalar_fn(pal_scalar, *args, n=30, roundtrip_ms=rt)
        total_p += ms_p
        total_x += ms_x
        kept = int(keep_p.sum())
        print(f"K={k:5d}: parity={'EXACT' if same else 'MISMATCH'} "
              f"kept={kept:5d}  xla {ms_x:7.3f} ms  pallas {ms_p:7.3f} ms "
              f"({ms_x / max(ms_p, 1e-9):.2f}x)", flush=True)
        assert same, f"keep-mask mismatch at K={k}"
    print(f"TOTAL (5 levels, batch {B}): xla {total_x:.3f} ms  "
          f"pallas {total_p:.3f} ms ({total_x / max(total_p, 1e-9):.2f}x)")
    print("PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Pallas matcher kernels vs the XLA reference matchers (interpret mode).

The XLA matchers are themselves parity-tested against torchvision
semantics in test_matchers.py; here the kernels must agree exactly,
including value ties, empty-GT images, the low-quality rescue, and the
FCOS area-quirk flag.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dgod_tpu.ops import boxes as box_ops
from dgod_tpu.ops import matchers as M
from dgod_tpu.ops import pallas_matchers as PM


def _gt_batch(rng, B, G, span=(400, 200)):
    boxes = np.zeros((B, G, 4), np.float32)
    valid = np.zeros((B, G), bool)
    for b in range(B):
        n = rng.randint(0, G + 1) if b else 0  # image 0: empty GT
        xy = rng.uniform([0, 0], span, (n, 2))
        wh = rng.uniform(5, 120, (n, 2))
        boxes[b, :n] = np.concatenate([xy, xy + wh], 1)
        valid[b, :n] = True
    return jnp.asarray(boxes), jnp.asarray(valid)


def _xla_iou_match(gt_b, gt_v, anchors, hi, lo, allow):
    def per_image(b, v):
        return M.iou_match(box_ops.box_iou(b, anchors), v, hi, lo, allow)

    return jax.vmap(per_image)(gt_b, gt_v)


@pytest.mark.parametrize("allow", [True, False])
def test_iou_match_kernel_matches_xla(allow, monkeypatch):
    monkeypatch.setattr(PM, "TILE", 256)  # force multiple tiles + padding
    rng = np.random.RandomState(0)
    R = 700  # not a TILE multiple
    xy = rng.uniform(0, 380, (R, 2)).astype(np.float32)
    wh = rng.uniform(8, 96, (R, 2)).astype(np.float32)
    anchors = jnp.asarray(np.concatenate([xy, xy + wh], 1))
    gt_b, gt_v = _gt_batch(rng, B=3, G=16)
    # exact duplicate boxes -> IoU ties exercise the rescue equality path
    gt_b = gt_b.at[1, 1].set(gt_b[1, 0])

    ref = np.asarray(_xla_iou_match(gt_b, gt_v, anchors, 0.7, 0.3, allow))
    got = np.asarray(
        PM.iou_match_tpu(gt_b, gt_v, anchors, 0.7, 0.3, allow,
                         interpret=True)
    )
    np.testing.assert_array_equal(ref, got)


def test_iou_match_kernel_all_background_on_empty_gt(monkeypatch):
    monkeypatch.setattr(PM, "TILE", 128)
    rng = np.random.RandomState(1)
    xy = rng.uniform(0, 200, (130, 2)).astype(np.float32)
    anchors = jnp.asarray(np.concatenate([xy, xy + 20], 1))
    gt_b = jnp.zeros((2, 8, 4))
    gt_v = jnp.zeros((2, 8), bool)
    got = np.asarray(
        PM.iou_match_tpu(gt_b, gt_v, anchors, 0.7, 0.3, True,
                         interpret=True)
    )
    assert (got == M.BELOW_LOW).all()


@pytest.mark.parametrize("exact_area", [False, True])
def test_fcos_match_kernel_matches_xla(exact_area, monkeypatch):
    monkeypatch.setattr(PM, "TILE", 256)
    rng = np.random.RandomState(2)
    from dgod_tpu.models.fcos import fcos_anchors_for

    anchors_np, counts = fcos_anchors_for((64, 128))
    anchors = jnp.asarray(anchors_np)
    gt_b, gt_v = _gt_batch(rng, B=3, G=12, span=(100, 50))

    ref = np.asarray(jax.vmap(
        lambda b, v: M.fcos_match(
            anchors, b, v, counts, center_sampling_radius=1.5,
            exact_reference_area=exact_area,
        )
    )(gt_b, gt_v))
    got = np.asarray(
        PM.fcos_match_tpu(anchors, gt_b, gt_v, counts, 1.5, exact_area,
                          interpret=True)
    )
    np.testing.assert_array_equal(ref, got)


@pytest.mark.parametrize(
    "env,backend,expect_iou,expect_fcos",
    [
        ("", "tpu", True, False),     # measured defaults: iou on, fcos off
        ("", "cpu", False, False),    # Mosaic can't lower off-TPU
        ("", "gpu", False, False),
        ("pallas", "tpu", True, True),
        ("pallas", "cpu", False, False),  # opt-in still TPU-only
        ("xla", "tpu", False, False),     # full escape hatch
    ],
)
def test_use_pallas_gating(monkeypatch, env, backend, expect_iou, expect_fcos):
    if env:
        monkeypatch.setenv("DGOD_MATCHER", env)
    else:
        monkeypatch.delenv("DGOD_MATCHER", raising=False)
    monkeypatch.setattr(M.jax, "default_backend", lambda: backend)
    assert M._use_pallas(default_on=True) is expect_iou
    assert M._use_pallas(default_on=False) is expect_fcos


def test_batched_dispatchers_fall_back_on_cpu():
    """On the CPU test backend the dispatchers must take the XLA path and
    agree with the per-image reference implementations."""
    rng = np.random.RandomState(3)
    xy = rng.uniform(0, 200, (96, 2)).astype(np.float32)
    anchors = jnp.asarray(np.concatenate([xy, xy + 25], 1))
    gt_b, gt_v = _gt_batch(rng, B=2, G=8, span=(180, 180))

    ref = np.asarray(_xla_iou_match(gt_b, gt_v, anchors, 0.6, 0.4, True))
    got = np.asarray(M.match_anchors_batched(gt_b, gt_v, anchors, 0.6, 0.4,
                                             True))
    np.testing.assert_array_equal(ref, got)

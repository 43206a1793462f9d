"""Pallas RoIAlign kernel vs the XLA gather reference path.

The XLA path (ops/roi_align.py) is itself analytically tested against
torchvision semantics in test_roi_align.py; here the Pallas kernel
(interpret mode on CPU) must match it bit-tightly, forward and backward,
including the static-shape edge cases: degenerate RoIs, wide/tall sliver
RoIs spanning multiple window tiles, and out-of-bounds boxes.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dgod_tpu.ops.roi_align import multiscale_roi_align
from dgod_tpu.ops.pallas_roi_align import batched_roi_align_tpu

STRIDES = (4, 8, 16, 32)
CANVAS = (128, 256)


def _feats(rng, B, C, dtype=jnp.float32):
    return tuple(
        jnp.asarray(
            rng.randn(B, CANVAS[0] // s, CANVAS[1] // s, C), dtype
        )
        for s in STRIDES
    )


def _rois(rng, B, N):
    rois = np.zeros((B, N, 4), np.float32)
    specials = [
        [0, 0, 0, 0],              # degenerate
        [0, 0, 255, 3],            # wide sliver (multi x-tile)
        [5, 0, 8, 127],            # tall sliver (multi y-tile)
        [-10, -10, 300, 300],      # exceeds image, coarsest level
        [250, 120, 258, 130],      # touches border
    ]
    for b in range(B):
        for i in range(N):
            if i < len(specials):
                rois[b, i] = specials[i]
            else:
                x1, y1 = rng.uniform(0, 200), rng.uniform(0, 100)
                w, h = rng.uniform(2, 120), rng.uniform(2, 80)
                rois[b, i] = [x1, y1, x1 + w, y1 + h]
    return jnp.asarray(rois)


def _xla_ref(feats, rois):
    return jax.vmap(
        lambda f0, f1, f2, f3, r: multiscale_roi_align(
            [f0, f1, f2, f3], r, STRIDES
        )
    )(*feats, rois)


def test_forward_matches_xla_path():
    rng = np.random.RandomState(0)
    feats = _feats(rng, B=2, C=32)
    rois = _rois(rng, B=2, N=16)
    ref = _xla_ref(feats, rois)
    got = batched_roi_align_tpu(feats, rois, STRIDES, True)
    assert got.shape == ref.shape
    assert float(jnp.max(jnp.abs(ref - got))) < 1e-3


def test_backward_matches_xla_vjp():
    rng = np.random.RandomState(1)
    feats = _feats(rng, B=1, C=32)
    rois = _rois(rng, B=1, N=12)
    g = jnp.asarray(rng.randn(1, 12, 7, 7, 32), jnp.float32)

    _, vjp_ref = jax.vjp(lambda fs: _xla_ref(fs, rois), feats)
    (dref,) = vjp_ref(g)
    _, vjp_got = jax.vjp(
        lambda fs: batched_roi_align_tpu(fs, rois, STRIDES, True), feats
    )
    (dgot,) = vjp_got(g)
    for lvl, (a, b) in enumerate(zip(dref, dgot)):
        scale = float(jnp.max(jnp.abs(a))) + 1e-9
        assert float(jnp.max(jnp.abs(a - b))) / scale < 1e-3, f"lvl{lvl}"


def test_bfloat16_features():
    rng = np.random.RandomState(2)
    feats = _feats(rng, B=1, C=32, dtype=jnp.bfloat16)
    rois = _rois(rng, B=1, N=8)
    ref = _xla_ref(feats, rois)
    got = batched_roi_align_tpu(feats, rois, STRIDES, True)
    assert got.dtype == jnp.float32
    # bf16 inputs: tolerance scaled to bf16 resolution
    assert float(jnp.max(jnp.abs(ref - got))) < 3e-2
    # grads come back in the feature dtype
    _, vjp = jax.vjp(
        lambda fs: batched_roi_align_tpu(fs, rois, STRIDES, True), feats
    )
    (d,) = vjp(jnp.ones_like(ref))
    assert all(x.dtype == jnp.bfloat16 for x in d)


def test_chunked_call_matches_single(monkeypatch):
    """Above MAX_ROIS_PER_CALL the driver splits the RoI axis (SMEM holds
    56 B of prefetch metadata per RoI); fwd+bwd must be unchanged."""
    from dgod_tpu.ops import pallas_roi_align as pra

    rng = np.random.RandomState(4)
    feats = _feats(rng, B=2, C=8)
    rois = _rois(rng, B=2, N=10)
    g = jnp.asarray(rng.randn(2, 10, 7, 7, 8), jnp.float32)

    ref, vjp_ref = jax.vjp(
        lambda fs: batched_roi_align_tpu(fs, rois, STRIDES, True), feats
    )
    (dref,) = vjp_ref(g)

    monkeypatch.setattr(pra, "MAX_ROIS_PER_CALL", 6)  # 2x10 -> chunks of 3
    got, vjp_got = jax.vjp(
        lambda fs: batched_roi_align_tpu(fs, rois, STRIDES, True), feats
    )
    (dgot,) = vjp_got(g)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-6)
    for a, b in zip(dref, dgot):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_deep_forward_matches_xla_path():
    """Issue-pointer-ring forward (deep=True) vs the XLA path, including
    the multi-tile sliver RoIs whose chains the ring must walk."""
    from dgod_tpu.ops.pallas_roi_align import _roi_align_fwd

    rng = np.random.RandomState(7)
    feats = _feats(rng, B=2, C=32)
    rois = _rois(rng, B=2, N=16)
    ref = _xla_ref(feats, rois)
    got = _roi_align_fwd(feats, rois, STRIDES, True, True)
    assert got.shape == ref.shape
    assert float(jnp.max(jnp.abs(ref - got))) < 1e-3


def test_deep_backward_matches_xla_vjp():
    """Issue-pointer-ring backward (deep=True) vs the XLA vjp, including
    overlap chains deeper than one predecessor (the ring may overtake up
    to DEEP_SLOTS-1 in-flight writes, so every unsafe depth matters) and
    sliver RoIs exercising the folded-tile serialization."""
    from dgod_tpu.ops.pallas_roi_align import _roi_align_bwd

    rng = np.random.RandomState(5)
    feats = _feats(rng, B=2, C=32)
    N = 14
    rois = np.asarray(_rois(rng, B=2, N=N)).copy()
    # a 6-deep chain of mutually overlapping same-image RoIs: after the
    # cross-image interleave these sit 2 apart, hitting unsafe depths 2/4
    for b in range(2):
        for i in range(6, 12):
            rois[b, i] = rois[b, 6] + (i - 6) * 1.5
            rois[b, i, 2:] = np.maximum(
                rois[b, i, 2:], rois[b, i, :2] + 4
            )
    rois = jnp.asarray(rois)
    g = jnp.asarray(rng.randn(2, N, 7, 7, 32), jnp.float32)

    _, vjp_ref = jax.vjp(lambda fs: _xla_ref(fs, rois), feats)
    (dref,) = vjp_ref(g)
    dgot = _roi_align_bwd(feats, rois, g, STRIDES, True, True)
    for lvl, (a, b) in enumerate(zip(dref, dgot)):
        scale = float(jnp.max(jnp.abs(a))) + 1e-9
        assert float(jnp.max(jnp.abs(a - b))) / scale < 1e-3, f"lvl{lvl}"


def test_deep_backward_single_image_serializes_exactly():
    """B=1: every predecessor shares the image, so the overlap chains are
    maximally unsafe — the ring must degrade to exact serialization."""
    from dgod_tpu.ops.pallas_roi_align import _roi_align_bwd

    rng = np.random.RandomState(6)
    feats = _feats(rng, B=1, C=16)
    rois = _rois(rng, B=1, N=12)
    g = jnp.asarray(rng.randn(1, 12, 7, 7, 16), jnp.float32)

    _, vjp_ref = jax.vjp(lambda fs: _xla_ref(fs, rois), feats)
    (dref,) = vjp_ref(g)
    dgot = _roi_align_bwd(feats, rois, g, STRIDES, True, True)
    for lvl, (a, b) in enumerate(zip(dref, dgot)):
        scale = float(jnp.max(jnp.abs(a))) + 1e-9
        assert float(jnp.max(jnp.abs(a - b))) / scale < 1e-3, f"lvl{lvl}"


def test_grad_flows_only_to_touched_cells():
    """A single small RoI must leave grads only at its own level/cells."""
    rng = np.random.RandomState(3)
    feats = _feats(rng, B=1, C=8)
    rois = jnp.asarray([[[40.0, 40.0, 80.0, 80.0]]])  # lvl0 (sqrt area 40)
    _, vjp = jax.vjp(
        lambda fs: batched_roi_align_tpu(fs, rois, STRIDES, True), feats
    )
    (d,) = vjp(jnp.ones((1, 1, 7, 7, 8), jnp.float32))
    assert float(jnp.abs(d[0]).sum()) > 0
    for lvl in (1, 2, 3):
        assert float(jnp.abs(d[lvl]).sum()) == 0.0
    nz = np.argwhere(np.abs(np.asarray(d[0][0]).sum(-1)) > 0)
    ys, xs = nz[:, 0], nz[:, 1]
    assert ys.min() >= 9 and ys.max() <= 21  # 40/4 .. 80/4 (+1 halo)
    assert xs.min() >= 9 and xs.max() <= 21

"""RoIAlign correctness: analytic values on linear feature maps
(bilinear interpolation reproduces linear functions exactly) + level
assignment semantics."""
import numpy as np
import jax.numpy as jnp

from functools import partial

import jax

from dgod_tpu.ops.roi_align import multiscale_roi_align as _mra


def multiscale_roi_align(feats, rois, strides, **kw):
    return jax.jit(lambda f, r: _mra(list(f), r, strides, **kw))(tuple(feats), rois)


def linear_feature(h, w, c=1):
    """f(y, x) = y + 2x, broadcast across channels."""
    y = np.arange(h, dtype=np.float32)[:, None]
    x = np.arange(w, dtype=np.float32)[None, :]
    f = (y + 2 * x)[..., None].repeat(c, -1)
    return f


def expected_bin_values(x1, y1, x2, y2, scale, P=7, S=2):
    """Mean of sample-point values of f(y,x)=y+2x over each bin."""
    x1, y1, x2, y2 = x1 * scale, y1 * scale, x2 * scale, y2 * scale
    rw = max(x2 - x1, 1.0)
    rh = max(y2 - y1, 1.0)
    bw, bh = rw / P, rh / P
    out = np.zeros((P, P))
    for py in range(P):
        for px in range(P):
            vals = []
            for iy in range(S):
                for ix in range(S):
                    sy = y1 + py * bh + (iy + 0.5) * bh / S
                    sx = x1 + px * bw + (ix + 0.5) * bw / S
                    vals.append(sy + 2 * sx)
            out[py, px] = np.mean(vals)
    return out


def test_single_level_analytic():
    feat = linear_feature(32, 32, 4)
    # roi safely in the interior so no border clamping perturbs linearity
    rois = jnp.array([[8.0, 4.0, 100.0, 90.0]])  # image frame, stride 4
    out = np.asarray(
        multiscale_roi_align([jnp.asarray(feat)], rois, strides=[4])
    )
    exp = expected_bin_values(8, 4, 100, 90, 0.25)
    np.testing.assert_allclose(out[0, :, :, 0], exp, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(out[0, :, :, 3], exp, rtol=1e-4, atol=1e-4)


def test_level_assignment():
    # two levels, strides 4 and 8: level-0 map is zeros, level-1 map ones.
    f0 = jnp.zeros((64, 64, 1))
    f1 = jnp.ones((32, 32, 1))
    small = [10.0, 10.0, 60.0, 60.0]  # sqrt(area)=50 -> k=floor(4+log2(50/224))=1 -> lvl 0
    big = [0.0, 0.0, 250.0, 250.0]  # sqrt(area)=250 -> k=floor(4+log2(250/224))=4 -> lvl clamp 1
    out = np.asarray(
        multiscale_roi_align(
            [f0, f1], jnp.array([small, big]), strides=[4, 8]
        )
    )
    assert np.allclose(out[0], 0.0)
    assert np.allclose(out[1], 1.0)


def test_out_of_range_contributes_zero():
    feat = jnp.ones((16, 16, 1))
    # roi hanging far off the map at stride 1: samples beyond size -> 0
    rois = jnp.array([[12.0, 12.0, 40.0, 40.0]])
    out = np.asarray(multiscale_roi_align([feat], rois, strides=[1]))
    # bins fully outside must be exactly 0; inside bins 1
    assert np.isclose(out[0, 0, 0, 0], 1.0)
    assert np.isclose(out[0, 6, 6, 0], 0.0)


def test_chunked_matches_unchunked():
    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.rand(32, 32, 8).astype(np.float32))
    xy = rng.uniform(0, 80, (64, 2))
    rois = jnp.asarray(
        np.concatenate([xy, xy + rng.uniform(8, 40, (64, 2))], 1).astype(np.float32)
    )
    a = np.asarray(multiscale_roi_align([feat], rois, strides=[4], chunk=16))
    b = np.asarray(multiscale_roi_align([feat], rois, strides=[4], chunk=64))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)

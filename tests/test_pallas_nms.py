"""Pallas NMS kernel vs the XLA reference (TPU only; skips elsewhere)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dgod_tpu.ops import nms as N
from dgod_tpu.ops import pallas_nms as P


@pytest.fixture(scope="module")
def tpu():
    if jax.default_backend() == "cpu":
        pytest.skip("pallas TPU kernel needs a TPU backend")


def test_pallas_matches_xla(tpu):
    rng = np.random.RandomState(0)
    n, k = 2048, 64
    xy = rng.uniform(0, 500, (n, 2))
    wh = rng.uniform(5, 60, (n, 2))
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], 1).astype(np.float32))
    scores = jnp.asarray(rng.rand(n).astype(np.float32))
    valid = jnp.asarray(rng.rand(n) > 0.1)

    idx_p, ok_p, sc_p = P.nms_topk_pallas(boxes, scores, valid, 0.5, k)
    idx_x, ok_x, sc_x = jax.jit(lambda b, s, v: N.nms_topk(b, s, v, 0.5, k))(
        boxes, scores, valid
    )
    idx_p, ok_p, idx_x, ok_x = map(np.asarray, (idx_p, ok_p, idx_x, ok_x))
    assert np.array_equal(ok_p, ok_x)
    assert np.array_equal(idx_p[ok_p], idx_x[ok_x])
    np.testing.assert_allclose(np.asarray(sc_p)[ok_p], np.asarray(sc_x)[ok_x])


def test_pallas_fewer_than_k_survivors(tpu):
    boxes = jnp.asarray(
        np.array([[0, 0, 10, 10], [1, 1, 11, 11], [100, 100, 110, 110]], np.float32)
    )
    scores = jnp.asarray(np.array([0.9, 0.8, 0.7], np.float32))
    idx, ok, _ = P.nms_topk_pallas(boxes, scores, jnp.ones(3, bool), 0.5, 10)
    idx, ok = np.asarray(idx), np.asarray(ok)
    assert ok.sum() == 2
    assert set(idx[ok]) == {0, 2}

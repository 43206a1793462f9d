import numpy as np
import jax.numpy as jnp

from dgod_tpu.ops import boxes as B


def test_iou_known_values():
    b1 = jnp.array([[0, 0, 10, 10], [0, 0, 4, 4]], jnp.float32)
    b2 = jnp.array([[5, 5, 15, 15], [0, 0, 10, 10], [20, 20, 30, 30]], jnp.float32)
    iou = np.asarray(B.box_iou(b1, b2))
    assert np.isclose(iou[0, 0], 25.0 / 175.0)
    assert np.isclose(iou[0, 1], 1.0)
    assert np.isclose(iou[0, 2], 0.0)
    assert np.isclose(iou[1, 1], 16.0 / 100.0)


def test_iou_zero_union_safe():
    z = jnp.zeros((2, 4), jnp.float32)
    iou = np.asarray(B.box_iou(z, z))
    assert np.all(np.isfinite(iou)) and np.all(iou == 0)


def test_linear_coder_roundtrip():
    rng = np.random.RandomState(0)
    anchors = rng.uniform(0, 100, (50, 2))
    anchors = np.concatenate([anchors, anchors + rng.uniform(4, 16, (50, 2))], 1).astype(np.float32)
    gt = rng.uniform(0, 100, (50, 2))
    gt = np.concatenate([gt, gt + rng.uniform(1, 50, (50, 2))], 1).astype(np.float32)
    enc = B.linear_encode(jnp.asarray(anchors), jnp.asarray(gt))
    dec = np.asarray(B.linear_decode(enc, jnp.asarray(anchors)))
    np.testing.assert_allclose(dec, gt, rtol=1e-4, atol=1e-3)


def test_linear_encode_golden():
    # anchor 8x8 centred at (4,4); gt box [0,0,8,8] -> l=t=r=b=4 -> /8 = 0.5
    anchor = jnp.array([[0.0, 0.0, 8.0, 8.0]])
    gt = jnp.array([[0.0, 0.0, 8.0, 8.0]])
    enc = np.asarray(B.linear_encode(anchor, gt))
    np.testing.assert_allclose(enc, [[0.5, 0.5, 0.5, 0.5]])


def test_delta_coder_roundtrip_with_weights():
    rng = np.random.RandomState(1)
    w = (10.0, 10.0, 5.0, 5.0)
    props = rng.uniform(0, 100, (30, 2))
    props = np.concatenate([props, props + rng.uniform(2, 40, (30, 2))], 1).astype(np.float32)
    gt = rng.uniform(0, 100, (30, 2))
    gt = np.concatenate([gt, gt + rng.uniform(2, 40, (30, 2))], 1).astype(np.float32)
    enc = B.delta_encode(jnp.asarray(gt), jnp.asarray(props), w)
    dec = np.asarray(B.delta_decode(enc, jnp.asarray(props), w))
    np.testing.assert_allclose(dec, gt, rtol=1e-3, atol=1e-2)


def test_delta_decode_clamps_extreme_deltas():
    props = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    deltas = jnp.array([[0.0, 0.0, 100.0, 100.0]])  # would explode without clamp
    out = np.asarray(B.delta_decode(deltas, props))
    assert np.all(np.isfinite(out))
    # width after clamp: exp(log(1000/16)) * 10 = 625
    assert np.isclose(out[0, 2] - out[0, 0], 625.0, rtol=1e-4)


def test_clip_and_small_mask():
    boxes = jnp.array([[-5, -5, 20, 20], [0, 0, 0.5, 30]], jnp.float32)
    clipped = np.asarray(B.clip_boxes(boxes, 15, 18))
    np.testing.assert_allclose(clipped[0], [0, 0, 18, 15])
    mask = np.asarray(B.small_box_mask(boxes, 1.0))
    assert mask[0] and not mask[1]

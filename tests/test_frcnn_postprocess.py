"""FRCNN detection postprocess semantics: softmax + per-class delta decode +
background drop + score threshold + class-aware NMS + rescale."""
import numpy as np
import jax
import jax.numpy as jnp

from dgod_tpu.models.faster_rcnn import FRCNNConfig, FRCNNDetector


def test_planted_detection_recovered():
    det = FRCNNDetector(FRCNNConfig(num_classes=9), canvas=(64, 128))
    N, Cp1 = 16, 10
    proposals = np.tile(np.array([[10.0, 10.0, 30.0, 30.0]], np.float32), (N, 1))
    proposals[1] = [50, 8, 90, 40]
    logits = np.full((N, Cp1), 0.0, np.float32)
    logits[:, 0] = 10.0  # everything background...
    logits[1, 0] = -10.0
    logits[1, 4] = 10.0  # ...except proposal 1 -> class 4
    regs = np.zeros((N, Cp1 * 4), np.float32)  # zero deltas: box == proposal

    dets = jax.jit(
        lambda l, r, p, v: det.postprocess(
            l[None], r[None], p[None], v[None],
            jnp.asarray([[64.0, 128.0]]), jnp.asarray([[1.5, 1.5]]),
        )
    )(jnp.asarray(logits), jnp.asarray(regs), jnp.asarray(proposals),
      jnp.ones(N, bool))

    valid = np.asarray(dets["valid"][0])
    assert valid.sum() == 1
    i = int(np.argmax(valid))
    assert int(dets["labels"][0, i]) == 4
    np.testing.assert_allclose(
        np.asarray(dets["boxes"][0, i]),
        np.array([50, 8, 90, 40]) * 1.5, atol=1e-2,
    )
    assert float(dets["scores"][0, i]) > 0.99


def test_per_class_delta_decode_and_nms():
    det = FRCNNDetector(FRCNNConfig(num_classes=9), canvas=(64, 128))
    N, Cp1 = 8, 10
    # two identical proposals, same class, one higher score -> NMS keeps one
    proposals = np.tile(np.array([[20.0, 20.0, 40.0, 40.0]], np.float32), (N, 1))
    logits = np.full((N, Cp1), 0.0, np.float32)
    logits[:, 0] = 10.0
    logits[0, 1] = 10.0
    logits[0, 0] = -10.0
    logits[1, 1] = 8.0
    logits[1, 0] = -10.0
    regs = np.zeros((N, Cp1 * 4), np.float32)
    # class-1 delta for proposal 0: shift centre by +0.2w (dx=0.2*10 weight)
    regs[0, 4:8] = [0.2 * 10.0, 0.0, 0.0, 0.0]

    dets = jax.jit(
        lambda l, r, p, v: det.postprocess(
            l[None], r[None], p[None], v[None],
            jnp.asarray([[64.0, 128.0]]), jnp.ones((1, 2)),
        )
    )(jnp.asarray(logits), jnp.asarray(regs), jnp.asarray(proposals),
      jnp.ones(N, bool))
    valid = np.asarray(dets["valid"][0])
    boxes = np.asarray(dets["boxes"][0])[valid]
    # proposal 0 decodes shifted by +4px in x; proposal 1 unshifted; their
    # IoU = 16/24 = 0.67 > 0.5 -> suppressed -> ONE detection, the shifted one
    assert valid.sum() == 1
    np.testing.assert_allclose(boxes[0], [24, 20, 44, 40], atol=1e-2)

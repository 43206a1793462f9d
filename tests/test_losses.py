"""Loss golden-value tests against torch.nn.functional (CPU torch is the
independent oracle for the math the reference relies on)."""
import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from dgod_tpu.ops import losses as L


def test_bce_with_logits_matches_torch():
    rng = np.random.RandomState(0)
    x = rng.randn(64).astype(np.float32) * 3
    t = rng.randint(0, 2, 64).astype(np.float32)
    ours = np.asarray(L.bce_with_logits(jnp.asarray(x), jnp.asarray(t)))
    ref = F.binary_cross_entropy_with_logits(
        torch.tensor(x), torch.tensor(t), reduction="none"
    ).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_focal_loss_matches_reference_formula():
    # reference DGFCOS.py:62-106 / torchvision sigmoid_focal_loss
    rng = np.random.RandomState(1)
    x = rng.randn(128).astype(np.float32) * 2
    t = rng.randint(0, 2, 128).astype(np.float32)
    ours = np.asarray(L.sigmoid_focal_loss(jnp.asarray(x), jnp.asarray(t)))
    xt, tt = torch.tensor(x), torch.tensor(t)
    p = torch.sigmoid(xt)
    ce = F.binary_cross_entropy_with_logits(xt, tt, reduction="none")
    p_t = p * tt + (1 - p) * (1 - tt)
    ref = ce * ((1 - p_t) ** 2)
    ref = (0.25 * tt + 0.75 * (1 - tt)) * ref
    np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-3, atol=1e-4)


def test_smooth_l1_matches_torch_beta():
    rng = np.random.RandomState(2)
    a = rng.randn(100).astype(np.float32)
    b = rng.randn(100).astype(np.float32)
    ours = np.asarray(L.smooth_l1(jnp.asarray(a), jnp.asarray(b), beta=1 / 9))
    ref = F.smooth_l1_loss(
        torch.tensor(a), torch.tensor(b), beta=1 / 9, reduction="none"
    ).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_softmax_ce_matches_torch():
    rng = np.random.RandomState(3)
    logits = rng.randn(16, 9).astype(np.float32)
    labels = rng.randint(0, 9, 16)
    ours = np.asarray(L.softmax_cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    ref = F.cross_entropy(
        torch.tensor(logits), torch.tensor(labels), reduction="none"
    ).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_softmax_ce_dense_matches_torch():
    rng = np.random.RandomState(4)
    logits = rng.randn(7, 9).astype(np.float32)
    target = rng.rand(7, 9).astype(np.float32)
    ours = np.asarray(L.softmax_cross_entropy_dense(jnp.asarray(logits), jnp.asarray(target)))
    ref = F.cross_entropy(
        torch.tensor(logits), torch.tensor(target), reduction="none"
    ).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_giou_loss_known_values():
    # identical boxes -> loss 0; disjoint far boxes -> loss approaches 2
    a = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    same = np.asarray(L.giou_loss(a, a))
    np.testing.assert_allclose(same, [0.0], atol=1e-6)
    far = jnp.array([[100.0, 100.0, 110.0, 110.0]])
    v = float(L.giou_loss(a, far)[0])
    # enclosing box area 110*110, union 200 -> giou = 0 - (12100-200)/12100
    assert np.isclose(v, 1 + (12100 - 200) / 12100, rtol=1e-5)


def test_masked_mean_empty_mask_is_zero():
    v = jnp.ones((5,))
    m = jnp.zeros((5,), bool)
    assert float(L.masked_mean(v, m)) == 0.0

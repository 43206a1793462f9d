"""DG auxiliary heads: GRL gradient, DA classifier shapes at reference
feature sizes, per-domain bank semantics."""
import numpy as np
import jax
import jax.numpy as jnp

from dgod_tpu.models import dg_heads as H


def test_grl_forward_identity_backward_negated():
    x = jnp.arange(6.0).reshape(2, 3)
    y = H.grad_reverse(x)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))

    f = lambda x: jnp.sum(H.grad_reverse(x) * 2.0)
    g = jax.grad(f)(x)
    # d/dx of 2x through GRL: -0.1 * 2 (DGcommon.py:36,41)
    np.testing.assert_allclose(np.asarray(g), -0.2, rtol=1e-6)


def test_image_da_fpn_reference_scale():
    # P2 of the 608x1216 canvas is 152x304 -> conv stack reduces to 1x1
    m = H.ImageDAFPN(num_domains=3)
    x = jnp.zeros((2, 152, 304, 256))
    params = jax.jit(m.init)(jax.random.PRNGKey(0), x)["params"]
    out = jax.jit(m.apply)({"params": params}, x)
    assert out.shape == (2, 3)
    # sigmoid output
    assert (np.asarray(out) >= 0).all() and (np.asarray(out) <= 1).all()


def test_image_da_reference_scale():
    # C5 of the canvas is 19x38
    m = H.ImageDA(num_domains=2)
    x = jnp.zeros((1, 19, 38, 2048))
    params = jax.jit(m.init)(jax.random.PRNGKey(0), x)["params"]
    out = jax.jit(m.apply)({"params": params}, x)
    assert out.shape == (1, 2)


def test_instance_head_widths():
    # FRCNN: 1024->512->256->out; FCOS: 256->128(->64)->out
    f = H.frcnn_instance_da(3)
    p = jax.jit(f.init)(jax.random.PRNGKey(0), jnp.zeros((4, 1024)))["params"]
    assert p["fc0"]["kernel"].shape == (1024, 512)
    assert p["fc1"]["kernel"].shape == (512, 256)
    assert p["fc2"]["kernel"].shape == (256, 3)

    c = H.fcos_ins_cls(9, prime=True)
    p = jax.jit(c.init)(jax.random.PRNGKey(0), jnp.zeros((4, 256)))["params"]
    assert p["fc0"]["kernel"].shape == (256, 128)
    assert p["fc1"]["kernel"].shape == (128, 64)
    assert p["fc2"]["kernel"].shape == (64, 9)


def test_domain_bank_gather_matches_all():
    bank = H.DomainBank(H.fcos_ins_cls(5, prime=False), num_domains=3)
    x = jnp.asarray(np.random.RandomState(0).rand(4, 6, 256).astype(np.float32))
    domain = jnp.asarray([0, 2, 1, 0])
    params = jax.jit(bank.init)(jax.random.PRNGKey(0), x, domain)["params"]
    gathered = jax.jit(lambda p, x, d: bank.apply({"params": p}, x, d))(
        params, x, domain
    )
    all_out = jax.jit(lambda p, x: bank.apply({"params": p}, x, mode="all"))(
        params, x
    )
    assert all_out.shape == (3, 4, 6, 5)
    for b, d in enumerate([0, 2, 1, 0]):
        np.testing.assert_allclose(
            np.asarray(gathered[b]), np.asarray(all_out[d, b]), rtol=1e-6
        )
    # heads must differ across domains (independent init)
    assert not np.allclose(np.asarray(all_out[0]), np.asarray(all_out[1]))


def test_grl_in_bank_reverses_into_input():
    bank = H.DomainBank(H.fcos_ins_cls(5, prime=True), num_domains=2)
    x = jnp.ones((1, 2, 256))
    domain = jnp.asarray([0])
    params = jax.jit(bank.init)(jax.random.PRNGKey(0), x, domain)["params"]

    def loss(x):
        return jnp.sum(bank.apply({"params": params}, x, domain))

    g = jax.grad(loss)(x)
    # gradient flows (reversed); just assert it is nonzero and finite
    g = np.asarray(g)
    assert np.isfinite(g).all() and np.abs(g).sum() > 0

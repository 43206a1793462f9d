"""stop_inactive_grads semantics (train/steps.py).

The DG mode machine freezes whole param groups per mode (reference freezes
via requires_grad=False / optimizer param groups, DGFRCNN.py:111-201).
Our pruning uses stop_gradient on the inactive leaves INSIDE the loss
closure; these tests pin the two load-bearing properties:

1. inactive leaves get exactly-zero gradients (so the fused SPMD
   all-reduce carries no frozen-backward traffic), and
2. gradients of ACTIVE leaves are bit-identical to the unpruned grads —
   stop_gradient prunes paths INTO the stopped leaves, never the value
   flowing THROUGH them.
"""
import jax
import jax.numpy as jnp
import numpy as np

from dgod_tpu.train.steps import MODE_ACTIVE_GROUPS, build_active_mask, \
    stop_inactive_grads


def _coupled_loss(p):
    # every leaf multiplicatively coupled to every other: any error in the
    # "grads flow through stopped values" property would change active grads
    prod = p["a"]["w"].sum() * p["b"]["w"].sum() * p["c"]["w"].sum()
    sq = sum(jnp.sum(x["w"] ** 2) for x in p.values())
    return prod + 0.5 * sq


def test_inactive_grads_zero_active_grads_identical():
    key = jax.random.PRNGKey(0)
    ka, kb, kc = jax.random.split(key, 3)
    params = {
        "a": {"w": jax.random.normal(ka, (4, 3))},
        "b": {"w": jax.random.normal(kb, (5,))},
        "c": {"w": jax.random.normal(kc, (2, 2))},
    }
    active = {"a": {"w": True}, "b": {"w": False}, "c": {"w": True}}

    g_full = jax.grad(_coupled_loss)(params)
    g_pruned = jax.grad(
        lambda p: _coupled_loss(stop_inactive_grads(p, active)))(params)

    assert np.all(np.asarray(g_pruned["b"]["w"]) == 0.0)
    np.testing.assert_array_equal(np.asarray(g_pruned["a"]["w"]),
                                  np.asarray(g_full["a"]["w"]))
    np.testing.assert_array_equal(np.asarray(g_pruned["c"]["w"]),
                                  np.asarray(g_full["c"]["w"]))


def test_mode_masks_match_reference_groups():
    """build_active_mask must follow MODE_ACTIVE_GROUPS exactly (mode 2 is
    the only mode where the detector itself is frozen — DGFRCNN.py:166-177
    trains only the per-domain instance classifiers there)."""
    labels = {
        "backbone": "detector",
        "grl_img": "image_da",
        "grl_ins": "ins_da",
        "dom_cls": "ins_cls",
        "dom_cls_p": "ins_cls_prime",
    }
    for mode, groups in MODE_ACTIVE_GROUPS.items():
        mask = build_active_mask(labels, mode)
        for name, lbl in labels.items():
            assert mask[name] == (lbl in groups), (mode, name)
    assert build_active_mask(labels, 2)["backbone"] is False


def test_pruned_step_never_moves_inactive_leaves():
    """One SGD-like step with pruned grads must leave inactive leaves
    bit-identical (grad is exactly zero, not merely small)."""
    params = {"a": {"w": jnp.ones((3,))}, "b": {"w": jnp.ones((3,))}}
    active = {"a": {"w": False}, "b": {"w": True}}
    g = jax.grad(lambda p: _coupled_loss(
        {**stop_inactive_grads(p, active),
         "c": {"w": jnp.ones(())}}))(params)
    stepped = jax.tree.map(lambda p, gg: p - 0.1 * gg, params, g)
    np.testing.assert_array_equal(np.asarray(stepped["a"]["w"]),
                                  np.asarray(params["a"]["w"]))
    assert not np.array_equal(np.asarray(stepped["b"]["w"]),
                              np.asarray(params["b"]["w"]))

"""End-to-end DGFRCNN tests on a reduced canvas + scaled-down RPN/RoI
numbers (CPU-friendly; semantics identical to the full config)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dgod_tpu.models.dg_frcnn import DGFRCNNModel
from dgod_tpu.models.faster_rcnn import FRCNNConfig
from dgod_tpu.train import steps as S
from dgod_tpu.train.optim import OptConfig, init_opt_state

CANVAS = (128, 256)
SMALL = FRCNNConfig(
    num_classes=9,
    rpn_pre_nms_train=256, rpn_pre_nms_test=256,
    rpn_post_nms_train=256, rpn_post_nms_test=256,
    rpn_batch_per_image=64,
    box_batch_per_image=64,
)


@pytest.fixture(scope="module")
def model_and_params():
    model = DGFRCNNModel(num_classes=9, num_domains=2, canvas=CANVAS, config=SMALL)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def tiny_batch(b=2):
    rng = np.random.RandomState(0)
    boxes = np.zeros((b, 8, 4), np.float32)
    labels = np.zeros((b, 8), np.int32)
    valid = np.zeros((b, 8), bool)
    for i in range(b):
        boxes[i, 0] = [20, 20, 90, 90]
        boxes[i, 1] = [120, 30, 200, 100]
        labels[i, :2] = [1, 3]
        valid[i, :2] = True
    return {
        "image": rng.randint(0, 255, (b, *CANVAS, 3), np.uint8),
        "boxes": boxes,
        "labels": labels,
        "gt_valid": valid,
        "domain": np.arange(b, dtype=np.int32) % 2,
        "image_size": np.tile(np.float32(CANVAS), (b, 1)),
        "scale_back": np.ones((b, 2), np.float32),
    }


@pytest.mark.parametrize("mode", [0, 1, 2, 3, 4])
def test_all_modes_finite_loss(model_and_params, mode):
    model, params = model_and_params
    loss_fn = jax.jit(
        lambda p, b: model.loss_for_mode(
            p, b, jax.random.PRNGKey(1), mode, (0.5, 0.5, 0.5, 0.05, 1e-4)
        )
    )
    total, metrics = loss_fn(params, tiny_batch())
    assert np.isfinite(float(total)), (mode, metrics)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (mode, k)


def _changed_groups(p0, p1):
    changed = set()

    def check(path, a, b):
        if not np.allclose(np.asarray(a), np.asarray(b)):
            changed.add(path[0].key)

    jax.tree_util.tree_map_with_path(check, p0, p1)
    return changed


def test_mode0_sgd_updates_only_detector(model_and_params):
    model, params = model_and_params
    cfg = OptConfig("sgd", weight_decay=5e-4)
    step = S.make_train_step(
        model, 0, (0.5, 0.5, 0.5, 0.05, 1e-4), cfg, 2e-3, params, donate=False
    )
    new_params, _, metrics = step(params, {}, tiny_batch(), jax.random.PRNGKey(0), 1.0)
    assert np.isfinite(float(metrics["loss"]))
    assert _changed_groups(params, new_params) == {"detector"}


def test_mode1_updates_da_heads(model_and_params):
    model, params = model_and_params
    cfg = OptConfig("sgd", weight_decay=5e-4)
    step = S.make_train_step(
        model, 1, (0.5, 0.5, 0.5, 0.05, 1e-4), cfg, 2e-3, params, donate=False
    )
    new_params, _, _ = step(params, {}, tiny_batch(), jax.random.PRNGKey(0), 1.0)
    assert _changed_groups(params, new_params) == {"detector", "image_da", "ins_da"}


def test_predict_shapes(model_and_params):
    model, params = model_and_params
    dets = jax.jit(model.predict)(params, tiny_batch())
    assert dets["boxes"].shape == (2, 100, 4)
    assert dets["labels"].shape == (2, 100)


def test_predict_batch_invariance():
    """predict on a batch must equal predict per image (the whole FRCNN
    eval path — RPN top-k/NMS, RoI head, class-wise postprocess — is
    per-image; batching is purely a throughput lever). f32 so the
    comparison is exact."""
    model = DGFRCNNModel(num_classes=9, num_domains=2, canvas=CANVAS,
                         config=SMALL, compute_dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0))
    batch = tiny_batch(b=2)
    predict = jax.jit(model.predict)
    full = predict(params, batch)
    for i in range(2):
        one = predict(params, {k: v[i:i + 1] for k, v in batch.items()})
        # XLA:CPU picks different conv algorithms for batch 1 vs 2, so f32
        # activations differ by ~1e-6 relative; detections must agree to
        # that rounding with identical ranking/classes
        np.testing.assert_array_equal(np.asarray(full["labels"][i]),
                                      np.asarray(one["labels"][0]))
        np.testing.assert_array_equal(np.asarray(full["valid"][i]),
                                      np.asarray(one["valid"][0]))
        np.testing.assert_allclose(np.asarray(full["scores"][i]),
                                   np.asarray(one["scores"][0]),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(full["boxes"][i]),
                                   np.asarray(one["boxes"][0]),
                                   rtol=1e-4, atol=1e-3)

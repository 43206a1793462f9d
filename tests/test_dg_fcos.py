"""End-to-end DGFCOS tests on a reduced canvas (CPU-friendly)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dgod_tpu.models.dg_fcos import DGFCOSModel
from dgod_tpu.train import steps as S
from dgod_tpu.train.optim import OptConfig, init_opt_state

CANVAS = (128, 256)


@pytest.fixture(scope="module")
def model_and_params():
    model = DGFCOSModel(num_classes=9, num_domains=2, canvas=CANVAS)
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


def test_forward_shapes(model_and_params):
    model, params = model_and_params
    batch = tiny_batch()
    outputs, aux = model.forward(params, jnp.asarray(batch["image"]))
    R = int(sum(model.counts))
    assert outputs["cls_logits"].shape == (2, R, 9)
    assert outputs["bbox_regression"].shape == (2, R, 4)
    assert outputs["bbox_ctrness"].shape == (2, R, 1)
    assert aux["ins_feat"].shape == (2, R, 256)


@pytest.mark.parametrize("mode", [0, 1, 2, 3, 4])
def test_all_modes_finite_loss(model_and_params, mode):
    model, params = model_and_params
    batch = tiny_batch()
    loss_fn = jax.jit(
        lambda p, b: model.loss_for_mode(
            p, b, jax.random.PRNGKey(1), mode, (0.5, 0.5, 0.5, 0.05, 1e-4)
        ),
    )
    total, metrics = loss_fn(params, batch)
    assert np.isfinite(float(total))
    for v in metrics.values():
        assert np.isfinite(float(v))


def _changed_groups(p0, p1):
    changed = set()

    def check(path, a, b):
        if not np.allclose(np.asarray(a), np.asarray(b)):
            changed.add(path[0].key)

    jax.tree_util.tree_map_with_path(check, p0, p1)
    return changed


def test_mode0_updates_only_detector(model_and_params):
    model, params = model_and_params
    step = S.make_train_step(
        model, 0, (0.5, 0.5, 0.5, 0.05, 1e-4), OptConfig("adam", weight_decay=1e-4),
        1e-3, params, donate=False,
    )
    opt = init_opt_state(params, OptConfig("adam"))
    new_params, _, metrics = step(params, opt, tiny_batch(), jax.random.PRNGKey(0), 1.0)
    assert np.isfinite(float(metrics["loss"]))
    assert _changed_groups(params, new_params) == {"detector"}
    # frozen backbone leaves must not move
    p0 = params["detector"]["backbone"]["body"]
    p1 = new_params["detector"]["backbone"]["body"]
    np.testing.assert_array_equal(
        np.asarray(p0["conv1"]["kernel"]), np.asarray(p1["conv1"]["kernel"])
    )
    np.testing.assert_array_equal(
        np.asarray(p0["layer1_block0"]["Conv_0"]["kernel"])
        if "Conv_0" in p0["layer1_block0"]
        else np.asarray(list(p0["layer1_block0"].values())[0]["kernel"]),
        np.asarray(list(p1["layer1_block0"].values())[0]["kernel"]),
    )
    # layer4 convs must move
    l4_0 = list(p0["layer4_block0"].values())[0]["kernel"]
    l4_1 = list(p1["layer4_block0"].values())[0]["kernel"]
    assert not np.allclose(np.asarray(l4_0), np.asarray(l4_1))


def test_mode2_updates_only_ins_cls(model_and_params):
    model, params = model_and_params
    step = S.make_train_step(
        model, 2, (0.5, 0.5, 0.5, 0.05, 1e-4), OptConfig("adam", weight_decay=1e-4),
        1e-3, params, donate=False,
    )
    opt = init_opt_state(params, OptConfig("adam"))
    new_params, _, _ = step(params, opt, tiny_batch(), jax.random.PRNGKey(0), 1.0)
    assert _changed_groups(params, new_params) == {"ins_cls"}


def test_mode4_updates_only_detector(model_and_params):
    model, params = model_and_params
    step = S.make_train_step(
        model, 4, (0.5, 0.5, 0.5, 0.05, 1e-4), OptConfig("adam", weight_decay=1e-4),
        1e-3, params, donate=False,
    )
    opt = init_opt_state(params, OptConfig("adam"))
    new_params, _, _ = step(params, opt, tiny_batch(), jax.random.PRNGKey(0), 1.0)
    assert _changed_groups(params, new_params) == {"detector"}


def test_predict_shapes(model_and_params):
    model, params = model_and_params
    batch = tiny_batch()
    dets = model.predict(params, batch)
    assert dets["boxes"].shape == (2, 100, 4)
    assert dets["scores"].shape == (2, 100)
    assert dets["valid"].shape == (2, 100)


def test_mode_scheduler_cycle():
    sch = S.ModeScheduler(dg=True)
    seq = [sch.next_mode() for _ in range(16)]
    assert seq == [0, 1, 0, 2, 0, 3, 0, 4] * 2
    sch_nd = S.ModeScheduler(dg=False)
    assert [sch_nd.next_mode() for _ in range(4)] == [0, 0, 0, 0]

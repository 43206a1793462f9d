"""FLOP accounting tests: the analytic model (utils/flops.py) must agree
with exact jaxpr-derived MXU FLOP counts of the real train-step programs.

The analytic counts are the MFU numerator reported by bench.py; these tests
pin them to the traced programs so the metric can't silently rot when the
architecture changes. Mode 0 (the detection step, where ~7/8 of cycle time
goes) must agree within ~6%; mode 2 (forward-only) within ~5%. Modes 1/3/4
are looser by design: XLA lowers strided-grad convs with input dilation
(zero-multiplies the analytic model rightly excludes) and the analytic 3x
backward multiplier approximates the RPN-branch pruning — see the
`jaxpr_mxu_flops` docstring.
"""

import jax
import jax.numpy as jnp
import pytest

from dgod_tpu.train import steps as step_lib
from dgod_tpu.train.optim import init_opt_state
from dgod_tpu.utils import flops as F

CANVAS = (128, 256)
B = 2
REG = (0.5, 0.5, 0.5, 0.05, 1e-4)


def _batch():
    import numpy as np

    rng = np.random.RandomState(0)
    boxes = np.zeros((B, 8, 4), np.float32)
    labels = np.zeros((B, 8), np.int32)
    valid = np.zeros((B, 8), bool)
    boxes[:, 0] = [6, 6, 60, 52]
    labels[:, 0] = 1
    valid[:, 0] = True
    return {
        "image": jnp.asarray(rng.randint(0, 255, (B, *CANVAS, 3), np.uint8)),
        "boxes": jnp.asarray(boxes),
        "labels": jnp.asarray(labels),
        "gt_valid": jnp.asarray(valid),
        "domain": jnp.asarray((np.arange(B) % 2).astype(np.int32)),
        "image_size": jnp.asarray(np.tile(np.float32(CANVAS), (B, 1))),
        "scale_back": jnp.asarray(np.ones((B, 2), np.float32)),
    }


def _abstract_params(model):
    shapes = jax.eval_shape(lambda r: model.init(r), jax.random.PRNGKey(0))
    return jax.tree.map(lambda a: jnp.zeros(a.shape, a.dtype), shapes)


@pytest.mark.parametrize("family", ["FCOS", "FRCNN"])
@pytest.mark.parametrize("mode,tol", [(0, 0.07), (2, 0.05)])
def test_analytic_matches_jaxpr(family, mode, tol):
    if family == "FCOS":
        from dgod_tpu.models.dg_fcos import DGFCOSModel

        model = DGFCOSModel(num_classes=9, num_domains=3, canvas=CANVAS)
        rois = 512
    else:
        from dgod_tpu.models.dg_frcnn import DGFRCNNModel
        from dgod_tpu.models.faster_rcnn import FRCNNConfig

        cfg = FRCNNConfig(
            num_classes=9,
            rpn_pre_nms_train=256, rpn_pre_nms_test=256,
            rpn_post_nms_train=256, rpn_post_nms_test=256,
            rpn_batch_per_image=64, box_batch_per_image=64,
        )
        model = DGFRCNNModel(num_classes=9, num_domains=3, canvas=CANVAS,
                             config=cfg)
        rois = 64

    params = _abstract_params(model)
    opt_config, base_lr = step_lib.make_optimizer(family)
    opt_state = init_opt_state(params, opt_config)
    step = step_lib.make_train_step(
        model, mode, REG, opt_config, base_lr, params, donate=False
    )
    fj = F.jaxpr_mxu_flops(
        step, params, opt_state, _batch(), jax.random.PRNGKey(1), 1.0
    )
    fa = F.cycle_flops(family, CANVAS, B, num_rois=rois)[
        "per_mode_per_image"][mode] * B
    assert fj > 1e9  # non-vacuous: a real detector step
    assert abs(fj - fa) <= tol * fa, (
        f"{family} mode {mode}: jaxpr {fj/1e9:.2f} GF vs analytic "
        f"{fa/1e9:.2f} GF"
    )


def test_jaxpr_flops_grouped_conv():
    """Grouped convs: the kernel's input-channel dim is already per-group,
    so the jaxpr walk must NOT divide by the group count again. Hand
    count: out.size * k * (cin/groups) MACs * 2."""
    import numpy as np

    x = jnp.zeros((1, 16, 8, 8), jnp.float32)  # NCHW, cin 16
    w = jnp.zeros((32, 4, 3, 3), jnp.float32)  # cout 32, cin/g=4 -> g=4

    def fn(x, w):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding="SAME",
            feature_group_count=4)

    got = F.jaxpr_mxu_flops(fn, x, w)
    out_size = 1 * 32 * 8 * 8
    expect = 2.0 * out_size * 3 * 3 * 4  # cin_per_group = 4
    np.testing.assert_allclose(got, expect)


def test_train_mfu_shape():
    out = F.train_mfu("FCOS", (608, 1216), 8, images_per_sec=200.0)
    assert 0.0 < out["mfu"] < 1.0
    assert out["model_tflops_per_sec"] > 0
    # FCOS forward is ~290 GF/img at the working canvas (backbone+FPN
    # ~145 GF + the dense P3-stride head towers ~146 GF); the cycle
    # average (mode 0 pays 3x head+trunk, modes 1-4 skip the head) lands
    # near 580 GF/img — pin a generous band around it
    assert 3e11 < out["flops_per_image"] < 1e12

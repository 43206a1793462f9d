"""End-to-end differential: full reference models vs dgod_tpu, SAME weights.

The reference models (FastWILDS, FCOS — their real classes, running on the
tvshim torchvision surface) are built with random torch init; their
state_dicts are ported into dgod_tpu with the production converter
(utils/weights.port_torchvision — the same path --torch_weights takes).
With identical weights and identical inputs we then compare:

- the full backbone+FPN(+P6P7) feature pyramids (torch NCHW vs Flax NHWC),
- the dense detection-head outputs (RPN objectness/deltas; FCOS
  cls/reg/ctrness over all locations),
- the postprocessed detections (greedy IoU+label matching; random-weight
  scores cluster, so discrete NMS near-ties are tolerated via a match-rate
  bound rather than exactness — the NMS semantics themselves are tested
  exactly elsewhere, tests/test_nms.py).

This exercises, against the reference's own forward code: the conv/pad
conventions of the ResNet/FPN port, FrozenBatchNorm math, head layouts,
anchor/coder wiring, and the weight-converter key map (fasterrcnn.py:
307-470, fcos.py:430-788).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from . import tvshim  # noqa: E402

CANVAS = (128, 256)


@pytest.fixture(scope="module")
def ref_frcnn():
    return tvshim.load_reference("fasterrcnn")


@pytest.fixture(scope="module")
def ref_fcos():
    return tvshim.load_reference("fcos")


def _torch_input(img_uint8):
    return torch.as_tensor(img_uint8).permute(2, 0, 1).float() / 255.0


def _feature_parity(feats_j, feats_t, what):
    for lvl, (f_j, f_t) in enumerate(zip(feats_j, feats_t)):
        a = np.asarray(f_j)
        b = f_t.detach().permute(0, 2, 3, 1).numpy()
        assert a.shape == b.shape, (what, lvl, a.shape, b.shape)
        scale = max(np.abs(b).max(), 1e-3)
        err = np.abs(a - b).max() / scale
        assert err < 5e-3, f"{what} level {lvl}: rel err {err:.2e}"


def _match_rate(boxes_a, labels_a, boxes_b, labels_b, iou_thr=0.5):
    """Fraction of A detections with an unmatched B detection of the same
    label at IoU >= thr (greedy)."""
    if len(boxes_a) == 0:
        return 1.0
    taken = np.zeros(len(boxes_b), bool)
    matched = 0
    for i in range(len(boxes_a)):
        best, best_j = 0.0, -1
        for j in range(len(boxes_b)):
            if taken[j] or labels_b[j] != labels_a[i]:
                continue
            lt = np.maximum(boxes_a[i, :2], boxes_b[j, :2])
            rb = np.minimum(boxes_a[i, 2:], boxes_b[j, 2:])
            wh = np.clip(rb - lt, 0, None)
            inter = wh[0] * wh[1]
            ua = ((boxes_a[i, 2] - boxes_a[i, 0]) * (boxes_a[i, 3] - boxes_a[i, 1])
                  + (boxes_b[j, 2] - boxes_b[j, 0]) * (boxes_b[j, 3] - boxes_b[j, 1])
                  - inter)
            iou = inter / ua if ua > 0 else 0.0
            if iou > best:
                best, best_j = iou, j
        if best >= iou_thr:
            taken[best_j] = True
            matched += 1
    return matched / len(boxes_a)


def test_frcnn_e2e_same_weights(ref_frcnn):
    from dgod_tpu.models.dg_frcnn import DGFRCNNModel
    from dgod_tpu.utils import weights as weights_lib

    torch.manual_seed(0)
    model_t = ref_frcnn.fasterrcnn_resnet50_fpn(
        pretrained=False, num_classes=9, pretrained_backbone=False,
        min_size=CANVAS[0], max_size=CANVAS[1])
    model_t.eval()
    sd = {k: v.detach().numpy() for k, v in model_t.state_dict().items()}

    model_j = DGFRCNNModel(num_classes=9, num_domains=2, canvas=CANVAS,
                           compute_dtype=jnp.float32)
    params = model_j.init(jax.random.PRNGKey(0))
    stats = weights_lib.port_torchvision(params["detector"], sd, "FRCNN")
    # same class count on both sides: nothing may be dropped or skipped
    assert stats["dropped_class_dependent"] == []
    assert stats["merged"] > 250, stats

    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (1, *CANVAS, 3), np.uint8)
    det = model_j.detector

    # -- feature pyramid parity (P2..P5 + pool) --
    imgs_j = model_j.normalize(jnp.asarray(img))
    feats_j, _ = det.features(params["detector"], imgs_j)
    with torch.no_grad():
        feats_t = model_t.backbone(_torch_input(img[0])[None])
    _feature_parity(feats_j, list(feats_t.values()), "FRCNN FPN")

    # -- RPN head outputs over every anchor --
    obj_j, deltas_j = det.rpn_forward(params["detector"], feats_j)
    with torch.no_grad():
        obj_t, deltas_t = model_t.rpn.head(list(feats_t.values()))
    for lvl, (o_j, o_t, d_j, d_t) in enumerate(
            zip(obj_j, obj_t, deltas_j, deltas_t)):
        B, A, H, W = o_t.shape
        o_t_flat = tvshim.permute_and_flatten(o_t, B, A, 1, H, W)[..., 0]
        d_t_flat = tvshim.permute_and_flatten(d_t, B, A, 4, H, W)
        np.testing.assert_allclose(np.asarray(o_j), o_t_flat.detach().numpy(),
                                   rtol=1e-3, atol=1e-3,
                                   err_msg=f"objectness level {lvl}")
        np.testing.assert_allclose(np.asarray(d_j), d_t_flat.detach().numpy(),
                                   rtol=1e-3, atol=1e-3,
                                   err_msg=f"deltas level {lvl}")

    # -- postprocessed detections --
    batch = {
        "image": jnp.asarray(img),
        "image_size": jnp.asarray([[float(CANVAS[0]), float(CANVAS[1])]]),
        "scale_back": jnp.ones((1, 2), jnp.float32),
    }
    dets_j = jax.jit(model_j.predict)(params, batch)
    with torch.no_grad():
        dets_t = model_t([_torch_input(img[0])])[0]
    valid = np.asarray(dets_j["valid"][0])
    boxes_j = np.asarray(dets_j["boxes"][0])[valid]
    labels_j = np.asarray(dets_j["labels"][0])[valid]
    scores_j = np.asarray(dets_j["scores"][0])[valid]
    boxes_t = dets_t["boxes"].numpy()
    labels_t = dets_t["labels"].numpy()
    scores_t = dets_t["scores"].numpy()
    # compare confident detections both directions (random-weight scores
    # cluster near uniform; NMS near-ties may differ discretely)
    thr = float(np.quantile(scores_t, 0.75)) if len(scores_t) else 0.0
    rate_tj = _match_rate(boxes_t[scores_t >= thr], labels_t[scores_t >= thr],
                          boxes_j, labels_j)
    rate_jt = _match_rate(boxes_j[scores_j >= thr], labels_j[scores_j >= thr],
                          boxes_t, labels_t)
    assert rate_tj >= 0.7 and rate_jt >= 0.7, (rate_tj, rate_jt)


def test_fcos_e2e_same_weights(ref_fcos):
    from dgod_tpu.models.dg_fcos import DGFCOSModel
    from dgod_tpu.utils import weights as weights_lib

    torch.manual_seed(0)
    model_t = ref_fcos.fcos_resnet50_fpn(
        pretrained=False, num_classes=9, pretrained_backbone=False,
        min_size=CANVAS[0], max_size=CANVAS[1])
    model_t.eval()
    sd = {k: v.detach().numpy() for k, v in model_t.state_dict().items()}

    model_j = DGFCOSModel(num_classes=9, num_domains=2, canvas=CANVAS,
                          compute_dtype=jnp.float32)
    params = model_j.init(jax.random.PRNGKey(0))
    stats = weights_lib.port_torchvision(params["detector"], sd, "FCOS")
    assert stats["dropped_class_dependent"] == []
    assert stats["merged"] > 250, stats

    rng = np.random.RandomState(2)
    img = rng.randint(0, 255, (1, *CANVAS, 3), np.uint8)

    # -- dense head outputs over all P3..P7 locations (covers backbone,
    # FPN, P6P7 extra blocks, both head towers, and the converter) --
    outputs_j, _ = model_j.forward(params, jnp.asarray(img))
    with torch.no_grad():
        # the reference normalises with ImageNet stats inside its transform
        # (fcos.py:479-483); apply the same before the bare backbone call
        mean = torch.tensor([0.485, 0.456, 0.406])[:, None, None]
        std = torch.tensor([0.229, 0.224, 0.225])[:, None, None]
        x_t = (_torch_input(img[0]) - mean) / std
        feats_t = list(model_t.backbone(x_t[None]).values())
        head_t = model_t.head(feats_t)
    np.testing.assert_allclose(
        np.asarray(outputs_j["cls_logits"]),
        head_t["cls_logits"].numpy(), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(outputs_j["bbox_regression"]),
        head_t["bbox_regression"].numpy(), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(outputs_j["bbox_ctrness"]),
        head_t["bbox_ctrness"].numpy(), rtol=1e-3, atol=1e-3)

    # -- postprocessed detections --
    batch = {
        "image": jnp.asarray(img),
        "image_size": jnp.asarray([[float(CANVAS[0]), float(CANVAS[1])]]),
        "scale_back": jnp.ones((1, 2), jnp.float32),
    }
    dets_j = jax.jit(model_j.predict)(params, batch)
    with torch.no_grad():
        dets_t = model_t([_torch_input(img[0])])
        dets_t = dets_t[0] if isinstance(dets_t, list) else dets_t[1][0]
    valid = np.asarray(dets_j["valid"][0])
    boxes_j = np.asarray(dets_j["boxes"][0])[valid]
    labels_j = np.asarray(dets_j["labels"][0])[valid]
    scores_j = np.asarray(dets_j["scores"][0])[valid]
    boxes_t = dets_t["boxes"].numpy()
    labels_t = dets_t["labels"].numpy()
    scores_t = dets_t["scores"].numpy()
    thr = float(np.quantile(scores_t, 0.75)) if len(scores_t) else 0.0
    rate_tj = _match_rate(boxes_t[scores_t >= thr], labels_t[scores_t >= thr],
                          boxes_j, labels_j)
    rate_jt = _match_rate(boxes_j[scores_j >= thr], labels_j[scores_j >= thr],
                          boxes_t, labels_t)
    assert rate_tj >= 0.7 and rate_jt >= 0.7, (rate_tj, rate_jt)

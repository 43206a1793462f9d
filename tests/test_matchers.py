import numpy as np
import jax
import jax.numpy as jnp

from dgod_tpu.ops import matchers as M
from dgod_tpu.ops import anchors as A
from dgod_tpu.ops import boxes as B


def test_iou_match_thresholds():
    # 1 gt, 4 predictions with IoUs 0.9, 0.5, 0.2, 0.0
    iou = jnp.array([[0.9, 0.5, 0.2, 0.0]])
    out = np.asarray(
        M.iou_match(iou, jnp.array([True]), 0.7, 0.3, allow_low_quality_matches=False)
    )
    assert out[0] == 0  # above high
    assert out[1] == M.BETWEEN
    assert out[2] == M.BELOW_LOW
    assert out[3] == M.BELOW_LOW


def test_iou_match_low_quality_rescue():
    # gt's best prediction has IoU 0.4 (< high): rescued when allowed
    iou = jnp.array([[0.4, 0.1]])
    no_rescue = np.asarray(M.iou_match(iou, jnp.array([True]), 0.7, 0.3, False))
    rescue = np.asarray(M.iou_match(iou, jnp.array([True]), 0.7, 0.3, True))
    assert no_rescue[0] == M.BETWEEN
    assert rescue[0] == 0


def test_iou_match_no_gt_all_background():
    iou = jnp.zeros((3, 5))
    out = np.asarray(M.iou_match(iou, jnp.zeros(3, bool), 0.7, 0.3, True))
    assert (out == M.BELOW_LOW).all()


def test_fcos_match_center_and_scale():
    # two levels: strides 8 and 16 on a 64x64 image
    shapes = [(8, 8), (4, 4)]
    anchors, counts = A.fcos_anchors(shapes, (64, 64), sizes=(8, 16))
    anchors = jnp.asarray(anchors)
    # a 24x24 gt centred at (20, 20): max reg distance from its centre cells
    gt = jnp.array([[8.0, 8.0, 32.0, 32.0], [0.0, 0.0, 0.0, 0.0]])
    valid = jnp.array([True, False])
    matched = np.asarray(
        M.fcos_match(anchors, gt, valid, tuple(counts))
    )
    # some level-0 anchors must match (lower bound 0 on first level)
    lvl0 = matched[: counts[0]]
    assert (lvl0 == 0).any()
    # no anchor may match the invalid gt
    assert not (matched == 1).any()
    # matched anchors' centres must lie inside the gt box
    ctrs = np.asarray(0.5 * (anchors[:, :2] + anchors[:, 2:]))
    for i in np.where(matched == 0)[0]:
        assert (ctrs[i] > 8).all() and (ctrs[i] < 32).all()


def test_fcos_match_min_area_tiebreak():
    shapes = [(8, 8)]
    anchors, counts = A.fcos_anchors(shapes, (64, 64), sizes=(8,))
    anchors = jnp.asarray(anchors)
    # big and small gt covering the same centre; small one must win
    gt = jnp.array([[0.0, 0.0, 48.0, 48.0], [16.0, 16.0, 32.0, 32.0]])
    valid = jnp.array([True, True])
    matched = np.asarray(M.fcos_match(anchors, gt, valid, tuple(counts)))
    ctrs = np.asarray(0.5 * (anchors[:, :2] + anchors[:, 2:]))
    inside_small = (
        (ctrs[:, 0] > 16) & (ctrs[:, 0] < 32) & (ctrs[:, 1] > 16) & (ctrs[:, 1] < 32)
    )
    # every anchor matched to the small gt region prefers gt 1
    overlap = matched[inside_small]
    assert (overlap != 0).all()


def test_balanced_sample_counts():
    rng = jax.random.PRNGKey(0)
    pos = jnp.zeros(1000, bool).at[:30].set(True)
    neg = jnp.zeros(1000, bool).at[500:].set(True)
    res = M.balanced_sample(pos, neg, 256, 0.5, rng)
    idx, is_pos, valid = map(np.asarray, res)
    assert valid.all()  # plenty of negatives available
    assert is_pos.sum() == 30  # min(30, 128)
    assert (idx[is_pos] < 30).all()
    assert (idx[~is_pos] >= 500).all()
    # no duplicate picks among valid
    assert len(np.unique(idx)) == 256


def test_balanced_sample_pos_cap():
    rng = jax.random.PRNGKey(1)
    pos = jnp.zeros(1000, bool).at[:400].set(True)
    neg = jnp.zeros(1000, bool).at[500:].set(True)
    res = M.balanced_sample(pos, neg, 256, 0.25, rng)
    _, is_pos, valid = map(np.asarray, res)
    assert is_pos.sum() == 64  # cap at 256*0.25
    assert valid.all()


def test_rpn_anchor_layout():
    anchors, counts = A.rpn_anchors([(2, 3)], (16, 24), sizes=((32,),))
    assert anchors.shape == (2 * 3 * 3, 4)
    # first cell's anchors centred at (0, 0)
    ctr = 0.5 * (anchors[:3, :2] + anchors[:3, 2:])
    np.testing.assert_allclose(ctr, 0.0, atol=0.5)
    # areas approximately size^2 for all aspect ratios
    areas = (anchors[:3, 2] - anchors[:3, 0]) * (anchors[:3, 3] - anchors[:3, 1])
    np.testing.assert_allclose(areas, 32 * 32, rtol=0.1)

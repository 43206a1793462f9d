import numpy as np

from dgod_tpu.data import transforms as T
from dgod_tpu.data.dataset import (ConcatDataset, SyntheticDataset,
                                   decode_boxes_string, decode_labels_string,
                                   sanitize_boxes)
from dgod_tpu.data.loader import EvalLoader, TrainLoader, epoch_batch_indices


def test_decode_strings():
    b = decode_boxes_string("10 20 30 40;5 5 15 25")
    np.testing.assert_array_equal(b, [[10, 20, 30, 40], [5, 5, 15, 25]])
    assert decode_boxes_string("no_box").shape == (0, 4)
    assert decode_boxes_string("garbage strings here").shape == (0, 4)
    # negative coords clip to 0 (DrivingDataset.py:101)
    np.testing.assert_array_equal(
        decode_boxes_string("-5 1 10 10"), [[0, 1, 10, 10]]
    )
    np.testing.assert_array_equal(decode_labels_string("1;2;8"), [1, 2, 8])
    assert decode_labels_string("no_label").shape == (0,)


def test_sanitize_boxes_bdd_fixups():
    boxes = np.array([[0, 0, 2000, 40], [10, 10, 10, 20]], np.float32)
    out = sanitize_boxes(boxes, height=100, width=200)
    assert out[0, 2] == 199  # clip to width-1
    assert out[1, 0] == 9 and out[1, 2] == 10  # degenerate x fixed by x1-=1


def test_train_example_resize_and_boxes():
    img = np.zeros((300, 600, 3), np.uint8)
    boxes = np.array([[60, 30, 300, 150]], np.float32)  # scales x2 both dims
    labels = np.array([1], np.int32)
    rng = np.random.RandomState(1)
    ex = T.train_example(img, boxes, labels, 0, rng)
    assert ex.image.shape == (*T.CANVAS, 3)
    assert ex.gt_valid.sum() == 1
    b = ex.boxes[0]
    # either flipped or not; y coords always scale x2
    assert b[1] == 60 and b[3] == 300
    assert (b[0], b[2]) in {(120.0, 600.0), (600.0, 1080.0)}


def test_train_example_min_area_filter():
    img = np.zeros((600, 1200, 3), np.uint8)
    boxes = np.array([[0, 0, 3, 3], [0, 0, 100, 100]], np.float32)
    labels = np.array([1, 2], np.int32)
    ex = T.train_example(img, boxes, labels, 0, np.random.RandomState(0))
    assert ex.gt_valid.sum() == 1
    assert ex.labels[0] == 2


def test_eval_example_scales():
    img = np.zeros((1024, 2048, 3), np.uint8)
    boxes = np.array([[100, 100, 400, 300]], np.float32)
    ex = T.eval_example(img, boxes, np.array([1], np.int32), 0,
                        resize_to_train_size=False)
    # 1024x2048 -> min(600/1024, 1200/2048) -> 600x1200 content
    np.testing.assert_allclose(ex.image_size, [600, 1200])
    np.testing.assert_allclose(ex.scale_back, [1024 / 600, 2048 / 1200])
    # GT stays in original frame
    np.testing.assert_allclose(ex.boxes[0], [100, 100, 400, 300])


def test_epoch_batch_indices_dg_duplicates():
    rng = np.random.RandomState(0)
    batches = epoch_batch_indices(20, 4, dg=True, rng=rng)
    assert len(batches) == 10
    for i in range(0, 10, 2):
        np.testing.assert_array_equal(batches[i], batches[i + 1])
    batches_nd = epoch_batch_indices(20, 4, dg=False, rng=rng)
    assert len(batches_nd) == 5


def test_train_loader_dg_pairs_identical():
    ds = SyntheticDataset(12, domain=0)
    loader = TrainLoader(ds, 4, dg=True, seed=0, num_workers=2)
    batches = list(loader.epoch())
    assert len(batches) == 6
    for i in range(0, 6, 2):
        np.testing.assert_array_equal(batches[i]["image"], batches[i + 1]["image"])
        np.testing.assert_array_equal(batches[i]["boxes"], batches[i + 1]["boxes"])
    assert batches[0]["image"].shape == (4, *T.CANVAS, 3)


def test_concat_dataset_and_domains():
    d0 = SyntheticDataset(3, domain=0)
    d1 = SyntheticDataset(5, domain=1)
    cat = ConcatDataset([d0, d1])
    assert len(cat) == 8
    assert cat[2][3] == 0
    assert cat[3][3] == 1
    assert cat[7][3] == 1


def test_eval_loader_tail_batch():
    ds = SyntheticDataset(5, domain=0)
    loader = EvalLoader(ds, batch_size=2, resize_to_train_size=True, num_workers=2)
    batches = list(loader)
    assert len(batches) == 3
    assert batches[-1].get("num_real") == 1


def test_eval_loader_bounded_inflight():
    """Backpressure: undelivered decoded examples stay <= the window even
    when the consumer is slow (submitting the whole dataset up front would
    make peak host memory linear in dataset size)."""
    import threading

    class Counting(SyntheticDataset):
        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            self.calls = 0
            self._lock = threading.Lock()

        def __getitem__(self, idx):
            with self._lock:
                self.calls += 1
            return super().__getitem__(idx)

    ds = Counting(64, domain=0, image_hw=(32, 64))
    loader = EvalLoader(ds, batch_size=2, resize_to_train_size=True,
                        num_workers=2, max_gt=8)
    window = max(2 * 2, 4 * 2)
    consumed = 0
    for batch in loader:
        consumed += batch["image"].shape[0]
        # in-flight refills race slightly; allow the worker count as slack
        assert ds.calls <= consumed + window + 2, (
            f"calls {ds.calls} consumed {consumed}"
        )
    assert consumed == 64 and ds.calls == 64


def test_driving_dataset_decode_cache(tmp_path):
    """Decode cache: identical pixels, budget cap, no re-decode on hits."""
    import cv2

    from dgod_tpu.data.dataset import DrivingDataset

    imgs = []
    for i in range(3):
        img = np.full((16, 24, 3), 10 * (i + 1), np.uint8)
        img[2:6, 4:12] = 200  # structure so BGR<->RGB mistakes would show
        img[:, :, 0] = i
        cv2.imwrite(str(tmp_path / f"im{i}.png"), img)
        imgs.append(img)
    with open(tmp_path / "ann.csv", "w") as f:
        f.write("image_name,BoxesString,LabelsString\n")
        for i in range(3):
            f.write(f"im{i}.png,1 1 10 10,1\n")

    per_img = 16 * 24 * 3
    ds = DrivingDataset(str(tmp_path / "ann.csv"), str(tmp_path) + "/",
                        domain=0, decode_cache_bytes=2 * per_img)
    first = [ds[i][0].copy() for i in range(3)]
    # budget admits exactly two images; the third stays uncached
    assert len(ds._cache) == 2 and ds._cache_used == 2 * per_img
    second = [ds[i][0] for i in range(3)]
    for a, b in zip(first, second):
        np.testing.assert_array_equal(a, b)
    # cached arrays are served as shared read-only views
    assert not second[0].flags.writeable
    # uncached path still decodes fresh writable arrays
    assert second[2].flags.writeable
    # cache disabled by default
    ds2 = DrivingDataset(str(tmp_path / "ann.csv"), str(tmp_path) + "/", domain=0)
    ds2[0]
    assert not ds2._cache


def test_process_train_loader_surfaces_child_failure():
    """A failing child (here: empty dataset -> steps_per_epoch 0) must
    raise in the parent promptly instead of hanging epoch() forever."""
    import pytest

    from dgod_tpu.data.loader import ProcessTrainLoader

    ds = SyntheticDataset(1, domain=0, image_hw=(32, 64))  # < batch_size
    loader = ProcessTrainLoader(ds, batch_size=2, dg=False, num_workers=1,
                                max_gt=8, n_slots=2)
    try:
        with pytest.raises(RuntimeError, match="loader child process"):
            next(iter(loader.epoch()))
    finally:
        loader.close()


def test_process_train_loader_matches_thread_loader():
    """ProcessTrainLoader: same contract as TrainLoader — fixed shapes,
    dg duplicate batches identical, full epochs, clean shutdown."""
    from dgod_tpu.data.loader import ProcessTrainLoader

    ds = SyntheticDataset(12, domain=0, image_hw=(32, 64))
    loader = ProcessTrainLoader(ds, batch_size=2, dg=True, seed=7,
                                num_workers=2, max_gt=8, n_slots=2)
    try:
        assert loader.steps_per_epoch() == 12
        batches = list(loader.epoch())
        assert len(batches) == 12
        for b in batches:
            assert b["image"].shape == (2, T.CANVAS[0], T.CANVAS[1], 3)
            assert b["boxes"].shape == (2, 8, 4)
        # dg mode: consecutive batches are identical replays
        for i in range(0, 12, 2):
            np.testing.assert_array_equal(batches[i]["image"],
                                          batches[i + 1]["image"])
            np.testing.assert_array_equal(batches[i]["boxes"],
                                          batches[i + 1]["boxes"])
        # batches are copies, not live views into the shm ring
        first = batches[0]["image"].copy()
        list(loader.epoch())
        np.testing.assert_array_equal(batches[0]["image"], first)
    finally:
        loader.close()
    assert loader._proc is None


def test_subset_view():
    from dgod_tpu.data.dataset import Subset

    ds = SyntheticDataset(10, domain=0)
    sub = Subset(ds, 3, 7)
    assert len(sub) == 4
    np.testing.assert_array_equal(sub[0][0], ds[3][0])
    np.testing.assert_array_equal(sub[3][0], ds[6][0])
    import pytest
    with pytest.raises(IndexError):
        sub[4]
    with pytest.raises(AssertionError):
        Subset(ds, 5, 11)


def test_eval_loader_pad_to_batches():
    """Hosts with a short eval shard pad with num_real=0 dummy batches so
    every host issues the same number of SPMD eval programs."""
    ds = SyntheticDataset(3, domain=0)
    loader = EvalLoader(ds, batch_size=2, resize_to_train_size=True,
                        num_workers=2, pad_to_batches=4)
    batches = list(loader)
    assert len(batches) == 4 and len(loader) == 4
    assert "num_real" not in batches[0]          # full batch
    assert batches[1]["num_real"] == 1           # real tail
    assert batches[2]["num_real"] == 0           # padding
    assert batches[3]["num_real"] == 0
    assert batches[2]["image"].shape == batches[0]["image"].shape


def test_train_loader_resample_replay_quirk():
    """--reference_quirks replay: the dg duplicate batch must contain the
    SAME images but independently re-sampled augmentation (the reference
    re-runs __getitem__, DGcommon.py:139-151); default replays identical
    pixels."""
    ds = SyntheticDataset(12, domain=0)

    def pairs(resample):
        loader = TrainLoader(ds, 4, dg=True, num_workers=2, seed=3,
                             resample_replay=resample)
        batches = list(loader.epoch())
        return list(zip(batches[::2], batches[1::2]))

    # default: bit-identical replay
    for a, b in pairs(False):
        np.testing.assert_array_equal(a["image"], b["image"])

    # quirk: same boxes-or-flipped content, at least one pair differs
    any_diff = False
    for a, b in pairs(True):
        if not np.array_equal(a["image"], b["image"]):
            any_diff = True
    assert any_diff, "resample_replay produced identical pixels everywhere"

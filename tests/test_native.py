"""Native data-path library: build, bind, and match the numpy/cv2 path."""
import numpy as np
import pytest

from dgod_tpu.data import native as N


@pytest.fixture(scope="module")
def lib():
    if not N.available():
        pytest.skip("native library unavailable (no g++?)")
    return N.get_lib()


def test_parse_boxes_matches_reference_decode(lib):
    out = N.parse_boxes("10 20 30 40;-5 1 7 9")
    np.testing.assert_array_equal(out, [[10, 20, 30, 40], [0, 1, 7, 9]])
    assert N.parse_boxes("no_box").shape == (0, 4)
    assert N.parse_boxes("bad data !").shape == (0, 4)
    # float inputs are int-truncated like the reference decode
    np.testing.assert_array_equal(N.parse_boxes("1.7 2.9 3.1 4.9"), [[1, 2, 3, 4]])


def test_parse_beyond_default_cap_matches_fallback(lib):
    # >512 annotations must decode identically on the native and numpy
    # paths (the wrapper sizes the C buffer from the string, so the
    # parser's cap can never truncate)
    from dgod_tpu.data.dataset import decode_boxes_string, decode_labels_string

    n = 700
    box_s = ";".join(f"{i} {i + 1} {i + 10} {i + 20}" for i in range(n))
    lab_s = ";".join(str(i % 8 + 1) for i in range(n))
    np.testing.assert_array_equal(N.parse_boxes(box_s), decode_boxes_string(box_s))
    np.testing.assert_array_equal(N.parse_labels(lab_s), decode_labels_string(lab_s))
    assert N.parse_boxes(box_s).shape == (n, 4)


def test_parse_labels(lib):
    np.testing.assert_array_equal(N.parse_labels("1;5;8"), [1, 5, 8])
    assert N.parse_labels("no_label").shape == (0,)
    assert N.parse_labels("oops").shape == (0,)


@pytest.mark.parametrize("impl", ["native", "cv2"])
def test_prepare_image_matches_cv2(lib, impl, monkeypatch):
    import cv2

    monkeypatch.setenv("DGOD_IMAGE_PREP", impl)
    rng = np.random.RandomState(0)
    src = rng.randint(0, 255, (60, 120, 3), np.uint8)
    out = N.prepare_image(src, (64, 128), (30, 60), flip=False)
    ref = np.zeros((64, 128, 3), np.uint8)
    ref[:30, :60] = cv2.resize(src, (60, 30), interpolation=cv2.INTER_LINEAR)
    # bilinear rounding may differ by 1 lsb between impls
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1
    # padding must be zero
    assert out[30:].sum() == 0 and out[:, 60:].sum() == 0


@pytest.mark.parametrize("impl", ["native", "cv2"])
def test_prepare_image_flip(lib, impl, monkeypatch):
    monkeypatch.setenv("DGOD_IMAGE_PREP", impl)
    src = np.zeros((10, 10, 3), np.uint8)
    src[:, :5] = 255  # left half white
    out = N.prepare_image(src, (10, 10), (10, 10), flip=True)
    assert out[:, :5].sum() == 0
    assert (out[:, 5:] == 255).all()


@pytest.mark.parametrize("impl", ["native", "cv2"])
def test_prepare_image_flip_strided_canvas(lib, impl, monkeypatch):
    """flip must land even when the resize region is a row-strided canvas
    VIEW (rw < cw) — the case where cv2 may reallocate instead of writing
    dst in place, silently dropping the flip (boxes are mirrored
    unconditionally upstream, so a dropped pixel flip corrupts GT)."""
    monkeypatch.setenv("DGOD_IMAGE_PREP", impl)
    src = np.zeros((10, 10, 3), np.uint8)
    src[:, :5] = 255  # left half white
    out = N.prepare_image(src, (16, 32), (10, 10), flip=True)
    assert out[:10, :5].sum() == 0          # flipped: left now black
    assert (out[:10, 5:10] == 255).all()    # right now white
    assert out[10:].sum() == 0 and out[:, 10:].sum() == 0  # pad untouched


def test_prepare_image_numpy_last_resort(monkeypatch):
    """The pure-numpy path (no lib, no cv2) must stay within 2 LSB of cv2."""
    import cv2

    rng = np.random.RandomState(1)
    src = rng.randint(0, 255, (60, 120, 3), np.uint8)
    monkeypatch.setenv("DGOD_IMAGE_PREP", "cv2")
    # simulate cv2 missing inside prepare_image by blocking its import
    import builtins

    real_import = builtins.__import__

    def fake_import(name, *a, **k):
        if name == "cv2":
            raise ImportError("blocked for test")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", fake_import)
    out = N.prepare_image(src, (64, 128), (30, 60), flip=False)
    monkeypatch.setattr(builtins, "__import__", real_import)
    ref = np.zeros((64, 128, 3), np.uint8)
    ref[:30, :60] = cv2.resize(src, (60, 30), interpolation=cv2.INTER_LINEAR)
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 2
    assert out[30:].sum() == 0 and out[:, 60:].sum() == 0

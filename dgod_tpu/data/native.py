"""ctypes bindings for the native data-path library (native/dgod_native.cpp).

Auto-builds the shared library with g++ on first use (cached next to the
source); every entry point has a pure-numpy fallback so the framework works
without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_HERE, "native", "dgod_native.cpp")
_LIB_PATH = os.path.join(_HERE, "native", "libdgod_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             "-pthread", _SRC, "-o", _LIB_PATH],
            check=True, capture_output=True, timeout=240,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) and os.path.exists(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.dgod_prepare_image.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.dgod_parse_boxes.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int
        ]
        lib.dgod_parse_boxes.restype = ctypes.c_int
        lib.dgod_parse_labels.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int), ctypes.c_int
        ]
        lib.dgod_parse_labels.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def _image_prep_impl() -> str:
    """Pick the image-prep implementation: 'cv2' or 'native'.

    Measured on this host class (1024x2048 -> 608x1216, single thread):
    cv2.resize into a strided canvas view = 2.1 ms/img vs the in-repo
    fixed-point C++ kernel = 5.6 ms/img — OpenCV's SIMD resize beats our
    scalar one ~2.7x, so cv2 is the default whenever it imports. The two
    agree to +/-1 LSB (tests/test_native.py). DGOD_IMAGE_PREP=native|cv2
    overrides (bench_loader.py uses it for the A/B); the native kernel
    remains the zero-dependency path for cv2-less hosts.
    """
    choice = os.environ.get("DGOD_IMAGE_PREP", "")
    if choice in ("native", "cv2"):
        return choice
    try:
        import cv2  # noqa: F401

        return "cv2"
    except ImportError:
        return "native"


def prepare_image(src: np.ndarray, canvas_hw, resized_hw, flip: bool) -> np.ndarray:
    """Fused resize+flip+pad to a uint8 canvas.

    Replaces the reference's albumentations Resize + HorizontalFlip +
    collate-time stack (train_driving_dg.py:125-133, DGcommon.py:14-31)
    with one pass producing the static padded canvas directly.
    """
    ch, cw = canvas_hw
    rh, rw = resized_hw
    impl = _image_prep_impl()
    lib = get_lib() if impl == "native" else None
    if lib is not None:
        src = np.ascontiguousarray(src, np.uint8)
        out = np.empty((ch, cw, 3), np.uint8)
        lib.dgod_prepare_image(
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            src.shape[0], src.shape[1],
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ch, cw, rh, rw, int(flip),
        )
        return out
    try:
        import cv2
    except ImportError:  # DGOD_IMAGE_PREP=cv2 on a cv2-less host
        cv2 = None
    out = np.zeros((ch, cw, 3), np.uint8)
    if cv2 is not None:
        # resize straight into the canvas view (cv2 accepts a row-strided
        # dst as long as pixels are contiguous) — skips the pad copy
        region = out[:rh, :rw]
        ret = cv2.resize(src, (rw, rh), dst=region,
                         interpolation=cv2.INTER_LINEAR)
        if ret is not region:  # cv2 reallocated instead of writing in place
            region[...] = ret
        if flip:
            # same reallocation guard as resize above: cv2 may return a
            # fresh array instead of writing the row-strided view, and a
            # silently dropped flip means mirrored GT boxes over unflipped
            # pixels (transforms.py mirrors boxes unconditionally)
            ret = cv2.flip(region, 1, dst=region)
            if ret is not region:
                region[...] = ret
        return out
    # pure-numpy last resort (nearest-ish bilinear via float32)
    ys = np.clip(((np.arange(rh) + 0.5) * src.shape[0] / rh - 0.5), 0, None)
    xs = np.clip(((np.arange(rw) + 0.5) * src.shape[1] / rw - 0.5), 0, None)
    y0 = np.minimum(ys.astype(np.int64), src.shape[0] - 1)
    x0 = np.minimum(xs.astype(np.int64), src.shape[1] - 1)
    y1 = np.minimum(y0 + 1, src.shape[0] - 1)
    x1 = np.minimum(x0 + 1, src.shape[1] - 1)
    wy = (ys - y0)[:, None, None].astype(np.float32)
    wx = (xs - x0)[None, :, None].astype(np.float32)
    s = src.astype(np.float32)
    top = s[y0][:, x0] * (1 - wx) + s[y0][:, x1] * wx
    bot = s[y1][:, x0] * (1 - wx) + s[y1][:, x1] * wx
    r = top * (1 - wy) + bot * wy
    if flip:
        r = r[:, ::-1]
    out[:rh, :rw] = np.clip(r + 0.5, 0, 255).astype(np.uint8)
    return out


def parse_boxes(s: str, max_boxes: int = 512) -> np.ndarray:
    lib = get_lib()
    if lib is not None:
        # size the buffer from the string (boxes = separators + 1) so the C
        # parser's cap can never truncate — keeps native and numpy-fallback
        # decodes identical for annotation counts beyond `max_boxes`
        max_boxes = max(max_boxes, s.count(";") + 2)
        out = np.empty((max_boxes, 4), np.float32)
        n = lib.dgod_parse_boxes(
            s.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            max_boxes,
        )
        if n >= 0:
            return out[:n].copy()
        return np.zeros((0, 4), np.float32)
    from .dataset import decode_boxes_string

    return decode_boxes_string(s)


def parse_labels(s: str, max_labels: int = 512) -> np.ndarray:
    lib = get_lib()
    if lib is not None:
        max_labels = max(max_labels, s.count(";") + 2)  # see parse_boxes
        out = np.empty((max_labels,), np.int32)
        n = lib.dgod_parse_labels(
            s.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            max_labels,
        )
        if n >= 0:
            return out[:n].copy()
        return np.zeros((0,), np.int32)
    from .dataset import decode_labels_string

    return decode_labels_string(s)

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


def prepare_image(src: np.ndarray, canvas_hw, resized_hw, flip: bool) -> np.ndarray:
    """Fused resize+flip+pad to a uint8 canvas. Falls back to cv2/numpy."""
    lib = get_lib()
    ch, cw = canvas_hw
    rh, rw = resized_hw
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
    import cv2

    resized = cv2.resize(src, (rw, rh), interpolation=cv2.INTER_LINEAR)
    if flip:
        resized = resized[:, ::-1]
    out = np.zeros((ch, cw, 3), np.uint8)
    out[:rh, :rw] = resized
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

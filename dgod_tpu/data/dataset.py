"""CSV-driven driving-scene detection dataset (host side).

Parity with the reference DrivingDataset (DrivingDataset.py:7-105):
- CSV schema `image_name, BoxesString, LabelsString` with ';'-separated
  'x1 y1 x2 y2' boxes and `no_box` / `no_label` sentinels,
- eager decode of all annotation strings at init,
- malformed rows degrade to empty annotations (DrivingDataset.py:85-88,102-105),
- box decode casts to int and clips at 0 (DrivingDataset.py:101),
- the BDD sanitisation clips applied per image at load time
  (DrivingDataset.py:41-48).

Images load via OpenCV BGR->RGB exactly like the reference; a torch-free
synthetic mode (`root=None` rows with embedded arrays) backs the tests.
"""

from __future__ import annotations

import os
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd


def decode_boxes_string(s) -> np.ndarray:
    s = str(s)
    if s == "no_box":
        return np.zeros((0, 4), np.float32)
    try:
        boxes = np.array(
            [[float(v) for v in box.split(" ")] for box in s.split(";")]
        )
        return boxes.astype(np.int32).clip(min=0).astype(np.float32)
    except Exception:
        return np.zeros((0, 4), np.float32)


def decode_labels_string(s) -> np.ndarray:
    s = str(s)
    if s == "no_label":
        return np.zeros((0,), np.int32)
    try:
        return np.array([int(v) for v in s.split(";")], np.int32)
    except Exception:
        return np.zeros((0,), np.int32)


def sanitize_boxes(boxes: np.ndarray, height: int, width: int) -> np.ndarray:
    """BDD-style fixups (reference DrivingDataset.py:41-48)."""
    if len(boxes) == 0:
        return boxes
    boxes = boxes.copy()
    boxes[:, 0] = np.clip(boxes[:, 0], 0, width - 1)
    boxes[:, 1] = np.clip(boxes[:, 1], 0, height - 1)
    boxes[:, 2] = np.clip(boxes[:, 2], 1, width - 1)
    boxes[:, 3] = np.clip(boxes[:, 3], 1, height - 1)
    eq_x = boxes[:, 0] == boxes[:, 2]
    eq_y = boxes[:, 1] == boxes[:, 3]
    boxes[eq_x, 0] -= 1
    boxes[eq_y, 1] -= 1
    return boxes


class DrivingDataset:
    """Map-style dataset over one domain's CSV.

    `decode_cache_bytes` > 0 enables a decoded-image RAM cache: the first
    epoch pays the PNG/JPEG decode (the dominant host cost — ~15 of the
    ~17 ms/img at Cityscapes 1024x2048 on one core), later epochs serve
    read-only arrays from memory. The cache fills until the byte budget and
    then stops (epoch order is a fresh uniform shuffle, so eviction has no
    hit-rate advantage over fill-and-freeze, and a frozen cache needs no
    lock on the hit path). The reference re-decodes every image every epoch
    in its DataLoader workers (DrivingDataset.py:35-36, DGcommon.py:151).
    """

    def __init__(self, csv_file: str, root: str, domain: int,
                 decode_cache_bytes: int = 0):
        from . import native

        ann = pd.read_csv(csv_file)
        self.image_names: List[str] = list(ann["image_name"])
        self.root = root
        # eager decode like the reference (DrivingDataset.py:22-23); the C++
        # parsers (native.parse_*) fall back to the numpy decoders above
        self.boxes = [native.parse_boxes(str(s)) for s in ann["BoxesString"]]
        self.labels = [native.parse_labels(str(s)) for s in ann["LabelsString"]]
        self.domain = domain
        self._cache_budget = int(decode_cache_bytes)
        self._cache: dict = {}
        self._cache_used = 0
        self._cache_lock = threading.Lock()

    def __getstate__(self):
        # picklable for process-based loader workers: the lock cannot
        # cross processes and the decoded cache must not be shipped —
        # the child re-fills its own within the same budget
        state = self.__dict__.copy()
        state["_cache"] = {}
        state["_cache_used"] = 0
        del state["_cache_lock"]
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)
        self._cache_lock = threading.Lock()

    def __len__(self):
        return len(self.image_names)

    def load_image(self, idx: int) -> np.ndarray:
        cached = self._cache.get(idx)
        if cached is not None:
            return cached
        import cv2

        path = self.root + self.image_names[idx]
        img = cv2.imread(path)
        if img is None:
            raise FileNotFoundError(path)
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        if self._cache_budget > 0:
            with self._cache_lock:
                if idx not in self._cache and (
                        self._cache_used + img.nbytes <= self._cache_budget):
                    img.flags.writeable = False  # shared across threads
                    self._cache[idx] = img
                    self._cache_used += img.nbytes
        return img

    def __getitem__(self, idx: int):
        img = self.load_image(idx)
        boxes = sanitize_boxes(self.boxes[idx], img.shape[0], img.shape[1])
        return img, boxes, self.labels[idx].copy(), self.domain


class SyntheticDataset:
    """In-memory dataset with generated images — test/bench stand-in."""

    def __init__(self, n: int, domain: int = 0, image_hw=(128, 256), num_classes: int = 8,
                 max_boxes: int = 6, seed: int = 0):
        rng = np.random.RandomState(seed + domain)
        h, w = image_hw
        self.images = [
            rng.randint(0, 255, (h, w, 3), np.uint8) for _ in range(n)
        ]
        self.boxes, self.labels = [], []
        for _ in range(n):
            k = rng.randint(1, max_boxes + 1)
            xy = rng.uniform([0, 0], [w * 0.6, h * 0.6], (k, 2))
            wh = rng.uniform([w * 0.1, h * 0.1], [w * 0.35, h * 0.35], (k, 2))
            b = np.concatenate([xy, xy + wh], 1).astype(np.float32)
            self.boxes.append(b)
            self.labels.append(rng.randint(1, num_classes + 1, k).astype(np.int32))
        self.domain = domain

    def __len__(self):
        return len(self.images)

    def __getitem__(self, idx: int):
        return (
            self.images[idx].copy(),
            self.boxes[idx].copy(),
            self.labels[idx].copy(),
            self.domain,
        )


class Subset:
    """A contiguous [start, stop) view of a dataset.

    Used for per-host input sharding on multi-process runs: each host's
    loader sees only its `multihost.host_shard_range` slice so no host
    decodes images another host will consume (the reference is single-GPU
    and has no such concept, train_driving_dg.py:163)."""

    def __init__(self, dataset, start: int, stop: int):
        assert 0 <= start <= stop <= len(dataset), (start, stop, len(dataset))
        self.dataset = dataset
        self.start = int(start)
        self.stop = int(stop)

    def __len__(self):
        return self.stop - self.start

    def __getitem__(self, idx: int):
        if not 0 <= idx < len(self):
            raise IndexError(idx)
        return self.dataset[self.start + idx]


class ConcatDataset:
    """Concatenation of per-domain datasets (torch ConcatDataset parity)."""

    def __init__(self, datasets: Sequence):
        self.datasets = list(datasets)
        self.cum = np.cumsum([len(d) for d in self.datasets])

    def __len__(self):
        return int(self.cum[-1]) if len(self.datasets) else 0

    def __getitem__(self, idx: int):
        ds_idx = int(np.searchsorted(self.cum, idx, side="right"))
        prev = 0 if ds_idx == 0 else int(self.cum[ds_idx - 1])
        return self.datasets[ds_idx][idx - prev]

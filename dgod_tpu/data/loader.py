"""Batch loaders with the DG twice-per-batch sampler and threaded prefetch.

Parity: the reference's custom train_dataloader (DGcommon.py:139-151)
shuffles indices, chunks them into batches, and in 'dg' mode emits every
batch twice consecutively so the mode-0 and mode-k steps of the 5-mode
schedule see the same images. Host parallelism uses a thread pool (OpenCV
releases the GIL) standing in for the reference's 4 DataLoader workers
(DGcommon.py:151); a C++ decode path can slot under `fetch`.
"""

from __future__ import annotations

import threading
from concurrent.futures import ThreadPoolExecutor
from queue import Queue
from typing import Callable, Iterator, Optional

import numpy as np

from . import transforms as T


def device_prefetch(iterator, size: int = 2):
    """Asynchronously stage upcoming host batches on the device.

    jax.device_put is async; holding `size` batches in flight overlaps the
    uint8 host->device copy with the previous step's compute (the TPU
    analogue of the reference's DataLoader worker prefetch).
    """
    import collections

    import jax

    buf = collections.deque()
    for batch in iterator:
        buf.append(jax.device_put(batch))
        if len(buf) >= size:
            yield buf.popleft()
    while buf:
        yield buf.popleft()


def epoch_batch_indices(
    n: int, batch_size: int, dg: bool, rng: np.random.RandomState
) -> list[np.ndarray]:
    """Shuffled batch index lists; each batch duplicated in dg mode."""
    idx = rng.permutation(n)
    num_batches = n // batch_size
    out = []
    for i in range(num_batches):
        batch = idx[i * batch_size : (i + 1) * batch_size]
        out.append(batch)
        if dg:
            out.append(batch.copy())
    return out


class TrainLoader:
    """Iterates fixed-shape train batches; reshuffles every epoch
    (the reference reloads its dataloader every epoch for the same effect,
    train_driving_dg.py:163)."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        dg: bool,
        seed: int = 42,
        num_workers: int = 8,
        max_gt: int = T.MAX_GT,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.dg = dg
        self.rng = np.random.RandomState(seed)
        self.num_workers = num_workers
        self.max_gt = max_gt

    def steps_per_epoch(self) -> int:
        n = len(self.dataset) // self.batch_size
        return n * 2 if self.dg else n

    def _load_one(self, idx: int, aug_seed: int):
        img, boxes, labels, domain = self.dataset[int(idx)]
        return T.train_example(
            img, boxes, labels, domain, np.random.RandomState(aug_seed), self.max_gt
        )

    def epoch(self) -> Iterator[dict]:
        batches = epoch_batch_indices(
            len(self.dataset), self.batch_size, self.dg, self.rng
        )
        # dg mode: augmentation seeds key on the batch *pair* index so the
        # mode-0 and mode-k passes see IDENTICAL pixels. (The reference
        # re-runs __getitem__ for the duplicate, re-sampling the flip —
        # DGcommon.py:139-151 guarantees same images, not same augmentation;
        # replaying identical pixels matches the replay intent and is the
        # stricter behaviour.)
        with ThreadPoolExecutor(self.num_workers) as pool:
            pending = Queue()

            def submit(bi, batch):
                pair = bi // 2 if self.dg else bi
                seeds = [
                    int(self.rng_epoch_base + pair * 131071 + j) for j in range(len(batch))
                ]
                futures = [
                    pool.submit(self._load_one, idx, s)
                    for idx, s in zip(batch, seeds)
                ]
                pending.put(futures)

            self.rng_epoch_base = int(self.rng.randint(0, 2**31 - 1))
            prefetch = 3
            it = iter(enumerate(batches))
            buffered = 0
            for bi, batch in it:
                submit(bi, batch)
                buffered += 1
                if buffered > prefetch:
                    futures = pending.get()
                    yield T.stack_examples([f.result() for f in futures])
                    buffered -= 1
            while buffered:
                futures = pending.get()
                yield T.stack_examples([f.result() for f in futures])
                buffered -= 1


class EvalLoader:
    """Sequential fixed-shape eval batches (reference uses batch_size=1,
    train_driving_dg.py:146-147)."""

    def __init__(
        self,
        dataset,
        batch_size: int = 1,
        resize_to_train_size: bool = True,
        num_workers: int = 8,
        max_gt: int = T.MAX_GT,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.resize = resize_to_train_size
        self.num_workers = num_workers
        self.max_gt = max_gt

    def __len__(self):
        return (len(self.dataset) + self.batch_size - 1) // self.batch_size

    def _load_one(self, idx: int):
        img, boxes, labels, domain = self.dataset[int(idx)]
        return T.eval_example(img, boxes, labels, domain, self.resize, self.max_gt)

    def __iter__(self) -> Iterator[dict]:
        # bounded in-flight window: decoded canvases are ~MBs each, so
        # submitting the whole dataset up front would accumulate unbounded
        # host memory whenever eval is slower than decode. Peak undelivered
        # examples <= window (+ batch being assembled), flat in dataset size.
        import collections

        n = len(self.dataset)
        window = max(2 * self.num_workers, 4 * self.batch_size)
        with ThreadPoolExecutor(self.num_workers) as pool:
            inflight = collections.deque()
            next_idx = 0

            def fill():
                nonlocal next_idx
                while next_idx < n and len(inflight) < window:
                    inflight.append(pool.submit(self._load_one, next_idx))
                    next_idx += 1

            fill()
            group = []
            while inflight:
                group.append(inflight.popleft().result())
                fill()
                if len(group) == self.batch_size:
                    yield T.stack_examples(group)
                    group = []
            if group:
                # pad the tail batch by repeating the last example; caller
                # masks via 'num_real' count
                rem = len(group)
                batch = T.stack_examples(
                    group + [group[-1]] * (self.batch_size - rem))
                batch["num_real"] = rem
                yield batch

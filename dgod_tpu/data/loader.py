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

# serialises the os.environ scrub window in ProcessTrainLoader._start
# (multiprocessing spawn inherits the parent env; there is no env= param)
_SPAWN_ENV_LOCK = threading.Lock()


def device_prefetch(iterator, size: int = 2, place=None):
    """Asynchronously stage upcoming host batches on the device.

    jax.device_put is async; holding `size` batches in flight overlaps the
    uint8 host->device copy with the previous step's compute (the TPU
    analogue of the reference's DataLoader worker prefetch).

    `place` overrides the placement function — mesh runs pass the Trainer's
    batch placer, which builds globally-sharded arrays from each process's
    host-local batch (train/harness.py::Trainer._batch_placer).
    """
    import collections

    import jax

    if place is None:
        place = jax.device_put
    buf = collections.deque()
    for batch in iterator:
        buf.append(place(batch))
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
        resample_replay: bool = False,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        # reference-exact replay: the reference re-runs __getitem__ for the
        # dg duplicate batch, RE-SAMPLING the random flip (DGcommon.py:139-151
        # guarantees same images, not same pixels). Default (False) replays
        # identical pixels -- the stricter behaviour; --reference_quirks
        # flips this on for parity runs.
        self.resample_replay = resample_replay
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
                pair = bi // 2 if (self.dg and not self.resample_replay) \
                    else bi
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


def _slot_views(buf, spec):
    """Map one shm slot's buffer into per-key numpy views.

    The SINGLE definition of the slot layout, used by both sides of the
    ring: writer (_loader_proc_main) and reader (ProcessTrainLoader).
    """
    off, vs = 0, {}
    for k, s, d in spec:
        n = int(np.prod(s)) * np.dtype(d).itemsize
        vs[k] = np.ndarray(s, d, buffer=buf[off:off + n])
        off += n
    return vs


def _loader_proc_main(dataset, loader_kwargs, t_overrides, n_slots,
                      full_q, free_q):
    """Child-process body for ProcessTrainLoader.

    Runs a plain TrainLoader (thread pool and all — there is no tunnel/RPC
    client in this process, so its threads convoy with nothing) and writes
    each fixed-shape batch into one of `n_slots` shared-memory slots.
    Never imports jax. Any failure (bad file, empty dataset, transform
    error) is reported through the queue so the parent raises instead of
    hanging on a dead child.
    """
    from multiprocessing import shared_memory

    from . import transforms as T

    for k, v in t_overrides.items():
        setattr(T, k, v)

    spec = None
    shms = []
    views = []  # views[slot][key] -> np.ndarray into that slot's shm
    try:
        loader = TrainLoader(dataset, **loader_kwargs)
        if loader.steps_per_epoch() == 0:
            raise ValueError(
                f"empty loader: {len(dataset)} examples < batch_size "
                f"{loader_kwargs['batch_size']}")
        while True:
            for batch in loader.epoch():
                if spec is None:
                    spec = [(k, v.shape, str(v.dtype))
                            for k, v in batch.items()]
                    nbytes = sum(
                        int(np.prod(s)) * np.dtype(d).itemsize
                        for _, s, d in spec
                    )
                    for _ in range(n_slots):
                        shm = shared_memory.SharedMemory(
                            create=True, size=max(nbytes, 1))
                        shms.append(shm)
                        views.append(_slot_views(shm.buf, spec))
                    full_q.put(("spec", spec, [m.name for m in shms]))
                slot = free_q.get()
                if slot is None:
                    return
                for k, v in batch.items():
                    views[slot][k][...] = v
                full_q.put(("batch", slot))
    except (KeyboardInterrupt, BrokenPipeError, EOFError):
        pass
    except BaseException as e:  # surface to the parent, don't hang it
        try:
            full_q.put(("error", f"{type(e).__name__}: {e}"))
        except Exception:
            pass
    finally:
        for shm in shms:
            try:
                shm.close()
                shm.unlink()
            except Exception:
                pass


class ProcessTrainLoader:
    """TrainLoader running in a child process, batches via shared memory.

    Same iteration contract as TrainLoader (epoch() / steps_per_epoch(),
    per-epoch reshuffle, dg duplicate batches) — the reference gets this
    isolation from its multiprocess DataLoader workers (DGcommon.py:151).

    Why a process and not threads: when the training process hosts an RPC
    device client (the axon TPU tunnel here; any proxied PJRT backend in
    general), CPython's GIL convoys the client's many small socket
    completions against the loader threads' numpy work — measured on this
    host, jax.device_put of a 17.8 MB batch degrades from 11 ms solo to
    200-400 ms with 8 loader threads running. A child process gives the
    device client an uncontended GIL; the parent's per-batch work is one
    shm -> numpy copy. The child is spawned with PALLAS_AXON_POOL_IPS
    scrubbed so it never dials the (single-slot) TPU relay.
    """

    _T_OVERRIDE_KEYS = ("CANVAS", "TRAIN_SIZE", "MIN_SIZE", "MAX_SIZE",
                        "MIN_AREA", "MAX_GT")

    def __init__(self, dataset, batch_size: int, dg: bool, seed: int = 42,
                 num_workers: int = 8, max_gt: Optional[int] = None,
                 n_slots: int = 4, resample_replay: bool = False):
        self.dataset = dataset
        self.batch_size = batch_size
        self._kwargs = dict(
            batch_size=batch_size, dg=dg, seed=seed,
            num_workers=num_workers,
            max_gt=T.MAX_GT if max_gt is None else max_gt,
            resample_replay=resample_replay,
        )
        self.n_slots = n_slots
        self._proc = None
        self._spec = None
        self._shms: list = []
        self._views: list = []

    @property
    def dg(self) -> bool:
        return self._kwargs["dg"]

    @dg.setter
    def dg(self, value: bool):
        # the harness flips dg off when fusing pair steps (harness.py);
        # that must happen before the child process starts
        assert self._proc is None, "cannot change dg after the loader started"
        self._kwargs["dg"] = value

    def steps_per_epoch(self) -> int:
        n = len(self.dataset) // self.batch_size
        return n * 2 if self.dg else n

    def _get_msg(self):
        """Read the next queue message, failing fast if the child died.

        Polls with a short timeout instead of blocking forever: a child
        that crashed (or reported ("error", msg)) must surface as a
        RuntimeError in the training process, not a silent hang.
        """
        import queue as queue_mod

        while True:
            try:
                msg = self._full_q.get(timeout=5.0)
            except queue_mod.Empty:
                if self._proc is not None and not self._proc.is_alive():
                    raise RuntimeError(
                        "loader child process died "
                        f"(exitcode {self._proc.exitcode})")
                continue
            if msg and msg[0] == "error":
                raise RuntimeError(f"loader child process failed: {msg[1]}")
            return msg

    def _start(self):
        import multiprocessing as mp
        import os
        from multiprocessing import shared_memory

        ctx = mp.get_context("spawn")
        self._full_q = ctx.Queue()
        self._free_q = ctx.Queue()
        overrides = {k: getattr(T, k) for k in self._T_OVERRIDE_KEYS}
        self._proc = ctx.Process(
            target=_loader_proc_main,
            args=(self.dataset, self._kwargs, overrides, self.n_slots,
                  self._full_q, self._free_q),
            daemon=True,
        )
        # The child must NOT dial the TPU relay (sitecustomize register()
        # is gated on PALLAS_AXON_POOL_IPS) nor default to a device
        # backend. multiprocessing has no env= parameter (the spawned
        # interpreter inherits os.environ at start()), so the parent env
        # is scrubbed for the spawn window under a lock; the lock
        # serialises concurrent _start calls, and the window is a few ms.
        scrub = {"PALLAS_AXON_POOL_IPS": None, "JAX_PLATFORMS": "cpu"}
        with _SPAWN_ENV_LOCK:
            saved = {k: os.environ.get(k) for k in scrub}
            try:
                for k, v in scrub.items():
                    if v is None:
                        os.environ.pop(k, None)
                    else:
                        os.environ[k] = v
                self._proc.start()
            finally:
                for k, v in saved.items():
                    if v is None:
                        os.environ.pop(k, None)
                    else:
                        os.environ[k] = v
        kind, spec, names = self._get_msg()
        assert kind == "spec"
        self._spec = spec
        for name in names:
            shm = shared_memory.SharedMemory(name=name)
            self._shms.append(shm)
            self._views.append(_slot_views(shm.buf, spec))
        for slot in range(self.n_slots):
            self._free_q.put(slot)

    def epoch(self) -> Iterator[dict]:
        if self._proc is None:
            self._start()
        for _ in range(self.steps_per_epoch()):
            kind, slot = self._get_msg()
            assert kind == "batch"
            # copy out so the slot can be released before the (async)
            # device transfer of the yielded batch completes
            out = {k: v.copy() for k, v in self._views[slot].items()}
            self._free_q.put(slot)
            yield out

    def close(self):
        if self._proc is not None:
            try:
                self._free_q.put(None)
                self._proc.join(timeout=2)
            except Exception:
                pass
            if self._proc.is_alive():
                self._proc.terminate()
                self._proc.join(timeout=5)
            self._proc = None
        for shm in self._shms:
            try:
                shm.close()
            except Exception:
                pass
        self._shms, self._views = [], []

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


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
        pad_to_batches: Optional[int] = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.resize = resize_to_train_size
        self.num_workers = num_workers
        self.max_gt = max_gt
        # multi-process SPMD eval requires every host to issue the SAME
        # number of programs; hosts whose data shard rounds to fewer
        # batches pad with all-dummy batches (num_real=0, masked from the
        # metric) up to the global max batch count.
        self.pad_to_batches = pad_to_batches

    def __len__(self):
        n = (len(self.dataset) + self.batch_size - 1) // self.batch_size
        if self.pad_to_batches is not None:
            n = max(n, self.pad_to_batches)
        return n

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
            emitted = 0
            last = None
            while inflight:
                group.append(inflight.popleft().result())
                fill()
                if len(group) == self.batch_size:
                    last = T.stack_examples(group)
                    yield last
                    emitted += 1
                    group = []
            if group:
                # pad the tail batch by repeating the last example; caller
                # masks via 'num_real' count
                rem = len(group)
                last = T.stack_examples(
                    group + [group[-1]] * (self.batch_size - rem))
                last["num_real"] = rem
                yield last
                emitted += 1
            if self.pad_to_batches is not None and last is not None:
                while emitted < self.pad_to_batches:
                    dummy = dict(last)
                    dummy["num_real"] = 0
                    yield dummy
                    emitted += 1

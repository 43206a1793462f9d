#!/usr/bin/env python3
"""Host input-pipeline throughput: TrainLoader img/s, native C++ vs cv2 path.

The train device step sustains ~77-170 img/s/chip (bench.py); the host
pipeline must at least match that per host. Measures the full path:
dataset fetch -> fused resize/flip/pad -> collate, at Cityscapes-like
source resolution (1024x2048) to reference canvas 608x1216.

Usage: python scripts/bench_loader.py [n_images]
"""

import sys
import time

import numpy as np

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(
    __import__("os").path.abspath(__file__))))

from dgod_tpu.data import native  # noqa: E402
from dgod_tpu.data.dataset import SyntheticDataset  # noqa: E402
from dgod_tpu.data.loader import TrainLoader  # noqa: E402


def run(n: int, use_native: bool) -> float:
    if not use_native:
        # force the cv2/numpy fallback
        native._tried, saved = True, native._lib
        native._lib = None
    try:
        ds = SyntheticDataset(n, domain=0, image_hw=(1024, 2048), seed=1)
        loader = TrainLoader(ds, batch_size=8, dg=False, num_workers=8)
        t0 = time.perf_counter()
        total = 0
        for batch in loader.epoch():
            total += batch["image"].shape[0]
        dt = time.perf_counter() - t0
        return total / dt
    finally:
        if not use_native:
            native._lib, native._tried = saved, saved is not None


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    native_ok = native.available()
    # warm both paths (lib load, page cache, allocator) before measuring
    run(8, native_ok)
    run(8, False)
    r_native = run(n, True) if native_ok else float("nan")
    r_fallback = run(n, False)
    print(f"native available: {native_ok}")
    print(f"loader img/s  native: {r_native:.1f}  cv2-fallback: {r_fallback:.1f}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Host input-pipeline throughput: TrainLoader img/s, native C++ vs cv2 path.

The train device step sustains ~77-170 img/s/chip (bench.py); the host
pipeline must at least match that per host. Measures the full path:
dataset fetch -> fused resize/flip/pad -> collate, at Cityscapes-like
source resolution (1024x2048) to reference canvas 608x1216.

Usage: python scripts/bench_loader.py [n_images]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(
    __import__("os").path.abspath(__file__))))

from dgod_tpu.data import native  # noqa: E402
from dgod_tpu.data.dataset import SyntheticDataset  # noqa: E402
from dgod_tpu.data.loader import TrainLoader  # noqa: E402


def run(n: int, impl: str) -> float:
    os.environ["DGOD_IMAGE_PREP"] = impl  # A/B the image-prep path only;
    try:                                  # box/label parsing stays native
        ds = SyntheticDataset(n, domain=0, image_hw=(1024, 2048), seed=1)
        loader = TrainLoader(ds, batch_size=8, dg=False, num_workers=8)
        t0 = time.perf_counter()
        total = 0
        for batch in loader.epoch():
            total += batch["image"].shape[0]
        dt = time.perf_counter() - t0
        return total / dt
    finally:
        os.environ.pop("DGOD_IMAGE_PREP", None)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    native_ok = native.available()
    # warm both paths (lib load, page cache, allocator) before measuring
    run(8, "native" if native_ok else "cv2")
    run(8, "cv2")
    r_native = run(n, "native") if native_ok else float("nan")
    r_cv2 = run(n, "cv2")
    print(f"native available: {native_ok}  "
          f"default impl: {native._image_prep_impl()}")
    print(f"loader img/s  native: {r_native:.1f}  cv2: {r_cv2:.1f}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Time the deep RoIAlign rings at production shape for ONE ring config
(read from DGOD_ROI_BWD_RING / DGOD_ROI_FWD_RING at import). Run once per
config, serially (one python at a time on this host):

    for r in 6x3 8x4 10x5 4x2; do DGOD_ROI_BWD_RING=$r python scripts/sweep_roi_ring.py bwd; done

Prints one line per run; the recorded sweep lives in ROUND5.md.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from dgod_tpu.ops.pallas_roi_align import (  # noqa: E402
    DEEP_LEAD, DEEP_SLOTS, FWD_LEAD, FWD_SLOTS, TH, TW,
    _roi_align_bwd, _roi_align_fwd)
from dgod_tpu.utils.timing import calibrate_roundtrip, time_scalar_fn  # noqa: E402

STRIDES = (4, 8, 16, 32)
CANVAS = (608, 1216)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    rng = np.random.RandomState(0)
    Bp, Np, C = 8, 512, 256
    featsp = tuple(
        jnp.asarray(rng.randn(Bp, CANVAS[0] // s, CANVAS[1] // s, C) * 0.5,
                    jnp.bfloat16)
        for s in STRIDES
    )
    roisp = np.zeros((Bp, Np, 4), np.float32)
    for b in range(Bp):
        x1 = rng.uniform(0, 1100, Np)
        y1 = rng.uniform(0, 500, Np)
        w = np.exp(rng.uniform(np.log(8), np.log(400), Np))
        h = np.exp(rng.uniform(np.log(8), np.log(300), Np))
        roisp[b] = np.stack([x1, y1, x1 + w, y1 + h], 1)
    roisp = jnp.asarray(roisp)
    gp32 = jnp.asarray(rng.randn(Bp, Np, 7, 7, C) * 0.1, jnp.float32)
    rt = calibrate_roundtrip()

    if which in ("bwd", "both"):
        @jax.jit
        def sbwd(fs, r, gg):
            return sum(
                x.astype(jnp.float32).sum()
                for x in _roi_align_bwd(fs, r, gg, STRIDES, False, True)
            )

        ms = time_scalar_fn(sbwd, featsp, roisp, gp32, n=10, roundtrip_ms=rt)
        print(f"bwd ring {DEEP_SLOTS}x{DEEP_LEAD} [tile {TH}x{TW}]: "
              f"{ms:.2f} ms")
    if which in ("fwd", "both"):
        @jax.jit
        def sfwd(fs, r):
            return _roi_align_fwd(fs, r, STRIDES, False, True).sum()

        ms = time_scalar_fn(sfwd, featsp, roisp, n=10, roundtrip_ms=rt)
        print(f"fwd ring {FWD_SLOTS}x{FWD_LEAD} [tile {TH}x{TW}]: "
              f"{ms:.2f} ms")


if __name__ == "__main__":
    main()

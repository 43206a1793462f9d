"""Tunnel-safe timing helpers — the single home of the chip-measurement
methodology every benchmark/check script must follow.

On the axon relay backend, `jax.block_until_ready` returns BEFORE remote
execution completes, so the only reliable completion signal is fetching a
scalar the jitted computation reduces to (`float(fn(...))`). Each such
fetch pays a fixed host<->tunnel round-trip, which is measured on a
trivial program and subtracted. Scripts using these helpers:
bench_eval.py, check_pallas_roi_tpu.py, check_pallas_matchers_tpu.py,
profile_frcnn.py, tune_xla_options.py.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def calibrate_roundtrip(n: int = 20) -> float:
    """Fixed per-call round-trip (ms) of a scalar fetch on the default
    backend, measured on a trivial jitted program."""
    triv = jax.jit(lambda x: (x * 2).sum())
    x = jnp.ones((8,))
    float(triv(x))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(n):
        float(triv(x))
    return (time.perf_counter() - t0) / n * 1000.0


def time_scalar_fn(fn, *args, n: int = 10, roundtrip_ms: float | None = None,
                   warm: bool = True) -> float:
    """Average execution ms per call of `fn(*args)` where fn is a jitted
    (or compiled) callable returning a SCALAR. Warms once, fetches the
    scalar per timed call, subtracts the calibrated round-trip."""
    if roundtrip_ms is None:
        roundtrip_ms = calibrate_roundtrip()
    if warm:
        float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        float(fn(*args))
    return (time.perf_counter() - t0) / n * 1000.0 - roundtrip_ms

"""Observability: metrics logging + on-demand profiler traces.

The reference has no train-loss logging, no throughput metrics, and no
profiling (SURVEY.md §5: thop/psutil in requirements but never imported).
Here:

- MetricsLogger: append-only JSONL (step/epoch scoped), cheap enough to
  call every step; plays the role of the reference's TensorBoard logger
  with an analysis-friendly format.
- profile_steps(): capture a jax.profiler trace of N steps to a directory
  viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import json
import os
import time
from contextlib import contextmanager
from typing import Any, Dict, Optional


class MetricsLogger:
    def __init__(self, path: Optional[str]):
        self.path = path
        self._f = None
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._f = open(path, "a", buffering=1)
        self.t0 = time.time()

    def log(self, scope: str, step: int, metrics: Dict[str, Any]):
        if self._f is None:
            return
        rec = {
            "t": round(time.time() - self.t0, 3),
            "scope": scope,
            "step": step,
        }
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = str(v)
        self._f.write(json.dumps(rec) + "\n")

    def close(self):
        if self._f:
            self._f.close()
            self._f = None


@contextmanager
def profile_steps(log_dir: str):
    """Capture a device trace for the enclosed steps."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

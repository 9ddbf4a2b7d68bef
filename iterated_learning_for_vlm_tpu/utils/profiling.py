"""Profiling / step-timing utilities.

The reference has only wall-clock meters (SURVEY §5); the TPU equivalents:

- :func:`trace`: context manager around ``jax.profiler`` writing a TensorBoard
  trace (xplane) for a window of steps.
- :class:`StepTimer`: fenced step timing via ``block_until_ready`` with
  percentile summaries (p50/p90), for honest device-time measurement.
- :func:`device_memory_stats`: per-device HBM usage snapshot.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Fenced wall-clock timer: call ``tick(result)`` once per step."""

    def __init__(self, warmup: int = 3):
        self.warmup = warmup
        self.times: List[float] = []
        self._count = 0
        self._last: Optional[float] = None

    def tick(self, fence_value=None):
        if fence_value is not None:
            jax.block_until_ready(fence_value)
        now = time.perf_counter()
        if self._last is not None:
            self._count += 1
            if self._count > self.warmup:
                self.times.append(now - self._last)
        self._last = now

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {}
        arr = np.asarray(self.times)
        return {
            "steps": len(arr),
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p90_s": float(np.percentile(arr, 90)),
            "steps_per_sec": float(1.0 / arr.mean()),
        }


def device_memory_stats() -> Dict[str, Dict[str, float]]:
    out = {}
    for d in jax.devices():
        try:
            stats = d.memory_stats()
        except Exception:
            continue
        if stats:
            out[str(d)] = {
                "bytes_in_use_gb": stats.get("bytes_in_use", 0) / 2 ** 30,
                "peak_bytes_gb": stats.get("peak_bytes_in_use", 0) / 2 ** 30,
                "bytes_limit_gb": stats.get("bytes_limit", 0) / 2 ** 30,
            }
    return out

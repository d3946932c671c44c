"""Profiling / throughput instrumentation.

The reference has no live profiler (its ``timer`` helper imports from a
deleted module — ``loss/losses.py:7``; SURVEY §5). Here:

- :func:`trace` wraps ``jax.profiler.trace`` for TensorBoard-viewable traces;
- :class:`StepTimer` is the per-step samples/sec/chip meter used by the
  training loops and ``bench.py``.
"""
from __future__ import annotations

import contextlib
import time
from typing import List, Optional

import numpy as np


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """Profile the enclosed block into ``log_dir`` (no-op if None)."""
    if not log_dir:
        yield
        return
    import jax
    with jax.profiler.trace(log_dir):
        yield


class StepTimer:
    """Wall-clock step timer with warmup discard and percentile stats."""

    def __init__(self, batch_size: int, n_chips: int = 1, warmup: int = 2):
        self.batch_size = batch_size
        self.n_chips = n_chips
        self.warmup = warmup
        self._times: List[float] = []
        self._last: Optional[float] = None

    def start(self):
        self._last = time.perf_counter()

    def stop(self):
        if self._last is not None:
            self._times.append(time.perf_counter() - self._last)
            self._last = None

    def __enter__(self):
        self.start()
        return self

    def __exit__(self, *exc):
        self.stop()

    @property
    def steps(self) -> int:
        return max(len(self._times) - self.warmup, 0)

    def summary(self) -> dict:
        t = np.asarray(self._times[self.warmup:])
        if len(t) == 0:
            return {"steps": 0}
        sps = self.batch_size / t
        return {
            "steps": int(len(t)),
            "mean_step_ms": float(t.mean() * 1e3),
            "p50_step_ms": float(np.percentile(t, 50) * 1e3),
            "p95_step_ms": float(np.percentile(t, 95) * 1e3),
            "samples_per_sec": float(sps.mean()),
            "samples_per_sec_per_chip": float(sps.mean() / self.n_chips),
        }

"""Tracing / profiling harness (SURVEY.md §5: the reference has only
``time.time()`` prints, trainer_CTUNet.py:78,128,348-357; the TPU rebuild
gets a real profiler).

- ``trace(logdir)``     — context manager around ``jax.profiler`` producing a
                          TensorBoard-loadable trace of device execution.
- ``StepTimer``         — wall-clock step timing with ``block_until_ready``
                          fencing; reports steps/s, crops/s and volumes/min.
- ``enable_nan_checks`` — opt-in ``jax_debug_nans`` (the functional-JAX
                          replacement for torch anomaly detection).
"""
from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(logdir: str, *, create_perfetto_link: bool = False):
    """Capture a device trace viewable in TensorBoard's profile plugin."""
    jax.profiler.start_trace(logdir, create_perfetto_link=create_perfetto_link)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def enable_nan_checks(enabled: bool = True) -> None:
    """Debug-mode NaN detection inside jitted code (re-runs the offending
    primitive un-jitted and raises with a stack trace)."""
    jax.config.update("jax_debug_nans", enabled)


class StepTimer:
    """Throughput meter. ``tic()`` before the step, ``toc(result, n_items)``
    after; ``toc`` fences on the result so device time is fully counted."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.times = []
        self.items = []
        self._t0: Optional[float] = None

    def tic(self):
        self._t0 = time.perf_counter()

    def toc(self, result=None, n_items: int = 1) -> float:
        if result is not None:
            jax.block_until_ready(result)
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        self.items.append(n_items)
        return dt

    @property
    def mean_s(self) -> float:
        return sum(self.times) / max(len(self.times), 1)

    def items_per_s(self, *, skip_first: int = 1) -> float:
        """Throughput excluding warmup/compile steps."""
        ts = self.times[skip_first:] or self.times
        ns = self.items[skip_first:] or self.items
        total_t = sum(ts)
        return sum(ns) / total_t if total_t > 0 else 0.0

    def per_min(self, **kw) -> float:
        return 60.0 * self.items_per_s(**kw)

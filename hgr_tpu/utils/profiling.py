"""Profiling / tracing helpers (the reference has none — SURVEY §5).

Thin wrappers over ``jax.profiler``: named trace annotations, an on-demand
trace capture context, and a step timer that reports imgs/sec and step-time
percentiles to the run logger.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax
import numpy as np


def annotate(name: str):
    """Trace annotation context (shows up in xprof/tensorboard traces)."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def capture_trace(log_dir: Optional[str]):
    """Capture a profiler trace into ``log_dir`` (no-op when None)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock per-step statistics with device-sync on demand."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self._times: List[float] = []
        self._t0: Optional[float] = None
        self._count = 0

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, result=None) -> float:
        if result is not None:
            jax.block_until_ready(result)
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.warmup:
            self._times.append(dt)
        return dt

    def summary(self, items_per_step: int = 1) -> Dict[str, float]:
        if not self._times:
            return {}
        t = np.asarray(self._times)
        return {
            "steps": len(t),
            "mean_ms": float(t.mean() * 1e3),
            "p50_ms": float(np.percentile(t, 50) * 1e3),
            "p95_ms": float(np.percentile(t, 95) * 1e3),
            "items_per_sec": float(items_per_step / t.mean()),
        }


class TraceWindow:
    """Capture a profiler trace of train steps [start, stop] (0-indexed
    within the run). Call :meth:`before` ahead of each step and
    :meth:`after` behind it; no-op when ``log_dir`` is empty, so the driver
    can call it unconditionally (``--trace_dir``)."""

    def __init__(self, log_dir: Optional[str], start: int = 1, stop: int = 3):
        self.log_dir = log_dir
        self.start = start
        self.stop = stop
        self._active = False
        self._done = False

    def before(self, i: int) -> None:
        # the ``not self._active`` guard matters when an epoch ends before
        # step ``stop``: without it the next epoch's step ``start`` would
        # start a second trace while one is still running, which raises.
        if (self.log_dir and not self._done and not self._active
                and i == self.start):
            jax.profiler.start_trace(self.log_dir)
            self._active = True

    def after(self, i: int, result=None) -> None:
        if self._active and i >= self.stop:
            if result is not None:
                jax.block_until_ready(result)
            jax.profiler.stop_trace()
            self._active = False
            self._done = True

    def close(self) -> None:
        """Stop a still-active trace (run ended mid-window). Call from a
        ``finally`` around the epoch loop so short runs still write a trace."""
        if self._active:
            jax.profiler.stop_trace()
            self._active = False
            self._done = True

"""Profiling and timing utilities.

The reference's only observability is wall-clock bookkeeping in text logs
(experiments/experiment.py:398-402,540-547).  Here profiling is first-class:

* ``trace(logdir)``        — context manager around ``jax.profiler`` traces
  (open the dump with xprof/tensorboard offline).
* ``device_time(fn,*args)``— tunnel-safe per-call device timing: chains N
  executions and fetches once, so host<->device round-trip latency (≈30 ms
  through the axon tunnel) is amortized out.  Single-call timing through a
  remote tunnel is meaningless — this is the only reliable way to measure.
* ``StepTimer``            — rolling per-step wall times for the train loop.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, List

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_time(fn: Callable, *args, n: int = 20, tries: int = 3) -> float:
    """Per-call device seconds of ``jit(fn)(*args)``, tunnel-latency free."""
    f = jax.jit(fn)
    jax.block_until_ready(f(*args))  # compile

    def chain(k: int) -> float:
        t0 = time.perf_counter()
        out = None
        for _ in range(k):
            out = f(*args)
        float(jnp.asarray(out).ravel()[0])
        return time.perf_counter() - t0

    chain(2)  # warm
    best = min(chain(n + 1) - chain(1) for _ in range(tries))
    return max(best, 1e-9) / n


class StepTimer:
    """Rolling mean/last of step durations."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times: List[float] = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        dt = time.perf_counter() - self._t0
        self._times.append(dt)
        if len(self._times) > self.window:
            self._times.pop(0)
        return dt

    @property
    def mean(self) -> float:
        return sum(self._times) / len(self._times) if self._times else 0.0

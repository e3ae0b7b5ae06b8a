"""Profiling hooks (SURVEY.md §5: the reference has only timing meters; the
TPU rebuild gets jax.profiler traces + a step timer)."""

from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str, enabled: bool = True) -> Iterator[None]:
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    if not enabled:
        yield
        return
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock segmenter: timer.mark('data'), timer.mark('step'), ...
    accumulates per-segment seconds; read with .averages()."""

    def __init__(self):
        self._last = time.perf_counter()
        self._acc = {}
        self._n = {}

    def mark(self, name: str):
        now = time.perf_counter()
        self._acc[name] = self._acc.get(name, 0.0) + (now - self._last)
        self._n[name] = self._n.get(name, 0) + 1
        self._last = now

    def averages(self) -> dict:
        return {k: self._acc[k] / max(self._n[k], 1) for k in self._acc}

    def reset(self):
        self.__init__()

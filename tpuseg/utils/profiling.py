"""Profiling and throughput telemetry.

The reference's only performance instrumentation is wall-clock epoch timing
(train.py:135, 178) and per-step prints. Here (SURVEY.md §5.1):

- :func:`trace` wraps a region in a ``jax.profiler`` trace whose artifacts
  open in TensorBoard's profile plugin / Perfetto;
- :class:`ThroughputMeter` tracks images/sec and steps/sec with the
  value-readback synchronization this environment's backend requires
  (``block_until_ready`` can return early on the tunneled TPU).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace for the enclosed region."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ThroughputMeter:
    """Sliding throughput: call update(batch_size) once per step."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times: list = []
        self._images: list = []

    def update(self, batch_size: int) -> None:
        now = time.perf_counter()
        self._times.append(now)
        self._images.append(batch_size)
        if len(self._times) > self.window + 1:
            self._times.pop(0)
            self._images.pop(0)

    @property
    def images_per_sec(self) -> Optional[float]:
        if len(self._times) < 2:
            return None
        dt = self._times[-1] - self._times[0]
        return sum(self._images[1:]) / dt if dt > 0 else None

    @property
    def steps_per_sec(self) -> Optional[float]:
        if len(self._times) < 2:
            return None
        dt = self._times[-1] - self._times[0]
        return (len(self._times) - 1) / dt if dt > 0 else None

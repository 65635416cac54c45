"""Profiling & step-timing utilities (SURVEY.md §5: the reference's only
timing machinery is torch.utils.benchmark in its GPU benchmark suite; the
TPU-native equivalents are jax.profiler traces + per-step wall timing).

- `trace(logdir)`: context manager around jax.profiler.trace — produces a
  TensorBoard/Perfetto trace of the wrapped steps.
- `StepTimer`: rolling steps/sec + examples/sec for the train loop.
- `device_memory_stats()`: per-device HBM usage (replaces
  torch.cuda.max_memory_allocated in the reference's CSV schema).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False):
    jax.profiler.start_trace(logdir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, window: int = 50):
        self.window = window
        self._t0 = time.time()
        self._count = 0
        self.steps_per_sec = 0.0

    def tick(self, n: int = 1) -> Optional[float]:
        """Call once per step; returns steps/sec when a window completes."""
        self._count += n
        if self._count >= self.window:
            dt = time.time() - self._t0
            self.steps_per_sec = self._count / dt
            self._t0 = time.time()
            self._count = 0
            return self.steps_per_sec
        return None


def device_memory_stats() -> Dict[str, Dict[str, float]]:
    """{device: {bytes_in_use, peak_bytes_in_use, bytes_limit}} in GiB."""
    out = {}
    for d in jax.local_devices():
        try:
            s = d.memory_stats()
        except (AttributeError, NotImplementedError):
            continue
        if not s:
            continue
        gib = 1024**3
        out[str(d)] = {
            "bytes_in_use_gib": s.get("bytes_in_use", 0) / gib,
            "peak_bytes_in_use_gib": s.get("peak_bytes_in_use", 0) / gib,
            "bytes_limit_gib": s.get("bytes_limit", 0) / gib,
        }
    return out

"""Thread-safe host RNG for dataset-side randomness (empty-prompt dropout,
fliplr augmentation).

The reference gets per-worker RNG isolation for free from torch DataLoader
worker *processes* (train_brushnet_mirror.py:1242-1248); the TPU rebuild's
loader is a thread pool in one process, and numpy's RandomState/Generator are
not thread-safe — concurrent draws can corrupt the generator state.  Each
thread therefore gets its own Generator, seeded from a shared SeedSequence so
a fixed dataset seed still yields reproducible single-threaded streams.
"""

from __future__ import annotations

import threading
from typing import Optional

import numpy as np


class ThreadSafeRNG:
    """Per-thread numpy Generators spawned from one SeedSequence."""

    def __init__(self, seed: Optional[int] = None):
        self._seq = np.random.SeedSequence(seed)
        self._lock = threading.Lock()
        self._local = threading.local()

    def _generator(self) -> np.random.Generator:
        gen = getattr(self._local, "gen", None)
        if gen is None:
            with self._lock:
                child = self._seq.spawn(1)[0]
            gen = np.random.default_rng(child)
            self._local.gen = gen
        return gen

    def rand(self) -> float:
        return float(self._generator().random())

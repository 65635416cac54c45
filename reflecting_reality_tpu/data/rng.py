"""Deterministic per-item host RNG for dataset-side randomness
(empty-prompt dropout, fliplr augmentation).

The reference gets per-worker RNG isolation from torch DataLoader worker
*processes* (train_brushnet_mirror.py:1242-1248) — which is thread-safe but
order-dependent: an item's draws depend on which worker handles it.  The TPU
rebuild's loader is a thread pool in one process, and a per-THREAD generator
(the previous design here) made draws depend on thread scheduling: the same
(seed, item) produced different augmentations run-to-run, which broke the
--steps_per_dispatch K==1 reproducibility contract.

The fix is the stateless JAX-style keying: each item's generator is derived
purely from (seed, epoch, index), so draws are identical regardless of
thread count, scheduling, batching, or prefetch depth — and differ across
epochs so augmentation still resamples every pass.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


class ItemRNG:
    """Per-item numpy Generators keyed by (seed, epoch, index).

    With seed=None every call returns a fresh OS-entropy generator
    (nondeterministic but thread-safe).  `epoch` is bumped by the DataLoader
    between passes so augmentation draws differ across epochs while staying
    reproducible for a fixed (seed, epoch)."""

    def __init__(self, seed: Optional[int] = None):
        self.seed = seed
        self.epoch = 0

    def for_item(self, index: int) -> np.random.Generator:
        if self.seed is None:
            return np.random.default_rng()
        return np.random.default_rng(
            np.random.SeedSequence([int(self.seed), int(self.epoch), int(index)])
        )

"""Multi-host helpers (SURVEY.md §5 distributed backend: the reference's
Accelerate barrier/gather surface maps to jax.distributed + multihost
utilities over DCN; collectives inside jitted programs ride ICI).

- `initialize()`: idempotent jax.distributed.initialize for TPU pods (no-op
  in single-process runs — e.g. the one-chip bench or CPU tests).
- `barrier(name)`: cross-host sync (reference accelerator.wait_for_everyone,
  evaluate_metrics.py:376).
- `is_main_process()` / `local_shard(items)`: the PartialState surface.
"""

from __future__ import annotations

from typing import Sequence

import jax


def initialize(**kwargs) -> None:
    """Safe to call unconditionally at CLI start."""
    if jax.process_count() > 1:
        return  # already initialized by the runtime
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError):
        pass  # single-process / already initialized


def is_main_process() -> bool:
    return jax.process_index() == 0


def barrier(name: str = "barrier") -> None:
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def local_shard(items: Sequence) -> list:
    from reflecting_reality_tpu.parallel.mesh import split_between_processes

    return split_between_processes(items)
